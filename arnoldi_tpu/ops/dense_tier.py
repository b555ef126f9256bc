"""Small dense tier: Schur factorization, ordered Schur, eig of the projected
Hessenberg matrix.

In the solver these run on m x m matrices with m <= ~200 — off the hot path
(reference call stack §3.1: LAPACK zgees/ztrexc on the host while the sharded
tall matmuls run on device).  Two backends:

* ``native`` — the in-repo C++ implementation
  (``arnoldi_tpu/native/dense_tier.cpp``): complex Hessenberg QR iteration,
  Givens-rotation eigenvalue reordering (trexc-equivalent, with the greedy
  sort loop done in one native call rather than m^2 Python->LAPACK hops —
  reference ``utils.py:45-63``), and triangular-eigenvector back-substitution.
* ``scipy`` — LAPACK via scipy (zgees/ztrexc), used as the validation oracle
  and automatic fallback.

Reference semantics this must honour (``src/arnoldi/utils.py:24-67``):
``ordered_schur`` greedily moves the sort-function's picks to the leading
diagonal positions via trexc swaps; complex output only (the real 2x2-block
mode is a capability gap in the reference — here the complex path is the
supported one, and real inputs are promoted).
"""

import os

import numpy as np

from ..utils.sorting import arg_largest_magnitude

_BACKEND = os.environ.get("ARNOLDI_TPU_DENSE_BACKEND", "auto")


def _native():
    """Return the native module, or None if unavailable."""
    if _BACKEND == "scipy":
        return None
    try:
        from ..native import dense_tier as native_mod

        return native_mod if native_mod.available() else None
    except Exception:
        if _BACKEND == "native":
            raise
        return None


def _complex_type(dtype):
    return np.result_type(np.dtype(dtype), np.complex64)


def schur_complex(A):
    """Complex Schur factorization ``A = Z T Z^H`` (T upper triangular).

    Returns ``(T, Z)`` with the complex type promoted from ``A.dtype``.
    """
    A = np.asarray(A)
    ct = _complex_type(A.dtype)
    nat = _native()
    if nat is not None:
        return nat.schur_complex(A.astype(ct))
    from scipy.linalg import schur

    return schur(A.astype(ct), output="complex")


def move_eigenvalue(T, Z, ifst, ilst):
    """trexc equivalent: move diagonal entry ``ifst`` to position ``ilst``
    (0-based) by a sequence of adjacent Givens swaps, updating ``T`` and
    ``Z`` in a unitary similarity.  Complex triangular ``T`` only.
    """
    nat = _native()
    if nat is not None:
        return nat.trexc(T, Z, ifst, ilst)
    from scipy.linalg.lapack import ctrexc, ztrexc

    fn = ztrexc if T.dtype == np.complex128 else ctrexc
    T, Z, info = fn(T, Z, ifst + 1, ilst + 1)  # LAPACK is 1-based
    if info != 0:
        raise RuntimeError(f"trexc failed with info={info}")
    return T, Z


def ordered_schur(a, output="complex", *, sort_function=None):
    """Schur decomposition with the diagonal ordered by ``sort_function``.

    Parity with reference ``utils.py:32-67``: greedy reordering — for each
    target position take the sort function's pick among the original
    eigenvalues and move it there with trexc swaps, tracking positions.
    Only ``output='complex'`` is supported (same restriction as the
    reference; real 2x2-block reordering raises).
    """
    if output != "complex":
        raise ValueError("output!='complex' not implemented yet")
    if sort_function is None:
        sort_function = arg_largest_magnitude

    a = np.asarray(a)
    T, Z = schur_complex(a)
    # Preserve the reference's dtype contract: the output dtype matches the
    # complex promotion of the input (complex in, same complex out).
    n = T.shape[0]

    eigenvalues = np.diag(T)
    ordered_indices = np.asarray(sort_function(eigenvalues))

    nat = _native()
    if nat is not None:
        return nat.ordered_schur(T, Z, ordered_indices.astype(np.int32))

    current_pos = list(range(n))
    for target, source_idx in enumerate(ordered_indices):
        source = current_pos.index(int(source_idx))
        if source != target:
            T, Z = move_eigenvalue(T, Z, source, target)
            moved = current_pos.pop(source)
            current_pos.insert(target, moved)
    return T, Z


def eig(A):
    """Dense eigendecomposition of a small matrix (host)."""
    A = np.asarray(A)
    nat = _native()
    if nat is not None and np.iscomplexobj(A):
        return nat.eig(A)
    return np.linalg.eig(A)


def eig_from_schur(T, Z=None):
    """Eigenpairs from a complex Schur form: values = diag(T), vectors by
    back-substitution on the triangular T (optionally rotated by Z).
    """
    nat = _native()
    if nat is not None:
        S = nat.triangular_eigvecs(T)
    else:
        S = _triangular_eigvecs_np(T)
    if Z is not None:
        S = Z @ S
    return np.diag(T).copy(), S


def _triangular_eigvecs_np(T):
    """Right eigenvectors of an upper-triangular complex matrix, normalized,
    by back-substitution: for eigenvalue T[k,k], solve
    ``(T[:k,:k] - T[k,k] I) y = -T[:k, k]``, vector = [y; 1; 0...].
    """
    T = np.asarray(T)
    n = T.shape[0]
    S = np.zeros_like(T)
    diag = np.diag(T)
    eps = np.finfo(T.dtype).eps
    scale = max(np.abs(diag).max(initial=0.0), 1.0)
    for k in range(n):
        S[k, k] = 1.0
        if k > 0:
            M = T[:k, :k].copy()
            d = diag[:k] - diag[k]
            # Perturb (near-)defective shifts so the solve stays bounded
            # (LAPACK ztrevc uses the same safeguard idea).
            small = np.abs(d) < eps * scale
            d = np.where(small, eps * scale * np.where(d.real < 0, -1, 1), d)
            M[np.arange(k), np.arange(k)] = d
            from scipy.linalg import solve_triangular

            S[:k, k] = solve_triangular(M, -T[:k, k])
        S[:, k] /= np.linalg.norm(S[:, k])
    return S
