"""Krylov-Schur restarted eigensolver (flagship driver).

Algorithm parity with the reference ``src/arnoldi/krylov_schur.py:10-114``
(Stewart 2001): repeat [Arnoldi expand to m | Schur-rotate the projected H |
reorder wanted eigenvalues first | truncate the basis to p columns carrying
the residual vector | test ``|h_{m+1,m} q_{m,i}| / |t_ii| < tol``].

TPU-first split (SURVEY §3.1): everything n-sized — the Arnoldi expansion
(matvec + masked CGS/DGKS, one ``lax.while_loop`` jit) and the truncation
tall-matmul ``V_active @ Q_p`` — runs on device and is sharding-transparent;
everything m-sized (Schur, reordering, convergence bookkeeping) runs
replicated on the host via the dense tier (native C++ or LAPACK), with only
the tiny ``(m+1, m)`` H crossing the boundary once per restart.

Capability extensions over the reference:

* happy breakdown (invariant subspace found mid-expansion) is *supported* —
  the reference raises (``krylov_schur.py:57-59``); here the exact invariant
  pairs are extracted and returned.
* any dtype: complex64 for the TPU fast path, complex128 under x64 for
  1e-8-grade residuals; default follows the operator dtype.
* deterministic start vectors via ``jax.random`` keys.
* per-restart residual trace in ``History`` (first-class convergence
  tracking, which the reference README flags as missing API).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..linop import as_operator
from ..ops import dense_tier
from ..utils.history import History
from ..utils.random import rand_normalized_vector
from ..utils.sorting import arg_largest_magnitude
from .decomposition import arnoldi_expand, default_invariant_tol


@partial(jax.jit, static_argnames=("p", "m"))
def _truncate_basis(V, Qp, *, p, m):
    """Device-side basis truncation: ``V[:, :p] = V[:, :m] @ Qp`` with the
    residual vector ``V[:, m]`` carried to column p (reference
    ``krylov_schur.py:74-81`` — "not a typo") and stale columns zeroed so the
    masked orthogonalization never sees them."""
    n, mp1 = V.shape
    head = V[:, :m] @ Qp                      # (n, p) tall matmul (MXU)
    carry = V[:, m][:, None]                  # residual vector
    tail = jnp.zeros((n, mp1 - p - 1), V.dtype)
    return jnp.concatenate([head, carry, tail], axis=1)


def _solver_dtype(op_dtype, dtype):
    if dtype is not None:
        return jax.dtypes.canonicalize_dtype(np.dtype(dtype))
    ct = np.result_type(np.dtype(op_dtype), np.complex64)
    return jax.dtypes.canonicalize_dtype(ct)


def partial_schur(
    A,
    nev,
    *,
    max_dim=None,
    stopping_criterion=None,
    max_restarts=100,
    sort_function=None,
    p=None,
    ortho="cgs_dgks",
    dtype=None,
    key=None,
    v0=None,
):
    """Compute a partial Schur decomposition ``A Q ~= Q T`` with the
    Krylov-Schur algorithm.

    Parameters (reference-compatible, ``krylov_schur.py:10-36``)
    ----------
    A : operator-like — SciPy sparse, dense array, or a framework operator.
    nev : number of wanted eigenpairs.
    max_dim : Krylov space dimension m; default ``min(max(2*nev+1, 20), n)``.
    stopping_criterion : relative-residual tolerance; default
        ``sqrt(eps(A.dtype))``.
    max_restarts : restart budget; raises on exhaustion.
    sort_function : "which" selector (callable or ARPACK-style handled by the
        caller); default largest magnitude.
    p : compressed (active) size after truncation; default
        ``min(nev + 5, max_dim - 1)``.

    TPU extensions
    --------------
    ortho : orthogonalization kernel name (``cgs_dgks`` default, ``cgs2``
        recommended at float32).
    dtype : solver basis dtype; default complex promotion of ``A.dtype``
        canonicalized to the backend (complex64 on TPU, complex128 on x64).
    key : ``jax.random`` key for the start vector (deterministic); default
        key 0.
    v0 : explicit start vector overriding ``key``.

    Returns
    -------
    schur_vecs : (n, nev) device array Q.
    schur_mat : (nev, nev) device array T (upper triangular, ordered).
    history : :class:`arnoldi_tpu.utils.History`.
    """
    op = as_operator(A)
    n = op.shape[0]
    assert op.shape[1] == n

    if stopping_criterion is None:
        tol = default_invariant_tol(op.dtype)
    else:
        tol = float(stopping_criterion)
    if sort_function is None:
        sort_function = arg_largest_magnitude
    assert max_restarts > 0

    if max_dim is None:
        max_dim = min(max(2 * nev + 1, 20), n)
    if p is None:
        p = min(nev + 5, max_dim - 1)
    assert nev <= p < max_dim, f"need nev <= p < max_dim, got {nev}, {p}, {max_dim}"
    assert max_dim <= n

    wdtype = _solver_dtype(op.dtype, dtype)

    V = jnp.zeros((n, max_dim + 1), dtype=wdtype)
    H = jnp.zeros((max_dim + 1, max_dim), dtype=wdtype)

    if v0 is None:
        if key is None:
            key = jax.random.key(0)
        v0 = rand_normalized_vector(key, n, wdtype)
    else:
        v0 = jnp.asarray(v0, dtype=wdtype)
        v0 = v0 / jnp.linalg.norm(v0)
    V = V.at[:, 0].set(v0)

    history = History.from_k(nev)
    has_converged = False
    total_matvecs = 0

    V, H, n_iter = arnoldi_expand(
        op, V, H, tol, start_dim=0, max_dim=max_dim, ortho=ortho
    )
    m = int(n_iter)
    total_matvecs += m

    schur_vecs = schur_mat = None
    for restart in range(max_restarts):
        happy_breakdown = m != max_dim
        if happy_breakdown and m < nev:
            raise ValueError(
                f"Invariant subspace of dimension {m} < nev={nev} found; "
                "start vector lives in a too-small invariant subspace"
            )

        H_host = np.asarray(H)
        H_active = H_host[:m, :m]

        ## Rotation: ordered complex Schur of the projected matrix
        # (reference does schur() then ordered_schur() on the triangular
        # factor, krylov_schur.py:69-72; fused into one call here).
        T2, Q = dense_tier.ordered_schur(H_active, sort_function=sort_function)

        ## Truncation to the leading p columns (keep fewer on breakdown).
        pa = min(p, m) if happy_breakdown else p
        Qp = Q[:, :pa]

        V = _truncate_basis(V, jnp.asarray(Qp, dtype=wdtype), p=pa, m=m)

        H_new = np.zeros_like(H_host)
        H_new[:pa, :pa] = T2[:pa, :pa]
        # Coupling row: the old h_{m+1,m} e_m^H rotated by Qp
        # (reference krylov_schur.py:83-88).
        H_new[pa, :pa] = H_host[m, :m] @ Qp

        ## Convergence: |h_{m+1,m} * Q[m-1, i]| / |T2[i, i]|
        # (reference krylov_schur.py:91-99).
        approximate_residuals = np.abs(H_host[m, m - 1] * Q[m - 1, :])
        diag = np.abs(np.diag(T2))
        diag = np.where(diag == 0, 1.0, diag)
        approximate_convergence = approximate_residuals / diag

        for k in range(nev):
            if approximate_convergence[k] <= tol:
                history.matvecs[k] = total_matvecs
                history.restarts[k] = restart + 1
        history.residual_trace.append(
            float(np.max(approximate_convergence[:nev]))
        )

        has_converged = happy_breakdown or bool(
            np.all(approximate_convergence[:nev] < tol)
        )
        if happy_breakdown:
            # The coupling vanished: the Schur pairs are exact
            # (capability extension; the reference raises here).
            history.matvecs[:] = np.maximum(history.matvecs, total_matvecs)
            history.restarts[:] = np.maximum(history.restarts, restart + 1)
        if has_converged:
            H = jnp.asarray(H_new)
            break

        H = jnp.asarray(H_new)
        V, H, n_iter = arnoldi_expand(
            op, V, H, tol, start_dim=pa, max_dim=max_dim, ortho=ortho
        )
        m_new = int(n_iter)
        total_matvecs += m_new - pa
        m = m_new

    if not has_converged:
        raise ValueError("Has not converged !")

    schur_vecs = V[:, :nev]
    schur_mat = jnp.asarray(np.asarray(H)[:nev, :nev])

    # Note: same ordering contract as the reference — Schur form ordered by
    # sort_function, use eigenpairs_from_partial_schur for eigen post-processing.
    return schur_vecs, schur_mat, history


def eigenpairs_from_partial_schur(schur_vecs, schur_mat):
    """Eigen post-processing: eigenpairs from a partial Schur decomposition.

    The reference leaves this to user boilerplate (README.md:46-48:
    ``vals, S = eig(T); vecs = Q @ S``); here it is a library call using the
    dense tier's triangular back-substitution.

    Returns ``(values, vectors)`` with unit-norm columns.
    """
    T = np.asarray(schur_mat)
    values, S = dense_tier.eig_from_schur(T) if _is_triangular(T) else dense_tier.eig(T)
    Q = jnp.asarray(schur_vecs)
    vectors = Q @ jnp.asarray(S, dtype=Q.dtype)
    norms = jnp.linalg.norm(vectors, axis=0)
    vectors = vectors / jnp.where(norms == 0, 1.0, norms)[None, :]
    return values, vectors


def _is_triangular(T):
    return bool(np.allclose(T, np.triu(T)))
