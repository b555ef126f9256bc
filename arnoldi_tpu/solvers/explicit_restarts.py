"""Explicit-restart Arnoldi drivers: naive and deflation/locking.

Parity with the reference ``src/arnoldi/explicit_restarts.py``:

* :func:`naive_explicit_restarts` (``:31-60``) — single-eigenvalue
  polynomial restart: run Arnoldi to m, restart with the best Ritz vector,
  accept only when both the approximate and the *true* relative residual
  pass.  Pedagogical tier anchoring Saad's table 6.2.
* :func:`explicit_restarts_with_deflation` (``:80-168``) — computes nev
  eigenpairs one at a time, locking each converged eigenvector into the
  leading columns of V (which subsequent expansions orthogonalize against
  but never modify, via ``start_dim=k``), building the projected H column
  by Rayleigh quotients at lock time, and re-diagonalizing the final
  ``H[:nev, :nev]`` (the reference notes this is required for Markov-type
  matrices, ``:162-167``).

Device/host split: expansions, Ritz-vector matmuls, and locked-basis
orthogonalization run jitted on device; the small projected eigenproblem and
the restart bookkeeping run on the host.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..linop import as_operator
from ..ops import dense_tier
from ..ops.ortho import cgs_dgks
from ..utils.history import History
from ..utils.random import rand_normalized_vector
from ..utils.sorting import arg_largest_magnitude
from .decomposition import (
    RitzDecomposition,
    arnoldi_expand,
    default_invariant_tol,
)

__all__ = [
    "History",
    "naive_explicit_restarts",
    "explicit_restarts_with_deflation",
    "mgs_orthogonalize",
]


def _require_real(v, what):
    """Guard for the REAL work-dtype path: a genuinely complex Ritz
    vector cannot be stored in the real basis — ``V.at[k].set(complex)``
    silently drops the imaginary part (JAX emits only a ComplexWarning),
    which would lock a non-eigenvector without any error.  A
    numerically-real array (complex dtype from ``np.linalg.eig`` with
    ~zero imaginary part, the usual case for real eigenvalues) passes
    through as its real part."""
    if not np.iscomplexobj(v):
        return v
    v = np.asarray(v)
    scale = max(float(np.abs(v).max()), 1.0)
    if float(np.abs(v.imag).max()) <= 1e-7 * scale:
        return np.ascontiguousarray(v.real)
    raise ValueError(
        f"{what}: a dominant Ritz pair is complex but the work dtype is "
        "real; use a complex dtype (CPU), or partial_schur/eigs — the "
        "real-Schur path carries conjugate pairs as 2x2 blocks")


@partial(jax.jit, static_argnames=())
def _ortho_against_locked(V, v, n_locked):
    """Orthonormalize ``v`` against the first ``n_locked`` columns of ``V``
    (DGKS-stabilized CGS on device).  Returns (v_ortho, beta)."""
    h, w, beta, _ = cgs_dgks(V, v, n_locked, tol=0.0)
    safe = jnp.where(beta == 0, 1.0, beta)
    return w / safe, beta


def mgs_orthogonalize(basis, w, tol):
    """Reference-compatible helper (``explicit_restarts.py:63-77``):
    orthonormalize ``w`` against all columns of ``basis``; raises if the
    norm collapses below ``tol``."""
    basis_t = jnp.asarray(basis).T  # columns -> internal row layout
    w = jnp.asarray(w, dtype=basis_t.dtype)
    v, beta = _ortho_against_locked(basis_t, w, basis_t.shape[0])
    if float(beta) <= tol:
        raise AssertionError("MGS: Too small norm when orthornormalizing")
    return v


def naive_explicit_restarts(A, m=None, *, stopping_criterion=None,
                            max_restarts=10, ortho="cgs_dgks", dtype=None,
                            key=None):
    """Single-eigenvalue explicit restarts (largest magnitude).

    Returns ``(ritz, has_converged, n_restarts)`` like the reference.
    """
    op = as_operator(A)
    n = op.shape[0]

    tol = default_invariant_tol(op.dtype) if stopping_criterion is None \
        else float(stopping_criterion)

    ct = np.result_type(np.dtype(op.dtype), np.complex64)
    wdtype = jax.dtypes.canonicalize_dtype(ct) if dtype is None \
        else jax.dtypes.canonicalize_dtype(np.dtype(dtype))
    from .krylov_schur import _backend_supports_complex

    if (np.issubdtype(wdtype, np.complexfloating)
            and not _backend_supports_complex()):
        raise NotImplementedError(
            "The explicit-restart drivers build complex Ritz vectors and the "
            "TPU backend has no complex dtypes; run them on CPU "
            "(jax.config.update('jax_platforms', 'cpu')) or use "
            "partial_schur/partial_eigh, whose real-arithmetic paths run "
            "on TPU")

    k = 1  # naive restart only converges the dominant eigenpair
    if m is None:
        m = min(max(2 * k + 1, 20), n)

    if key is None:
        key = jax.random.key(0)
    v0 = rand_normalized_vector(key, n, wdtype)

    ritz = None
    for i in range(max_restarts):
        V = jnp.zeros((m + 1, n), dtype=wdtype).at[0, :].set(v0)
        H = jnp.zeros((m + 1, m), dtype=wdtype)
        V, H, n_iter = arnoldi_expand(op, V, H, tol, start_dim=0, max_dim=m,
                                      ortho=ortho)
        n_iter = int(n_iter)
        ritz = RitzDecomposition.from_vt_and_h(V, H, k, max_dim=n_iter)
        if ritz.approximate_residuals[0] < tol:
            residuals = ritz.compute_true_residuals(op)
            if residuals[0] / max(abs(ritz.values[0]), tol) < tol:
                return ritz, True, i
        # Restart with the dominant Ritz vector.
        v0 = ritz.vectors[:, 0]
        if np.issubdtype(np.dtype(wdtype), np.floating):
            v0 = jnp.asarray(
                _require_real(v0, "naive_explicit_restarts"), wdtype)
        v0 = v0 / jnp.linalg.norm(v0)

    return ritz, False, max_restarts


def explicit_restarts_with_deflation(
    A, nev, *, max_dim=None, stopping_criterion=None, max_restarts=100,
    sort_function=None, ortho="cgs_dgks", dtype=None, key=None,
):
    """Compute ``nev`` eigenpairs by explicitly-restarted Arnoldi with
    deflation/locking.

    Returns ``(eigenvalues, eigenvectors, history)`` like the reference.
    """
    op = as_operator(A)
    n = op.shape[0]
    assert op.shape[1] == n

    tol = default_invariant_tol(op.dtype) if stopping_criterion is None \
        else float(stopping_criterion)
    if sort_function is None:
        sort_function = arg_largest_magnitude
    elif isinstance(sort_function, str):
        from ..utils.sorting import sort_function_for

        sort_function = sort_function_for(sort_function)
    assert max_restarts > 0

    if max_dim is None:
        max_dim = min(max(2 * nev + 1, 20), n)

    ct = np.result_type(np.dtype(op.dtype), np.complex64)
    wdtype = jax.dtypes.canonicalize_dtype(ct) if dtype is None \
        else jax.dtypes.canonicalize_dtype(np.dtype(dtype))
    from .krylov_schur import _backend_supports_complex

    if (np.issubdtype(wdtype, np.complexfloating)
            and not _backend_supports_complex()):
        raise NotImplementedError(
            "The explicit-restart drivers build complex Ritz vectors and the "
            "TPU backend has no complex dtypes; run them on CPU "
            "(jax.config.update('jax_platforms', 'cpu')) or use "
            "partial_schur/partial_eigh, whose real-arithmetic paths run "
            "on TPU")

    V = jnp.zeros((max_dim + 1, n), dtype=wdtype)
    H_host = np.zeros((max_dim + 1, max_dim), dtype=wdtype)

    history = History.from_k(nev)
    if key is None:
        key = jax.random.key(0)

    def converge_slot(k, key):
        """Converge ONE eigenpair into locked slot ``k`` (the reference's
        per-eigenvalue loop body, :105-160); mutates V/H_host via the
        enclosing scope and returns (locked eigenvalue estimate, key)."""
        nonlocal V, H_host
        key, sub = jax.random.split(key)
        v0 = rand_normalized_vector(sub, n, wdtype)
        v0, beta = _ortho_against_locked(V, v0, k)
        assert float(beta) > tol, "start vector collapsed onto locked basis"
        V = V.at[k, :].set(v0)

        matvecs_k = 0
        for restart in range(max_restarts):
            H = jnp.asarray(H_host)
            V, H, n_iter = arnoldi_expand(
                op, V, H, tol, start_dim=k, max_dim=max_dim, ortho=ortho
            )
            m = int(n_iter)
            assert m > k
            matvecs_k += m - k
            happy_breakdown = m != max_dim

            H_host = np.array(H)  # writable host copy
            # Ritz extraction on the deflated sub-factorization
            # (reference :130-135): rows k..m of Vt, H[k:m+1, k:m].
            V_k = V[k : m + 1, :]
            H_k = H_host[k : m + 1, k:m]
            ritz = RitzDecomposition.from_vt_and_h(
                V_k, H_k, m - k, sort_function=sort_function
            )

            v_k = ritz.vectors[:, 0]
            if np.issubdtype(np.dtype(wdtype), np.floating):
                v_k = jnp.asarray(
                    _require_real(v_k, "explicit_restarts_with_deflation"),
                    wdtype)
            v_k = v_k / jnp.linalg.norm(v_k)

            # Re-orthogonalize the candidate against the locked basis.
            v_k, beta = _ortho_against_locked(V, v_k, k)
            assert float(beta) > tol, "Ritz vector collapsed onto locked basis"
            V = V.at[k, :].set(v_k)

            approximate_convergence = (
                ritz.approximate_residuals / np.abs(ritz.values)
            )
            if happy_breakdown or bool(approximate_convergence[0] < tol):
                # Lock: build column k of the projected H by Rayleigh
                # quotients against the locked basis (reference :149-151).
                Av = op.matvec(V[k, :]).astype(wdtype)
                coeffs = np.asarray(jnp.matmul(
                    V[: k + 1, :].conj(), Av,
                    precision=jax.lax.Precision.HIGHEST))
                H_host[: k + 1, k] = coeffs
                H_host[k + 1 : -1, k] = 0

                if k < nev:
                    history.matvecs[k] = matvecs_k
                    history.restarts[k] = restart + 1
                else:
                    history.matvecs[-1] += matvecs_k
                    history.restarts[-1] += restart + 1
                return complex(ritz.values[0]), key
        raise ValueError(f"Could not converge for value {k}")

    for k in range(nev):
        _, key = converge_slot(k, key)

    # COMPLETENESS BACKSTOP (r05): one-at-a-time locking can converge a
    # lower-ranked eigenvalue when the Krylov window is tight (observed on
    # mark(100) at ncv = 2*nev: the +/- twin of a locked pair starves in
    # the (max_dim - k)-step window and a just-below-the-cut value
    # converges instead — 1-in-5 start vectors at (nev=10, ncv=20); the
    # reference's identical algorithm shares the failure mode, hidden by
    # its RNG stream).  Probe by converging the dominant REMAINING
    # direction: while it outranks the current nev-th best by more than a
    # tie margin, keep it as an extra locked slot (the output picks the
    # best nev of ALL locked values), up to a small extras budget.
    max_extra = int(min(3 + nev // 4, max_dim - 1 - nev))
    k_lock = nev
    while k_lock < nev + max_extra and k_lock < max_dim - 1:
        lam_new, key = converge_slot(k_lock, key)
        k_lock += 1
        locked_vals = np.linalg.eigvals(H_host[:k_lock, :k_lock])
        order = np.asarray(sort_function(locked_vals))
        top = locked_vals[order[:nev]]
        in_top = bool(np.any(np.isclose(lam_new, top,
                                        rtol=1e-10, atol=1e-12)))
        if not in_top:
            # the dominant remaining direction ranks BELOW the current
            # nev-th best: the top-nev set is stable, done
            break
        displaced = locked_vals[order[nev]] if len(locked_vals) > nev \
            else None
        if displaced is not None and np.isclose(
                abs(lam_new), abs(displaced), rtol=1e-7, atol=1e-10):
            # the new value merely swapped with its tied-|lambda| twin at
            # the cut — either member is a correct answer (the match gate
            # recognizes boundary ties); stop probing
            break

    # Final re-diagonalization of the projected matrix (reference :162-167;
    # required for Markov-type matrices) over ALL locked slots, returning
    # the best nev by the sort function.
    eivals, Y = dense_tier.eig(H_host[:k_lock, :k_lock])
    order = np.asarray(sort_function(np.asarray(eivals)))[:nev]
    eivals = np.asarray(eivals)[order]
    Y = np.asarray(Y)[:, order]
    if np.issubdtype(np.dtype(wdtype), np.floating) and np.iscomplexobj(Y):
        # the locked H is upper triangular with a real diagonal here (the
        # complex-pair case raised above), so Y is numerically real
        Y = _require_real(Y, "explicit_restarts_with_deflation")
    eivecs = jnp.matmul(V[:k_lock, :].T, jnp.asarray(Y, dtype=wdtype),
                        precision=jax.lax.Precision.HIGHEST)
    return eivals, eivecs, history
