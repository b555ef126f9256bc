"""Hermitian fast path: thick-restart Lanczos (``partial_eigh``).

The reference lists a Lanczos/Hermitian path as post-1.0 future work
(README.md:123); here it is a first-class driver because symmetric problems
are where the TPU path shines (everything real, the projected matrix is
symmetric so the host tier is an ``eigh``, and the restart compression is
exactly Krylov-Schur specialized to a diagonal Schur form — Wu & Simon's
thick-restart Lanczos).

Design notes:

* The device expansion reuses the Arnoldi machinery.  At float32, full
  (blocked CGS + DGKS) orthogonalization against the whole basis is the
  robust default — the classical 3-term recurrence loses orthogonality at
  sqrt(eps) which is immediately fatal at f32.  The ``selective`` kernel
  projects only against the last two columns plus the DGKS-triggered full
  fallback, recovering most of the 3-term speed when the spectrum is tame.
* After a thick restart the projected matrix is symmetric arrowhead
  (diag(theta) with a coupling row/col), which the host ``eigh`` treats
  uniformly; the device never sees it.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..linop import as_operator
from ..ops.ortho import M_SQRT1_2, cgs_dgks
from ..utils.history import History
from ..utils.random import rand_normalized_vector
from .decomposition import arnoldi_expand, default_invariant_tol
from .krylov_schur import _solver_dtype, _truncate_basis

__all__ = ["partial_eigh", "lanczos_selective_ortho", "SYM_SORTS"]


def make_lanczos_selective_ortho(n_locked):
    """Build a selective-orthogonalization kernel for thick-restart Lanczos.

    Projects against the ``n_locked`` leading (compressed Ritz) columns plus
    the last two active columns — the 3-term recurrence partners — and runs
    a full DGKS-checked CGS pass whenever the norm drop indicates leaked
    orthogonality.  Cheaper than full CGS when ``m >> n_locked + 2``; the
    full fallback bounds the damage from classical Lanczos orthogonality
    loss.  Kernels are cached per ``n_locked`` so jitted expansions do not
    retrace every restart.
    """
    return _selective_cache(int(n_locked))


import functools  # noqa: E402


@functools.lru_cache(maxsize=None)
def _selective_cache(n_locked):
    def kernel(V, w, n_active, *, tol=1e-8, eta=M_SQRT1_2):
        mp1 = V.shape[0]  # transposed layout: rows are basis vectors
        idx = jnp.arange(mp1)
        mask = (
            (idx < n_locked) | (idx == n_active - 1) | (idx == n_active - 2)
        ) & (idx < n_active)
        mask = mask.astype(V.dtype)

        beta_before = jnp.linalg.norm(w)
        c1 = jnp.matmul(V.conj(), w, precision=lax.Precision.HIGHEST) * mask
        w1 = w - jnp.matmul(c1, V, precision=lax.Precision.HIGHEST)
        beta1 = jnp.linalg.norm(w1)

        def full_pass(args):
            c1, w1, _ = args
            h2, w2, beta2, _ = cgs_dgks(V, w1, n_active, tol=tol, eta=eta)
            return c1 + h2, w2, beta2

        h, w2, beta = lax.cond(
            beta1 < eta * beta_before,
            full_pass,
            lambda args: args,
            (c1, w1, beta1),
        )
        return h, w2, beta, beta < tol

    return kernel


#: Backwards-compatible alias: selective kernel with no locked block.
lanczos_selective_ortho = make_lanczos_selective_ortho(0)


def _sym_sort(which):
    which = which.upper()
    if which == "LA":
        return lambda x: np.argsort(-np.real(x), kind="stable")
    if which == "SA":
        return lambda x: np.argsort(np.real(x), kind="stable")
    if which == "LM":
        return lambda x: np.argsort(-np.abs(x), kind="stable")
    if which == "SM":
        return lambda x: np.argsort(np.abs(x), kind="stable")
    raise ValueError(f"which={which!r}: expected LA, SA, LM or SM")


SYM_SORTS = ("LA", "SA", "LM", "SM")


def partial_eigh(
    A,
    nev,
    *,
    which="LA",
    max_dim=None,
    stopping_criterion=None,
    max_restarts=1000,
    ortho="cgs_dgks",
    dtype=None,
    key=None,
    v0=None,
    mesh=None,
    block_size=1,
):
    """Compute ``nev`` extremal eigenpairs of a HERMITIAN operator by
    thick-restart Lanczos.

    Parameters mirror :func:`arnoldi_tpu.partial_schur`; ``which`` is one of
    "LA", "SA", "LM", "SM".  ``ortho="selective"`` uses the 3-term-recurrence
    kernel with DGKS-triggered full reorthogonalization.

    ``block_size=b > 1`` runs BLOCK thick-restart Lanczos: each step applies
    the operator to b vectors at once (matmat) and orthogonalizes them with
    two block-gemm projections + CholQR2.  This both finds eigenvalues of
    multiplicity up to b (a single-vector Krylov space provably cannot) and
    amortizes every pass over the basis across b matvecs — the
    communication-avoiding structure that suits the MXU.

    Returns ``(eigenvalues, eigenvectors, history)`` — eigenvalues are real,
    ascending-sorted within the wanted set; eigenvectors are the (real if A
    is real) Ritz basis columns.
    """
    op = as_operator(A)
    n = op.shape[0]
    assert op.shape[1] == n

    tol = default_invariant_tol(op.dtype) if stopping_criterion is None \
        else float(stopping_criterion)
    sort_function = _sym_sort(which)
    assert max_restarts > 0

    b = int(block_size)
    assert b >= 1
    if max_dim is None:
        max_dim = min(max(2 * nev + 1, 20), n)
    if b > 1:
        # Block driver: dimensions snap to whole blocks.
        max_dim = -(-max_dim // b) * b
        p = min(-(-(nev + max(5, b)) // b) * b, max_dim - b)
        assert nev <= p < max_dim, (
            f"block geometry failed: nev={nev}, p={p}, max_dim={max_dim}, "
            f"b={b}; increase max_dim")
    else:
        p = min(nev + 5, max_dim - 1)
        assert nev <= p < max_dim
    assert max_dim <= n

    # Hermitian problems keep the dtype real for real operators everywhere
    # (including CPU): the projected matrix is symmetric tridiagonal.
    if dtype is None and np.issubdtype(np.dtype(op.dtype), np.floating):
        wdtype = jax.dtypes.canonicalize_dtype(
            np.result_type(op.dtype, np.float32))
    else:
        wdtype = _solver_dtype(op.dtype, dtype)

    selective = ortho == "selective"
    if selective:
        ortho = make_lanczos_selective_ortho(0)  # first expansion: no lock

    n_solve = n
    repl = None
    if mesh is not None:
        from ..linop import pad_operator
        from ..parallel.mesh import replicated_sharding

        n_dev = int(mesh.devices.size)
        n_solve = -(-n // n_dev) * n_dev
        op = pad_operator(op, n_solve)
        repl = replicated_sharding(mesh)

    V = jnp.zeros((max_dim + b, n_solve), dtype=wdtype)
    H = jnp.zeros((max_dim + b, max_dim), dtype=wdtype)

    if mesh is not None:
        from ..parallel.sharded import shard_operator, shard_workspace

        op = shard_operator(op, mesh)
        V, H = shard_workspace(V, H, mesh)

    if v0 is None:
        if key is None:
            key = jax.random.key(0)
        v0 = rand_normalized_vector(key, n, wdtype)
    else:
        v0 = jnp.asarray(v0, dtype=wdtype)
        v0 = v0 / jnp.linalg.norm(v0)
    if n_solve != n:
        v0 = jnp.concatenate([v0, jnp.zeros(n_solve - n, wdtype)])
    V = V.at[0, :].set(v0)
    if b > 1:
        # Fill the rest of the start block with random vectors and
        # orthonormalize the block (CholQR keeps row 0 parallel to v0).
        from ..ops.ortho import block_cgs2

        key2 = jax.random.key(0) if key is None else jax.random.split(key)[1]
        extra = jax.random.normal(key2, (b - 1, n_solve), dtype=wdtype)
        W0 = jnp.concatenate([v0[None, :], extra], axis=0)
        _, Q0, _, _ = block_cgs2(V, W0, 0, tol=tol)
        V = jax.lax.dynamic_update_slice(V, Q0, (0, 0))

    history = History.from_k(nev)
    has_converged = False
    total_matvecs = 0

    if b > 1:
        from .decomposition import _block_expand_jit

        V, H, jb = _block_expand_jit(op, V, H, tol, start_block=0,
                                     n_blocks=max_dim // b, b=b)
        m = int(jb) * b
    else:
        V, H, n_iter = arnoldi_expand(op, V, H, tol, start_dim=0,
                                      max_dim=max_dim, ortho=ortho)
        m = int(n_iter)
    total_matvecs += m

    hp = np.float64 if not np.issubdtype(np.dtype(wdtype), np.complexfloating) \
        else np.complex128
    H_trunc_hp = None
    prev_pa = 0
    theta_final = None
    for restart in range(max_restarts):
        happy_breakdown = m != max_dim
        if happy_breakdown and m < nev:
            raise ValueError(
                f"Invariant subspace of dimension {m} < nev={nev} found"
            )

        H_host = np.asarray(H).astype(hp)
        if H_trunc_hp is not None:
            H_host[: prev_pa + b, :prev_pa] = H_trunc_hp
        H_active = H_host[:m, :m]

        # Rayleigh-Ritz on the symmetric projected matrix (symmetrize to
        # scrub float32 roundoff).
        H_sym = (H_active + H_active.conj().T) / 2
        theta, S = np.linalg.eigh(H_sym)
        order = np.asarray(sort_function(theta))
        theta = theta[order]
        S = S[:, order]

        pa = min(p, m) if happy_breakdown else p
        if b > 1:
            pa = min(-(-pa // b) * b, m)
        Sp = S[:, :pa]

        V = _truncate_basis(V, jnp.asarray(Sp, dtype=wdtype), p=pa, m=m,
                            carry=b)

        H_new = np.zeros_like(H_host)
        H_new[np.arange(pa), np.arange(pa)] = theta[:pa]
        # Coupling block: the residual block's projections rotated by Sp
        # (for b == 1 this is the classic arrowhead row).
        H_new[pa : pa + b, :pa] = H_host[m : m + b, :m] @ Sp
        H_trunc_hp = H_new[: pa + b, :pa].copy()
        prev_pa = pa

        # Approximate residuals: || B S[last-b rows, i] || per Ritz pair.
        coupling_block = H_host[m : m + b, :m]
        approximate_residuals = np.linalg.norm(coupling_block @ S, axis=0)
        denom = np.abs(theta)
        denom = np.where(denom == 0, 1.0, denom)
        approximate_convergence = approximate_residuals / denom

        for k in range(nev):
            if approximate_convergence[k] <= tol:
                history.matvecs[k] = total_matvecs
                history.restarts[k] = restart + 1
        history.residual_trace.append(
            float(np.max(approximate_convergence[:nev])))

        has_converged = bool(np.all(approximate_convergence[:nev] < tol))
        if has_converged and happy_breakdown:
            history.matvecs[:] = np.maximum(history.matvecs, total_matvecs)
            history.restarts[:] = np.maximum(history.restarts, restart + 1)
        if (not has_converged) and happy_breakdown and pa >= m:
            raise ValueError(
                f"Krylov expansion saturated at dimension {m} without "
                f"convergence (block rank deficiency); reduce block_size or "
                f"max_dim, or use the scalar driver")
        if has_converged:
            theta_final = theta
            break

        H = jnp.asarray(H_new.astype(wdtype))
        if repl is not None:
            H = jax.device_put(H, repl)
        if b > 1:
            from .decomposition import _block_expand_jit

            V, H, jb = _block_expand_jit(op, V, H, tol, start_block=pa // b,
                                         n_blocks=max_dim // b, b=b)
            m_new = int(jb) * b
        else:
            if selective:
                # After a thick restart the leading pa+1 rows are the
                # compressed Ritz block; new vectors must stay orthogonal
                # to it.
                ortho = make_lanczos_selective_ortho(pa + 1)
            V, H, n_iter = arnoldi_expand(op, V, H, tol, start_dim=pa,
                                          max_dim=max_dim, ortho=ortho)
            m_new = int(n_iter)
        total_matvecs += m_new - pa
        m = m_new

    history.total = total_matvecs
    if not has_converged:
        raise ValueError("Has not converged !")

    eigenvalues = np.real(theta_final[:nev])
    eigenvectors = V[:nev, :n].T
    return eigenvalues, eigenvectors, history
