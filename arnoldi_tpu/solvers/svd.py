"""Partial SVD via thick-restart Lanczos (``svds``).

scipy.sparse.linalg.svds-compatible: the largest (``which='LM'``) or
smallest (``which='SM'``) ``k`` singular triplets of a rectangular
operator.  Built entirely from existing framework pieces: Lanczos runs on
the Gram operator over the *smaller* dimension — ``A^H A`` when ``A`` is
tall, ``A A^H`` when ``A`` is wide (the internal-transpose trick the
reference's scipy comparison path relies on) — with one extra matvec per
iteration and no explicit Gram matrix.  Singular values are
``sqrt(theta)``; the missing singular-vector side is recovered as
``A v / sigma`` (or ``A^H u / sigma``).
"""

import numpy as np

import jax
import jax.numpy as jnp

from ..linop import CallableOperator, as_operator

__all__ = ["svds"]

_PREC = jax.lax.Precision.HIGHEST


def svds(A, k=6, *, which="LM", sigma=None, tol=None, ncv=None,
         maxiter=1000, dtype=None, key=None, v0=None, block_size=1,
         inner_solver="gmres", inner_tol=None,
         return_singular_vectors=True):
    """Compute ``k`` singular triplets of ``A`` (any shape; wide matrices
    are handled by running Lanczos on ``A A^H`` internally).

    Returns ``(U, s, Vh)`` like scipy.sparse.linalg.svds (with ``s``
    ascending), or just ``s`` when ``return_singular_vectors=False``.
    ``which='LM'`` selects the largest singular values, ``'SM'`` the
    smallest.  ``sigma`` (an extension over scipy's svds, which has no
    shift-invert surface at all — MATLAB-svds-style) selects the ``k``
    singular values NEAREST ``sigma``: shift-invert Lanczos on the Gram
    operator at ``sigma**2`` converges a buffered set (k + max(2, k//2)
    values, nearest in the SQUARED domain), from which the k nearest in
    the linear domain are selected — the two orderings can disagree near
    the cut because |s^2 - sigma^2| overweights values above sigma (an
    adversarial spectrum could in principle need a larger buffer; pass a
    larger ``k`` and slice if that matters).  The inner solve is an
    iterative Krylov solve (``inner_solver``, default GMRES — the shifted
    Gram is indefinite), so small-end spectra no longer need the slow
    direct ``which='SM'`` iteration.  ``v0`` is the scipy start vector of length
    ``min(A.shape)`` (the Gram dimension).
    """
    if which not in ("LM", "SM"):
        raise ValueError(
            f"which={which!r}: expected 'LM' (largest) or 'SM' (smallest)")

    op = as_operator(A, dtype=dtype)
    n_rows, n_cols = op.shape

    # Lanczos runs on the Gram operator over the smaller dimension.
    transposed = n_rows < n_cols
    if transposed:
        gram_dim = n_rows

        def gram_mv(x):
            return op.matvec(_rmatvec(op, x))
    else:
        gram_dim = n_cols

        def gram_mv(x):
            return _rmatvec(op, op.matvec(x))

    gram = CallableOperator(gram_mv, (gram_dim, gram_dim), op.dtype,
                            nnz=op.nnz,
                            fn_dw=_gram_dw(A, op, transposed))

    from .lanczos import partial_eigh

    eig_which = "LA" if which == "LM" else "SA"
    if v0 is not None:
        v0 = np.asarray(v0)
        assert v0.shape == (gram_dim,), (v0.shape, gram_dim)
    if sigma is not None:
        # Shift-invert on the Gram operator: Gram eigenvalues are
        # sigma_i^2, so singular values nearest |sigma| are Gram
        # eigenvalues nearest sigma^2.  The transformed problem is solved
        # for its LARGEST eigenvalues (nu = 1/(theta - sigma^2)) and
        # back-transformed.
        from .spectral_transform import (_transform_back,
                                         shift_invert_operator)

        sig2 = float(np.real(sigma)) ** 2
        if tol is None:
            tol = float(np.sqrt(np.finfo(op.dtype).eps))
        itol = inner_tol if inner_tol is not None else tol * 1e-2
        si = shift_invert_operator(gram, sig2, solver=inner_solver,
                                   inner_tol=itol, dtype=dtype)
        # "Nearest sigma" is a LINEAR-domain metric, but shift-invert on
        # the Gram operator converges by |sigma_i^2 - sigma^2| =
        # |sigma_i - sigma| * (sigma_i + sigma), which overweights values
        # ABOVE sigma; the two orderings can disagree near the cut.  Solve
        # a buffered set in the Gram domain, then select the k nearest
        # |sigma| linearly.
        kk = k + max(2, k // 2)
        if ncv is not None:
            kk = min(kk, ncv - 1)
        kk = max(k, min(kk, gram_dim - 1))
        nu, W, hist = partial_eigh(
            si, kk, which="LM", max_dim=ncv, stopping_criterion=tol,
            max_restarts=maxiter, dtype=dtype, key=key, v0=v0,
            block_size=block_size,
        )
        theta = np.asarray(_transform_back(np.asarray(nu), sig2)).real
        if kk > k:
            sv_lin = np.sqrt(np.maximum(theta, 0.0))
            pick = np.argsort(np.abs(sv_lin - abs(float(np.real(sigma)))),
                              kind="stable")[:k]
            theta = theta[pick]
            W = np.asarray(W)[:, pick]
    else:
        theta, W, hist = partial_eigh(
            gram, k, which=eig_which, max_dim=ncv, stopping_criterion=tol,
            max_restarts=maxiter, dtype=dtype, key=key, v0=v0,
            block_size=block_size,
        )
    theta = np.maximum(np.asarray(theta), 0.0)
    order = np.argsort(theta)  # scipy returns ascending singular values
    s = np.sqrt(theta[order])
    if not return_singular_vectors:
        return s

    W = jnp.asarray(W)[:, jnp.asarray(order)]
    safe = np.where(s == 0, 1.0, s)
    if transposed:
        # gram = A A^H: W holds left singular vectors; V = A^H U / sigma.
        U = W
        V = _rmatmat(op, U) / jnp.asarray(safe, U.dtype)[None, :]
        V = _renormalize(V)
    else:
        # gram = A^H A: W holds right singular vectors; U = A V / sigma.
        V = W
        U = op.matmat(V) / jnp.asarray(safe, V.dtype)[None, :]
        U = _renormalize(U)
    return np.asarray(U), s, np.asarray(V).conj().T


def _gram_dw(A_src, op, transposed):
    """Double-word companion matvec for the Gram operator (``fn_dw``), so
    ``partial_eigh``'s dw refinement can engage for ``svds`` tolerances
    below the f32 floor.

    The adjoint leg is a MATERIALIZED ``A^H`` operator in a device format
    with its own cast residual (a compensated scatter-add adjoint per
    format would duplicate every df32 kernel; a host transpose is one
    cheap conversion at build time).  Returns None when ``A_src`` carries
    no exact f64 source (closure input) or the work dtype is not f32 —
    then the f32 Gram is the exact target and refinement has nothing to
    recover.
    """
    import scipy.sparse as sp

    from ..ops.df32_linop import dw_matvec
    from .refine import build_cast_residual_operator

    if np.dtype(op.dtype) != np.float32:
        return None
    if sp.issparse(A_src):
        At = sp.csr_matrix(A_src).conj().T.tocsr()
    elif isinstance(A_src, np.ndarray):
        At = np.ascontiguousarray(A_src.conj().T)
    else:
        return None
    try:
        opT = as_operator(At, dtype=np.float32)
    except ValueError as e:
        # The adjoint can be unbuildable in any padded device format even
        # when A itself is fine (a few super-dense COLUMNS of A become
        # super-dense ROWS of A^H — linop._check_padded_layout).  Without
        # the companion the f32 Gram is the refinement target; warn so a
        # tol below the f32 floor fails loudly for a known reason.
        import warnings

        warnings.warn(
            "svds: no device layout for the adjoint operator — double-word "
            f"refinement disabled, f32-floor accuracy only ({e})",
            RuntimeWarning, stacklevel=3)
        return None
    lo = build_cast_residual_operator(A_src, op)
    loT = build_cast_residual_operator(At, opT)

    if transposed:  # gram = A A^H
        def fn_dw(xh, xl):
            zh, zl = dw_matvec(opT, xh, xl, loT)
            return dw_matvec(op, zh, zl, lo)
    else:           # gram = A^H A
        def fn_dw(xh, xl):
            zh, zl = dw_matvec(op, xh, xl, lo)
            return dw_matvec(opT, zh, zl, loT)
    return fn_dw


def _renormalize(X):
    """Unit-normalize columns (guards tiny-sigma roundoff; a zero column —
    exact null-space direction recovered with sigma=0 — is left as-is)."""
    norms = jnp.linalg.norm(X, axis=0)
    return X / jnp.where(norms == 0, 1.0, norms)[None, :]


def _rmatvec(op, y):
    """``A^H y`` for the framework operators (dense/ELL/BSR/banded; wrap
    anything else in a CallableOperator providing the Gram matvec)."""
    from ..linop import (BandedOperator, BsrOperator, DenseOperator,
                         EllOperator)

    if isinstance(op, DenseOperator):
        return jnp.matmul(op.A.conj().T, y, precision=_PREC)
    if isinstance(op, EllOperator):
        # scatter-add of y[r] * conj(data[r, l]) into cols[r, l]
        n = op.shape[1]
        contrib = (op.data.conj() * y[:, None]).reshape(-1)
        idx = op.cols.reshape(-1)
        return jnp.zeros(n, contrib.dtype).at[idx].add(contrib)
    if isinstance(op, BsrOperator):
        # Block scatter-add: x_block[cols[i,l]] += blocks[i,l]^H @ y_block[i]
        # (mirrors BsrOperator.matvec's block gather; auto-selected format
        # on the TPU backend, linop.py as_operator).
        r, c = op.blockshape
        n_row_pad = op.blocks.shape[0] * r
        yp = jnp.zeros(n_row_pad, y.dtype).at[: op.shape[0]].set(y)
        yb = yp.reshape(-1, r)                       # (n_brow, r)
        contrib = jnp.einsum("blrc,br->blc", op.blocks.conj(), yb,
                             precision=_PREC)        # (n_brow, L, c)
        n_bcol = -(-op.shape[1] // c)
        out = jnp.zeros((n_bcol, c), contrib.dtype)
        out = out.at[op.block_cols.reshape(-1)].add(contrib.reshape(-1, c))
        return out.reshape(-1)[: op.shape[1]]
    if isinstance(op, BandedOperator):
        # (A^H y)[j] = sum_d conj(bands[d][j - off]) * y[j - off]
        n = op.shape[0]
        out = jnp.zeros(n, jnp.result_type(op.dtype, y.dtype))
        for d, off in enumerate(op.offsets):
            prod = op.bands[d].conj() * y
            if off == 0:
                out = out + prod
            elif off > 0:
                out = out.at[off:].add(prod[:-off])
            else:
                out = out.at[:off].add(prod[-off:])
        return out
    raise TypeError(
        f"adjoint matvec not implemented for {type(op).__name__}; "
        "wrap A with a CallableOperator providing the Gram matvec directly")


def _rmatmat(op, Y):
    """``A^H Y`` column-wise (the dense tier gets one gemm)."""
    from ..linop import DenseOperator

    if isinstance(op, DenseOperator):
        return jnp.matmul(op.A.conj().T, Y, precision=_PREC)
    return jax.vmap(lambda y: _rmatvec(op, y), in_axes=1, out_axes=1)(Y)
