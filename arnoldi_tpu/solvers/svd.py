"""Partial SVD via thick-restart Lanczos (``svds``).

scipy.sparse.linalg.svds-compatible: the largest (or smallest, via
shift-invert on the Gram operator) ``k`` singular triplets of a rectangular
operator.  Built entirely from existing framework pieces: Lanczos runs on
the Gram operator ``A^H A`` (one extra matvec per iteration, no explicit
Gram matrix), singular values are ``sqrt(theta)``, right vectors are the
Ritz vectors, and left vectors are recovered as ``A v / sigma``.
"""

import numpy as np

import jax
import jax.numpy as jnp

from ..linop import CallableOperator, as_operator

__all__ = ["svds"]


def svds(A, k=6, *, which="LM", tol=None, ncv=None, maxiter=1000,
         dtype=None, key=None, block_size=1,
         return_singular_vectors=True):
    """Compute the ``k`` largest singular triplets of ``A`` (n x m, n >= m
    or transposed internally).

    Returns ``(U, s, Vh)`` like scipy.sparse.linalg.svds (with ``s``
    ascending), or just ``s`` when ``return_singular_vectors=False``.
    """
    if which != "LM":
        raise NotImplementedError(
            "svds currently supports which='LM' (largest singular values); "
            "use eigsh with a shift on the Gram operator for the smallest")

    op = as_operator(A, dtype=dtype)
    n_rows, n_cols = op.shape

    # Work with the smaller Gram dimension: A^H A (m x m) if m <= n.
    transposed = n_rows < n_cols
    if transposed:
        raise NotImplementedError(
            "svds requires n_rows >= n_cols; pass A.T and swap U/Vh")

    def gram_mv(x):
        return _rmatvec(op, op.matvec(x))

    gram = CallableOperator(gram_mv, (n_cols, n_cols), op.dtype, nnz=op.nnz)

    from .lanczos import partial_eigh

    theta, V, hist = partial_eigh(
        gram, k, which="LA", max_dim=ncv, stopping_criterion=tol,
        max_restarts=maxiter, dtype=dtype, key=key, block_size=block_size,
    )
    theta = np.maximum(np.asarray(theta), 0.0)
    order = np.argsort(theta)  # scipy returns ascending singular values
    s = np.sqrt(theta[order])
    if not return_singular_vectors:
        return s

    V = jnp.asarray(V)[:, jnp.asarray(order)]
    AV = op.matmat(V)  # (n, k)
    safe = jnp.asarray(np.where(s == 0, 1.0, s), dtype=AV.dtype)
    U = AV / safe[None, :]
    # Re-normalize U columns (guards tiny sigma roundoff).
    norms = jnp.linalg.norm(U, axis=0)
    U = U / jnp.where(norms == 0, 1.0, norms)[None, :]
    return np.asarray(U), s, np.asarray(V).conj().T


def _rmatvec(op, y):
    """``A^H y`` for the framework operators (square general case uses the
    explicit adjoint where cheap; ELL/banded fall back to jnp ops)."""
    from ..linop import BandedOperator, DenseOperator, EllOperator

    if isinstance(op, DenseOperator):
        return jnp.matmul(op.A.conj().T, y,
                          precision=jax.lax.Precision.HIGHEST)
    if isinstance(op, EllOperator):
        # scatter-add of y[r] * conj(data[r, l]) into cols[r, l]
        n = op.shape[1]
        contrib = (op.data.conj() * y[:, None]).reshape(-1)
        idx = op.cols.reshape(-1)
        return jnp.zeros(n, contrib.dtype).at[idx].add(contrib)
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
