"""Double-word (df32) sparse matvecs: ``y = A x`` with f32 operator
storage and double-word vectors, accurate to ~1e-15 relative.

The operator entries stay plain float32 (they are EXACT data — the f32
cast of the matrix happened once at load time); only the Krylov vectors
carry a compensation limb.  Each elementwise product ``a_ij * x_j`` is
computed error-free (``two_prod`` on the hi limb + f32 product with the lo
limb) and accumulated with the compensated pairwise tree, so the matvec
error is O(u^2 log n) instead of O(u sqrt(n)) — the piece that makes 1e-8
residuals attainable on a device with no float64 (see ops/df32.py).

Formats mirror ``arnoldi_tpu.linop``: banded/DIA (shift-and-add), ELL
(gather + row reduction), BSR (block gather, loop over the small static
block-slot axis to bound temporaries), dense (row-chunked).
"""

import jax
import jax.numpy as jnp

from .df32 import dw_add, dw_sum, fast_two_sum, two_prod

__all__ = ["dw_matvec"]


def _shift(x, off):
    if off == 0:
        return x
    if off > 0:
        return jnp.concatenate([x[off:], jnp.zeros(off, x.dtype)])
    return jnp.concatenate([jnp.zeros(-off, x.dtype), x[:off]])


def banded_matvec_dw(bands, offsets, xh, xl):
    n = xh.shape[0]
    yh = jnp.zeros(n, jnp.float32)
    yl = jnp.zeros(n, jnp.float32)
    for d, off in enumerate(offsets):
        b = bands[d]
        ph, pl = two_prod(b, _shift(xh, off))
        ph, pl = fast_two_sum(ph, pl + b * _shift(xl, off))
        yh, yl = dw_add(yh, yl, ph, pl)
    return yh, yl


def ell_matvec_dw(data, cols, xh, xl):
    gh = jnp.take(xh, cols, axis=0)  # (n, L)
    gl = jnp.take(xl, cols, axis=0)
    ph, pl = two_prod(data, gh)
    ph, pl = fast_two_sum(ph, pl + data * gl)
    return dw_sum(ph, pl, axis=1)


def bsr_matvec_dw(blocks, block_cols, n_rows, n_cols, xh, xl):
    nb, L, r, c = blocks.shape
    n_bcol_pad = -(-n_cols // c) * c
    xph = jnp.zeros(n_bcol_pad, jnp.float32).at[:n_cols].set(xh)
    xpl = jnp.zeros(n_bcol_pad, jnp.float32).at[:n_cols].set(xl)
    xbh = xph.reshape(-1, c)
    xbl = xpl.reshape(-1, c)
    yh = jnp.zeros((nb, r), jnp.float32)
    yl = jnp.zeros((nb, r), jnp.float32)
    # Static loop over the (small) block-slot axis keeps the per-step
    # temporary at (nb, r, c) instead of (nb, L, r, c).
    for l in range(L):
        gh = jnp.take(xbh, block_cols[:, l], axis=0)  # (nb, c)
        gl = jnp.take(xbl, block_cols[:, l], axis=0)
        B = blocks[:, l]                               # (nb, r, c)
        ph, pl = two_prod(B, gh[:, None, :])
        ph, pl = fast_two_sum(ph, pl + B * gl[:, None, :])
        sh, sl = dw_sum(ph, pl, axis=-1)               # (nb, r)
        yh, yl = dw_add(yh, yl, sh, sl)
    return yh.reshape(-1)[:n_rows], yl.reshape(-1)[:n_rows]


def dense_matvec_dw(A, xh, xl, row_chunk=256):
    n, m = A.shape
    pad = (-n) % row_chunk
    Ap = jnp.pad(A, ((0, pad), (0, 0))).reshape(-1, row_chunk, m)

    def chunk(Ac):
        ph, pl = two_prod(Ac, xh[None, :])
        ph, pl = fast_two_sum(ph, pl + Ac * xl[None, :])
        return dw_sum(ph, pl, axis=-1)

    yh, yl = jax.lax.map(chunk, Ap)
    return yh.reshape(-1)[:n], yl.reshape(-1)[:n]


def dw_matvec(op, xh, xl, op_lo=None):
    """``A @ x`` with a double-word vector; dispatches on operator type.

    ``op`` holds the float32 cast of the matrix (the TPU work format);
    ``op_lo``, when given, holds the CAST RESIDUAL ``A - f32(A)`` (same
    format, f32 storage).  Its contribution is ~eps * ||A|| * ||x||, so a
    PLAIN f32 matvec of the hi limb suffices (its own rounding is O(eps^2))
    — one cheap extra matvec recovers the original f64 matrix exactly to
    double-word accuracy.
    """
    from ..linop import (BandedOperator, BsrOperator, DenseOperator,
                         EllOperator)

    if isinstance(op, BandedOperator):
        yh, yl = banded_matvec_dw(op.bands, op.offsets, xh, xl)
    elif isinstance(op, EllOperator):
        yh, yl = ell_matvec_dw(op.data, op.cols, xh, xl)
    elif isinstance(op, BsrOperator):
        yh, yl = bsr_matvec_dw(op.blocks, op.block_cols, op.shape[0],
                               op.shape[1], xh, xl)
    elif isinstance(op, DenseOperator):
        yh, yl = dense_matvec_dw(op.A, xh, xl)
    else:
        raise TypeError(
            f"double-word matvec not implemented for {type(op).__name__}; "
            "supply a Banded/Ell/Bsr/Dense operator")
    if op_lo is not None:
        from .df32 import dw_add_fl

        yh, yl = dw_add_fl(yh, yl, op_lo.matvec(xh).astype(jnp.float32))
    return yh, yl
