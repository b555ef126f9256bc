"""Pallas BSR block-gather SpMV kernel (the remaining untried hot shape).

``y_block[i] = sum_l blocks[i, l] @ x_block[cols[i, l]]`` — the scattered-
sparsity matvec in the BSR-8 encoding of :class:`arnoldi_tpu.linop.
BsrOperator`.  The XLA path (``jnp.take`` + batched einsum) materializes
the gathered operand ``(n_brow, L, c)`` between the two ops; this kernel
keeps the whole padded ``x`` resident in VMEM, streams only the block
tiles + their column ids from HBM, and fuses gather, multiply, and the
block-row reduction — one HBM pass over the block data, zero intermediate
traffic.

Mapping notes (measured; see ``bsr_bench`` artifacts):

* The per-block ``(8, 8) @ (8,)`` products are NOT sent to the MXU — a
  128x128 systolic pass per 8x8 block would run at 0.4% utilization.  The
  contraction is done on the VPU as an elementwise multiply + in-register
  reduction over the ``(l, c)`` axes; the op is HBM-bandwidth-bound (the
  block data is read once and used for 2 flops/word), so VPU lane waste
  is invisible.
* The gather runs as one ``jnp.take`` of ``(TR * L)`` block-rows from the
  VMEM-resident ``(n_bcol, c)`` x table per tile (Mosaic lowers
  per-sublane dynamic gathers); indices arrive as a streamed ``(TR, L)``
  int32 VMEM tile, not scalar prefetch (the id table is megabytes at 1M
  rows — far beyond SMEM).
* VMEM budget: x occupies ``n_bcol * c * 4`` bytes (4 MB at n=1M f32), so
  the kernel applies up to a few-million rows; the driver falls back to
  the XLA path beyond.

Reference anchor: SURVEY §7 hard-part 3 (irregular-sparsity SpMV on a
dense-tiling ISA); the scalar-ELL gather dead end is documented in
``spmv_ell.py`` — block ids amortize one index over 64 stored values,
which is what makes this shape viable where per-element ids were not.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ceil_to(x, m):
    return -(-x // m) * m


@partial(jax.jit, static_argnames=("n_rows", "interpret", "row_tile"))
def bsr_matvec_pallas(blocks, block_cols, x, *, n_rows=None, interpret=False,
                      row_tile=256):
    """BSR matvec.  ``blocks``: (n_brow, L, r, c) zero-padded dense blocks;
    ``block_cols``: (n_brow, L) int32 (padding slots must point at a
    zero block or a valid id — their product is zero either way);
    ``x``: (n,).  Returns ``y`` (n_rows,)."""
    n_brow, L, r, c = blocks.shape
    n = x.shape[0]
    if n_rows is None:
        n_rows = n
    out_dtype = jnp.result_type(blocks.dtype, x.dtype)

    # Padded x table: one row per block column.
    n_bcol = _ceil_to(n, c) // c
    xp = jnp.zeros(n_bcol * c, out_dtype).at[:n].set(x.astype(out_dtype))
    xb = xp.reshape(n_bcol, c)

    # Pad block rows to the tile size.
    TR = row_tile
    n_brow_pad = _ceil_to(n_brow, TR)
    if n_brow_pad != n_brow:
        blocks = jnp.pad(
            blocks, ((0, n_brow_pad - n_brow), (0, 0), (0, 0), (0, 0)))
        block_cols = jnp.pad(
            block_cols, ((0, n_brow_pad - n_brow), (0, 0)))

    def kernel(cols_ref, x_ref, b_ref, y_ref):
        cols = cols_ref[:]                              # (TR, L) int32
        xg = jnp.take(x_ref[:], cols.reshape(-1), axis=0)   # (TR*L, c)
        xg = xg.reshape(TR, L, 1, c)
        # VPU contraction over (l, c): one multiply + tree-reduce, no MXU.
        y_ref[:, :] = jnp.sum(b_ref[:] * xg, axis=(1, 3))   # (TR, r)

    y = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_brow_pad, r), out_dtype),
        grid=(n_brow_pad // TR,),
        in_specs=[
            pl.BlockSpec((TR, L), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_bcol, c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),      # x resident
            pl.BlockSpec((TR, L, r, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TR, r), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(block_cols, xb, blocks.astype(out_dtype))
    return y.reshape(-1)[:n_rows]


def bsr_matvec_pallas_for(op, *, interpret=False, row_tile=256):
    """Closure over a :class:`~arnoldi_tpu.linop.BsrOperator`."""
    return lambda x: bsr_matvec_pallas(
        op.blocks, op.block_cols, x, n_rows=op.n_rows, interpret=interpret,
        row_tile=row_tile)
