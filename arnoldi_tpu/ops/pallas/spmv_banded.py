"""Pallas banded (DIA) SpMV kernel — 2-D tiled layout.

``y[i] = sum_d bands[d][i] * x[i + offsets[d]]`` — the stencil matvec for
the Laplace operator family.

Design (third iteration, measured on-chip):

* v1 (round 1) kept x as one long ``(1, N)`` row: every VPU op then uses a
  single sublane of each (8, 128) vector register — 1/8 throughput — and
  padded bands 5->8 sublanes.  Measured 0.95 ms/matvec at n=2.1M.
* v2 removed the 8-sublane output broadcast: 0.88 ms.
* THIS version reshapes x into ``(R, cols)`` rows with ``halo``-column
  overlaps built from three strided reshapes + one concat (NOT a gather —
  a windowed gather measured 21 ms), so every kernel op is a full
  ``(row_block, cols)`` tile and the band arrays stream unpadded.
  Measured 0.68 ms/matvec vs 0.66 ms for XLA's fused shift-and-add —
  PARITY; the ~0.03 ms staging concat is the remaining difference.

XLA's fusion is at parity on this streaming stencil, so the XLA backend
stays the default; the kernel remains the explicit-staging variant
(``backend="pallas"``) and the base for halo/remote-DMA extensions.
Works for any n (the old whole-x-in-VMEM limit is gone: only
``(row_block, cols + 2*halo)`` tiles are resident).
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ceil_to(x, m):
    return -(-x // m) * m


@partial(jax.jit, static_argnames=("offsets", "interpret", "cols",
                                   "row_block"))
def banded_matvec_pallas(bands, x, offsets, *, interpret=False, cols=8192,
                         row_block=8):
    """Banded matvec. ``bands``: (k, n) aligned as in
    :class:`arnoldi_tpu.linop.BandedOperator` (``bands[d][i]`` multiplies
    ``x[i + offsets[d]]``); ``offsets``: static tuple; ``x``: (n,).
    """
    k, n = bands.shape
    assert x.shape == (n,)
    out_dtype = jnp.result_type(bands.dtype, x.dtype)

    halo = int(max((abs(int(o)) for o in offsets), default=0))
    h = _ceil_to(max(halo, 1), 128)
    C = cols
    while h > C:
        C *= 2  # widen rows until the halo fits one row overlap
    n_pad = _ceil_to(n, C * row_block)
    R = n_pad // C

    # xpad[h + i] = x[i]; length covers all three strided views below.
    xpad = jnp.zeros(n_pad + C + 2 * h, out_dtype)
    xpad = jax.lax.dynamic_update_slice(xpad, x.astype(out_dtype), (h,))
    # Overlapping rows xs[r] = xpad[r*C : r*C + C + 2h] via three strided
    # reshapes + one concat (a windowed GATHER here is ~30x slower).
    L = xpad[: R * C].reshape(R, C)[:, :h]
    M = xpad[h : h + R * C].reshape(R, C)
    Rt = xpad[C + h : C + h + R * C].reshape(R, C)[:, :h]
    xs = jnp.concatenate([L, M, Rt], axis=1)          # (R, C + 2h)

    bp = bands.astype(out_dtype)
    if n_pad != n:
        bp = jnp.pad(bp, ((0, 0), (0, n_pad - n)))
    b3 = bp.reshape(k, R, C)

    grid = (R // row_block,)

    def kernel(b_ref, xs_ref, o_ref):
        acc = jnp.zeros((row_block, C), dtype=out_dtype)
        for d, off in enumerate(offsets):
            lo = h + int(off)
            acc = acc + b_ref[d] * xs_ref[:, lo : lo + C]
        o_ref[:, :] = acc

    y = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((R, C), out_dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((k, row_block, C), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((row_block, C + 2 * h), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((row_block, C), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(b3, xs)
    return y.reshape(-1)[:n]
