"""Pallas ELLPACK SpMV kernel.

``y[r] = sum_l data[r, l] * x[cols[r, l]]`` with ``x`` held VMEM-resident
and the gather executed on-chip per row tile.  General sparsity is the hard
case on TPU (no scatter/gather hardware on the vector path); keeping the
source vector in VMEM at least keeps every gathered element on-chip instead
of issuing HBM-latency loads, and the multiply/reduce runs on the VPU.

Current limit: ``x`` must fit in VMEM (n up to ~4M float32).  The XLA
``jnp.take`` path remains the fallback (and the baseline this kernel is
benchmarked against).

MEASURED REALITY (v5e, jax 0.9 Mosaic): the toolchain lowers
``take_along_axis`` gathers ONLY within a single (8, 128) vector register
— every realistic shape fails to compile (probed: (8,1024)/(8,65536)
lane gathers, (64..1024, 128) sublane gathers, shorter-index variants; only
(8,128)-from-(8,128) compiles).  A general scattered gather therefore
CANNOT be expressed in-kernel; this kernel runs in interpret mode for
tests and compiles only for toy widths.  The production answer for
scattered sparsity is the BSR-8 operator: measured on mark(1000)
(n=500k) on-chip, XLA scalar-ELL gather = 14.9 ms/matvec vs BSR-8 =
3.6 ms — the dense 8x8 blocks amortize the gather 8x and feed the MXU.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ceil_to(x, m):
    return -(-x // m) * m


@partial(jax.jit, static_argnames=("interpret", "block_rows"))
def ell_matvec_pallas(data, cols, x, *, interpret=False, block_rows=4096):
    """ELL matvec.  data/cols: (n, L); x: (n_cols,) — the gather width
    comes from x itself, so rectangular operators work too."""
    n, L = data.shape
    assert x.ndim == 1
    out_dtype = jnp.result_type(data.dtype, x.dtype)

    block = block_rows
    n_pad = _ceil_to(n, block)
    if n_pad != n:
        data = jnp.pad(data, ((0, n_pad - n), (0, 0)))
        cols = jnp.pad(cols, ((0, n_pad - n), (0, 0)))

    grid = (n_pad // block,)

    def kernel(d_ref, c_ref, x_ref, o_ref):
        # Mosaic supports 2-D gathers: gather from the (1, n) operand with a
        # flat index vector, then reshape back to the (block, L) tile.
        flat_idx = c_ref[:, :].reshape(1, block * L)
        g = jnp.take_along_axis(
            jnp.broadcast_to(x_ref[:, :], (1, x_ref.shape[1])),
            flat_idx, axis=1,
        )  # (1, block*L)
        gathered = g.reshape(block, L)
        o_ref[:, 0] = jnp.sum(
            d_ref[:, :].astype(out_dtype) * gathered.astype(out_dtype),
            axis=1,
        )

    y = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_pad, 1), out_dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block, L), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, L), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # full x, resident
        ],
        out_specs=pl.BlockSpec((block, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(data, cols, x[None, :].astype(out_dtype))
    return y[:n, 0]
