"""Pallas banded (DIA) SpMV kernel.

``y[i] = sum_d bands[d][i] * x[i + offsets[d]]`` — the stencil matvec for
the Laplace operator family.  The XLA fallback in
:class:`arnoldi_tpu.linop.BandedOperator` materializes one shifted copy of
``x`` per diagonal (k pad+concat temporaries, ~3k vector round-trips to
HBM); this kernel keeps the haloed ``x`` resident in VMEM, streams each
band tile through once, and accumulates in registers: bytes moved
~= bands + x + y, the bandwidth lower bound.

Current limit: ``x`` must fit in VMEM (~16 MB => n up to ~4M float32);
beyond that the operator falls back to the XLA path.  A double-buffered
windowed variant is the follow-up for larger n.

Measured on-chip (n = 2.1M pentadiagonal, replay-proof): 1.66 ms/matvec vs
1.23 ms for the XLA shift-add path — XLA's fusion currently wins (this
kernel still pads its output to 8 sublane copies), so the XLA backend
remains the default; the kernel is kept as the explicit-staging variant
and the basis for the halo-exchange/remote-DMA follow-up.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ceil_to(x, m):
    return -(-x // m) * m


@partial(jax.jit, static_argnames=("offsets", "interpret", "block_rows"))
def banded_matvec_pallas(bands, x, offsets, *, interpret=False,
                         block_rows=8192):
    """Banded matvec. ``bands``: (k, n) aligned as in
    :class:`arnoldi_tpu.linop.BandedOperator` (``bands[d][i]`` multiplies
    ``x[i + offsets[d]]``); ``offsets``: static tuple; ``x``: (n,).
    """
    k, n = bands.shape
    assert x.shape == (n,)
    out_dtype = jnp.result_type(bands.dtype, x.dtype)

    halo = int(max((abs(int(o)) for o in offsets), default=0))
    halo_pad = _ceil_to(max(halo, 1), 128)
    block = block_rows
    n_pad = _ceil_to(n, block)

    # x staged as (1, n_pad + 2*halo_pad) with zero halos; bands (k, n_pad).
    xp = jnp.zeros((8, n_pad + 2 * halo_pad), dtype=out_dtype)
    xp = jax.lax.dynamic_update_slice(
        xp, x.astype(out_dtype)[None, :], (0, halo_pad))
    # Pad the band count to a full sublane tile (Mosaic rejects sub-8
    # sublane block shapes on some toolchains).
    k_pad = -(-k // 8) * 8
    bp = jnp.zeros((k_pad, n_pad), dtype=out_dtype)
    bp = jax.lax.dynamic_update_slice(bp, bands.astype(out_dtype), (0, 0))

    grid = (n_pad // block,)

    def kernel(b_ref, x_ref, o_ref):
        i = pl.program_id(0)
        # One ALIGNED dynamic window per tile (start = i*block, a lane
        # multiple); the per-diagonal offsets are applied as STATIC slices
        # of the window — Mosaic handles static unaligned slices but not
        # unaligned dynamic ones.
        win = x_ref[0:1, pl.ds(pl.multiple_of(i * block, 128),
                               block + 2 * halo_pad)]
        acc = jnp.zeros((1, block), dtype=out_dtype)
        for d, off in enumerate(offsets):
            lo = halo_pad + int(off)
            seg = win[:, lo : lo + block]
            acc = acc + b_ref[d:d + 1, :] * seg
        o_ref[:, :] = jnp.broadcast_to(acc, o_ref.shape)

    y = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, n_pad), out_dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((k_pad, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # full haloed x
        ],
        out_specs=pl.BlockSpec((8, block), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(bp, xp)
    return y[0, :n]
