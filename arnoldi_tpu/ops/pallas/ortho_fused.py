"""Pallas fused blocked Gram-Schmidt kernels (transposed basis layout).

The basis is ``Vt: (m+1, n)`` — each Krylov vector a contiguous row.  The
CGS projection is two streaming passes over ``Vt``:

1. ``c = mask * (Vt @ w)`` — per column-tile partial products accumulated
   into the output across sequential grid steps,
2. ``w' = w - c @ Vt`` with ``||w'||^2`` accumulated in the same pass — the
   fusion XLA does not do (it materializes ``w'`` then re-reads it for the
   norm).

Together one DGKS-checked CGS pass touches ``Vt`` exactly twice — the
bandwidth lower bound.  Real dtypes only (the TPU device path); the complex
CPU path keeps the XLA implementation.

MEASURED on-chip (v5e, n=524k, m=80, f32, slope-corrected): the XLA cgs2
path runs 1.51 ms/iter (0.95 with the segmented expansion) vs 2.03 ms/iter
for this kernel — XLA already fuses the mask into its projection matmuls
and pipelines the streaming passes better than the hand-tiled grid, and
the only traffic this fusion saves (re-reading w for the norm, ~2 MB vs
the 170 MB basis read) is negligible.  The kernel therefore stays a
non-default registered alternative (``ortho="cgs2_pallas"``), kept for the
measurement harness and as the base for future manual-DMA variants.

ROUND-3 MEASUREMENT (second shot at the bandwidth bound, slope-method
timing — one scalar host pull per multi-cycle window, t(8c)-t(2c)
difference, which removes the ~100 ms tunnel sync that best-of-window
block_until_ready timing folded into every rep):

* scalar cgs2 baseline: 0.605 ms/matvec = 402 MB of basis reads per
  iteration at ~665 GB/s — 81% of the v5e's 819 GB/s HBM peak.  The
  4-read structure (2 projection + 2 update passes) is CGS2's minimum.
* bf16 SHADOW BASIS variant (projection coefficients read from a
  resident bfloat16 copy, subtractions exact against the f32 basis:
  12 B/element instead of 16): 0.688 ms/matvec — SLOWER despite 25%
  fewer bytes.  The bf16 gemv pair does not beat the f32 one on the
  VPU-bound (m+1, n) x (n,) shape, maintaining the shadow costs an
  extra buffer copy per segment, and basis orthogonality degrades to
  ~2e-5 (bf16-accurate coefficients).  Negative result; not adopted.
* expansion segment width sweep (8/16/32): 0.607/0.605/0.716 — the
  default ``_EXPAND_SEG = 16`` is already optimal.
* block drivers amortize the basis reads across b matvecs and remain
  the real lever: block-4 0.402, block-8 0.404 ms/matvec (saturated on
  SpMV + CholQR overhead, not reads).
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ceil_to(x, m):
    return -(-x // m) * m


def _auto_block(mp1, requested, n):
    """Clamp the column-tile width so a double-buffered (mp1, block) f32
    tile fits the ~16 MB VMEM budget (measured: (161, 16384) blocks OOM
    the scoped allocation)."""
    budget = 12 << 20  # leave headroom below the 16 MB limit
    max_cols = budget // (mp1 * 4 * 2)
    block = max(128, min(requested, (max_cols // 128) * 128))
    return min(block, _ceil_to(n, 128))


@partial(jax.jit, static_argnames=("interpret", "block_cols"))
def masked_project_pallas(Vt, w, mask, *, interpret=False, block_cols=16384):
    """``c = mask * (Vt @ w)`` with column-tiled accumulation.

    Vt: (mp1, n) real; w: (n,); mask: (mp1,) in Vt.dtype.
    """
    mp1, n = Vt.shape
    # accumulate at least in f32; an f64 basis (CPU x64 tests) must NOT be
    # silently rounded to f32 by a hardcoded preferred_element_type
    acc_dt = jnp.promote_types(Vt.dtype, jnp.float32)
    block = _auto_block(mp1, block_cols, n)
    n_pad = _ceil_to(n, block)
    if n_pad != n:
        Vt = jnp.pad(Vt, ((0, 0), (0, n_pad - n)))
        w = jnp.pad(w, (0, n_pad - n))

    grid = (n_pad // block,)

    def kernel(V_ref, w_ref, m_ref, c_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            c_ref[:, :] = jnp.zeros_like(c_ref)

        # (mp1, block) x (block, 1) partial product on the MXU
        part = jax.lax.dot_general(
            V_ref[:, :], w_ref[:, :],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=acc_dt,
        )  # (mp1, 1)
        c_ref[:, :] += part.astype(c_ref.dtype)

        @pl.when(i == pl.num_programs(0) - 1)
        def _():
            c_ref[:, :] *= m_ref[:, :]

    c = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((mp1, 1), Vt.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((mp1, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(Vt, w[None, :], mask[:, None])
    return c[:, 0]


@partial(jax.jit, static_argnames=("interpret", "block_cols"))
def project_update_norm_pallas(Vt, w, c, *, interpret=False,
                               block_cols=16384):
    """``w' = w - c @ Vt`` fused with ``||w'||^2`` accumulation.

    Returns ``(w', norm_sq)`` — the separate norm pass over ``w'`` that the
    XLA path pays is folded into the update.
    """
    mp1, n = Vt.shape
    acc_dt = jnp.promote_types(Vt.dtype, jnp.float32)  # see masked_project
    block = _auto_block(mp1, block_cols, n)
    n_pad = _ceil_to(n, block)
    if n_pad != n:
        Vt = jnp.pad(Vt, ((0, 0), (0, n_pad - n)))
        w = jnp.pad(w, (0, n_pad - n))

    grid = (n_pad // block,)

    def kernel(V_ref, w_ref, c_ref, o_ref, ns_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            ns_ref[:, :] = jnp.zeros_like(ns_ref)

        # (1, mp1) x (mp1, block) on the MXU
        upd = jax.lax.dot_general(
            c_ref[:, :], V_ref[:, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=acc_dt,
        )  # (1, block)
        w_new = w_ref[:, :] - upd.astype(w_ref.dtype)
        o_ref[:, :] = w_new
        ns_ref[:, :] += jnp.sum(
            w_new.astype(acc_dt) * w_new.astype(acc_dt),
            keepdims=True,
        ).astype(ns_ref.dtype)

    w_new, norm_sq = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((1, n_pad), Vt.dtype),
            jax.ShapeDtypeStruct((1, 1), acc_dt),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((mp1, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(Vt, w[None, :], c[None, :])
    return w_new[0, :n], norm_sq[0, 0]


def cgs2_pallas(Vt, w, n_active, *, tol=1e-8, eta=None, interpret=False,
                block_cols=16384):
    """Drop-in ortho kernel (see ``arnoldi_tpu.ops.ortho``): unconditional
    twice-is-enough CGS built from the fused Pallas passes.  Real dtypes,
    transposed basis layout.
    """
    mp1 = Vt.shape[0]
    mask = (jnp.arange(mp1) < n_active).astype(Vt.dtype)
    c1 = masked_project_pallas(Vt, w, mask, interpret=interpret,
                               block_cols=block_cols)
    w1, _ = project_update_norm_pallas(Vt, w, c1, interpret=interpret,
                                       block_cols=block_cols)
    c2 = masked_project_pallas(Vt, w1, mask, interpret=interpret,
                               block_cols=block_cols)
    w2, ns = project_update_norm_pallas(Vt, w1, c2, interpret=interpret,
                                        block_cols=block_cols)
    beta = jnp.sqrt(ns).astype(jnp.finfo(Vt.dtype).dtype)
    return c1 + c2, w2, beta, beta < tol
