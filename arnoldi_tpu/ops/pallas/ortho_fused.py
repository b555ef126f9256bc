"""Pallas fused blocked Gram-Schmidt kernels.

The CGS projection is two tall-skinny passes over the basis ``V``:

1. ``c = mask * (V^T w)`` — reduction over rows (this kernel accumulates
   row-tile partial products into the output across sequential grid steps),
2. ``w' = w - V c`` with ``||w'||^2`` accumulated in the same pass — the
   fusion XLA does not do (it materializes ``w'`` then re-reads it for the
   norm).

Together one DGKS-checked CGS pass touches ``V`` exactly twice — the
bandwidth lower bound.  Real dtypes only (the TPU device path); the complex
CPU path keeps the XLA implementation.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ceil_to(x, m):
    return -(-x // m) * m


@partial(jax.jit, static_argnames=("interpret", "block_rows"))
def masked_project_pallas(V, w, mask, *, interpret=False, block_rows=2048):
    """``c = mask * (V^T @ w)`` with row-tiled accumulation.

    V: (n, mp1) real; w: (n,); mask: (mp1,) in V.dtype.
    """
    n, mp1 = V.shape
    block = block_rows
    n_pad = _ceil_to(n, block)
    if n_pad != n:
        V = jnp.pad(V, ((0, n_pad - n), (0, 0)))
        w = jnp.pad(w, (0, n_pad - n))

    grid = (n_pad // block,)

    def kernel(V_ref, w_ref, m_ref, c_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            c_ref[:, :] = jnp.zeros_like(c_ref)

        part = jax.lax.dot_general(
            w_ref[:, :], V_ref[:, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (1, mp1)
        c_ref[:, :] += part.astype(c_ref.dtype)

        @pl.when(i == pl.num_programs(0) - 1)
        def _():
            c_ref[:, :] *= m_ref[:, :]

    c = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, mp1), V.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block, mp1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(V, w[None, :], mask[None, :])
    return c[0]


@partial(jax.jit, static_argnames=("interpret", "block_rows"))
def project_update_norm_pallas(V, w, c, *, interpret=False, block_rows=2048):
    """``w' = w - V @ c`` fused with ``||w'||^2`` accumulation.

    Returns ``(w', norm_sq)`` — the separate norm pass over ``w'`` that the
    XLA path pays is folded into the update.
    """
    n, mp1 = V.shape
    block = block_rows
    n_pad = _ceil_to(n, block)
    if n_pad != n:
        V = jnp.pad(V, ((0, n_pad - n), (0, 0)))
        w = jnp.pad(w, (0, n_pad - n))

    grid = (n_pad // block,)

    def kernel(V_ref, w_ref, c_ref, o_ref, ns_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            ns_ref[:, :] = jnp.zeros_like(ns_ref)

        upd = jax.lax.dot_general(
            V_ref[:, :], c_ref[:, :],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (block, 1)
        w_new = w_ref[:, :] - upd.astype(w_ref.dtype).T
        o_ref[:, :] = w_new
        ns_ref[:, :] += jnp.sum(
            w_new.astype(jnp.float32) * w_new.astype(jnp.float32),
            keepdims=True,
        ).astype(ns_ref.dtype)

    w_new, norm_sq = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((1, n_pad), V.dtype),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block, mp1), lambda i: (i, 0),
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
    )(V, w[None, :], c[None, :])
    return w_new[0, :n], norm_sq[0, 0]


def cgs2_pallas(V, w, n_active, *, tol=1e-8, eta=None, interpret=False):
    """Drop-in ortho kernel (see ``arnoldi_tpu.ops.ortho``): unconditional
    twice-is-enough CGS built from the fused Pallas passes.  Real dtypes.
    """
    mp1 = V.shape[1]
    mask = (jnp.arange(mp1) < n_active).astype(V.dtype)
    c1 = masked_project_pallas(V, w, mask, interpret=interpret)
    w1, _ = project_update_norm_pallas(V, w, c1, interpret=interpret)
    c2 = masked_project_pallas(V, w1, mask, interpret=interpret)
    w2, ns = project_update_norm_pallas(V, w1, c2, interpret=interpret)
    beta = jnp.sqrt(ns).astype(jnp.finfo(V.dtype).dtype)
    return c1 + c2, w2, beta, beta < tol
