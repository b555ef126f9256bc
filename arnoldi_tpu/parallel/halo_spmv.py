"""Halo-exchange banded SpMV over a device mesh.

The GSPMD path lets XLA insert an all-gather of ``x`` for the operator
matvec; for banded/stencil matrices that is wasteful — each shard only
needs a halo of ``max|offset|`` rows from its two ring neighbours.  This
module implements the explicit version with ``shard_map`` + ``ppermute``
(two ring sends over ICI instead of an all-gather), the CP/ring-attention
analogue for eigensolvers (SURVEY §2b).

Correctness at the global edges: :class:`arnoldi_tpu.linop.BandedOperator`
stores zero band entries wherever ``i + offset`` falls outside the matrix,
so the wrapped-around ring halo values are always multiplied by zero there.

The next level (halo exchange via Pallas ``make_async_remote_copy``
overlapped with the local stencil compute) slots in behind the same
interface.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax import shard_map
from jax.sharding import PartitionSpec as P

from ..linop import BandedOperator


def banded_matvec_halo(op: BandedOperator, x, mesh, axis_name="rows"):
    """Distributed banded matvec ``y = A @ x`` with ring halo exchange.

    ``op.bands`` must be sharded ``P(None, axis_name)`` and ``x``
    ``P(axis_name)`` (as produced by ``arnoldi_tpu.parallel.shard_operator``);
    the row count must divide the mesh size.  Returns ``y`` sharded like
    ``x``.
    """
    offsets = op.offsets
    halo = int(max((abs(int(o)) for o in offsets), default=0))
    n = op.shape[0]
    n_dev = int(mesh.devices.size)
    assert n % n_dev == 0, "shard rows first (pad_operator)"
    n_local = n // n_dev
    assert halo <= n_local, (
        f"halo {halo} exceeds shard size {n_local}; use fewer devices or "
        "the gather path"
    )

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(None, axis_name), P(axis_name)),
        out_specs=P(axis_name),
    )
    def mv(bands_loc, x_loc):
        d = lax.axis_size(axis_name)
        fwd = [(i, (i + 1) % d) for i in range(d)]   # send right
        bwd = [(i, (i - 1) % d) for i in range(d)]   # send left
        # our right halo = left edge of the right neighbour (comes backward)
        right_halo = lax.ppermute(x_loc[:halo], axis_name, bwd)
        # our left halo = right edge of the left neighbour (comes forward)
        left_halo = lax.ppermute(x_loc[-halo:], axis_name, fwd)
        x_ext = jnp.concatenate([left_halo, x_loc, right_halo])
        y = jnp.zeros_like(x_loc, dtype=jnp.result_type(bands_loc.dtype,
                                                        x_loc.dtype))
        for k, off in enumerate(offsets):
            seg = lax.dynamic_slice_in_dim(x_ext, halo + off, x_loc.shape[0])
            y = y + bands_loc[k] * seg
        return y

    return mv(op.bands, x)


def halo_matvec_closure(op: BandedOperator, mesh, axis_name="rows"):
    """Wrap the halo matvec as an operator-compatible closure (for use as a
    ``CallableOperator`` inside the sharded solvers)."""
    from ..linop import CallableOperator

    return CallableOperator(
        lambda x: banded_matvec_halo(op, x, mesh, axis_name),
        op.shape,
        op.dtype,
        nnz=op.nnz,
    )
