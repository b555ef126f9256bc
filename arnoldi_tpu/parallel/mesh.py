"""Device-mesh helpers.

The distributed execution model (SURVEY §2b): a 1-D mesh over all chips,
with the matrix and the Krylov basis **row-partitioned** across it — the
eigensolver analogue of data/sequence parallelism.  Everything m-sized
(H, rotations) is replicated.  XLA inserts the collectives: the
Gram-Schmidt projection ``V^H w`` becomes local partial dot-products +
``psum`` over the mesh axis; the ELL gather of remote x entries becomes an
all-gather (to be replaced by a Pallas halo exchange for banded operators).
"""

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

#: Name of the row-partition mesh axis used throughout the framework.
ROWS = "rows"


def make_mesh(n_devices=None, devices=None, axis_name=ROWS):
    """Build a 1-D device mesh over ``n_devices`` (default: all)."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        if n_devices > len(devices):
            raise ValueError(
                f"requested {n_devices} devices, only {len(devices)} available"
            )
        devices = devices[:n_devices]
    return Mesh(devices, (axis_name,))


def row_sharding(mesh, ndim=1, axis_name=ROWS):
    """NamedSharding partitioning the FIRST dimension across the mesh."""
    spec = [None] * ndim
    spec[0] = axis_name
    return NamedSharding(mesh, P(*spec))


def replicated_sharding(mesh):
    return NamedSharding(mesh, P())
