from .mesh import make_mesh, replicated_sharding, row_sharding
from .sharded import shard_operator, shard_workspace, sharded_partial_schur

__all__ = [
    "make_mesh",
    "row_sharding",
    "replicated_sharding",
    "shard_operator",
    "shard_workspace",
    "sharded_partial_schur",
]
