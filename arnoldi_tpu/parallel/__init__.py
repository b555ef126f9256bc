from .mesh import make_mesh, replicated_sharding, row_sharding
from .sharded import shard_operator, shard_workspace, sharded_partial_schur
from .halo_spmv import (banded_matvec_halo, banded_matvec_halo_dw,
                        bsr_matvec_halo, bsr_matvec_halo_dw,
                        ell_matvec_halo, ell_matvec_halo_dw,
                        halo_matvec_closure, sparsity_bandwidth)

__all__ = [
    "make_mesh",
    "row_sharding",
    "replicated_sharding",
    "shard_operator",
    "shard_workspace",
    "sharded_partial_schur",
    "banded_matvec_halo",
    "ell_matvec_halo",
    "bsr_matvec_halo",
    "banded_matvec_halo_dw",
    "ell_matvec_halo_dw",
    "bsr_matvec_halo_dw",
    "sparsity_bandwidth",
    "halo_matvec_closure",
]
