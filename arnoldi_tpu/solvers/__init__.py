from .decomposition import RitzDecomposition, arnoldi_decomposition, arnoldi_expand
from .krylov_schur import partial_schur
from .lanczos import partial_eigh
from .explicit_restarts import (
    History,
    explicit_restarts_with_deflation,
    naive_explicit_restarts,
)

__all__ = [
    "arnoldi_decomposition",
    "arnoldi_expand",
    "RitzDecomposition",
    "partial_schur",
    "partial_eigh",
    "History",
    "naive_explicit_restarts",
    "explicit_restarts_with_deflation",
]
