from .decomposition import RitzDecomposition, arnoldi_decomposition, arnoldi_expand
from .krylov_schur import partial_schur
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
    "History",
    "naive_explicit_restarts",
    "explicit_restarts_with_deflation",
]
