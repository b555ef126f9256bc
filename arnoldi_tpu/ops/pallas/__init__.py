"""Pallas TPU kernels for the solver hot path.

These implement the SpMV and blocked Gram-Schmidt data paths with explicit
VMEM staging (SURVEY §2a's native-kernel obligations).  Every kernel has an
``interpret=`` escape hatch so the same code is testable on CPU, and the
operator/ortho layers fall back to the XLA implementations off-TPU.
"""

from .spmv_banded import banded_matvec_pallas
from .ortho_fused import masked_project_pallas, project_update_norm_pallas

__all__ = [
    "banded_matvec_pallas",
    "masked_project_pallas",
    "project_update_norm_pallas",
]
