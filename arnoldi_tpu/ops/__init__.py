from .ortho import cgs_dgks, mgs_dgks, ORTHO_KERNELS, M_SQRT1_2

__all__ = ["cgs_dgks", "mgs_dgks", "ORTHO_KERNELS", "M_SQRT1_2"]
