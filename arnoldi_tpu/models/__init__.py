"""Alias package: the solver drivers are this framework's "model zoo".

``arnoldi_tpu.models`` re-exports the solver tiers for discoverability; the
canonical home is :mod:`arnoldi_tpu.solvers`.
"""

from ..solvers import (  # noqa: F401
    History,
    RitzDecomposition,
    arnoldi_decomposition,
    arnoldi_expand,
    explicit_restarts_with_deflation,
    naive_explicit_restarts,
    partial_eigh,
    partial_schur,
)
from ..solvers.krylov_schur import eigenpairs_from_partial_schur  # noqa: F401
from ..solvers.spectral_transform import (  # noqa: F401
    eigs,
    eigsh,
    shift_invert_operator,
)
