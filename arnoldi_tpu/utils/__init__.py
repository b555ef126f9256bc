from .sorting import (
    SORT_FUNCTIONS,
    arg_largest_imaginary,
    arg_smallest_imaginary,
    arg_largest_magnitude,
    arg_largest_real,
    arg_smallest_magnitude,
    arg_smallest_real,
    sort_function_for,
)
from .random import rand_normalized_vector
from .history import History

# Parity re-export: the reference exposes ordered_schur from arnoldi.utils
# (src/arnoldi/utils.py:32); here it lives in the dense tier.
from ..ops.dense_tier import ordered_schur  # noqa: E402

__all__ = [
    "SORT_FUNCTIONS",
    "arg_largest_magnitude",
    "arg_largest_real",
    "arg_largest_imaginary",
    "arg_smallest_imaginary",
    "arg_smallest_magnitude",
    "arg_smallest_real",
    "sort_function_for",
    "rand_normalized_vector",
    "History",
]
