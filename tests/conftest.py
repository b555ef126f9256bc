"""Test configuration.

Tests run on CPU with x64 enabled (complex128-grade residual checks, parity
with the reference's tolerances) and 8 virtual devices so the sharded paths
exercise a real multi-device mesh without TPU hardware — the strategy SURVEY
§4 prescribes for testing distribution without a cluster.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon sitecustomize force-registers the TPU backend and overrides
# JAX_PLATFORMS; pin the platform back to CPU *after* import (env vars are
# not honoured once the plugin has updated jax.config).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
