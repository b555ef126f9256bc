"""Halo-exchange SpMV tests on the 8-virtual-device mesh: ring ppermute
halos must reproduce the dense matvec exactly, including at the global
boundary rows (where zero band entries neutralize the ring wrap)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from arnoldi_tpu.linop import as_operator
from arnoldi_tpu.matrices import laplace, laplace_2d
from arnoldi_tpu.parallel import (
    banded_matvec_halo,
    halo_matvec_closure,
    make_mesh,
    shard_operator,
)


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(8)


def _sharded_x(mesh, n, seed=0):
    x = jnp.asarray(np.random.default_rng(seed).standard_normal(n))
    return jax.device_put(x, NamedSharding(mesh, P("rows")))


@pytest.mark.parametrize("gen,n", [
    (lambda: laplace(1024).tocsr(), 1024),
    (lambda: laplace_2d(32), 1024),
    (lambda: laplace_2d(16, 32), 512),
])
def test_matches_dense(gen, n, mesh):
    op = as_operator(gen())
    sop = shard_operator(op, mesh)
    x = _sharded_x(mesh, n)
    y = banded_matvec_halo(sop, x, mesh)
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(op.matvec(x)), atol=1e-12
    )
    assert len(y.sharding.device_set) == 8


def test_halo_too_large_raises(mesh):
    op = as_operator(laplace_2d(16))  # n=256, halo=16, n_local=32 fine
    sop = shard_operator(op, mesh)
    # fabricate a huge offset
    import dataclasses

    bad = dataclasses.replace(sop, offsets=(0, 200, -200))
    with pytest.raises(AssertionError, match="halo"):
        banded_matvec_halo(bad, _sharded_x(mesh, 256), mesh)


def test_closure_in_solver(mesh):
    # Use the halo matvec as the operator inside the sharded Lanczos solve.
    from arnoldi_tpu.solvers.lanczos import partial_eigh
    from arnoldi_tpu.matrices import laplace_eigen

    n = 1024
    op = as_operator(laplace(n).tocsr())
    sop = shard_operator(op, mesh)
    hop = halo_matvec_closure(sop, mesh)

    vals, vecs, _ = partial_eigh(
        hop, 3, which="LA", stopping_criterion=1e-9, max_restarts=3000,
        mesh=mesh, key=jax.random.key(2),
    )
    want = np.sort(laplace_eigen(n))[::-1][:3]
    np.testing.assert_allclose(np.sort(vals)[::-1], want, rtol=1e-8,
                               atol=1e-9)
