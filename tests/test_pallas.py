"""Pallas kernel tests (interpreter mode on CPU; the same code compiles for
TPU via Mosaic)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from arnoldi_tpu.linop import as_operator
from arnoldi_tpu.matrices import laplace, laplace_2d
from arnoldi_tpu.ops.ortho import ORTHO_KERNELS
from arnoldi_tpu.ops.pallas.ortho_fused import (
    cgs2_pallas,
    masked_project_pallas,
    project_update_norm_pallas,
)
from arnoldi_tpu.ops.pallas.spmv_banded import banded_matvec_pallas


class TestBandedPallas:
    @pytest.mark.parametrize("gen,cols", [
        (lambda: laplace(777).tocsr(), 256),
        (lambda: laplace_2d(40), 512),
        (lambda: laplace_2d(33, 20), 256),
    ])
    def test_matches_operator(self, gen, cols):
        op = as_operator(gen())
        n = op.shape[0]
        x = jnp.asarray(np.random.default_rng(0).standard_normal(n)
                        .astype(np.float32))
        y_ref = np.asarray(op.matvec(x))
        y = np.asarray(banded_matvec_pallas(op.bands, x, op.offsets,
                                            interpret=True, cols=cols))
        np.testing.assert_allclose(y, y_ref, atol=1e-5)

    def test_float64(self):
        op = as_operator(laplace(300).tocsr())
        x = jnp.asarray(np.random.default_rng(1).standard_normal(300))
        y = np.asarray(banded_matvec_pallas(op.bands, x, op.offsets,
                                            interpret=True, cols=128))
        np.testing.assert_allclose(y, np.asarray(op.matvec(x)), atol=1e-12)


class TestEllPallasRectangular:
    def test_rectangular_matvec(self):
        # The kernel gathers from the full resident x by stored column
        # index, so a rectangular ELL operator must work (regression: an
        # x.shape == (n_rows,) assert rejected it at trace time).
        import scipy.sparse as sp

        from arnoldi_tpu.ops.pallas.spmv_ell import ell_matvec_pallas

        A = sp.random(120, 80, density=0.15, random_state=0, format="csr")
        op = as_operator(A, dtype=np.float32)   # rectangular -> ELL
        x = jnp.asarray(np.random.default_rng(2)
                        .standard_normal(80).astype(np.float32))
        y = np.asarray(ell_matvec_pallas(op.data, op.cols, x,
                                         interpret=True, block_rows=64))
        np.testing.assert_allclose(y, A @ np.asarray(x), atol=1e-5)


class TestOrthoFusedPallas:
    def setup_method(self, method):
        rng = np.random.default_rng(7)
        self.n, self.mp1, self.j = 900, 21, 12
        Vt = np.zeros((self.mp1, self.n), np.float32)
        Vt[: self.j, :] = np.linalg.qr(
            rng.standard_normal((self.n, self.j)))[0].T
        # stale noise beyond the active rows must be masked out
        Vt[self.j :, :] = rng.standard_normal((self.mp1 - self.j, self.n))
        self.V = jnp.asarray(Vt)
        self.w = jnp.asarray(rng.standard_normal(self.n).astype(np.float32))

    def test_masked_project(self):
        mask = (jnp.arange(self.mp1) < self.j).astype(jnp.float32)
        c = np.asarray(masked_project_pallas(self.V, self.w, mask,
                                             interpret=True, block_cols=256))
        c_ref = np.asarray(self.V) @ np.asarray(self.w)
        c_ref[self.j :] = 0
        np.testing.assert_allclose(c, c_ref, atol=1e-4)

    def test_project_update_norm(self):
        c = jnp.zeros(self.mp1, jnp.float32).at[: self.j].set(0.5)
        w2, ns = project_update_norm_pallas(self.V, self.w, c,
                                            interpret=True, block_cols=256)
        w2_ref = np.asarray(self.w) - np.asarray(c) @ np.asarray(self.V)
        np.testing.assert_allclose(np.asarray(w2), w2_ref, atol=1e-5)
        np.testing.assert_allclose(
            float(ns), float(np.sum(w2_ref.astype(np.float64) ** 2)),
            rtol=1e-5)

    def test_cgs2_matches_xla_kernel(self):
        h, w2, beta, br = cgs2_pallas(self.V, self.w, self.j, tol=1e-6,
                                      interpret=True)
        h0, w20, b0, br0 = ORTHO_KERNELS["cgs2"](self.V, self.w, self.j,
                                                 tol=1e-6)
        np.testing.assert_allclose(np.asarray(h), np.asarray(h0), atol=1e-5)
        np.testing.assert_allclose(np.asarray(w2), np.asarray(w20), atol=1e-5)
        assert abs(float(beta) - float(b0)) < 1e-5
        assert bool(br) == bool(br0)
        # orthogonality of the result
        proj = np.asarray(self.V[: self.j, :]) @ np.asarray(w2)
        np.testing.assert_allclose(proj, 0, atol=1e-4)


class TestPallasOrthoInSolver:
    """cgs2_pallas is registered in ORTHO_KERNELS and drives the solver
    end-to-end (interpret mode on CPU; the real kernel on TPU)."""

    def test_registered(self):
        from arnoldi_tpu.ops.ortho import ORTHO_KERNELS

        assert "cgs2_pallas" in ORTHO_KERNELS

    def test_partial_schur_with_pallas_ortho(self):
        import jax
        import numpy as np

        from arnoldi_tpu import partial_schur
        from arnoldi_tpu.matrices import mark
        from arnoldi_tpu.utils.sorting import arg_largest_real

        A = mark(15)
        Q, T, _ = partial_schur(
            A, 3, max_dim=12, stopping_criterion=1e-6,
            sort_function=arg_largest_real, max_restarts=2000,
            dtype=np.float32, ortho="cgs2_pallas", refine=None,
            key=jax.random.key(0))
        Qh, Th = np.asarray(Q), np.asarray(T)
        res = np.linalg.norm(A.todense() @ Qh - Qh @ Th, axis=0)
        np.testing.assert_allclose(res, 0, atol=1e-5)


class TestBsrPallas:
    """BSR block-gather kernel vs the BsrOperator XLA path (its oracle)."""

    def _op(self, n_side=60, seed=0):
        import scipy.sparse as sp

        from arnoldi_tpu.linop import BsrOperator
        from arnoldi_tpu.matrices import mark

        A = mark(n_side)
        return BsrOperator.from_scipy(A, blocksize=(8, 8), dtype=np.float32)

    def test_matches_xla_path(self):
        from arnoldi_tpu.ops.pallas.spmv_bsr import bsr_matvec_pallas

        op = self._op()
        n = op.shape[0]
        x = jnp.asarray(
            np.random.default_rng(0).standard_normal(n).astype(np.float32))
        y_ref = np.asarray(op.matvec(x))
        y = np.asarray(bsr_matvec_pallas(op.blocks, op.block_cols, x,
                                         n_rows=op.n_rows, interpret=True,
                                         row_tile=32))
        np.testing.assert_allclose(y, y_ref, atol=1e-4)

    def test_row_tile_padding(self):
        from arnoldi_tpu.ops.pallas.spmv_bsr import bsr_matvec_pallas

        op = self._op(n_side=20)
        n = op.shape[0]
        x = jnp.asarray(
            np.random.default_rng(1).standard_normal(n).astype(np.float32))
        y_ref = np.asarray(op.matvec(x))
        # row_tile larger than n_brow exercises the block-row padding
        y = np.asarray(bsr_matvec_pallas(op.blocks, op.block_cols, x,
                                         n_rows=op.n_rows, interpret=True,
                                         row_tile=64))
        np.testing.assert_allclose(y, y_ref, atol=1e-4)

    def test_lane_packed_v2_matches_xla_path(self):
        from arnoldi_tpu.ops.pallas.spmv_bsr import (bsr_matvec_pallas16,
                                                     pack_bsr16)

        op = self._op()
        n = op.shape[0]
        x = jnp.asarray(
            np.random.default_rng(2).standard_normal(n).astype(np.float32))
        y_ref = np.asarray(op.matvec(x))
        b16, c16, tb, Wt = pack_bsr16(op, row_tile16=4)
        y = np.asarray(bsr_matvec_pallas16(
            jnp.asarray(b16), jnp.asarray(c16), jnp.asarray(tb), x,
            Wt=Wt, n_rows=op.n_rows, interpret=True, row_tile16=4))
        np.testing.assert_allclose(y, y_ref, atol=1e-4)
