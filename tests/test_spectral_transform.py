"""Shift-invert and scipy-compatible wrapper tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp
import scipy.sparse.linalg as spla

from arnoldi_tpu.matrices import laplace, laplace_2d, laplace_eigen, mark
from arnoldi_tpu.solvers.spectral_transform import (
    eigs,
    eigsh,
    shift_invert_operator,
)

from common import find_best_matching


class TestShiftInvertOperator:
    def test_matvec_is_inverse(self):
        A = laplace(60).tocsr()
        sigma = 0.5
        op = shift_invert_operator(A, sigma, solver="bicgstab",
                                   inner_tol=1e-12)
        rng = np.random.default_rng(0)
        b = rng.standard_normal(60)
        x = np.asarray(op.matvec(b))
        np.testing.assert_allclose((A - sigma * sp.eye(60)) @ x, b,
                                   atol=1e-8)


class TestEigs:
    def test_plain_matches_scipy(self):
        A = mark(12)
        vals, vecs = eigs(A, 4, which="LR", tol=1e-9,
                          key=jax.random.key(0), maxiter=5000)
        r_vals = spla.eigs(A, 4, which="LR")[0]
        a, b = find_best_matching(vals, r_vals)
        np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-8)
        assert vals.shape == (4,)
        assert vecs.shape == (A.shape[0], 4)

    def test_no_eigenvectors(self):
        A = mark(10)
        vals = eigs(A, 3, which="LM", tol=1e-8, return_eigenvectors=False,
                    maxiter=5000, key=jax.random.key(1))
        assert vals.shape == (3,)

    def test_shift_invert_interior(self):
        # Interior eigenvalues of the 1-D Laplacian nearest sigma.
        n = 80
        A = laplace(n).tocsr()
        sigma = -1.7
        vals, vecs = eigs(A, 3, sigma=sigma, tol=1e-9,
                          key=jax.random.key(2), maxiter=5000)
        full = np.sort(laplace_eigen(n))
        want = full[np.argsort(np.abs(full - sigma))[:3]]
        a, b = find_best_matching(np.real(vals), want)
        np.testing.assert_allclose(a, b, rtol=1e-7, atol=1e-8)
        # residuals of the back-transformed pairs
        res = np.linalg.norm(A @ vecs - vals * vecs, axis=0)
        np.testing.assert_allclose(res, 0, atol=1e-6)


class TestEigsh:
    def test_plain(self):
        A = laplace_2d(12, 11)
        vals, vecs = eigsh(A, 4, which="SA", tol=1e-9,
                           key=jax.random.key(3), maxiter=5000)
        want = spla.eigsh(A.astype(float), 4, which="SA")[0]
        np.testing.assert_allclose(np.sort(vals), np.sort(want),
                                   rtol=1e-8, atol=1e-8)

    def test_shift_invert_smallest(self):
        # Classic use: smallest eigenvalues of an SPD-ish operator via a
        # shift below the spectrum (sigma < lambda_min < 0 here).
        n = 100
        A = laplace(n).tocsr()
        vals, vecs = eigsh(A, 3, sigma=-4.1, tol=1e-8,
                           inner_solver="bicgstab", key=jax.random.key(4),
                           maxiter=5000)
        want = np.sort(laplace_eigen(n))[:3]
        np.testing.assert_allclose(np.sort(vals), want, rtol=1e-6, atol=1e-7)


class TestShiftInvertRobustness:
    """Round-1 VERDICT item 8: a host sparse-LU inner solver (ARPACK's
    standard) for shifts where unpreconditioned BiCGStab stalls, plus
    inner-iteration accounting."""

    def _interior_setup(self):
        import scipy.sparse.linalg as spla

        from arnoldi_tpu.matrices import laplace

        L = laplace(400).tocsr()  # spectrum in (-4, 0)
        sigma = -2.0              # interior: A - sigma I is INDEFINITE
        ref = spla.eigsh(L.astype(np.float64), 6, sigma=sigma)[0]
        return L, sigma, ref

    def test_eigsh_interior_shift_splu(self):
        from arnoldi_tpu import eigsh

        L, sigma, ref = self._interior_setup()
        vals, vecs = eigsh(L, 6, sigma=sigma, inner_solver="splu",
                           tol=1e-10, maxiter=3000, key=jax.random.key(0))
        np.testing.assert_allclose(np.sort(vals), np.sort(ref), atol=1e-8)
        res = np.linalg.norm(L @ vecs - vecs * np.asarray(vals)[None, :],
                             axis=0)
        np.testing.assert_allclose(res, 0, atol=1e-6)

    def test_eigsh_interior_shift_gmres(self):
        from arnoldi_tpu import eigsh

        L, sigma, ref = self._interior_setup()
        vals, _ = eigsh(L, 6, sigma=sigma, inner_solver="gmres",
                        tol=1e-8, inner_tol=1e-11, maxiter=3000,
                        key=jax.random.key(0))
        np.testing.assert_allclose(np.sort(vals), np.sort(ref), atol=1e-7)

    def test_eigs_interior_shift_splu_nonsymmetric(self):
        # NORMAL nonsymmetric matrix (orthogonal similarity of a known
        # spectrum) so the interior eigenvalues are well-conditioned; mark
        # matrices' interior clusters are too non-normal for tight
        # cross-solver agreement (even ARPACK's residuals are ~1e-3 there).
        from arnoldi_tpu import eigs

        rng = np.random.default_rng(2)
        import scipy.linalg as sla

        D = sla.block_diag(
            np.diag([0.1, 0.35, 0.52, 0.61, 0.9, 1.4]),
            np.array([[0.48, 0.2], [-0.2, 0.48]]),
            np.diag(rng.uniform(2, 3, 40)),
        )
        Qo, _ = np.linalg.qr(rng.standard_normal(D.shape))
        A = Qo.T @ D @ Qo
        sigma = 0.5
        vals, vecs = eigs(A, 3, sigma=sigma, inner_solver="splu",
                          tol=1e-10, maxiter=3000, key=jax.random.key(1))
        dense = np.linalg.eigvals(D)
        want = dense[np.argsort(np.abs(dense - sigma))[:3]]
        np.testing.assert_allclose(np.sort_complex(vals),
                                   np.sort_complex(want), atol=1e-9)
        res = np.linalg.norm(A @ vecs - vals * vecs, axis=0)
        np.testing.assert_allclose(res, 0, atol=1e-8)

    def test_inner_stats_splu(self):
        from arnoldi_tpu.solvers.spectral_transform import (
            shift_invert_operator)
        from arnoldi_tpu.matrices import laplace

        L = laplace(100).tocsr()
        op = shift_invert_operator(L, -2.0, solver="splu")
        x = np.random.default_rng(0).standard_normal(100)
        y = np.asarray(op.matvec(jnp.asarray(x, jnp.float64)))
        np.testing.assert_allclose(
            (L - (-2.0) * sp.identity(100)) @ y, x, atol=1e-10)
        assert op.inner_stats.solves == 1

    def test_inner_stats_iterative(self):
        from arnoldi_tpu.solvers.spectral_transform import (
            shift_invert_operator)
        from arnoldi_tpu.matrices import laplace

        L = laplace(60).tocsr()
        op = shift_invert_operator(L, 1.0, solver="cg", count_inner=True,
                                   inner_tol=1e-12)
        _ = np.asarray(op.matvec(jnp.ones(60)))
        assert op.inner_stats.solves >= 1
        assert op.inner_stats.inner_matvecs > 1
        # solves counts APPLICATIONS, not jit traces: the same compiled
        # matvec applied k times must report k solves (host callback, the
        # regression was a traced Python increment stuck at 1).
        before = op.inner_stats.solves
        f = jax.jit(op.matvec)
        for _ in range(3):
            _ = np.asarray(f(jnp.ones(60)))
        assert op.inner_stats.solves == before + 3, op.inner_stats.solves


class TestRealifiedAdversarial:
    """Round-1 VERDICT weak item 5: the conjugate-copy rejection must
    survive clusters of NEARLY-CONJUGATE but distinct eigenvalues (the
    realified spectrum then contains four values in two tight clusters)."""

    def test_near_conjugate_distinct_pair(self):
        from arnoldi_tpu import eigs_realified

        rng = np.random.default_rng(11)
        # lam1 and lam2 are nearly mutual conjugates but DISTINCT
        # eigenvalues of A; both must be returned (not a genuine+copy mix).
        lams = np.array([0.9 + 1e-4j, 0.9 - 1.3e-4j, 0.5 + 0.2j,
                         0.1 - 0.3j, -0.4 + 0.05j, 0.02 + 0.6j])
        Qc, _ = np.linalg.qr(rng.standard_normal((6, 6))
                             + 1j * rng.standard_normal((6, 6)))
        A = Qc @ np.diag(lams) @ Qc.conj().T
        vals, vecs = eigs_realified(A, 2, which="LM", tol=1e-11,
                                    maxiter=4000, key=jax.random.key(3))
        # Hungarian pairing, NOT sort_complex: both true values share the
        # EXACT real part 0.9, so a lexicographic sort of the computed
        # values tie-breaks on one-ulp noise in their real parts and the
        # comparison order is environment-dependent (a BLAS-state change
        # from an unrelated import flipped it).
        got, want = find_best_matching(vals, lams[:2])
        np.testing.assert_allclose(got, want, atol=1e-8)
        res = np.linalg.norm(A @ vecs - vals * vecs, axis=0)
        np.testing.assert_allclose(res, 0, atol=1e-8)

    def test_tight_cluster(self):
        from arnoldi_tpu import eigs_realified

        rng = np.random.default_rng(12)
        lams = np.array([1.0 + 1e-7j, 1.0 - 2e-7j, 1.0 + 3e-7j,
                         0.3 + 0.1j, -0.2 - 0.5j])
        Qc, _ = np.linalg.qr(rng.standard_normal((5, 5))
                             + 1j * rng.standard_normal((5, 5)))
        A = Qc @ np.diag(lams) @ Qc.conj().T
        vals, vecs = eigs_realified(A, 3, which="LM", tol=1e-12, ncv=5,
                                    maxiter=6000, key=jax.random.key(4))
        # all three cluster members recovered (no copy substituted);
        # Hungarian matching — sort order within the 1e-7 cluster is
        # ill-defined.
        a, b = find_best_matching(vals, lams[:3])
        np.testing.assert_allclose(a, b, atol=1e-8)
        res = np.linalg.norm(A @ vecs - vals * vecs, axis=0)
        np.testing.assert_allclose(res, 0, atol=1e-8)


class TestStartVectorV0:
    """scipy `v0=` parity: explicit start vectors through the whole
    scipy-compatible surface (ref scipy.sparse.linalg signatures)."""

    def test_eigs_v0_deterministic(self):
        A = mark(12)
        n = A.shape[0]
        v0 = np.sin(np.arange(n) + 1.0)
        vals1, vecs1 = eigs(A, 4, which="LR", tol=1e-9, v0=v0, maxiter=5000)
        vals2, _ = eigs(A, 4, which="LR", tol=1e-9, v0=v0, maxiter=5000)
        np.testing.assert_array_equal(vals1, vals2)  # no RNG in the path
        r_vals = spla.eigs(A, 4, which="LR")[0]
        a, b = find_best_matching(vals1, r_vals)
        np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-8)

    def test_eigsh_v0(self):
        A = laplace(64).tocsr()
        v0 = np.cos(0.1 * np.arange(64))
        vals, vecs = eigsh(A, 3, which="SA", tol=1e-9, v0=v0, maxiter=5000)
        want = np.sort(laplace_eigen(64))[:3]
        np.testing.assert_allclose(vals, want, rtol=1e-7, atol=1e-9)

    def test_eigs_sigma_v0(self):
        n = 80
        A = laplace(n).tocsr()
        sigma = -1.7
        v0 = np.ones(n)
        vals, _ = eigs(A, 3, sigma=sigma, tol=1e-9, v0=v0, maxiter=5000)
        full = np.sort(laplace_eigen(n))
        want = full[np.argsort(np.abs(full - sigma))[:3]]
        a, b = find_best_matching(np.real(vals), want)
        np.testing.assert_allclose(a, b, rtol=1e-7, atol=1e-8)

    def test_svds_v0(self):
        from arnoldi_tpu import svds

        rng = np.random.default_rng(5)
        A = rng.standard_normal((40, 90))  # wide: gram dim = 40
        v0 = rng.standard_normal(40)
        U, s, Vh = svds(A, 3, tol=1e-10, v0=v0, maxiter=4000)
        want = np.linalg.svd(A, compute_uv=False)[:3][::-1]
        np.testing.assert_allclose(s, want, rtol=1e-8)
        np.testing.assert_allclose(A @ Vh.conj().T, U * s, atol=1e-7)

    def test_realified_v0_complex(self):
        from arnoldi_tpu import eigs_realified

        rng = np.random.default_rng(6)
        lams = np.array([2.0 + 1.0j, -1.5 + 0.5j, 0.3 - 0.8j,
                         0.1 + 0.2j, -0.05 - 0.4j, 0.6 + 0.0j])
        Qc, _ = np.linalg.qr(rng.standard_normal((6, 6))
                             + 1j * rng.standard_normal((6, 6)))
        A = Qc @ np.diag(lams) @ Qc.conj().T
        v0 = rng.standard_normal(6) + 1j * rng.standard_normal(6)
        vals, vecs = eigs_realified(A, 2, which="LM", tol=1e-11, v0=v0,
                                    maxiter=4000)
        a, b = find_best_matching(vals, lams[:2])
        np.testing.assert_allclose(a, b, atol=1e-8)
