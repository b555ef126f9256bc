"""Shared test helpers, mirroring the reference's oracle patterns
(SURVEY §4): Arnoldi-invariant assertions (Saad eqs. 6.8/6.9) and
Hungarian eigenvalue matching for ARPACK cross-validation."""

import numpy as np

ATOL = 1e-8
RTOL = 1e-4


def basis_vector(n, k, dtype=np.int64):
    """e_k in R^n (1-based k)."""
    ret = np.zeros(n, dtype=dtype)
    ret[k - 1] = 1
    return ret


def assert_invariants(A, V, H, m):
    """Check the three Arnoldi identities on a (possibly truncated) pair:
    1. V_m orthonormal
    2. A V_m = V_m H_m + H[-1, -1] v_{m+1} e_m^H
    3. V_m^H A V_m = H_m
    V is (n, m+1)-shaped (truncated view), H is (m+1, m)-shaped.
    """
    A = np.asarray(A.todense()) if hasattr(A, "todense") else np.asarray(A)
    V = np.asarray(V)
    H = np.asarray(H)
    e_m = basis_vector(m, m, V.dtype)

    V_m = V[:, :m]
    H_m = H[:m, :m]

    np.testing.assert_allclose(
        V_m.conj().T @ V_m, np.eye(m), rtol=RTOL, atol=ATOL
    )
    np.testing.assert_allclose(
        A @ V_m,
        V_m @ H_m + H[-1, -1] * np.outer(V[:, -1], e_m),
        rtol=RTOL,
        atol=ATOL,
    )
    np.testing.assert_allclose(
        V_m.conj().T @ A @ V_m, H_m, rtol=RTOL, atol=ATOL
    )


def find_best_matching(a, b):
    """Reorder both eigenvalue sets so they pair up optimally (Hungarian
    matching on |a_i - b_j|) — eigensolver output order is undefined."""
    from scipy.optimize import linear_sum_assignment

    a = np.asarray(a)
    b = np.asarray(b)
    assert a.shape == b.shape, f"Shape mismatch: {a.shape} vs {b.shape}"
    cost = np.abs(a[:, None] - b[None, :])
    row_ind, col_ind = linear_sum_assignment(cost)
    return a[row_ind], b[col_ind]
