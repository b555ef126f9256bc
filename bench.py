#!/usr/bin/env python
"""Headline benchmark: end-to-end Krylov-Schur solve vs ARPACK.

Solves the same eigenproblem (Markov walk matrix, K largest-real eigenpairs)
with this framework on the default JAX device (TPU when present, warm run
timed) and with SciPy's ARPACK on the host CPU, validating that both reach
matching eigenvalues, and prints ONE JSON line:

    {"metric": ..., "value": <our wall seconds>, "unit": "s",
     "vs_baseline": <arpack_seconds / our_seconds>}

``vs_baseline > 1`` means faster than ARPACK.  Extra context fields
(matvecs, residuals, device) ride along in the same JSON object.
"""

import json
import sys
import time

import numpy as np


def main():
    import jax

    from arnoldi_tpu import partial_schur
    from arnoldi_tpu.matrices import mark
    from arnoldi_tpu.solvers.krylov_schur import (
        _backend_supports_complex,
        eigenpairs_from_partial_schur,
    )
    from arnoldi_tpu.utils.sorting import arg_largest_real

    m_grid = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    k = 5
    A = mark(m_grid)  # n = m_grid*(m_grid+1)/2
    n = A.shape[0]

    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        dtype = np.float32
        tol = 3e-4
        ortho = "cgs2"
    else:
        dtype = np.float64
        tol = 1e-8
        ortho = "cgs_dgks"
    Af = A.astype(dtype)

    kwargs = dict(
        max_dim=40, p=15, stopping_criterion=tol,
        sort_function=arg_largest_real, max_restarts=5000, dtype=dtype,
        ortho=ortho, key=jax.random.key(0),
    )

    # Warm-up (compilation + tunnel init), then the timed run.  The timed
    # run uses a DIFFERENT start key: the axon TPU terminal replays cached
    # results for bit-identical computations, which would make a same-input
    # warm run meaninglessly fast.
    partial_schur(Af, k, **kwargs)
    kwargs["key"] = jax.random.key(1)
    t0 = time.perf_counter()
    Q, T, hist = partial_schur(Af, k, **kwargs)
    jax.block_until_ready(Q)
    ours_s = time.perf_counter() - t0

    vals, vecs = eigenpairs_from_partial_schur(Q, T)
    vecs = np.asarray(vecs)
    res = np.linalg.norm(A @ vecs - vals * vecs, axis=0) / np.abs(vals)

    # ARPACK baseline on the host CPU, same problem and tolerance regime.
    from scipy.sparse.linalg import eigs

    t0 = time.perf_counter()
    r_vals, r_vecs = eigs(A, k, which="LR", tol=tol)
    arpack_s = time.perf_counter() - t0

    # Eigenvalues must agree (Hungarian matching; order is undefined).
    from scipy.optimize import linear_sum_assignment

    kk = min(len(vals), len(r_vals))
    cost = np.abs(np.asarray(vals)[:, None] - r_vals[None, :])
    ri, ci = linear_sum_assignment(cost)
    match_err = float(np.abs(np.asarray(vals)[ri] - r_vals[ci]).max())

    print(json.dumps({
        "metric": f"partial_schur_mark{m_grid}_k{k}_LR_wall",
        "value": round(ours_s, 4),
        "unit": "s",
        "vs_baseline": round(arpack_s / ours_s, 4),
        "n": n,
        "device": jax.devices()[0].platform,
        "dtype": str(np.dtype(dtype)),
        "tol": tol,
        "matvecs": int(hist.total_matvecs),
        "restarts": int(hist.restarts.max()),
        "max_rel_residual": float(res.max()),
        "arpack_seconds": round(arpack_s, 4),
        "eigval_match_err": match_err,
    }))


if __name__ == "__main__":
    main()
