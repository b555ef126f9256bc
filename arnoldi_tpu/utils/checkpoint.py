"""Checkpoint/resume for restarted solvers.

The reference has no persistence; its in-algorithm resume primitive is
``start_dim`` (SURVEY §5 — "the whole solver state is (V, H, p)").  Here
that state is made durable: a restart-boundary snapshot holds the sharded
Krylov basis, the high-precision host copy of the projected matrix, the
compression size, and the convergence bookkeeping.  Snapshots are plain
``.npz`` files (the basis is gathered to host); for multi-host runs each
process should write/read its own shard — a TODO once multi-host execution
lands.
"""

import dataclasses
import os

import numpy as np



@dataclasses.dataclass
class RestartCheckpoint:
    """Solver state at a restart boundary (just before re-expansion)."""

    V: np.ndarray          # (m+b, n_solve) transposed basis workspace
    H_hp: np.ndarray       # (m+1, m) high-precision projected matrix
    pa: int                # active compressed size (start_dim of next expand)
    restart: int           # restarts completed
    total_matvecs: int
    matvecs: np.ndarray    # per-eigenvalue history
    restarts: np.ndarray
    residual_trace: list
    k_lock: int = 0        # locked (converged, decoupled) leading pairs

def save_checkpoint(path, ckpt: RestartCheckpoint):
    # np.savez appends ".npz" unless the name already ends with it; write to
    # a tmp name and atomically rename onto the requested path.
    tmp = f"{path}.tmp.npz"
    np.savez(
        tmp,
        V=np.asarray(ckpt.V),
        H_hp=np.asarray(ckpt.H_hp),
        pa=ckpt.pa,
        restart=ckpt.restart,
        total_matvecs=ckpt.total_matvecs,
        matvecs=ckpt.matvecs,
        restarts=ckpt.restarts,
        residual_trace=np.asarray(ckpt.residual_trace, dtype=np.float64),
        k_lock=ckpt.k_lock,
    )
    os.replace(tmp, path)


def load_checkpoint(path) -> RestartCheckpoint:
    with np.load(path) as z:
        return RestartCheckpoint(
            V=z["V"],
            H_hp=z["H_hp"],
            pa=int(z["pa"]),
            restart=int(z["restart"]),
            total_matvecs=int(z["total_matvecs"]),
            matvecs=z["matvecs"],
            restarts=z["restarts"],
            residual_trace=list(z["residual_trace"]),
            k_lock=int(z["k_lock"]) if "k_lock" in z else 0,
        )
