"""Checkpoint/resume for restarted solvers.

The reference has no persistence; its in-algorithm resume primitive is
``start_dim`` (SURVEY §5 — "the whole solver state is (V, H, p)").  Here
that state is made durable, and cheaply:

* Only the HEAD rows ``V[:pa+b]`` are saved — the truncated basis plus the
  carry (residual) block is the complete restart-boundary state; rows past
  it are re-derived by the next expansion.  A checkpoint therefore moves
  ``(pa+b) * n`` elements, not ``(max_dim+b) * n`` (6-8x less at the
  default geometry), and the solver keeps its FUSED truncate+expand
  dispatch — the head rows are bit-identical before and after the
  expansion that follows them, so they are snapshotted from the
  post-dispatch workspace without an extra device round trip.
* Under a mesh the basis is saved PER PROCESS: each process writes only
  its addressable column shards (``{path}.p{process_index}``), so a
  multi-host checkpoint never gathers the basis across hosts; process 0
  writes the small replicated metadata (H, counters).  Resume rebuilds
  the global array shard-by-shard with ``jax.make_array_from_callback``.

Snapshots are plain ``.npz`` files written via atomic rename.
"""

import dataclasses
import os

import numpy as np


@dataclasses.dataclass
class RestartCheckpoint:
    """Solver state at a restart boundary (just before re-expansion)."""

    V: object              # (pa+b, n_solve) HEAD rows: truncated basis+carry
    H_hp: np.ndarray       # (m+1, m) high-precision projected matrix
    pa: int                # active compressed size (start_dim of next expand)
    restart: int           # restarts completed
    total_matvecs: int
    matvecs: np.ndarray    # per-eigenvalue history
    restarts: np.ndarray
    residual_trace: list
    k_lock: int = 0        # locked (converged, decoupled) leading pairs


def _atomic_savez(path, **arrays):
    # np.savez appends ".npz" unless the name already ends with it; write to
    # a tmp name and atomically rename onto the requested path.
    tmp = f"{path}.tmp.npz"
    np.savez(tmp, **arrays)
    os.replace(tmp, path)


def _meta_arrays(ckpt: RestartCheckpoint):
    return dict(
        H_hp=np.asarray(ckpt.H_hp),
        pa=ckpt.pa,
        restart=ckpt.restart,
        total_matvecs=ckpt.total_matvecs,
        matvecs=ckpt.matvecs,
        restarts=ckpt.restarts,
        residual_trace=np.asarray(ckpt.residual_trace, dtype=np.float64),
        k_lock=ckpt.k_lock,
    )


def save_checkpoint(path, ckpt: RestartCheckpoint):
    """Single-file snapshot (host tier / single-device solves)."""
    _atomic_savez(path, V=np.asarray(ckpt.V), **_meta_arrays(ckpt))


def load_checkpoint(path) -> RestartCheckpoint:
    with np.load(path) as z:
        return RestartCheckpoint(
            V=z["V"] if "V" in z.files else None,   # sharded meta has no V
            H_hp=z["H_hp"],
            pa=int(z["pa"]),
            restart=int(z["restart"]),
            total_matvecs=int(z["total_matvecs"]),
            matvecs=z["matvecs"],
            restarts=z["restarts"],
            residual_trace=list(z["residual_trace"]),
            k_lock=int(z["k_lock"]) if "k_lock" in z else 0,
        )


def _generation(ckpt: RestartCheckpoint):
    """Deterministic per-save token, identical on every process.

    Derived from the replicated solver state (H head + counters) so all
    processes stamp the same value WITHOUT communicating.  Distinct saves
    produce distinct tokens (H changes every restart); a re-save of the
    exact same state produces the same token, whose stale shards would by
    construction hold the very data being saved — harmless to accept.
    """
    import hashlib

    h = hashlib.sha1()
    h.update(np.ascontiguousarray(ckpt.H_hp).tobytes())
    h.update(np.asarray([ckpt.restart, ckpt.total_matvecs],
                        dtype=np.int64).tobytes())
    return h.hexdigest()[:16]


def save_checkpoint_sharded(path, ckpt: RestartCheckpoint):
    """Mesh snapshot: per-process shard files + process-0 metadata.

    ``ckpt.V`` must be the (head, n_solve) jax array sharded over columns.
    Each process writes ``{path}.p{k}`` holding its addressable shards
    keyed by global column offset — no cross-host gather, and on a
    single-process mesh exactly one shard file.

    Every file carries a save GENERATION token (deterministic across
    processes, see :func:`_generation`): resuming at the same path after a
    save under MORE processes would otherwise silently mix stale
    ``.p{k}`` pieces from the wider save into the assembled basis (their
    column offsets still look valid).  The loader rejects pieces whose
    generation differs from the metadata's, and process 0 additionally
    deletes surplus ``{path}.p{k}`` files beyond the current process
    count (same shared-filesystem assumption the save already makes).
    """
    import glob

    import jax

    V = ckpt.V
    gen = _generation(ckpt)
    shards = {"gen": np.asarray(gen)}
    for s in V.addressable_shards:
        col0 = s.index[1].start or 0
        shards[f"c{col0}"] = np.asarray(s.data)
    _atomic_savez(f"{path}.p{jax.process_index()}", **shards)
    if jax.process_index() == 0:
        _atomic_savez(path, sharded=np.asarray(True),
                      head=np.asarray(V.shape[0]),
                      n_solve=np.asarray(V.shape[1]),
                      gen=np.asarray(gen),
                      **_meta_arrays(ckpt))
        for fn in glob.glob(f"{path}.p*"):
            if fn.endswith(".tmp.npz"):
                continue
            try:
                k = int(fn[len(path) + 2:])
            except ValueError:
                continue
            if k >= jax.process_count():
                try:
                    os.unlink(fn)
                except OSError:
                    pass


def load_checkpoint_sharded(path, mesh, n_solve=None) -> RestartCheckpoint:
    """Rebuild a mesh snapshot: metadata from ``path``, basis shards from
    the per-process files, assembled into a global array over ``mesh``.

    RESUME IS MESH-ELASTIC: ``mesh`` need not match the mesh that saved
    the snapshot — an N-way checkpoint loads into an M-way mesh (the
    fault-recovery story: lose a host, resume on what remains; regain
    capacity, resume wider).  Each requested target shard is assembled
    from whichever saved shard pieces cover its column range: the fast
    path (same mesh) still reads only this process's own file; resharding
    reads the minimal set of neighbour files (shared filesystem, the same
    assumption the save path makes).
    """
    import glob

    import jax
    from jax.sharding import NamedSharding, PartitionSpec

    ck = load_checkpoint(path)
    with np.load(path) as z:
        head = int(z["head"])
        n_saved = int(z["n_solve"])
        gen = str(z["gen"]) if "gen" in z.files else None

    # Directory of saved pieces: col0 -> (file, key).  Keys are read from
    # every shard file header (cheap); array data loads lazily on demand.
    # Shard files from a DIFFERENT save generation (stale leftovers of an
    # earlier save under more processes) are rejected: their column
    # offsets look valid but their data belongs to another restart.
    own = f"{path}.p{jax.process_index()}"

    def _file_gen(z):
        return str(z["gen"]) if "gen" in z.files else None

    pieces = {}
    stale = []
    for fn in sorted(glob.glob(f"{path}.p*")):
        if fn.endswith(".tmp.npz"):
            continue
        with np.load(fn) as z:
            if gen is not None and _file_gen(z) != gen:
                stale.append(fn)
                continue
            for k in z.files:
                if k.startswith("c"):
                    pieces.setdefault(int(k[1:]), (fn, k))
    if not pieces:
        raise FileNotFoundError(
            f"no shard files found for {path}"
            + (f" at generation {gen} (stale-generation files "
               f"ignored: {stale})" if stale else ""))
    starts = sorted(pieces)
    cache = {}

    def _piece(col0):
        if col0 not in cache:
            fn, k = pieces[col0]
            with np.load(fn) as z:
                cache[col0] = z[k]
        return cache[col0]

    # Prefer this process's own file for the same-mesh fast path.
    if os.path.exists(own):
        with np.load(own) as z:
            if gen is None or _file_gen(z) == gen:
                for k in z.files:
                    if k.startswith("c"):
                        cache[int(k[1:])] = z[k]

    import bisect

    def _cb(index):
        cols = index[1]
        c0 = cols.start or 0
        c1 = cols.stop if cols.stop is not None else n_solve
        if c0 in cache and cache[c0].shape[1] == c1 - c0:
            return cache[c0]         # exact piece (same-mesh fast path)
        parts = []
        cur = c0
        while cur < c1:
            if cur >= n_saved:
                # The new mesh pads wider than the saving one: those
                # columns are rows the solve never touches — zeros by
                # construction (pad_operator's contract).
                parts.append(np.zeros((head, c1 - cur),
                                      dtype=_piece(starts[0]).dtype))
                break
            i = bisect.bisect_right(starts, cur) - 1
            if i < 0:
                raise ValueError(
                    f"checkpoint has no shard covering column {cur} "
                    f"(saved offsets: {starts})")
            p0 = starts[i]
            arr = _piece(p0)
            if p0 + arr.shape[1] <= cur:
                raise ValueError(
                    f"checkpoint shard gap at column {cur} (piece at {p0} "
                    f"is {arr.shape[1]} wide)")
            hi = min(c1, p0 + arr.shape[1], n_saved)
            take = arr[:, cur - p0 : hi - p0]
            parts.append(take)
            cur += take.shape[1]
        out = parts[0] if len(parts) == 1 else np.concatenate(parts, axis=1)
        return np.ascontiguousarray(out)

    n_solve = n_solve if n_solve is not None else n_saved
    sharding = NamedSharding(mesh, PartitionSpec(None, mesh.axis_names[0]))
    ck.V = jax.make_array_from_callback((head, n_solve), sharding, _cb)
    return ck


def checkpoint_is_sharded(path):
    with np.load(path) as z:
        return "sharded" in z.files
