"""Persistent XLA compilation cache wiring.

The device path's fused truncate+expand dispatch compiles PER (pa, m,
max_dim) shape — ~10 s each through a remote-TPU tunnel (the pa retention
ladder exists precisely to bound the shape count).  Those compiles are
deterministic, so JAX's persistent compilation cache removes them from
every process after the first: a cold process's first solve then costs
what a warm solve costs, plus only cache-deserialization milliseconds.

Call :func:`enable` early (before the first jit execution) — ``bench.py``
does, and long-lived services should too.  Environment override:
``ARNOLDI_COMPILE_CACHE`` (path; empty string disables).
"""

import os

#: Default on-disk location (shared across processes and container runs
#: when the home volume persists).
DEFAULT_DIR = os.path.expanduser("~/.cache/arnoldi_tpu/xla")


def enable(path=None, *, min_compile_time=1.0):
    """Turn on JAX's persistent compilation cache at ``path``.

    ``min_compile_time``: only cache compilations that took at least this
    many seconds (the tiny eager-op compiles are cheaper to redo than to
    serialize).  Returns the cache directory, or None when disabled via
    ``ARNOLDI_COMPILE_CACHE=""``.
    """
    env = os.environ.get("ARNOLDI_COMPILE_CACHE")
    if env == "":
        return None
    path = env or path or DEFAULT_DIR
    os.makedirs(path, exist_ok=True)

    import jax

    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      float(min_compile_time))
    # Cache every kind of miss (including first-ever compiles).
    try:
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        pass  # older jax: size gate not available
    return path
