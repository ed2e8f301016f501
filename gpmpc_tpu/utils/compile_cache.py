"""Persistent XLA compilation cache for the long-compile campaign programs.

The 6-DoF GP-MPC campaign compiles cold in ~2.5 minutes on the tunneled TPU
backend (remote compile) — paid again by every script invocation and every
multi-chip iteration loop. JAX's persistent compilation cache keyes compiled
executables on (HLO, compile options, backend) and replays them from disk.

Usage: call :func:`enable_compilation_cache` before the first jit dispatch
(the campaign/fleet scripts do). Safe to call when the backend does not
support serialization — the cache then simply never hits.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(os.path.dirname(__file__), "..", "..", ".jax_cache")


def _prune_lru(cache_dir: str, max_bytes: int) -> None:
    """Evict least-recently-used cache entries until the directory is under
    ``max_bytes``. Cache keys change with every ADMM/config variant, so a
    long sweep session grows the cache without bound otherwise."""
    entries = []
    total = 0
    for name in os.listdir(cache_dir):
        p = os.path.join(cache_dir, name)
        try:
            st = os.stat(p)
        except OSError:
            continue
        if os.path.isfile(p):
            entries.append((st.st_atime, st.st_size, p))
            total += st.st_size
    if total <= max_bytes:
        return
    for _, size, p in sorted(entries):
        try:
            os.remove(p)
        except OSError:
            continue
        total -= size
        if total <= max_bytes:
            break


def enable_compilation_cache(path: str | None = None) -> str:
    """Point JAX's persistent compilation cache at ``path`` (default: a
    repo-local ``.jax_cache/``) and lower the write thresholds so campaign
    programs (compile ≥ 1 s) are cached. Entries older than an LRU budget
    (``GPMPC_JAX_CACHE_MAX_GB``, default 8) are evicted on entry, so sweep
    sessions can't grow the cache without bound. Returns the directory."""
    import jax

    cache_dir = os.path.abspath(path or os.environ.get(
        "GPMPC_JAX_CACHE", _DEFAULT_DIR))
    os.makedirs(cache_dir, exist_ok=True)
    max_gb = float(os.environ.get("GPMPC_JAX_CACHE_MAX_GB", "8"))
    _prune_lru(cache_dir, int(max_gb * 2**30))
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    # cache regardless of how long the *first* trace took this process
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return cache_dir
