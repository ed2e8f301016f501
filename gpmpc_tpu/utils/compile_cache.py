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


def enable_compilation_cache(path: str | None = None) -> str:
    """Point JAX's persistent compilation cache at ``path`` (default: a
    repo-local ``.jax_cache/``) and lower the write thresholds so campaign
    programs (compile ≥ 1 s) are cached. Returns the cache directory."""
    import jax

    cache_dir = os.path.abspath(path or os.environ.get(
        "GPMPC_JAX_CACHE", _DEFAULT_DIR))
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    # cache regardless of how long the *first* trace took this process
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return cache_dir
