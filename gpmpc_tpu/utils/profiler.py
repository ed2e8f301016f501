"""Profiling and control-loop benchmarking.

TPU-native counterpart of ``/root/reference/src/utils/profiler.py``: ``Timer``
context manager (``:83-99``), ``Profiler`` with named-section accumulation
and percentage reports (``:116-229``), the ``profile_function`` decorator
(``:232-245``), ``LoopTiming`` with 50/100 Hz predicates (``:48-80``),
``ControlLoopBenchmark`` with warmup exclusion (``:248-370``), percentile-
based verdicts (``:415-429``) and ``MemoryProfiler`` nbytes accounting
(``:432-484``).

TPU caveat baked in: async dispatch means wall timing must block on (or
fetch) results — every timed section calls ``jax.block_until_ready`` on what
you hand it, and the module exposes ``trace`` to wrap a region in the real
``jax.profiler`` for kernel-level inspection.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from dataclasses import dataclass, field
from typing import Callable, Dict, Optional

import jax
import numpy as np


@dataclass
class LoopTiming:
    """Per-iteration section breakdown (mirrors ``LoopTiming``)."""

    gp_ms: float = 0.0
    mpc_ms: float = 0.0
    safety_ms: float = 0.0
    dynamics_ms: float = 0.0
    overhead_ms: float = 0.0

    @property
    def total_ms(self) -> float:
        return self.gp_ms + self.mpc_ms + self.safety_ms + self.dynamics_ms + self.overhead_ms

    @property
    def achieves_50hz(self) -> bool:
        return self.total_ms < 20.0

    @property
    def achieves_100hz(self) -> bool:
        return self.total_ms < 10.0


class Timer:
    """Context manager measuring blocked wall time in ms (``profiler.py:83-99``)."""

    def __init__(self, name: str = "", result=None):
        self.name = name
        self._result = result
        self.elapsed_ms = 0.0

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        if self._result is not None:
            jax.block_until_ready(self._result)
        self.elapsed_ms = (time.perf_counter() - self._t0) * 1e3
        return False


class Profiler:
    """Named-section accumulation with stats and a percentage report
    (``profiler.py:116-229``)."""

    def __init__(self):
        self._sections: Dict[str, list] = defaultdict(list)

    @contextlib.contextmanager
    def section(self, name: str, result=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if result is not None:
                jax.block_until_ready(result)
            self._sections[name].append((time.perf_counter() - t0) * 1e3)

    def add(self, name: str, elapsed_ms: float) -> None:
        self._sections[name].append(elapsed_ms)

    def stats(self, name: str) -> dict:
        v = np.asarray(self._sections[name])
        return {
            "n": len(v), "mean_ms": float(v.mean()), "std_ms": float(v.std()),
            "min_ms": float(v.min()), "max_ms": float(v.max()),
            "p95_ms": float(np.percentile(v, 95)),
        }

    def report(self) -> str:
        total = sum(sum(v) for v in self._sections.values())
        lines = [f"{'section':24s} {'n':>5s} {'mean':>9s} {'p95':>9s} {'%':>6s}"]
        for name, v in sorted(self._sections.items()):
            s = self.stats(name)
            pct = 100.0 * sum(v) / max(total, 1e-9)
            lines.append(
                f"{name:24s} {s['n']:5d} {s['mean_ms']:8.2f}m {s['p95_ms']:8.2f}m {pct:5.1f}%"
            )
        return "\n".join(lines)

    def reset(self) -> None:
        self._sections.clear()


def profile_function(profiler: Profiler, name: Optional[str] = None) -> Callable:
    """Decorator accumulating into a profiler (``profiler.py:232-245``)."""

    def deco(fn):
        sec = name or fn.__name__

        def wrapped(*a, **kw):
            t0 = time.perf_counter()
            out = fn(*a, **kw)
            jax.block_until_ready(out)
            profiler.add(sec, (time.perf_counter() - t0) * 1e3)
            return out

        return wrapped

    return deco


@dataclass
class BenchmarkResults:
    """(mirrors ``BenchmarkResults``, incl. ``get_percentile`` and the
    p95-based 50 Hz verdict, ``profiler.py:415-429``)."""

    timings: list = field(default_factory=list)
    warmup: int = 3

    def add(self, t: LoopTiming) -> None:
        self.timings.append(t)

    @property
    def _totals(self) -> np.ndarray:
        return np.asarray([t.total_ms for t in self.timings[self.warmup:]] or [0.0])

    def get_percentile(self, p: float) -> float:
        return float(np.percentile(self._totals, p))

    @property
    def meets_50hz(self) -> bool:
        return self.get_percentile(95) < 20.0

    @property
    def meets_100hz(self) -> bool:
        return self.get_percentile(95) < 10.0

    def summary(self) -> dict:
        v = self._totals
        return {
            "n": len(v), "mean_ms": float(v.mean()), "p50_ms": self.get_percentile(50),
            "p95_ms": self.get_percentile(95), "max_ms": float(v.max()),
            "meets_50hz": self.meets_50hz, "meets_100hz": self.meets_100hz,
        }


class ControlLoopBenchmark:
    """Instrument GP/MPC/safety/dynamics per control step with warmup
    exclusion (``profiler.py:248-370``). Use section timers around each
    phase; ``finish_step`` closes the iteration."""

    def __init__(self, warmup: int = 3):
        self.results = BenchmarkResults(warmup=warmup)
        self._current: Optional[LoopTiming] = None

    def start_step(self) -> None:
        self._current = LoopTiming()

    @contextlib.contextmanager
    def phase(self, name: str, result=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if result is not None:
                jax.block_until_ready(result)
            ms = (time.perf_counter() - t0) * 1e3
            setattr(self._current, f"{name}_ms", getattr(self._current, f"{name}_ms") + ms)

    def finish_step(self) -> None:
        self.results.add(self._current)
        self._current = None


class MemoryProfiler:
    """nbytes accounting of pytrees (``profiler.py:432-484``)."""

    @staticmethod
    def nbytes(tree) -> int:
        return sum(
            x.nbytes for x in jax.tree.leaves(tree) if hasattr(x, "nbytes")
        )

    @staticmethod
    def report(named_trees: Dict[str, object]) -> str:
        lines = []
        for name, tree in named_trees.items():
            mb = MemoryProfiler.nbytes(tree) / 1e6
            lines.append(f"{name:30s} {mb:10.3f} MB")
        return "\n".join(lines)


@contextlib.contextmanager
def trace(log_dir: str):
    """Wrap a region in the real ``jax.profiler`` trace for kernel-level
    analysis (the TPU-native upgrade of the reference's wall timers)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def benchmark_gp_prediction(predict_fn: Callable, X, n_repeats: int = 20) -> dict:
    """Structured timing with explicit rate verdicts (mirrors
    ``benchmark_gp_prediction``, ``profiler.py:487-530``)."""
    jax.block_until_ready(predict_fn(X))  # compile
    times = []
    for _ in range(n_repeats):
        t0 = time.perf_counter()
        jax.block_until_ready(predict_fn(X))
        times.append((time.perf_counter() - t0) * 1e3)
    v = np.asarray(times)
    return {
        "mean_ms": float(v.mean()), "p95_ms": float(np.percentile(v, 95)),
        "meets_5ms": float(np.percentile(v, 95)) < 5.0,
    }


def benchmark_mpc_solve(solve_fn: Callable, args, n_repeats: int = 10) -> dict:
    """(mirrors ``benchmark_mpc_solve``, ``profiler.py:532-575``)."""
    jax.block_until_ready(solve_fn(*args))
    times = []
    for _ in range(n_repeats):
        t0 = time.perf_counter()
        jax.block_until_ready(solve_fn(*args))
        times.append((time.perf_counter() - t0) * 1e3)
    v = np.asarray(times)
    return {
        "mean_ms": float(v.mean()), "p95_ms": float(np.percentile(v, 95)),
        "meets_50hz": float(np.percentile(v, 95)) < 20.0,
        "meets_100hz": float(np.percentile(v, 95)) < 10.0,
    }
