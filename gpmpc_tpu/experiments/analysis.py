"""Statistical analysis and result export.

TPU-native counterpart of ``/root/reference/src/experiments/analysis.py``:
``PerformanceMetrics`` with Wilson CIs and percentile compute stats
(``:40-146``), two-proportion z-tests and Welch t-tests with Cohen's d
(``:168-273``), and exporters to LaTeX / CSV / JSON / prose (``:274-478``).
Statistics are computed device-side; exporters are host-side formatting.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from .monte_carlo import SUCCESS, wilson_interval

Array = jax.Array


def _norm_sf(z):
    return 0.5 * (1.0 - jax.scipy.special.erf(z / jnp.sqrt(2.0)))


@dataclass
class PerformanceMetrics:
    """Per-controller campaign metrics (mirrors ``PerformanceMetrics``)."""

    name: str
    n_runs: int
    successes: int
    success_rate: float
    ci_low: float
    ci_high: float
    fuel_mean: float
    fuel_std: float
    fuel_median: float
    fuel_iqr: float
    landing_speed_mean: float
    landing_error_mean: float
    extras: dict = field(default_factory=dict)

    @classmethod
    def from_results(cls, name: str, results: Dict) -> "PerformanceMetrics":
        outcome = np.asarray(results["outcome"])
        ok = outcome == SUCCESS
        n = outcome.shape[0]
        succ = int(ok.sum())
        lo, hi = wilson_interval(jnp.asarray(float(succ)), jnp.asarray(float(n)))
        fuel = np.asarray(results["fuel_used"])[ok] if succ else np.zeros(1)
        q1, med, q3 = (np.percentile(fuel, [25, 50, 75]) if succ else (0, 0, 0))
        return cls(
            name=name,
            n_runs=n,
            successes=succ,
            success_rate=succ / max(n, 1),
            ci_low=float(lo),
            ci_high=float(hi),
            fuel_mean=float(fuel.mean()),
            fuel_std=float(fuel.std()),
            fuel_median=float(med),
            fuel_iqr=float(q3 - q1),
            landing_speed_mean=float(np.asarray(results["landing_speed"])[ok].mean())
            if succ else float("nan"),
            landing_error_mean=float(np.asarray(results["landing_error"])[ok].mean())
            if succ else float("nan"),
        )


def two_proportion_z_test(s1: int, n1: int, s2: int, n2: int) -> dict:
    """Success-rate comparison (``analysis.py:168-215``)."""
    p1, p2 = s1 / max(n1, 1), s2 / max(n2, 1)
    p = (s1 + s2) / max(n1 + n2, 1)
    se = np.sqrt(max(p * (1 - p) * (1 / max(n1, 1) + 1 / max(n2, 1)), 1e-12))
    z = (p1 - p2) / se
    pval = 2.0 * float(_norm_sf(jnp.abs(jnp.asarray(z))))
    return {"z": float(z), "p_value": pval, "significant_05": pval < 0.05,
            "p1": p1, "p2": p2}


def welch_t_test(a: Array, b: Array) -> dict:
    """Welch's t-test + Cohen's d (``analysis.py:217-273``). Uses a normal
    approximation for the p-value (sample sizes in campaigns are large)."""
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    na, nb = len(a), len(b)
    va, vb = a.var(ddof=1) if na > 1 else 0.0, b.var(ddof=1) if nb > 1 else 0.0
    se = np.sqrt(max(va / max(na, 1) + vb / max(nb, 1), 1e-12))
    t = (a.mean() - b.mean()) / se
    pooled = np.sqrt(max((va * (na - 1) + vb * (nb - 1)) / max(na + nb - 2, 1), 1e-12))
    d = (a.mean() - b.mean()) / pooled
    pval = 2.0 * float(_norm_sf(jnp.abs(jnp.asarray(t))))
    return {"t": float(t), "p_value": pval, "cohens_d": float(d),
            "significant_05": pval < 0.05}


def compute_improvement(base: PerformanceMetrics, new: PerformanceMetrics) -> dict:
    """Relative deltas (``analysis.py:481-504``)."""
    def rel(a, b):
        return (b - a) / abs(a) if a else float("inf")

    return {
        "success_rate_delta": new.success_rate - base.success_rate,
        "fuel_rel_change": rel(base.fuel_mean, new.fuel_mean),
        "landing_error_rel_change": rel(base.landing_error_mean, new.landing_error_mean),
    }


class StatisticalAnalyzer:
    """Facade mirroring ``StatisticalAnalyzer``."""

    def metrics(self, name: str, results: Dict) -> PerformanceMetrics:
        return PerformanceMetrics.from_results(name, results)

    def compare_success(self, m1: PerformanceMetrics, m2: PerformanceMetrics) -> dict:
        return two_proportion_z_test(m1.successes, m1.n_runs, m2.successes, m2.n_runs)

    def compare_fuel(self, r1: Dict, r2: Dict) -> dict:
        ok1 = np.asarray(r1["outcome"]) == SUCCESS
        ok2 = np.asarray(r2["outcome"]) == SUCCESS
        return welch_t_test(
            np.asarray(r1["fuel_used"])[ok1], np.asarray(r2["fuel_used"])[ok2]
        )


class ResultsExporter:
    """LaTeX / CSV / JSON / prose exporters (``analysis.py:274-478``)."""

    def to_latex(self, metrics: list[PerformanceMetrics]) -> str:
        rows = [
            r"\begin{tabular}{lrrrrr}",
            r"\toprule",
            r"Controller & Runs & Success & 95\% CI & Fuel & Err [m] \\",
            r"\midrule",
        ]
        for m in metrics:
            rows.append(
                f"{m.name} & {m.n_runs} & {m.success_rate:.1%} & "
                f"[{m.ci_low:.2f}, {m.ci_high:.2f}] & "
                f"{m.fuel_mean:.3f}$\\pm${m.fuel_std:.3f} & "
                f"{m.landing_error_mean:.3f} \\\\"
            )
        rows += [r"\bottomrule", r"\end{tabular}"]
        return "\n".join(rows).replace("%", r"\%")

    def to_csv(self, metrics: list[PerformanceMetrics]) -> str:
        hdr = ("name,n_runs,successes,success_rate,ci_low,ci_high,"
               "fuel_mean,fuel_std,fuel_median,fuel_iqr,"
               "landing_speed_mean,landing_error_mean")
        rows = [hdr] + [
            f"{m.name},{m.n_runs},{m.successes},{m.success_rate:.6f},"
            f"{m.ci_low:.6f},{m.ci_high:.6f},{m.fuel_mean:.6f},{m.fuel_std:.6f},"
            f"{m.fuel_median:.6f},{m.fuel_iqr:.6f},{m.landing_speed_mean:.6f},"
            f"{m.landing_error_mean:.6f}"
            for m in metrics
        ]
        return "\n".join(rows)

    def to_json(self, metrics: list[PerformanceMetrics]) -> str:
        return json.dumps([m.__dict__ for m in metrics], indent=2, default=str)

    def to_prose(self, metrics: list[PerformanceMetrics]) -> str:
        lines = []
        for m in metrics:
            lines.append(
                f"{m.name}: {m.successes}/{m.n_runs} landings succeeded "
                f"({m.success_rate:.1%}, 95% CI [{m.ci_low:.1%}, {m.ci_high:.1%}]); "
                f"successful runs used {m.fuel_mean:.3f}±{m.fuel_std:.3f} fuel "
                f"and landed {m.landing_error_mean:.2f} m from the pad at "
                f"{m.landing_speed_mean:.2f} m/s."
            )
        return "\n".join(lines)


def generate_summary_report(metrics: list[PerformanceMetrics]) -> str:
    """Prose + table summary (mirrors ``generate_summary_report``)."""
    exp = ResultsExporter()
    return exp.to_prose(metrics) + "\n\n" + exp.to_csv(metrics)
