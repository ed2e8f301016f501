"""Monte-Carlo landing campaigns as one vmapped, scanned XLA program.

TPU-native counterpart of ``/root/reference/src/experiments/monte_carlo.py``:
the outcome taxonomy (``:25-33``), landing criteria checker (``:37-104``),
gaussian IC sampler (``:368-399``), per-episode loop with termination checks
(``:401-583``), Wilson-score CIs (``:252-272``) and controller comparison on
shared ICs (``:679-733``).

Where the reference runs scenarios sequentially even when asked for workers
(``:617-631``), here the *entire campaign* is ``vmap`` over the scenario axis
of a ``lax.scan`` over time: 4096 scenarios are one device program, and the
scenario axis shards over a TPU mesh (see ``gpmpc_tpu.parallel``).
Per-scenario heterogeneous termination is handled with frozen lanes and an
integer outcome code per lane.
"""

from __future__ import annotations

import math
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

Array = jax.Array

# outcome codes (mirror LandingOutcome, monte_carlo.py:25-33)
RUNNING = -1
SUCCESS = 0
CRASH = 1
FUEL_EXHAUSTED = 2
CONSTRAINT_VIOLATION = 3
TIMEOUT = 4
DIVERGENCE = 5

OUTCOME_NAMES = {
    SUCCESS: "success",
    CRASH: "crash",
    FUEL_EXHAUSTED: "fuel_exhausted",
    CONSTRAINT_VIOLATION: "constraint_violation",
    TIMEOUT: "timeout",
    DIVERGENCE: "divergence",
}


@struct.dataclass
class LandingCriteria:
    """Success thresholds at touchdown (mirrors ``LandingConstraints``)."""

    landing_altitude: float = 0.1
    max_landing_speed: float = 2.0
    max_position_error: float = 1.0
    max_tilt: float = math.radians(20.0)  # used for 14-state only
    max_angular_rate: float = math.radians(10.0)


@struct.dataclass
class SimulationConfig:
    """Campaign scenario parameters (mirrors ``SimulationConfig`` and the
    canonical quick-start numbers, ``run_experiments.py:356-371``)."""

    dt: float = 0.1
    max_steps: int = struct.field(pytree_node=False, default=200)
    # initial condition distribution (gravity along −x ⇒ x[1] is altitude)
    mass_mean: float = 2.0
    mass_std: float = 0.05
    altitude_mean: float = 30.0
    altitude_std: float = 2.0
    horizontal_std: float = 1.0
    vertical_velocity_mean: float = -3.0
    vertical_velocity_std: float = 0.3
    horizontal_velocity_std: float = 0.2
    m_dry: float = 1.0
    divergence_bound: float = 1e4


def sample_initial_conditions(
    key: Array, config: SimulationConfig, n: int, n_x: int = 7
) -> Array:
    """Gaussian IC sampler with physical clipping (``monte_carlo.py:368-399``).
    For n_x=14 the attitude starts at identity with zero rates."""
    km, ka, kh, kv, kw = jax.random.split(key, 5)
    m = jnp.clip(
        config.mass_mean + config.mass_std * jax.random.normal(km, (n,)),
        config.m_dry + 0.1,
        None,
    )
    alt = jnp.clip(
        config.altitude_mean + config.altitude_std * jax.random.normal(ka, (n,)),
        1.0,
        None,
    )
    horiz = config.horizontal_std * jax.random.normal(kh, (n, 2))
    v_vert = config.vertical_velocity_mean + config.vertical_velocity_std * jax.random.normal(kv, (n,))
    v_horiz = config.horizontal_velocity_std * jax.random.normal(kw, (n, 2))
    base = jnp.concatenate(
        [m[:, None], alt[:, None], horiz, v_vert[:, None], v_horiz], axis=1
    )
    if n_x == 7:
        return base
    quat = jnp.tile(jnp.array([1.0, 0.0, 0.0, 0.0]), (n, 1))
    omega = jnp.zeros((n, 3))
    return jnp.concatenate([base, quat, omega], axis=1)


def classify_touchdown(x: Array, criteria: LandingCriteria) -> Array:
    """SUCCESS vs CRASH at the moment altitude crosses the landing threshold
    (``monte_carlo.py:37-104``)."""
    speed = jnp.linalg.norm(x[..., 4:7], axis=-1)
    pos_err = jnp.linalg.norm(x[..., 2:4], axis=-1)
    ok = (speed <= criteria.max_landing_speed) & (pos_err <= criteria.max_position_error)
    if x.shape[-1] >= 14:
        cos_t = 1.0 - 2.0 * (x[..., 9] ** 2 + x[..., 10] ** 2)
        tilt = jnp.arccos(jnp.clip(cos_t, -1.0, 1.0))
        w = jnp.linalg.norm(x[..., 11:14], axis=-1)
        ok = ok & (tilt <= criteria.max_tilt) & (w <= criteria.max_angular_rate)
    return jnp.where(ok, SUCCESS, CRASH)


def run_episode(
    controller_init: Callable[[Array], object],
    controller_step: Callable[[object, Array, Array], Tuple[Array, object]],
    plant_step,
    x0: Array,
    sim: SimulationConfig,
    criteria: LandingCriteria,
    cstate_info: Optional[Callable[[object], Dict]] = None,
) -> Dict:
    """One full episode under lockstep scan with an outcome state machine
    (the single-scenario core of ``MonteCarloSimulator.run_single``,
    ``monte_carlo.py:401-583``). vmap over ``x0`` (and any batched controller
    state) for a campaign.

    ``cstate_info`` optionally maps the final controller state to extra
    per-lane result entries (e.g. safety-filter intervention counts via
    ``safety.filtered_controller_info``).

    ``plant_step`` is either a stateless ``f(x, u) -> x_next`` or a stateful
    pair ``(plant_init(x0) -> pstate, pstep(pstate, x, u) -> (x_next,
    pstate))`` — the hook for ``DispersedDynamics``-style fault injection
    whose noise state rides in the scan carry.
    """
    if isinstance(plant_step, tuple):
        plant_init, pstep = plant_step
    else:
        plant_init = lambda x0: jnp.zeros(0)
        pstep = lambda ps, x, u: (plant_step(x, u), ps)
    cstate0 = controller_init(x0)
    pstate0 = plant_init(x0)

    def body(carry, k):
        x, cstate, pstate, outcome, steps, fuel0 = carry
        running = outcome == RUNNING

        u, cstate_new = controller_step(cstate, x, k)
        x_next, pstate_new = pstep(pstate, x, u)

        # termination checks, in the reference's priority order
        diverged = (~jnp.all(jnp.isfinite(x_next))) | (
            jnp.max(jnp.abs(x_next)) > sim.divergence_bound
        )
        fuel_out = x_next[0] <= sim.m_dry
        touched = x_next[1] <= criteria.landing_altitude
        new_outcome = jnp.where(
            diverged,
            DIVERGENCE,
            jnp.where(
                touched,
                classify_touchdown(x_next, criteria),
                jnp.where(fuel_out, FUEL_EXHAUSTED, RUNNING),
            ),
        )
        outcome = jnp.where(running, new_outcome, outcome)

        x_out = jnp.where(running, x_next, x)
        cstate_out = jax.tree.map(
            lambda new, old: jnp.where(running, new, old), cstate_new, cstate
        )
        pstate_out = jax.tree.map(
            lambda new, old: jnp.where(running, new, old), pstate_new, pstate
        )
        steps = steps + jnp.where(running, 1, 0)
        return (x_out, cstate_out, pstate_out, outcome, steps, fuel0), (x_out, u)

    fuel0 = x0[0]
    init = (x0, cstate0, pstate0, jnp.asarray(RUNNING, jnp.int32),
            jnp.asarray(0, jnp.int32), fuel0)
    (x_f, cstate_f, _, outcome, steps, _), (X, U) = jax.lax.scan(
        body, init, jnp.arange(sim.max_steps)
    )
    outcome = jnp.where(outcome == RUNNING, TIMEOUT, outcome)
    out = {
        "outcome": outcome,
        "x_final": x_f,
        "steps": steps,
        "fuel_used": fuel0 - x_f[0],
        "landing_speed": jnp.linalg.norm(x_f[4:7]),
        "landing_error": jnp.linalg.norm(x_f[2:4]),
        "X": jnp.concatenate([x0[None], X], axis=0),
        "U": U,
    }
    if cstate_info is not None:
        out.update(cstate_info(cstate_f))
    return out


def run_campaign(
    controller_init,
    controller_step,
    plant_step,
    x0s: Array,
    sim: SimulationConfig,
    criteria: Optional[LandingCriteria] = None,
    store_trajectories: bool = False,
    cstate_info: Optional[Callable[[object], Dict]] = None,
) -> Dict:
    """vmapped campaign over scenarios (replaces the sequential
    ``MonteCarloSimulator.run``, ``monte_carlo.py:585-631``)."""
    criteria = criteria or LandingCriteria()

    def one(x0):
        out = run_episode(
            controller_init, controller_step, plant_step, x0, sim, criteria,
            cstate_info=cstate_info,
        )
        if not store_trajectories:
            out = {k: v for k, v in out.items() if k not in ("X", "U")}
        return out

    return jax.vmap(one)(x0s)


# =============================================================================
# Statistics (monte_carlo.py:186-314, analysis.py)
# =============================================================================


def wilson_interval(successes: Array, n: Array, z: float = 1.96) -> Tuple[Array, Array]:
    """Wilson score CI for a binomial proportion (``monte_carlo.py:252-272``)."""
    n = jnp.maximum(n, 1)
    p = successes / n
    denom = 1.0 + z**2 / n
    center = (p + z**2 / (2 * n)) / denom
    half = (z / denom) * jnp.sqrt(p * (1 - p) / n + z**2 / (4 * n**2))
    return jnp.clip(center - half, 0.0, 1.0), jnp.clip(center + half, 0.0, 1.0)


def campaign_statistics(results: Dict) -> Dict:
    """Aggregate a campaign result dict (device-side reductions; under pjit
    these become psum/collectives over the mesh)."""
    outcome = results["outcome"]
    n = outcome.shape[0]
    succ = jnp.sum(outcome == SUCCESS)
    lo, hi = wilson_interval(succ.astype(jnp.float32), jnp.asarray(n, jnp.float32))
    ok = outcome == SUCCESS
    okf = ok.astype(jnp.float32)
    denom = jnp.maximum(jnp.sum(okf), 1.0)

    def succ_mean(v):
        return jnp.sum(v * okf) / denom

    def succ_std(v):
        mu = succ_mean(v)
        return jnp.sqrt(jnp.maximum(jnp.sum(okf * (v - mu) ** 2) / denom, 0.0))

    return {
        "n_runs": n,
        "success_rate": succ / n,
        "success_ci": (lo, hi),
        "outcome_counts": {
            name: jnp.sum(outcome == code) for code, name in OUTCOME_NAMES.items()
        },
        "fuel_used_mean": succ_mean(results["fuel_used"]),
        "fuel_used_std": succ_std(results["fuel_used"]),
        "landing_speed_mean": succ_mean(results["landing_speed"]),
        "landing_error_mean": succ_mean(results["landing_error"]),
        "steps_mean": succ_mean(results["steps"].astype(jnp.float32)),
    }


def summarize(stats: Dict) -> str:
    """Human-readable campaign report (mirrors ``monte_carlo.py:274-314``)."""
    s = {k: (jax.device_get(v) if hasattr(v, "device") or hasattr(v, "devices") else v)
         for k, v in stats.items()}
    lines = [
        "Monte-Carlo campaign summary",
        "============================",
        f"runs:          {int(s['n_runs'])}",
        f"success rate:  {float(s['success_rate']):.3f}"
        f"  (95% CI [{float(s['success_ci'][0]):.3f}, {float(s['success_ci'][1]):.3f}])",
    ]
    for name, cnt in s["outcome_counts"].items():
        lines.append(f"  {name:22s} {int(cnt)}")
    lines += [
        f"fuel used (success): {float(s['fuel_used_mean']):.3f} ± {float(s['fuel_used_std']):.3f}",
        f"landing speed:       {float(s['landing_speed_mean']):.3f}",
        f"landing error:       {float(s['landing_error_mean']):.3f}",
        f"episode steps:       {float(s['steps_mean']):.1f}",
    ]
    return "\n".join(lines)


def compare_controllers(
    controllers: Dict[str, Tuple],
    plant_step,
    x0s: Array,
    sim: SimulationConfig,
    criteria: Optional[LandingCriteria] = None,
) -> Dict[str, Dict]:
    """Run several controllers on *shared* ICs (``monte_carlo.py:679-733``).
    ``controllers`` maps name → (controller_init, controller_step)."""
    out = {}
    for name, (cinit, cstep) in controllers.items():
        res = run_campaign(cinit, cstep, plant_step, x0s, sim, criteria)
        out[name] = campaign_statistics(res)
    return out
