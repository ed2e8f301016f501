"""Dispersion models and fault injection: wind, aero, thrust, IC scatter.

TPU-native counterpart of ``/root/reference/src/experiments/dispersion.py``:
wind models NONE/CONSTANT/GUST/DRYDEN (``:24-102``), aero dispersion
(``:105-138``), thrust dispersion — scale, misalignment, fluctuation
(``:141-190``), preset levels nominal/low/medium/high (``:233-285``), and the
``DispersedDynamics`` wrapper that injects all of it into the plant step
(``:285-372``) — the framework's fault-injection mechanism.

Everything is a pure function of (params, key, state, step-index), so the
dispersed plant drops into the Monte-Carlo scan and every scenario carries
its own fold of the PRNG key.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from flax import struct

Array = jax.Array

WIND_NONE = 0
WIND_CONSTANT = 1
WIND_GUST = 2
WIND_DRYDEN = 3


@struct.dataclass
class WindConfig:
    """(mirrors ``WindConfig``)."""

    model: int = struct.field(pytree_node=False, default=WIND_NONE)
    speed: Array = struct.field(default_factory=lambda: jnp.zeros(3))
    gust_amplitude: float = 0.5
    gust_period: float = 3.0
    # Dryden-like first-order colored noise
    dryden_sigma: float = 0.3
    dryden_tau: float = 2.0


def wind_velocity(
    cfg: WindConfig, key: Array, t: Array, wind_state: Array
) -> tuple[Array, Array]:
    """Wind velocity at time t plus the carried filter state (for Dryden)."""
    if cfg.model == WIND_NONE:
        return jnp.zeros(3), wind_state
    if cfg.model == WIND_CONSTANT:
        return cfg.speed, wind_state
    if cfg.model == WIND_GUST:
        phase = 2.0 * jnp.pi * t / cfg.gust_period
        return cfg.speed + cfg.gust_amplitude * jnp.sin(phase) * jnp.array([0.0, 1.0, 0.5]), wind_state
    if cfg.model == WIND_DRYDEN:
        # first-order Gauss-Markov: w⁺ = (1−dt/τ) w + σ√(2dt/τ) ξ
        dt = 0.1
        a = 1.0 - dt / cfg.dryden_tau
        xi = jax.random.normal(key, (3,))
        w_new = a * wind_state + cfg.dryden_sigma * jnp.sqrt(2 * dt / cfg.dryden_tau) * xi
        return cfg.speed + w_new, w_new
    raise ValueError(f"unknown wind model {cfg.model}")


@struct.dataclass
class DispersionConfig:
    """Full dispersion set with presets (mirrors ``DispersionConfig``;
    presets ``dispersion.py:233-285``)."""

    wind: WindConfig = struct.field(default_factory=WindConfig)
    # aero (acts when the plant has drag enabled)
    cd_scale_std: float = 0.0
    # thrust
    thrust_scale_std: float = 0.0  # multiplicative scale sampled per episode
    thrust_misalign_deg: float = 0.0  # fixed misalignment sampled per episode
    thrust_fluctuation_std: float = 0.0  # per-step multiplicative noise
    # wind drag coupling: acceleration per unit relative wind speed
    wind_drag_coeff: float = 0.05

    @classmethod
    def nominal(cls):
        return cls()

    @classmethod
    def low(cls):
        return cls(
            wind=WindConfig(model=WIND_CONSTANT, speed=jnp.array([0.0, 0.1, 0.0])),
            thrust_scale_std=0.01,
            thrust_fluctuation_std=0.005,
        )

    @classmethod
    def medium(cls):
        return cls(
            wind=WindConfig(model=WIND_GUST, speed=jnp.array([0.0, 0.2, 0.1]),
                            gust_amplitude=0.3),
            thrust_scale_std=0.03,
            thrust_misalign_deg=1.0,
            thrust_fluctuation_std=0.01,
        )

    @classmethod
    def high(cls):
        return cls(
            wind=WindConfig(model=WIND_DRYDEN, speed=jnp.array([0.0, 0.4, 0.2]),
                            dryden_sigma=0.5),
            thrust_scale_std=0.05,
            thrust_misalign_deg=2.0,
            thrust_fluctuation_std=0.03,
        )

    @classmethod
    def preset(cls, name: str):
        return {"nominal": cls.nominal, "low": cls.low, "medium": cls.medium,
                "high": cls.high}[name]()


@struct.dataclass
class DispersedState:
    """Per-scenario dispersion carry: PRNG key, wind filter state, per-episode
    multipliers (sampled once at init — the reference samples these per run,
    ``dispersion.py:141-190``)."""

    key: Array
    wind_state: Array
    thrust_scale: Array  # () per-episode multiplicative factor
    misalign: Array  # (3,3) per-episode rotation
    step: Array  # () int32


def _small_rotation(key: Array, angle_std_rad: Array) -> Array:
    """Random small rotation matrix (first-order) for thrust misalignment."""
    w = angle_std_rad * jax.random.normal(key, (3,))
    W = jnp.array([
        [0.0, -w[2], w[1]],
        [w[2], 0.0, -w[0]],
        [-w[1], w[0], 0.0],
    ])
    return jnp.eye(3) + W


def make_dispersed_plant(
    step_fn: Callable[[Array, Array], Array],
    config: DispersionConfig,
    dt: float = 0.1,
):
    """Build (dispersed_init, dispersed_step) — the ``DispersedDynamics``
    wrapper (``dispersion.py:285-372``) in state-passing form:

        dstate = dispersed_init(key)
        x_next, dstate = dispersed_step(dstate, x, u)

    Compose it into a Monte-Carlo controller/plant by carrying ``dstate``
    alongside the controller state.
    """

    def dispersed_init(key: Array) -> DispersedState:
        k1, k2, k3 = jax.random.split(key, 3)
        return DispersedState(
            key=k3,
            wind_state=jnp.zeros(3),
            thrust_scale=1.0 + config.thrust_scale_std * jax.random.normal(k1, ()),
            misalign=_small_rotation(k2, jnp.deg2rad(config.thrust_misalign_deg)),
            step=jnp.asarray(0, jnp.int32),
        )

    def dispersed_step(d: DispersedState, x: Array, u: Array):
        key, kw, kf = jax.random.split(d.key, 3)
        # thrust dispersion: scale · misalignment · per-step fluctuation
        fluct = 1.0 + config.thrust_fluctuation_std * jax.random.normal(kf, ())
        u_eff = d.thrust_scale * fluct * (d.misalign @ u)
        x_next = step_fn(x, u_eff)
        # wind: relative-velocity drag acceleration over the step
        t = d.step.astype(jnp.float32) * dt
        w, wind_state = wind_velocity(config.wind, kw, t, d.wind_state)
        x_next = x_next.at[4:7].add(config.wind_drag_coeff * w * dt)
        return x_next, d.replace(key=key, wind_state=wind_state, step=d.step + 1)

    return dispersed_init, dispersed_step


class DispersedDynamics:
    """OO facade matching the reference class name; prefer
    :func:`make_dispersed_plant` inside scans."""

    def __init__(self, step_fn, config: DispersionConfig, key: Array, dt: float = 0.1):
        self._init, self._step = make_dispersed_plant(step_fn, config, dt)
        self._state = self._init(key)

    def step(self, x: Array, u: Array) -> Array:
        x_next, self._state = self._step(self._state, x, u)
        return x_next


class WindModel:
    """Name-parity facade over :func:`wind_velocity`."""

    def __init__(self, config: WindConfig):
        self.config = config
        self.state = jnp.zeros(3)

    def velocity(self, key: Array, t: Array) -> Array:
        w, self.state = wind_velocity(self.config, key, t, self.state)
        return w


def run_dispersion_sweep(
    run_level: Callable[[DispersionConfig], dict],
    levels=("nominal", "low", "medium", "high"),
) -> dict:
    """Sweep preset dispersion levels (``dispersion.py:395-470``):
    ``run_level(config) → stats dict`` is typically a closed-over sharded
    campaign."""
    return {name: run_level(DispersionConfig.preset(name)) for name in levels}


def dispersion_ellipse(landing_points: Array) -> dict:
    """3σ dispersion-ellipse statistics of landing points (y, z)
    (``dispersion.py:472-599``)."""
    mu = jnp.mean(landing_points, axis=0)
    d = landing_points - mu[None]
    cov = d.T @ d / jnp.maximum(landing_points.shape[0] - 1, 1)
    evals, evecs = jnp.linalg.eigh(cov)
    return {
        "center": mu,
        "cov": cov,
        "semi_axes_3sigma": 3.0 * jnp.sqrt(jnp.maximum(evals, 0.0)),
        "axes": evecs,
        "cep_50": 1.1774 * jnp.sqrt(jnp.mean(jnp.diagonal(cov))),  # circular error probable
    }
