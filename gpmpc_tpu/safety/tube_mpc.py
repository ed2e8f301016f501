"""Tube propagation and tube-based constraint tightening.

TPU-native counterpart of ``/root/reference/src/safety/tube_mpc.py``: the
interval tube e⁺ = |A_cl| e + w (``:80-119``), GP-driven tubes with w from
n·σ of the GP variance in the learned slices (``:121-183``), Monte-Carlo
particle tubes with quantile widths (``:185-241``), tube-width constraint
tighteners for thrust/glideslope/tilt (``:272-401``) and the
``RobustTubeMPC`` facade (``:404-509``).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import struct

Array = jax.Array


@struct.dataclass
class TubeMPCConfig:
    """(mirrors ``TubeMPCConfig``)."""

    n_sigma: float = 2.0
    dt: float = 0.1
    quantile: float = 0.95


class TubePropagator:
    """e_{k+1} = |A_cl| e_k + w (``tube_mpc.py:80-119``), plus GP-driven and
    Monte-Carlo variants."""

    def __init__(self, config: Optional[TubeMPCConfig] = None):
        self.config = config or TubeMPCConfig()

    def propagate(self, A_cls: Array, w: Array, e0: Optional[Array] = None) -> Array:
        n_x = A_cls.shape[-1]
        e0 = jnp.zeros(n_x, A_cls.dtype) if e0 is None else e0
        w = jnp.broadcast_to(w, (A_cls.shape[0], n_x))

        def body(e, inp):
            A, wk = inp
            e_new = jnp.abs(A) @ e + wk
            return e_new, e_new

        _, es = jax.lax.scan(body, e0, (A_cls, w))
        return jnp.concatenate([e0[None], es], axis=0)

    def propagate_gp(
        self, A_cls: Array, gp_vars: Array, e0: Optional[Array] = None
    ) -> Array:
        """w_k from n_σ·σ_GP·dt in the velocity/rate slices
        (``tube_mpc.py:121-183``)."""
        N, n_x = A_cls.shape[0], A_cls.shape[-1]
        sig = jnp.sqrt(jnp.maximum(gp_vars, 0.0))
        w = jnp.zeros((N, n_x), A_cls.dtype)
        w = w.at[:, 4:7].set(self.config.n_sigma * sig[:, :3] * self.config.dt)
        if n_x >= 14:
            w = w.at[:, 11:14].set(self.config.n_sigma * sig[:, 3:6] * self.config.dt)
        return self.propagate(A_cls, w, e0)

    def propagate_monte_carlo(
        self,
        key: Array,
        step_fn: Callable,
        x_nom: Array,
        U: Array,
        noise_std: Array,
        n_particles: int = 256,
    ) -> Array:
        """Quantile tube widths from particle spread (``tube_mpc.py:185-241``)."""
        n_x = x_nom.shape[-1]
        parts = jnp.tile(x_nom[0][None], (n_particles, 1))

        def body(carry, inp):
            parts, key = carry
            u, xn = inp
            key, sub = jax.random.split(key)
            parts = jax.vmap(lambda p: step_fn(p, u))(parts)
            parts = parts + noise_std * jax.random.normal(sub, parts.shape)
            width = jnp.quantile(jnp.abs(parts - xn[None]), self.config.quantile, axis=0)
            return (parts, key), width

        (_, _), widths = jax.lax.scan(body, (parts, key), (U, x_nom[1:]))
        return jnp.concatenate([jnp.zeros((1, n_x)), widths], axis=0)


class TubeConstraintTightener:
    """Shrink constraint limits by the tube width (``tube_mpc.py:272-401``)."""

    def __init__(self, K: Optional[Array] = None):
        self.K = K  # ancillary gain maps state tube → control back-off

    def tighten_box(self, lo: Array, hi: Array, e: Array):
        mid = 0.5 * (lo + hi)
        return jnp.minimum(lo + e, mid), jnp.maximum(hi - e, mid)

    def tighten_thrust(self, T_min: Array, T_max: Array, e: Array):
        """Control back-off ‖K e‖ on the thrust magnitude bounds."""
        du = jnp.linalg.norm(self.K @ e) if self.K is not None else 0.0
        return T_min + du, T_max - du

    def tighten_glideslope(self, gamma: Array, e_pos: Array) -> Array:
        """Effective altitude back-off: require h·tanγ ≥ ‖r_h‖ + ‖e_pos‖."""
        return jnp.linalg.norm(e_pos)

    def tighten_tilt(self, theta_max: Array, e_att: Array) -> Array:
        return theta_max - 2.0 * jnp.linalg.norm(e_att)


class RobustTubeMPC:
    """Facade: nominal MPC + ancillary feedback u = u_nom − K(x − x_nom)
    with tube-tightened constraints (``tube_mpc.py:404-509``)."""

    def __init__(self, K: Array, propagator: Optional[TubePropagator] = None):
        self.K = K
        self.propagator = propagator or TubePropagator()
        self.tightener = TubeConstraintTightener(K)

    def ancillary_control(self, x: Array, x_nom: Array, u_nom: Array,
                          u_min: Array, u_max: Array) -> Array:
        return jnp.clip(u_nom - self.K @ (x - x_nom), u_min, u_max)

    def tightened_bounds(self, A_cls: Array, w: Array, x_lo: Array, x_hi: Array):
        e = self.propagator.propagate(A_cls, w)
        return self.tightener.tighten_box(x_lo[None, :], x_hi[None, :], e)
