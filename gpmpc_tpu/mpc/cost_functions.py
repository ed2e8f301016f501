"""Cost weights, stage costs, and LQR terminal costs for MPC.

TPU-native counterpart of ``/root/reference/src/mpc/cost_functions.py``: the
Q/R/P weight builders (``:39-103``), quadratic/fuel/tracking stage costs
(``:111-171``), and the ARE-based LQR terminal cost (``:179-336``) — with the
discrete ARE solved by the doubling recursion in ``ops.linalg`` instead of
``scipy.linalg.solve_discrete_are``.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from ..ops.linalg import dlqr

Array = jax.Array


@struct.dataclass
class CostWeights:
    """Diagonal weight configuration (defaults mirror ``cost_functions.py:39-103``
    — for 14-state: position 10, velocity 1, attitude penalizes only q_y/q_z
    (the tilt components for a +x long axis), rate 0.5; R = 0.01; P = 10·Q)."""

    w_mass: float = 0.0
    w_pos: float = 10.0
    w_vel: float = 1.0
    w_att: float = 5.0
    w_omega: float = 0.5
    w_ctrl: float = 0.01
    w_fuel: float = 0.0
    terminal_scale: float = 10.0

    def Q_6dof(self) -> Array:
        """14×14 state weight: attitude weight on the tilt quaternion
        components only (q_y, q_z for body +x; cf. ``cost_functions.py:60-76``)."""
        d = jnp.array(
            [self.w_mass]
            + [self.w_pos] * 3
            + [self.w_vel] * 3
            + [0.0, 0.0, self.w_att, self.w_att]
            + [self.w_omega] * 3
        )
        return jnp.diag(d)

    def Q_3dof(self) -> Array:
        """7×7 state weight (mass unweighted; ``nominal_mpc.py:620``)."""
        return jnp.diag(
            jnp.array([self.w_mass] + [self.w_pos] * 3 + [self.w_vel] * 3)
        )

    def R(self, n_u: int = 3) -> Array:
        return jnp.eye(n_u) * self.w_ctrl

    def P_6dof(self) -> Array:
        return self.Q_6dof() * self.terminal_scale

    def P_3dof(self) -> Array:
        return self.Q_3dof() * self.terminal_scale


def quadratic_stage_cost(x: Array, u: Array, x_ref: Array, Q: Array, R: Array) -> Array:
    """l(x,u) = (x−x_ref)ᵀQ(x−x_ref) + uᵀRu (``cost_functions.py:111-131``)."""
    e = x - x_ref
    return e @ Q @ e + u @ R @ u


def fuel_optimal_stage_cost(x: Array, u: Array, x_ref: Array, Q: Array, R: Array,
                            w_fuel: Array) -> Array:
    """Quadratic + fuel term w·‖T‖ (``cost_functions.py:133-151``)."""
    return quadratic_stage_cost(x, u, x_ref, Q, R) + w_fuel * jnp.linalg.norm(u)


def tracking_stage_cost(x: Array, u: Array, x_ref: Array, u_ref: Array,
                        Q: Array, R: Array) -> Array:
    """Track both state and control references (``cost_functions.py:153-171``)."""
    e, du = x - x_ref, u - u_ref
    return e @ Q @ e + du @ R @ du


def terminal_cost(x: Array, x_ref: Array, P: Array) -> Array:
    e = x - x_ref
    return e @ P @ e


def trajectory_cost(X: Array, U: Array, x_ref: Array, Q: Array, R: Array,
                    P: Array) -> Array:
    """Total cost of a rollout: Σ stage + terminal, as fused matmuls
    (replaces the per-step Python loop in ``cost_functions.py:429-528``)."""
    E = X[:-1] - x_ref
    stage = jnp.einsum("ki,ij,kj->", E, Q, E) + jnp.einsum("ki,ij,kj->", U, R, U)
    return stage + terminal_cost(X[-1], x_ref, P)


def compute_lqr_gain(A: Array, B: Array, Q: Array, R: Array) -> Tuple[Array, Array]:
    """Discrete LQR (K, P) via Riccati doubling (``cost_functions.py:179-239``)."""
    return dlqr(A, B, Q, R)


@struct.dataclass
class LQRTerminalCost:
    """Linearize-and-cache LQR terminal cost V(x) = (x−x_eq)ᵀP(x−x_eq)
    (``cost_functions.py:242-336``). Build once per equilibrium with
    :meth:`create`; evaluation is a pure function usable inside scans."""

    P: Array
    K: Array
    x_eq: Array

    @classmethod
    def create(
        cls,
        linearize_fn,
        x_eq: Array,
        u_eq: Array,
        Q: Array,
        R: Array,
        dt: Optional[float] = None,
    ) -> "LQRTerminalCost":
        """linearize_fn(x, u) → (A_d, B_d[, c]) discrete Jacobians at (x_eq, u_eq)."""
        out = linearize_fn(x_eq, u_eq)
        A_d, B_d = out[0], out[1]
        K, P = dlqr(A_d, B_d, Q, R)
        return cls(P=P, K=K, x_eq=x_eq)

    def value(self, x: Array) -> Array:
        e = x - self.x_eq
        return e @ self.P @ e

    def gradient(self, x: Array) -> Array:
        return 2.0 * self.P @ (x - self.x_eq)

    def control(self, x: Array, u_eq: Array) -> Array:
        return u_eq - self.K @ (x - self.x_eq)
