"""Backup controllers: LQR around hover, PD fallback, emergency braking.

TPU-native counterpart of ``/root/reference/src/safety/backup_controller.py``:
LQR gains from the discrete ARE around the hover equilibrium with a PD
fallback (``:135-230``), saturated feedback u = u_eq − K(x − x_eq)
(``:232-255``), Lyapunov value (``:261-271``), backup rollouts (``:273-298``),
``PDBackupController`` (``:301-358``) and ``EmergencyBrakingController``
(``:361-398``). The ARE is the doubling recursion (``ops.linalg.dlqr``); the
"fallback on ARE failure" branch becomes a finite-check select, not a
try/except.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from ..ops.linalg import dlqr

Array = jax.Array


@struct.dataclass
class LQRBackupController:
    """LQR about an equilibrium (x_eq, u_eq) with clamped feedback."""

    K: Array  # (n_u, n_x)
    P: Array  # (n_x, n_x) Riccati cost-to-go (Lyapunov matrix)
    x_eq: Array
    u_eq: Array
    u_min: Array
    u_max: Array

    @classmethod
    def create(
        cls,
        linearize_fn: Callable[[Array, Array], Tuple[Array, Array]],
        x_eq: Array,
        u_eq: Array,
        Q: Array,
        R: Array,
        u_min: Array,
        u_max: Array,
        fallback_K: Optional[Array] = None,
    ) -> "LQRBackupController":
        """``linearize_fn(x, u) → (A_d, B_d)`` discrete Jacobians at the
        equilibrium. If the Riccati recursion returns non-finite values the
        hand-tuned ``fallback_K`` (PD-style, ``backup_controller.py:170-174``)
        is selected instead."""
        A, B = linearize_fn(x_eq, u_eq)
        K, P = dlqr(A, B, Q, R)
        ok = jnp.all(jnp.isfinite(K)) & jnp.all(jnp.isfinite(P))
        if fallback_K is None:
            fallback_K = pd_gain_matrix(Q.shape[0], B.shape[1])
        K = jnp.where(ok, K, fallback_K)
        P = jnp.where(ok, P, Q)
        return cls(K=K, P=P, x_eq=x_eq, u_eq=u_eq, u_min=u_min, u_max=u_max)

    def control(self, x: Array) -> Array:
        """Saturated u = u_eq − K(x − x_eq) (``backup_controller.py:232-255``)."""
        u = self.u_eq - self.K @ (x - self.x_eq)
        return jnp.clip(u, self.u_min, self.u_max)

    def lyapunov_value(self, x: Array) -> Array:
        e = x - self.x_eq
        return e @ self.P @ e

    def rollout(self, step_fn: Callable, x0: Array, n_steps: int) -> Array:
        """Closed-loop backup rollout (``backup_controller.py:273-298``)."""

        def body(x, _):
            x_next = step_fn(x, self.control(x))
            return x_next, x_next

        _, X = jax.lax.scan(body, x0, None, length=n_steps)
        return jnp.concatenate([x0[None], X], axis=0)


def pd_gain_matrix(n_x: int, n_u: int, kp: float = 2.0, kd: float = 3.0) -> Array:
    """Hand-tuned PD gain in LQR-gain form (the reference's fallback when the
    ARE fails, ``backup_controller.py:170-174``): each thrust axis feeds back
    its position and velocity error."""
    K = jnp.zeros((n_u, n_x))
    for i in range(min(n_u, 3)):
        K = K.at[i, 1 + i].set(kp).at[i, 4 + i].set(kd)
    return K


def hover_backup_3dof(params, altitude: float = 0.0, mass: Optional[float] = None,
                      Q: Optional[Array] = None, R: Optional[Array] = None,
                      dt: float = 0.1) -> LQRBackupController:
    """Build the canonical 3-DoF hover LQR backup (u_eq = [m·g, 0, 0],
    ``backup_controller.py:135-166``).

    The default Q puts a tiny ε on the mass coordinate: the reference uses
    exactly zero (``backup_controller.py:109-116``), which leaves the unit
    eigenvalue of the mass mode unobservable, makes `solve_discrete_are`
    throw, and silently degrades its "LQR" backup to PD gains. With ε the ARE
    is well-posed and the backup is a true LQR.
    """
    from ..dynamics import rocket3dof as r3

    m = params.m_wet if mass is None else mass
    x_eq = jnp.array([m, altitude, 0.0, 0.0, 0.0, 0.0, 0.0])
    u_eq = -m * params.g_I
    Q = jnp.diag(jnp.array([1e-4, 10.0, 10.0, 10.0, 5.0, 5.0, 5.0])) if Q is None else Q
    R = jnp.eye(3) * 0.1 if R is None else R
    lin = lambda x, u: (
        jax.jacfwd(lambda xx: r3.step(params, xx, u, dt))(x),
        jax.jacfwd(lambda uu: r3.step(params, x, uu, dt))(u),
    )
    T = params.T_max
    return LQRBackupController.create(
        lin, x_eq, u_eq, Q, R,
        u_min=jnp.array([params.T_min, -T, -T]), u_max=jnp.array([T, T, T]),
    )


@struct.dataclass
class PDBackupController:
    """Hand-tuned PD altitude/position hold (``backup_controller.py:301-358``)."""

    x_eq: Array
    u_eq: Array
    kp_pos: float = 2.0
    kd_vel: float = 3.0
    u_min: Array = None
    u_max: Array = None

    def control(self, x: Array) -> Array:
        e_pos = x[1:4] - self.x_eq[1:4]
        e_vel = x[4:7] - self.x_eq[4:7]
        u = self.u_eq - self.kp_pos * e_pos - self.kd_vel * e_vel
        if self.u_min is not None:
            u = jnp.clip(u, self.u_min, self.u_max)
        return u

    def lyapunov_value(self, x: Array) -> Array:
        e = x - self.x_eq
        return jnp.sum(e[1:7] ** 2)


@struct.dataclass
class EmergencyBrakingController:
    """Max deceleration against the velocity direction
    (``backup_controller.py:361-398``)."""

    T_max: float
    g_I: Array

    def control(self, x: Array) -> Array:
        v = x[4:7]
        vmag = jnp.linalg.norm(v)
        dir_ = jnp.where(vmag > 1e-6, -v / jnp.maximum(vmag, 1e-6), jnp.array([1.0, 0.0, 0.0]))
        # oppose velocity and cancel gravity as far as the budget allows
        u = dir_ * self.T_max - x[0] * self.g_I
        umag = jnp.linalg.norm(u)
        return u * jnp.minimum(1.0, self.T_max / jnp.maximum(umag, 1e-6))


def create_backup_controller(kind: str, **kw):
    """Factory (``backup_controller.py:401-427``)."""
    if kind == "lqr":
        return hover_backup_3dof(**kw)
    if kind == "pd":
        return PDBackupController(**kw)
    if kind == "braking":
        return EmergencyBrakingController(**kw)
    raise ValueError(f"unknown backup controller {kind!r}")
