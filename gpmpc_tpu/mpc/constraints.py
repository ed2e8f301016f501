"""Constraint parameters, batched evaluators, and chance-constraint tightening.

TPU-native counterpart of ``/root/reference/src/mpc/constraints.py``: the
numpy evaluators (``:79-191``) become vmappable JAX functions; the CasADi
symbolic constraint builders (``:198-419``) are unnecessary — the same
functions are linearized by AD inside the SCP/RTI solvers. Chance-constraint
tightening g(μ) − κσ ≥ 0 (``:427-509``) is implemented directly.
"""

from __future__ import annotations

import math
from typing import Dict

import jax
import jax.numpy as jnp
from flax import struct

Array = jax.Array


@struct.dataclass
class ConstraintParams:
    """Rocket landing constraint set (defaults mirror ``constraints.py:35-62``).

    Angles are stored in radians (the reference stores degrees and converts in
    ``__post_init__``; here the ``*_deg`` constructor does the conversion once).
    """

    T_min: float = 0.5
    T_max: float = 5.0
    delta_max: float = math.radians(20.0)
    theta_max: float = math.radians(90.0)
    gamma_gs: float = math.radians(30.0)
    omega_max: float = math.radians(60.0)
    v_max: float = 50.0
    # terminal tolerances
    r_tol: float = 0.1
    v_tol: float = 0.1
    q_tol: float = math.radians(5.0)
    omega_tol: float = math.radians(1.0)

    @classmethod
    def from_degrees(
        cls,
        delta_max: float = 20.0,
        theta_max: float = 90.0,
        gamma_gs: float = 30.0,
        omega_max: float = 60.0,
        q_tol: float = 5.0,
        omega_tol: float = 1.0,
        **kw,
    ) -> "ConstraintParams":
        return cls(
            delta_max=math.radians(delta_max),
            theta_max=math.radians(theta_max),
            gamma_gs=math.radians(gamma_gs),
            omega_max=math.radians(omega_max),
            q_tol=math.radians(q_tol),
            omega_tol=math.radians(omega_tol),
            **kw,
        )


# =============================================================================
# Scalar evaluators (mirror constraints.py:79-191; all vmap over leading axes)
# =============================================================================


def eval_thrust_magnitude(u: Array) -> Array:
    return jnp.linalg.norm(u, axis=-1)


def eval_gimbal_angle(u: Array) -> Array:
    """Angle between thrust and the body long axis (+x for this 6-DoF model)."""
    T = jnp.linalg.norm(u, axis=-1)
    cos_d = u[..., 0] / jnp.maximum(T, 1e-10)
    return jnp.arccos(jnp.clip(cos_d, -1.0, 1.0))


def eval_tilt_angle(q: Array) -> Array:
    """Tilt from vertical for scalar-first q: cos θ = 1 − 2(q_y² + q_z²)."""
    cos_t = 1.0 - 2.0 * (q[..., 2] ** 2 + q[..., 3] ** 2)
    return jnp.arccos(jnp.clip(cos_t, -1.0, 1.0))


def eval_glideslope(r: Array, gamma: Array) -> Array:
    """h·tan(γ) − ‖r_horiz‖ (positive = satisfied; ``constraints.py:112-132``)."""
    h = r[..., 0]
    horiz = jnp.sqrt(r[..., 1] ** 2 + r[..., 2] ** 2)
    return h * jnp.tan(gamma) - horiz


def eval_angular_rate(omega: Array) -> Array:
    return jnp.linalg.norm(omega, axis=-1)


def check_all_constraints(x: Array, u: Array, params: ConstraintParams) -> Dict:
    """Full 6-DoF constraint report (mirrors ``constraints.py:130-191``).
    Works on batched states too (leading axes broadcast)."""
    r, v, q, omega = x[..., 1:4], x[..., 4:7], x[..., 7:11], x[..., 11:14]
    T = eval_thrust_magnitude(u)
    gim = eval_gimbal_angle(u)
    tilt = eval_tilt_angle(q)
    gs = eval_glideslope(r, params.gamma_gs)
    w = eval_angular_rate(omega)
    vmag = jnp.linalg.norm(v, axis=-1)
    sat = (
        (T >= params.T_min)
        & (T <= params.T_max)
        & (gim <= params.delta_max)
        & (tilt <= params.theta_max)
        & (gs >= 0)
        & (w <= params.omega_max)
        & (vmag <= params.v_max)
    )
    return {
        "thrust_magnitude": T,
        "thrust_min_satisfied": T >= params.T_min,
        "thrust_max_satisfied": T <= params.T_max,
        "gimbal_angle": gim,
        "gimbal_satisfied": gim <= params.delta_max,
        "tilt_angle": tilt,
        "tilt_satisfied": tilt <= params.theta_max,
        "glideslope_margin": gs,
        "glideslope_satisfied": gs >= 0,
        "angular_rate": w,
        "angular_rate_satisfied": w <= params.omega_max,
        "velocity_mag": vmag,
        "velocity_satisfied": vmag <= params.v_max,
        "all_satisfied": sat,
    }


def check_constraints_3dof(x: Array, u: Array, params: ConstraintParams) -> Dict:
    """3-DoF subset: thrust magnitude + glideslope + velocity."""
    T = eval_thrust_magnitude(u)
    gs = eval_glideslope(x[..., 1:4], params.gamma_gs)
    vmag = jnp.linalg.norm(x[..., 4:7], axis=-1)
    sat = (
        (T >= params.T_min)
        & (T <= params.T_max)
        & (gs >= 0)
        & (vmag <= params.v_max)
    )
    return {
        "thrust_magnitude": T,
        "glideslope_margin": gs,
        "velocity_mag": vmag,
        "all_satisfied": sat,
    }


# =============================================================================
# Chance-constraint tightening (constraints.py:427-509)
# =============================================================================


def normal_quantile(confidence: Array) -> Array:
    """κ = Φ⁻¹(confidence) via the inverse error function (replaces
    ``scipy.stats.norm.ppf``)."""
    return jnp.sqrt(2.0) * jax.scipy.special.erfinv(2.0 * confidence - 1.0)


@struct.dataclass
class TightenedConstraints:
    """Back-off amounts κσ per constraint, derived from propagated state
    covariances (``constraints.py:427-509``). Each entry is (N,) — one
    back-off per horizon step."""

    glideslope_backoff: Array
    velocity_backoff: Array
    tilt_backoff: Array
    omega_backoff: Array

    @classmethod
    def from_covariances(
        cls, Sigmas: Array, confidence: float = 0.95
    ) -> "TightenedConstraints":
        """σ for each constraint = gradient-weighted covariance projection,
        conservatively approximated with the block traces (position block for
        glideslope, velocity block for v_max, attitude/rate blocks when 14-D).
        """
        kappa = normal_quantile(jnp.asarray(confidence, Sigmas.dtype))
        pos_var = jnp.trace(Sigmas[..., 1:4, 1:4], axis1=-2, axis2=-1)
        vel_var = jnp.trace(Sigmas[..., 4:7, 4:7], axis1=-2, axis2=-1)
        n = Sigmas.shape[-1]
        if n >= 14:
            att_var = jnp.trace(Sigmas[..., 7:11, 7:11], axis1=-2, axis2=-1)
            om_var = jnp.trace(Sigmas[..., 11:14, 11:14], axis1=-2, axis2=-1)
        else:
            att_var = jnp.zeros_like(pos_var)
            om_var = jnp.zeros_like(pos_var)
        return cls(
            glideslope_backoff=kappa * jnp.sqrt(pos_var),
            velocity_backoff=kappa * jnp.sqrt(vel_var),
            tilt_backoff=kappa * jnp.sqrt(att_var),
            omega_backoff=kappa * jnp.sqrt(om_var),
        )


def tighten_bounds(
    lo: Array, hi: Array, backoff: Array
) -> tuple[Array, Array]:
    """Shrink a box [lo, hi] inward by `backoff` without crossing over."""
    mid = 0.5 * (lo + hi)
    new_lo = jnp.minimum(lo + backoff, mid)
    new_hi = jnp.maximum(hi - backoff, mid)
    return new_lo, new_hi


def constraint_jacobians(constraint_fn, x: Array, u: Array):
    """AD Jacobians of any scalar/vector constraint function — replaces the
    reference's finite-difference fallback (``constraints.py:517-584``)."""
    return (
        jax.jacfwd(constraint_fn, argnums=0)(x, u),
        jax.jacfwd(constraint_fn, argnums=1)(x, u),
    )
