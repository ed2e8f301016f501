"""6-DoF quaternion rigid-body powered-descent dynamics in pure JAX.

TPU-native replacement for the reference wrapper + missing ``simdyn`` backend
(``/root/reference/src/dynamics/rocket_6dof.py``; equations as written
symbolically in ``/root/reference/src/mpc/nominal_mpc.py:162-203`` and
``/root/reference/src/lmpc/lmpc.py:417-470``):

State  x = [m, r_I(3), v_I(3), q_BI(4, scalar-first), ω_B(3)]  (n_x = 14)
Control u = T_B(3)  thrust in the body frame                   (n_u = 3)

    ṁ  = −α ‖T_B‖
    ṙ  = v
    v̇  = C_IB(q) T_B / m + g_I
    q̇  = ½ [−ω·q_v ; q_w ω + ω × q_v]
    ω̇  = J⁻¹ (r_T_B × T_B − ω × J ω)

Szmuk-normalized defaults: J_B = 0.168·diag(0.02, 1, 1), r_T_B = [−0.25,0,0],
g_I = [−1,0,0] (``rocket_6dof.py:75-89``). Body +x is the rocket's long axis
(thrust nominally along +x, gravity along −x inertial).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from .integrators import get_step_fn

Array = jax.Array

N_STATE = 14
N_CONTROL = 3

IDX_MASS = 0
IDX_POS = slice(1, 4)
IDX_VEL = slice(4, 7)
IDX_QUAT = slice(7, 11)
IDX_OMEGA = slice(11, 14)

_EPS_THRUST = 1e-10


@struct.dataclass
class Rocket6DoFParams:
    """Physical parameters as a pytree (Szmuk defaults, ``rocket_6dof.py:40-89``)."""

    m_dry: float = 1.0
    m_wet: float = 2.0
    J_B: Array = struct.field(
        default_factory=lambda: jnp.diag(jnp.array([0.02, 1.0, 1.0])) * 0.168
    )
    I_sp: float = 30.0
    g0: float = 1.0
    T_min: float = 1.5
    T_max: float = 6.5
    r_T_B: Array = struct.field(default_factory=lambda: jnp.array([-0.25, 0.0, 0.0]))
    r_cp_B: Array = struct.field(default_factory=lambda: jnp.array([0.05, 0.0, 0.0]))
    g_I: Array = struct.field(default_factory=lambda: jnp.array([-1.0, 0.0, 0.0]))
    # constraint angles [rad]
    delta_max: float = math.radians(20.0)
    theta_max: float = math.radians(90.0)
    gamma_gs: float = math.radians(30.0)
    omega_max: float = math.radians(60.0)
    # aero (zero coefficients disable)
    rho: float = 0.0
    S_ref: float = 1.0
    C_A: Array = struct.field(default_factory=lambda: jnp.zeros((3, 3)))
    # integration
    default_dt: float = 0.1
    integrator: str = struct.field(pytree_node=False, default="rk4")

    @property
    def alpha(self):
        return 1.0 / (self.I_sp * self.g0)

    @property
    def g(self):
        return jnp.linalg.norm(self.g_I)

    @classmethod
    def szmuk_defaults(cls) -> "Rocket6DoFParams":
        return cls()


Rocket6DoFConfig = Rocket6DoFParams


# =============================================================================
# Quaternion helpers
# =============================================================================


def dcm_from_quaternion(q: Array) -> Array:
    """Body→inertial rotation matrix C_IB(q), scalar-first quaternion.

    Same algebraic form as the reference symbolic builder
    (``nominal_mpc.py:176-181``).
    """
    qw, qx, qy, qz = q[0], q[1], q[2], q[3]
    return jnp.array(
        [
            [1 - 2 * (qy**2 + qz**2), 2 * (qx * qy - qw * qz), 2 * (qx * qz + qw * qy)],
            [2 * (qx * qy + qw * qz), 1 - 2 * (qx**2 + qz**2), 2 * (qy * qz - qw * qx)],
            [2 * (qx * qz - qw * qy), 2 * (qy * qz + qw * qx), 1 - 2 * (qx**2 + qy**2)],
        ]
    )


def tilt_angle(q: Array) -> Array:
    """Tilt from vertical: cos θ = 1 − 2(q_y² + q_z²).

    The body long axis is +x; its inertial-x component is C_IB[0,0].
    (The reference's generic helper uses q_x,q_y — ``constraints.py:103-112`` —
    which corresponds to a +z long axis; for this model's +x axis the correct
    pair is (q_y, q_z), matching ``rocket_6dof.py`` tilt about body x.)
    """
    cos_theta = 1.0 - 2.0 * (q[2] ** 2 + q[3] ** 2)
    return jnp.arccos(jnp.clip(cos_theta, -1.0, 1.0))


# =============================================================================
# Continuous / discrete dynamics
# =============================================================================


def f(params: Rocket6DoFParams, x: Array, u: Array) -> Array:
    """Continuous dynamics ẋ = f(x, u)."""
    m = x[0]
    v = x[4:7]
    q = x[7:11]
    omega = x[11:14]

    C_IB = dcm_from_quaternion(q)
    T_mag = jnp.sqrt(jnp.sum(u * u) + _EPS_THRUST**2)

    # aero force in body frame: F_A = -½ ρ S C_A ‖v‖ v_B  (zero when rho=0);
    # smooth ‖v‖ keeps the AD Jacobian finite at v = 0
    v_B = C_IB.T @ v
    v_mag = jnp.sqrt(jnp.sum(v * v) + _EPS_THRUST**2)
    F_A_B = -(0.5 * params.rho * params.S_ref) * (params.C_A @ v_B) * v_mag

    m_dot = -params.alpha * T_mag
    r_dot = v
    v_dot = C_IB @ (u + F_A_B) / m + params.g_I

    qw, qv = q[0], q[1:4]
    q_dot = 0.5 * jnp.concatenate(
        [(-jnp.dot(omega, qv))[None], qw * omega + jnp.cross(omega, qv)]
    )

    torque = jnp.cross(params.r_T_B, u) + jnp.cross(params.r_cp_B, F_A_B)
    omega_dot = jnp.linalg.solve(params.J_B, torque - jnp.cross(omega, params.J_B @ omega))

    return jnp.concatenate([m_dot[None], r_dot, v_dot, q_dot, omega_dot])


def normalize_quaternion(x: Array) -> Array:
    """Renormalize the quaternion block of a state vector."""
    q = x[7:11]
    q = q / jnp.linalg.norm(q)
    return x.at[7:11].set(q)


def step(params: Rocket6DoFParams, x: Array, u: Array, dt=None) -> Array:
    """Discrete step with post-hoc quaternion renormalization
    (mirrors ``rocket_6dof.py:351-387``)."""
    dt = params.default_dt if dt is None else dt
    x_next = get_step_fn(params.integrator)(partial(f, params), x, u, dt)
    return normalize_quaternion(x_next)


def simulate(params: Rocket6DoFParams, x0: Array, U: Array, dt=None) -> Array:
    """Open-loop rollout (N,3) → (N+1,14), renormalizing each step."""
    dt = params.default_dt if dt is None else dt

    def body(x, u):
        x_next = step(params, x, u, dt)
        return x_next, x_next

    _, X = jax.lax.scan(body, x0, U)
    return jnp.concatenate([x0[None], X], axis=0)


# =============================================================================
# Jacobians
# =============================================================================


def linearize_continuous(params, x, u) -> Tuple[Array, Array]:
    """(A_c, B_c) = (∂f/∂x, ∂f/∂u) by forward-mode AD (exact)."""
    return (
        jax.jacfwd(lambda xx: f(params, xx, u))(x),
        jax.jacfwd(lambda uu: f(params, x, uu))(u),
    )


def linearize_discrete(params, x, u, dt=None) -> Tuple[Array, Array, Array]:
    """Exact discrete linearization of the renormalized step."""
    dt = params.default_dt if dt is None else dt
    F = lambda xx, uu: step(params, xx, uu, dt)
    A_d = jax.jacfwd(F, argnums=0)(x, u)
    B_d = jax.jacfwd(F, argnums=1)(x, u)
    c = F(x, u) - A_d @ x - B_d @ u
    return A_d, B_d, c


# =============================================================================
# Constraints (negative = satisfied, matching the reference sign convention)
# =============================================================================


def thrust_constraint(params, u) -> Tuple[Array, Array]:
    T_mag = jnp.linalg.norm(u)
    return params.T_min - T_mag, T_mag - params.T_max


def gimbal_constraint(params, u) -> Array:
    """Gimbal angle δ between thrust and body +x axis minus δ_max.

    cos δ = u_x/‖u‖ (body long axis is +x; cf. ``rocket_6dof.py:492-520``).
    """
    T_mag = jnp.linalg.norm(u)
    cos_delta = u[0] / jnp.maximum(T_mag, 1e-10)
    delta = jnp.arccos(jnp.clip(cos_delta, -1.0, 1.0))
    return delta - params.delta_max


def tilt_constraint(params, x) -> Array:
    return tilt_angle(x[7:11]) - params.theta_max


def glide_slope_constraint(params, x) -> Array:
    h = x[1]
    horiz = jnp.sqrt(x[2] ** 2 + x[3] ** 2)
    return horiz - h * jnp.tan(params.gamma_gs)


def angular_rate_constraint(params, x) -> Array:
    return jnp.linalg.norm(x[11:14]) - params.omega_max


def evaluate_constraints(params, x, u) -> dict:
    lo, hi = thrust_constraint(params, u)
    return {
        "thrust_lower": lo,
        "thrust_upper": hi,
        "gimbal": gimbal_constraint(params, u),
        "tilt": tilt_constraint(params, x),
        "glide_slope": glide_slope_constraint(params, x),
        "angular_rate": angular_rate_constraint(params, x),
    }


# =============================================================================
# Control utilities
# =============================================================================


def hover_thrust(params, x) -> Array:
    """Body-frame thrust canceling gravity at current attitude/mass
    (projects −m g_I into the body frame)."""
    C_IB = dcm_from_quaternion(x[7:11])
    return C_IB.T @ (-x[0] * params.g_I)


def clamp_thrust(params, u) -> Array:
    T_mag = jnp.linalg.norm(u)
    safe_dir = jnp.where(T_mag > 1e-10, u / jnp.maximum(T_mag, 1e-10), jnp.array([1.0, 0.0, 0.0]))
    return safe_dir * jnp.clip(T_mag, params.T_min, params.T_max)


def clamp_gimbal(params, u) -> Array:
    """Project thrust into the gimbal cone about body +x preserving magnitude
    (mirrors ``rocket_6dof.py:634-669``)."""
    T_mag = jnp.linalg.norm(u)
    ux = u[0]
    u_perp = u[1:]
    perp = jnp.linalg.norm(u_perp)
    delta = jnp.arctan2(perp, ux)
    inside = delta <= params.delta_max
    # rotate onto the cone edge: keep magnitude, set angle to delta_max
    new_ux = T_mag * jnp.cos(params.delta_max)
    new_perp_mag = T_mag * jnp.sin(params.delta_max)
    dir_perp = jnp.where(perp > 1e-10, u_perp / jnp.maximum(perp, 1e-10), jnp.zeros(2))
    proj = jnp.concatenate([new_ux[None], new_perp_mag * dir_perp])
    return jnp.where(inside, u, proj)


def create_initial_state(
    params: Optional[Rocket6DoFParams] = None,
    altitude: float = 10.0,
    mass: Optional[float] = None,
    horizontal: Tuple[float, float] = (0.0, 0.0),
    velocity: Tuple[float, float, float] = (0.0, 0.0, 0.0),
    quaternion: Tuple[float, float, float, float] = (1.0, 0.0, 0.0, 0.0),
    omega: Tuple[float, float, float] = (0.0, 0.0, 0.0),
) -> Array:
    params = params or Rocket6DoFParams()
    m = params.m_wet if mass is None else mass
    return jnp.array([m, altitude, *horizontal, *velocity, *quaternion, *omega])


class Rocket6DoF:
    """OO facade with reference-parity method names (``Rocket6DoFDynamics``)."""

    N_STATE = N_STATE
    N_CONTROL = N_CONTROL
    IDX_MASS = IDX_MASS
    IDX_POS = IDX_POS
    IDX_VEL = IDX_VEL
    IDX_QUAT = IDX_QUAT
    IDX_OMEGA = IDX_OMEGA

    def __init__(self, params: Optional[Rocket6DoFParams] = None):
        self.params = params or Rocket6DoFParams()

    @property
    def config(self):
        return self.params

    @property
    def n_state(self):
        return N_STATE

    @property
    def n_control(self):
        return N_CONTROL

    def f(self, x, u):
        return f(self.params, x, u)

    dynamics = f

    def step(self, x, u, dt=None):
        return step(self.params, x, u, dt)

    f_discrete = step

    def simulate(self, x0, U, dt=None):
        return simulate(self.params, x0, U, dt)

    def jacobian_x(self, x, u):
        return linearize_continuous(self.params, x, u)[0]

    def jacobian_u(self, x, u):
        return linearize_continuous(self.params, x, u)[1]

    A = jacobian_x
    B = jacobian_u

    def linearize(self, x, u, dt=None):
        A_c, B_c = linearize_continuous(self.params, x, u)
        if dt is not None:
            return jnp.eye(N_STATE) + A_c * dt, B_c * dt
        return A_c, B_c

    def linearize_discrete(self, x, u, dt=None):
        return linearize_discrete(self.params, x, u, dt)

    def get_dcm(self, x):
        return dcm_from_quaternion(x[7:11])

    def get_tilt_angle(self, x):
        return tilt_angle(x[7:11])

    def thrust_constraint(self, u):
        return thrust_constraint(self.params, u)

    def gimbal_constraint(self, u):
        return gimbal_constraint(self.params, u)

    def tilt_constraint(self, x):
        return tilt_constraint(self.params, x)

    def glide_slope_constraint(self, x):
        return glide_slope_constraint(self.params, x)

    def angular_rate_constraint(self, x):
        return angular_rate_constraint(self.params, x)

    def evaluate_constraints(self, x, u):
        return evaluate_constraints(self.params, x, u)

    def hover_thrust(self, x):
        return hover_thrust(self.params, x)

    def clamp_thrust(self, u):
        return clamp_thrust(self.params, u)

    def clamp_gimbal(self, u):
        return clamp_gimbal(self.params, u)

    def fuel_remaining(self, x):
        return x[0] - self.params.m_dry

    def fuel_fraction(self, x):
        return (x[0] - self.params.m_dry) / (self.params.m_wet - self.params.m_dry)

    def create_initial_state(self, **kw):
        return create_initial_state(self.params, **kw)


def create_szmuk_rocket() -> Rocket6DoF:
    """Factory mirroring ``rocket_6dof.py`` ``create_szmuk_rocket``."""
    return Rocket6DoF(Rocket6DoFParams.szmuk_defaults())


Rocket6DoFDynamics = Rocket6DoF
