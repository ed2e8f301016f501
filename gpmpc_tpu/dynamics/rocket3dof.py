"""3-DoF point-mass powered-descent dynamics as pure JAX functions.

TPU-native replacement for the reference wrapper + missing ``simdyn`` backend
(``/root/reference/src/dynamics/rocket_3dof.py``; equations as written
symbolically in ``/root/reference/src/mpc/nominal_mpc.py:585-605``):

State  x = [m, r_x, r_y, r_z, v_x, v_y, v_z]   (n_x = 7)
Control u = [T_x, T_y, T_z]  thrust in the inertial frame (n_u = 3)

    ṁ = −α ‖T‖,  α = 1/(I_sp g₀)
    ṙ = v
    v̇ = T/m + g_I  (− ½ρ C_D A_ref ‖v‖ v / m when drag is enabled)

Convention: gravity along −x, so x[1] is altitude and x[4] vertical velocity.
Everything is a pure function of ``(params, x, u)`` so the whole model vmaps
over scenario batches and scans over time; Jacobians are closed-form with AD
fallbacks for exact discrete-time linearization.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from .integrators import get_step_fn, integrate_trajectory

Array = jax.Array

N_STATE = 7
N_CONTROL = 3

IDX_MASS = 0
IDX_POS = slice(1, 4)
IDX_VEL = slice(4, 7)

_EPS_THRUST = 1e-10  # guards ‖T‖ = 0 in α‖T‖ gradients


@struct.dataclass
class Rocket3DoFParams:
    """Physical parameters (a pytree — safe to pass through jit/vmap/scan).

    Defaults mirror the reference's normalized (Szmuk-like) units
    (``rocket_3dof.py:33-70``).
    """

    m_dry: float = 1.0
    m_wet: float = 2.0
    I_sp: float = 30.0
    g0: float = 1.0
    T_min: float = 0.0
    T_max: float = 6.5
    g_I: Array = struct.field(default_factory=lambda: jnp.array([-1.0, 0.0, 0.0]))
    # drag (zero coefficients disable it without control flow)
    rho: float = 0.0
    C_D: float = 0.0
    A_ref: float = 0.0
    # constraints
    gamma_gs: float = math.radians(30.0)
    v_max: float = 1e9
    # integration
    default_dt: float = 0.1
    integrator: str = struct.field(pytree_node=False, default="rk4")

    @property
    def alpha(self):
        """Mass-flow coefficient α = 1/(I_sp g₀)."""
        return 1.0 / (self.I_sp * self.g0)

    @property
    def g(self):
        """Gravity magnitude."""
        return jnp.linalg.norm(self.g_I)

    @classmethod
    def normalized_defaults(cls) -> "Rocket3DoFParams":
        return cls()

    @classmethod
    def fuel_optimal_defaults(cls) -> "Rocket3DoFParams":
        """Parameters for fuel-optimal optimization (``rocket_3dof.py:73-82``)."""
        return cls(
            m_wet=2.0,
            m_dry=1.0,
            T_min=0.3,
            T_max=5.0,
            I_sp=300.0,
            g_I=jnp.array([-9.81, 0.0, 0.0]),
        )


# Back-compat alias matching the reference config name.
Rocket3DoFConfig = Rocket3DoFParams


# =============================================================================
# Continuous / discrete dynamics
# =============================================================================


def f(params: Rocket3DoFParams, x: Array, u: Array) -> Array:
    """Continuous dynamics ẋ = f(x, u)."""
    m = x[0]
    v = x[4:7]
    T_mag = jnp.sqrt(jnp.sum(u * u) + _EPS_THRUST**2)
    m_dot = -params.alpha * T_mag
    r_dot = v
    # smooth ‖v‖ so the AD Jacobian is finite at v = 0 (plain norm has a NaN
    # gradient there, which poisons hover-point linearizations even when the
    # drag coefficients are zero)
    v_mag = jnp.sqrt(jnp.sum(v * v) + _EPS_THRUST**2)
    a_drag = -(0.5 * params.rho * params.C_D * params.A_ref) * v_mag * v / m
    v_dot = u / m + params.g_I + a_drag
    return jnp.concatenate([m_dot[None], r_dot, v_dot])


def step(params: Rocket3DoFParams, x: Array, u: Array, dt=None) -> Array:
    """Discrete step x⁺ = F(x, u) using the configured integrator."""
    dt = params.default_dt if dt is None else dt
    return get_step_fn(params.integrator)(partial(f, params), x, u, dt)


def simulate(params: Rocket3DoFParams, x0: Array, U: Array, dt=None) -> Array:
    """Open-loop rollout under a control sequence (N, 3) → states (N+1, 7)."""
    dt = params.default_dt if dt is None else dt
    return integrate_trajectory(partial(f, params), x0, U, dt, params.integrator)


# =============================================================================
# Jacobians (closed-form continuous; AD-exact discrete)
# =============================================================================


def A_continuous(params: Rocket3DoFParams, x: Array, u: Array) -> Array:
    """Closed-form ∂f/∂x (drag-free rows are exact; drag handled via AD path)."""
    m = x[0]
    A = jnp.zeros((N_STATE, N_STATE))
    A = A.at[1:4, 4:7].set(jnp.eye(3))  # ṙ = v
    A = A.at[4:7, 0].set(-u / m**2)  # ∂(T/m)/∂m
    return A


def B_continuous(params: Rocket3DoFParams, x: Array, u: Array) -> Array:
    """Closed-form ∂f/∂u."""
    m = x[0]
    T_mag = jnp.sqrt(jnp.sum(u * u) + _EPS_THRUST**2)
    B = jnp.zeros((N_STATE, N_CONTROL))
    B = B.at[0, :].set(-params.alpha * u / T_mag)
    B = B.at[4:7, :].set(jnp.eye(3) / m)
    return B


def linearize_continuous(params, x, u) -> Tuple[Array, Array]:
    """(A_c, B_c) at (x, u); uses AD when drag is active for exactness."""
    return (
        jax.jacfwd(lambda xx: f(params, xx, u))(x),
        jax.jacfwd(lambda uu: f(params, x, uu))(u),
    )


def linearize_discrete(params, x, u, dt=None) -> Tuple[Array, Array, Array]:
    """Exact discrete linearization x⁺ ≈ A_d x + B_d u + c.

    Unlike the reference's Euler-of-Jacobians approximation
    (``rocket_3dof.py:341-391``), the Jacobians here are exact AD derivatives
    of the discrete step, so c captures the full integrator.
    """
    dt = params.default_dt if dt is None else dt
    F = lambda xx, uu: step(params, xx, uu, dt)
    A_d = jax.jacfwd(F, argnums=0)(x, u)
    B_d = jax.jacfwd(F, argnums=1)(x, u)
    c = F(x, u) - A_d @ x - B_d @ u
    return A_d, B_d, c


def linearize_discrete_euler(params, x, u, dt=None) -> Tuple[Array, Array, Array]:
    """Reference-style Euler discretization of the continuous Jacobians.

    A_d = I + A_c dt, B_d = B_c dt, c = F(x,u) − A_d x − B_d u
    (``rocket_3dof.py:341-391``, ``osqp_rti.py:374-401``). Kept for parity
    testing against the oracle.
    """
    dt = params.default_dt if dt is None else dt
    A_c, B_c = linearize_continuous(params, x, u)
    A_d = jnp.eye(N_STATE) + A_c * dt
    B_d = B_c * dt
    c = step(params, x, u, dt) - A_d @ x - B_d @ u
    return A_d, B_d, c


# =============================================================================
# Constraints & control utilities
# =============================================================================


def thrust_constraint(params, u) -> Tuple[Array, Array]:
    """(T_min − ‖T‖, ‖T‖ − T_max); negative = satisfied (``rocket_3dof.py:397``)."""
    T_mag = jnp.linalg.norm(u)
    return params.T_min - T_mag, T_mag - params.T_max


def glide_slope_constraint(params, x) -> Array:
    """‖r_horiz‖ − h·tan(γ); negative = satisfied (altitude is x[1])."""
    h = x[1]
    horiz = jnp.sqrt(x[2] ** 2 + x[3] ** 2)
    return horiz - h * jnp.tan(params.gamma_gs)


def evaluate_constraints(params, x, u) -> dict:
    lo, hi = thrust_constraint(params, u)
    return {
        "thrust_lower": lo,
        "thrust_upper": hi,
        "glide_slope": glide_slope_constraint(params, x),
    }


def hover_thrust(params, x) -> Array:
    """Thrust that exactly cancels gravity at the current mass."""
    return -x[0] * params.g_I


def clamp_thrust(params, u) -> Array:
    """Clamp ‖T‖ into [T_min, T_max] preserving direction (``rocket_3dof.py:468``)."""
    T_mag = jnp.linalg.norm(u)
    safe_dir = jnp.where(T_mag > 1e-10, u / jnp.maximum(T_mag, 1e-10), jnp.array([1.0, 0.0, 0.0]))
    return safe_dir * jnp.clip(T_mag, params.T_min, params.T_max)


def fuel_remaining(params, x) -> Array:
    return x[0] - params.m_dry


def fuel_fraction(params, x) -> Array:
    return (x[0] - params.m_dry) / (params.m_wet - params.m_dry)


def create_initial_state(
    params: Optional[Rocket3DoFParams] = None,
    altitude: float = 10.0,
    mass: Optional[float] = None,
    horizontal: Tuple[float, float] = (0.0, 0.0),
    velocity: Tuple[float, float, float] = (0.0, 0.0, 0.0),
) -> Array:
    """Build x0 = [m, alt, y, z, vx, vy, vz]."""
    params = params or Rocket3DoFParams()
    m = params.m_wet if mass is None else mass
    return jnp.array([m, altitude, horizontal[0], horizontal[1], *velocity])


class Rocket3DoF:
    """Thin OO facade over the pure functions (API parity with the reference
    ``Rocket3DoFDynamics``; everything delegates so ``.params`` can still be
    donated into jitted code)."""

    N_STATE = N_STATE
    N_CONTROL = N_CONTROL
    IDX_MASS = IDX_MASS
    IDX_POS = IDX_POS
    IDX_VEL = IDX_VEL

    def __init__(self, params: Optional[Rocket3DoFParams] = None):
        self.params = params or Rocket3DoFParams()

    # reference-compatible properties
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

    def thrust_constraint(self, u):
        return thrust_constraint(self.params, u)

    def glide_slope_constraint(self, x):
        return glide_slope_constraint(self.params, x)

    def evaluate_constraints(self, x, u):
        return evaluate_constraints(self.params, x, u)

    def hover_thrust(self, x):
        return hover_thrust(self.params, x)

    def clamp_thrust(self, u):
        return clamp_thrust(self.params, u)

    def fuel_remaining(self, x):
        return fuel_remaining(self.params, x)

    def fuel_fraction(self, x):
        return fuel_fraction(self.params, x)

    def create_initial_state(self, **kw):
        return create_initial_state(self.params, **kw)

    def get_control_bounds(self):
        b = self.params.T_max
        return jnp.array([-b, -b, -b]), jnp.array([b, b, b])

    def get_state_bounds(self):
        inf = jnp.inf
        lo = jnp.array([self.params.m_dry, 0.0, -inf, -inf, -inf, -inf, -inf])
        hi = jnp.array([self.params.m_wet, inf, inf, inf, inf, inf, inf])
        return lo, hi


def create_rocket_3dof(preset: str = "normalized") -> Rocket3DoF:
    """Factory mirroring ``rocket_3dof.py:567-607``."""
    if preset == "normalized":
        return Rocket3DoF(Rocket3DoFParams.normalized_defaults())
    if preset == "fuel_optimal":
        return Rocket3DoF(Rocket3DoFParams.fuel_optimal_defaults())
    raise ValueError(f"unknown preset {preset!r}")


# Alias for reference-name parity.
Rocket3DoFDynamics = Rocket3DoF
