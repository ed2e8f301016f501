"""Fixed-step ODE integrators as pure JAX functions.

TPU-native counterpart of the reference integrator suite
(``/root/reference/src/dynamics/discretization.py:30-511``): Euler / RK4 /
midpoint / Heun steps, trajectory rollout, quaternion-exact steps,
Hermite-Simpson and trapezoidal collocation defects, and sensitivity
propagation. Everything here is a pure function of ``(f, x, u, dt)`` so it
jits, vmaps and scans cleanly; there is no integrator *object* — an
integrator is just a step function.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

Array = jax.Array
VectorField = Callable[[Array, Array], Array]  # f(x, u) -> dx/dt


def euler_step(f: VectorField, x: Array, u: Array, dt) -> Array:
    """Forward Euler: x + dt * f(x, u)."""
    return x + dt * f(x, u)


def midpoint_step(f: VectorField, x: Array, u: Array, dt) -> Array:
    """Explicit midpoint (RK2)."""
    k1 = f(x, u)
    k2 = f(x + 0.5 * dt * k1, u)
    return x + dt * k2


def heun_step(f: VectorField, x: Array, u: Array, dt) -> Array:
    """Heun's method (trapezoidal predictor-corrector)."""
    k1 = f(x, u)
    k2 = f(x + dt * k1, u)
    return x + 0.5 * dt * (k1 + k2)


def rk4_step(f: VectorField, x: Array, u: Array, dt) -> Array:
    """Classic fourth-order Runge-Kutta with zero-order-hold control."""
    k1 = f(x, u)
    k2 = f(x + 0.5 * dt * k1, u)
    k3 = f(x + 0.5 * dt * k2, u)
    k4 = f(x + dt * k3, u)
    return x + (dt / 6.0) * (k1 + 2.0 * k2 + 2.0 * k3 + k4)


STEP_FNS = {
    "euler": euler_step,
    "midpoint": midpoint_step,
    "heun": heun_step,
    "rk4": rk4_step,
}


def get_step_fn(method: str):
    """Look up a step function by name ('euler'|'midpoint'|'heun'|'rk4')."""
    try:
        return STEP_FNS[method]
    except KeyError:
        raise ValueError(f"unknown integrator {method!r}; choose from {sorted(STEP_FNS)}")


def integrate_trajectory(
    f: VectorField, x0: Array, U: Array, dt, method: str = "rk4"
) -> Array:
    """Roll out N steps under a control sequence ``U`` of shape (N, n_u).

    Returns the state trajectory of shape (N+1, n_x) (mirrors
    ``discretization.py:255-286``), built with ``lax.scan`` so the rollout is
    one fused XLA program.
    """
    step = get_step_fn(method)

    def body(x, u):
        x_next = step(f, x, u, dt)
        return x_next, x_next

    _, X = jax.lax.scan(body, x0, U)
    return jnp.concatenate([x0[None], X], axis=0)


# =============================================================================
# Quaternion steps (scalar-first convention q = [w, x, y, z])
# =============================================================================


def quaternion_multiply(q1: Array, q2: Array) -> Array:
    """Hamilton product q1 ⊗ q2, scalar-first."""
    w1, v1 = q1[0], q1[1:]
    w2, v2 = q2[0], q2[1:]
    w = w1 * w2 - jnp.dot(v1, v2)
    v = w1 * v2 + w2 * v1 + jnp.cross(v1, v2)
    return jnp.concatenate([w[None], v])


def quaternion_derivative(q: Array, omega: Array) -> Array:
    """Kinematics q̇ = ½ [−ω·q_v ; q_w ω + ω × q_v].

    Matches the reference's symbolic form (``nominal_mpc.py:193``), i.e.
    q̇ = ½ [0, ω] ⊗ q with body angular rate ω.
    """
    qw, qv = q[0], q[1:]
    dw = -0.5 * jnp.dot(omega, qv)
    dv = 0.5 * (qw * omega + jnp.cross(omega, qv))
    return jnp.concatenate([dw[None], dv])


def quaternion_euler_step(q: Array, omega: Array, dt) -> Array:
    """Euler step of quaternion kinematics followed by renormalization."""
    q_next = q + dt * quaternion_derivative(q, omega)
    return q_next / jnp.linalg.norm(q_next)


def quaternion_exponential_step(q: Array, omega: Array, dt) -> Array:
    """Exact exponential-map step: q⁺ = exp(½ dt [0,ω]) ⊗ q.

    Norm-preserving by construction (``discretization.py:330-378``). Uses a
    sinc-safe formulation so ω = 0 is exact under jit.
    """
    theta = jnp.linalg.norm(omega) * dt  # total rotation angle
    half = 0.5 * theta
    # sinc-safe: sin(half)/theta * dt·ω = ½·sinc(half/π)·dt·ω
    w = jnp.cos(half)
    v = 0.5 * dt * jnp.sinc(half / jnp.pi) * omega
    dq = jnp.concatenate([w[None], v])
    return quaternion_multiply(dq, q)


# =============================================================================
# Collocation defects (for trajectory-optimization verification)
# =============================================================================


def trapezoidal_defect(f: VectorField, x0: Array, x1: Array, u0: Array, u1: Array, dt) -> Array:
    """Trapezoidal collocation defect: x1 − x0 − dt/2 (f(x0,u0)+f(x1,u1))."""
    return x1 - x0 - 0.5 * dt * (f(x0, u0) + f(x1, u1))


def hermite_simpson_defect(
    f: VectorField, x0: Array, x1: Array, u0: Array, u1: Array, dt
) -> Array:
    """Hermite-Simpson collocation defect (``discretization.py:386-427``).

    Midpoint state from the cubic Hermite interpolant; defect is
    x1 − x0 − dt/6 (f0 + 4 f_mid + f1).
    """
    f0 = f(x0, u0)
    f1 = f(x1, u1)
    x_mid = 0.5 * (x0 + x1) + (dt / 8.0) * (f0 - f1)
    u_mid = 0.5 * (u0 + u1)
    f_mid = f(x_mid, u_mid)
    return x1 - x0 - (dt / 6.0) * (f0 + 4.0 * f_mid + f1)


# =============================================================================
# Sensitivity propagation
# =============================================================================


def integrate_sensitivity(
    f: VectorField, x0: Array, U: Array, dt, method: str = "rk4"
):
    """Propagate state-transition sensitivities along a rollout.

    Returns ``(X, Phis, Psis)`` where ``Phis[k] = ∂x_{k+1}/∂x_k`` and
    ``Psis[k] = ∂x_{k+1}/∂u_k`` of the *discrete* step (exact AD Jacobians of
    the chosen integrator — sharper than the reference's Φ/Ψ Euler recursion,
    ``discretization.py:465-511``).
    """
    step = get_step_fn(method)

    def one(x, u):
        return step(f, x, u, dt)

    jac_x = jax.jacfwd(one, argnums=0)
    jac_u = jax.jacfwd(one, argnums=1)

    def body(x, u):
        x_next = one(x, u)
        return x_next, (x_next, jac_x(x, u), jac_u(x, u))

    _, (X, Phis, Psis) = jax.lax.scan(body, x0, U)
    X = jnp.concatenate([x0[None], X], axis=0)
    return X, Phis, Psis
