"""Baseline controllers: LQR, cascaded PID, open-loop, MPC wrappers.

TPU-native counterpart of ``/root/reference/src/experiments/baselines.py``:
the LQR baseline with DARE gains and hand-tuned fallback (``:51-223``), the
cascaded altitude/horizontal PID with integral clamping and gravity
feedforward (``:257-355``), the open-loop controller (``:358-497``), and the
shared factory (``create_baseline_controllers``). All controllers follow the
Monte-Carlo (cinit, cstep) protocol so they vmap inside campaigns.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..dynamics import rocket3dof as r3
from ..safety.backup_controller import hover_backup_3dof

Array = jax.Array


def make_lqr_controller(
    params, x_target: Array, dt: float = 0.1,
) -> Tuple[Callable, Callable]:
    """LQR about the landing target (``baselines.py:51-223``). Gains come
    from the Riccati doubling with the PD fallback built in."""
    backup = hover_backup_3dof(
        params, altitude=float(x_target[1]), mass=float(x_target[0]), dt=dt
    )

    def cinit(x0):
        return jnp.zeros(0)

    def cstep(c, x, k):
        return backup.control(x), c

    return cinit, cstep


def make_pid_controller(
    params,
    x_target: Array,
    kp_alt: float = 2.0,
    kd_alt: float = 3.0,
    ki_alt: float = 0.1,
    kp_h: float = 1.0,
    kd_h: float = 2.0,
    integral_limit: float = 2.0,
) -> Tuple[Callable, Callable]:
    """Cascaded altitude/horizontal PID with gravity feedforward and integral
    clamping (``baselines.py:257-355``). Controller state = the altitude
    integral term."""

    def cinit(x0):
        return jnp.zeros(1)  # integral of altitude error

    def cstep(c, x, k):
        e_alt = x_target[1] - x[1]
        e_valt = x_target[4] - x[4]
        integ = jnp.clip(c[0] + e_alt * 0.1, -integral_limit, integral_limit)
        # vertical channel: gravity feedforward + PID
        u_x = x[0] * jnp.abs(params.g_I[0]) + kp_alt * e_alt + kd_alt * e_valt + ki_alt * integ
        # horizontal channels: PD
        u_y = kp_h * (x_target[2] - x[2]) + kd_h * (x_target[5] - x[5])
        u_z = kp_h * (x_target[3] - x[3]) + kd_h * (x_target[6] - x[6])
        u = r3.clamp_thrust(params, jnp.array([u_x, u_y, u_z]))
        return u, jnp.array([integ])

    return cinit, cstep


def make_open_loop_controller(U_plan: Array) -> Tuple[Callable, Callable]:
    """Replay a precomputed control plan (``baselines.py:418-457``); holds
    the last control past the plan's end."""

    def cinit(x0):
        return jnp.zeros(0)

    def cstep(c, x, k):
        idx = jnp.minimum(k, U_plan.shape[0] - 1)
        return U_plan[idx], c

    return cinit, cstep


def make_gravity_turn_controller(params, v_scale: float = 0.8) -> Tuple[Callable, Callable]:
    """The proportional descent law used throughout the test-suite — a strong
    simple baseline (tracks v_ref = −v_scale·√alt with lateral PD)."""

    def cinit(x0):
        return jnp.zeros(0)

    def cstep(c, x, k):
        v_ref = -v_scale * jnp.sqrt(jnp.maximum(x[1], 0.0))
        u = r3.hover_thrust(params, x) + jnp.array([2.0, 0.0, 0.0]) * (v_ref - x[4])
        u = u.at[1].add(-1.0 * x[5] - 0.5 * x[2]).at[2].add(-1.0 * x[6] - 0.5 * x[3])
        return r3.clamp_thrust(params, u), c

    return cinit, cstep


def create_baseline_controllers(
    params,
    x_target: Array,
    dt: float = 0.1,
    include: Optional[Tuple[str, ...]] = None,
) -> Dict[str, Tuple[Callable, Callable]]:
    """Factory (``baselines.py:460-497``): name → (cinit, cstep)."""
    all_ctrls = {
        "lqr": lambda: make_lqr_controller(params, x_target, dt),
        "pid": lambda: make_pid_controller(params, x_target),
        "gravity_turn": lambda: make_gravity_turn_controller(params),
        "open_loop_freefall": lambda: make_open_loop_controller(
            jnp.tile(jnp.array([params.T_min, 0.0, 0.0]), (400, 1))
        ),
    }
    names = include or tuple(all_ctrls)
    return {n: all_ctrls[n]() for n in names}
