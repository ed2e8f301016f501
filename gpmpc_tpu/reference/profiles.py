"""Analytic descent reference profiles (SCVX-free reference generation).

Mirrors the reference's demo reference generator
(``/root/reference/scripts/demo_mpc_tracking.py:25-77``): a cubic polynomial
in time from the initial state to the landing target with zero terminal
velocity, plus the PD-rollout fallback style of ``SimpleSCVX``
(``scvx_interface.py:409-481``). Real optimized references come from
``gpmpc_tpu.reference.scvx``.
"""

from __future__ import annotations

import jax.numpy as jnp

Array = jnp.ndarray


def cubic_descent_reference(
    x0: Array, x_target: Array, n_steps: int, dt: float
) -> Array:
    """Cubic position profile r(τ) with ṙ(0)=v₀, ṙ(T)=v_target and matched
    endpoints; mass interpolated linearly. Works for both 7- and 14-state
    vectors (attitude/rate columns are interpolated linearly too, which for
    identity-to-identity quaternions is exact).

    Returns an (n_steps+1, n_x) array.
    """
    T = n_steps * dt
    tau = jnp.linspace(0.0, 1.0, n_steps + 1)[:, None]  # normalized time

    r0, rT = x0[1:4], x_target[1:4]
    v0, vT = x0[4:7], x_target[4:7]

    # Hermite cubic in normalized time with velocity scaling by T
    h00 = 2 * tau**3 - 3 * tau**2 + 1
    h10 = tau**3 - 2 * tau**2 + tau
    h01 = -2 * tau**3 + 3 * tau**2
    h11 = tau**3 - tau**2
    r = h00 * r0[None] + h10 * T * v0[None] + h01 * rT[None] + h11 * T * vT[None]
    # analytic derivative
    d00 = (6 * tau**2 - 6 * tau) / T
    d10 = 3 * tau**2 - 4 * tau + 1
    d01 = (-6 * tau**2 + 6 * tau) / T
    d11 = 3 * tau**2 - 2 * tau
    v = d00 * r0[None] + d10 * v0[None] + d01 * rT[None] + d11 * vT[None]

    m = (1 - tau) * x0[0] + tau * x_target[0]
    X = jnp.concatenate([m, r, v], axis=1)
    if x0.shape[0] > 7:
        rest = (1 - tau) * x0[7:][None] + tau * x_target[7:][None]
        X = jnp.concatenate([X, rest], axis=1)
    return X


def pad_reference(X_ref: Array, horizon: int) -> Array:
    """Extend a reference past its end by holding the final state — the
    receding-horizon window padding of ``nominal_mpc.py:481-500``."""
    tail = jnp.tile(X_ref[-1:], (horizon, 1))
    return jnp.concatenate([X_ref, tail], axis=0)
