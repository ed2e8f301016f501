"""Generic linearization utilities: AD & finite-difference Jacobians, verification,
affine models, discretization, and batched per-trajectory Jacobians.

TPU-native counterpart of ``/root/reference/src/dynamics/linearization.py``.
The reference's central tool is finite differences (``:42-168``); here AD is
the primary path and finite differences are kept only as a *verification*
oracle for tests (``verify_jacobians``, ``:171-240``).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def ad_jacobians(f: Callable, x: Array, u: Array) -> Tuple[Array, Array]:
    """Exact Jacobians (∂f/∂x, ∂f/∂u) via forward-mode AD."""
    return jax.jacfwd(f, argnums=0)(x, u), jax.jacfwd(f, argnums=1)(x, u)


def numerical_jacobians(
    f: Callable, x: Array, u: Array, eps: float = 1e-3, method: str = "central"
) -> Tuple[Array, Array]:
    """Finite-difference Jacobians (forward/central), vectorized via vmap.

    Mirrors ``linearization.py:42-168`` but evaluates all perturbations as one
    batched call instead of a Python loop.
    """
    n_x, n_u = x.shape[0], u.shape[0]
    Ex = jnp.eye(n_x) * eps
    Eu = jnp.eye(n_u) * eps

    if method == "forward":
        f0 = f(x, u)
        A = (jax.vmap(lambda e: f(x + e, u))(Ex) - f0).T / eps
        B = (jax.vmap(lambda e: f(x, u + e))(Eu) - f0).T / eps
    elif method == "central":
        A = (
            jax.vmap(lambda e: f(x + e, u))(Ex) - jax.vmap(lambda e: f(x - e, u))(Ex)
        ).T / (2 * eps)
        B = (
            jax.vmap(lambda e: f(x, u + e))(Eu) - jax.vmap(lambda e: f(x, u - e))(Eu)
        ).T / (2 * eps)
    else:
        raise ValueError(f"unknown method {method!r}")
    return A, B


def verify_jacobians(
    f: Callable,
    jac_fn: Callable,
    x: Array,
    u: Array,
    rtol: float = 1e-3,
    atol: float = 1e-4,
    eps: float = 1e-3,
) -> dict:
    """Compare analytic/AD Jacobians against central differences
    (mirrors ``linearization.py:171-240``). Returns a report dict."""
    A_ana, B_ana = jac_fn(x, u)
    A_num, B_num = numerical_jacobians(f, x, u, eps=eps, method="central")
    a_err = jnp.max(jnp.abs(A_ana - A_num))
    b_err = jnp.max(jnp.abs(B_ana - B_num))
    a_ok = bool(jnp.allclose(A_ana, A_num, rtol=rtol, atol=atol))
    b_ok = bool(jnp.allclose(B_ana, B_num, rtol=rtol, atol=atol))
    return {
        "A_ok": a_ok,
        "B_ok": b_ok,
        "ok": a_ok and b_ok,
        "A_max_err": float(a_err),
        "B_max_err": float(b_err),
    }


class AffineModel(NamedTuple):
    """Discrete affine model x⁺ = A x + B u + c (``linearization.py:243-331``)."""

    A: Array
    B: Array
    c: Array

    def predict(self, x: Array, u: Array) -> Array:
        return self.A @ x + self.B @ u + self.c

    @classmethod
    def from_linearization(cls, F: Callable, x: Array, u: Array) -> "AffineModel":
        """Exact affine model of a discrete step function F at (x, u)."""
        A = jax.jacfwd(F, argnums=0)(x, u)
        B = jax.jacfwd(F, argnums=1)(x, u)
        return cls(A, B, F(x, u) - A @ x - B @ u)


def discretize_jacobians(
    A_c: Array, B_c: Array, dt: float, method: str = "euler"
) -> Tuple[Array, Array]:
    """Discretize continuous Jacobians (``linearization.py:334-385``).

    methods: 'euler' (I + A dt), 'taylor2' (I + A dt + A² dt²/2),
    'zoh' (matrix exponential via scaled Padé — jax.scipy expm).
    """
    n = A_c.shape[0]
    eye = jnp.eye(n)
    if method == "euler":
        return eye + A_c * dt, B_c * dt
    if method == "taylor2":
        A2 = A_c @ A_c
        A_d = eye + A_c * dt + 0.5 * A2 * dt * dt
        B_d = (eye * dt + 0.5 * A_c * dt * dt) @ B_c
        return A_d, B_d
    if method == "zoh":
        # exact ZOH via augmented matrix exponential exp([[A, B],[0, 0]] dt)
        n_u = B_c.shape[1]
        M = jnp.zeros((n + n_u, n + n_u))
        M = M.at[:n, :n].set(A_c).at[:n, n:].set(B_c)
        E = jax.scipy.linalg.expm(M * dt)
        return E[:n, :n], E[:n, n:]
    raise ValueError(f"unknown method {method!r}")


def trajectory_jacobians(
    F: Callable, X: Array, U: Array
) -> Tuple[Array, Array, Array]:
    """Batched affine models along a trajectory: returns stacked (A, B, c)
    with shapes (N, n_x, n_x), (N, n_x, n_u), (N, n_x).

    Replaces the reference's Python-list loop (``linearization.py:429-474``)
    with one vmapped AD call — the natural TPU layout for the RTI/SCP solvers.
    """

    def one(x, u):
        A = jax.jacfwd(F, argnums=0)(x, u)
        B = jax.jacfwd(F, argnums=1)(x, u)
        return A, B, F(x, u) - A @ x - B @ u

    return jax.vmap(one)(X[:-1] if X.shape[0] == U.shape[0] + 1 else X, U)
