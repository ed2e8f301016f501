"""Invariant sets: ellipsoids from LQR, maximal-α search, RPI tubes, polytopes.

TPU-native counterpart of ``/root/reference/src/safety/invariant_sets.py``:
ellipsoid S = {x : (x−x_eq)ᵀP(x−x_eq) ≤ α} from the LQR Riccati matrix
(``:52-110``), maximal α by boundary sampling + bisection against a
constraint function (``:112-167`` — here the bisection is a fixed-depth scan
and the boundary samples are vmapped), membership/value/projection/sampling
(``:169-217``), the RPI set via the geometric series Σ|A_cl|ᵏ w (``:220-376``),
polytopes Hx ≤ h (``:379-409``) and a Lyapunov-equation invariant set
(``:412-472``).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import struct

Array = jax.Array


@struct.dataclass
class EllipsoidalInvariantSet:
    """S = {x : (x−x_eq)ᵀ P (x−x_eq) ≤ α}."""

    P: Array
    x_eq: Array
    alpha: Array

    def value(self, x: Array) -> Array:
        e = x - self.x_eq
        return e @ self.P @ e

    def contains(self, x: Array) -> Array:
        return self.value(x) <= self.alpha

    def project(self, x: Array) -> Array:
        """Radially scale x onto the ellipsoid when outside (``:192-204``)."""
        v = self.value(x)
        scale = jnp.sqrt(self.alpha / jnp.maximum(v, 1e-12))
        return jnp.where(v <= self.alpha, x, self.x_eq + scale * (x - self.x_eq))

    def sample_boundary(self, key: Array, n: int) -> Array:
        """Uniform directions mapped to the α-level set (``:206-217``)."""
        d = self.P.shape[0]
        dirs = jax.random.normal(key, (n, d))
        dirs = dirs / jnp.linalg.norm(dirs, axis=1, keepdims=True)
        # scale each direction s.t. (s·dir)ᵀP(s·dir) = α
        quad = jnp.einsum("ni,ij,nj->n", dirs, self.P, dirs)
        s = jnp.sqrt(self.alpha / jnp.maximum(quad, 1e-12))
        return self.x_eq[None] + s[:, None] * dirs


@struct.dataclass
class DescentFunnelSet:
    """Soft-landing funnel S = {x : |v|² ≤ v_free² + slope·altitude}.

    The speed allowance shrinks to ``v_free`` at the ground — the invariant
    the touchdown-overspeed failure mode actually needs (the altitude-blind
    velocity ellipsoid admits any |v| ≤ √α at every height, so a lane that
    arrives at the pad 20% too fast never looks unsafe to it; measured: zero
    rescues at gust −2.0 where 21/32 unfiltered lanes crash). Invariance
    under the emergency-braking backup holds for
    slope ≤ 2·a_net·(|v|/|v_vert|) with a_net = T_max/m − g: descending
    inside the funnel, max braking sheds |v|² at ≥ 2·a_net·|v| per unit
    time while the allowance shrinks at slope·|v_vert|.

    Duck-typed for the safety filter: exposes ``value(x)`` (smooth, AD-able
    for the minimal-intervention QP linearization) and ``alpha`` = v_free².
    State layout: altitude x[1], velocity x[4:7] (3-DoF and 6-DoF alike).
    """

    slope: float = 0.6
    v_free: float = 1.5

    @property
    def alpha(self) -> Array:
        return jnp.asarray(self.v_free**2)

    def value(self, x: Array) -> Array:
        return jnp.sum(x[..., 4:7] ** 2, axis=-1) - self.slope * jnp.maximum(
            x[..., 1], 0.0
        )

    def contains(self, x: Array) -> Array:
        return self.value(x) <= self.alpha


def compute_from_lqr(P: Array, x_eq: Array, alpha: float = 1.0) -> EllipsoidalInvariantSet:
    """Ellipsoid from the LQR cost-to-go matrix (``invariant_sets.py:52-110``)."""
    return EllipsoidalInvariantSet(P=P, x_eq=x_eq, alpha=jnp.asarray(alpha, P.dtype))


def compute_maximal_alpha(
    P: Array,
    x_eq: Array,
    constraint_fn: Callable[[Array], Array],
    key: Array,
    n_samples: int = 256,
    alpha_max: float = 1e3,
    bisection_iters: int = 30,
) -> Array:
    """Largest α whose boundary samples all satisfy ``constraint_fn(x) ≤ 0``
    (``invariant_sets.py:112-167``): vmapped boundary evaluation inside a
    fixed-depth bisection scan."""
    d = P.shape[0]
    dirs = jax.random.normal(key, (n_samples, d))
    dirs = dirs / jnp.linalg.norm(dirs, axis=1, keepdims=True)
    quad = jnp.einsum("ni,ij,nj->n", dirs, P, dirs)

    def feasible(alpha):
        s = jnp.sqrt(alpha / jnp.maximum(quad, 1e-12))
        pts = x_eq[None] + s[:, None] * dirs
        return jnp.all(jax.vmap(constraint_fn)(pts) <= 0.0)

    def body(carry, _):
        lo, hi = carry
        mid = 0.5 * (lo + hi)
        ok = feasible(mid)
        return (jnp.where(ok, mid, lo), jnp.where(ok, hi, mid)), None

    (lo, _), _ = jax.lax.scan(
        body, (jnp.asarray(0.0, P.dtype), jnp.asarray(alpha_max, P.dtype)),
        None, length=bisection_iters,
    )
    return lo


@struct.dataclass
class TubeController:
    """LQR tube gain + RPI set via the geometric series Σ_k |A_cl|ᵏ w
    (``invariant_sets.py:220-376``)."""

    K: Array
    e_rpi: Array  # per-coordinate robust positive-invariant tube widths

    @classmethod
    def create(cls, A: Array, B: Array, K: Array, w: Array, terms: int = 50):
        A_cl = jnp.abs(A - B @ K)

        def body(carry, _):
            e, Ak = carry
            e_new = e + Ak @ w
            return (e_new, A_cl @ Ak), None

        n = A.shape[0]
        (e, _), _ = jax.lax.scan(
            body, (jnp.zeros(n, A.dtype), jnp.eye(n, dtype=A.dtype)), None, length=terms
        )
        return cls(K=K, e_rpi=e)

    def ancillary_control(self, x: Array, x_nom: Array, u_nom: Array) -> Array:
        return u_nom - self.K @ (x - x_nom)


@struct.dataclass
class PolytopeInvariantSet:
    """{x : H x ≤ h} (``invariant_sets.py:379-409``)."""

    H: Array
    h: Array

    def contains(self, x: Array) -> Array:
        return jnp.all(self.H @ x <= self.h)

    def margin(self, x: Array) -> Array:
        return jnp.max(self.H @ x - self.h)


def compute_lmi_invariant_set(
    A_cl: Array, Q: Optional[Array] = None, iters: int = 200
) -> Array:
    """Lyapunov-equation invariant-set matrix: solve A_clᵀ P A_cl − P = −Q by
    the fixed-point series P = Σ (A_clᵀ)ᵏ Q A_clᵏ (``invariant_sets.py:412-472``)."""
    n = A_cl.shape[0]
    Q = jnp.eye(n, dtype=A_cl.dtype) if Q is None else Q

    def body(carry, _):
        P, Ak = carry
        return (P + Ak.T @ Q @ Ak, A_cl @ Ak), None

    (P, _), _ = jax.lax.scan(
        body, (jnp.zeros((n, n), A_cl.dtype), jnp.eye(n, dtype=A_cl.dtype)),
        None, length=iters,
    )
    return P
