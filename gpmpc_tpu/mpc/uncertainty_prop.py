"""Uncertainty propagation through linearized/sampled dynamics and
constraint tightening.

TPU-native counterpart of ``/root/reference/src/mpc/uncertainty_prop.py``:
linear covariance propagation Σ⁺ = AΣAᵀ + Q_GP with the GP variances injected
into the velocity/rate blocks scaled by dt² (``:117-177``), the unscented
transform with 2n+1 sigma points (``:179-264``), Monte-Carlo particles
(``:266-319``), linear chance tightening aᵀμ − κ√(aᵀΣa) (``:322-416``), and
the interval tube e⁺ = |A|e + w (``:419-468``). All scans/vmaps — the per-step
Python loops disappear.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from .constraints import normal_quantile

Array = jax.Array


class PropagatedUncertainty(NamedTuple):
    """(mirrors ``PropagatedUncertainty``, ``uncertainty_prop.py:34-55``)."""

    means: Array  # (N+1, n_x)
    covariances: Array  # (N+1, n_x, n_x)

    def std(self) -> Array:
        return jnp.sqrt(
            jnp.maximum(jnp.diagonal(self.covariances, axis1=-2, axis2=-1), 0.0)
        )

    def confidence_bounds(self, confidence: float = 0.95) -> Tuple[Array, Array]:
        kappa = normal_quantile(jnp.asarray(confidence))
        s = self.std()
        return self.means - kappa * s, self.means + kappa * s


def gp_process_noise(gp_var: Array, n_x: int, dt: float) -> Array:
    """Q_GP = diag with GP variances ×dt² in the velocity slice [4:7] (and
    rate slice [11:14] for 14-state) — ``uncertainty_prop.py:145-160``."""
    d = jnp.zeros(n_x, gp_var.dtype)
    d = d.at[4:7].set(gp_var[..., :3] * dt * dt)
    if n_x >= 14:
        d = d.at[11:14].set(gp_var[..., 3:6] * dt * dt)
    return jnp.diag(d)


def propagate_linear(
    Aks: Array,  # (N, n_x, n_x) discrete Jacobians along the trajectory
    means: Array,  # (N+1, n_x) nominal trajectory
    Sigma0: Array,  # (n_x, n_x)
    gp_vars: Optional[Array] = None,  # (N, n_gp) per-step GP variances
    dt: float = 0.1,
) -> PropagatedUncertainty:
    """Σ_{k+1} = A_k Σ_k A_kᵀ + Q_GP,k as a scan (``uncertainty_prop.py:117-177``)."""
    n_x = means.shape[1]
    N = Aks.shape[0]
    gv = jnp.zeros((N, 3 if n_x < 14 else 6), means.dtype) if gp_vars is None else gp_vars

    def body(Sigma, inp):
        A, v = inp
        S = A @ Sigma @ A.T + gp_process_noise(v, n_x, dt)
        return S, S

    _, Sigmas = jax.lax.scan(body, Sigma0, (Aks, gv))
    return PropagatedUncertainty(
        means=means, covariances=jnp.concatenate([Sigma0[None], Sigmas], axis=0)
    )


def propagate_unscented(
    step_fn: Callable[[Array, Array], Array],
    x0: Array,
    Sigma0: Array,
    U: Array,  # (N, n_u)
    gp_vars: Optional[Array] = None,
    dt: float = 0.1,
    alpha: float = 1e-1,
    beta: float = 2.0,
    kappa: float = 0.0,
) -> PropagatedUncertainty:
    """Unscented transform propagation (``uncertainty_prop.py:179-264``):
    2n+1 sigma points stepped through the *nonlinear* dynamics each stage."""
    n = x0.shape[0]
    lam = alpha**2 * (n + kappa) - n
    wm = jnp.concatenate(
        [jnp.array([lam / (n + lam)]), jnp.full(2 * n, 0.5 / (n + lam))]
    )
    wc = wm.at[0].add(1 - alpha**2 + beta)
    N = U.shape[0]
    gv = jnp.zeros((N, 3 if n < 14 else 6), x0.dtype) if gp_vars is None else gp_vars

    def body(carry, inp):
        mu, Sigma = carry
        u, v = inp
        S = jnp.linalg.cholesky(Sigma + 1e-9 * jnp.eye(n))
        scaled = jnp.sqrt(n + lam) * S
        pts = jnp.concatenate(
            [mu[None], mu[None] + scaled.T, mu[None] - scaled.T], axis=0
        )
        prop = jax.vmap(lambda p: step_fn(p, u))(pts)
        mu_new = wm @ prop
        diff = prop - mu_new[None]
        Sigma_new = jnp.einsum("i,ij,ik->jk", wc, diff, diff) + gp_process_noise(
            v, n, dt
        )
        return (mu_new, Sigma_new), (mu_new, Sigma_new)

    (_, _), (mus, Sigmas) = jax.lax.scan(body, (x0, Sigma0), (U, gv))
    return PropagatedUncertainty(
        means=jnp.concatenate([x0[None], mus], axis=0),
        covariances=jnp.concatenate([Sigma0[None], Sigmas], axis=0),
    )


def propagate_monte_carlo(
    key: Array,
    step_fn: Callable[[Array, Array], Array],
    x0: Array,
    Sigma0: Array,
    U: Array,
    n_particles: int = 256,
    gp_std_fn: Optional[Callable] = None,
) -> PropagatedUncertainty:
    """Particle propagation (``uncertainty_prop.py:266-319``): sample initial
    states, roll every particle through the dynamics, estimate moments."""
    n = x0.shape[0]
    k0, k1 = jax.random.split(key)
    L = jnp.linalg.cholesky(Sigma0 + 1e-9 * jnp.eye(n))
    parts = x0[None] + jax.random.normal(k0, (n_particles, n)) @ L.T

    def body(carry, u):
        parts, key = carry
        parts = jax.vmap(lambda p: step_fn(p, u))(parts)
        key, sub = jax.random.split(key)
        if gp_std_fn is not None:
            noise = gp_std_fn(parts, u) * jax.random.normal(sub, parts.shape)
            parts = parts + noise
        return (parts, key), parts

    (_, _), traj = jax.lax.scan(body, (parts, k1), U)
    traj = jnp.concatenate([parts[None], traj], axis=0)  # (N+1, P, n)
    mus = jnp.mean(traj, axis=1)
    diffs = traj - mus[:, None, :]
    Sigmas = jnp.einsum("kpi,kpj->kij", diffs, diffs) / (n_particles - 1)
    return PropagatedUncertainty(means=mus, covariances=Sigmas)


class UncertaintyPropagator:
    """OO facade selecting the method (mirrors ``UncertaintyPropagator``)."""

    def __init__(self, method: str = "linear", dt: float = 0.1):
        self.method = method
        self.dt = dt

    def propagate(self, **kw) -> PropagatedUncertainty:
        if self.method == "linear":
            return propagate_linear(dt=self.dt, **kw)
        if self.method == "unscented":
            return propagate_unscented(dt=self.dt, **kw)
        if self.method == "monte_carlo":
            return propagate_monte_carlo(**kw)
        raise ValueError(f"unknown method {self.method!r}")


# =============================================================================
# Constraint tightening (uncertainty_prop.py:322-416)
# =============================================================================


def linear_tightening(a: Array, Sigmas: Array, confidence: float = 0.95) -> Array:
    """Back-off κ·√(aᵀΣ_k a) for a linear constraint aᵀx ≤ b, per step."""
    kappa = normal_quantile(jnp.asarray(confidence, Sigmas.dtype))
    quad = jnp.einsum("i,kij,j->k", a, Sigmas, a)
    return kappa * jnp.sqrt(jnp.maximum(quad, 0.0))


def box_tightening(
    Sigmas: Array, confidence: float = 0.95, kappa: Optional[Array] = None
) -> Array:
    """Per-coordinate back-offs κ·σ_i for box bounds, shape (N+1, n_x).
    ``kappa`` overrides the Gaussian quantile (fixed/calibrated β methods,
    reference ``gp_params.yaml:84-93``)."""
    if kappa is None:
        kappa = normal_quantile(jnp.asarray(confidence, Sigmas.dtype))
    return kappa * jnp.sqrt(
        jnp.maximum(jnp.diagonal(Sigmas, axis1=-2, axis2=-1), 0.0)
    )


def sampled_tightening(
    key: Array, mean: Array, Sigma: Array, a: Array, quantile: float = 0.95,
    n_samples: int = 512,
) -> Array:
    """Empirical-quantile tightening (``uncertainty_prop.py:382-416``)."""
    n = mean.shape[0]
    L = jnp.linalg.cholesky(Sigma + 1e-9 * jnp.eye(n))
    xs = mean[None] + jax.random.normal(key, (n_samples, n)) @ L.T
    vals = xs @ a
    return jnp.quantile(vals, quantile) - mean @ a


# =============================================================================
# Interval tube (uncertainty_prop.py:419-468)
# =============================================================================


def propagate_tube(Aks: Array, w: Array, e0: Optional[Array] = None) -> Array:
    """e_{k+1} = |A_k| e_k + w — elementwise interval tube, shape (N+1, n_x)."""
    n_x = Aks.shape[-1]
    e0 = jnp.zeros(n_x, Aks.dtype) if e0 is None else e0

    def body(e, A):
        e_new = jnp.abs(A) @ e + w
        return e_new, e_new

    _, es = jax.lax.scan(body, e0, Aks)
    return jnp.concatenate([e0[None], es], axis=0)


class TubeBasedRobustness:
    """Facade mirroring ``TubeBasedRobustness`` (``uncertainty_prop.py:419-468``)."""

    def __init__(self, w: Array):
        self.w = w

    def propagate(self, Aks: Array, e0: Optional[Array] = None) -> Array:
        return propagate_tube(Aks, self.w, e0)
