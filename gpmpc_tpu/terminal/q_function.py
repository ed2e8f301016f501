"""Terminal Q-function approximators over the safe set.

TPU-native counterpart of ``/root/reference/src/terminal/q_function.py``:
inverse-distance-weighted KNN Q (``:76-126``), local weighted linear
regression with regularized WLS (``:129-194``), a GP-based Q on the sparse GP
(``:210-237`` — the reference's version always falls back because of a broken
import; here it actually works), the auto-refit manager (``:268-363``), and
per-iteration Q^j tracking for monotonicity analysis (``:366-443``).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

from ..gp.kernels import create_kernel
from ..gp.sparse_gp import fit_sparse, init_inducing_points, predict_sparse
from .local_safe_set import knn_query
from .safe_set import SafeSet

Array = jax.Array


def idw_q(ss: SafeSet, x: Array, K: int = 10, power: float = 2.0,
          fuel_available=None) -> Array:
    """Inverse-distance-weighted KNN Q (``q_function.py:76-126``)."""
    res = knn_query(ss, x, K, None, fuel_available)
    vf = res.valid.astype(x.dtype)
    w = vf / jnp.maximum(res.distances, 1e-6) ** power
    return jnp.sum(w * res.q_values) / jnp.maximum(jnp.sum(w), 1e-12)


def local_linear_q(ss: SafeSet, x: Array, K: int = 20, reg: float = 1e-4,
                   fuel_available=None) -> Array:
    """Locally weighted linear regression Q(x) ≈ [1, x]ᵀβ with Gaussian
    distance weights and ridge regularization (``q_function.py:129-194``)."""
    res = knn_query(ss, x, K, None, fuel_available)
    n_x = x.shape[0]
    vf = res.valid.astype(x.dtype)
    bw = jnp.maximum(jnp.mean(jnp.where(res.valid, res.distances, 0.0)), 1e-3)
    w = vf * jnp.exp(-0.5 * (res.distances / bw) ** 2)
    Phi = jnp.concatenate([jnp.ones((K, 1)), res.states - x[None, :]], axis=1)
    W = w[:, None]
    G = Phi.T @ (W * Phi) + reg * jnp.eye(n_x + 1)
    b = Phi.T @ (w * res.q_values)
    beta = jnp.linalg.solve(G, b)
    return beta[0]  # value at the query point (centered features)


@struct.dataclass
class GPQFunction:
    """Sparse-GP Q-function over safe-set states (``q_function.py:210-237``)."""

    gp_state: object = None
    fitted: bool = struct.field(pytree_node=False, default=False)

    @classmethod
    def fit(cls, key: Array, ss: SafeSet, n_inducing: int = 50,
            kernel: str = "se_ard") -> "GPQFunction":
        k = create_kernel(kernel, ss.states.shape[1])
        Z = init_inducing_points(key, ss.states, n_inducing, mask=ss.mask)
        y = jnp.where(ss.mask, ss.q_values, 0.0)
        state = fit_sparse(k, ss.states, y, Z, noise=1e-2, mask=ss.mask)
        return cls(gp_state=state, fitted=True)

    def value(self, x: Array) -> Array:
        pr = predict_sparse(self.gp_state, x[None])
        return pr.mean[0]

    def value_and_std(self, x: Array):
        pr = predict_sparse(self.gp_state, x[None])
        return pr.mean[0], jnp.sqrt(jnp.maximum(pr.variance[0], 0.0))


# name-parity aliases
InverseDistanceQFunction = idw_q
LocalLinearQFunction = local_linear_q


@struct.dataclass
class QFunctionManager:
    """Orchestrates Q evaluation + periodic refit of the GP approximator
    (``q_function.py:268-363``). Pure state-passing: ``maybe_refit`` returns
    an updated manager."""

    method: str = struct.field(pytree_node=False, default="idw")
    K: int = struct.field(pytree_node=False, default=10)
    refit_every: int = struct.field(pytree_node=False, default=5)
    updates_seen: Array = struct.field(default_factory=lambda: jnp.asarray(0, jnp.int32))
    gp_q: Optional[GPQFunction] = None

    def value(self, ss: SafeSet, x: Array, fuel_available=None) -> Array:
        if self.method == "idw":
            return idw_q(ss, x, self.K, fuel_available=fuel_available)
        if self.method == "linear":
            return local_linear_q(ss, x, self.K, fuel_available=fuel_available)
        if self.method == "gp":
            if self.gp_q is None or not self.gp_q.fitted:
                return idw_q(ss, x, self.K, fuel_available=fuel_available)
            return self.gp_q.value(x)
        raise ValueError(f"unknown Q method {self.method!r}")

    def update(self, key: Array, ss: SafeSet) -> "QFunctionManager":
        n = self.updates_seen + 1
        mgr = self.replace(updates_seen=n)
        if self.method == "gp" and int(n) % self.refit_every == 0:
            mgr = mgr.replace(gp_q=GPQFunction.fit(key, ss))
        return mgr


def iteration_q_values(ss: SafeSet, x: Array, n_iterations: int, K: int = 10) -> Array:
    """Q^j(x) per LMPC iteration j for monotonicity analysis
    (``q_function.py:366-443``): each iteration's estimate uses only states
    from iterations ≤ j."""

    def q_at(j):
        allowed = ss.mask & (ss.iterations <= j)
        ss_j = ss.replace(traj_ids=jnp.where(allowed, ss.traj_ids, -1))
        return idw_q(ss_j, x, K)

    return jnp.stack([q_at(j) for j in range(n_iterations)])


IterativeQFunction = iteration_q_values
