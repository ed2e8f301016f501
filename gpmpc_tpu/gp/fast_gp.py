"""Real-time GP predictors with precomputed factors.

TPU-native counterpart of ``/root/reference/src/gp/fast_gp.py``: the
precomputed Cholesky+α predictor (``:113-228``), the ε-ball query cache with
hit statistics (``:273-335``), and the FITC/Woodbury sparse predictor
(``:338-462``). The reference's optional Numba-JIT kernel (``:466-509``) is
unnecessary — every path here is already one jitted XLA program.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from ..ops.linalg import robust_cholesky

Array = jax.Array


@struct.dataclass
class FastGPPredictor:
    """Minimal predict-only state: training inputs + α + Cholesky factor.
    ``predict`` is a kernel-row matvec (+ two triangular solves when variance
    is requested) — the <1 ms single-point target of ``fast_gp.py:80-82``
    is wall-clock-free on TPU since it fuses into the surrounding program."""

    kernel: object
    X: Array  # (n, d)
    alpha: Array  # (n,)
    L: Array  # (n, n)
    mask: Array  # (n,)

    @classmethod
    def from_data(cls, kernel, X: Array, y: Array, noise: float = 1e-2,
                  mask: Optional[Array] = None) -> "FastGPPredictor":
        m = jnp.ones(X.shape[0], bool) if mask is None else mask
        mf = m.astype(X.dtype)
        K = kernel(X, X) * (mf[:, None] * mf[None, :]) + jnp.diag(
            jnp.where(m, noise, 1.0)
        )
        L, _ = robust_cholesky(K)
        z = jax.scipy.linalg.solve_triangular(L, y * mf, lower=True)
        alpha = jax.scipy.linalg.solve_triangular(L.T, z, lower=False)
        return cls(kernel=kernel, X=X, alpha=alpha, L=L, mask=m)

    def predict_mean(self, x: Array) -> Array:
        ks = self.kernel(x[None], self.X)[0] * self.mask.astype(x.dtype)
        return ks @ self.alpha

    def predict(self, x: Array) -> Tuple[Array, Array]:
        ks = self.kernel(x[None], self.X)[0] * self.mask.astype(x.dtype)
        mean = ks @ self.alpha
        v = jax.scipy.linalg.solve_triangular(self.L, ks, lower=True)
        var = self.kernel.diagonal(x[None])[0] - v @ v
        return mean, jnp.maximum(var, 0.0)

    def predict_batch(self, X: Array) -> Tuple[Array, Array]:
        Ks = self.kernel(X, self.X) * self.mask.astype(X.dtype)[None, :]
        mean = Ks @ self.alpha
        V = jax.scipy.linalg.solve_triangular(self.L, Ks.T, lower=True)
        var = self.kernel.diagonal(X) - jnp.sum(V * V, axis=0)
        return mean, jnp.maximum(var, 0.0)


@struct.dataclass
class CachedGPPredictor:
    """ε-ball query cache: if the query is within ``cache_radius`` of the last
    cached query, return the cached value (``fast_gp.py:273-335``). Pure
    state-passing style so it lives inside scans; hit statistics ride along."""

    predictor: FastGPPredictor
    cache_radius: float = 1e-3
    cached_x: Array = None
    cached_mean: Array = None
    cached_var: Array = None
    hits: Array = None
    misses: Array = None

    @classmethod
    def create(cls, predictor: FastGPPredictor, cache_radius: float = 1e-3):
        d = predictor.X.shape[1]
        return cls(
            predictor=predictor,
            cache_radius=cache_radius,
            cached_x=jnp.full((d,), jnp.inf),
            cached_mean=jnp.zeros(()),
            cached_var=jnp.zeros(()),
            hits=jnp.zeros((), jnp.int32),
            misses=jnp.zeros((), jnp.int32),
        )

    def predict(self, x: Array) -> Tuple[Array, Array, "CachedGPPredictor"]:
        hit = jnp.linalg.norm(x - self.cached_x) < self.cache_radius
        mean_new, var_new = self.predictor.predict(x)
        mean = jnp.where(hit, self.cached_mean, mean_new)
        var = jnp.where(hit, self.cached_var, var_new)
        new = self.replace(
            cached_x=jnp.where(hit, self.cached_x, x),
            cached_mean=mean,
            cached_var=var,
            hits=self.hits + hit.astype(jnp.int32),
            misses=self.misses + (~hit).astype(jnp.int32),
        )
        return mean, var, new

    def hit_rate(self) -> Array:
        total = self.hits + self.misses
        return self.hits / jnp.maximum(total, 1)


@struct.dataclass
class SparseGPPredictor:
    """FITC/Woodbury predict-only state (``fast_gp.py:338-462``): caches
    the triangular-inverse factors and the projected weights so prediction
    is two M-dim MATMULS per query batch (TPU triangular solves serialize
    over rows — see ops/gp sparse state notes)."""

    kernel: object
    Z: Array  # (M, d)
    Luu_inv: Array
    LB_inv: Array
    c: Array

    @classmethod
    def from_sparse_state(cls, state) -> "SparseGPPredictor":
        return cls(kernel=state.kernel, Z=state.Z, Luu_inv=state.Luu_inv,
                   LB_inv=state.LB_inv, c=state.c)

    def predict_batch(self, X: Array) -> Tuple[Array, Array]:
        Ksu = self.kernel(X, self.Z)
        v = self.Luu_inv @ Ksu.T
        w = self.LB_inv @ v
        mean = w.T @ self.c
        var = self.kernel.diagonal(X) - jnp.sum(v * v, axis=0) + jnp.sum(w * w, axis=0)
        return mean, jnp.maximum(var, 0.0)

    def predict(self, x: Array) -> Tuple[Array, Array]:
        mean, var = self.predict_batch(x[None])
        return mean[0], var[0]


def create_fast_gp(kernel, X, y, noise: float = 1e-2, sparse_state=None):
    """Factory (``fast_gp.py:512-539``): sparse predictor when a fitted
    sparse state is supplied, dense otherwise."""
    if sparse_state is not None:
        return SparseGPPredictor.from_sparse_state(sparse_state)
    return FastGPPredictor.from_data(kernel, X, y, noise)
