"""Novelty scoring and diverse data selection for GP training.

TPU-native counterpart of ``/root/reference/src/learning/novelty_selector.py``:
distance novelty 1 − e^(−d/τ) (KDTree → batched min-distance matmul,
``:154-170``), GP-variance novelty (``:172-191``), residual-magnitude novelty
(``:193-202``), top-k / threshold selection (``:204-235``), greedy
farthest-point diverse selection (``:237-296``), and an active-selection
acquisition (uncertainty / expected-improvement style, ``:299-372``).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

from ..ops.kmeans import farthest_point_sampling

Array = jax.Array


@struct.dataclass
class NoveltyConfig:
    """(mirrors ``NoveltyConfig``)."""

    distance_scale: float = 1.0  # τ in 1 − exp(−d/τ)
    w_distance: float = 0.5
    w_variance: float = 0.3
    w_residual: float = 0.2
    threshold: float = 0.3


def distance_novelty(X_new: Array, X_ref: Array, ref_mask: Array, tau: Array) -> Array:
    """1 − e^(−d_min/τ) with d_min from a batched distance matmul
    (``novelty_selector.py:154-170``)."""
    d2 = (
        jnp.sum(X_new**2, axis=1)[:, None]
        + jnp.sum(X_ref**2, axis=1)[None, :]
        - 2.0 * X_new @ X_ref.T
    )
    d2 = jnp.where(ref_mask[None, :], d2, jnp.inf)
    d = jnp.sqrt(jnp.maximum(jnp.min(d2, axis=1), 0.0))
    d = jnp.where(jnp.isfinite(d), d, 1e3)  # empty reference ⇒ everything novel
    return 1.0 - jnp.exp(-d / tau)


def variance_novelty(variances: Array, prior_variance: Array) -> Array:
    """σ²/σ²_prior clipped to [0,1] (``novelty_selector.py:172-191``)."""
    return jnp.clip(variances / jnp.maximum(prior_variance, 1e-12), 0.0, 1.0)


def residual_novelty(residuals: Array, scale: Array) -> Array:
    """‖r‖/scale clipped to [0,1] (``novelty_selector.py:193-202``)."""
    return jnp.clip(
        jnp.linalg.norm(residuals, axis=-1) / jnp.maximum(scale, 1e-12), 0.0, 1.0
    )


def novelty_scores(
    config: NoveltyConfig,
    X_new: Array,
    X_ref: Array,
    ref_mask: Array,
    variances: Optional[Array] = None,
    residuals: Optional[Array] = None,
    prior_variance: float = 1.0,
    residual_scale: float = 1.0,
) -> Array:
    """Weighted blend of the three novelty signals (``novelty_selector.py:96-152``)."""
    s = config.w_distance * distance_novelty(
        X_new, X_ref, ref_mask, jnp.asarray(config.distance_scale)
    )
    if variances is not None:
        s = s + config.w_variance * variance_novelty(
            jnp.mean(variances, axis=-1) if variances.ndim > 1 else variances,
            jnp.asarray(prior_variance),
        )
    if residuals is not None:
        s = s + config.w_residual * residual_novelty(
            residuals, jnp.asarray(residual_scale)
        )
    return s


def select_top_k(scores: Array, k: int) -> Array:
    """Indices of the k most novel points (``novelty_selector.py:204-220``)."""
    _, idx = jax.lax.top_k(scores, k)
    return idx


def select_threshold_mask(scores: Array, threshold: Array) -> Array:
    """Boolean mask of points above the novelty threshold (``:222-235``)."""
    return scores >= threshold


def select_diverse(key: Array, X: Array, k: int, mask: Optional[Array] = None) -> Array:
    """Greedy farthest-point diverse subset (``novelty_selector.py:237-296``)."""
    return farthest_point_sampling(key, X, k, mask)


class NoveltySelector:
    """OO facade mirroring ``NoveltySelector``."""

    def __init__(self, config: Optional[NoveltyConfig] = None):
        self.config = config or NoveltyConfig()

    def scores(self, X_new, X_ref, ref_mask, **kw):
        return novelty_scores(self.config, X_new, X_ref, ref_mask, **kw)

    def select(self, scores: Array, k: int) -> Array:
        return select_top_k(scores, k)

    def select_above_threshold(self, scores: Array) -> Array:
        return select_threshold_mask(scores, jnp.asarray(self.config.threshold))


class ActiveDataSelector:
    """Acquisition-driven selection (``novelty_selector.py:299-372``):
    'uncertainty' picks max-σ points; 'ei' adds an exploitation bonus from
    the residual magnitude."""

    def __init__(self, strategy: str = "uncertainty", beta: float = 1.0):
        self.strategy = strategy
        self.beta = beta

    def acquire(self, k: int, variances: Array,
                residuals: Optional[Array] = None) -> Array:
        v = jnp.mean(variances, axis=-1) if variances.ndim > 1 else variances
        if self.strategy == "uncertainty" or residuals is None:
            score = v
        elif self.strategy == "ei":
            score = jnp.sqrt(jnp.maximum(v, 0.0)) * self.beta + jnp.linalg.norm(
                residuals, axis=-1
            )
        else:
            raise ValueError(f"unknown strategy {self.strategy!r}")
        _, idx = jax.lax.top_k(score, k)
        return idx
