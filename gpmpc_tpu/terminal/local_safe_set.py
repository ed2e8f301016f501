"""Local safe sets: weighted k-nearest-neighbor queries over the safe set.

TPU-native counterpart of ``/root/reference/src/terminal/local_safe_set.py``:
per-block state-space weights (pos 1.0, vel 0.5, att 0.3, ω 0.2, fuel 0.1 —
``:113-131``), KNN queries (``:133-152``), adaptive K by local density
(``:226-249``), fuel-aware filtering (``:184-197``), and Q interpolation by
nearest / inverse-distance / pseudo-barycentric weights (``:251-300``).

The scipy KDTree becomes a brute-force batched top-k over weighted distances
— one (B×cap) matmul + ``lax.top_k``, which on TPU beats any tree for stores
up to ~10⁵ states (SURVEY.md §2.9) and needs no rebuild when the set grows.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from flax import struct

from ..ops.linalg import weighted_sq_dists
from .safe_set import SafeSet

Array = jax.Array

_BIG = 1e30


def default_state_weights(n_x: int) -> Array:
    """Per-coordinate query weights (sqrt applied later), mirroring the
    block weights of ``local_safe_set.py:113-131``."""
    if n_x >= 14:
        w = [0.1] + [1.0] * 3 + [0.5] * 3 + [0.3] * 4 + [0.2] * 3
    else:
        w = [0.1] + [1.0] * 3 + [0.5] * 3
    return jnp.asarray(w[:n_x])


@struct.dataclass
class LocalSafeSetConfig:
    """(mirrors ``LocalSafeSetConfig``: K=10, K_min=4, K_max=50)."""

    K: int = struct.field(pytree_node=False, default=10)
    K_min: int = struct.field(pytree_node=False, default=4)
    K_max: int = struct.field(pytree_node=False, default=50)
    density_radius: float = 2.0
    interpolation: str = struct.field(pytree_node=False, default="idw")
    idw_power: float = 2.0


class KNNResult(NamedTuple):
    indices: Array  # (K,) into the flat safe-set arrays
    distances: Array  # (K,) weighted distances
    states: Array  # (K, n_x)
    q_values: Array  # (K,)
    valid: Array  # (K,) bool — False rows are padding


def knn_query(
    ss: SafeSet,
    x: Array,
    K: int,
    weights: Optional[Array] = None,
    fuel_available: Optional[Array] = None,
    fallback_unfiltered: bool = False,
) -> KNNResult:
    """Top-K weighted neighbors with fuel-aware masking
    (``local_safe_set.py:133-224``). Infeasible / inactive rows get distance
    +inf; callers must respect ``valid``. vmap over ``x`` for batches.

    ``fallback_unfiltered``: when the fuel filter leaves ZERO feasible rows,
    fall back to the unfiltered (active-row) neighbors instead of returning
    an all-invalid result. The endgame geometry makes this necessary for
    closed-loop LMPC: in the final descent the lane's remaining fuel drops
    below the stored ``fuel_required`` floor (every vertex carries the
    +fuel_margin pad, ~0.05, while a lane about to touch down legitimately
    holds less), the terminal vertex set empties, the Σλ=1 hull row turns
    infeasible, and every remaining QP in the episode is unsolvable — the
    controller then flies a stale shifted plan into the ground. Measured on
    the 16-lane dispersed fleet: 100% of QP failures were this mode (steps
    44-56, altitude <3.6 m, nvalid=0). An unfiltered terminal anchor within
    a meter of touchdown is strictly safer than no terminal constraint."""
    w = default_state_weights(ss.states.shape[1]) if weights is None else weights
    d2 = weighted_sq_dists(x[None, :], ss.states, w)[0]
    feas = ss.feasible_mask(fuel_available)
    if fallback_unfiltered and fuel_available is not None:
        feas = jnp.where(jnp.any(feas), feas, ss.mask)
    d2 = jnp.where(feas, d2, _BIG)
    neg, idx = jax.lax.top_k(-d2, K)
    dist = jnp.sqrt(jnp.maximum(-neg, 0.0))
    return KNNResult(
        indices=idx,
        distances=dist,
        states=ss.states[idx],
        q_values=ss.q_values[idx],
        valid=-neg < _BIG * 0.5,
    )


def adaptive_k(
    ss: SafeSet,
    x: Array,
    config: LocalSafeSetConfig,
    weights: Optional[Array] = None,
) -> Array:
    """Local density → K (``local_safe_set.py:226-249``): count neighbors in
    a radius ball and clip to [K_min, K_max] (returned as a traced int; use
    it to *mask* a K_max query, keeping shapes static)."""
    w = default_state_weights(ss.states.shape[1]) if weights is None else weights
    d2 = weighted_sq_dists(x[None, :], ss.states, w)[0]
    inside = ss.mask & (d2 <= config.density_radius**2)
    return jnp.clip(jnp.sum(inside), config.K_min, config.K_max)


def interpolate_q(result: KNNResult, x: Array, config: LocalSafeSetConfig,
                  k_effective: Optional[Array] = None) -> Array:
    """Q estimate from the neighbors (``local_safe_set.py:251-300``):
    'nearest' | 'idw' (inverse distance^p) | 'barycentric' (softmin weights —
    the reference's pseudo-barycentric least-squares is approximated by
    distance-softmin, which matches it for points inside the simplex)."""
    valid = result.valid
    if k_effective is not None:
        valid = valid & (jnp.arange(result.indices.shape[0]) < k_effective)
    vf = valid.astype(x.dtype)
    if config.interpolation == "nearest":
        d = jnp.where(valid, result.distances, jnp.inf)
        return result.q_values[jnp.argmin(d)]
    if config.interpolation == "idw":
        wgt = vf / jnp.maximum(result.distances, 1e-6) ** config.idw_power
    elif config.interpolation == "barycentric":
        d = jnp.where(valid, result.distances, _BIG)
        wgt = vf * jax.nn.softmax(-d / jnp.maximum(jnp.min(d), 1e-6))
    else:
        raise ValueError(f"unknown interpolation {config.interpolation!r}")
    return jnp.sum(wgt * result.q_values) / jnp.maximum(jnp.sum(wgt), 1e-12)


class LocalSafeSet:
    """OO facade mirroring ``LocalSafeSet`` — holds config/weights, delegates
    to the pure queries (vmap-friendly)."""

    def __init__(
        self,
        config: Optional[LocalSafeSetConfig] = None,
        weights: Optional[Array] = None,
    ):
        self.config = config or LocalSafeSetConfig()
        self.weights = weights

    def query(self, ss: SafeSet, x: Array, fuel_available=None) -> KNNResult:
        return knn_query(ss, x, self.config.K, self.weights, fuel_available)

    def query_adaptive(self, ss: SafeSet, x: Array, fuel_available=None):
        k_eff = adaptive_k(ss, x, self.config, self.weights)
        res = knn_query(ss, x, self.config.K_max, self.weights, fuel_available)
        return res, k_eff

    def q_value(self, ss: SafeSet, x: Array, fuel_available=None) -> Array:
        return interpolate_q(self.query(ss, x, fuel_available), x, self.config)


class MultiResolutionLocalSafeSet:
    """Hierarchical K levels (``local_safe_set.py:327-415``): query several K
    values and blend by level weights."""

    def __init__(self, levels=(5, 15, 40), level_weights=None,
                 config: Optional[LocalSafeSetConfig] = None):
        self.levels = levels
        self.level_weights = level_weights or [1.0 / len(levels)] * len(levels)
        self.config = config or LocalSafeSetConfig()

    def q_value(self, ss: SafeSet, x: Array, fuel_available=None) -> Array:
        total = 0.0
        for K, lw in zip(self.levels, self.level_weights):
            res = knn_query(ss, x, K, None, fuel_available)
            total = total + lw * interpolate_q(res, x, self.config)
        return total
