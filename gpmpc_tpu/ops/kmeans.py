"""k-means (Lloyd) and farthest-point sampling in pure JAX.

Replaces ``scipy.cluster.vq.kmeans2`` used for inducing-point initialization
(``/root/reference/src/gp/sparse_gp.py:33,140-148``). Fixed iteration count
under ``lax.scan``; distance computations are matmuls. Supports masked
(capacity-padded) data so it composes with the static-shape GP stores.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def _pairwise_sq(X: Array, C: Array) -> Array:
    return (
        jnp.sum(X * X, axis=-1)[:, None]
        + jnp.sum(C * C, axis=-1)[None, :]
        - 2.0 * X @ C.T
    )


def kmeans(
    key: Array,
    X: Array,
    k: int,
    iters: int = 20,
    mask: Optional[Array] = None,
) -> Tuple[Array, Array]:
    """Lloyd's algorithm. Returns (centroids (k,d), assignments (n,)).

    Masked points get infinite distance (never counted); empty clusters keep
    their previous centroid.
    """
    n, d = X.shape
    m = jnp.ones(n, bool) if mask is None else mask
    # init: random active points
    p = m.astype(jnp.float32)
    idx = jax.random.choice(key, n, (k,), replace=False, p=p / jnp.sum(p))
    C0 = X[idx]

    big = jnp.asarray(1e30, X.dtype)

    def body(C, _):
        d2 = jnp.where(m[:, None], _pairwise_sq(X, C), big)
        assign = jnp.argmin(d2, axis=1)
        onehot = (
            jax.nn.one_hot(assign, k, dtype=X.dtype) * m.astype(X.dtype)[:, None]
        )
        counts = jnp.sum(onehot, axis=0)
        sums = onehot.T @ X
        C_new = jnp.where(counts[:, None] > 0, sums / jnp.maximum(counts, 1.0)[:, None], C)
        return C_new, None

    C, _ = jax.lax.scan(body, C0, None, length=iters)
    d2 = jnp.where(m[:, None], _pairwise_sq(X, C), big)
    return C, jnp.argmin(d2, axis=1)


def farthest_point_sampling(
    key: Array, X: Array, k: int, mask: Optional[Array] = None
) -> Array:
    """Greedy max-min selection of k indices (diversity selection; also the
    reference's diverse-subset idiom, ``novelty_selector.py:237-296``)."""
    n = X.shape[0]
    m = jnp.ones(n, bool) if mask is None else mask
    p = m.astype(jnp.float32)
    first = jax.random.choice(key, n, (), p=p / jnp.sum(p))
    big = jnp.asarray(1e30, X.dtype)

    def body(carry, _):
        chosen, mind = carry
        d2 = jnp.sum((X - X[chosen[-1]]) ** 2, axis=-1)
        mind = jnp.minimum(mind, d2)
        masked = jnp.where(m, mind, -big)
        nxt = jnp.argmax(masked)
        return (jnp.concatenate([chosen[1:], nxt[None]]), mind), nxt

    # carry a rolling window; collect selections
    mind0 = jnp.where(m, big, -big)
    (_, _), picks = jax.lax.scan(
        body, (jnp.full((1,), first), mind0), None, length=k - 1
    )
    return jnp.concatenate([first[None], picks])
