"""Transition recording and residual training-data management.

TPU-native counterpart of ``/root/reference/src/learning/data_manager.py``:
``DataPoint`` with input [x, u] and residual output (``:31-53``), residual
modes velocity / acceleration / full with d = (actual − predicted)/dt on the
learned slices (``:211-253``), a bounded transition buffer + episode archive
(``:147-312``), training-data retrieval with success filtering / recency /
uniform subsampling (``:314-366``), and npz persistence (``:391-414``).
Fixed-capacity masked arrays throughout.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import struct

Array = jax.Array


def compute_residual(
    step_fn: Callable, x: Array, u: Array, x_next: Array, dt: float,
    mode: str = "velocity",
) -> Array:
    """d = (x_actual − F_nom(x,u))/dt restricted per mode
    (``data_manager.py:211-253``)."""
    err = (x_next - step_fn(x, u)) / dt
    if mode == "full":
        return err
    if mode == "velocity":
        if x.shape[-1] >= 14:
            return jnp.concatenate([err[..., 4:7], err[..., 11:14]], axis=-1)
        return err[..., 4:7]
    if mode == "acceleration":  # same slices; alias kept for parity
        if x.shape[-1] >= 14:
            return jnp.concatenate([err[..., 4:7], err[..., 11:14]], axis=-1)
        return err[..., 4:7]
    raise ValueError(f"unknown residual mode {mode!r}")


@struct.dataclass
class TransitionStore:
    """Flat masked store of transitions (x, u, x_next, residual, episode id,
    success flag)."""

    X: Array  # (cap, n_x)
    U: Array  # (cap, n_u)
    X_next: Array  # (cap, n_x)
    R: Array  # (cap, n_r) residuals
    episode: Array  # (cap,) int32
    success: Array  # (cap,) bool — resolved at episode end
    head: Array
    count: Array

    @classmethod
    def create(cls, capacity: int, n_x: int, n_u: int, n_r: int):
        return cls(
            X=jnp.zeros((capacity, n_x)),
            U=jnp.zeros((capacity, n_u)),
            X_next=jnp.zeros((capacity, n_x)),
            R=jnp.zeros((capacity, n_r)),
            episode=jnp.full((capacity,), -1, jnp.int32),
            success=jnp.zeros((capacity,), bool),
            head=jnp.asarray(0, jnp.int32),
            count=jnp.asarray(0, jnp.int32),
        )

    @property
    def capacity(self) -> int:
        return self.X.shape[0]

    @property
    def mask(self) -> Array:
        return self.episode >= 0

    def add(self, x, u, x_next, r, episode_id, record: Array = None) -> "TransitionStore":
        ok = jnp.asarray(True) if record is None else record
        i = self.head
        upd = lambda a, v: jnp.where(ok, a.at[i].set(v), a)
        return self.replace(
            X=upd(self.X, x),
            U=upd(self.U, u),
            X_next=upd(self.X_next, x_next),
            R=upd(self.R, r),
            episode=jnp.where(ok, self.episode.at[i].set(episode_id), self.episode),
            head=jnp.where(ok, (i + 1) % self.capacity, i),
            count=jnp.where(ok, jnp.minimum(self.count + 1, self.capacity), self.count),
        )

    def mark_episode(self, episode_id: Array, succeeded: Array) -> "TransitionStore":
        """Resolve the success flag for all transitions of an episode
        (``data_manager.py:254-312``)."""
        hit = self.episode == episode_id
        return self.replace(success=jnp.where(hit, succeeded, self.success))


@struct.dataclass
class DataManager:
    """Transition intake + residual computation + training-set retrieval
    (``data_manager.py:147-366``)."""

    store: TransitionStore
    dt: float = 0.1
    residual_mode: str = struct.field(pytree_node=False, default="velocity")

    @classmethod
    def create(cls, capacity: int, n_x: int, n_u: int, dt: float = 0.1,
               residual_mode: str = "velocity"):
        n_r = n_x if residual_mode == "full" else (6 if n_x >= 14 else 3)
        return cls(
            store=TransitionStore.create(capacity, n_x, n_u, n_r),
            dt=dt,
            residual_mode=residual_mode,
        )

    def add_transition(self, step_fn, x, u, x_next, episode_id,
                       record=None) -> "DataManager":
        r = compute_residual(step_fn, x, u, x_next, self.dt, self.residual_mode)
        return self.replace(store=self.store.add(x, u, x_next, r, episode_id, record))

    def end_episode(self, episode_id, succeeded) -> "DataManager":
        return self.replace(store=self.store.mark_episode(episode_id, succeeded))

    def training_mask(
        self,
        success_only: bool = False,
        recent_episodes: Optional[int] = None,
        current_episode: Optional[Array] = None,
    ) -> Array:
        """Selection mask over the store (``data_manager.py:314-366``)."""
        m = self.store.mask
        if success_only:
            m = m & self.store.success
        if recent_episodes is not None and current_episode is not None:
            m = m & (self.store.episode > current_episode - recent_episodes)
        return m

    def subsample_mask(self, key: Array, m: Array, max_points: int) -> Array:
        """Uniform subsample of an existing mask down to ``max_points``."""
        scores = jax.random.uniform(key, m.shape) + (~m) * 2.0
        thresh = jnp.sort(scores)[jnp.minimum(max_points, m.shape[0]) - 1]
        return m & (scores <= thresh)

    def save(self, path: str) -> None:
        import numpy as np

        leaves, _ = jax.tree.flatten(self)
        np.savez(path, *[np.asarray(x) for x in leaves])

    def load(self, path: str) -> "DataManager":
        import numpy as np

        data = np.load(path)
        leaves = [jnp.asarray(data[k]) for k in data.files]
        _, treedef = jax.tree.flatten(self)
        return jax.tree.unflatten(treedef, leaves)


@struct.dataclass
class StreamingDataCollector:
    """Threshold-triggered update flag (``data_manager.py:425-486``): counts
    accepted transitions and raises ``should_update`` every ``threshold``."""

    manager: DataManager
    threshold: int = 25
    since_update: Array = struct.field(default_factory=lambda: jnp.asarray(0, jnp.int32))

    def collect(self, step_fn, x, u, x_next, episode_id):
        mgr = self.manager.add_transition(step_fn, x, u, x_next, episode_id)
        n = self.since_update + 1
        should = n >= self.threshold
        return self.replace(
            manager=mgr, since_update=jnp.where(should, 0, n)
        ), should
