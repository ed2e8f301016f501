"""Reference trajectory container and library.

TPU-native counterpart of ``/root/reference/src/reference/trajectory_library.py``:
``Trajectory`` with time interpolation and resampling (``:42-150``), the
library with add/remove/get, nearest-by-initial-state queries, best-in-radius
by cost/fuel/time, statistics, and persistence (``:153-441``), plus bulk
seeding via SCVX or the PD fallback (``:444-519``). The library stores
fixed-length trajectories in stacked device arrays so queries are batched
distance computations.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
from flax import struct

Array = jax.Array


class TrajectoryMetadata(NamedTuple):
    cost: Array
    fuel_used: Array
    duration: Array
    converged: Array


@struct.dataclass
class Trajectory:
    """Time-indexed state/control trajectory with interpolation."""

    times: Array  # (T+1,)
    X: Array  # (T+1, n_x)
    U: Array  # (T, n_u)

    @property
    def duration(self):
        return self.times[-1]

    def state_at(self, t: Array) -> Array:
        """Linear interpolation in time (``trajectory_library.py:74-108``)."""
        t = jnp.clip(t, self.times[0], self.times[-1])
        idx = jnp.clip(jnp.searchsorted(self.times, t, side="right") - 1, 0,
                       self.times.shape[0] - 2)
        t0, t1 = self.times[idx], self.times[idx + 1]
        w = (t - t0) / jnp.maximum(t1 - t0, 1e-9)
        return (1 - w) * self.X[idx] + w * self.X[idx + 1]

    def control_at(self, t: Array) -> Array:
        """Zero-order-hold control lookup."""
        t = jnp.clip(t, self.times[0], self.times[-1])
        idx = jnp.clip(jnp.searchsorted(self.times, t, side="right") - 1, 0,
                       self.U.shape[0] - 1)
        return self.U[idx]

    def resample(self, n: int) -> "Trajectory":
        """Uniform-time resampling (``trajectory_library.py:110-150``)."""
        ts = jnp.linspace(self.times[0], self.times[-1], n + 1)
        X = jax.vmap(self.state_at)(ts)
        U = jax.vmap(self.control_at)(ts[:-1])
        return Trajectory(times=ts, X=X, U=U)


@struct.dataclass
class TrajectoryLibrary:
    """Fixed-capacity stacked store of same-length trajectories."""

    times: Array  # (cap, T+1)
    X: Array  # (cap, T+1, n_x)
    U: Array  # (cap, T, n_u)
    cost: Array  # (cap,)
    fuel: Array  # (cap,)
    active: Array  # (cap,) bool
    count: Array  # ()

    @classmethod
    def create(cls, capacity: int, T: int, n_x: int, n_u: int):
        return cls(
            times=jnp.zeros((capacity, T + 1)),
            X=jnp.zeros((capacity, T + 1, n_x)),
            U=jnp.zeros((capacity, T, n_u)),
            cost=jnp.full((capacity,), jnp.inf),
            fuel=jnp.full((capacity,), jnp.inf),
            active=jnp.zeros((capacity,), bool),
            count=jnp.asarray(0, jnp.int32),
        )

    @property
    def capacity(self) -> int:
        return self.X.shape[0]

    def add(self, traj: Trajectory, cost, fuel) -> "TrajectoryLibrary":
        i = self.count % self.capacity
        return self.replace(
            times=self.times.at[i].set(traj.times),
            X=self.X.at[i].set(traj.X),
            U=self.U.at[i].set(traj.U),
            cost=self.cost.at[i].set(cost),
            fuel=self.fuel.at[i].set(fuel),
            active=self.active.at[i].set(True),
            count=self.count + 1,
        )

    def get(self, i: Array) -> Trajectory:
        return Trajectory(times=self.times[i], X=self.X[i], U=self.U[i])

    def nearest(self, x0: Array, weights: Optional[Array] = None) -> Array:
        """Index of the trajectory with the nearest initial state
        (``trajectory_library.py:236-276``)."""
        w = jnp.ones(x0.shape[0]) if weights is None else weights
        d2 = jnp.sum(((self.X[:, 0, :] - x0[None]) ** 2) * w[None], axis=1)
        return jnp.argmin(jnp.where(self.active, d2, jnp.inf))

    def best_within_radius(
        self, x0: Array, radius: Array, by: str = "cost",
        weights: Optional[Array] = None,
    ) -> Array:
        """Lowest-cost/fuel trajectory whose initial state is within radius
        (``trajectory_library.py:278-330``); falls back to nearest."""
        w = jnp.ones(x0.shape[0]) if weights is None else weights
        d2 = jnp.sum(((self.X[:, 0, :] - x0[None]) ** 2) * w[None], axis=1)
        inside = self.active & (d2 <= radius**2)
        metric = self.cost if by == "cost" else self.fuel
        idx = jnp.argmin(jnp.where(inside, metric, jnp.inf))
        return jnp.where(jnp.any(inside), idx, self.nearest(x0, weights))

    def get_statistics(self) -> dict:
        af = self.active.astype(jnp.float32)
        n = jnp.maximum(jnp.sum(af), 1.0)
        return {
            "n_trajectories": jnp.sum(self.active),
            "capacity": self.capacity,
            "mean_cost": jnp.sum(jnp.where(self.active, self.cost, 0.0)) / n,
            "mean_fuel": jnp.sum(jnp.where(self.active, self.fuel, 0.0)) / n,
            "best_cost": jnp.min(jnp.where(self.active, self.cost, jnp.inf)),
        }

    def save(self, path: str) -> None:
        import numpy as np

        leaves, _ = jax.tree.flatten(self)
        np.savez(path, *[np.asarray(x) for x in leaves])

    def load(self, path: str) -> "TrajectoryLibrary":
        import numpy as np

        data = np.load(path)
        leaves = [jnp.asarray(data[k]) for k in data.files]
        _, treedef = jax.tree.flatten(self)
        return jax.tree.unflatten(treedef, leaves)


def generate_trajectory_library(
    solver_fn: Callable[[Array], tuple],
    x0s: Array,
    capacity: Optional[int] = None,
    dt: float = 0.1,
) -> TrajectoryLibrary:
    """Bulk seeding (``trajectory_library.py:444-519``): ``solver_fn(x0) →
    (X, U, cost, fuel)`` (e.g. a closed-over SCVX solve), vmapped over the
    initial-condition batch."""
    X, U, cost, fuel = jax.vmap(solver_fn)(x0s)
    n, T1 = X.shape[0], X.shape[1]
    lib = TrajectoryLibrary.create(capacity or n, T1 - 1, X.shape[2], U.shape[2])
    times = jnp.arange(T1) * dt
    return lib.replace(
        times=jnp.broadcast_to(times, (lib.capacity, T1)).astype(jnp.float32)
        if capacity is None or capacity == n
        else lib.times,
        X=X if lib.capacity == n else lib.X.at[:n].set(X),
        U=U if lib.capacity == n else lib.U.at[:n].set(U),
        cost=cost if lib.capacity == n else lib.cost.at[:n].set(cost),
        fuel=fuel if lib.capacity == n else lib.fuel.at[:n].set(fuel),
        active=jnp.ones(lib.capacity, bool)
        if lib.capacity == n
        else lib.active.at[:n].set(True),
        count=jnp.asarray(n, jnp.int32),
    )
