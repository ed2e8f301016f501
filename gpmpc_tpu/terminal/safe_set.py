"""Sampled safe sets with static-shape device storage.

TPU-native counterpart of ``/root/reference/src/terminal/safe_set.py`` and
``memory_safe_set.py``: trajectories enter with a backward cost-to-go
recursion Q(x_k) = Σ_{i≥k} l_i (``safe_set.py:132-176``); all states /
Q-values / controls / iteration ids live in preallocated flat arrays with an
active-count mask (the reference's lazy flattened cache, ``:178-213``, is the
*primary* representation here); pruning keeps the store bounded
(FIFO / quality / diversity — ``memory_safe_set.py:162-248``); fuel-aware
filtering shrinks the queryable set with the remaining budget
(``safe_set.py:356-459``). Everything is pure state-passing and jittable, so
safe-set growth happens inside the learning loop's scan, and multi-host
merging is an ``all_gather`` + global prune (SURVEY.md §2.10).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

Array = jax.Array


def cost_to_go(stage_costs: Array) -> Array:
    """Backward recursion Q_k = Σ_{i≥k} l_i (``safe_set.py:152-176``) as a
    reversed cumulative sum."""
    return jnp.cumsum(stage_costs[::-1])[::-1]


@struct.dataclass
class SafeSet:
    """Flat store of (state, Q, control, iteration, fuel_required, traj_id).

    ``capacity`` states max; insertion is ring-buffer FIFO by default with
    optional quality pruning (see :func:`add_trajectory`). ``fuel_required``
    per state = state-fuel − trajectory-final-fuel (+ margin) — the
    fuel-aware feasibility device of ``safe_set.py:356-459``.
    """

    states: Array  # (cap, n_x)
    q_values: Array  # (cap,)
    controls: Array  # (cap, n_u)
    iterations: Array  # (cap,) int32 — which LMPC iteration added the state
    fuel_required: Array  # (cap,)
    traj_ids: Array  # (cap,) int32
    head: Array  # () int32 next write slot
    count: Array  # () int32 active entries
    n_trajectories: Array  # () int32
    best_cost: Array  # () best total trajectory cost seen
    # monotone total of states ever written (head without the mod-capacity
    # wrap): written <= capacity iff every written slot is the prefix
    # [0, written) — the exact validity condition for the frozen-set KNN
    # bucket (see :func:`trim`; ``head`` alone cannot express it, it wraps)
    written: Array = struct.field(
        default_factory=lambda: jnp.asarray(0, jnp.int32))
    fuel_margin: float = 0.05

    @classmethod
    def create(cls, capacity: int, n_x: int, n_u: int = 3, fuel_margin: float = 0.05):
        return cls(
            states=jnp.zeros((capacity, n_x)),
            q_values=jnp.full((capacity,), jnp.inf),
            controls=jnp.zeros((capacity, n_u)),
            iterations=jnp.zeros((capacity,), jnp.int32),
            fuel_required=jnp.zeros((capacity,)),
            traj_ids=jnp.full((capacity,), -1, jnp.int32),
            head=jnp.asarray(0, jnp.int32),
            count=jnp.asarray(0, jnp.int32),
            n_trajectories=jnp.asarray(0, jnp.int32),
            best_cost=jnp.asarray(jnp.inf),
            fuel_margin=fuel_margin,
        )

    @property
    def capacity(self) -> int:
        return self.states.shape[0]

    @property
    def mask(self) -> Array:
        return self.traj_ids >= 0

    def add_trajectory(
        self,
        X: Array,  # (T, n_x) states
        U: Array,  # (T, n_u) controls (final row may repeat)
        stage_costs: Array,  # (T,)
        valid: Optional[Array] = None,  # scalar bool — masked no-op when False
    ) -> "SafeSet":
        """Insert a trajectory with its cost-to-go (``safe_set.py:132-176``).
        Fixed length T per call (pad + mask shorter episodes upstream);
        overwrites the oldest states ring-buffer style when full."""
        T = X.shape[0]
        ok = jnp.asarray(True) if valid is None else valid
        Q = cost_to_go(stage_costs)
        fuel_req = X[:, 0] - X[-1, 0] + self.fuel_margin
        tid = self.n_trajectories
        idx = (self.head + jnp.arange(T)) % self.capacity

        def write(arr, vals):
            return jnp.where(ok, arr.at[idx].set(vals), arr)

        return self.replace(
            states=write(self.states, X),
            q_values=write(self.q_values, Q),
            controls=write(self.controls, U),
            iterations=write(self.iterations, jnp.full(T, tid, jnp.int32)),
            fuel_required=write(self.fuel_required, fuel_req),
            traj_ids=write(self.traj_ids, jnp.full(T, tid, jnp.int32)),
            head=jnp.where(ok, (self.head + T) % self.capacity, self.head),
            count=jnp.where(ok, jnp.minimum(self.count + T, self.capacity), self.count),
            n_trajectories=jnp.where(ok, tid + 1, tid),
            best_cost=jnp.where(ok, jnp.minimum(self.best_cost, Q[0]), self.best_cost),
            # saturate instead of counting past capacity: once the ring has
            # wrapped the prefix invariant is gone for good, and saturation
            # keeps the counter meaningful for campaigns of any length
            written=jnp.where(
                ok,
                jnp.minimum(self.written + T, self.capacity + 1),
                self.written,
            ).astype(jnp.int32),
        )

    # -- queries -------------------------------------------------------------

    def feasible_mask(self, fuel_available: Optional[Array] = None) -> Array:
        """Active ∧ (fuel_required ≤ fuel_available) (``safe_set.py:420-459``)."""
        m = self.mask
        if fuel_available is not None:
            m = m & (self.fuel_required <= fuel_available)
        return m

    def states_from_iteration(self, it: Array) -> Array:
        """Boolean mask of states from a given iteration (``safe_set.py:230-246``)."""
        return self.mask & (self.iterations == it)

    def get_statistics(self) -> dict:
        """(mirrors ``safe_set.py:295-316``)."""
        m = self.mask
        mf = m.astype(jnp.float32)
        denom = jnp.maximum(jnp.sum(mf), 1.0)
        return {
            "n_states": self.count,
            "n_trajectories": self.n_trajectories,
            "capacity": self.capacity,
            "best_cost": self.best_cost,
            "mean_q": jnp.sum(jnp.where(m, self.q_values, 0.0)) / denom,
            "fill_fraction": self.count / self.capacity,
        }

    # -- persistence (safe_set.py:318-347) -----------------------------------

    def save(self, path: str) -> None:
        import numpy as np

        leaves, _ = jax.tree.flatten(self)
        np.savez(path, *[np.asarray(x) for x in leaves])

    def load(self, path: str) -> "SafeSet":
        import numpy as np

        data = np.load(path)
        leaves = [jnp.asarray(data[k]) for k in data.files]
        _, treedef = jax.tree.flatten(self)
        return jax.tree.unflatten(treedef, leaves)


def trim(ss: SafeSet, size: int) -> SafeSet:
    """Prefix view of the leading ``size`` slots — the frozen-set KNN
    bucket.

    The per-solve KNN (``local_safe_set.knn_query``) brute-force streams the
    FULL static capacity every query, so a campaign sized for end-state
    growth pays its final capacity from round 1 (measured: doubling capacity
    1M → 2M doubled the 1024-lane fleet round wall 40 → 82 s — the whole
    round-4 "vertex-memory throughput regression" was this, not the vertex
    bookkeeping). Within a fleet round the set is frozen, so queries can run
    against the smallest power-of-two prefix that covers every written slot.

    Valid whenever ``written ≤ size`` (``written`` is the MONOTONE insert
    total — ``head`` wraps mod capacity and cannot express this; a
    wrapped ring scatters live rows across the whole array and admits no
    prefix view). Pre-wrap, inserts are prefix-contiguous, so every row
    ever written — including actives left scattered by an in-place prune —
    lives in ``[0, size)``, and rows ≥ written carry ``traj_id = −1``
    (masked). Returned KNN indices are prefix indices and therefore remain
    valid against the full set (vertex memory carries them across rounds
    as buckets grow). Callers must fall back to ``size = capacity`` (no
    trim) once ``written > capacity`` — :func:`knn_bucket` does this when
    given ``written`` directly.
    """
    return ss.replace(
        states=ss.states[:size],
        q_values=ss.q_values[:size],
        controls=ss.controls[:size],
        iterations=ss.iterations[:size],
        fuel_required=ss.fuel_required[:size],
        traj_ids=ss.traj_ids[:size],
    )


def knn_bucket(written: int, capacity: int, floor: int = 4096) -> int:
    """Smallest power-of-FOUR ≥ ``written`` (≥ floor, ≤ capacity). Powers
    of four (not two) because every new bucket is a new program shape: on
    the tunneled TPU a fleet recompile costs tens of seconds, so halving
    the number of shapes is worth the ≤4× bucket overshoot (still ≥8×
    under a campaign-sized capacity in early rounds).

    Pass ``SafeSet.written`` (the monotone insert total), NOT ``head``:
    once the ring has wrapped (written > capacity) this returns
    ``capacity`` — the full, untrimmed view — because no prefix covers a
    wrapped ring."""
    b = max(int(floor), 1)
    h = max(int(written), 1)
    while b < h:
        b <<= 2
    return min(b, capacity)


def prune_quality(ss: SafeSet, keep: int) -> SafeSet:
    """Keep the ``keep`` lowest-Q states (quality pruning,
    ``memory_safe_set.py:218-248``): marks the rest inactive."""
    score = jnp.where(ss.mask, ss.q_values, jnp.inf)
    order = jnp.argsort(score)
    keep_mask = jnp.zeros(ss.capacity, bool).at[order[:keep]].set(True) & ss.mask
    return ss.replace(
        traj_ids=jnp.where(keep_mask, ss.traj_ids, -1),
        count=jnp.sum(keep_mask).astype(jnp.int32),
    )


def prune_fifo(ss: SafeSet, keep: int) -> SafeSet:
    """Keep the ``keep`` most recently WRITTEN states (FIFO pruning,
    ``memory_safe_set.py:229-235`` — the reference drops oldest
    trajectories; here recency is per-state write order, recovered from the
    ring-buffer head)."""
    # age 0 = the slot just behind head (most recent write)
    age = (ss.head - 1 - jnp.arange(ss.capacity)) % ss.capacity
    score = jnp.where(ss.mask, age, ss.capacity + 1)
    order = jnp.argsort(score)
    keep_mask = jnp.zeros(ss.capacity, bool).at[order[:keep]].set(True) & ss.mask
    return ss.replace(
        traj_ids=jnp.where(keep_mask, ss.traj_ids, -1),
        count=jnp.sum(keep_mask).astype(jnp.int32),
    )


def prune_diversity(ss: SafeSet, keep: int, resolution: int = 64) -> SafeSet:
    """Diversity pruning: keep the lowest-Q state per occupied cell of a
    state-space voxel grid, then quality-prune the survivors to ``keep``.

    The reference declares a diversity strategy but falls back to FIFO
    (``memory_safe_set.py:245-248`` — "For now, use FIFO as fallback");
    this is a real one, built for the failure mode fleet-scale sets
    actually hit: thousands of lanes crossing the same region deposit
    near-duplicate states with interchangeable Q, starving the KNN terminal
    sets of variety. Voxel dedup is O(n log n) (sort, not the O(keep·n)
    farthest-point scan — intractable at 10⁶ rows) and keeps exactly the
    best-known continuation in every visited region. ``resolution`` is the
    cells-per-dimension of the grid over the active states' bounding box.
    """
    m = ss.mask
    mf = m.astype(ss.states.dtype)
    denom = jnp.maximum(jnp.sum(mf), 1.0)
    mean = jnp.sum(ss.states * mf[:, None], axis=0) / denom
    var = jnp.sum((ss.states - mean) ** 2 * mf[:, None], axis=0) / denom
    # ~±3σ bounding box; constant dimensions collapse to one cell
    half = jnp.maximum(3.0 * jnp.sqrt(var), 1e-6)
    cell = jnp.clip(
        jnp.floor((ss.states - mean + half) / (2.0 * half) * resolution),
        0, resolution - 1,
    ).astype(jnp.int32)
    # mix per-dimension cell ids into one int32 key (collisions just merge
    # two cells — harmless for a pruning heuristic)
    def mix(h, c):
        return (h * jnp.int32(1000003) + c).astype(jnp.int32), None

    key0 = jnp.zeros(ss.capacity, jnp.int32)
    key, _ = jax.lax.scan(mix, key0, cell.T)
    # sort by (voxel, Q): the first row of each voxel run is its best state.
    # inactive rows sort last under a +inf rank so they never claim a voxel.
    q = jnp.where(m, ss.q_values, jnp.inf)
    order = jnp.lexsort((q, jnp.where(m, key, jnp.iinfo(jnp.int32).max)))
    sk = key[order]
    first = jnp.ones(ss.capacity, bool).at[1:].set(sk[1:] != sk[:-1])
    best_per_voxel = jnp.zeros(ss.capacity, bool).at[order].set(first) & m
    pruned = ss.replace(
        traj_ids=jnp.where(best_per_voxel, ss.traj_ids, -1),
        count=jnp.sum(best_per_voxel).astype(jnp.int32),
    )
    return prune_quality(pruned, keep)


def prune(ss: SafeSet, keep: int, strategy: str = "quality", **kw) -> SafeSet:
    """Dispatch on the reference's pruning-strategy names
    (``memory_safe_set.py:218-228``)."""
    fns = {
        "quality": prune_quality,
        "fifo": prune_fifo,
        "diversity": prune_diversity,
    }
    if strategy not in fns:
        raise ValueError(
            f"unknown pruning strategy {strategy!r}; expected one of {sorted(fns)}"
        )
    return fns[strategy](ss, keep, **kw)


def merge_safe_sets(sets: list[SafeSet], capacity: Optional[int] = None) -> SafeSet:
    """Concatenate several stores and keep the best ``capacity`` states —
    the deterministic global merge used after an ``all_gather`` of per-host
    safe sets (SURVEY.md §2.10)."""
    cap = capacity or sets[0].capacity
    cat = lambda attr: jnp.concatenate([getattr(s, attr) for s in sets])
    traj_ids = cat("traj_ids")
    merged = sets[0].replace(
        states=cat("states"),
        q_values=cat("q_values"),
        controls=cat("controls"),
        iterations=cat("iterations"),
        fuel_required=cat("fuel_required"),
        traj_ids=traj_ids,
        head=jnp.asarray(0, jnp.int32),
        count=jnp.sum(traj_ids >= 0).astype(jnp.int32),
        n_trajectories=sum(s.n_trajectories for s in sets),
        best_cost=jnp.min(jnp.stack([s.best_cost for s in sets])),
    )
    pruned = prune_quality(merged, cap)
    # compact down to `cap` rows (lowest-Q first)
    score = jnp.where(pruned.mask, pruned.q_values, jnp.inf)
    order = jnp.argsort(score)[:cap]
    take = lambda a: a[order]
    return pruned.replace(
        states=take(pruned.states),
        q_values=take(pruned.q_values),
        controls=take(pruned.controls),
        iterations=take(pruned.iterations),
        fuel_required=take(pruned.fuel_required),
        traj_ids=take(pruned.traj_ids),
        count=jnp.sum(take(pruned.traj_ids) >= 0).astype(jnp.int32),
    )


@struct.dataclass
class StreamingSafeSet:
    """Buffered single-state adds (``memory_safe_set.py:520-580``): states
    stream in one at a time and flush into the safe set as one pseudo-
    trajectory when the buffer fills or the episode closes."""

    safe_set: SafeSet
    buf_X: Array  # (buf, n_x)
    buf_U: Array
    buf_cost: Array
    buf_count: Array

    @classmethod
    def create(cls, safe_set: SafeSet, buffer_size: int = 64):
        n_x = safe_set.states.shape[1]
        n_u = safe_set.controls.shape[1]
        return cls(
            safe_set=safe_set,
            buf_X=jnp.zeros((buffer_size, n_x)),
            buf_U=jnp.zeros((buffer_size, n_u)),
            buf_cost=jnp.zeros(buffer_size),
            buf_count=jnp.asarray(0, jnp.int32),
        )

    def add(self, x: Array, u: Array, cost: Array) -> "StreamingSafeSet":
        # one-hot row select (vmapped dynamic scatters serialize on TPU;
        # see gp/online_update.DataBuffer.add)
        i = self.buf_count
        sel = jnp.arange(self.buf_X.shape[0]) == i
        new = self.replace(
            buf_X=jnp.where(sel[:, None], jnp.broadcast_to(x, self.buf_X.shape), self.buf_X),
            buf_U=jnp.where(sel[:, None], jnp.broadcast_to(u, self.buf_U.shape), self.buf_U),
            buf_cost=jnp.where(sel, cost, self.buf_cost),
            buf_count=i + 1,
        )
        full = new.buf_count >= self.buf_X.shape[0]
        return jax.lax.cond(full, lambda s: s.flush(), lambda s: s, new)

    def flush(self) -> "StreamingSafeSet":
        """Push the buffered states as one trajectory (masked no-op when
        empty); padding rows carry zero stage cost so cost-to-go is exact."""
        valid = self.buf_count > 0
        mask = jnp.arange(self.buf_X.shape[0]) < self.buf_count
        ss = self.safe_set.add_trajectory(
            self.buf_X, self.buf_U, jnp.where(mask, self.buf_cost, 0.0), valid=valid
        )
        return self.replace(safe_set=ss, buf_count=jnp.asarray(0, jnp.int32))


# Name-parity aliases for the reference surface.
SampledSafeSet = SafeSet
FuelAwareSafeSet = SafeSet
MemoryOptimizedSafeSet = SafeSet
