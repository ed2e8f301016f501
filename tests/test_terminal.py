"""Terminal-set tests: cost-to-go recursion, safe-set storage/pruning/merge,
weighted KNN vs brute-force oracle, hull projection/membership, Q-function
approximators."""

import jax
import pytest
import jax.numpy as jnp
import numpy as np

from gpmpc_tpu.terminal import (
    GPQFunction,
    LocalSafeSetConfig,
    SafeSet,
    TerminalSetManager,
    adaptive_k,
    contains,
    cost_to_go,
    default_state_weights,
    idw_q,
    interpolate_q,
    iteration_q_values,
    knn_query,
    local_linear_q,
    merge_safe_sets,
    project_onto_hull,
    prune,
    prune_diversity,
    prune_fifo,
    prune_quality,
)


def make_safe_set(rng, n_traj=3, T=20, capacity=128) -> SafeSet:
    ss = SafeSet.create(capacity, 7)
    for t in range(n_traj):
        X = np.zeros((T, 7), np.float32)
        X[:, 0] = np.linspace(2.0, 1.5, T)  # burning fuel
        X[:, 1] = np.linspace(20.0 - 2 * t, 0.0, T)  # descending
        X[:, 2] = 0.1 * t
        X[:, 4] = -2.0
        U = np.tile([2.0, 0, 0], (T, 1)).astype(np.float32)
        costs = (np.linspace(2.0, 0.1, T) ** 2).astype(np.float32)
        ss = ss.add_trajectory(jnp.asarray(X), jnp.asarray(U), jnp.asarray(costs))
    return ss


class TestSafeSet:
    def test_cost_to_go_recursion(self):
        c = jnp.array([1.0, 2.0, 3.0])
        np.testing.assert_allclose(cost_to_go(c), [6.0, 5.0, 3.0])

    def test_add_and_stats(self, rng):
        ss = make_safe_set(rng)
        stats = ss.get_statistics()
        assert int(stats["n_states"]) == 60
        assert int(stats["n_trajectories"]) == 3
        assert float(stats["best_cost"]) > 0
        # Q decreases along each trajectory
        q0 = float(ss.q_values[0])
        qT = float(ss.q_values[19])
        assert qT < q0

    def test_invalid_trajectory_not_added(self, rng):
        ss = SafeSet.create(64, 7)
        X = jnp.zeros((10, 7))
        ss2 = ss.add_trajectory(X, jnp.zeros((10, 3)), jnp.ones(10),
                                valid=jnp.asarray(False))
        assert int(ss2.count) == 0
        assert int(ss2.n_trajectories) == 0

    def test_fuel_required(self, rng):
        ss = make_safe_set(rng, n_traj=1)
        # first state needs ~0.5 fuel (2.0 → 1.5) + margin
        np.testing.assert_allclose(float(ss.fuel_required[0]), 0.55, atol=1e-5)
        # last state needs only the margin
        np.testing.assert_allclose(float(ss.fuel_required[19]), 0.05, atol=1e-3)
        # fuel filter excludes expensive states
        m = ss.feasible_mask(jnp.asarray(0.2))
        assert int(m.sum()) < int(ss.mask.sum())

    def test_prune_quality(self, rng):
        ss = make_safe_set(rng)
        pruned = prune_quality(ss, 10)
        assert int(pruned.count) == 10
        kept_q = jnp.where(pruned.mask, pruned.q_values, jnp.inf)
        dropped_q = jnp.where(ss.mask & ~pruned.mask, ss.q_values, -jnp.inf)
        assert float(jnp.max(jnp.where(pruned.mask, kept_q, -jnp.inf))) <= float(
            jnp.min(jnp.where(ss.mask & ~pruned.mask, ss.q_values, jnp.inf))) + 1e-5

    def test_prune_fifo_keeps_most_recent(self, rng):
        ss = make_safe_set(rng)  # 3 trajectories x 20 states, write order 0..59
        pruned = prune_fifo(ss, 20)
        assert int(pruned.count) == 20
        # survivors are exactly the LAST trajectory written (traj id 2)
        assert int(jnp.sum(pruned.mask & (pruned.traj_ids == 2))) == 20

    def test_prune_fifo_respects_ring_wraparound(self, rng):
        # capacity 32 < 3*20: the ring has wrapped, oldest live states sit
        # AFTER head — recency must follow write order, not slot index
        ss = make_safe_set(rng, capacity=32)
        pruned = prune_fifo(ss, 10)
        assert int(pruned.count) == 10
        # the 10 most recent writes are the tail of trajectory 2
        assert int(jnp.sum(pruned.mask & (pruned.traj_ids == 2))) == 10

    def test_prune_diversity_dedups_near_duplicates(self, rng):
        ss = SafeSet.create(256, 7)
        # 8 copies of the same trajectory (different Q offsets) + 1 distinct
        base = np.zeros((16, 7), np.float32)
        base[:, 0] = np.linspace(2.0, 1.8, 16)
        base[:, 1] = np.linspace(20.0, 0.0, 16)
        for t in range(8):
            costs = (np.linspace(2.0, 0.1, 16) ** 2 + 0.01 * t).astype(np.float32)
            ss = ss.add_trajectory(
                jnp.asarray(base), jnp.zeros((16, 3)), jnp.asarray(costs))
        far = base + np.float32(5.0)
        ss = ss.add_trajectory(
            jnp.asarray(far), jnp.zeros((16, 3)),
            jnp.asarray(np.full(16, 3.0, np.float32)))
        pruned = prune_diversity(ss, 64)
        # duplicates collapse: well under the 9*16=144 stored states survive,
        # but the far trajectory's region is still represented
        assert int(pruned.count) < 100
        assert int(jnp.sum(pruned.mask & (pruned.traj_ids == 8))) > 0
        # per surviving voxel the LOWEST-Q copy won: every survivor from the
        # duplicated region carries the t=0 trajectory's Q (lowest offset)
        dup = pruned.mask & (pruned.traj_ids < 8)
        assert int(jnp.sum(dup & (pruned.traj_ids == 0))) == int(jnp.sum(dup))

    def test_prune_dispatch(self, rng):
        ss = make_safe_set(rng)
        for strategy in ("quality", "fifo", "diversity"):
            out = prune(ss, 15, strategy=strategy)
            assert int(out.count) <= 15
        try:
            prune(ss, 15, strategy="nope")
            raise AssertionError("expected ValueError")
        except ValueError:
            pass

    def test_prune_jittable(self, rng):
        ss = make_safe_set(rng)
        f = jax.jit(lambda s: prune_diversity(s, 20))
        out = f(ss)
        assert int(out.count) <= 20

    def test_merge(self, rng):
        a = make_safe_set(rng, n_traj=2)
        b = make_safe_set(rng, n_traj=2)
        merged = merge_safe_sets([a, b], capacity=64)
        assert merged.states.shape[0] == 64
        assert int(merged.count) == 64  # 80 states → best 64 kept
        assert float(merged.best_cost) == min(float(a.best_cost), float(b.best_cost))

    def test_save_load(self, rng, tmp_path):
        ss = make_safe_set(rng)
        path = str(tmp_path / "ss.npz")
        ss.save(path)
        ss2 = ss.load(path)
        np.testing.assert_allclose(ss.states, ss2.states)
        np.testing.assert_allclose(ss.q_values, ss2.q_values)


class TestKNN:
    def test_knn_matches_numpy_oracle(self, rng):
        ss = make_safe_set(rng)
        x = jnp.array([1.8, 5.0, 0.1, 0.0, -2.0, 0.0, 0.0])
        w = default_state_weights(7)
        res = knn_query(ss, x, 5)
        # brute force in numpy
        S = np.asarray(ss.states)[np.asarray(ss.mask)]
        d = np.sqrt((((S - np.asarray(x)) ** 2) * np.asarray(w)).sum(1))
        np.testing.assert_allclose(np.sort(res.distances), np.sort(d)[:5], rtol=1e-4)
        assert bool(res.valid.all())

    def test_knn_fuel_filter(self, rng):
        ss = make_safe_set(rng, n_traj=1)
        x = ss.states[0]
        res_all = knn_query(ss, x, 5)
        res_tight = knn_query(ss, x, 5, fuel_available=jnp.asarray(0.1))
        # with a tight budget, early (fuel-hungry) states are excluded
        assert float(res_tight.distances[0]) >= float(res_all.distances[0])

    def test_knn_fuel_fallback_when_filter_empties(self, rng):
        """fallback_unfiltered: a budget below every fuel_required returns
        the unfiltered neighbors instead of an all-invalid result (the LMPC
        endgame mode — see knn_query docstring)."""
        ss = make_safe_set(rng, n_traj=1)
        x = ss.states[0]
        budget = jnp.asarray(-1.0)  # below every stored requirement
        res_off = knn_query(ss, x, 5, fuel_available=budget)
        assert not bool(jnp.any(res_off.valid))
        res_fb = knn_query(
            ss, x, 5, fuel_available=budget, fallback_unfiltered=True
        )
        res_all = knn_query(ss, x, 5)
        assert bool(jnp.all(res_fb.valid == res_all.valid))
        np.testing.assert_allclose(
            np.asarray(res_fb.distances), np.asarray(res_all.distances)
        )
        # a budget that keeps some rows feasible must NOT fall back
        mid = float(jnp.median(jnp.where(ss.mask, ss.fuel_required, jnp.inf)))
        res_mid = knn_query(
            ss, x, 5, fuel_available=jnp.asarray(mid),
            fallback_unfiltered=True,
        )
        res_mid_off = knn_query(ss, x, 5, fuel_available=jnp.asarray(mid))
        np.testing.assert_allclose(
            np.asarray(res_mid.distances), np.asarray(res_mid_off.distances)
        )

    def test_more_neighbors_than_states(self):
        ss = SafeSet.create(32, 7)
        ss = ss.add_trajectory(jnp.ones((3, 7)), jnp.zeros((3, 3)), jnp.ones(3))
        res = knn_query(ss, jnp.ones(7), 8)
        assert int(res.valid.sum()) == 3  # padding rows flagged invalid

    def test_adaptive_k(self, rng):
        ss = make_safe_set(rng)
        cfg = LocalSafeSetConfig(K_min=4, K_max=50, density_radius=5.0)
        k_dense = adaptive_k(ss, ss.states[10], cfg)
        k_sparse = adaptive_k(ss, ss.states[10] + 100.0, cfg)
        assert int(k_sparse) == cfg.K_min
        assert int(k_dense) > int(k_sparse)

    def test_q_interpolation_modes(self, rng):
        ss = make_safe_set(rng)
        x = ss.states[5] + 0.01
        res = knn_query(ss, x, 5)
        for mode in ("nearest", "idw", "barycentric"):
            q = interpolate_q(res, x, LocalSafeSetConfig(interpolation=mode))
            # close to the stored Q at that state
            assert abs(float(q) - float(ss.q_values[5])) < 2.0


class TestConvexHull:
    @pytest.mark.slow  # demoted from the default tier (r5: <300 s budget)
    def test_projection_inside_and_outside(self):
        # unit square in 2D embedded in 7D
        V = jnp.zeros((4, 7))
        V = V.at[:, 1].set(jnp.array([0.0, 1.0, 0.0, 1.0]))
        V = V.at[:, 2].set(jnp.array([0.0, 0.0, 1.0, 1.0]))
        inside = jnp.zeros(7).at[1].set(0.5).at[2].set(0.5)
        outside = jnp.zeros(7).at[1].set(2.0).at[2].set(0.5)
        assert bool(contains(V, inside))
        assert not bool(contains(V, outside))
        proj = project_onto_hull(V, outside)
        np.testing.assert_allclose(proj.point[1], 1.0, atol=2e-3)
        np.testing.assert_allclose(proj.point[2], 0.5, atol=2e-3)
        np.testing.assert_allclose(float(proj.lam.sum()), 1.0, atol=1e-3)

    def test_invalid_vertices_excluded(self):
        V = jnp.zeros((3, 7))
        V = V.at[0, 1].set(0.0).at[1, 1].set(1.0).at[2, 1].set(100.0)
        valid = jnp.array([True, True, False])
        # point near the far (invalid) vertex must not be "inside"
        x = jnp.zeros(7).at[1].set(50.0)
        assert not bool(contains(V, x, valid))
        proj = project_onto_hull(V, x, valid)
        assert float(proj.lam[2]) < 1e-4

    def test_terminal_set_manager(self, rng):
        ss = make_safe_set(rng)
        mgr = TerminalSetManager(n_vertices=6)
        res = mgr.get_terminal_set(ss, ss.states[3])
        assert res.states.shape == (6, 7)
        assert bool(res.valid.any())


class TestQFunction:
    def test_idw_exact_at_stored_state(self, rng):
        ss = make_safe_set(rng)
        q = idw_q(ss, ss.states[7], K=5)
        np.testing.assert_allclose(float(q), float(ss.q_values[7]), rtol=0.05)

    def test_local_linear_close_to_idw(self, rng):
        ss = make_safe_set(rng)
        x = ss.states[7] + 0.05
        qa = idw_q(ss, x, K=10)
        qb = local_linear_q(ss, x, K=10)
        assert abs(float(qa) - float(qb)) < 5.0

    def test_gp_q_function(self, rng):
        ss = make_safe_set(rng)
        gpq = GPQFunction.fit(jax.random.PRNGKey(0), ss, n_inducing=24)
        v, s = gpq.value_and_std(ss.states[10])
        assert abs(float(v) - float(ss.q_values[10])) < 3.0
        assert float(s) >= 0

    def test_iteration_monotonicity_structure(self, rng):
        """Later iterations (with better trajectories available) can only
        lower the interpolated Q."""
        ss = SafeSet.create(128, 7)
        T = 15
        for it, scale in enumerate([3.0, 2.0, 1.0]):  # improving costs
            X = np.zeros((T, 7), np.float32)
            X[:, 0] = 2.0
            X[:, 1] = np.linspace(10, 0, T)
            costs = scale * np.linspace(1.0, 0.1, T).astype(np.float32)
            ss = ss.add_trajectory(jnp.asarray(X), jnp.zeros((T, 3)), jnp.asarray(costs))
        x = ss.states[5]
        qs = iteration_q_values(ss, x, 3, K=5)
        assert float(qs[2]) <= float(qs[0]) + 1e-4


class TestStreamingSafeSet:
    def test_stream_and_flush(self):
        from gpmpc_tpu.terminal import StreamingSafeSet

        ss = SafeSet.create(128, 7)
        stream = StreamingSafeSet.create(ss, buffer_size=8)
        for i in range(5):
            stream = stream.add(jnp.full(7, float(i)), jnp.zeros(3), jnp.asarray(1.0))
        assert int(stream.safe_set.count) == 0  # not flushed yet
        stream = stream.flush()
        assert int(stream.safe_set.count) == 8  # padded pseudo-trajectory
        assert int(stream.buf_count) == 0

    def test_auto_flush_on_full(self):
        from gpmpc_tpu.terminal import StreamingSafeSet

        stream = StreamingSafeSet.create(SafeSet.create(64, 7), buffer_size=4)
        for i in range(4):
            stream = stream.add(jnp.full(7, float(i)), jnp.zeros(3), jnp.asarray(1.0))
        assert int(stream.safe_set.count) == 4


class TestTrimBucket:
    """Frozen-set KNN bucketing (terminal.safe_set.trim/knn_bucket): the
    per-solve KNN may stream a power-of-two prefix instead of the full
    capacity whenever head <= bucket — results must be identical, including
    after an in-place prune leaves actives scattered below head."""

    def _grown_set(self, cap=512, n_traj=6, T=20):
        from gpmpc_tpu.terminal import SafeSet

        key = jax.random.PRNGKey(0)
        ss = SafeSet.create(cap, 7)
        for i in range(n_traj):
            key, k1, k2 = jax.random.split(key, 3)
            X = jax.random.normal(k1, (T, 7))
            # keep mass/fuel columns physical-ish
            X = X.at[:, 0].set(1.5 + 0.1 * jax.random.uniform(k2, (T,)))
            U = jnp.zeros((T, 3))
            c = jnp.abs(jax.random.normal(k2, (T,))) + 0.1
            ss = ss.add_trajectory(X, U, c)
        return ss

    def test_trim_knn_parity(self):
        from gpmpc_tpu.terminal import knn_bucket, trim
        from gpmpc_tpu.terminal.local_safe_set import knn_query

        ss = self._grown_set()
        hw = int(ss.written)
        bucket = knn_bucket(hw, ss.capacity, floor=32)
        assert hw <= bucket < ss.capacity  # the trim is a real reduction
        x = jnp.array([1.6, 0.3, -0.2, 0.1, -0.5, 0.0, 0.2])
        full = knn_query(ss, x, 8, fuel_available=jnp.asarray(0.5),
                         fallback_unfiltered=True)
        view = knn_query(trim(ss, bucket), x, 8,
                         fuel_available=jnp.asarray(0.5),
                         fallback_unfiltered=True)
        np.testing.assert_array_equal(full.indices, view.indices)
        np.testing.assert_allclose(full.distances, view.distances)
        np.testing.assert_array_equal(full.valid, view.valid)
        np.testing.assert_allclose(full.q_values, view.q_values)

    def test_trim_knn_parity_after_prune(self):
        """Pruning scatters actives in place (head unchanged) — the bucket
        bound is head, and the trimmed query must still match."""
        from gpmpc_tpu.terminal import knn_bucket, prune, trim
        from gpmpc_tpu.terminal.local_safe_set import knn_query

        ss = prune(self._grown_set(), keep=40, strategy="diversity")
        hw = int(ss.written)
        assert int(ss.count) < hw  # actives scattered strictly below written
        bucket = knn_bucket(hw, ss.capacity, floor=32)
        x = jnp.zeros(7).at[0].set(1.6)
        full = knn_query(ss, x, 8)
        view = knn_query(trim(ss, bucket), x, 8)
        np.testing.assert_array_equal(full.indices, view.indices)
        np.testing.assert_array_equal(full.valid, view.valid)

    def test_bucket_monotone_and_bounded(self):
        from gpmpc_tpu.terminal import knn_bucket

        caps = 1 << 21
        prev = 0
        for hw in (0, 1, 4095, 4096, 4097, 65536, 2**20 + 1, 2**22):
            b = knn_bucket(hw, caps)
            assert b >= min(hw, caps) and b <= caps
            assert b >= prev or hw <= prev  # monotone in head
            prev = b

    def test_bucket_degenerates_after_ring_wrap(self):
        """Once the ring wraps, live rows scatter across the whole array —
        written saturates past capacity and the bucket MUST become the full
        capacity (a prefix view would hide live rows; this was a real bug:
        head wraps mod capacity, so a head-based bound was a tautology)."""
        from gpmpc_tpu.terminal import SafeSet, knn_bucket, trim
        from gpmpc_tpu.terminal.local_safe_set import knn_query

        ss = SafeSet.create(64, 7)
        key = jax.random.PRNGKey(1)
        for i in range(5):  # 5 x 20 = 100 writes > 64 capacity: wraps
            key, k = jax.random.split(key)
            X = jax.random.normal(k, (20, 7)).at[:, 0].set(1.5)
            ss = ss.add_trajectory(X, jnp.zeros((20, 3)),
                                   jnp.abs(jax.random.normal(k, (20,))))
        assert int(ss.written) > ss.capacity  # saturated past capacity
        assert int(ss.head) < ss.capacity     # ...while head has wrapped
        bucket = knn_bucket(int(ss.written), ss.capacity, floor=16)
        assert bucket == ss.capacity          # full view, no trim
        x = jnp.zeros(7).at[0].set(1.5)
        full = knn_query(ss, x, 8)
        view = knn_query(trim(ss, bucket), x, 8)
        np.testing.assert_array_equal(full.indices, view.indices)
