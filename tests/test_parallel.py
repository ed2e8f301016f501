"""Multi-device tests on the 8-device virtual CPU mesh: sharded campaigns
match single-device results; safe-set gather/merge; per-host PRNG."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpmpc_tpu.dynamics import Rocket3DoFParams, rocket3dof as r3
from gpmpc_tpu.experiments import (
    SimulationConfig,
    campaign_statistics,
    run_campaign,
    sample_initial_conditions,
)
from gpmpc_tpu.parallel import (
    gather_safe_sets,
    per_host_keys,
    run_sharded_campaign,
    scenario_mesh,
)
from gpmpc_tpu.terminal import SafeSet


def descent_controller(params):
    def cinit(x0):
        return jnp.zeros(0)

    def cstep(c, x, k):
        v_ref = -0.8 * jnp.sqrt(jnp.maximum(x[1], 0.0))
        u = r3.hover_thrust(params, x) + jnp.array([2.0, 0.0, 0.0]) * (v_ref - x[4])
        u = u.at[1].add(-1.0 * x[5] - 0.5 * x[2]).at[2].add(-1.0 * x[6] - 0.5 * x[3])
        return r3.clamp_thrust(params.replace(T_min=0.0, T_max=5.0), u), c

    return cinit, cstep


class TestShardedCampaign:
    def test_matches_unsharded(self, devices8):
        p = Rocket3DoFParams()
        sim = SimulationConfig(max_steps=200, altitude_mean=15.0, altitude_std=1.0)
        x0s = sample_initial_conditions(jax.random.PRNGKey(0), sim, 32)
        cinit, cstep = descent_controller(p)
        plant = lambda x, u: r3.step(p, x, u, sim.dt)

        mesh = scenario_mesh(devices8)
        out = run_sharded_campaign(mesh, cinit, cstep, plant, x0s, sim)
        ref = campaign_statistics(
            jax.jit(lambda xs: run_campaign(cinit, cstep, plant, xs, sim))(x0s)
        )
        assert float(out["stats"]["success_rate"]) == pytest.approx(
            float(ref["success_rate"]), abs=1e-6
        )
        np.testing.assert_allclose(
            float(out["stats"]["fuel_used_mean"]), float(ref["fuel_used_mean"]),
            rtol=1e-4,
        )
        # outputs actually sharded across devices
        assert len(out["results"]["outcome"].sharding.device_set) == 8

    def test_batch_must_divide_mesh(self, devices8):
        p = Rocket3DoFParams()
        sim = SimulationConfig(max_steps=10)
        mesh = scenario_mesh(devices8)
        cinit, cstep = descent_controller(p)
        plant = lambda x, u: r3.step(p, x, u, sim.dt)
        with pytest.raises(ValueError):
            run_sharded_campaign(
                mesh, cinit, cstep, plant, jnp.zeros((12, 7)), sim
            )


class TestSafeSetGather:
    def test_merge_across_shards(self):
        sets = []
        for s in range(4):
            ss = SafeSet.create(64, 7)
            X = jnp.tile(jnp.arange(7.0), (10, 1)) + s
            ss = ss.add_trajectory(X, jnp.zeros((10, 3)),
                                   jnp.linspace(1.0 + s, 0.1, 10))
            sets.append(ss)
        merged = gather_safe_sets(sets, capacity=32)
        assert int(merged.count) == 32
        # keeps the lowest-Q states across all shards
        assert float(merged.best_cost) == min(float(s.best_cost) for s in sets)


class TestPRNG:
    def test_per_host_keys_distinct_and_deterministic(self):
        ks1 = per_host_keys(jax.random.PRNGKey(7), 4)
        ks2 = per_host_keys(jax.random.PRNGKey(7), 4)
        np.testing.assert_array_equal(np.asarray(ks1), np.asarray(ks2))
        assert len({tuple(np.asarray(k)) for k in ks1}) == 4
