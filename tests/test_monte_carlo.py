"""Monte-Carlo campaign tests: IC sampling, outcome classification, frozen
lanes, campaign statistics, Wilson CI, controller comparison."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpmpc_tpu.dynamics import Rocket3DoFParams, rocket3dof as r3
from gpmpc_tpu.experiments import (
    CRASH,
    FUEL_EXHAUSTED,
    SUCCESS,
    TIMEOUT,
    LandingCriteria,
    SimulationConfig,
    campaign_statistics,
    classify_touchdown,
    compare_controllers,
    run_campaign,
    sample_initial_conditions,
    summarize,
    wilson_interval,
)
from gpmpc_tpu.mpc import RTIConfig, make_rti_controller


def make_hover_descent_controller(params):
    """Simple proportional descent law used as a cheap test controller."""

    def cinit(x0):
        return jnp.zeros(0)  # stateless

    def cstep(cstate, x, k):
        v_ref = -0.8 * jnp.sqrt(jnp.maximum(x[1], 0.0))
        u = r3.hover_thrust(params, x) + jnp.array([2.0, 0.0, 0.0]) * (v_ref - x[4])
        u = u.at[1].add(-1.0 * x[5] - 0.5 * x[2])
        u = u.at[2].add(-1.0 * x[6] - 0.5 * x[3])
        return r3.clamp_thrust(params.replace(T_min=0.0, T_max=5.0), u), cstate

    return cinit, cstep


class TestSampling:
    def test_ic_shapes_and_physics(self):
        cfg = SimulationConfig()
        x0s = sample_initial_conditions(jax.random.PRNGKey(0), cfg, 256)
        assert x0s.shape == (256, 7)
        assert float(x0s[:, 0].min()) > cfg.m_dry  # mass above dry
        assert float(x0s[:, 1].min()) >= 1.0  # altitude positive
        assert abs(float(x0s[:, 4].mean()) - cfg.vertical_velocity_mean) < 0.2

    def test_ic_14state(self):
        cfg = SimulationConfig()
        x0s = sample_initial_conditions(jax.random.PRNGKey(0), cfg, 16, n_x=14)
        assert x0s.shape == (16, 14)
        np.testing.assert_allclose(x0s[:, 7], 1.0)  # identity quaternion


class TestClassification:
    def test_classify_touchdown(self):
        crit = LandingCriteria()
        soft = jnp.array([1.5, 0.05, 0.1, 0.1, -0.5, 0.0, 0.0])
        hard = jnp.array([1.5, 0.05, 0.1, 0.1, -5.0, 0.0, 0.0])
        off = jnp.array([1.5, 0.05, 3.0, 0.1, -0.5, 0.0, 0.0])
        assert int(classify_touchdown(soft, crit)) == SUCCESS
        assert int(classify_touchdown(hard, crit)) == CRASH
        assert int(classify_touchdown(off, crit)) == CRASH

    def test_wilson_interval(self):
        lo, hi = wilson_interval(jnp.asarray(90.0), jnp.asarray(100.0))
        assert 0.8 < float(lo) < 0.9 < float(hi) < 0.96


class TestCampaign:
    def test_hover_descent_campaign(self):
        p = Rocket3DoFParams()
        sim = SimulationConfig(max_steps=300, altitude_mean=20.0, altitude_std=1.0)
        x0s = sample_initial_conditions(jax.random.PRNGKey(1), sim, 32)
        cinit, cstep = make_hover_descent_controller(p)
        plant = lambda x, u: r3.step(p, x, u, sim.dt)
        res = jax.jit(
            lambda xs: run_campaign(cinit, cstep, plant, xs, sim)
        )(x0s)
        stats = campaign_statistics(res)
        assert float(stats["success_rate"]) > 0.8, summarize(stats)
        # successful runs used fuel
        assert float(stats["fuel_used_mean"]) > 0.05

    def test_fuel_exhaustion_detected(self):
        p = Rocket3DoFParams()
        sim = SimulationConfig(max_steps=120)
        # barely any fuel: m = m_dry + 0.02, high altitude
        x0 = jnp.array([1.02, 50.0, 0.0, 0.0, -3.0, 0.0, 0.0])
        cinit, cstep = make_hover_descent_controller(p)
        plant = lambda x, u: r3.step(p, x, u, sim.dt)
        res = run_campaign(cinit, cstep, plant, x0[None], sim)
        assert int(res["outcome"][0]) == FUEL_EXHAUSTED

    def test_timeout_detected(self):
        p = Rocket3DoFParams()
        sim = SimulationConfig(max_steps=5)
        x0 = jnp.array([2.0, 30.0, 0.0, 0.0, -3.0, 0.0, 0.0])
        cinit, cstep = make_hover_descent_controller(p)
        plant = lambda x, u: r3.step(p, x, u, sim.dt)
        res = run_campaign(cinit, cstep, plant, x0[None], sim)
        assert int(res["outcome"][0]) == TIMEOUT

    def test_frozen_lane_preserves_final_state(self):
        """After touchdown the lane must freeze — final state is the touchdown
        state even though other lanes keep running."""
        p = Rocket3DoFParams()
        sim = SimulationConfig(max_steps=400)
        x0s = jnp.stack([
            jnp.array([2.0, 5.0, 0.0, 0.0, -1.0, 0.0, 0.0]),   # lands fast
            jnp.array([2.0, 40.0, 0.0, 0.0, -3.0, 0.0, 0.0]),  # lands late
        ])
        cinit, cstep = make_hover_descent_controller(p)
        plant = lambda x, u: r3.step(p, x, u, sim.dt)
        res = run_campaign(cinit, cstep, plant, x0s, sim)
        assert int(res["steps"][0]) < int(res["steps"][1])
        assert float(res["x_final"][0, 1]) <= 0.1 + 1e-5

    @pytest.mark.slow
    def test_rti_campaign(self):
        p = Rocket3DoFParams()
        cfg = RTIConfig()
        sim = SimulationConfig(max_steps=120, altitude_mean=25.0, altitude_std=1.5)
        x0s = sample_initial_conditions(jax.random.PRNGKey(2), sim, 8)
        xT = jnp.zeros(7).at[0].set(2.0)
        F = lambda x, u: r3.step(p, x, u, cfg.dt)
        from gpmpc_tpu.reference import cubic_descent_reference
        ref_fn = lambda x0: cubic_descent_reference(x0, xT, 90, cfg.dt)
        cinit, cstep = make_rti_controller(F, cfg, xT, reference_fn=ref_fn, ref_horizon=110)
        res = jax.jit(lambda xs: run_campaign(cinit, cstep, F, xs, sim))(x0s)
        stats = campaign_statistics(res)
        assert float(stats["success_rate"]) >= 0.75, summarize(stats)

    def test_compare_controllers_shared_ics(self):
        p = Rocket3DoFParams()
        sim = SimulationConfig(max_steps=250, altitude_mean=15.0, altitude_std=0.5)
        x0s = sample_initial_conditions(jax.random.PRNGKey(3), sim, 8)
        plant = lambda x, u: r3.step(p, x, u, sim.dt)
        good = make_hover_descent_controller(p)
        bad = (good[0], lambda c, x, k: (jnp.zeros(3), c))  # free fall
        out = compare_controllers({"descent": good, "freefall": bad}, plant, x0s, sim)
        assert float(out["descent"]["success_rate"]) > float(out["freefall"]["success_rate"])
        assert float(out["freefall"]["success_rate"]) == 0.0
