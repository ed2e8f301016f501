"""Online learning inside the control loop (learning/online_gp_mpc.py).

Covers the reference's in-loop update semantics (online_update.py:14-16,
53-56; online_learner.py:193-196) at campaign composition: per-cycle
novelty-gated observes, cadenced recency-Z refits, the activation gate, and
the headline property — per-lane model error FALLS during the campaign while
the fleet still lands.
"""

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
from gpmpc_tpu.learning import (
    OnlineGPMPCConfig,
    make_online_gp_mpc_controller,
    online_controller_info,
)
from gpmpc_tpu.mpc import GPMPCConfig, RTIConfig
from gpmpc_tpu.ops.qp import ADMMConfig
from gpmpc_tpu.reference import cubic_descent_reference

STEPS = 130


def _setup(n_lanes=6, **ocfg_kw):
    p = Rocket3DoFParams()
    dt = 0.1
    F = lambda x, u: r3.step(p, x, u, dt)
    # dispersed plant: drag + steady wind the nominal model doesn't know
    p_true = p.replace(rho=1.0, C_D=1.0, A_ref=0.1)
    wind = jnp.zeros(7).at[5].set(0.4).at[6].set(0.25)
    plant = lambda x, u: r3.step(p_true, x, u, dt) + dt * wind
    xT = jnp.zeros(7).at[0].set(2.0)
    base = RTIConfig(
        N=20, accept_pri_tol=1e-2, condensed=True,
        admm=ADMMConfig(max_iter=100, check_interval=50, polish=False,
                        adaptive_rho=False, scaling=3, use_pallas="off",
                        infeas_certs=False),
    )
    mcfg = GPMPCConfig(base=base, scp_iterations=1, tighten=True,
                       rollout_gp_tape=True)
    cfg = OnlineGPMPCConfig(mpc=mcfg, **ocfg_kw)
    ref_fn = lambda x0: cubic_descent_reference(x0, xT, 100, dt)
    cinit, cstep = make_online_gp_mpc_controller(F, cfg, xT, ref_fn, STEPS, STEPS)
    sim = SimulationConfig(max_steps=STEPS, altitude_mean=30.0, altitude_std=2.0)
    x0s = sample_initial_conditions(jax.random.PRNGKey(0), sim, n_lanes)
    return cinit, cstep, plant, sim, x0s


@pytest.fixture(scope="module")
def campaign_result():
    cinit, cstep, plant, sim, x0s = _setup()
    res = jax.jit(
        lambda xs: run_campaign(cinit, cstep, plant, xs, sim,
                                cstate_info=online_controller_info)
    )(x0s)
    return jax.device_get(res)


def test_error_falls_during_campaign(campaign_result):
    """The headline property: the GP starts EMPTY and per-lane one-step model
    error falls by an order of magnitude while the campaign flies."""
    eh = np.asarray(campaign_result["err_hist"])
    early = np.nanmean(eh[:, 2:12])   # pre-activation: nominal-model error
    late = np.nanmean(eh[:, 60:110])  # after in-loop learning
    assert np.isfinite(early) and np.isfinite(late)
    assert late < 0.25 * early, (early, late)


def test_error_falls_per_lane(campaign_result):
    """Every single lane improves — not just the fleet mean."""
    eh = np.asarray(campaign_result["err_hist"])
    early = np.nanmean(eh[:, 2:12], axis=1)
    late = np.nanmean(eh[:, 60:110], axis=1)
    ok = np.isfinite(early) & np.isfinite(late)
    assert ok.all()
    assert (late < 0.5 * early).all(), np.stack([early, late])


def test_fleet_lands(campaign_result):
    stats = campaign_statistics(
        {k: jnp.asarray(v) for k, v in campaign_result.items()
         if k in ("outcome", "fuel_used", "landing_speed", "landing_error",
                  "steps")}
    )
    assert float(stats["success_rate"]) == 1.0
    assert float(stats["landing_speed_mean"]) < 1.0


def test_observes_and_refits_happen(campaign_result):
    pts = np.asarray(campaign_result["gp_points"])
    refits = np.asarray(campaign_result["n_refits"])
    acc = np.asarray(campaign_result["n_accepted"])
    assert (pts >= 30).all()          # buffer actually filled
    assert (refits >= 5).all()        # cadence fired
    assert (acc == pts).all()         # capacity not exceeded here


@pytest.mark.slow  # demoted from the default tier (r5: <300 s budget)
def test_gate_closed_flies_nominal():
    """With the activation gate never opening, the controller must reduce to
    plain (GP-free) behavior — and its model error must NOT fall."""
    cinit, cstep, plant, sim, x0s = _setup(n_lanes=3, min_points=10**6)
    res = jax.device_get(
        jax.jit(
            lambda xs: run_campaign(cinit, cstep, plant, xs, sim,
                                    cstate_info=online_controller_info)
        )(x0s)
    )
    eh = np.asarray(res["err_hist"])
    early = np.nanmean(eh[:, 2:12])
    late = np.nanmean(eh[:, 60:110])
    assert late > 0.5 * early  # no learning effect on the model in use


@pytest.mark.slow  # demoted from the default tier (r5: <300 s budget)
def test_novelty_gate_rejects_duplicates():
    """Replaying an identical transition must not grow the buffer."""
    from gpmpc_tpu.learning.online_gp_mpc import _observe, init_online_gp

    p = Rocket3DoFParams()
    mcfg = GPMPCConfig(base=RTIConfig(N=5, condensed=True))
    cfg = OnlineGPMPCConfig(mpc=mcfg)
    x0 = jnp.array([2.0, 30.0, 0.0, 0.0, -3.0, 0.0, 0.0])
    xT = jnp.zeros(7).at[0].set(2.0)
    gp = init_online_gp(cfg, x0, xT, 50)
    u0 = jnp.array([2.0, 0.0, 0.0])
    r = jnp.array([0.1, 0.0, 0.0])
    gp, ok1 = _observe(gp, x0, u0, r, jnp.asarray(True), cfg.min_distance)
    gp, ok2 = _observe(gp, x0, u0, r, jnp.asarray(True), cfg.min_distance)
    assert bool(ok1) and not bool(ok2)
    assert int(gp.buffer.count) == 1


def test_recent_z_gather_matches_fifo():
    """_recent_Z returns the newest-first window, envelope rows beyond count."""
    from gpmpc_tpu.gp.structured_gp import RingBuffer
    from gpmpc_tpu.learning.online_gp_mpc import _recent_Z

    cap, d, M = 8, 2, 4
    buf = RingBuffer.create(cap, d, 1)
    for i in range(6):
        buf = buf.add(jnp.full((d,), float(i)), jnp.zeros(1))
    Z_env = jnp.full((M, d), -1.0)
    Z = np.asarray(_recent_Z(buf, Z_env))
    np.testing.assert_allclose(Z[:, 0], [5.0, 4.0, 3.0, 2.0])
    # fewer points than M: tail keeps the envelope rows
    buf2 = RingBuffer.create(cap, d, 1).add(jnp.ones(d), jnp.zeros(1))
    Z2 = np.asarray(_recent_Z(buf2, Z_env))
    np.testing.assert_allclose(Z2[0, 0], 1.0)
    np.testing.assert_allclose(Z2[1:, 0], -1.0)


@pytest.mark.slow


def test_online_learning_6dof_structured():
    """The 14-state composition: per-lane 6-output structured GP learning
    INSIDE the loop (both feature blocks observed in lockstep, recency-Z
    refits per block) — error falls during flight, fleet lands."""
    from gpmpc_tpu.dynamics import Rocket6DoFParams, rocket6dof as r6
    from gpmpc_tpu.mpc import rti_config_6dof

    p = Rocket6DoFParams()
    dt = 0.1
    F = lambda x, u: r6.step(p, x, u, dt)
    p_true = p.replace(rho=0.8, C_A=0.05 * jnp.eye(3))
    wind = jnp.zeros(14).at[5].set(0.10).at[6].set(0.06)
    plant = lambda x, u: r6.step(p_true, x, u, dt) + dt * wind
    xT = r6.create_initial_state(p, altitude=0.0)
    base = rti_config_6dof(p, N=15, dt=dt, admm=ADMMConfig(
        max_iter=100, check_interval=50, polish=False, adaptive_rho=False,
        scaling=2, use_pallas="off", infeas_certs=False,
    )).replace(accept_pri_tol=1e-2, condensed=True)
    mcfg = GPMPCConfig(base=base, scp_iterations=1, tighten=True,
                       rollout_gp_tape=True)
    cfg = OnlineGPMPCConfig(mpc=mcfg)
    steps = 140
    ref_fn = lambda x0: cubic_descent_reference(x0, xT, 100, dt)
    cinit, cstep = make_online_gp_mpc_controller(F, cfg, xT, ref_fn, steps, steps)
    sim = SimulationConfig(max_steps=steps, altitude_mean=20.0, altitude_std=2.0)
    x0s = sample_initial_conditions(jax.random.PRNGKey(0), sim, 4, n_x=14)
    res = jax.device_get(jax.jit(
        lambda xs: run_campaign(cinit, cstep, plant, xs, sim,
                                cstate_info=online_controller_info)
    )(x0s))
    eh = np.asarray(res["err_hist"])
    early = np.nanmean(eh[:, 2:12])
    late = np.nanmean(eh[:, 60:110])
    assert late < 0.5 * early, (early, late)
    assert int((np.asarray(res["outcome"]) == 0).sum()) == 4
    assert (np.asarray(res["gp_points"]) >= 30).all()
