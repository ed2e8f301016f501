"""LMPC tests: single solve with hull terminal constraint, episode runner
with safe-set growth, and the headline property — iterative cost improvement
(Q^{j+1} ≤ Q^j, SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpmpc_tpu.dynamics import Rocket3DoFParams, rocket3dof as r3
from gpmpc_tpu.lmpc import (
    LMPCConfig, default_stage_cost, lmpc_init, lmpc_solve, run_episode)
from gpmpc_tpu.terminal import SafeSet

DT = 0.1


@pytest.fixture(scope="module")
def seeded():
    """Safe set seeded with one feasible (suboptimal) landing trajectory —
    the LMPC bootstrap (reference seeds from SCVX/PD rollouts)."""
    p = Rocket3DoFParams()
    step = lambda x, u: r3.step(p, x, u, DT)
    xT = jnp.zeros(7).at[0].set(2.0)
    # defaults = the recommended growth config (IPM + touchdown shaping
    # priced into stored cost-to-go; see LMPCConfig docs). The shaping
    # hinge is zero along this seed (~0.7-1.0 m/s < free speed), so seed
    # costs equal the plain quadratic.
    cfg = LMPCConfig()

    # simple descent-law rollout as the seed trajectory
    x = jnp.array([2.0, 20.0, 0.5, 0.0, -2.0, 0.0, 0.0])
    xs, us, cs = [], [], []
    for _ in range(200):
        v_ref = -0.7 * jnp.sqrt(jnp.maximum(x[1], 0.0))
        u = r3.hover_thrust(p, x) + jnp.array([2.0 * (v_ref - x[4]), -1.0 * x[5] - 0.4 * x[2], -1.0 * x[6] - 0.4 * x[3]])
        u = r3.clamp_thrust(p.replace(T_min=0.3, T_max=5.0), u)
        xs.append(x)
        us.append(u)
        cs.append(default_stage_cost(x, u, xT, cfg))
        x = step(x, u)
        if float(x[1]) < 0.05:
            break
    X = jnp.stack(xs)
    U = jnp.stack(us)
    C = jnp.stack(cs)
    ss = SafeSet.create(1024, 7)
    ss = ss.add_trajectory(X, U, C)
    return p, step, xT, cfg, ss, (X, U, C)


class TestLMPCSolve:
    @pytest.mark.slow  # demoted from the default tier (r5: <300 s budget)
    def test_single_solve(self, seeded):
        """ADMM arm pinned: warm anchored solves are where the ADMM is
        certified (the IPM default has its own tests below)."""
        p, step, xT, cfg, ss, (X, U, C) = seeded
        cfg = cfg.replace(solver="admm")
        x0 = X[0]
        st = lmpc_init(cfg, x0, xT)
        # anchor the warm-start trajectory near the seed so the terminal
        # query finds vertices
        st = st.replace(X_lin=X[: cfg.N + 1], U_lin=U[: cfg.N])
        sol, st2 = lmpc_solve(step, cfg, ss, st, x0)
        assert bool(sol.success)
        # λ on the simplex
        np.testing.assert_allclose(float(sol.lam.sum()), 1.0, atol=5e-2)
        assert float(sol.lam.min()) >= -1e-3
        # terminal state close to the hull of stored states (small slack)
        assert float(sol.slack_norm) < 0.5
        # thrust bounds hold
        assert float(sol.U_opt[:, 0].min()) >= cfg.u_min[0] - 1e-3

    @pytest.mark.slow  # demoted from the default tier (r5: <300 s budget)
    def test_vertex_memory_carries_and_retains(self, seeded):
        """vertex_memory semantics: (a) the solve records its terminal
        vertices in the state; (b) on the next solve a HELD low-Q vertex
        stays in the candidate set even when it is no longer among the K
        nearest (the non-contracting-terminal-set property that V(x0)
        monotonicity needs — see LMPCConfig.vertex_memory)."""
        p, step, xT, cfg, ss, (X, U, C) = seeded
        cfg = cfg.replace(vertex_memory=True, candidate_pool=20,
                          candidate_dist_weight=0.0)
        x0 = X[0]
        st = lmpc_init(cfg, x0, xT)
        st = st.replace(X_lin=X[: cfg.N + 1], U_lin=U[: cfg.N])
        sol, st2 = lmpc_solve(step, cfg, ss, st, x0)
        assert bool(sol.success)
        held = np.asarray(st2.prev_vertices)
        assert (held >= 0).any()  # vertices recorded

        # bury the neighborhood in fresh HIGH-Q near-duplicate states so the
        # plain nearest-pool is dominated by them; the held low-Q vertices
        # must survive through the memory path
        xq = ss.states[int(held[held >= 0][0])]
        Xd = jnp.tile(xq[None], (40, 1)) + 1e-3 * jax.random.normal(
            jax.random.PRNGKey(0), (40, 7))
        ss_noisy = ss.add_trajectory(
            Xd, jnp.zeros((40, 3)), jnp.full(40, 1e5))
        sol2, st3 = lmpc_solve(step, cfg, ss_noisy, st2, x0)
        kept = np.asarray(st3.prev_vertices)
        # the low-Q held vertices beat the high-Q flood on the q-score
        assert bool(np.intersect1d(held[held >= 0], kept[kept >= 0]).size > 0)

    def test_condensed_matches_sparse(self, seeded):
        """The condensed z=[U;λ;s] form solves the same QP as the sparse
        z=[X;U;λ;s] form — u0/λ/terminal-Q parity on a warm solve (both
        polished; differences are f32 iteration-path noise). ADMM pinned:
        the sparse form is ADMM-only."""
        p, step, xT, cfg, ss, (X, U, C) = seeded
        cfg = cfg.replace(solver="admm")
        x0 = X[0]
        st = lmpc_init(cfg, x0, xT).replace(
            X_lin=X[: cfg.N + 1], U_lin=U[: cfg.N])
        sol_c, _ = jax.jit(
            lambda s, x: lmpc_solve(step, cfg.replace(condensed=True), ss, s, x)
        )(st, x0)
        sol_s, _ = jax.jit(
            lambda s, x: lmpc_solve(step, cfg.replace(condensed=False), ss, s, x)
        )(st, x0)
        assert bool(sol_c.success) and bool(sol_s.success)
        np.testing.assert_allclose(
            np.asarray(sol_c.u0), np.asarray(sol_s.u0), atol=5e-3)
        np.testing.assert_allclose(
            np.asarray(sol_c.lam), np.asarray(sol_s.lam), atol=5e-2)
        np.testing.assert_allclose(
            float(sol_c.terminal_q), float(sol_s.terminal_q),
            rtol=1e-3, atol=1e-2)

    def test_episode_adds_to_safe_set_on_success(self, seeded):
        p, step, xT, cfg, ss, (X, U, C) = seeded
        n_before = int(ss.n_trajectories)
        out, ss2 = jax.jit(
            lambda s, x: run_episode(step, cfg, s, x, xT, 180)
        )(ss, X[0])
        assert bool(out["landed"]), out
        assert int(ss2.n_trajectories) == n_before + int(bool(out["success"]))

    @pytest.mark.slow
    def test_fleet_iterations(self, seeded):
        """A fleet of lanes flies vmapped episodes against the frozen safe
        set; successful trajectories merge between rounds and the set grows
        by the number of successes (the scenario-parallel LMPC the
        reference's sequential episode loop cannot express)."""
        from gpmpc_tpu.lmpc import run_fleet_iterations

        p, step, xT, cfg, ss, (X, U, C) = seeded
        x0s = jnp.stack([
            X[0],
            X[0].at[1].add(1.0),
            X[0].at[2].add(-0.3),
            X[0].at[4].add(0.3),
        ])
        n_before = int(ss.n_trajectories)
        summaries, ss2 = run_fleet_iterations(
            step, cfg, ss, x0s, xT, n_rounds=2, max_steps=180
        )
        # round 1 (vs the seed-only set) lands everything inside the gate
        assert summaries[0]["success_rate"] == 1.0, summaries
        # round 2 flies a set enriched by 4 near-identical fast
        # trajectories: in this NARROW regime (4 lanes, tight dispersion)
        # some lanes ride the 2 m/s soft-landing gate — the gate then
        # rejects them from the set (by design; the dispersed 16-lane fleet
        # at the default shaping holds 100% over 6 rounds — see
        # scripts/run_fleet_lmpc_tpu.py). Assert the gate floor, that every
        # lane still LANDS (cost-bounded, no ballistic lanes), and that the
        # set grows by exactly the gate-passing count.
        assert summaries[1]["success_rate"] >= 0.25, summaries
        assert all(s["steps_mean"] < 120 for s in summaries), summaries
        seed_cost = float(jnp.sum(C))
        assert all(
            s["total_cost_mean"] < seed_cost for s in summaries), (
            summaries, seed_cost)
        grew = round(4 * (summaries[0]["success_rate"]
                          + summaries[1]["success_rate"]))
        assert int(ss2.n_trajectories) == n_before + grew
        # solve quality must not degrade as the set grows (rates are
        # live-step-only and noisy at 4 lanes: floor + non-degradation band)
        assert summaries[1]["qp_success_rate"] >= 0.5, summaries
        assert (
            summaries[1]["qp_success_rate"]
            >= summaries[0]["qp_success_rate"] - 0.05
        ), summaries

    @pytest.mark.slow

    def test_plan_value_monotone_as_set_grows(self, seeded):
        """Fleet-scale improvement, measured on the RIGHT quantity: the
        controller's value estimate V(x0) = planned stage cost + terminal Q
        at the fixed seed IC is non-increasing (within 1% solver noise) as
        the fleet's trajectories join the safe set — the Rosolia-Borrelli
        iteration-cost property (reference lmpc.py:10-13). The REALIZED
        episode cost is step-quantized (landing 2 steps later to touch down
        softer reads as a 5-10% bump) and is deliberately not the metric —
        see lmpc_plan_value."""
        from gpmpc_tpu.lmpc import lmpc_plan_value, run_fleet_iterations

        p, step, xT, cfg, ss, (X, U, C) = seeded
        x0 = X[0]
        x0s = jnp.stack([
            x0,
            x0.at[1].add(1.0),
            x0.at[2].add(-0.3),
            x0.at[4].add(0.3),
        ])
        values = []
        pv = jax.jit(lambda s: lmpc_plan_value(step, cfg, s, x0, xT, settle=8))
        for _ in range(3):
            V, ok, _ = pv(ss)
            assert bool(ok)
            values.append(float(V))
            _, ss = run_fleet_iterations(
                step, cfg, ss, x0s, xT, n_rounds=1, max_steps=180
            )
        V_final, _, _ = pv(ss)
        values.append(float(V_final))
        # 2% band: the RTI settle leaves O(1%) linearization noise on V
        assert all(b <= a * 1.02 for a, b in zip(values, values[1:])), values
        # and the set genuinely taught the controller something
        assert values[-1] < 0.95 * values[0], values

    def test_ipm_solver_single_solve(self, seeded):
        """solver='ipm' solves the same hull QP: success, λ on the simplex,
        hull slack small, thrust bounds respected."""
        p, step, xT, cfg, ss, (X, U, C) = seeded
        cfg_i = cfg.replace(solver="ipm")
        x0 = X[0]
        st = lmpc_init(cfg_i, x0, xT).replace(
            X_lin=X[: cfg.N + 1], U_lin=U[: cfg.N])
        sol, _ = jax.jit(
            lambda s, x: lmpc_solve(step, cfg_i, ss, s, x))(st, x0)
        assert bool(sol.success), (
            float(sol.qp_pri_res), int(sol.qp_status))
        np.testing.assert_allclose(float(sol.lam.sum()), 1.0, atol=1e-3)
        assert float(sol.lam.min()) >= -1e-4
        assert float(sol.slack_norm) < 0.5
        assert float(sol.U_opt[:, 0].min()) >= cfg.u_min[0] - 1e-3

    def test_touchdown_speed_shaping_gates_on_altitude(self, seeded):
        """The touchdown-speed shaping term is (a) removable, (b) active
        only below the gate altitude, and (c) priced by excess velocity — so
        fast near-ground states carry expensive Q-values into the safe set
        while the QP stage cost (which never sees it) stays
        thrust-feasible."""
        p, step, xT, cfg, ss, (X, U, C) = seeded
        cfg = cfg.replace(touchdown_speed_weight=0.0)
        u = r3.hover_thrust(p, X[0])
        fast_low = jnp.array([2.0, 0.5, 0.0, 0.0, -4.0, 0.0, 0.0])
        fast_high = fast_low.at[1].set(20.0)
        slow_low = fast_low.at[4].set(-0.5)

        # weight 0: shaping off → identical to the plain quadratic
        base = fast_low - xT
        plain = base @ cfg.Q @ base + u @ cfg.R @ u
        np.testing.assert_allclose(
            float(default_stage_cost(fast_low, u, xT, cfg)), float(plain),
            rtol=1e-6)

        cfg_s = cfg.replace(touchdown_speed_weight=100.0)
        c_fast_low = float(default_stage_cost(fast_low, u, xT, cfg_s))
        c_fast_high = float(default_stage_cost(fast_high, u, xT, cfg_s))
        c_slow_low = float(default_stage_cost(slow_low, u, xT, cfg_s))
        # gate: a fast descent near the ground is penalized hard...
        assert c_fast_low > float(plain) + 100.0
        # ...but the same speed at altitude is (almost) not
        e_high = fast_high - xT
        plain_high = float(e_high @ cfg.Q @ e_high + u @ cfg.R @ u)
        assert c_fast_high < plain_high + 1e-3
        # and a sub-free-speed near-ground descent pays NO shaping at all
        # (the hinge keeps the seed trajectory's Q-values undistorted)
        e_slow = slow_low - xT
        plain_slow = float(e_slow @ cfg.Q @ e_slow + u @ cfg.R @ u)
        np.testing.assert_allclose(c_slow_low, plain_slow, rtol=1e-6)

    @pytest.mark.slow
    def test_ipm_episode_matches_admm_quality(self, seeded):
        """A closed-loop LMPC episode flown on the IPM lands with a total
        cost no worse than the 800-iteration ADMM episode (the IPM measured
        a strictly better per-solve objective at 1e-6 feasibility — see
        ops/qp/ipm.py)."""
        from gpmpc_tpu.lmpc import fly_episode

        p, step, xT, cfg, ss, (X, U, C) = seeded
        out_a = jax.jit(
            lambda s, x: fly_episode(
                step, cfg.replace(solver="admm"), s, x, xT, 180))(ss, X[0])
        out_i = jax.jit(
            lambda s, x: fly_episode(
                step, cfg.replace(solver="ipm"), s, x, xT, 180))(ss, X[0])
        assert bool(out_i["landed"]) and bool(out_i["success"])
        assert float(out_i["total_cost"]) <= float(out_a["total_cost"]) * 1.05
        assert float(out_i["qp_success_rate"]) >= 0.5

    @pytest.mark.slow
    def test_iterative_improvement(self, seeded):
        """The LMPC improvement property, stated honestly for a NONLINEAR
        plant with a hull-relaxed sampled safe set: every episode's realized
        performance (plain quadratic cost — the metric the reference reports)
        beats the seed by a wide margin and stays flat across iterations.
        Strict per-iteration monotonicity of the optimized cost is a
        linear-system theorem; measured here every solver/shaping combination
        wobbles a few percent (the old ADMM chain swung +13%/−18% between
        episodes and 'passed' on the endpoint draw)."""
        p, step, xT, cfg, ss, (X, U, C) = seeded
        plain_of = jax.jit(jax.vmap(
            lambda x, u: (x - xT) @ cfg.Q @ (x - xT) + u @ cfg.R @ u))
        seed_plain = float(jnp.sum(plain_of(X, U)))
        plains = []
        run = jax.jit(lambda s, x: run_episode(step, cfg, s, x, xT, 180))
        for it in range(3):
            out, ss = run(ss, X[0])
            assert bool(out["landed"])
            live = out["costs"] > 0
            plains.append(float(jnp.sum(jnp.where(
                live, plain_of(out["X"][:-1], out["U"]), 0.0))))
        # every LMPC episode beats the naive seed on realized plain cost...
        assert all(c < seed_plain * 0.9 for c in plains), (plains, seed_plain)
        # ...and performance is stable across iterations (no drift blowup)
        assert plains[-1] <= plains[0] * 1.10, plains


@pytest.fixture(scope="module")
def seeded6():
    """6-DoF safe set seeded with one RTI-flown landing — the quaternion
    LMPC bootstrap (the reference's LMPC is formulated on the 6-DoF model,
    lmpc.py:417-470; here the model-generic lmpc_solve is instantiated at
    n_x=14 via lmpc_config_6dof)."""
    from gpmpc_tpu.dynamics import Rocket6DoFParams, rocket6dof as r6
    from gpmpc_tpu.lmpc import lmpc_config_6dof
    from gpmpc_tpu.mpc import rti_config_6dof
    from gpmpc_tpu.mpc.rti import rti_closed_loop
    from gpmpc_tpu.ops.qp import ADMMConfig
    from gpmpc_tpu.reference import cubic_descent_reference, pad_reference

    p = Rocket6DoFParams()
    step = lambda x, u: r6.step(p, x, u, DT)
    xT = r6.create_initial_state(p, altitude=0.0)
    cfg = lmpc_config_6dof(p)

    rcfg = rti_config_6dof(
        p, N=15,
        admm=ADMMConfig(max_iter=100, polish=False, adaptive_rho=False,
                        scaling=3),
    ).replace(accept_pri_tol=1e-2, condensed=True)
    x0 = r6.create_initial_state(
        p, altitude=12.0, horizontal=(0.5, -0.3), velocity=(-1.5, 0.05, 0.0))
    steps = 140
    ref = pad_reference(
        cubic_descent_reference(x0, xT, 100, DT), steps + rcfg.N + 1)
    res = rti_closed_loop(step, rcfg, x0, xT, steps, X_ref_full=ref)
    assert bool(res["landed"]), "seed flight must land"
    n_live = int(res["steps"])
    X = res["X"][:n_live]
    U = res["U"][:n_live]
    from gpmpc_tpu.lmpc import default_stage_cost

    C = jax.vmap(lambda x, u: default_stage_cost(x, u, xT, cfg))(X, U)
    ss = SafeSet.create(2048, 14)
    ss = ss.add_trajectory(X, U, C)
    return p, step, xT, cfg, ss, (X, U, C)


class TestLMPC6DoF:
    def test_config_factory(self, seeded6):
        p, step, xT, cfg, ss, _ = seeded6
        assert cfg.n_x == 14 and cfg.Q.shape == (14, 14)
        assert ss.states.shape[1] == 14

    def test_single_solve_14dim_hull(self, seeded6):
        """One quaternion-state LMPC solve: λ on the simplex over 14-dim
        stored vertices, small hull slack, thrust box held."""
        from gpmpc_tpu.lmpc import lmpc_init, lmpc_solve

        p, step, xT, cfg, ss, (X, U, C) = seeded6
        x0 = X[0]
        st = lmpc_init(cfg, x0, xT)
        st = st.replace(X_lin=X[: cfg.N + 1], U_lin=U[: cfg.N])
        sol, st2 = jax.jit(
            lambda s, st_, x: lmpc_solve(step, cfg, s, st_, x)
        )(ss, st, x0)
        assert bool(sol.success), (int(sol.qp_status), float(sol.qp_pri_res))
        np.testing.assert_allclose(float(sol.lam.sum()), 1.0, atol=5e-2)
        assert float(sol.lam.min()) >= -1e-3
        assert float(sol.slack_norm) < 0.5
        assert float(sol.U_opt[:, 0].min()) >= cfg.u_min[0] - 1e-3
        # the planned terminal attitude stays a near-unit quaternion (the
        # λ-interpolation defect the renormalizing step must absorb)
        qn = float(jnp.linalg.norm(sol.X_opt[-1, 7:11]))
        assert 0.9 < qn < 1.1, qn

    @pytest.mark.slow
    def test_episode_lands_and_grows_set(self, seeded6):
        """Closed-loop 6-DoF LMPC episode: lands softly against the frozen
        seed set and its trajectory joins the safe set."""
        from gpmpc_tpu.lmpc import run_episode

        p, step, xT, cfg, ss, (X, U, C) = seeded6
        n_before = int(ss.count)
        out, ss2 = jax.jit(
            lambda s, x: run_episode(step, cfg, s, x, xT, 160)
        )(ss, X[0])
        assert bool(out["landed"]) and bool(out["success"])
        assert float(jnp.linalg.norm(out["x_final"][4:7])) < 2.0
        assert int(ss2.count) > n_before
        assert float(out["qp_success_rate"]) >= 0.5
