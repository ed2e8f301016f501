"""MPC-layer tests: constraints, costs/LQR, RTI controller closed loop.

The RTI landing test mirrors the reference's de-facto integration test
criteria (`demo_mpc_tracking.py:182-187`): pos err <1 m, vel <2 m/s.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.linalg

from gpmpc_tpu.dynamics import Rocket3DoFParams, rocket3dof as r3
from gpmpc_tpu.mpc import (
    ConstraintParams,
    CostWeights,
    RTIConfig,
    check_all_constraints,
    compute_lqr_gain,
    normal_quantile,
    rti_closed_loop,
    rti_init,
    rti_step,
    trajectory_cost,
)
from gpmpc_tpu.ops.linalg import robust_cholesky, solve_care, solve_dare
from gpmpc_tpu.reference import cubic_descent_reference, pad_reference


class TestLinalg:
    def test_dare_matches_scipy(self, rng):
        A = jnp.array([[1.0, 0.1], [0.0, 1.0]])
        B = jnp.array([[0.005], [0.1]])
        Q = jnp.diag(jnp.array([10.0, 1.0]))
        R = jnp.eye(1) * 0.1
        P = solve_dare(A, B, Q, R)
        P_ref = scipy.linalg.solve_discrete_are(
            np.asarray(A, np.float64), np.asarray(B, np.float64),
            np.asarray(Q, np.float64), np.asarray(R, np.float64))
        np.testing.assert_allclose(P, P_ref, rtol=1e-4)

    def test_care_matches_scipy(self):
        A = jnp.array([[0.0, 1.0], [-1.0, -0.2]])
        B = jnp.array([[0.0], [1.0]])
        Q = jnp.eye(2)
        R = jnp.eye(1)
        P = solve_care(A, B, Q, R)
        P_ref = scipy.linalg.solve_continuous_are(
            np.asarray(A, np.float64), np.asarray(B, np.float64),
            np.asarray(Q, np.float64), np.asarray(R, np.float64))
        np.testing.assert_allclose(P, P_ref, rtol=1e-3, atol=1e-4)

    def test_lqr_stabilizes(self):
        A = jnp.array([[1.0, 0.1], [0.0, 1.0]])
        B = jnp.array([[0.005], [0.1]])
        K, P = compute_lqr_gain(A, B, jnp.eye(2), jnp.eye(1))
        eig = np.linalg.eigvals(np.asarray(A - B @ K))
        assert np.all(np.abs(eig) < 1.0)

    def test_robust_cholesky_on_near_singular(self):
        M = jnp.diag(jnp.array([1.0, 1e-12, 2.0]))
        L, j = robust_cholesky(M)
        assert bool(jnp.all(jnp.isfinite(L)))
        np.testing.assert_allclose(L @ L.T, M + j * jnp.eye(3), atol=1e-5)


class TestConstraints:
    def test_quantile(self):
        np.testing.assert_allclose(normal_quantile(jnp.asarray(0.975)), 1.9599, atol=1e-3)
        np.testing.assert_allclose(normal_quantile(jnp.asarray(0.5)), 0.0, atol=1e-6)

    def test_check_all_constraints_6dof(self):
        params = ConstraintParams()
        x = jnp.concatenate([
            jnp.array([2.0, 10.0, 0.5, 0.0, -1.0, 0.0, 0.0]),
            jnp.array([1.0, 0.0, 0.0, 0.0]),
            jnp.zeros(3),
        ])
        u = jnp.array([2.0, 0.1, 0.0])
        rep = check_all_constraints(x, u, params)
        assert bool(rep["all_satisfied"])
        # violate thrust
        rep = check_all_constraints(x, jnp.array([10.0, 0.0, 0.0]), params)
        assert not bool(rep["all_satisfied"])
        assert not bool(rep["thrust_max_satisfied"])

    def test_batched_constraints(self):
        params = ConstraintParams()
        x = jnp.tile(
            jnp.concatenate([
                jnp.array([2.0, 10.0, 0.0, 0.0, -1.0, 0.0, 0.0]),
                jnp.array([1.0, 0.0, 0.0, 0.0]), jnp.zeros(3)]),
            (5, 1),
        )
        u = jnp.tile(jnp.array([2.0, 0.0, 0.0]), (5, 1))
        rep = check_all_constraints(x, u, params)
        assert rep["all_satisfied"].shape == (5,)


class TestCosts:
    def test_weights_shapes(self):
        w = CostWeights()
        assert w.Q_6dof().shape == (14, 14)
        assert w.Q_3dof().shape == (7, 7)
        # attitude weight only on tilt components q_y, q_z
        Q = np.asarray(w.Q_6dof())
        assert Q[7, 7] == 0 and Q[8, 8] == 0 and Q[9, 9] > 0 and Q[10, 10] > 0

    def test_trajectory_cost_matches_loop(self, rng):
        w = CostWeights()
        Q, R, P = w.Q_3dof(), w.R(), w.P_3dof()
        X = jnp.asarray(rng.normal(size=(6, 7)), jnp.float32)
        U = jnp.asarray(rng.normal(size=(5, 3)), jnp.float32)
        ref = jnp.zeros(7)
        total = trajectory_cost(X, U, ref, Q, R, P)
        manual = sum(
            float(X[k] @ Q @ X[k] + U[k] @ R @ U[k]) for k in range(5)
        ) + float(X[5] @ P @ X[5])
        np.testing.assert_allclose(float(total), manual, rtol=1e-4)


@pytest.fixture(scope="module")
def landing_run():
    p = Rocket3DoFParams()
    cfg = RTIConfig()
    F = lambda x, u: r3.step(p, x, u, cfg.dt)
    x0 = jnp.array([2.0, 30.0, 1.0, -0.5, -3.0, 0.0, 0.0])
    xT = jnp.array([2.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0])
    out = jax.jit(lambda x: rti_closed_loop(F, cfg, x, xT, 120))(x0)
    return out


class TestRTI:
    def test_single_step_structure(self):
        p = Rocket3DoFParams()
        cfg = RTIConfig()
        F = lambda x, u: r3.step(p, x, u, cfg.dt)
        x0 = jnp.array([2.0, 30.0, 0.0, 0.0, -3.0, 0.0, 0.0])
        xT = jnp.zeros(7).at[0].set(2.0)
        state = rti_init(cfg, x0, xT)
        sol, state2 = rti_step(F, cfg, state, x0)
        assert sol.u0.shape == (3,)
        assert bool(sol.success)
        # control respects bounds
        assert float(sol.U_opt[:, 0].min()) >= 0.3 - 1e-3
        assert float(jnp.abs(sol.U_opt).max()) <= 5.0 + 1e-3
        # warm-start state advanced
        assert not np.allclose(np.asarray(state2.X_prev), np.asarray(state.X_prev))

    def test_closed_loop_lands_within_criteria(self, landing_run):
        out = landing_run
        assert bool(out["landed"])
        xf = out["x_final"]
        assert float(jnp.linalg.norm(xf[4:7])) < 2.0  # touchdown speed
        assert float(jnp.linalg.norm(xf[2:4])) < 1.0  # position error
        assert float(jnp.mean(out["solver_success"].astype(jnp.float32))) > 0.9

    @pytest.mark.slow

    def test_closed_loop_batch_with_reference(self):
        """Batch landing while tracking per-scenario cubic descent references
        (the reference demo's setup) — soft touchdown everywhere."""
        p = Rocket3DoFParams()
        cfg = RTIConfig()
        F = lambda x, u: r3.step(p, x, u, cfg.dt)
        xT = jnp.zeros(7).at[0].set(2.0)
        x0s = jnp.tile(jnp.array([2.0, 30.0, 0.0, 0.0, -3.0, 0.0, 0.0]), (8, 1))
        x0s = x0s.at[:, 1].add(jnp.linspace(-3, 3, 8)).at[:, 2].add(jnp.linspace(-1, 1, 8))

        def run_one(x):
            Xr = pad_reference(cubic_descent_reference(x, xT, 100, cfg.dt), cfg.N + 20)
            return rti_closed_loop(F, cfg, x, xT, 110, X_ref_full=Xr)

        out = jax.jit(jax.vmap(run_one))(x0s)
        assert bool(jnp.all(out["landed"]))
        v = jax.vmap(jnp.linalg.norm)(out["x_final"][:, 4:7])
        perr = jax.vmap(jnp.linalg.norm)(out["x_final"][:, 2:4])
        assert float(v.max()) < 1.0
        assert float(perr.max()) < 0.5

    def test_ipm_solver_closed_loop_parity(self):
        """RTIConfig(solver='ipm', condensed=True) — the bench variant that
        swaps ~100 HBM-streaming ADMM matvec iterations for ~15-20 Newton
        factorizations — lands with the same touchdown state as the ADMM
        path (measured identical to 3 decimals on this scenario)."""
        p = Rocket3DoFParams()
        x0 = jnp.array([2.0, 30.0, 1.0, -0.5, -3.0, 0.0, 0.0])
        xT = jnp.zeros(7).at[0].set(2.0)
        outs = {}
        for tag, cfg in [
            ("admm", RTIConfig(condensed=True)),
            ("ipm", RTIConfig(condensed=True, solver="ipm")),
        ]:
            F = lambda x, u: r3.step(p, x, u, cfg.dt)
            Xr = pad_reference(
                cubic_descent_reference(x0, xT, 100, cfg.dt), cfg.N + 20)
            outs[tag] = jax.jit(
                lambda x: rti_closed_loop(F, cfg, x, xT, 110, X_ref_full=Xr)
            )(x0)
        for tag, out in outs.items():
            assert bool(out["landed"]), tag
            assert float(jnp.mean(
                out["solver_success"].astype(jnp.float32))) > 0.9, tag
        np.testing.assert_allclose(
            np.asarray(outs["ipm"]["x_final"]),
            np.asarray(outs["admm"]["x_final"]), atol=2e-2)

    def test_ipm_solver_rejects_sparse_and_warm_kkt(self):
        p = Rocket3DoFParams()
        cfg_sparse = RTIConfig(solver="ipm")  # condensed=False default
        F = lambda x, u: r3.step(p, x, u, cfg_sparse.dt)
        x0 = jnp.array([2.0, 30.0, 0.0, 0.0, -3.0, 0.0, 0.0])
        xT = jnp.zeros(7).at[0].set(2.0)
        st = rti_init(cfg_sparse, x0, xT)
        with pytest.raises(ValueError, match="condensed"):
            rti_step(F, cfg_sparse, st, x0)
        cfg_warm = RTIConfig(solver="ipm", condensed=True, warm_kkt=True)
        st2 = rti_init(cfg_warm, x0, xT, step_fn=F)
        with pytest.raises(ValueError, match="warm_kkt"):
            rti_step(F, cfg_warm, st2, x0)


class TestRTI6DoF:
    """6-DoF quaternion MPC bring-up (SURVEY.md §7 M7)."""

    @pytest.mark.slow

    def test_closed_loop_landing_with_attitude(self):
        from gpmpc_tpu.dynamics import Rocket6DoFParams, rocket6dof as r6
        from gpmpc_tpu.mpc import make_rti6dof_controller, rti_config_6dof

        p = Rocket6DoFParams()
        cfg6 = rti_config_6dof(p)
        F = lambda x, u: r6.step(p, x, u, cfg6.dt)
        xT = r6.create_initial_state(p, altitude=0.0)
        x0 = r6.create_initial_state(
            p, altitude=20.0, horizontal=(0.5, -0.3), velocity=(-2.0, 0.1, 0.0)
        )
        ref_fn = lambda x: cubic_descent_reference(x, xT, 110, cfg6.dt)
        cinit, cstep = make_rti6dof_controller(
            F, p, cfg6, xT, reference_fn=ref_fn, ref_horizon=150
        )

        @jax.jit
        def run(x):
            c = cinit(x)

            def body(carry, k):
                x, c, landed = carry
                u, c = cstep(c, x, k)
                xn = jnp.where(landed, x, F(x, u))
                return (xn, c, landed | (xn[1] < 0.1)), r6.tilt_angle(xn[7:11])

            (xf, _, landed), tilts = jax.lax.scan(
                body, (x, c, jnp.asarray(False)), jnp.arange(150)
            )
            return xf, landed, tilts

        xf, landed, tilts = run(x0)
        assert bool(landed)
        assert float(jnp.linalg.norm(xf[4:7])) < 1.0  # soft touchdown
        assert float(jnp.linalg.norm(xf[2:4])) < 0.5  # on the pad
        assert float(tilts.max()) < p.theta_max  # attitude within limits
        assert abs(float(jnp.linalg.norm(xf[7:11])) - 1.0) < 1e-4

    def test_control_box_inside_cone_and_annulus(self):
        from gpmpc_tpu.dynamics import Rocket6DoFParams, rocket6dof as r6
        from gpmpc_tpu.mpc import control_box_6dof

        p = Rocket6DoFParams()
        lo, hi = control_box_6dof(p)
        # every corner of the box satisfies gimbal + thrust-max
        import itertools

        for corner in itertools.product(*zip(np.asarray(lo), np.asarray(hi))):
            u = jnp.asarray(corner)
            assert float(r6.gimbal_constraint(p, u)) <= 1e-6
            assert float(jnp.linalg.norm(u)) <= p.T_max + 1e-6


class TestStageRows:
    """Per-stage facet rows in the RTI QP (polyhedral glideslope / gimbal
    cone — the reference enforces these in its CasADi NLPs)."""

    def test_build_stage_rows_layout(self):
        from gpmpc_tpu.ops.qp import build_stage_rows, join_z

        key = jax.random.PRNGKey(0)
        N, n_x, n_u, gx, gu = 4, 5, 2, 3, 2
        Gx = jax.random.normal(key, (gx, n_x))
        Gu = jax.random.normal(jax.random.fold_in(key, 1), (gu, n_u))
        A, l, u = build_stage_rows(
            N, n_x, n_u,
            Gx, -jnp.ones(gx), jnp.ones(gx),
            Gu, -2 * jnp.ones(gu), 2 * jnp.ones(gu))
        X = jax.random.normal(jax.random.fold_in(key, 2), (N + 1, n_x))
        U = jax.random.normal(jax.random.fold_in(key, 3), (N, n_u))
        z = join_z(X, U)
        expect = jnp.concatenate(
            [(X[1:] @ Gx.T).reshape(-1), (U @ Gu.T).reshape(-1)])
        np.testing.assert_allclose(np.asarray(A @ z), np.asarray(expect),
                                   atol=1e-5)
        assert A.shape[0] == N * (gx + gu) == l.shape[0] == u.shape[0]

    @pytest.mark.slow  # demoted from the default tier (r5: <300 s budget)
    def test_glideslope_rows_bind_in_rti_plan(self):
        """Track a reference OUTSIDE the glideslope cone: the plan must hug
        the cone (rows bind) instead of following the reference out."""
        import math
        from gpmpc_tpu.mpc import RTIConfig, eval_glideslope, glideslope_rows
        from gpmpc_tpu.mpc.rti import rti_init, rti_step

        p = Rocket3DoFParams()
        gamma = math.radians(30.0)
        h_off = 0.2
        # near the cone boundary (y ≤ h·tan30° = 5.77) drifting outward
        x0 = jnp.array([2.0, 10.0, 4.5, 0.0, -0.5, 1.0, 0.0])
        # reference parked far outside the cone laterally
        x_bad = jnp.array([2.0, 8.0, 15.0, 0.0, 0.0, 1.0, 0.0])
        results = {}
        from gpmpc_tpu.ops.qp import ADMMConfig

        for label, kw in (
            ("plain", {}),
            ("gs", dict(zip(("Gx", "gx_l", "gx_u"),
                            glideslope_rows(gamma, 7, 8, h_offset=h_off)))),
        ):
            # cold single solve pushed against the facets converges slowly —
            # give ADMM real headroom (a one-off QP, not the RTI hot path)
            cfg = RTIConfig(N=15,
                            admm=ADMMConfig(max_iter=2000, polish=True), **kw)
            F = lambda x, u: r3.step(p, x, u, cfg.dt)
            st = rti_init(cfg, x0, x_bad)
            sol, _ = rti_step(F, cfg, st, x0)
            assert bool(sol.success), label
            margins = eval_glideslope(
                sol.X_opt[1:, 1:4] + jnp.array([h_off, 0.0, 0.0]), gamma)
            results[label] = float(jnp.min(margins))
        # unconstrained plan chases the reference out of the cone...
        assert results["plain"] < -0.5, results
        # ...facet rows keep every planned stage inside (inner approx + tol)
        assert results["gs"] > -1e-2, results

    @pytest.mark.slow

    def test_cone_facet_rows_respect_gimbal_in_plan(self):
        from gpmpc_tpu.dynamics import Rocket6DoFParams, rocket6dof as r6
        from gpmpc_tpu.mpc import rti_config_6dof
        from gpmpc_tpu.mpc.rti import rti_init, rti_step

        from gpmpc_tpu.ops.qp import ADMMConfig

        p = Rocket6DoFParams()
        cfg = rti_config_6dof(
            p, cone_facets=8, admm=ADMMConfig(max_iter=400, polish=True))
        F = lambda x, u: r6.step(p, x, u, cfg.dt)
        xT = r6.create_initial_state(p, altitude=0.0)
        x0 = r6.create_initial_state(
            p, altitude=15.0, horizontal=(1.0, -0.5), velocity=(-2.0, 0.2, 0.0))
        st = rti_init(cfg, x0, xT)
        sol, _ = rti_step(F, cfg, st, x0)
        assert bool(sol.success)
        # every planned control satisfies the true gimbal cone (inner approx)
        gim = jax.vmap(lambda u: r6.gimbal_constraint(p, u))(sol.U_opt)
        assert float(gim.max()) <= 1e-3
        # and the lateral box is the full T_max·sinδ, not the T_min corner
        assert float(cfg.u_max[1]) > p.T_min * math.sin(p.delta_max)
    @pytest.mark.slow  # demoted from the default tier (r5: <300 s budget)
    def test_solve_and_closed_loop(self):
        from gpmpc_tpu.mpc import MPCConfig, NominalMPC3DoF

        p = Rocket3DoFParams()
        F = lambda x, u: r3.step(p, x, u, 0.1)
        mpc = NominalMPC3DoF(F, MPCConfig(scp_iterations=2, tighten=False))
        x0 = jnp.array([2.0, 15.0, 0.3, 0.0, -2.0, 0.0, 0.0])
        xT = jnp.zeros(7).at[0].set(2.0)
        sol = mpc.solve(x0, xT)
        assert sol.u0.shape == (3,)
        assert bool(sol.success)
        out = mpc.simulate_closed_loop(x0, xT, 160)
        assert bool(out["landed"])
        assert float(jnp.linalg.norm(out["x_final"][4:7])) < 2.0


class TestRTIPhases:
    def test_prepare_feedback_equals_fused_step(self):
        """The split prepare/feedback phases must reproduce rti_step exactly
        when re-anchoring is off (the Diehl pipelining contract)."""
        from gpmpc_tpu.mpc import rti_feedback, rti_prepare

        p = Rocket3DoFParams()
        cfg = RTIConfig(reanchor=False)
        F = lambda x, u: r3.step(p, x, u, cfg.dt)
        x0 = jnp.array([2.0, 25.0, 0.3, 0.0, -3.0, 0.0, 0.0])
        xT = jnp.zeros(7).at[0].set(2.0)
        st = rti_init(cfg, x0, xT)
        prepared = rti_prepare(F, cfg, st)
        sol_a, st_a = rti_feedback(cfg, st, prepared, x0)
        sol_b, st_b = rti_step(F, cfg, st, x0)
        np.testing.assert_allclose(sol_a.u0, sol_b.u0, atol=1e-6)
        np.testing.assert_allclose(st_a.X_prev, st_b.X_prev, atol=1e-6)

    @pytest.mark.slow  # demoted from the default tier (r5: <300 s budget)
    def test_prepare_feedback_carries_warm_kkt(self):
        """Regression: the split phases must carry the NS-refreshed KKT
        inverse like the fused step does — a stale init-time inverse would
        silently degrade every later cycle (found in review; rti_feedback
        previously dropped sol.kkt_inv)."""
        from gpmpc_tpu.mpc import rti_feedback, rti_prepare
        from gpmpc_tpu.ops.qp import ADMMConfig

        p = Rocket3DoFParams()
        cfg = RTIConfig(
            reanchor=False, warm_kkt=True, accept_pri_tol=5e-3,
            admm=ADMMConfig(max_iter=50, polish=False, adaptive_rho=False,
                            scaling=3))
        F = lambda x, u: r3.step(p, x, u, cfg.dt)
        x0 = jnp.array([2.0, 25.0, 0.3, 0.0, -3.0, 0.0, 0.0])
        xT = jnp.zeros(7).at[0].set(2.0)
        st = rti_init(cfg, x0, xT, step_fn=F)
        x = x0
        st_fused = st
        for _ in range(3):
            prepared = rti_prepare(F, cfg, st)
            sol, st = rti_feedback(cfg, st, prepared, x)
            sol_f, st_fused = rti_step(F, cfg, st_fused, x)
            x = F(x, sol_f.u0)
        # the split path refreshed its inverse each cycle, matching the
        # fused path's carry (bitwise — same refresh chain)
        np.testing.assert_allclose(st.kkt_inv, st_fused.kkt_inv, atol=0)
        assert not np.allclose(
            np.asarray(st.kkt_inv), np.asarray(
                rti_init(cfg, x0, xT, step_fn=F).kkt_inv)
        ), "inverse should have moved off the init-time factorization"

    def test_simple_rti_descends_cost(self):
        from gpmpc_tpu.mpc import simple_rti_step

        p = Rocket3DoFParams()
        cfg = RTIConfig()
        F = lambda x, u: r3.step(p, x, u, cfg.dt)
        x0 = jnp.array([2.0, 10.0, 0.0, 0.0, -1.0, 0.0, 0.0])
        xT = jnp.zeros(7).at[0].set(2.0)
        st = rti_init(cfg, x0, xT)
        u0, st2 = simple_rti_step(F, cfg, st, x0, gd_steps=25)
        # bounded and finite, and changed from the hover init
        assert float(u0[0]) >= cfg.u_min[0] - 1e-6
        assert bool(jnp.all(jnp.isfinite(u0)))


class TestWarmKKT:
    @pytest.mark.slow
    def test_warm_kkt_matches_cholesky_path_closed_loop(self):
        """The warm-started KKT inverse (frozen scaling + Newton-Schulz
        refresh) must reproduce the Cholesky path's landings."""
        from gpmpc_tpu.ops.qp import ADMMConfig

        p = Rocket3DoFParams()
        xT = jnp.zeros(7).at[0].set(2.0)
        x0s = jnp.tile(jnp.array([2.0, 30.0, 0.0, 0.0, -3.0, 0.0, 0.0]), (4, 1))
        x0s = x0s.at[:, 1].add(jnp.linspace(-3, 3, 4)).at[:, 2].add(
            jnp.linspace(-1, 1, 4))
        results = {}
        for warm in (False, True):
            cfg = RTIConfig(
                N=20, warm_kkt=warm, accept_pri_tol=5e-3,
                admm=ADMMConfig(max_iter=50, polish=False,
                                adaptive_rho=False, scaling=3))
            F = lambda x, u: r3.step(p, x, u, cfg.dt)

            def run_one(x, cfg=cfg, F=F):
                Xr = pad_reference(
                    cubic_descent_reference(x, xT, 100, cfg.dt), cfg.N + 20)
                return rti_closed_loop(F, cfg, x, xT, 110, X_ref_full=Xr)

            out = jax.jit(jax.vmap(run_one))(x0s)
            results[warm] = out
        for warm, out in results.items():
            assert bool(out["landed"].all()), f"warm={warm}"
            v = jax.vmap(jnp.linalg.norm)(out["x_final"][:, 4:7])
            assert float(v.max()) < 1.0, f"warm={warm}"
            assert float(out["solver_success"].mean()) > 0.99, f"warm={warm}"
        # touchdown states agree closely between the two factorization paths
        np.testing.assert_allclose(
            results[True]["x_final"], results[False]["x_final"], atol=0.05)

    @pytest.mark.slow

    def test_condensed_warm_kkt_matches_cholesky_path_closed_loop(self):
        """warm_kkt composed with the condensed QP (the bench configuration's
        factorization eliminator): at tight tolerance (polish, no early
        acceptance) the NS-refreshed (N·n_u)² inverse under the frozen
        init-time Ruiz scaling reproduces the per-cycle Cholesky condensed
        path's landings EXACTLY — both drive the ADMM to the same QP optimum,
        so the inexact-KKT machinery cancels out. (At real-time budgets the
        two take different-but-equally-valid inexact paths; quality there is
        covered by the demo/bench configs.)"""
        from gpmpc_tpu.ops.qp import ADMMConfig

        p = Rocket3DoFParams()
        xT = jnp.zeros(7).at[0].set(2.0)
        x0s = jnp.tile(jnp.array([2.0, 30.0, 0.0, 0.0, -3.0, 0.0, 0.0]), (4, 1))
        x0s = x0s.at[:, 1].add(jnp.linspace(-3, 3, 4)).at[:, 2].add(
            jnp.linspace(-1, 1, 4))
        results = {}
        for warm in (False, True):
            cfg = RTIConfig(
                N=20, warm_kkt=warm, condensed=True, accept_pri_tol=0.0,
                admm=ADMMConfig(max_iter=250, polish=True,
                                adaptive_rho=False, scaling=3, ns_iters=8))
            F = lambda x, u: r3.step(p, x, u, cfg.dt)

            def run_one(x, cfg=cfg, F=F):
                Xr = pad_reference(
                    cubic_descent_reference(x, xT, 100, cfg.dt), cfg.N + 20)
                return rti_closed_loop(F, cfg, x, xT, 110, X_ref_full=Xr)

            out = jax.jit(jax.vmap(run_one))(x0s)
            results[warm] = out
        for warm, out in results.items():
            assert bool(out["landed"].all()), f"warm={warm}"
            v = jax.vmap(jnp.linalg.norm)(out["x_final"][:, 4:7])
            assert float(v.max()) < 1.0, f"warm={warm}"
            assert float(out["solver_success"].mean()) > 0.99, f"warm={warm}"
        np.testing.assert_allclose(
            results[True]["x_final"], results[False]["x_final"], atol=1e-5)


class TestLinearizedStageRows:
    """Per-cycle linearized state rows (RTIConfig.stage_rows_fn): the smooth
    glideslope cone handled the SCP way — one row per stage re-linearized at
    the current iterate — instead of an n-facet inner polyhedron."""

    def test_smooth_glideslope_binds_in_condensed_rti(self):
        """Track a reference OUTSIDE the cone: after a few receding cycles
        (the linearization converging onto the active boundary) the plan
        hugs the cone instead of chasing the reference out."""
        import math
        from gpmpc_tpu.mpc import (
            RTIConfig,
            eval_glideslope,
            glideslope_linearized,
        )
        from gpmpc_tpu.mpc.rti import rti_init, rti_step
        from gpmpc_tpu.ops.qp import ADMMConfig

        p = Rocket3DoFParams()
        gamma = math.radians(30.0)
        h_off = 0.2
        x0 = jnp.array([2.0, 10.0, 4.5, 0.0, -0.5, 1.0, 0.0])
        x_bad = jnp.array([2.0, 8.0, 15.0, 0.0, 0.0, 1.0, 0.0])
        results = {}
        for label, kw in (
            ("plain", {}),
            ("gs", dict(stage_rows_fn=glideslope_linearized(
                gamma, h_offset=h_off), n_stage_rows=1)),
        ):
            cfg = RTIConfig(
                N=15, condensed=True,
                admm=ADMMConfig(max_iter=2000, polish=True), **kw)
            F = lambda x, u: r3.step(p, x, u, cfg.dt)
            st = rti_init(cfg, x0, x_bad)
            x = x0
            for _k in range(4):
                sol, st = rti_step(F, cfg, st, x)
                assert bool(sol.success), label
                x = F(x, sol.u0)
            margins = eval_glideslope(
                sol.X_opt[1:, 1:4] + jnp.array([h_off, 0.0, 0.0]), gamma)
            results[label] = float(jnp.min(margins))
        # unconstrained plan chases the reference out of the cone...
        assert results["plain"] < -0.5, results
        # ...the re-linearized smooth rows keep the plan on the boundary
        # (outer approximation: a small second-order overhang is allowed,
        # unlike the facets' conservative inner margin)
        assert results["gs"] > -5e-2, results

    def test_smooth_matches_facets_when_inactive(self):
        """With the cone slack (reference inside), smooth rows and facet
        rows must produce the same (unconstrained) plan."""
        import math
        from gpmpc_tpu.mpc import (
            RTIConfig,
            glideslope_linearized,
            glideslope_rows,
        )
        from gpmpc_tpu.mpc.rti import rti_init, rti_step
        from gpmpc_tpu.ops.qp import ADMMConfig

        p = Rocket3DoFParams()
        gamma = math.radians(45.0)
        x0 = jnp.array([2.0, 12.0, 0.5, 0.0, -1.0, 0.0, 0.0])
        xT = jnp.zeros(7).at[0].set(2.0)
        plans = {}
        for label, kw in (
            ("smooth", dict(stage_rows_fn=glideslope_linearized(gamma),
                            n_stage_rows=1)),
            ("facets", dict(zip(("Gx", "gx_l", "gx_u"),
                                glideslope_rows(gamma, 7, 8)))),
        ):
            # cold one-off solve (not the warm-started RTI hot path): give
            # the ADMM real headroom so both variants actually converge
            cfg = RTIConfig(N=15, condensed=True, accept_pri_tol=1e-4,
                            admm=ADMMConfig(max_iter=4000, polish=True), **kw)
            F = lambda x, u: r3.step(p, x, u, cfg.dt)
            st = rti_init(cfg, x0, xT)
            sol, _ = rti_step(F, cfg, st, x0)
            assert bool(sol.success), label
            plans[label] = sol.U_opt
        np.testing.assert_allclose(plans["smooth"], plans["facets"],
                                   atol=5e-3)

    def test_stage_rows_fn_guards(self):
        """Config guards: sparse form refuses stage rows; n_stage_rows must
        be declared; Gx and stage_rows_fn are mutually exclusive."""
        from gpmpc_tpu.mpc import RTIConfig, glideslope_linearized
        from gpmpc_tpu.mpc.rti import rti_init, rti_step

        p = Rocket3DoFParams()
        fn = glideslope_linearized(0.5)
        x0 = jnp.array([2.0, 10.0, 0.0, 0.0, -1.0, 0.0, 0.0])
        xT = jnp.zeros(7).at[0].set(2.0)
        F = lambda x, u: r3.step(p, x, u, 0.1)
        cfg = RTIConfig(N=5, condensed=False, stage_rows_fn=fn,
                        n_stage_rows=1)
        with pytest.raises(ValueError, match="condensed"):
            rti_step(F, cfg, rti_init(cfg, x0, xT), x0)
        cfg2 = RTIConfig(N=5, condensed=True, stage_rows_fn=fn)
        with pytest.raises(ValueError, match="n_stage_rows"):
            rti_step(F, cfg2, rti_init(cfg2, x0, xT), x0)
