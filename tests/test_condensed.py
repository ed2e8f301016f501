"""Condensed-QP path: formulation parity with the sparse form + closed loop.

The condensed builder (ops/qp/condensed.py) eliminates the states, so its
optimal u* must equal the sparse form's (states were pinned by the equality
rows). Parity is checked at tight solver tolerance; closed-loop quality is
checked against the demo criteria.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpmpc_tpu.dynamics import Rocket3DoFParams, rocket3dof as r3, trajectory_jacobians
from gpmpc_tpu.mpc import RTIConfig, rti_closed_loop
from gpmpc_tpu.ops.qp import (
    ADMMConfig,
    build_condensed_qp,
    build_mpc_qp,
    build_stage_rows,
    extend_qp,
    prediction_matrices,
    recover_states,
    solve,
    split_z,
)
from gpmpc_tpu.reference import cubic_descent_reference, pad_reference


@pytest.fixture(scope="module")
def ltv():
    """A canonical N=20 3-DoF linearization (hover rollout from offset IC)."""
    p = Rocket3DoFParams()
    dt = 0.1
    F = lambda x, u: r3.step(p, x, u, dt)
    x0 = jnp.array([2.0, 25.0, 0.5, -0.5, -3.0, 0.0, 0.0])
    N = 20
    U_lin = jnp.tile(jnp.zeros(3).at[0].set(2.0), (N, 1))

    def roll(x, u):
        xn = F(x, u)
        return xn, xn

    _, Xr = jax.lax.scan(roll, x0, U_lin)
    X_lin = jnp.concatenate([x0[None], Xr], axis=0)
    Aks, Bks, cks = trajectory_jacobians(F, X_lin, U_lin)
    return Aks, Bks, cks, x0, RTIConfig(N=N)


class TestPredictionMatrices:
    def test_rollout_consistency(self, ltv):
        """Γ·U + d must equal the LTV rollout of U for random controls."""
        Aks, Bks, cks, x0, cfg = ltv
        Gs, ds = prediction_matrices(Aks, Bks, cks, x0)
        U = jax.random.normal(jax.random.PRNGKey(0), (cfg.N, 3))

        def ltv_step(x, inp):
            A, B, c, u = inp
            xn = A @ x + B @ u + c
            return xn, xn

        _, X_roll = jax.lax.scan(ltv_step, x0, (Aks, Bks, cks, U))
        X_rec = recover_states(Gs, ds, U.reshape(-1), x0)
        np.testing.assert_allclose(
            np.asarray(X_rec[1:]), np.asarray(X_roll), rtol=1e-5, atol=1e-4
        )


class TestCondensedParity:
    """Formulation parity: the condensed optimum equals the sparse optimum.

    Solved in f64 at tight tolerance — this verifies the BUILDER's math
    (states eliminated correctly), separated from f32 ADMM convergence speed
    (which the closed-loop test below covers at real-time settings)."""

    def _solve_both(self, ltv, with_facets: bool):
        Aks, Bks, cks, x0, cfg = ltv
        N = cfg.N
        xT = jnp.zeros(7).at[0].set(2.0)
        x_ref = jnp.tile(xT, (N + 1, 1))
        facets = {}
        if with_facets:
            facets = dict(
                Gx=jnp.array([[0.0, -0.5, 1.0, 0.0, 0.0, 0.0, 0.0],
                              [0.0, -0.5, 0.0, 1.0, 0.0, 0.0, 0.0]]),
                gx_l=jnp.full(2, -1e20),
                gx_u=jnp.zeros(2),
                Gu=jnp.array([[1.0, -0.3, 0.0], [1.0, 0.0, -0.3]]),
                gu_l=jnp.zeros(2),
                gu_u=jnp.full(2, 1e20),
            )

        sp = build_mpc_qp(
            Aks, Bks, cks, x0, cfg.Q, cfg.R, cfg.Qf, x_ref,
            cfg.x_min, cfg.x_max, cfg.u_min, cfg.u_max,
        )
        if with_facets:
            sp = extend_qp(sp, *build_stage_rows(N, 7, 3, **facets))
        cd, Gs, ds = build_condensed_qp(
            Aks, Bks, cks, x0, cfg.Q, cfg.R, cfg.Qf, x_ref,
            cfg.x_min, cfg.x_max, cfg.u_min, cfg.u_max, **facets,
        )
        acc = ADMMConfig(max_iter=20000, eps_abs=1e-7, eps_rel=1e-7, polish=True)
        to64 = lambda t: jax.tree.map(lambda a: jnp.asarray(a, jnp.float64), t)
        with jax.enable_x64(True):
            s_sp = jax.jit(lambda d: solve(d, config=acc))(to64(sp))
            s_cd = jax.jit(lambda d: solve(d, config=acc))(to64(cd))
            X_sp, U_sp = split_z(s_sp.x, N, 7, 3)
            U_cd = s_cd.x.reshape(N, 3)
            X_cd = recover_states(to64(Gs), to64(ds), s_cd.x, to64(x0))
        return (X_sp, U_sp), (X_cd, U_cd)

    def test_u_parity_box(self, ltv):
        (X_sp, U_sp), (X_cd, U_cd) = self._solve_both(ltv, with_facets=False)
        np.testing.assert_allclose(np.asarray(U_cd), np.asarray(U_sp), atol=5e-3)
        np.testing.assert_allclose(np.asarray(X_cd), np.asarray(X_sp), atol=2e-2)

    def test_u_parity_facets(self, ltv):
        (_, U_sp), (_, U_cd) = self._solve_both(ltv, with_facets=True)
        np.testing.assert_allclose(np.asarray(U_cd), np.asarray(U_sp), atol=5e-3)

    @pytest.mark.parametrize("with_facets", [False, True])
    def test_row_structure_structural_path(self, ltv, with_facets):
        """ADMMConfig.row_structure (BLT state rows, diagonal control-bound
        rows, block-diagonal control facets — the iteration matvecs stream
        only structural nonzeros) must reproduce the dense path's solution —
        same math, reordered reductions only."""
        Aks, Bks, cks, x0, cfg = ltv
        N = cfg.N
        x_ref = jnp.tile(jnp.zeros(7).at[0].set(2.0), (N + 1, 1))
        facets = {}
        segs = [("blt", 5, (N // 5) * 7, (N // 5) * 3), ("diag", N * 3)]
        if with_facets:
            facets = dict(
                Gu=jnp.array([[1.0, -0.3, 0.0], [1.0, 0.0, -0.3]]),
                gu_l=jnp.zeros(2),
                gu_u=jnp.full(2, 1e20),
            )
            segs.append(("blockdiag", N, 2, 3))
        cd, Gs, ds = build_condensed_qp(
            Aks, Bks, cks, x0, cfg.Q, cfg.R, cfg.Qf, x_ref,
            cfg.x_min, cfg.x_max, cfg.u_min, cfg.u_max, **facets,
        )
        # the declared segments must actually match the built A's zeros:
        # rebuilding A from the compacted operands reproduces it exactly
        from gpmpc_tpu.ops.qp.admm import _compact_structure, _make_A_ops

        ops = _compact_structure(cd.A, tuple(segs))
        A_apply, AT_apply = _make_A_ops(ops, cd.n)
        for j in range(0, cd.n, 7):  # probe columns of the rebuilt operator
            e = jnp.zeros(cd.n).at[j].set(1.0)
            np.testing.assert_allclose(
                np.asarray(A_apply(e)), np.asarray(cd.A @ e), atol=1e-6)
            np.testing.assert_allclose(
                np.asarray(AT_apply(cd.A @ e)),
                np.asarray(cd.A.T @ (cd.A @ e)), atol=1e-5)

        # polish pins both runs to the same active-set KKT refit; the
        # iteration paths differ only by f32 reduction order
        base = ADMMConfig(max_iter=200, polish=True, adaptive_rho=False,
                          scaling=3)
        s_dense = jax.jit(lambda d: solve(d, config=base))(cd)
        s_struct = jax.jit(
            lambda d: solve(d, config=base.replace(row_structure=tuple(segs)))
        )(cd)
        np.testing.assert_allclose(
            np.asarray(s_struct.x), np.asarray(s_dense.x), atol=1e-4)
        assert int(s_struct.status) == int(s_dense.status)


class TestBoundRowElision:
    def test_elided_loose_bounds_same_solution(self, ltv):
        """x_bound_mask drops bound rows; when those boxes could not bind
        (loose translation envelopes) the optimum is unchanged."""
        Aks, Bks, cks, x0, cfg = ltv
        N = cfg.N
        x_ref = jnp.tile(jnp.zeros(7).at[0].set(2.0), (N + 1, 1))
        acc = ADMMConfig(max_iter=20000, eps_abs=1e-7, eps_rel=1e-7, polish=True)
        # genuinely loose envelopes (the fixture's ±50 velocity box CAN bind
        # under this aggressive tracking reference — that case is the next
        # test's subject)
        x_lo = jnp.full(7, -1e4).at[0].set(-1e20)
        x_hi = jnp.full(7, 1e4).at[0].set(1e20)
        full, _, _ = build_condensed_qp(
            Aks, Bks, cks, x0, cfg.Q, cfg.R, cfg.Qf, x_ref,
            x_lo, x_hi, cfg.u_min, cfg.u_max,
        )
        mask = (False,) * 7
        elided, _, _ = build_condensed_qp(
            Aks, Bks, cks, x0, cfg.Q, cfg.R, cfg.Qf, x_ref,
            x_lo, x_hi, cfg.u_min, cfg.u_max,
            x_bound_mask=mask,
        )
        assert elided.A.shape[0] == N * 3
        # compare at f64/tight tolerance: the point is FORMULATION parity
        # (measured here: f64 agreement is exact to 1e-9; the f32 FULL qp
        # with ±1e4 bound rows is the arm that struggles to converge — the
        # elided problem is better conditioned)
        to64 = lambda t: jax.tree.map(lambda a: jnp.asarray(a, jnp.float64), t)
        with jax.enable_x64(True):
            s_full = jax.jit(lambda d: solve(d, config=acc))(to64(full))
            s_el = jax.jit(lambda d: solve(d, config=acc))(to64(elided))
            np.testing.assert_allclose(
                np.asarray(s_el.x), np.asarray(s_full.x), atol=1e-5)

    def test_partial_mask_keeps_binding_rows(self, ltv):
        """A mask that KEEPS a binding bound must still enforce it: tighten
        the vertical-velocity floor so it binds, elide only position rows."""
        Aks, Bks, cks, x0, cfg = ltv
        N = cfg.N
        x_ref = jnp.tile(jnp.zeros(7).at[0].set(2.0), (N + 1, 1))
        x_min = cfg.x_min.at[4].set(-3.5)  # descent-speed floor: feasible from v0=-3, binds under the aggressive tracking reference
        acc = ADMMConfig(max_iter=20000, eps_abs=1e-7, eps_rel=1e-7, polish=True)
        full, _, _ = build_condensed_qp(
            Aks, Bks, cks, x0, cfg.Q, cfg.R, cfg.Qf, x_ref,
            x_min, cfg.x_max, cfg.u_min, cfg.u_max,
        )
        mask = (False, False, False, False, True, True, True)
        elided, Gs, ds = build_condensed_qp(
            Aks, Bks, cks, x0, cfg.Q, cfg.R, cfg.Qf, x_ref,
            x_min, cfg.x_max, cfg.u_min, cfg.u_max,
            x_bound_mask=mask,
        )
        assert elided.A.shape[0] == N * (3 + 3)
        to64 = lambda t: jax.tree.map(lambda a: jnp.asarray(a, jnp.float64), t)
        with jax.enable_x64(True):
            s_full = jax.jit(lambda d: solve(d, config=acc))(to64(full))
            s_el = jax.jit(lambda d: solve(d, config=acc))(to64(elided))
            np.testing.assert_allclose(
                np.asarray(s_el.x), np.asarray(s_full.x), atol=1e-5)
            # the floor is active and respected in the recovered trajectory
            X = recover_states(to64(Gs), to64(ds), s_el.x, to64(x0))
            assert float(jnp.min(X[1:, 4])) > -3.5 - 1e-3
            assert float(jnp.min(X[1:, 4])) < -3.4  # it actually binds

    def test_masked_row_structure_solve(self, ltv):
        """_condensed_admm_cfg with a mask declares the reduced BLT segment
        and the structural solve matches the dense-stream solve."""
        from gpmpc_tpu.mpc.rti import _condensed_admm_cfg

        Aks, Bks, cks, x0, cfg = ltv
        N = cfg.N
        x_ref = jnp.tile(jnp.zeros(7).at[0].set(2.0), (N + 1, 1))
        base = ADMMConfig(max_iter=200, polish=True, adaptive_rho=False,
                          scaling=3)
        mask = (False, True, True, True, True, True, True)
        cfg_m = cfg.replace(x_bound_mask=mask, admm=base, condensed=True)
        segs = _condensed_admm_cfg(cfg_m).row_structure
        assert segs[0] == ("blt", 5, (N // 5) * 6, (N // 5) * 3)
        data, _, _ = build_condensed_qp(
            Aks, Bks, cks, x0, cfg.Q, cfg.R, cfg.Qf, x_ref,
            cfg.x_min, cfg.x_max, cfg.u_min, cfg.u_max,
            x_bound_mask=mask,
        )
        s_dense = jax.jit(lambda d: solve(d, config=base))(data)
        s_struct = jax.jit(
            lambda d: solve(d, config=base.replace(row_structure=segs))
        )(data)
        np.testing.assert_allclose(
            np.asarray(s_struct.x), np.asarray(s_dense.x), atol=1e-4)


class TestBlockdiagShared:
    def test_shared_facets_match_dense_under_ruiz(self, ltv):
        """blockdiag_shared (stage-constant Gu streamed once + per-stage
        Ruiz ratio vectors) must reproduce the dense-stream solution under a
        REAL Ruiz equilibration (scaled stage blocks differ by diagonal
        factors — the ratio vectors must reconstruct them exactly)."""
        Aks, Bks, cks, x0, cfg = ltv
        N = cfg.N
        x_ref = jnp.tile(jnp.zeros(7).at[0].set(2.0), (N + 1, 1))
        facets = dict(
            Gu=jnp.array([[1.0, -0.3, 0.0], [1.0, 0.0, -0.3]]),
            gu_l=jnp.zeros(2),
            gu_u=jnp.full(2, 1e20),
        )
        data, _, _ = build_condensed_qp(
            Aks, Bks, cks, x0, cfg.Q, cfg.R, cfg.Qf, x_ref,
            cfg.x_min, cfg.x_max, cfg.u_min, cfg.u_max, **facets,
        )
        base = ADMMConfig(max_iter=200, polish=True, adaptive_rho=False,
                          scaling=10)
        segs = (("blt", 5, (N // 5) * 7, (N // 5) * 3), ("diag", N * 3),
                ("blockdiag_shared", N, 2, 3))
        s_dense = jax.jit(lambda d: solve(d, config=base))(data)
        s_shared = jax.jit(
            lambda d: solve(d, config=base.replace(row_structure=segs))
        )(data)
        np.testing.assert_allclose(
            np.asarray(s_shared.x), np.asarray(s_dense.x), atol=1e-4)
        assert int(s_shared.status) == int(s_dense.status)

    def test_shared_operator_reconstruction_scaled(self, ltv):
        """Probe the compacted operator against the scaled dense A directly
        (A_apply/AT_apply exactness is what the iteration relies on)."""
        from gpmpc_tpu.ops.qp.admm import _compact_structure, _make_A_ops
        from gpmpc_tpu.ops.qp.ruiz import ruiz_equilibrate

        Aks, Bks, cks, x0, cfg = ltv
        N = cfg.N
        x_ref = jnp.tile(jnp.zeros(7).at[0].set(2.0), (N + 1, 1))
        facets = dict(
            Gu=jnp.array([[1.0, -0.3, 0.0], [1.0, 0.0, -0.3]]),
            gu_l=jnp.zeros(2),
            gu_u=jnp.full(2, 1e20),
        )
        data, _, _ = build_condensed_qp(
            Aks, Bks, cks, x0, cfg.Q, cfg.R, cfg.Qf, x_ref,
            cfg.x_min, cfg.x_max, cfg.u_min, cfg.u_max, **facets,
        )
        sdata, scal = ruiz_equilibrate(data, 10)
        segs = (("blt", 5, (N // 5) * 7, (N // 5) * 3), ("diag", N * 3),
                ("blockdiag_shared", N, 2, 3))
        ops = _compact_structure(sdata.A, segs, E=scal.E, D=scal.D)
        A_apply, AT_apply = _make_A_ops(ops, data.n)
        for j in range(0, data.n, 11):
            e = jnp.zeros(data.n).at[j].set(1.0)
            np.testing.assert_allclose(
                np.asarray(A_apply(e)), np.asarray(sdata.A @ e), atol=1e-5)
            np.testing.assert_allclose(
                np.asarray(AT_apply(sdata.A @ e)),
                np.asarray(sdata.A.T @ (sdata.A @ e)), atol=1e-4)


class TestCondensed6DoFFacets:
    @pytest.mark.slow
    def test_row_structure_6dof_cones(self):
        """The auto-declared row structure for the 6-DoF condensed QP with
        gimbal-cone (blockdiag Gu) AND glideslope (BLT Gx) facet rows must
        match the dense path — this is the cones-campaign configuration."""
        from gpmpc_tpu.dynamics import Rocket6DoFParams, rocket6dof as r6
        from gpmpc_tpu.mpc import rti_config_6dof
        from gpmpc_tpu.mpc.rti import _condensed_admm_cfg, rti_init

        from gpmpc_tpu.dynamics.linearize import trajectory_jacobians
        from gpmpc_tpu.ops.qp.admm import _compact_structure, _make_A_ops

        p = Rocket6DoFParams()
        # the cold cone+glideslope QP is genuinely hard (interpolated warm
        # start far outside the cones): it needs the adaptive-ρ + polish
        # budget to reach SOLVED in either arm
        base_admm = ADMMConfig(max_iter=1000, polish=True, adaptive_rho=True,
                               rho_adapt_chunks=8, scaling=10)
        cfg = rti_config_6dof(
            p, cone_facets=8, glideslope_facets=6, admm=base_admm
        ).replace(condensed=True)
        # the helper must declare all four segments for this config
        segs = _condensed_admm_cfg(cfg).row_structure
        kinds = [s[0] for s in segs]
        assert kinds == ["blt", "diag", "blt", "blockdiag_shared"], segs

        F = lambda x, u: r6.step(p, x, u, cfg.dt)
        xT = r6.create_initial_state(p, altitude=0.0)
        x0 = r6.create_initial_state(
            p, altitude=15.0, horizontal=(1.0, -0.5), velocity=(-2.0, 0.2, 0.0))
        st = rti_init(cfg, x0, xT)
        Aks, Bks, cks = trajectory_jacobians(F, st.X_lin, st.U_lin)
        data, _, _ = build_condensed_qp(
            Aks, Bks, cks, x0, cfg.Q, cfg.R, cfg.Qf, st.x_ref,
            cfg.x_min, cfg.x_max, cfg.u_min, cfg.u_max,
            cfg.Gx, cfg.gx_l, cfg.gx_u, cfg.Gu, cfg.gu_l, cfg.gu_u,
        )

        # compacted operator reproduces dense A exactly on every column
        ops = _compact_structure(data.A, segs)
        A_apply, AT_apply = _make_A_ops(ops, data.n)
        for j in range(0, data.n, 7):
            e = jnp.zeros(data.n).at[j].set(1.0)
            np.testing.assert_allclose(
                np.asarray(A_apply(e)), np.asarray(data.A @ e), atol=1e-6)
            np.testing.assert_allclose(
                np.asarray(AT_apply(data.A @ e)),
                np.asarray(data.A.T @ (data.A @ e)), atol=1e-4)

        s_struct = jax.jit(
            lambda d: solve(d, config=_condensed_admm_cfg(cfg)))(data)
        s_dense = jax.jit(
            lambda d: solve(
                d, config=base_admm.replace(row_structure=(("dense", 1),))
            ))(data)
        assert int(s_struct.status) == 0 and int(s_dense.status) == 0
        np.testing.assert_allclose(
            np.asarray(s_struct.x), np.asarray(s_dense.x), atol=5e-3)


class TestCondensedClosedLoop:
    @pytest.mark.slow
    def test_landing_quality_matches_demo_criteria(self):
        """Condensed real-time config lands the demo batch within criteria."""
        p = Rocket3DoFParams()
        cfg = RTIConfig(
            N=20, accept_pri_tol=5e-3, condensed=True,
            admm=ADMMConfig(max_iter=100, polish=False, adaptive_rho=False,
                            scaling=3),
        )
        F = lambda x, u: r3.step(p, x, u, cfg.dt)
        xT = jnp.zeros(7).at[0].set(2.0)
        B, steps = 4, 110
        x0s = jnp.tile(jnp.array([2.0, 30.0, 1.0, -0.5, -3.0, 0.0, 0.0]), (B, 1))
        x0s = x0s.at[:, 1].add(jnp.linspace(-3, 3, B))
        x0s = x0s.at[:, 2].add(jnp.linspace(-1, 1, B))

        def run_one(x):
            Xr = pad_reference(
                cubic_descent_reference(x, xT, steps - 10, cfg.dt), cfg.N + 20
            )
            return rti_closed_loop(F, cfg, x, xT, steps, X_ref_full=Xr)

        out = jax.jit(jax.vmap(run_one))(x0s)
        v = jax.vmap(jnp.linalg.norm)(out["x_final"][:, 4:7])
        perr = jax.vmap(jnp.linalg.norm)(out["x_final"][:, 2:4])
        assert bool(out["landed"].all())
        assert float(v.max()) < 2.0
        assert float(perr.max()) < 1.0
