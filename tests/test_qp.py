"""QP solver tests: KKT certificates, oracle parity (scipy f64), batching,
infeasibility detection, and the MPC QP structure.

The north-star parity check (u0 vs the OSQP-settings reference to 1e-3,
BASELINE.md) is encoded here as agreement with an f64 scipy solution of the
same QP.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.optimize

from gpmpc_tpu.ops.qp import (
    ADMMConfig,
    MAX_ITER,
    PRIMAL_INFEASIBLE,
    SOLVED,
    QPData,
    build_mpc_qp,
    join_z,
    solve,
    solve_batch,
    split_z,
)

INF = 1e30


def scipy_qp_oracle(P, q, A, l, u, tol=1e-9):
    """f64 oracle: solve min ½xPx+qx s.t. l≤Ax≤u via SLSQP from a few starts."""
    P, q, A, l, u = (np.asarray(a, np.float64) for a in (P, q, A, l, u))
    n = q.shape[0]
    cons = []
    eq = np.isfinite(l) & np.isfinite(u) & (u - l < 1e-12)
    if eq.any():
        cons.append({"type": "eq", "fun": lambda x: A[eq] @ x - l[eq],
                     "jac": lambda x: A[eq]})
    lo = ~eq & (l > -1e20)
    if lo.any():
        cons.append({"type": "ineq", "fun": lambda x: A[lo] @ x - l[lo],
                     "jac": lambda x: A[lo]})
    hi = ~eq & (u < 1e20)
    if hi.any():
        cons.append({"type": "ineq", "fun": lambda x: u[hi] - A[hi] @ x,
                     "jac": lambda x: -A[hi]})
    best = None
    for seed in range(3):
        x0 = np.random.default_rng(seed).normal(size=n) * 0.1
        r = scipy.optimize.minimize(
            lambda x: 0.5 * x @ P @ x + q @ x,
            x0,
            jac=lambda x: P @ x + q,
            constraints=cons,
            method="SLSQP",
            options={"maxiter": 500, "ftol": tol},
        )
        if best is None or r.fun < best.fun:
            best = r
    return best.x


def check_kkt(data: QPData, sol, tol=2e-3):
    """Direct optimality certificate: primal feasibility, stationarity,
    complementary slackness of the returned (x, y)."""
    P, q, A, l, u = (np.asarray(a, np.float64) for a in
                     (data.P, data.q, data.A, data.l, data.u))
    x, y = np.asarray(sol.x, np.float64), np.asarray(sol.y, np.float64)
    Ax = A @ x
    scale = max(1.0, np.abs(Ax).max())
    assert (Ax - u).max() < tol * scale, "primal upper feasibility"
    assert (l - Ax).max() < tol * scale, "primal lower feasibility"
    stat = P @ x + q + A.T @ y
    sscale = max(1.0, np.abs(P @ x).max(), np.abs(q).max())
    assert np.abs(stat).max() < tol * sscale, f"stationarity {np.abs(stat).max()}"
    # complementarity: y⁺ pairs with u-active rows, y⁻ with l-active rows
    comp = np.maximum(y, 0) * np.clip(u - Ax, 0, 1e10) - np.minimum(y, 0) * np.clip(
        Ax - l, 0, 1e10
    )
    assert np.abs(comp).max() < 10 * tol * scale, "complementary slackness"


def random_qp(rng, n=12, m=18, eq_rows=4):
    G = rng.normal(size=(n, n))
    P = G @ G.T + 0.1 * np.eye(n)
    q = rng.normal(size=n)
    A = rng.normal(size=(m, n))
    b = rng.normal(size=eq_rows) * 0.3
    l = np.concatenate([b, -np.abs(rng.normal(size=m - eq_rows)) - 0.5])
    u = np.concatenate([b, np.abs(rng.normal(size=m - eq_rows)) + 0.5])
    return QPData(
        P=jnp.asarray(P, jnp.float32),
        q=jnp.asarray(q, jnp.float32),
        A=jnp.asarray(A, jnp.float32),
        l=jnp.asarray(l, jnp.float32),
        u=jnp.asarray(u, jnp.float32),
    )


class TestADMM:
    def test_unconstrained_equals_newton(self, rng):
        data = random_qp(rng, n=8, m=8, eq_rows=0)
        data = data.replace(l=jnp.full(8, -INF), u=jnp.full(8, INF))
        sol = solve(data)
        x_star = np.linalg.solve(np.asarray(data.P, np.float64), -np.asarray(data.q, np.float64))
        np.testing.assert_allclose(sol.x, x_star, atol=2e-3)

    def test_equality_constrained_kkt_solution(self, rng):
        n, me = 10, 4
        data = random_qp(rng, n=n, m=me, eq_rows=me)
        sol = solve(data, config=ADMMConfig(max_iter=500))
        # analytic KKT solve in f64
        P = np.asarray(data.P, np.float64)
        A = np.asarray(data.A, np.float64)
        K = np.block([[P, A.T], [A, np.zeros((me, me))]])
        rhs = np.concatenate([-np.asarray(data.q, np.float64), np.asarray(data.l, np.float64)])
        xy = np.linalg.solve(K, rhs)
        np.testing.assert_allclose(sol.x, xy[:n], atol=3e-3)
        assert int(sol.status) == SOLVED

    def test_iter_unroll_bitwise_identical(self, rng):
        """ADMMConfig.iter_unroll only amortizes loop-trip overhead — the
        iterate sequence must be BITWISE identical to the rolled loop."""
        data = random_qp(rng)
        base = ADMMConfig(max_iter=100, check_interval=25, polish=False,
                          adaptive_rho=False)
        sol1 = solve(data, config=base)
        sol5 = solve(data, config=base.replace(iter_unroll=5))
        # unroll need not divide the chunk either
        sol7 = solve(data, config=base.replace(iter_unroll=7))
        for a, b in ((sol1, sol5), (sol1, sol7)):
            np.testing.assert_array_equal(np.asarray(a.x), np.asarray(b.x))
            np.testing.assert_array_equal(np.asarray(a.y), np.asarray(b.y))
            assert int(a.status) == int(b.status)
            assert int(a.iterations) == int(b.iterations)

    def test_bf16_operator_consistent_factor_stays_bounded(self, rng):
        """matvec_dtype='bf16' must factor the KKT from the bf16-ROUNDED
        operator Ā. With the factor from the f32 A the splitting map is
        expansive on ill-conditioned QPs (measured: iterates diverged to
        ~1e6 by 200 iterations before the fix); with a consistent pair the
        bulk is exact ADMM on QP(Ā) and stays near the f32 solution."""
        data = random_qp(rng)
        f32 = solve(data, config=ADMMConfig(
            max_iter=400, check_interval=50, adaptive_rho=False,
            infeas_certs=False))
        bf16 = solve(data, config=ADMMConfig(
            max_iter=400, check_interval=50, adaptive_rho=False,
            infeas_certs=False, matvec_dtype="bf16"))
        # bounded near the f32 solution (fixed-point shift is the bf16
        # quantization of the operator, amplified by the equality-row ρ)
        assert float(jnp.max(jnp.abs(bf16.x - f32.x))) < 1.0
        assert float(bf16.pri_res) < 1.0

    def test_bf16_f32_tail_recovers_f32_fixed_point(self, rng):
        """tail_f32_iters: after the bf16 bulk, f32-operand iterations (with
        their own f32-consistent factorization) re-converge the iterate to
        the f32 fixed point — the quantization bias is removed, not merely
        bounded."""
        data = random_qp(rng)
        f32 = solve(data, config=ADMMConfig(
            max_iter=400, check_interval=50, adaptive_rho=False,
            infeas_certs=False))
        tail = solve(data, config=ADMMConfig(
            max_iter=80, check_interval=40, adaptive_rho=False,
            infeas_certs=False, matvec_dtype="bf16", tail_f32_iters=320))
        np.testing.assert_allclose(
            np.asarray(tail.x), np.asarray(f32.x), atol=5e-3)
        assert float(tail.pri_res) < 1e-3

    def test_bf16_diag_row_structure_operator_consistent(self, rng):
        """With a row_structure containing a "diag" segment, _cast_ops keeps
        the diag rows' stream f32 — so the bf16 KKT factorization must keep
        those rows f32 too (operator/factor consistency is per ROW). Before
        the segment-aware rounding, the factor rounded ALL rows and the
        shipped condensed RT configs (which always declare a diag segment for
        the control-bound rows) retained a small inconsistency."""
        n = 12
        extra = rng.normal(size=(8, n))
        A = np.concatenate([np.diag(1.0 + 0.5 * rng.random(n)), extra])
        G = rng.normal(size=(n, n))
        data = QPData(
            P=jnp.asarray(G @ G.T + 0.1 * np.eye(n), jnp.float32),
            q=jnp.asarray(rng.normal(size=n), jnp.float32),
            A=jnp.asarray(A, jnp.float32),
            l=jnp.asarray(np.full(20, -1.0), jnp.float32),
            u=jnp.asarray(np.full(20, 1.0), jnp.float32),
        )
        segs = (("diag", n), ("dense", 8))
        f32 = solve(data, config=ADMMConfig(
            max_iter=400, check_interval=50, adaptive_rho=False,
            infeas_certs=False, row_structure=segs))
        tail = solve(data, config=ADMMConfig(
            max_iter=200, check_interval=50, adaptive_rho=False,
            infeas_certs=False, row_structure=segs, matvec_dtype="bf16",
            tail_f32_iters=200))
        np.testing.assert_allclose(
            np.asarray(tail.x), np.asarray(f32.x), atol=5e-3)
        assert float(tail.pri_res) < 1e-3

    def test_non_dividing_check_interval_raises(self, rng):
        """A (max_iter, check_interval) pair that doesn't divide silently
        truncates the iteration budget (floor(mi/ci)*ci) — now a hard error."""
        data = random_qp(rng)
        with pytest.raises(ValueError, match="multiple of"):
            solve(data, config=ADMMConfig(max_iter=80, check_interval=50))

    def test_bf16_tail_on_pallas_path_raises(self, rng):
        """tail_f32_iters only exists on the XLA stream path; the Pallas
        chunk applies the f32 A in VMEM, so the combination must refuse to
        run rather than silently skip the tail after cutting the budget."""
        data = random_qp(rng)
        with pytest.raises(ValueError, match="Pallas"):
            solve(data, config=ADMMConfig(
                max_iter=100, check_interval=50, matvec_dtype="bf16",
                tail_f32_iters=20, use_pallas="lanes_interpret"))

    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_random_qp_matches_scipy_oracle(self, seed):
        rng = np.random.default_rng(seed)
        data = random_qp(rng)
        sol = solve(data, config=ADMMConfig(max_iter=1000, polish=True))
        x_ref = scipy_qp_oracle(data.P, data.q, data.A, data.l, data.u)
        np.testing.assert_allclose(sol.x, x_ref, atol=1e-3)
        check_kkt(data, sol)

    def test_box_qp_projection(self, rng):
        """min ½‖x−a‖² s.t. 0 ≤ x ≤ 1 is clip(a, 0, 1)."""
        n = 6
        a = rng.normal(size=n) * 2
        data = QPData(
            P=jnp.eye(n),
            q=jnp.asarray(-a, jnp.float32),
            A=jnp.eye(n),
            l=jnp.zeros(n),
            u=jnp.ones(n),
        )
        sol = solve(data)
        np.testing.assert_allclose(sol.x, np.clip(a, 0, 1), atol=1e-3)

    def test_warm_start_converges_faster(self, rng):
        data = random_qp(rng)
        cfg = ADMMConfig(max_iter=1000, eps_abs=1e-5, eps_rel=1e-5)
        cold = solve(data, config=cfg)
        warm = solve(data, x0=cold.x, y0=cold.y, config=cfg, rho0=cold.rho)
        assert int(warm.iterations) <= int(cold.iterations)

    def test_primal_infeasible_detected(self):
        # x ≥ 1 and x ≤ −1 simultaneously
        data = QPData(
            P=jnp.eye(1),
            q=jnp.zeros(1),
            A=jnp.array([[1.0], [1.0]]),
            l=jnp.array([1.0, -INF]),
            u=jnp.array([INF, -1.0]),
        )
        sol = solve(data, config=ADMMConfig(max_iter=1000))
        assert int(sol.status) in (PRIMAL_INFEASIBLE, MAX_ITER)
        assert int(sol.status) != SOLVED

    def test_batch_matches_single(self, rng):
        datas = [random_qp(np.random.default_rng(s)) for s in range(4)]
        batch = jax.tree.map(lambda *xs: jnp.stack(xs), *datas)
        cfg = ADMMConfig(max_iter=400)
        bsol = solve_batch(batch, config=cfg)
        for i, d in enumerate(datas):
            s = solve(d, config=cfg)
            np.testing.assert_allclose(bsol.x[i], s.x, atol=1e-4)

    def test_jit_and_grad_safe(self, rng):
        data = random_qp(rng)
        f = jax.jit(lambda d: solve(d).x)
        x1 = f(data)
        x2 = f(data)
        np.testing.assert_allclose(x1, x2, atol=1e-6)


class TestMPCQP:
    def _double_integrator_qp(self, N=10, dt=0.1):
        """1-D double integrator: x=[p,v], u=a; drive to origin."""
        A = jnp.array([[1.0, dt], [0.0, 1.0]])
        B = jnp.array([[0.5 * dt * dt], [dt]])
        Aks = jnp.tile(A, (N, 1, 1))
        Bks = jnp.tile(B, (N, 1, 1))
        cks = jnp.zeros((N, 2))
        x0 = jnp.array([1.0, 0.0])
        Q = jnp.diag(jnp.array([10.0, 1.0]))
        R = jnp.eye(1) * 0.1
        Qf = Q * 10
        x_ref = jnp.zeros((N + 1, 2))
        data = build_mpc_qp(
            Aks, Bks, cks, x0, Q, R, Qf, x_ref,
            x_min=jnp.full(2, -INF), x_max=jnp.full(2, INF),
            u_min=jnp.array([-2.0]), u_max=jnp.array([2.0]),
        )
        return data, (N, 2, 1), x0, A, B

    def test_shapes_and_roundtrip(self):
        data, (N, n_x, n_u), *_ = self._double_integrator_qp()
        nz = (N + 1) * n_x + N * n_u
        assert data.P.shape == (nz, nz)
        assert data.A.shape == ((N + 1) * n_x + nz, nz)
        X = jnp.arange((N + 1) * n_x, dtype=jnp.float32).reshape(N + 1, n_x)
        U = -jnp.arange(N * n_u, dtype=jnp.float32).reshape(N, n_u)
        X2, U2 = split_z(join_z(X, U), N, n_x, n_u)
        np.testing.assert_array_equal(X, X2)
        np.testing.assert_array_equal(U, U2)

    def test_double_integrator_solution(self):
        data, (N, n_x, n_u), x0, A, B = self._double_integrator_qp()
        sol = solve(data, config=ADMMConfig(max_iter=1000, polish=True))
        assert int(sol.status) == SOLVED
        X, U = split_z(sol.x, N, n_x, n_u)
        # initial condition and dynamics feasibility
        np.testing.assert_allclose(X[0], x0, atol=1e-3)
        for k in range(N):
            np.testing.assert_allclose(X[k + 1], A @ X[k] + B @ U[k], atol=2e-3)
        # drives toward origin
        assert abs(float(X[-1, 0])) < 0.3  # bang-bang limit: can close at most ~0.75 of the gap
        check_kkt(data, sol)

    @pytest.mark.slow  # demoted from the default tier (r5: <300 s budget)
    def test_matches_scipy_oracle(self):
        data, (N, n_x, n_u), *_ = self._double_integrator_qp(N=5)
        sol = solve(data, config=ADMMConfig(max_iter=2000, polish=True))
        x_ref = scipy_qp_oracle(data.P, data.q, data.A, data.l, data.u)
        Xr, Ur = split_z(jnp.asarray(x_ref, jnp.float32), N, n_x, n_u)
        X, U = split_z(sol.x, N, n_x, n_u)
        np.testing.assert_allclose(U, Ur, atol=1e-3)

    def test_control_bounds_active(self):
        data, (N, n_x, n_u), *_ = self._double_integrator_qp()
        # start far away → saturating control
        data2 = data.replace(
            l=data.l.at[:2].set(jnp.array([5.0, 0.0])),
            u=data.u.at[:2].set(jnp.array([5.0, 0.0])),
        )
        sol = solve(data2, config=ADMMConfig(max_iter=1000))
        _, U = split_z(sol.x, N, n_x, n_u)
        assert float(jnp.min(U)) >= -2.0 - 1e-3
        assert float(jnp.max(U)) <= 2.0 + 1e-3
        assert float(jnp.min(U)) < -1.9  # actually saturates


class TestCanonicalParity:
    """BASELINE.md north star: u0 on the canonical N=20, dt=0.1 landing QP
    must match the OSQP reference to 1e-3. OSQP's C solver is not
    installable here, so the committed golden fixtures
    (tests/fixtures/qp_golden.npz, generated by
    scripts/make_golden_fixtures.py) carry two independent f64 oracles:
    ``x_star`` — the exact optimum from a dense Mehrotra interior-point
    method, KKT-certified to 1e-8 at generation time — and ``x_osqp`` — a
    faithful NumPy rendering of OSQP's published algorithm (Ruiz
    equilibration, per-row rho, alpha relaxation, OSQP's termination test)
    run to its eps=1e-4 ``solved`` state at the reference's settings
    (osqp_rti.py:54-60). The strictly convex QP has a unique optimum, so
    agreement with ``x_star`` certifies agreement with any converged OSQP
    run."""

    FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "qp_golden.npz")
    SCENARIOS = ("canonical", "high_fast", "low_slow", "lateral")
    N, n_x, n_u = 20, 7, 3

    def _rebuild_qp(self, x0):
        from gpmpc_tpu.dynamics import Rocket3DoFParams, rocket3dof as r3, trajectory_jacobians

        p = Rocket3DoFParams()
        N, dt = self.N, 0.1
        x0 = jnp.asarray(x0, jnp.float32)
        xT = jnp.zeros(7).at[0].set(2.0)
        F = lambda x, u: r3.step(p, x, u, dt)
        X_lin = jnp.linspace(x0, xT, N + 1)
        U_lin = jnp.tile(jnp.array([2.0, 0.0, 0.0]), (N, 1))
        Aks, Bks, cks = trajectory_jacobians(F, X_lin, U_lin)
        Q = jnp.diag(jnp.array([0.0, 10.0, 10.0, 10.0, 1.0, 1.0, 1.0]))
        R = jnp.eye(3) * 0.01
        return build_mpc_qp(
            Aks, Bks, cks, x0, Q, R, Q * 10, jnp.tile(xT, (N + 1, 1)),
            x_min=jnp.array([-1e20, -100.0, -100.0, -100.0, -50.0, -50.0, -50.0]),
            x_max=jnp.array([1e20, 500.0, 100.0, 100.0, 50.0, 50.0, 50.0]),
            u_min=jnp.array([0.3, -5.0, -5.0]),
            u_max=jnp.array([5.0, 5.0, 5.0]),
        )

    @pytest.mark.parametrize("name", SCENARIOS)
    def test_u0_matches_golden_fixtures(self, name):
        fx = np.load(self.FIXTURE)
        data = self._rebuild_qp(fx[f"{name}/x0"])

        # drift guard: the QP we build today must BE the fixtured QP, else
        # the comparison is between different problems — regenerate with
        # scripts/make_golden_fixtures.py after intentional builder changes
        for part in ("P", "q", "A", "l", "u"):
            ours = np.asarray(getattr(data, part), np.float64)
            np.testing.assert_allclose(
                ours, fx[f"{name}/{part}"], rtol=1e-5, atol=1e-5,
                err_msg=f"build_mpc_qp drifted from fixture ({name}/{part}); "
                        f"rerun scripts/make_golden_fixtures.py",
            )

        sol = solve(data, config=ADMMConfig(max_iter=400, polish=True))
        assert int(sol.status) == SOLVED or float(sol.pri_res) < 1e-2
        _, U = split_z(sol.x, self.N, self.n_x, self.n_u)
        _, U_star = split_z(jnp.asarray(fx[f"{name}/x_star"], jnp.float32),
                            self.N, self.n_x, self.n_u)
        _, U_osqp = split_z(jnp.asarray(fx[f"{name}/x_osqp"], jnp.float32),
                            self.N, self.n_x, self.n_u)
        # 1e-3 vs the certified optimum (the solver-independent value);
        # the unpolished eps-1e-4 OSQP answer itself wobbles ~3e-3 around
        # the optimum at active bounds, so parity with it is looser
        np.testing.assert_allclose(U[0], U_star[0], atol=1e-3)
        np.testing.assert_allclose(U[0], U_osqp[0], atol=5e-3)

    def test_symmetry_certificate_canonical(self):
        # the canonical scenario is exactly symmetric in y/z, so the optimal
        # lateral controls are zero — an oracle-free optimality certificate
        fx = np.load(self.FIXTURE)
        data = self._rebuild_qp(fx["canonical/x0"])
        sol = solve(data, config=ADMMConfig(max_iter=400, polish=True))
        _, U = split_z(sol.x, self.N, self.n_x, self.n_u)
        assert float(jnp.abs(U[:, 1:]).max()) < 1e-3
