"""Calibrate the NumPy OSQP oracle against EXTERNALLY-derived optima.

The golden QP fixtures (tests/fixtures/qp_golden.npz) rest on
``tests/_oracles.py::osqp_numpy`` — a faithful NumPy rendering of OSQP's
published algorithm (Stellato et al. 2020). Until now that oracle was only
checked against itself (exact-KKT IPM optima it also generated). Real OSQP
binaries are not installable here (no network), so this module anchors the
oracle to solutions derived WITHOUT running any of our solvers:

1. The OSQP documentation's demo problem (the setup/solve example shipped
   with every OSQP release) — its optimum is derivable by hand: eliminate
   the equality, the unconstrained minimizer violates the x₂ ≤ 0.7 box, so
   x* = (0.3, 0.7) with objective 1.88.
2. Equality-constrained QPs whose optima follow in closed form from the
   KKT linear system (computed here with plain numpy.linalg against the
   analytic formula, not with any QP iteration).
3. A pure box projection with a coordinate-wise closed form.

Every expected solution is additionally certified by first-principles KKT
checks computed inline — stationarity with explicitly constructed
multipliers and complementary slackness — so the test anchors the oracle to
optimality conditions, not to another implementation of the same algorithm.
"""

import numpy as np
import pytest

from tests._oracles import osqp_numpy

BIG = 1e30


def _kkt_certify(P, q, A, l, u, x, y, tol=1e-6):
    """First-principles KKT check of (x, y): stationarity, primal
    feasibility, sign conditions and complementary slackness."""
    z = A @ x
    assert np.all(z >= l - tol) and np.all(z <= u + tol), "primal infeasible"
    r = P @ x + q + A.T @ y
    assert np.max(np.abs(r)) < tol, f"stationarity residual {np.max(np.abs(r))}"
    for i in range(A.shape[0]):
        if l[i] == u[i]:
            continue  # equality row: free multiplier
        if y[i] > tol:  # active at the upper bound
            assert z[i] > u[i] - 1e-5, (i, z[i], u[i])
        elif y[i] < -tol:  # active at the lower bound
            assert z[i] < l[i] + 1e-5, (i, z[i], l[i])


class TestOSQPDocsDemo:
    """The problem from OSQP's own setup-and-solve documentation example."""

    P = np.array([[4.0, 1.0], [1.0, 2.0]])
    q = np.array([1.0, 1.0])
    A = np.array([[1.0, 1.0], [1.0, 0.0], [0.0, 1.0]])
    l = np.array([1.0, 0.0, 0.0])
    u = np.array([1.0, 0.7, 0.7])
    # hand derivation: on x1 + x2 = 1 the objective is 2x1² − x1 + 2 with
    # minimizer x1 = 0.25 ⇒ x2 = 0.75 > 0.7, so the box clips x2 at 0.7
    x_star = np.array([0.3, 0.7])
    obj_star = 1.88

    def test_expected_solution_is_kkt_certified(self):
        """The hand-derived optimum satisfies KKT with explicit multipliers
        (independent of any solver). Stationarity: Px*+q = [2.9, 2.7]; the
        equality multiplier ν and the x₂-box multiplier μ solve
        ν = −2.9, μ = −2.7 − ν = 0.2 ≥ 0."""
        y = np.array([-2.9, 0.0, 0.2])
        _kkt_certify(self.P, self.q, self.A, self.l, self.u, self.x_star, y)
        obj = 0.5 * self.x_star @ self.P @ self.x_star + self.q @ self.x_star
        assert abs(obj - self.obj_star) < 1e-12

    def test_oracle_matches_documented_optimum(self):
        x, info = osqp_numpy(
            self.P, self.q, self.A, self.l, self.u,
            max_iter=4000, eps_abs=1e-8, eps_rel=1e-8,
        )
        np.testing.assert_allclose(x, self.x_star, atol=2e-6)
        obj = 0.5 * x @ self.P @ x + self.q @ x
        assert abs(obj - self.obj_star) < 1e-6


class TestClosedFormEqualityQP:
    """min ½xᵀPx + qᵀx s.t. Ax = b has the closed-form KKT solution
    [P Aᵀ; A 0][x; ν] = [−q; b] — solved with plain linear algebra."""

    def test_oracle_matches_kkt_linear_system(self):
        rng = np.random.default_rng(7)
        n, m = 6, 2
        M = rng.normal(size=(n, n))
        P = M @ M.T + n * np.eye(n)
        q = rng.normal(size=n)
        A = rng.normal(size=(m, n))
        b = rng.normal(size=m)
        K = np.block([[P, A.T], [A, np.zeros((m, m))]])
        sol = np.linalg.solve(K, np.concatenate([-q, b]))
        x_star, nu_star = sol[:n], sol[n:]
        _kkt_certify(P, q, A, b, b, x_star, nu_star)

        x, info = osqp_numpy(
            P, q, A, b, b, max_iter=4000, eps_abs=1e-9, eps_rel=1e-9,
        )
        np.testing.assert_allclose(x, x_star, atol=1e-5)


class TestBoxProjection:
    """min ½‖x − c‖² s.t. l ≤ x ≤ u is the coordinate-wise clip."""

    def test_oracle_matches_clip(self):
        rng = np.random.default_rng(3)
        n = 8
        c = 3.0 * rng.normal(size=n)
        lo = np.full(n, -1.0)
        hi = np.full(n, 1.0)
        x_star = np.clip(c, lo, hi)

        x, info = osqp_numpy(
            np.eye(n), -c, np.eye(n), lo, hi,
            max_iter=4000, eps_abs=1e-9, eps_rel=1e-9,
        )
        np.testing.assert_allclose(x, x_star, atol=1e-6)


class TestReferenceSettingsStillSolve:
    """At the REFERENCE's OSQP settings (osqp_rti.py:54-60 — the ones the
    golden fixtures were generated with), the oracle still reaches the
    documented demo optimum to its advertised tolerance."""

    def test_demo_at_reference_settings(self):
        d = TestOSQPDocsDemo
        x, info = osqp_numpy(
            d.P, d.q, d.A, d.l, d.u,
            max_iter=4000, eps_abs=1e-6, eps_rel=1e-6,
        )
        np.testing.assert_allclose(x, d.x_star, atol=1e-4)
