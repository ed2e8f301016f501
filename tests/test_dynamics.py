"""Dynamics-layer tests: Jacobian parity, integrator order, quaternion norm,
constraint evaluators, vmapped rollouts.

Mirrors the reference's intended test partition (SURVEY.md §4) with the
`verify_jacobians` numeric-vs-analytic template (`linearization.py:171-240`).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpmpc_tpu.dynamics import (
    AffineModel,
    Rocket3DoF,
    Rocket3DoFParams,
    Rocket6DoFParams,
    discretize_jacobians,
    hermite_simpson_defect,
    integrate_trajectory,
    numerical_jacobians,
    quaternion_exponential_step,
    quaternion_multiply,
    rk4_step,
    verify_jacobians,
)
from gpmpc_tpu.dynamics import rocket3dof as r3
from gpmpc_tpu.dynamics import rocket6dof as r6


@pytest.fixture
def p3():
    return Rocket3DoFParams()


@pytest.fixture
def p6():
    return Rocket6DoFParams()


@pytest.fixture
def x3():
    return jnp.array([1.8, 20.0, 1.0, -2.0, -3.0, 0.5, 0.2])


@pytest.fixture
def u3():
    return jnp.array([2.0, 0.3, -0.1])


@pytest.fixture
def x6():
    q = jnp.array([0.99, 0.05, 0.08, 0.03])
    q = q / jnp.linalg.norm(q)
    return jnp.concatenate(
        [
            jnp.array([1.9, 15.0, 0.5, -1.0, -2.0, 0.1, 0.3]),
            q,
            jnp.array([0.05, -0.02, 0.1]),
        ]
    )


@pytest.fixture
def u6():
    return jnp.array([2.5, 0.2, -0.3])


class TestRocket3DoF:
    def test_dynamics_values(self, p3, x3, u3):
        dx = r3.f(p3, x3, u3)
        m = x3[0]
        np.testing.assert_allclose(dx[1:4], x3[4:7], rtol=1e-6)
        np.testing.assert_allclose(
            dx[4:7], np.asarray(u3) / m + np.asarray(p3.g_I), rtol=1e-5
        )
        T = np.linalg.norm(u3)
        np.testing.assert_allclose(dx[0], -p3.alpha * T, rtol=1e-5)

    def test_closed_form_jacobians_match_fd(self, p3, x3, u3):
        rep = verify_jacobians(
            lambda x, u: r3.f(p3, x, u),
            lambda x, u: (r3.A_continuous(p3, x, u), r3.B_continuous(p3, x, u)),
            x3,
            u3,
            rtol=1e-2,
            atol=1e-3,
        )
        assert rep["ok"], rep

    def test_ad_jacobians_match_fd(self, p3, x3, u3):
        rep = verify_jacobians(
            lambda x, u: r3.f(p3, x, u),
            lambda x, u: r3.linearize_continuous(p3, x, u),
            x3,
            u3,
            rtol=1e-2,
            atol=1e-3,
        )
        assert rep["ok"], rep

    def test_discrete_linearization_predicts_step(self, p3, x3, u3):
        A, B, c = r3.linearize_discrete(p3, x3, u3, 0.1)
        pred = A @ x3 + B @ u3 + c
        np.testing.assert_allclose(pred, r3.step(p3, x3, u3, 0.1), atol=1e-5)
        # affine model stays accurate for small perturbations
        dx = 1e-3 * jnp.ones_like(x3)
        pred2 = A @ (x3 + dx) + B @ u3 + c
        np.testing.assert_allclose(pred2, r3.step(p3, x3 + dx, u3, 0.1), atol=1e-4)

    def test_hover_thrust_balances(self, p3, x3):
        u = r3.hover_thrust(p3, x3)
        dx = r3.f(p3, x3, u)
        np.testing.assert_allclose(dx[4:7], 0.0, atol=1e-6)

    def test_clamp_thrust(self, p3):
        params = p3.replace(T_min=0.3, T_max=5.0)
        u = jnp.array([10.0, 0.0, 0.0])
        np.testing.assert_allclose(np.linalg.norm(r3.clamp_thrust(params, u)), 5.0, rtol=1e-6)
        u = jnp.array([0.01, 0.0, 0.0])
        np.testing.assert_allclose(np.linalg.norm(r3.clamp_thrust(params, u)), 0.3, rtol=1e-6)

    def test_glideslope_sign(self, p3):
        # directly above pad: satisfied (negative)
        x = jnp.array([2.0, 10.0, 0.0, 0.0, 0, 0, 0])
        assert r3.glide_slope_constraint(p3, x) < 0
        # far off to the side at low altitude: violated
        x = jnp.array([2.0, 1.0, 10.0, 0.0, 0, 0, 0])
        assert r3.glide_slope_constraint(p3, x) > 0

    def test_vmapped_rollout(self, p3, u3):
        B = 16
        x0 = jnp.tile(jnp.array([2.0, 30.0, 0.0, 0.0, -3.0, 0.0, 0.0]), (B, 1))
        x0 = x0.at[:, 1].add(jnp.linspace(0, 5, B))
        U = jnp.tile(u3, (B, 10, 1))
        X = jax.vmap(lambda x, u: r3.simulate(p3, x, u, 0.1))(x0, U)
        assert X.shape == (B, 11, 7)
        assert bool(jnp.all(jnp.isfinite(X)))

    def test_oo_facade(self, x3, u3):
        rocket = Rocket3DoF()
        x1 = rocket.step(x3, u3, 0.1)
        assert x1.shape == (7,)
        assert rocket.fuel_remaining(x3) > 0


class TestRocket6DoF:
    def test_quaternion_norm_preserved(self, p6, x6, u6):
        x = x6
        for _ in range(20):
            x = r6.step(p6, x, u6, 0.1)
        np.testing.assert_allclose(jnp.linalg.norm(x[7:11]), 1.0, atol=1e-5)

    def test_ad_jacobians_match_fd(self, p6, x6, u6):
        rep = verify_jacobians(
            lambda x, u: r6.f(p6, x, u),
            lambda x, u: r6.linearize_continuous(p6, x, u),
            x6,
            u6,
            rtol=1e-2,
            atol=1e-3,
        )
        assert rep["ok"], rep

    def test_dcm_orthonormal(self, x6):
        C = r6.dcm_from_quaternion(x6[7:11])
        np.testing.assert_allclose(C @ C.T, jnp.eye(3), atol=1e-6)
        np.testing.assert_allclose(jnp.linalg.det(C), 1.0, atol=1e-6)

    def test_identity_attitude_dynamics(self, p6):
        """At identity attitude, body thrust along +x must push along +x inertial."""
        x = r6.create_initial_state(p6, altitude=10.0)
        u = jnp.array([3.0, 0.0, 0.0])
        dx = r6.f(p6, x, u)
        np.testing.assert_allclose(dx[4], 3.0 / x[0] + p6.g_I[0], rtol=1e-5)
        np.testing.assert_allclose(dx[5:7], 0.0, atol=1e-7)
        # thrust through the CoM offset along body x produces no torque
        np.testing.assert_allclose(dx[11:14], 0.0, atol=1e-7)

    def test_offaxis_thrust_torque(self, p6):
        x = r6.create_initial_state(p6, altitude=10.0)
        u = jnp.array([3.0, 0.5, 0.0])
        dx = r6.f(p6, x, u)
        # torque = r_T_B × u = [-0.25,0,0] × [3,0.5,0] = [0,0,-0.125]
        torque = jnp.cross(p6.r_T_B, u)
        expected = jnp.linalg.solve(p6.J_B, torque)
        np.testing.assert_allclose(dx[11:14], expected, rtol=1e-5)

    def test_hover_thrust_balances(self, p6, x6):
        u = r6.hover_thrust(p6, x6)
        dx = r6.f(p6, x6, u)
        np.testing.assert_allclose(dx[4:7], 0.0, atol=1e-5)

    def test_tilt_and_gimbal(self, p6):
        # identity attitude: zero tilt
        assert abs(float(r6.tilt_angle(jnp.array([1.0, 0, 0, 0])))) < 1e-6
        # 90° rotation about y: tilt = 90°
        q = jnp.array([jnp.cos(jnp.pi / 4), 0.0, jnp.sin(jnp.pi / 4), 0.0])
        np.testing.assert_allclose(r6.tilt_angle(q), jnp.pi / 2, atol=1e-5)
        # gimbal: thrust along +x is 0; perpendicular is 90°
        assert r6.gimbal_constraint(p6, jnp.array([1.0, 0, 0])) < 0
        assert r6.gimbal_constraint(p6, jnp.array([0.0, 1.0, 0])) > 0

    def test_clamp_gimbal(self, p6):
        u = jnp.array([1.0, 2.0, 0.0])  # way outside 20° cone
        v = r6.clamp_gimbal(p6, u)
        np.testing.assert_allclose(jnp.linalg.norm(v), jnp.linalg.norm(u), rtol=1e-5)
        assert float(r6.gimbal_constraint(p6, v)) < 1e-5
        # inside cone: unchanged
        u_in = jnp.array([3.0, 0.1, 0.0])
        np.testing.assert_allclose(r6.clamp_gimbal(p6, u_in), u_in, atol=1e-7)

    def test_discrete_linearization(self, p6, x6, u6):
        A, B, c = r6.linearize_discrete(p6, x6, u6, 0.1)
        pred = A @ x6 + B @ u6 + c
        np.testing.assert_allclose(pred, r6.step(p6, x6, u6, 0.1), atol=1e-5)


class TestIntegrators:
    def test_rk4_order(self):
        """RK4 on ẋ = -x should be ~O(dt⁴) accurate."""
        f = lambda x, u: -x
        x0 = jnp.array([1.0])
        u = jnp.zeros(1)
        err = lambda dt: abs(float(rk4_step(f, x0, u, dt)[0]) - np.exp(-dt))
        assert err(0.1) < 1e-6
        # halving dt reduces local error by ~2^5; use large dt so the error
        # sits well above the f32 rounding floor
        assert err(0.25) < err(0.5) / 16

    def test_integrate_trajectory_shape(self):
        f = lambda x, u: u
        X = integrate_trajectory(f, jnp.zeros(2), jnp.ones((5, 2)), 0.1)
        assert X.shape == (6, 2)
        np.testing.assert_allclose(X[-1], 0.5, atol=1e-6)

    def test_quaternion_multiply_identity(self):
        q = jnp.array([0.5, 0.5, 0.5, 0.5])
        e = jnp.array([1.0, 0, 0, 0])
        np.testing.assert_allclose(quaternion_multiply(e, q), q, atol=1e-7)

    def test_quaternion_exponential_step_norm(self):
        q = jnp.array([1.0, 0, 0, 0])
        omega = jnp.array([0.3, -0.2, 0.5])
        for _ in range(50):
            q = quaternion_exponential_step(q, omega, 0.1)
        np.testing.assert_allclose(jnp.linalg.norm(q), 1.0, atol=1e-5)

    def test_quaternion_exponential_matches_euler_small_dt(self):
        from gpmpc_tpu.dynamics import quaternion_euler_step

        q = jnp.array([1.0, 0, 0, 0])
        omega = jnp.array([0.3, -0.2, 0.5])
        qe = quaternion_euler_step(q, omega, 1e-4)
        qx = quaternion_exponential_step(q, omega, 1e-4)
        np.testing.assert_allclose(qe, qx, atol=1e-6)

    def test_hermite_simpson_defect_near_zero_on_fine_rollout(self):
        p = Rocket3DoFParams()
        f = lambda x, u: r3.f(p, x, u)
        x0 = jnp.array([2.0, 30.0, 0.0, 0.0, -3.0, 0.0, 0.0])
        u = jnp.array([2.0, 0.0, 0.0])
        dt = 0.01
        x1 = rk4_step(f, x0, u, dt)
        d = hermite_simpson_defect(f, x0, x1, u, u, dt)
        assert float(jnp.max(jnp.abs(d))) < 1e-6


class TestLinearizeUtils:
    def test_numerical_jacobians_linear_system(self):
        A = jnp.array([[0.0, 1.0], [-2.0, -0.5]])
        B = jnp.array([[0.0], [1.0]])
        f = lambda x, u: A @ x + B @ u
        An, Bn = numerical_jacobians(f, jnp.ones(2), jnp.ones(1), eps=1e-2)
        np.testing.assert_allclose(An, A, atol=1e-3)
        np.testing.assert_allclose(Bn, B, atol=1e-3)

    def test_affine_model(self):
        p = Rocket3DoFParams()
        F = lambda x, u: r3.step(p, x, u, 0.1)
        x = jnp.array([2.0, 10.0, 0, 0, -1.0, 0, 0])
        u = jnp.array([2.0, 0, 0])
        m = AffineModel.from_linearization(F, x, u)
        np.testing.assert_allclose(m.predict(x, u), F(x, u), atol=1e-5)

    def test_discretize_zoh_matches_expm_series(self):
        A = jnp.array([[0.0, 1.0], [0.0, 0.0]])
        B = jnp.array([[0.0], [1.0]])
        Ad, Bd = discretize_jacobians(A, B, 0.5, method="zoh")
        # double integrator ZOH closed form
        np.testing.assert_allclose(Ad, jnp.array([[1.0, 0.5], [0.0, 1.0]]), atol=1e-6)
        np.testing.assert_allclose(Bd, jnp.array([[0.125], [0.5]]), atol=1e-6)
