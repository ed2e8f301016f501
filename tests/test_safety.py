"""Safety-stack tests: LQR backup stabilizes hover, invariant set properties,
maximal-alpha search, safety filter passes safe controls / intervenes on
unsafe ones, tube propagation, filtered closed loop.

Invariance obligation from SURVEY.md §4: V(x⁺) ≤ α under the backup law.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpmpc_tpu.dynamics import Rocket3DoFParams, rocket3dof as r3
from gpmpc_tpu.safety import (
    EllipsoidalInvariantSet,
    EmergencyBrakingController,
    SafetyFilterConfig,
    SimpleSafetyFilter,
    TubePropagator,
    check_safety,
    compute_from_lqr,
    compute_maximal_alpha,
    filter_control,
    filter_gradient,
    hover_backup_3dof,
    simulate_filtered,
)

DT = 0.1


@pytest.fixture(scope="module")
def setup():
    p = Rocket3DoFParams(T_min=0.3, T_max=6.0)
    backup = hover_backup_3dof(p, altitude=5.0, dt=DT)
    step = lambda x, u: r3.step(p, x, u, DT)
    inv = compute_from_lqr(backup.P, backup.x_eq, alpha=50.0)
    cfg = SafetyFilterConfig(N=10, dt=DT, u_min=jnp.array([0.3, -6.0, -6.0]),
                             u_max=jnp.array([6.0, 6.0, 6.0]))
    return p, backup, step, inv, cfg


class TestBackup:
    def test_lqr_stabilizes_hover(self, setup):
        p, backup, step, inv, cfg = setup
        x = backup.x_eq + jnp.array([0.0, 1.0, 0.5, -0.5, 0.5, 0.2, -0.1])
        X = backup.rollout(step, x, 60)
        e0 = jnp.linalg.norm(X[0, 1:7] - backup.x_eq[1:7])
        eN = jnp.linalg.norm(X[-1, 1:7] - backup.x_eq[1:7])
        assert float(eN) < 0.2 * float(e0)

    def test_lyapunov_decreases_under_backup(self, setup):
        """The invariance certificate: V decreases along backup rollouts
        inside the set."""
        p, backup, step, inv, cfg = setup
        x = backup.x_eq + 0.3 * jnp.array([0.0, 1.0, 1.0, -1.0, 1.0, 0.5, -0.5])
        V = [float(backup.lyapunov_value(x))]
        for _ in range(30):
            x = step(x, backup.control(x))
            V.append(float(backup.lyapunov_value(x)))
        assert V[-1] < 0.3 * V[0]

    def test_emergency_braking_opposes_velocity(self):
        b = EmergencyBrakingController(T_max=6.0, g_I=jnp.array([-1.0, 0, 0]))
        x = jnp.array([2.0, 10.0, 0, 0, -3.0, 2.0, 0.0])
        u = b.control(x)
        # decelerates: thrust component against velocity
        assert float(u[0]) > 0  # up against falling
        assert float(u[1]) < 0  # against +y drift
        assert float(jnp.linalg.norm(u)) <= 6.0 + 1e-4


class TestInvariantSet:
    def test_membership_and_projection(self, setup):
        _, backup, _, inv, _ = setup
        assert bool(inv.contains(backup.x_eq))
        x_out = backup.x_eq + 100.0 * jnp.ones(7)
        assert not bool(inv.contains(x_out))
        x_proj = inv.project(x_out)
        np.testing.assert_allclose(float(inv.value(x_proj)), float(inv.alpha), rtol=1e-3)

    def test_boundary_samples_on_level_set(self, setup):
        _, backup, _, inv, _ = setup
        pts = inv.sample_boundary(jax.random.PRNGKey(0), 64)
        vals = jax.vmap(inv.value)(pts)
        np.testing.assert_allclose(vals, float(inv.alpha), rtol=1e-3)

    def test_maximal_alpha_respects_constraint(self, setup):
        _, backup, _, _, _ = setup
        # constraint: altitude error within ±3  →  (x1 − 5)² ≤ 9
        cfn = lambda x: jnp.abs(x[1] - 5.0) - 3.0
        alpha = compute_maximal_alpha(
            backup.P, backup.x_eq, cfn, jax.random.PRNGKey(0), n_samples=128
        )
        assert float(alpha) > 0
        inv = EllipsoidalInvariantSet(P=backup.P, x_eq=backup.x_eq, alpha=alpha)
        pts = inv.sample_boundary(jax.random.PRNGKey(1), 128)
        assert float(jax.vmap(cfn)(pts).max()) <= 1e-2


class TestSafetyFilter:
    def test_safe_control_passes_through(self, setup):
        p, backup, step, inv, cfg = setup
        x = backup.x_eq + jnp.array([0.0, 0.2, 0.1, 0.0, 0.0, 0.0, 0.0])
        u_nom = backup.control(x)  # the backup's own control is surely safe
        res = filter_control(step, backup, inv, cfg, x, u_nom)
        assert bool(res.safe)
        assert not bool(res.intervened)
        np.testing.assert_allclose(res.u, u_nom, atol=1e-6)

    def test_unsafe_control_triggers_intervention(self, setup):
        p, backup, step, inv, cfg = setup
        # short horizon so u0 dominates the terminal Lyapunov value; pick
        # alpha inside the window (V_backup/margin, V_bad): interventions
        # are then both required and feasible
        cfg = cfg.replace(N=2)
        x = backup.x_eq + jnp.array([0.0, 0.5, 0.0, 0.0, -0.5, 0.0, 0.0])
        u_bad = jnp.array([0.3, 6.0, -6.0])  # hard lateral kick at min lift
        _, V_backup = check_safety(step, backup, inv, cfg, x, backup.control(x))
        _, V_bad = check_safety(step, backup, inv, cfg, x, u_bad)
        inv_tight = inv.replace(alpha=0.5 * (V_backup / cfg.alpha_margin + V_bad))
        safe, V = check_safety(step, backup, inv_tight, cfg, x, u_bad)
        assert not bool(safe)
        res = filter_control(step, backup, inv_tight, cfg, x, u_bad)
        assert bool(res.intervened)
        # the filtered control must be strictly safer than the bad one
        _, V_filtered = check_safety(step, backup, inv_tight, cfg, x, res.u)
        assert float(V_filtered) < float(V)

    def test_gradient_fallback(self, setup):
        p, backup, step, inv, cfg = setup
        cfg = cfg.replace(N=2)
        x = backup.x_eq + jnp.array([0.0, 0.5, 0.0, 0.0, -0.5, 0.0, 0.0])
        u_bad = jnp.array([0.3, 6.0, -6.0])
        _, V_backup = check_safety(step, backup, inv, cfg, x, backup.control(x))
        _, V_bad = check_safety(step, backup, inv, cfg, x, u_bad)
        inv_tight = inv.replace(alpha=0.5 * (V_backup / cfg.alpha_margin + V_bad))
        res = filter_gradient(step, backup, inv_tight, cfg, x, u_bad, steps=60)
        _, V_bad = check_safety(step, backup, inv_tight, cfg, x, u_bad)
        _, V_f = check_safety(step, backup, inv_tight, cfg, x, res.u)
        assert float(V_f) < float(V_bad)

    def test_filtered_simulation_stays_bounded(self, setup):
        p, backup, step, inv, cfg = setup
        x0 = backup.x_eq + jnp.array([0.0, 1.0, 0.5, 0.0, 0.0, 0.0, 0.0])
        # adversarial nominal controller: constant lateral push
        ctrl = lambda x, k: jnp.array([2.0, 4.0, 0.0])
        out = jax.jit(
            lambda x: simulate_filtered(step, backup, inv, cfg, ctrl, x, 50)
        )(x0)
        assert int(out["n_interventions"]) > 0
        # with the filter, the state stays in a bounded region
        assert float(jnp.abs(out["X"][:, 2]).max()) < 20.0

    def test_simple_filter_clamps(self):
        f = SimpleSafetyFilter(u_min=jnp.array([0.3, -5.0, -5.0]),
                               u_max=jnp.array([5.0, 5.0, 5.0]))
        res = f.filter(jnp.zeros(7), jnp.array([10.0, 0.0, 0.0]))
        np.testing.assert_allclose(res.u, jnp.array([5.0, 0.0, 0.0]))
        assert bool(res.intervened)


class TestTube:
    def test_gp_driven_tube(self):
        A = jnp.tile(0.9 * jnp.eye(7), (10, 1, 1))
        tp = TubePropagator()
        gp_vars = jnp.full((10, 3), 0.04)
        e = tp.propagate_gp(A, gp_vars)
        assert e.shape == (11, 7)
        # only velocity slice receives noise; positions stay zero with this A
        assert float(e[:, 4:7].max()) > 0
        assert float(e[0].max()) == 0.0

    def test_mc_tube_quantile(self):
        p = Rocket3DoFParams()
        step = lambda x, u: r3.step(p, x, u, DT)
        x0 = jnp.array([2.0, 20.0, 0, 0, -2.0, 0, 0])
        U = jnp.tile(jnp.array([2.0, 0.0, 0.0]), (5, 1))
        X_nom = r3.simulate(p, x0, U, DT)
        tp = TubePropagator()
        noise = jnp.full(7, 0.01)
        widths = tp.propagate_monte_carlo(
            jax.random.PRNGKey(0), step, X_nom, U, noise, n_particles=128
        )
        assert widths.shape == (6, 7)
        assert bool(jnp.all(widths[1:] > 0))


class TestFilteredCampaign:
    """VERDICT item 6: the predictive filter composed INSIDE a vmapped
    Monte-Carlo campaign (reference ``monte_carlo.py:455-543``), with nonzero
    interventions and a measurable crash-rate reduction."""

    def test_filter_reduces_crashes_in_campaign(self):
        from gpmpc_tpu.experiments.monte_carlo import (
            CRASH,
            SimulationConfig,
            run_campaign,
            sample_initial_conditions,
        )
        from gpmpc_tpu.safety import (
            filtered_controller_info,
            make_filtered_controller,
        )
        from gpmpc_tpu.safety.safety_filter import SafetyFilterConfig

        p = Rocket3DoFParams()
        step = lambda x, u: r3.step(p, x, u, DT)

        # dangerous controller: thrust below hover -> accelerating descent,
        # crashes at ~4-5 m/s without protection
        bad_init = lambda x0: jnp.zeros(0)
        bad_step = lambda cs, x, k: (jnp.array([1.0, 0.0, 0.0]), cs)

        # velocity-envelope invariant set (altitude-blind): terminal descent
        # speed must be recoverable to ~-0.8 m/s by emergency braking
        from gpmpc_tpu.safety import EmergencyBrakingController

        P = jnp.zeros((7, 7))
        for i in (4, 5, 6):
            P = P.at[i, i].set(1.0)
        # tight envelope: terminal speed after the braking maneuver must be
        # near the -0.8 m/s soft-descent equilibrium; with the 0.2 s braking
        # recovery (N=3) this caps the admissible in-flight speed at
        # ~1.5 m/s, under the 2 m/s landing criterion
        x_eq = jnp.zeros(7).at[4].set(-0.8)
        inv = EllipsoidalInvariantSet(P=P, x_eq=x_eq, alpha=0.05)
        backup = EmergencyBrakingController(
            T_max=p.T_max, g_I=jnp.array([-1.0, 0.0, 0.0])
        )
        fcfg = SafetyFilterConfig(
            N=3, dt=DT,
            u_min=jnp.array([0.0, -p.T_max, -p.T_max]),
            u_max=jnp.full(3, p.T_max),
        )
        finit, fstep = make_filtered_controller(
            bad_init, bad_step, step, backup, inv, fcfg
        )

        sim = SimulationConfig(
            max_steps=150, altitude_mean=10.0, altitude_std=1.0,
            horizontal_std=0.2, horizontal_velocity_std=0.05,
        )
        x0s = sample_initial_conditions(jax.random.PRNGKey(3), sim, 16)

        res_unf = jax.jit(
            lambda xs: run_campaign(bad_init, bad_step, step, xs, sim)
        )(x0s)
        res_fil = jax.jit(
            lambda xs: run_campaign(
                finit, fstep, step, xs, sim,
                cstate_info=filtered_controller_info,
            )
        )(x0s)

        crashes_unf = int(jnp.sum(res_unf["outcome"] == CRASH))
        crashes_fil = int(jnp.sum(res_fil["outcome"] == CRASH))
        n_int = np.asarray(res_fil["n_interventions"])

        assert crashes_unf == 16  # every unprotected lane hits hard
        assert (n_int > 0).all()  # the filter actually fired
        assert crashes_fil < crashes_unf  # and it prevented crashes
        # filtered touchdown is slow: the braking envelope caps speed
        touched = np.asarray(res_fil["x_final"][:, 1]) <= 0.1
        speeds = np.asarray(res_fil["landing_speed"])[touched]
        assert speeds.size > 0 and float(speeds.max()) < 2.5

        # recovery policy (reference safety_params.yaml:91-98): the bad
        # controller triggers interventions every step, so with
        # switch_to_backup and a small threshold every lane hands over to
        # the backup — and still lands softly
        fcfg_sw = fcfg.replace(max_consecutive=3, after_max="switch_to_backup")
        finit_sw, fstep_sw = make_filtered_controller(
            bad_init, bad_step, step, backup, inv, fcfg_sw
        )
        res_sw = jax.jit(
            lambda xs: run_campaign(
                finit_sw, fstep_sw, step, xs, sim,
                cstate_info=filtered_controller_info,
            )
        )(x0s)
        assert bool(np.asarray(res_sw["switched_to_backup"]).all())
        assert int(jnp.sum(res_sw["outcome"] == CRASH)) < crashes_unf
        # unknown policy name fails loudly
        import pytest as _pytest
        with _pytest.raises(ValueError):
            make_filtered_controller(
                bad_init, bad_step, step, backup, inv,
                fcfg.replace(after_max="nope"))

    @pytest.mark.slow

    def test_funnel_filter_rescues_gusted_descent(self):
        """The campaign-scale rescue regime (VERDICT r2 item 7): an RTI
        controller flying into an unmodeled low-altitude downdraft crashes
        most lanes on touchdown overspeed; the soft-landing-funnel filter
        (DescentFunnelSet) with a disturbance-padded recoverability model
        rescues them. Mirrors scripts/run_campaign_tpu.py --safety-filter
        --gust and the reference's filter-inside-MC composition
        (monte_carlo.py:455-543)."""
        import jax

        from gpmpc_tpu.dynamics import Rocket3DoFParams, rocket3dof as r3
        from gpmpc_tpu.experiments import (
            SimulationConfig,
            run_campaign,
            sample_initial_conditions,
        )
        from gpmpc_tpu.experiments.monte_carlo import CRASH, SUCCESS
        from gpmpc_tpu.mpc import RTIConfig, make_rti_controller
        from gpmpc_tpu.ops.qp import ADMMConfig
        from gpmpc_tpu.reference import cubic_descent_reference
        from gpmpc_tpu.safety import (
            DescentFunnelSet,
            EmergencyBrakingController,
            SafetyFilterConfig,
            filtered_controller_info,
            make_filtered_controller,
        )

        p = Rocket3DoFParams()
        dt = 0.1
        F = lambda x, u: r3.step(p, x, u, dt)
        xT = jnp.zeros(7).at[0].set(2.0)
        ref_fn = lambda x0: cubic_descent_reference(x0, xT, 100, dt)
        cinit, cstep = make_rti_controller(
            F,
            RTIConfig(N=20, accept_pri_tol=5e-3, condensed=True,
                      admm=ADMMConfig(max_iter=50, polish=False,
                                      adaptive_rho=False, scaling=3,
                                      use_pallas="off")),
            xT, reference_fn=ref_fn, ref_horizon=150,
        )

        def plant(x, u):  # downdraft switching on below ~6 m
            g = -2.0 * jax.nn.sigmoid((6.0 - x[1]) / 1.0)
            return r3.step(p, x, u, dt) + dt * jnp.zeros(7).at[4].set(g)

        def F_pad(x, u):  # the filter sees the disturbance BOUND
            g = -2.0 * jax.nn.sigmoid((6.0 - x[1]) / 1.0)
            return F(x, u) + dt * jnp.zeros(7).at[4].set(g)

        inv = DescentFunnelSet(slope=0.6, v_free=1.5)
        backup = EmergencyBrakingController(
            T_max=p.T_max, g_I=jnp.array([-1.0, 0.0, 0.0]))
        fcfg = SafetyFilterConfig(
            N=5, dt=dt,
            u_min=jnp.array([0.0, -p.T_max, -p.T_max]),
            u_max=jnp.full(3, p.T_max),
        )
        finit, fstep = make_filtered_controller(
            cinit, cstep, F_pad, backup, inv, fcfg)

        sim = SimulationConfig(max_steps=150, altitude_mean=30.0,
                               altitude_std=2.0)
        x0s = sample_initial_conditions(jax.random.PRNGKey(0), sim, 12)
        res_unf = jax.jit(
            lambda xs: run_campaign(cinit, cstep, plant, xs, sim))(x0s)
        res_fil = jax.jit(
            lambda xs: run_campaign(finit, fstep, plant, xs, sim,
                                    cstate_info=filtered_controller_info)
        )(x0s)

        succ_unf = int(jnp.sum(res_unf["outcome"] == SUCCESS))
        succ_fil = int(jnp.sum(res_fil["outcome"] == SUCCESS))
        crash_unf = int(jnp.sum(res_unf["outcome"] == CRASH))
        crash_fil = int(jnp.sum(res_fil["outcome"] == CRASH))
        assert crash_unf >= 6, (crash_unf, succ_unf)  # the regime is hostile
        assert succ_fil >= succ_unf + 4, (succ_unf, succ_fil)
        assert crash_fil <= crash_unf // 2, (crash_unf, crash_fil)
        assert (np.asarray(res_fil["n_interventions"]) > 0).any()


class TestDescentFunnel:
    def test_funnel_geometry(self):
        from gpmpc_tpu.safety import DescentFunnelSet

        inv = DescentFunnelSet(slope=0.6, v_free=1.5)
        # at the ground the allowance is exactly v_free
        x_ground = jnp.zeros(7).at[4].set(-1.49)
        assert bool(inv.contains(x_ground))
        x_fast = jnp.zeros(7).at[4].set(-1.6)
        assert not bool(inv.contains(x_fast))
        # higher up the same speed is admissible
        assert bool(inv.contains(x_fast.at[1].set(10.0)))
        # below-ground altitude gives no extra allowance
        x_below = jnp.zeros(7).at[1].set(-5.0).at[4].set(-1.6)
        assert not bool(inv.contains(x_below))
