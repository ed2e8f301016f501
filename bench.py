#!/usr/bin/env python
"""Benchmark: GP-MPC solves/sec/chip at N=20 — the north-star workload.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Primary metric: full GP-MPC control cycles per second per chip. Each timed
unit is the complete learning-augmented cycle the reference performs in
``GPMPC.solve`` (gp_mpc.py:229-353) — GP-augmented re-anchoring rollout
(frozen per-knot residual tape), then the SCP iteration: AD linearization
along the horizon, sparse-GP posterior mean AND variance at every knot
(fast_gp.py's <5 ms budget, here fused into the program), linear covariance
propagation + chance-constraint tightening, condensed-QP build and
warm-started ADMM solve — plus the plant step, batched over scenarios in
lockstep. The real-time configuration runs ONE SCP iteration per control
cycle (the Diehl real-time-iteration argument applied to the GP-SCP:
receding-horizon warm starts keep the plan inside the trust region, so the
per-cycle relinearization IS the SCP loop, amortized across cycles);
tests/test_gp_mpc.py certifies its landings against the conservative
2-iteration, full-certificate configuration.

Secondary (in "detail"): the GP-free RTI cycle (the reference's OSQP 50 Hz
path, osqp_rti.py:569-599) on the same condensed-QP backend, and both
cycles' wall-clock vs the 20 ms / 50 Hz budget.

Baseline (BASELINE.md): the reference's budget is one solve per 20 ms on CPU
= 50 solves/s. ``vs_baseline`` = GP-MPC solves/s/chip over that 50/s figure.

Timing notes: on the tunneled TPU backend ``block_until_ready`` does not
reliably block, so timing is anchored on fetching a scalar reduction of each
window's output (device_get forces completion); windows are long (STEPS
cycles per dispatch) to amortize the ~40 ms relay round trip.
"""

import json
import os
import sys
import time


def main():
    import jax
    import jax.numpy as jnp

    from gpmpc_tpu.dynamics import Rocket3DoFParams, rocket3dof as r3
    from gpmpc_tpu.learning import explore_gp_3dof
    from gpmpc_tpu.mpc import (
        GPMPCConfig,
        RTIConfig,
        gp_mpc_init,
        gp_mpc_solve,
        rti_init,
        rti_step,
    )
    from gpmpc_tpu.ops.qp import ADMMConfig

    N = 20
    BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    # cycles per dispatch: the tunneled backend costs ~40 ms of relay round
    # trip per dispatch, so short windows inflate every per-cycle figure
    # (measured: 10-cycle windows read the 6-DoF cycle at 21.2 ms vs the
    # 150-step campaign's 18.7 ms — ~3 ms/cycle of pure relay). 50-cycle
    # windows amortize the trip to ~0.8 ms/cycle while the warmup descent
    # still leaves every timed window airborne mid-flight.
    STEPS = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    # optional third arg "ipm": bench the Mehrotra-IPM subproblem solver
    # instead of ADMM (landing parity tested). Measured on the v5e chip
    # (2026-08-18, batch 512): ADMM 16.0 ms/cycle GP-MPC vs IPM 47.5 ms —
    # the 10 batched 60x60 factorizations + triangular solves per IPM
    # solve lose to the ADMM's streamed matvecs at this operator size, so
    # ADMM stays the flagship; the IPM remains the LMPC hull-QP solver
    # where ADMM's adaptive-rho is fragile (docs/architecture.md)
    SOLVER = sys.argv[3] if len(sys.argv) > 3 else "admm"
    if SOLVER not in ("admm", "ipm"):
        raise SystemExit(f"unknown solver {SOLVER!r}: use 'admm' or 'ipm'")
    N_WINDOWS = 5  # >=5 timed windows so the flagship carries a variance band
    SCP_ITERS = 1  # real-time iteration; see module docstring

    p = Rocket3DoFParams()
    p_true = p.replace(rho=1.0, C_D=1.0, A_ref=0.1)  # dispersed plant for the GP
    dt = 0.1
    F = lambda x, u: r3.step(p, x, u, dt)
    F_true = lambda x, u: r3.step(p_true, x, u, dt)
    xT = jnp.zeros(7).at[0].set(2.0)

    # ---- fit the residual GP (timing-irrelevant; content = drag residuals) --
    gp3, mean_fn, var_fn = explore_gp_3dof(
        jax.random.PRNGKey(0), jax.random.PRNGKey(1), p, F_true, dt=dt
    )

    # ---- configs: condensed QP, real-time iteration budgets -----------------
    # (landing quality verified closed loop on CPU under a dispersed
    # drag+wind plant: the r3 flagship 50-iteration/scaling-2 ADMM schedule
    # matches the 100-iteration/scaling-3 one exactly — 64/64 landings,
    # 0.373 vs 0.377 m/s, 5.1 cm both — while cutting the cycle 17.4 →
    # 12.8 ms at batch 512 on the v5e; iter_unroll=25 amortizes the
    # per-trip loop overhead of the iteration chunks, bitwise-identical)
    # x_bound_mask: the 3-DoF state boxes are ±50..500 loose envelopes that
    # cannot bind in a descent (binding descent constraints are the facet/
    # calibration configs) — their Γ rows are the ADMM's dominant HBM
    # stream, elided round 5 after 4096-lane campaign quality parity
    # (success 1.0, 0.415 m/s, 1.6 cm — `sweep_r5/3dof_4096_elide.json`).
    # Honesty note: with every 3-DoF state row elided, the chance
    # back-offs land on rows that are not in the QP — the tightening
    # COMPUTE (covariance propagation + quantile back-off, the reference's
    # per-cycle work) is still in the timed cycle, but it cannot steer
    # this particular QP. The 6-DoF section keeps its binding
    # attitude/rate rows (back-offs live), and the bound-riding
    # configuration is certified by scripts/run_calibration_tpu.py. The
    # detail fields state this (`tightening_targets_elided`).
    rti_cfg = RTIConfig(
        N=N, accept_pri_tol=5e-3, condensed=True,
        x_bound_mask=(False,) * 7,
        admm=ADMMConfig(max_iter=50, polish=False, adaptive_rho=False,
                        scaling=2, use_pallas="off", iter_unroll=25),
    )
    gp_cfg = GPMPCConfig(
        base=RTIConfig(
            N=N, accept_pri_tol=1e-2, condensed=True,
            x_bound_mask=(False,) * 7,
            admm=ADMMConfig(max_iter=50, check_interval=50, polish=False,
                            adaptive_rho=False, scaling=2, use_pallas="off",
                            infeas_certs=False, iter_unroll=25),
        ),
        scp_iterations=SCP_ITERS, tighten=True, rollout_gp_tape=True,
    )
    if SOLVER == "ipm":
        rti_cfg = rti_cfg.replace(solver="ipm", ipm_iters=10)
        gp_cfg = gp_cfg.replace(
            base=gp_cfg.base.replace(solver="ipm", ipm_iters=10))

    x0s = jnp.tile(jnp.array([2.0, 30.0, 0.0, 0.0, -3.0, 0.0, 0.0]), (BATCH, 1))
    x0s = x0s.at[:, 1].add(jnp.linspace(0.0, 5.0, BATCH))

    def timed_window_var(window, states, xs):
        """(mean ms/cycle, std over the N_WINDOWS per-window means) — the
        variance band VERDICT r4 item 10 asked for, so a ±4% wobble between
        rounds stops reading as progress/regression.

        The warmup window compiles AND descends the fleet to a warm
        mid-flight snapshot; every timed window then REPLAYS that snapshot
        (identical work, so the std is pure timing noise) instead of
        threading state across windows — threading 6 × 50 cycles would burn
        through the fuel budget and time an unphysical post-dry regime."""
        s0, x0, alt = window(states, xs)
        _ = float(jax.device_get(alt))  # compile + warm + descend
        per = []
        for _i in range(N_WINDOWS):
            t0 = time.time()
            _s, _x, alt = window(s0, x0)
            _ = float(jax.device_get(alt))  # force each window to finish
            per.append((time.time() - t0) / STEPS * 1e3)
        mean = sum(per) / len(per)
        std = (sum((v - mean) ** 2 for v in per) / (len(per) - 1)) ** 0.5
        return mean, std, per

    def timed_window(window, states, xs):
        return timed_window_var(window, states, xs)[0]

    # ---- GP-MPC (primary) ----------------------------------------------------
    gp_states = jax.vmap(lambda x: gp_mpc_init(gp_cfg, x, xT))(x0s)

    @jax.jit
    def gp_window(states, xs):
        def body(carry, _):
            states, xs = carry
            sols, states = jax.vmap(
                lambda s, x: gp_mpc_solve(F, mean_fn, var_fn, gp_cfg, s, x)
            )(states, xs)
            xs = jax.vmap(F_true)(xs, sols.u0)
            return (states, xs), None

        (states, xs), _ = jax.lax.scan(body, (states, xs), None, length=STEPS)
        return states, xs, jnp.mean(xs[:, 1])

    gp_cycle_ms, gp_cycle_std, gp_cycle_per = timed_window_var(
        gp_window, gp_states, x0s)
    n_chips = len(jax.devices())
    gp_sps_chip = BATCH * 1000.0 / gp_cycle_ms / n_chips
    # solves/s std propagated from the per-window cycle times
    gp_sps_per = [BATCH * 1000.0 / v / n_chips for v in gp_cycle_per]
    gp_sps_mean = sum(gp_sps_per) / len(gp_sps_per)
    gp_sps_std = (sum((v - gp_sps_mean) ** 2 for v in gp_sps_per)
                  / (len(gp_sps_per) - 1)) ** 0.5

    # ---- RTI (secondary) -----------------------------------------------------
    rti_states = jax.vmap(lambda x: rti_init(rti_cfg, x, xT))(x0s)

    @jax.jit
    def rti_window(states, xs):
        def body(carry, _):
            states, xs = carry
            sols, states = jax.vmap(
                lambda s, x: rti_step(F, rti_cfg, s, x)
            )(states, xs)
            xs = jax.vmap(F)(xs, sols.u0)
            return (states, xs), None

        (states, xs), _ = jax.lax.scan(body, (states, xs), None, length=STEPS)
        return states, xs, jnp.mean(xs[:, 1])

    rti_cycle_ms = timed_window(rti_window, rti_states, x0s)
    rti_sps_chip = BATCH * 1000.0 / rti_cycle_ms / n_chips

    # ---- GP posterior latency (the reference's <5 ms budget, fast_gp.py) ----
    # mean+variance at every knot of every scenario, exactly as evaluated
    # inside the control cycle: BATCH×N posteriors per dispatch
    Xq = jnp.tile(x0s[:, None, :], (1, N, 1)).reshape(-1, 7)
    Uq = jnp.tile(jnp.array([2.0, 0.0, 0.0]), (Xq.shape[0], 1))

    @jax.jit
    def gp_eval(Xq, Uq):
        def one(x, u):
            return mean_fn(x, u), var_fn(x, u)

        def body(carry, _):
            m, v = jax.vmap(one)(Xq + 1e-9 * carry, Uq)
            # anchor BOTH outputs into the carry: an unused variance would be
            # dead-code-eliminated by XLA's while-loop simplifier and the
            # metric would time a mean-only program
            return carry + jnp.mean(m[:, 4]) + 1e-20 * jnp.sum(v), None

        acc, _ = jax.lax.scan(body, jnp.asarray(0.0), None, length=STEPS)
        return acc

    _ = float(jax.device_get(gp_eval(Xq, Uq)))
    t0 = time.time()
    for _i in range(N_WINDOWS):
        _ = float(jax.device_get(gp_eval(Xq, Uq)))
    gp_batch_ms = (time.time() - t0) / (STEPS * N_WINDOWS) * 1e3
    gp_us_per_posterior = gp_batch_ms * 1e3 / (BATCH * N)

    # ---- online GP update latency (reference: <5 ms per update, goal <1 ms,
    # during 50 Hz control — online_update.py:14-16,56). One update = the
    # per-cycle observation path: residual from the flown step, feature
    # extraction, novelty-gated ring-buffer insert, cadence flags — batched
    # over every scenario (one updater per lane), per control cycle.
    from gpmpc_tpu.gp import OnlineGPUpdater, OnlineUpdateConfig, ResidualCollector

    coll = ResidualCollector(dt=dt)
    upd0 = OnlineGPUpdater.create(
        OnlineUpdateConfig(capacity=256), d=gp3.extractor.n_features, n_out=3
    )
    upds0 = jax.tree.map(
        lambda a: jnp.broadcast_to(jnp.asarray(a)[None], (BATCH,) + jnp.shape(a)),
        upd0,
    )

    @jax.jit
    def online_update_window(upds, xs):
        def one(upd, x):
            u = jnp.array([2.0, 0.0, 0.0])
            r = coll.residual(F, x, u, F_true(x, u))
            f = gp3.extractor.extract(x, u)
            upd2, _, _ = upd.observe(f, r)
            return upd2

        def body(carry, _):
            upds, xs = carry
            upds = jax.vmap(one)(upds, xs)
            xs = xs + 0.01  # drift the queries so inserts stay novel
            return (upds, xs), None

        (upds, _), _ = jax.lax.scan(body, (upds, xs), None, length=STEPS)
        return upds, jnp.sum(upds.buffer.count)

    upds1, cnt = online_update_window(upds0, x0s)
    _ = int(jax.device_get(cnt))  # compile + part-fill the buffers
    t0 = time.time()
    for _i in range(N_WINDOWS):
        # replay from the part-filled snapshot: identical novelty-gated
        # insert work per window
        _u, cnt = online_update_window(upds1, x0s + 0.1)
        _ = int(jax.device_get(cnt))
    upd_batch_ms = (time.time() - t0) / (STEPS * N_WINDOWS) * 1e3
    upd_us_per_lane = upd_batch_ms * 1e3 / BATCH

    # ---- COMPOSED online-learning GP-MPC cycle (VERDICT r2 item 1): the
    # full in-loop learning controller — GP-MPC solve reading the carried
    # per-lane GP + per-cycle novelty-gated observe + cadenced recency-Z
    # refit (every 10 cycles) and hyperparameter refresh (every 20) — all
    # inside one scanned program. The timed windows span 4×STEPS cycles, so
    # the reported ms/cycle AMORTIZES every cadence tier exactly as a
    # campaign pays it.
    from gpmpc_tpu.learning import (
        OnlineGPMPCConfig,
        make_online_gp_mpc_controller,
    )
    from gpmpc_tpu.reference import cubic_descent_reference

    ocfg = OnlineGPMPCConfig(mpc=gp_cfg)
    ocinit, ocstep = make_online_gp_mpc_controller(
        F, ocfg, xT,
        reference_fn=lambda x0: cubic_descent_reference(x0, xT, 100, 0.1),
        ref_horizon=200, err_len=8,
    )
    ostates = jax.vmap(ocinit)(x0s)

    @jax.jit
    def online_cycle_window(states, xs, k0):
        def body(carry, _):
            states, xs, k = carry
            u0, states = jax.vmap(
                lambda s, x: ocstep(s, x, k), in_axes=(0, 0)
            )(states, xs)
            xs = jax.vmap(F_true)(xs, u0)
            return (states, xs, k + 1), None

        (states, xs, k), _ = jax.lax.scan(
            body, (states, xs, k0), None, length=STEPS
        )
        return states, xs, k, jnp.mean(xs[:, 1])

    ost, oxs, k, alt = online_cycle_window(ostates, x0s, jnp.asarray(0))
    _ = float(jax.device_get(alt))  # compile + warm + mid-campaign snapshot
    t0 = time.time()
    for _i in range(N_WINDOWS):
        # replay the snapshot: the window spans every cadence tier (refit
        # each 10 cycles, hyper refresh each 20), so ms/cycle amortizes
        # them exactly as a campaign pays them
        _s, _x, _k, alt = online_cycle_window(ost, oxs, k)
        _ = float(jax.device_get(alt))
    online_cycle_ms = (time.time() - t0) / (STEPS * N_WINDOWS) * 1e3

    # ---- 6-DoF quaternion GP-MPC cycle (the reference's FLAGSHIP model —
    # nominal_mpc.py:151-261 — against the same 20 ms/50 Hz budget,
    # osqp_rti.py:10-14). Exact run_campaign_tpu --model 6dof --rt solver
    # config: 1 SCP iter + rollout tape + the measured 60-iteration ADMM
    # budget at check_interval=30 (the --iters frontier sweep: 50 regresses
    # dispersed-lane success 0.967, 60 matches the 100-iteration quality at
    # both 512 and 4096 lanes for +17%), translation bound rows elided
    # (their loose envelopes are HALF the condensed constraint stream and
    # cannot bind in a descent — campaign quality parity verified).
    from gpmpc_tpu.dynamics import Rocket6DoFParams, rocket6dof as r6
    from gpmpc_tpu.learning import pretrain_gp_6dof
    from gpmpc_tpu.mpc import rti_config_6dof

    p6 = Rocket6DoFParams()
    p6_true = p6.replace(rho=0.8, C_A=0.05 * jnp.eye(3))
    F6 = lambda x, u: r6.step(p6, x, u, dt)
    wind6 = jnp.zeros(14).at[5].set(0.10).at[6].set(0.06)
    F6_true = lambda x, u: r6.step(p6_true, x, u, dt) + dt * wind6
    xT6 = r6.create_initial_state(p6, altitude=0.0)
    _, mean6, var6 = pretrain_gp_6dof(
        jax.random.PRNGKey(42), p6, F6_true, n_episodes=4)
    base6 = rti_config_6dof(
        p6, N=N,
        admm=ADMMConfig(max_iter=60, check_interval=30, polish=False,
                        adaptive_rho=False, scaling=2, use_pallas="off",
                        infeas_certs=False, iter_unroll=15),
        bound_translation=False,
    ).replace(accept_pri_tol=1e-2, condensed=True)
    gp6_cfg = GPMPCConfig(base=base6, scp_iterations=SCP_ITERS, tighten=True,
                          rollout_gp_tape=True)
    if SOLVER == "ipm":
        gp6_cfg = gp6_cfg.replace(
            base=gp6_cfg.base.replace(solver="ipm", ipm_iters=10))
    x0s6 = jax.vmap(
        lambda k: r6.create_initial_state(
            p6,
            altitude=15.0 + 2.0 * jax.random.normal(k),
            velocity=(-2.0, 0.1, 0.0),
        )
    )(jax.random.split(jax.random.PRNGKey(7), BATCH))
    gp6_states = jax.vmap(lambda x: gp_mpc_init(gp6_cfg, x, xT6))(x0s6)

    @jax.jit
    def gp6_window(states, xs):
        def body(carry, _):
            states, xs = carry
            sols, states = jax.vmap(
                lambda s, x: gp_mpc_solve(F6, mean6, var6, gp6_cfg, s, x)
            )(states, xs)
            xs = jax.vmap(F6_true)(xs, sols.u0)
            return (states, xs), None

        (states, xs), _ = jax.lax.scan(body, (states, xs), None, length=STEPS)
        return states, xs, jnp.mean(xs[:, 1])

    gp6_cycle_ms, gp6_cycle_std, _ = timed_window_var(
        gp6_window, gp6_states, x0s6)
    gp6_sps_chip = BATCH * 1000.0 / gp6_cycle_ms / n_chips

    result = {
        "metric": (
            f"GP-MPC solves/sec/chip (N={N}, batch={BATCH}, {SCP_ITERS} SCP "
            f"iters, fitted sparse-GP posterior mean+var per knot per iter, "
            f"chance tightening, condensed QP [{SOLVER}], incl. plant step)"
        ),
        "value": round(gp_sps_chip, 1),
        # ± band over the N_WINDOWS timed windows (VERDICT r4 item 10: the
        # 38.9k/39.9k/40.3k wobble needs an error bar before it means
        # anything)
        "value_std": round(gp_sps_std, 1),
        "unit": "solves/s/chip",
        "vs_baseline": round(gp_sps_chip / 50.0, 2),
        "detail": {
            "devices": [str(d) for d in jax.devices()],
            # set when the TPU relay was unreachable and the bench re-ran
            # on the host CPU (see _backend_or_cpu_fallback) — the number
            # is then a vast UNDERSTATEMENT of the chip throughput
            "cpu_fallback": os.environ.get(
                "GPMPC_BENCH_CPU_FALLBACK") == "1",
            "solver": SOLVER,
            "batch": BATCH,
            "n_timed_windows": N_WINDOWS,
            # chance-tightening compute (cov prop + quantile back-off) is
            # inside the timed cycle, but the 3-DoF config elides every
            # state bound row, so the back-offs cannot bind here — the
            # 6-DoF cycle keeps its attitude/rate rows (back-offs live);
            # bound-riding tightening is certified by run_calibration_tpu
            "tightening_compute_in_cycle": True,
            "tightening_targets_elided_3dof": True,
            "gp_mpc_cycle_wall_ms": round(gp_cycle_ms, 2),
            "gp_mpc_cycle_wall_ms_std": round(gp_cycle_std, 3),
            "gp_mpc_meets_50hz_in_lockstep": gp_cycle_ms < 20.0,
            # the reference's FLAGSHIP model: the 14-state quaternion rocket
            # (nominal_mpc.py:151-261) on the same budget — certified here
            # so the flagship number can never silently regress (VERDICT r4
            # item 2)
            "gp_mpc_6dof_cycle_wall_ms": round(gp6_cycle_ms, 2),
            "gp_mpc_6dof_cycle_wall_ms_std": round(gp6_cycle_std, 3),
            "gp_mpc_6dof_meets_50hz_in_lockstep": gp6_cycle_ms < 20.0,
            "gp_mpc_6dof_solves_per_sec_chip": round(gp6_sps_chip, 1),
            "rti_solves_per_sec_chip": round(rti_sps_chip, 1),
            "rti_cycle_wall_ms": round(rti_cycle_ms, 2),
            "rti_meets_50hz_in_lockstep": rti_cycle_ms < 20.0,
            "budget_ms": 20.0,
            # the reference's GP budget: <5 ms per prediction (fast_gp.py:12)
            "gp_posterior_mean_var_us": round(gp_us_per_posterior, 3),
            "gp_posteriors_per_cycle": BATCH * N,
            "gp_eval_batch_ms": round(gp_batch_ms, 3),
            # reference online-update budget: <5 ms/update, goal <1 ms
            "gp_online_update_us_per_lane": round(upd_us_per_lane, 3),
            "gp_online_update_batch_ms": round(upd_batch_ms, 3),
            # the COMPOSED learning-during-control cycle: GP-MPC with a live
            # per-lane GP + observe each cycle + cadenced refits, amortized
            # (reference: in-loop updates at 50 Hz, online_update.py:14-16)
            "online_gpmpc_cycle_ms": round(online_cycle_ms, 2),
            "online_gpmpc_meets_50hz_in_lockstep": online_cycle_ms < 20.0,
            "online_gpmpc_solves_per_sec_chip": round(
                BATCH * 1000.0 / online_cycle_ms / n_chips, 1),
        },
    }
    print(json.dumps(result))


def _backend_or_cpu_fallback(probe_timeout_s=600):
    """Guard against a dead TPU relay: backend init on the tunneled axon
    platform can HANG indefinitely (measured: >25 min with no error) rather
    than fail. Probe `jax.devices()` in a daemon thread; on timeout,
    re-exec this process pinned to the CPU backend so the driver always
    receives one honest JSON line (vs_baseline stays meaningful — the
    50 solves/s baseline is the reference's CPU budget) instead of a hang.
    Re-exec (not config.update) because the hung axon client creation is
    unkillable in-process.
    """
    import os
    import threading

    if os.environ.get("GPMPC_BENCH_CPU_FALLBACK") == "1":
        import jax

        jax.config.update("jax_platforms", "cpu")
        return
    got = {}

    def probe():
        import jax

        got["devices"] = jax.devices()

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(probe_timeout_s)
    if "devices" not in got:
        print(
            f"# backend init exceeded {probe_timeout_s}s (tunnel down?) — "
            "re-exec on CPU", file=sys.stderr, flush=True)
        os.execve(
            sys.executable, [sys.executable, *sys.argv],
            {**os.environ, "JAX_PLATFORMS": "cpu",
             "GPMPC_BENCH_CPU_FALLBACK": "1"},
        )


if __name__ == "__main__":
    _backend_or_cpu_fallback()
    main()
