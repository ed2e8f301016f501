#!/usr/bin/env python
"""Large-scale closed-loop Monte-Carlo campaign on one chip.

Produces the scale artifacts: N concurrent full closed-loop landings
(dispersed initial conditions, per-scenario descent references, outcome
state machine) in lockstep on the ambient JAX backend, for any of:

    --controller rti      GP-free RTI-MPC (the reference's OSQP path)
    --controller gp_mpc   GP-MPC: pretrained sparse residual GP inside the
                          SCP loop, flying a dispersed (drag+wind) plant the
                          nominal model doesn't know
    --controller online_gp_mpc
                          GP-MPC that starts with an EMPTY GP and learns the
                          plant gap online, inside the 50 Hz loop: per-cycle
                          novelty-gated residual observe + cadenced
                          recency-Z factor refits, per lane (reference
                          online_update.py:14-16,53-56 at campaign scale)
    --model 3dof|6dof     point-mass or full quaternion stack

    python scripts/run_campaign_tpu.py --controller gp_mpc --batch 4096
    python scripts/run_campaign_tpu.py --model 6dof --batch 1024
    python scripts/run_campaign_tpu.py --cpu --batch 64 --steps 40   # smoke

Prints the campaign summary plus one JSON line (pass --out to also write
it to a file). The TPU compile takes several minutes cold (remote compile
through the tunnel); timed windows exclude it.
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def build_3dof(args, jax, jnp):
    from gpmpc_tpu.dynamics import Rocket3DoFParams, rocket3dof as r3
    from gpmpc_tpu.mpc import GPMPCConfig, RTIConfig, make_rti_controller
    from gpmpc_tpu.mpc.gp_mpc import make_gp_mpc_controller
    from gpmpc_tpu.ops.qp import ADMMConfig
    from gpmpc_tpu.reference import cubic_descent_reference

    p = Rocket3DoFParams()
    xT = jnp.zeros(7).at[0].set(2.0)
    base = RTIConfig(
        N=args.n, accept_pri_tol=5e-3, condensed=not args.sparse,
        admm=ADMMConfig(
            max_iter=50 if args.controller == "rti" else 100,
            polish=False, adaptive_rho=False, scaling=3,
            # the one-lane Pallas kernel ("auto" on TPU) measures slower than
            # the XLA path on the condensed shape — pin the benched config
            use_pallas="off",
        ),
        # --elide: all 7 3-DoF state boxes are ±50..500 loose envelopes
        # (binding descent constraints live in the calibration/facet
        # configs) — their Γ rows are the ADMM's dominant HBM stream
        **({"x_bound_mask": (False,) * 7} if args.elide else {}),
    )
    if args.bf16:
        # bf16 operand streams + the matching looser acceptance gate (bf16
        # primal residuals floor ~2e-2; a 1e-2 gate would reject every
        # solve and fly the fallback ladder)
        base = base.replace(admm=base.admm.replace(matvec_dtype="bf16"))
    F = lambda x, u: r3.step(p, x, u, base.dt)
    ref_fn = lambda x0: cubic_descent_reference(x0, xT, args.ref_steps, base.dt)

    if args.gust != 0.0 and args.controller == "rti":
        # low-altitude downdraft the model doesn't know: switches on below
        # ~6 m, too late for pure feedback to recover — the failure regime
        # the predictive safety filter rescues (reference composition,
        # monte_carlo.py:455-543). Measured unfiltered at gust -2.0:
        # 21/32 overspeed crashes. ONE definition of the gust acceleration:
        # the plant applies it, and the safety filter pads its
        # recoverability model with the same expression (via aux) — the
        # rescue ablation is meaningless if the two drift apart.
        def gust_accel(x):
            return args.gust * jax.nn.sigmoid((6.0 - x[1]) / 1.0)

        def plant_gust(x, u):
            return r3.step(p, x, u, base.dt) + base.dt * jnp.zeros(7).at[4].set(
                gust_accel(x))

        cinit, cstep = make_rti_controller(
            F, base, xT, reference_fn=ref_fn, ref_horizon=args.steps
        )
        return cinit, cstep, plant_gust, 7, {
            "F": F, "dt": base.dt, "T_max": p.T_max, "gust_accel": gust_accel}

    if args.controller in ("gp_mpc", "online_gp_mpc"):
        # dispersed plant: light drag + steady wind, unknown to the model
        p_true = p.replace(rho=1.0, C_D=1.0, A_ref=0.1)
        wind = jnp.zeros(7).at[5].set(0.4).at[6].set(0.25)
        if args.gust != 0.0:
            # composed regime (VERDICT r3 item 5): the dispersed plant PLUS
            # the low-altitude downdraft. The downdraft is state-dependent
            # and deterministic, so an ONLINE GP can learn it in flight —
            # with the funnel filter active the intervention rate should
            # fall as the model improves (the early/late split below
            # measures exactly that).
            def gust_accel3(x):
                return args.gust * jax.nn.sigmoid((6.0 - x[1]) / 1.0)

            def plant(x, u):
                d = base.dt * (wind + jnp.zeros(7).at[4].set(gust_accel3(x)))
                return r3.step(p_true, x, u, base.dt) + d
        else:
            gust_accel3 = None
            plant = lambda x, u: r3.step(p_true, x, u, base.dt) + base.dt * wind

    if args.controller == "online_gp_mpc":
        from gpmpc_tpu.learning import (
            OnlineGPMPCConfig,
            make_online_gp_mpc_controller,
            online_controller_info,
        )

        # in-loop learning wants the real-time iteration config (1 SCP iter +
        # frozen rollout tape + the certified 50-iteration/2-sweep ADMM
        # schedule) — the benched 50 Hz composed-learning configuration
        cfg = GPMPCConfig(
            base=base.replace(
                accept_pri_tol=2e-2 if args.bf16 else 1e-2,
                admm=base.admm.replace(max_iter=50, check_interval=50,
                                       scaling=2, infeas_certs=False,
                                       iter_unroll=25),
            ),
            scp_iterations=1, tighten=True, rollout_gp_tape=True,
        )
        ocfg = OnlineGPMPCConfig(mpc=cfg)
        cinit, cstep = make_online_gp_mpc_controller(
            F, ocfg, xT, ref_fn, args.steps, args.steps
        )
        aux = {
            "F": F, "dt": base.dt, "T_max": p.T_max,
            "cstate_info": online_controller_info,
        }
        if args.gust != 0.0:
            aux["gust_accel"] = gust_accel3
        return cinit, cstep, plant, 7, aux

    if args.controller == "gp_mpc":
        from gpmpc_tpu.learning import pretrain_gp_3dof

        _, mean_fn, var_fn = pretrain_gp_3dof(
            jax.random.PRNGKey(42), p, plant
        )
        if args.rt:
            # the benched real-time-iteration configuration: 1 SCP iter per
            # cycle + frozen rollout GP tape + the 50-iteration/2-sweep
            # certified ADMM schedule (closed-loop quality parity with the
            # conservative config measured at 64 lanes: 100% success,
            # 0.373 vs 0.377 m/s, 5.1 cm both)
            base = base.replace(
                accept_pri_tol=2e-2 if args.bf16 else 1e-2,
                admm=base.admm.replace(max_iter=50, check_interval=50,
                                       scaling=2, infeas_certs=False,
                                       iter_unroll=25),
            )
            if args.bf16_tail > 0:
                # bf16 bulk + f32 tail inside the same 50-iteration budget:
                # the tail re-converges to the f32 fixed point, so the
                # acceptance gate stays at the f32 1e-2 floor
                mi = 50 - args.bf16_tail
                base = base.replace(
                    accept_pri_tol=1e-2,
                    admm=base.admm.replace(
                        max_iter=mi, check_interval=mi,
                        iter_unroll=max(1, mi // 2),
                        matvec_dtype="bf16",
                        tail_f32_iters=args.bf16_tail,
                    ),
                )
            base = _apply_admm_overrides(base, args)
            cfg = GPMPCConfig(base=base, scp_iterations=1, tighten=True,
                              rollout_gp_tape=True)
        else:
            cfg = GPMPCConfig(base=base, scp_iterations=2, tighten=True)
        cinit, cstep = make_gp_mpc_controller(
            F, mean_fn, var_fn, cfg, xT,
            reference_fn=ref_fn, ref_horizon=args.steps,
        )
        return cinit, cstep, plant, 7, {"F": F, "dt": base.dt, "T_max": p.T_max}
    cinit, cstep = make_rti_controller(
        F, base, xT, reference_fn=ref_fn, ref_horizon=args.steps
    )
    return cinit, cstep, F, 7, {"F": F, "dt": base.dt, "T_max": p.T_max}


def _apply_admm_overrides(base, args):
    """--ci / --rows experiment knobs on the final RTI config (both models).

    --rows dense forces a single dense-A stream in place of the condensed
    row-structure segments (``_condensed_admm_cfg``): the segmented matvec
    streams ~40% fewer bytes but issues ~6x more (serialized) ops per
    iteration — which side wins is batch- and model-dependent, so make it
    measurable per campaign.
    """
    from gpmpc_tpu.mpc.rti import _n_bound_states

    admm = base.admm
    if args.iters > 0:
        # f32 budget override (the lever between the certified budget and
        # the known-bad floor — 6-DoF: 100 certified, 50 measured at 0.967
        # on 1024 dispersed lanes). check_interval must DIVIDE the budget
        # (the chunk schedule runs floor(mi/ci)*ci iterations), so pick the
        # largest divisor <= 50; --ci below can still refine it.
        mi = args.iters
        ci = max(d for d in range(1, min(50, mi) + 1) if mi % d == 0)
        admm = admm.replace(max_iter=mi, check_interval=ci,
                            iter_unroll=max(1, ci // 2))
    if args.ci > 0:
        admm = admm.replace(check_interval=args.ci,
                            iter_unroll=max(1, args.ci // 2))
    if args.pallas != "keep":
        admm = admm.replace(use_pallas=args.pallas)
    if args.rows == "dense":
        m = base.N * (_n_bound_states(base) + base.n_u)
        if base.Gx is not None:
            m += base.N * base.Gx.shape[0]
        if base.Gu is not None:
            m += base.N * base.Gu.shape[0]
        admm = admm.replace(row_structure=(("dense", m),))
    return base.replace(admm=admm)


def build_6dof(args, jax, jnp):
    from gpmpc_tpu.dynamics import Rocket6DoFParams, rocket6dof as r6
    from gpmpc_tpu.mpc import GPMPCConfig, make_rti_controller, rti_config_6dof
    from gpmpc_tpu.mpc.gp_mpc import make_gp_mpc_controller
    from gpmpc_tpu.ops.qp import ADMMConfig
    from gpmpc_tpu.reference import cubic_descent_reference

    p = Rocket6DoFParams()
    # the 14-state condensed QP needs the full 100-iteration budget in both
    # arms: at 50 iterations ~1/3 of RTI subproblems stay unsolved and those
    # lanes fall ballistic (measured: 0.67 -> 1.00 success at batch 48)
    base = rti_config_6dof(
        p, N=args.n,
        admm=ADMMConfig(
            max_iter=100, polish=False, adaptive_rho=False, scaling=3,
            use_pallas="off",
        ),
        cone_facets=args.facets,
        # --gs-smooth: ONE per-cycle-linearized glideslope row per stage
        # (the reference's smooth-cone SCP treatment) instead of
        # `--facets` inner polyhedral rows — 8x fewer rows in the ADMM's
        # dominant Γ-composed stream
        glideslope_facets=0 if args.gs_smooth else args.facets,
        glideslope_smooth=args.gs_smooth,
        bound_translation=not args.elide,
    ).replace(accept_pri_tol=2e-2 if args.bf16 else 1e-2,
              condensed=not args.sparse)
    if args.bf16:
        base = base.replace(admm=base.admm.replace(matvec_dtype="bf16"))
    F = lambda x, u: r6.step(p, x, u, base.dt)
    xT = r6.create_initial_state(p, altitude=0.0)
    ref_fn = lambda x0: cubic_descent_reference(x0, xT, args.ref_steps, base.dt)

    if args.controller in ("gp_mpc", "online_gp_mpc"):
        # light aero + steady wind within the lateral thrust authority (see
        # the gp_mpc note below)
        p_true = p.replace(rho=0.8, C_A=0.05 * jnp.eye(3))
        wind = jnp.zeros(14).at[5].set(0.10).at[6].set(0.06)
        plant = lambda x, u: r6.step(p_true, x, u, base.dt) + base.dt * wind

    if args.controller == "online_gp_mpc":
        from gpmpc_tpu.learning import (
            OnlineGPMPCConfig,
            make_online_gp_mpc_controller,
            online_controller_info,
        )

        # the 14-state real-time config (1 SCP iter + tape + full iteration
        # budget — see the --rt note) with the in-loop structured GP
        cfg = GPMPCConfig(
            base=base.replace(
                admm=base.admm.replace(check_interval=50, scaling=2,
                                       infeas_certs=False, iter_unroll=25),
            ),
            scp_iterations=1, tighten=True, rollout_gp_tape=True,
        )
        ocfg = OnlineGPMPCConfig(mpc=cfg)
        cinit, cstep = make_online_gp_mpc_controller(
            F, ocfg, xT, ref_fn, args.steps, args.steps
        )
        return cinit, cstep, plant, 14, {
            "F": F, "dt": base.dt, "T_max": p.T_max,
            "cstate_info": online_controller_info,
        }

    if args.controller == "gp_mpc":
        from gpmpc_tpu.learning import pretrain_gp_6dof

        # the dispersed plant above is the discriminative disturbance:
        # feedback leaves an offset, learned feedforward removes it (a 10x
        # touchdown-accuracy gap vs nominal). Heavier aero saturates the
        # thrust box (drag-limited descent) and no model knowledge helps —
        # see tests/test_gp_mpc.py scenario note.
        _, mean_fn, var_fn = pretrain_gp_6dof(
            jax.random.PRNGKey(42), p, plant, n_episodes=6
        )
        if args.rt:
            # 14-state real-time config: 1 SCP iteration + rollout tape +
            # the measured 60-iteration ADMM budget. The budget frontier was
            # swept with --iters on the chip (sweep_r5/6dof_*_it*.json):
            # 50 iterations regress the widest-dispersion lanes (0.967 vs
            # 1.000 at 1024 — tail ICs need the deeper duals on the 14-state
            # QP), 60 matches the 100-iteration quality exactly at both 512
            # and 4096 lanes (success 0.99951, touchdown 0.284 m/s, error
            # 1.0 cm) for +17% throughput (24.2k vs 20.8k solves/s at 4096)
            # EXCEPT when cone stage/facet rows are active: the augmented
            # QP needs the deeper duals — at 60 iterations the smooth-cone
            # 1024-lane campaign drops 3 lanes (success 0.9971 vs 1.0000,
            # sweep_r5/6dof_cones_smooth_1024_it60.json), so the cone arm
            # keeps the full 100-iteration schedule
            cones = args.facets > 0 or args.gs_smooth
            base = base.replace(
                admm=base.admm.replace(
                    max_iter=100 if cones else 60,
                    check_interval=50 if cones else 30,
                    scaling=2, infeas_certs=False,
                    iter_unroll=25 if cones else 15),
            )
            if args.bf16_tail > 0:
                # bf16 bulk + f32 tail inside the same 100-iteration budget
                # (see the 3-DoF note; the 14-state QP keeps its full
                # budget). check_interval must DIVIDE the bulk budget — the
                # chunk schedule runs floor(mi/ci)·ci iterations, so
                # ci=min(50, mi) at e.g. mi=80 silently ran 50 bulk
                # iterations (the regime measured at 0.67 success on this
                # QP); pick the largest divisor of mi ≤ 50 instead.
                mi = 100 - args.bf16_tail
                ci = max(d for d in range(1, min(50, mi) + 1) if mi % d == 0)
                base = base.replace(
                    accept_pri_tol=1e-2,
                    admm=base.admm.replace(
                        max_iter=mi, check_interval=ci,
                        iter_unroll=max(1, ci // 2), matvec_dtype="bf16",
                        tail_f32_iters=args.bf16_tail,
                    ),
                )
            base = _apply_admm_overrides(base, args)
            cfg = GPMPCConfig(base=base, scp_iterations=1, tighten=True,
                              rollout_gp_tape=True)
        else:
            cfg = GPMPCConfig(base=base, scp_iterations=2, tighten=True)
        cinit, cstep = make_gp_mpc_controller(
            F, mean_fn, var_fn, cfg, xT,
            reference_fn=ref_fn, ref_horizon=args.steps,
        )
        return cinit, cstep, plant, 14, {"F": F, "dt": base.dt, "T_max": p.T_max}
    cinit, cstep = make_rti_controller(
        F, base, xT, reference_fn=ref_fn, ref_horizon=args.steps
    )
    return cinit, cstep, F, 14, {"F": F, "dt": base.dt, "T_max": p.T_max}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--steps", type=int, default=130)
    ap.add_argument("--n", type=int, default=20, help="MPC horizon")
    ap.add_argument("--controller", choices=["rti", "gp_mpc", "online_gp_mpc"],
                    default="rti")
    ap.add_argument("--model", choices=["3dof", "6dof"], default="3dof")
    ap.add_argument("--ref-steps", type=int, default=100,
                    help="cubic descent profile length in steps. Shorter = "
                         "a more aggressive (faster) commanded descent — "
                         "the regime where the predictive safety filter "
                         "earns its keep (see --safety-filter)")
    ap.add_argument("--rt", action="store_true",
                    help="real-time iteration config for gp_mpc (1 SCP iter "
                         "+ rollout tape + the certified 50-iteration ADMM "
                         "schedule — the benched 50 Hz flagship)")
    ap.add_argument("--gust", type=float, default=0.0,
                    help="low-altitude downdraft magnitude (m/s^2, negative "
                         "= down) applied to the PLANT below ~6 m for the "
                         "rti controller — the safety-filter rescue regime")
    ap.add_argument("--facets", type=int, default=0,
                    help="gimbal/glideslope cone facets (6-DoF)")
    ap.add_argument("--gs-smooth", action="store_true",
                    help="6-DoF: smooth glideslope cone linearized per "
                         "cycle (1 row/stage) instead of --facets "
                         "polyhedral rows; the gimbal cone keeps its "
                         "(cheap, stage-shared) facet rows")
    ap.add_argument("--safety-filter", action="store_true",
                    help="compose the predictive safety filter per cycle and "
                         "run the with/without ablation on shared ICs")
    ap.add_argument("--cpu", action="store_true", help="force the CPU backend")
    ap.add_argument("--chunk", type=int, default=0,
                    help="split the batch into dispatches of this many lanes "
                         "(0 = one dispatch). Long single dispatches (minutes) "
                         "can trip the TPU worker watchdog through the relay; "
                         "chunking keeps each dispatch short with identical "
                         "results (lanes are independent).")
    ap.add_argument("--sparse", action="store_true",
                    help="sparse z=[x;u] QP instead of the condensed form")
    ap.add_argument("--sharded", action="store_true",
                    help="shard the scenario axis over ALL visible devices "
                         "on a ('hosts','chips') mesh (the multi-chip DP "
                         "path; on one chip it degenerates to the plain "
                         "run). Statistics run as explicit shard_map+psum; "
                         "prints a per-device throughput account. Combine "
                         "with --parity to ALSO fly the first shard's lanes "
                         "unsharded and assert lane-for-lane outcome "
                         "equality (sharding must not change numerics).")
    ap.add_argument("--parity", action="store_true",
                    help="with --sharded: unsharded re-run of shard 0's "
                         "lanes + exact lane-for-lane comparison")
    ap.add_argument("--bf16", action="store_true",
                    help="bf16 ADMM operand streams (matvec_dtype). Measured "
                         "WIN at batch 4096 where the ADMM bulk is HBM-bound "
                         "(+8%% cycles/s vs f32); a wash at 512 where the "
                         "cycle is op-latency-bound — see "
                         "bench_gpmpc_variants.py and docs/architecture.md")
    ap.add_argument("--bf16-tail", type=int, default=0,
                    help="with the RT schedule: run (50 - T) bf16 bulk "
                         "iterations + T f32 tail iterations (same total "
                         "budget). The f32 tail re-converges the iterate to "
                         "the f32 fixed point, removing the bf16 bias that "
                         "collapsed success at 4096 (see "
                         "campaign_gpmpc3dof_4096_rt_bf16.json) while the "
                         "bulk still streams half the bytes.")
    ap.add_argument("--iters", type=int, default=0,
                    help="override the RT f32 ADMM iteration budget "
                         "(0 = keep the model's certified default: 50 for "
                         "3-DoF, 100 for 6-DoF). check_interval follows as "
                         "the largest divisor <= 50. Requires --controller "
                         "gp_mpc --rt; incompatible with --bf16-tail.")
    ap.add_argument("--ci", type=int, default=0,
                    help="override the RT ADMM check_interval (finer chunks "
                         "= earlier all-lanes early exit at the cost of more "
                         "residual checks; 0 = keep the config default). "
                         "iter_unroll follows as ci//2.")
    ap.add_argument("--pallas", choices=["keep", "off", "lanes"],
                    default="keep",
                    help="override ADMMConfig.use_pallas: 'lanes' runs each "
                         "check-interval chunk as the multi-lane Pallas "
                         "kernel (matrices VMEM-resident per chunk — the "
                         "HBM-stream collapse lever for wide QPs)")
    ap.add_argument("--rows", choices=["auto", "dense"], default="auto",
                    help="'dense': stream the full constraint matrix per "
                         "ADMM matvec instead of the condensed row-structure "
                         "segments (fewer, larger ops — see "
                         "_apply_admm_overrides)")
    ap.add_argument("--elide", action="store_true",
                    help="drop the condensed QP's bound rows for the loose "
                         "translation-envelope state components (6-DoF: the "
                         "7 [m, r, v] rows whose ±100..500 boxes cannot bind "
                         "in a descent; 3-DoF: all 7 — glideslope/velocity "
                         "constraints, when wanted, are facet/calibration "
                         "configs, not these envelopes). Halves the ADMM "
                         "iteration's dominant HBM stream; quality gates "
                         "(success, touchdown speed) must match the "
                         "unelided artifact.")
    ap.add_argument("--out", type=str, default=None, help="write JSON here")
    args = ap.parse_args()

    import jax

    from gpmpc_tpu.utils import enable_compilation_cache

    enable_compilation_cache()  # replay long campaign compiles across runs

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from gpmpc_tpu.experiments import (
        SimulationConfig,
        campaign_statistics,
        run_campaign,
        sample_initial_conditions,
        summarize,
    )

    if args.bf16_tail != 0:
        # the flag only wires into the gp_mpc --rt builds; anywhere else it
        # would be silently ignored (or, past the budget, yield max_iter<=0)
        if args.controller != "gp_mpc" or not args.rt:
            raise SystemExit(
                "--bf16-tail requires --controller gp_mpc --rt (the RT "
                "schedule is where the bulk/tail split is defined)")
        budget = 100 if args.model == "6dof" else 50
        if not 0 < args.bf16_tail < budget:
            raise SystemExit(
                f"--bf16-tail must be in (0, {budget}) for --model "
                f"{args.model} (the tail comes out of the {budget}-iteration "
                "budget)")
        if args.pallas == "lanes":
            raise SystemExit(
                "--bf16-tail cannot combine with --pallas lanes (the Pallas "
                "chunk applies the f32 A in VMEM; there is no bf16 bulk)")
    if args.iters != 0:
        if args.controller != "gp_mpc" or not args.rt:
            raise SystemExit(
                "--iters requires --controller gp_mpc --rt (it overrides "
                "the RT schedule's f32 iteration budget)")
        if args.bf16_tail > 0:
            raise SystemExit(
                "--iters is incompatible with --bf16-tail (the tail flag "
                "already defines its own bulk budget)")
        if args.iters < 1:
            raise SystemExit("--iters must be positive")
    if args.gust != 0.0 and (
        args.controller not in ("rti", "gp_mpc", "online_gp_mpc")
        or args.model != "3dof"
    ):
        raise SystemExit(
            "--gust composes the 3-DoF builds only (other builds would "
            "silently fly an un-gusted plant while the safety filter pads "
            "against the gust)")
    build = build_6dof if args.model == "6dof" else build_3dof
    cinit, cstep, plant, n_x, aux = build(args, jax, jnp)
    alt = 20.0 if args.model == "6dof" else 30.0
    sim = SimulationConfig(max_steps=args.steps, altitude_mean=alt,
                           altitude_std=2.0)
    x0s = sample_initial_conditions(jax.random.PRNGKey(0), sim, args.batch,
                                    n_x=n_x)

    cstate_info = aux.get("cstate_info")
    if args.safety_filter:
        # soft-landing-funnel predictive filter: the speed allowance shrinks
        # with altitude (|v|² ≤ v_free² + slope·alt) under an emergency-
        # braking backup — the campaign-scale composition of
        # monte_carlo.py:455-543. The funnel (not an altitude-blind velocity
        # ellipsoid) is what catches the touchdown-overspeed failure mode:
        # see safety.invariant_sets.DescentFunnelSet.
        from gpmpc_tpu.safety import (
            DescentFunnelSet,
            EmergencyBrakingController,
            SafetyFilterConfig,
            filtered_controller_info,
            make_filtered_controller,
        )

        inv = DescentFunnelSet(slope=0.6, v_free=1.5)
        backup = EmergencyBrakingController(
            T_max=aux["T_max"], g_I=jnp.array([-1.0, 0.0, 0.0])
        )
        fcfg = SafetyFilterConfig(
            N=5, dt=aux["dt"],
            u_min=jnp.array([0.0, -aux["T_max"], -aux["T_max"]]),
            u_max=jnp.full(3, aux["T_max"]),
        )
        # the filter's recoverability rollouts must use a DISTURBANCE-PADDED
        # model: with the plain nominal model the backup's predicted braking
        # authority is 4x the gusted truth and the filter keeps certifying
        # "recoverable" all the way into the ground (measured: 0 effective
        # rescues at gust -2.0). The pad is the environment's disturbance
        # BOUND — the same expression the plant applies (shared via aux),
        # never the realization.
        F_filter = aux["F"]
        if "gust_accel" in aux:
            def F_filter(x, u, _F=aux["F"], _g=aux["gust_accel"]):
                return _F(x, u) + aux["dt"] * jnp.zeros(n_x).at[4].set(_g(x))
        cinit_unf, cstep_unf = cinit, cstep
        cinit, cstep = make_filtered_controller(
            cinit, cstep, F_filter, backup, inv, fcfg,
            half_step=args.steps // 2,
        )
        if cstate_info is None:
            cstate_info = filtered_controller_info
        else:
            # the filter wraps the inner state as (inner, n_interventions):
            # surface BOTH the inner controller's trace (e.g. the online
            # learner's err_hist) and the filter's counters
            inner_info = cstate_info
            cstate_info = lambda st: {
                **inner_info(st[0]), **filtered_controller_info(st)}

    camp = jax.jit(
        lambda xs: run_campaign(cinit, cstep, plant, xs, sim,
                                cstate_info=cstate_info)
    )

    chunk = args.chunk or args.batch
    if args.batch % chunk != 0:
        # a ragged tail slice would change the dispatch shape and put a jit
        # recompile inside the timed window
        raise SystemExit(f"--chunk {chunk} must divide --batch {args.batch}")

    mesh = None
    if args.sharded:
        from gpmpc_tpu.parallel import hosts_chips_mesh, shard_over_mesh

        mesh = hosts_chips_mesh()
        n_dev = mesh.devices.size
        if chunk % n_dev != 0:
            raise SystemExit(
                f"--sharded needs chunk {chunk} divisible by {n_dev} devices")
        place = lambda xs: shard_over_mesh(mesh, xs)
    else:
        place = lambda xs: xs

    def timed():
        # fetch a scalar to anchor the timing (block_until_ready does not
        # block through the axon relay)
        t0 = time.time()
        parts = []
        for i in range(0, args.batch, chunk):
            r = camp(place(x0s[i : i + chunk]))
            float(jax.device_get(jnp.sum(r["outcome"])))
            parts.append(r)
        res = jax.tree.map(lambda *xs: jnp.concatenate(xs), *parts)
        return res, time.time() - t0

    # warm/compile on the first chunk only (all chunks share the program)
    t0 = time.time()
    r0 = camp(place(x0s[:chunk]))
    float(jax.device_get(jnp.sum(r0["outcome"])))
    compile_s = time.time() - t0
    res, run_s = timed()
    stats = campaign_statistics(res)
    print(summarize(jax.device_get(stats)))
    cycles = args.batch * args.steps
    out = {
        "controller": args.controller,
        "model": args.model,
        "scenarios": args.batch,
        "steps": args.steps,
        "horizon": args.n,
        "devices": [str(d) for d in jax.devices()],
        "compile_s": round(compile_s, 1),
        "run_s": round(run_s, 2),
        "control_cycles_total": cycles,
        "solves_per_sec": round(cycles / run_s, 0),
        "success_rate": float(stats["success_rate"]),
        "landing_speed_mean": float(stats["landing_speed_mean"]),
        "landing_error_mean": float(stats["landing_error_mean"]),
        "fuel_used_mean": float(stats["fuel_used_mean"]),
    }
    if args.sharded:
        from gpmpc_tpu.parallel import (
            shard_over_mesh,
            sharded_campaign_statistics,
        )

        # explicit shard_map+psum statistics over the mesh (the designed
        # cross-shard reduction, not the compiler-inferred one) — timed, so
        # the collective cost at this shape is on the record
        fields = {
            k: shard_over_mesh(mesh, res[k])
            for k in ("outcome", "fuel_used", "landing_speed",
                      "landing_error", "steps")
        }
        t0 = time.time()
        pstats = jax.device_get(sharded_campaign_statistics(mesh, fields))
        psum_s = time.time() - t0
        assert abs(float(pstats["success_rate"])
                   - float(stats["success_rate"])) < 1e-6
        n_dev = mesh.devices.size
        out["sharded"] = {
            "mesh": list(mesh.devices.shape),
            "devices": n_dev,
            "lanes_per_device": args.batch // n_dev,
            "cycle_wall_ms": round(1e3 * run_s / args.steps, 2),
            "effective_hz_per_lane": round(args.steps / run_s, 1),
            "psum_stats_wall_s": round(psum_s, 3),
            "success_rate_psum": float(pstats["success_rate"]),
        }
        if args.parity:
            # unsharded re-fly of shard 0's lanes: sharding a lane-
            # independent campaign must not change a single outcome
            per_dev = chunk // n_dev
            sub = x0s[:per_dev]
            r1 = camp(sub)
            same_ids = jnp.array_equal(
                res["outcome"][:per_dev], r1["outcome"])
            du = float(jnp.max(jnp.abs(
                res["fuel_used"][:per_dev] - r1["fuel_used"])))
            out["sharded"]["parity"] = {
                "lanes": int(per_dev),
                "outcomes_identical": bool(jax.device_get(same_ids)),
                "fuel_max_abs_diff": du,
            }
            assert bool(jax.device_get(same_ids)), "sharded outcome mismatch"
    if args.controller == "online_gp_mpc":
        # the learning trace: mean one-step model error per cycle across live
        # lanes — the evidence the GP improves DURING the campaign
        import numpy as np

        eh = np.asarray(jax.device_get(res["err_hist"]))
        with __import__("warnings").catch_warnings():
            __import__("warnings").simplefilter("ignore")
            curve = np.nanmean(eh, axis=0)
        early = float(np.nanmean(eh[:, 2:12]))
        lo = min(60, args.steps - 20)
        late = float(np.nanmean(eh[:, lo:]))
        out["online_learning"] = {
            "model_err_cycles_2_12": round(early, 5),
            f"model_err_cycles_{lo}_plus": round(late, 5),
            "model_err_reduction_x": round(early / max(late, 1e-12), 1),
            "gp_points_mean": float(jax.device_get(res["gp_points"]).mean()),
            "n_refits_mean": float(jax.device_get(res["n_refits"]).mean()),
            "err_curve_by5": [
                None if np.isnan(v) else round(float(v), 5)
                for v in curve[::5]
            ],
        }
    if args.safety_filter:
        # ablation row: the same ICs without the filter (VERDICT item 6 /
        # reference monte_carlo.py:455-543 composition), chunked like the
        # filtered arm so long dispatches stay under the relay watchdog
        camp_unf = jax.jit(
            lambda xs: run_campaign(cinit_unf, cstep_unf, plant, xs, sim)
        )
        parts_unf = []
        for i in range(0, args.batch, chunk):
            r = camp_unf(x0s[i : i + chunk])
            float(jax.device_get(jnp.sum(r["outcome"])))
            parts_unf.append(r)
        res_unf = jax.tree.map(lambda *xs: jnp.concatenate(xs), *parts_unf)
        stats_unf = jax.device_get(campaign_statistics(res_unf))
        n_int = jax.device_get(res["n_interventions"])
        n_early = jax.device_get(res["n_interventions_early"])
        n_late = n_int - n_early
        out["safety_filter"] = {
            "intervention_rate": float((n_int > 0).mean()),
            "interventions_per_episode_mean": float(n_int.mean()),
            # within-episode learning trace: an online learner should need
            # the filter less in the second half of the flight
            "interventions_first_half_mean": float(n_early.mean()),
            "interventions_second_half_mean": float(n_late.mean()),
            "intervention_rate_decreases": bool(
                n_late.mean() < n_early.mean()),
            "success_rate_unfiltered": float(stats_unf["success_rate"]),
            "success_rate_delta": float(stats["success_rate"])
            - float(stats_unf["success_rate"]),
            "crash_count_filtered": int(
                jax.device_get(stats["outcome_counts"]["crash"])
            ),
            "crash_count_unfiltered": int(stats_unf["outcome_counts"]["crash"]),
            "landing_speed_mean_unfiltered": float(
                stats_unf["landing_speed_mean"]
            ),
        }
    print(json.dumps(out))
    if args.out:
        Path(args.out).parent.mkdir(parents=True, exist_ok=True)
        Path(args.out).write_text(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
