#!/usr/bin/env python
"""Composed campaign: ONLINE GP-MPC + predictive safety filter + gusts,
learned across episodes (VERDICT r3 item 5).

The reference's ``IterativeLearningRunner`` composes MPC → filter → plant →
learn per step and carries the model across episodes
(``/root/reference/src/learning/online_learner.py:564-611``). This is that
composition at campaign scale: every lane flies E consecutive landings
under a dispersed plant (drag + steady wind + a low-altitude downdraft the
nominal model doesn't know), with the soft-landing-funnel safety filter
active and the lane's OWN GP learning in the 50 Hz loop. The GP carries
between episodes (``learning.carry_gp_between_episodes``); everything else
(warm starts, reference, filter counters) resets.

The claim under test: as the GP learns the downdraft, the controller stops
flying plans the filter has to veto — the per-episode intervention count
falls while success stays high. (Within one episode the downdraft only
exists below ~6 m, so the honest learning axis is across episodes, not the
first-half/second-half split.)

    python scripts/run_online_safety_tpu.py --cpu --batch 16 --episodes 2
    python scripts/run_online_safety_tpu.py --batch 512                # TPU
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--episodes", type=int, default=3)
    ap.add_argument("--steps", type=int, default=110)
    ap.add_argument("--gust", type=float, default=-1.5,
                    help="low-altitude downdraft acceleration (on below ~6 m)")
    ap.add_argument("--filter-n", type=int, default=8,
                    help="safety-filter recoverability horizon. 8 (not the "
                         "rescue artifact's 5) because a LEARNED model flies "
                         "closer to its aggressive optimum — the incidental "
                         "margin model error used to provide is gone, and "
                         "the filter must catch the endgame ~0.2 m/s tail "
                         "earlier (measured: N=5 intervenes below 2 m but "
                         "can no longer shave the overspeed)")
    ap.add_argument("--filter-model", choices=["pad", "gp"], default="pad",
                    help="recoverability model inside the filter. 'pad': "
                         "nominal + the static worst-case gust pad (round-4 "
                         "config — the certificate stays pinned while the "
                         "controller's model improves). 'gp': nominal + the "
                         "lane's LEARNED GP mean, with the static pad faded "
                         "by the same variance gate the controller uses "
                         "(full pad where the GP has no data, learned "
                         "disturbance where it does) — the filter's "
                         "certificate improves WITH the model, reference "
                         "online_learner.py:592-601.")
    ap.add_argument("--vfree", type=float, default=1.5,
                    help="funnel touchdown allowance (m/s). The success "
                         "gate is 2.0; the gap is the filter's margin for "
                         "residual model error in the final meters.")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", type=str, default=None)
    args = ap.parse_args()

    import jax

    from gpmpc_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from gpmpc_tpu.dynamics import Rocket3DoFParams, rocket3dof as r3
    from gpmpc_tpu.experiments import SimulationConfig, sample_initial_conditions
    from gpmpc_tpu.learning import (
        OnlineGPMPCConfig,
        carry_gp_between_episodes,
        make_online_gp_mpc_controller,
        online_controller_info,
    )
    from gpmpc_tpu.mpc import GPMPCConfig, RTIConfig
    from gpmpc_tpu.ops.qp import ADMMConfig
    from gpmpc_tpu.reference import cubic_descent_reference
    from gpmpc_tpu.safety import (
        DescentFunnelSet,
        EmergencyBrakingController,
        SafetyFilterConfig,
        make_filtered_controller,
    )

    p = Rocket3DoFParams()
    dt = 0.1
    base = RTIConfig(
        N=20, dt=dt, accept_pri_tol=1e-2, condensed=True,
        admm=ADMMConfig(max_iter=50, check_interval=50, scaling=2,
                        polish=False, adaptive_rho=False, infeas_certs=False,
                        iter_unroll=25, use_pallas="off"),
    )
    F = lambda x, u: r3.step(p, x, u, dt)
    xT = jnp.zeros(7).at[0].set(2.0)
    ref_fn = lambda x0: cubic_descent_reference(x0, xT, 65, dt)

    # dispersed plant: drag + steady wind + the low-altitude downdraft
    p_true = p.replace(rho=1.0, C_D=1.0, A_ref=0.1)
    wind = jnp.zeros(7).at[5].set(0.4).at[6].set(0.25)

    def gust_accel(x):
        return args.gust * jax.nn.sigmoid((6.0 - x[1]) / 1.0)

    def plant(x, u):
        d = dt * (wind + jnp.zeros(7).at[4].set(gust_accel(x)))
        return r3.step(p_true, x, u, dt) + d

    cfg = GPMPCConfig(base=base, scp_iterations=1, tighten=True,
                      rollout_gp_tape=True)
    ocfg = OnlineGPMPCConfig(mpc=cfg)
    cinit_i, cstep_i = make_online_gp_mpc_controller(
        F, ocfg, xT, ref_fn, args.steps, args.steps)

    # funnel filter with the disturbance-padded recoverability model (the
    # same pad expression the plant applies — see run_campaign_tpu --gust)
    inv = DescentFunnelSet(slope=0.6, v_free=args.vfree)
    backup = EmergencyBrakingController(
        T_max=p.T_max, g_I=jnp.array([-1.0, 0.0, 0.0]))
    fcfg = SafetyFilterConfig(
        N=args.filter_n, dt=dt,
        u_min=jnp.array([0.0, -p.T_max, -p.T_max]),
        u_max=jnp.full(3, p.T_max),
    )
    F_filter = lambda x, u: F(x, u) + dt * jnp.zeros(7).at[4].set(gust_accel(x))
    sf_from_inner = None
    if args.filter_model == "gp":
        # the filter's recoverability rollouts read the lane's own learned
        # GP: nominal + gated GP mean + the static gust pad FADED by the
        # same variance gate the controller's prediction uses (w→0 off-data
        # keeps the full worst-case pad; w→1 on-data replaces it with the
        # learned disturbance — no double counting, no optimistic gap
        # before the GP activates)
        def sf_from_inner(inner):
            prior = jnp.exp(inner.gp.gp.kernels.log_variance)

            def sf(x, u):
                m, v = inner.gp.predict_gated(x, u)
                w_vert = jnp.clip(1.0 - v[0] / jnp.maximum(prior[0], 1e-12),
                                  0.0, 1.0)
                d = jnp.zeros(7).at[4:7].set(m)
                d = d.at[4].add((1.0 - w_vert) * gust_accel(x))
                return F(x, u) + dt * d

            return sf

    finit, fstep = make_filtered_controller(
        cinit_i, cstep_i, F_filter, backup, inv, fcfg,
        step_fn_from_inner=sf_from_inner)

    sim = SimulationConfig(max_steps=args.steps, altitude_mean=15.0,
                           altitude_std=1.5)

    def fly_episode(fstate, x0):
        def body(carry, k):
            x, fs = carry
            u, fs = fstep(fs, x, k)
            x_next = plant(x, u)
            frozen = x[1] <= 0.1
            x = jnp.where(frozen, x, x_next)
            return (x, fs), None

        (xf, fs), _ = jax.lax.scan(
            body, (x0, fstate), jnp.arange(args.steps))
        landed = xf[1] <= 0.1
        speed = jnp.linalg.norm(xf[4:7])
        inner = fs[0]
        info = online_controller_info(inner)
        return fs, {
            "landed": landed,
            "success": landed & (speed <= 2.0),
            "speed": jnp.where(landed, speed, jnp.nan),
            "interventions": fs[1],
            "model_err": jnp.nanmean(inner.err_hist),
            "gp_points": info["gp_points"],
        }

    @jax.jit
    def fly_all(x0s_eps):
        """x0s_eps: (E, batch, 7). One lane = E sequential episodes with the
        GP carried; vmapped over lanes."""

        def lane(x0_seq):
            # E is tiny — unroll the episode loop in python inside the jit
            fs = finit(x0_seq[0])
            stats = []
            for e in range(x0_seq.shape[0]):
                if e > 0:
                    # fresh warm starts/reference/filter counters at the
                    # next IC; learned GP carried
                    inner_next = carry_gp_between_episodes(
                        cinit_i, fs[0], x0_seq[e])
                    fs = (inner_next,) + tuple(
                        jnp.zeros_like(s) for s in fs[1:])
                fs, st = fly_episode(fs, x0_seq[e])
                stats.append(st)
            return jax.tree.map(lambda *xs: jnp.stack(xs), *stats)

        return jax.vmap(lane)(jnp.swapaxes(x0s_eps, 0, 1))

    # SHARED-IC protocol: every episode re-flies the same initial conditions
    # (the reference's paired-comparison idiom, monte_carlo.py compare runs)
    # so per-episode differences are purely model-driven, not IC luck
    x0s = sample_initial_conditions(jax.random.PRNGKey(11), sim, args.batch,
                                    n_x=7)
    x0s_eps = jnp.tile(x0s[None], (args.episodes, 1, 1))  # (E, batch, 7)

    t0 = time.time()
    res = fly_all(x0s_eps)  # each leaf: (batch, E)
    res = jax.device_get(jax.tree.map(lambda a: a, res))
    wall = time.time() - t0

    import numpy as np

    per_ep = []
    for e in range(args.episodes):
        sel = lambda k: np.asarray(res[k])[:, e]
        spd = sel("speed")
        per_ep.append({
            "episode": e + 1,
            "success_rate": round(float(sel("success").mean()), 4),
            "landed_rate": round(float(sel("landed").mean()), 4),
            "interventions_mean": round(float(sel("interventions").mean()), 2),
            "intervention_rate": round(
                float((sel("interventions") > 0).mean()), 4),
            "touchdown_speed_mean": round(float(np.nanmean(spd)), 3),
            # the failure-tail trace VERDICT r4 asked for: how much of the
            # episode exceeds the 2 m/s success gate, and how hot the p95 is
            "touchdown_speed_p95": round(
                float(np.nanpercentile(spd, 95)), 3),
            "overspeed_rate": round(
                float(np.nanmean((spd > 2.0).astype(np.float64))), 4),
            "model_err_mean": round(float(np.nanmean(sel("model_err"))), 5),
            "gp_points_mean": round(float(sel("gp_points").mean()), 1),
        })
        print(json.dumps(per_ep[-1]))

    ints = [r["interventions_mean"] for r in per_ep]
    errs = [r["model_err_mean"] for r in per_ep]
    succ = [r["success_rate"] for r in per_ep]
    # success non-decreasing under the PAIRED test the shared-IC protocol
    # earns: every lane re-flies the same IC each episode, so episode e vs
    # episode 1 is a per-lane flip count — McNemar z = (b−c)/√(b+c) with
    # b = lanes that degraded (success→fail), c = lanes that improved.
    # (The r4 artifact passed `final > 0.95` while success slid 0.992 →
    # 0.953 — a real monotone trend this flags. The one-sample-CI gate it
    # replaces also flagged pure binomial oscillation around a flat mean,
    # e.g. 0.988 vs 0.975 at 512 lanes with z = 1.4.)
    succ_mat = np.asarray(res["success"])  # (batch, E)
    mcnemar = []
    for e in range(1, args.episodes):
        b = float(np.sum(succ_mat[:, 0] & ~succ_mat[:, e]))  # degraded
        c = float(np.sum(~succ_mat[:, 0] & succ_mat[:, e]))  # improved
        z = (b - c) / max((b + c) ** 0.5, 1.0)
        mcnemar.append(round(z, 2))
    success_non_decreasing = all(z < 2.0 for z in mcnemar)
    result = {
        "campaign": "online_gpmpc_safety_gust_3dof",
        "controller": "online GP-MPC (in-loop learning) + funnel safety filter",
        "filter_model": args.filter_model,
        "v_free": args.vfree,
        "batch": args.batch,
        "episodes": args.episodes,
        "steps": args.steps,
        "gust": args.gust,
        "devices": [str(d) for d in jax.devices()],
        "per_episode": per_ep,
        "interventions_by_episode": ints,
        "interventions_decrease": ints[-1] < ints[0],
        "model_err_by_episode": errs,
        "model_err_decreases": errs[-1] < errs[0],
        "success_by_episode": succ,
        "success_mcnemar_z_vs_ep1": mcnemar,
        "success_non_decreasing_within_ci": success_non_decreasing,
        "final_success_rate": per_ep[-1]["success_rate"],
        "episodes_flown": args.batch * args.episodes,
        "wall_s": round(wall, 1),
    }
    print(json.dumps(result))
    if args.out:
        Path(args.out).write_text(json.dumps(result, indent=1))
    ok = (result["interventions_decrease"]
          and result["final_success_rate"] > 0.95
          and success_non_decreasing)
    print("ONLINE+SAFETY:", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
