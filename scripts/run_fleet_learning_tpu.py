#!/usr/bin/env python
"""Campaign-scale GP fleet learning artifact: N lanes learn concurrently.

Runs ``learning.run_batched_learning`` — the one-jitted-scan fleet loop where
every lane flies closed-loop GP-MPC episodes with its OWN sparse GP, refits
on its own buffer at the round barrier, and (on a cadence) retunes its
hyperparameters by per-lane Adam MLE. Covers both model families:

    python scripts/run_fleet_learning_tpu.py --model 3dof --batch 256
    python scripts/run_fleet_learning_tpu.py --model 6dof --batch 64
    python scripts/run_fleet_learning_tpu.py --cpu --batch 8 --rounds 2  # smoke

The headline metric is ``model_err`` per round: the mean one-step prediction
error of each lane's controller model along its flown trajectory — round 0
flies the nominal model (activation-gated), later rounds fly the learned GP,
so the round-over-round drop IS the learning (reference
online_learner.py:529-677, which flies one episode at a time).
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", choices=["3dof", "6dof"], default="3dof")
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--steps", type=int, default=110)
    ap.add_argument("--tune-every", type=int, default=2,
                    help="per-lane Adam MLE retune cadence in rounds (0=off)")
    ap.add_argument("--tune-steps", type=int, default=40)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", type=str, default=None)
    args = ap.parse_args()

    import jax

    from gpmpc_tpu.utils import enable_compilation_cache

    enable_compilation_cache()  # replay long campaign compiles across runs

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from gpmpc_tpu.gp import StructuredGPConfig
    from gpmpc_tpu.learning import BatchedLearningConfig, run_batched_learning

    key = jax.random.PRNGKey(0)
    if args.model == "6dof":
        from gpmpc_tpu.dynamics import Rocket6DoFParams, rocket6dof as r6

        p = Rocket6DoFParams()
        dt = 0.1
        p_true = p.replace(rho=0.8, C_A=0.05 * jnp.eye(3))
        wind = jnp.zeros(14).at[5].set(0.10).at[6].set(0.06)
        plant = lambda x, u: r6.step(p_true, x, u, dt) + dt * wind
        alts = 16.0 + 5.0 * jax.random.uniform(
            jax.random.fold_in(key, 1), (args.batch,))
        vys = 0.3 * jax.random.normal(jax.random.fold_in(key, 2), (args.batch,))
        x0s = jax.vmap(
            lambda a, vy: r6.create_initial_state(
                p, altitude=a, velocity=(-3.0, vy, -0.1))
        )(alts, vys)
    else:
        from gpmpc_tpu.dynamics import Rocket3DoFParams, rocket3dof as r3

        p = Rocket3DoFParams()
        dt = 0.1
        p_true = p.replace(rho=1.0, C_D=1.0, A_ref=0.1)
        wind = jnp.zeros(7).at[5].set(0.4).at[6].set(0.25)
        plant = lambda x, u: r3.step(p_true, x, u, dt) + dt * wind
        x0s = jnp.tile(jnp.array([2.0, 28.0, 0.5, -0.5, -3.0, 0.0, 0.0]),
                       (args.batch, 1))
        x0s = x0s.at[:, 1].add(
            2.0 * jax.random.normal(jax.random.fold_in(key, 1), (args.batch,)))
        x0s = x0s.at[:, 2:4].add(
            0.5 * jax.random.normal(jax.random.fold_in(key, 2), (args.batch, 2)))

    cfg = BatchedLearningConfig(
        n_rounds=args.rounds, max_steps=args.steps,
        gp=StructuredGPConfig(max_data_points=128, n_inducing=24),
        tune_every=args.tune_every, tune_steps=args.tune_steps,
    )

    t0 = time.time()
    out = jax.jit(
        lambda k, x: run_batched_learning(k, p, plant, x, cfg)
    )(key, x0s)
    jax.block_until_ready(out["model_err"])
    float(jax.device_get(out["model_err"][-1].mean()))  # relay anchor
    compile_and_run_s = time.time() - t0
    out = jax.device_get(
        {k: v for k, v in out.items() if k != "gps"})

    me = np.asarray(out["model_err"])
    result = {
        "campaign": f"fleet_gp_learning_{args.model}",
        "batch": args.batch,
        "rounds": args.rounds,
        "max_steps": args.steps,
        "tune_every": args.tune_every,
        "tune_steps": args.tune_steps,
        "devices": [str(d) for d in jax.devices()],
        "wall_s": round(compile_and_run_s, 1),
        "episodes_flown": args.batch * args.rounds,
        "model_err_by_round": [round(float(v), 5) for v in me.mean(axis=1)],
        "model_err_final_over_first": round(
            float(me[-1].mean() / me[0].mean()), 4),
        "lanes_improved": int(np.sum(me[-1] < me[0])),
        "gp_fitted_all": bool(np.all(out["gp_fitted"])),
        "landed_by_round": [int(v) for v in
                            np.asarray(out["landed"]).sum(axis=1)],
        "success_by_round": [int(v) for v in
                             np.asarray(out["success"]).sum(axis=1)],
        "touchdown_speed_median_by_round": [
            round(float(np.median(v)), 3)
            for v in np.asarray(out["touchdown_speed"])],
    }
    print(json.dumps(result))
    if args.out:
        Path(args.out).parent.mkdir(parents=True, exist_ok=True)
        Path(args.out).write_text(json.dumps(result, indent=1))
    ok = (result["model_err_final_over_first"] < 0.5
          and result["landed_by_round"][-1] >= int(0.95 * args.batch))
    print("FLEET GP LEARNING:", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
