#!/usr/bin/env python
"""Large-scale closed-loop Monte-Carlo campaign on one chip.

Reproduces the README's campaign artifact: N concurrent full closed-loop
RTI-MPC landings (dispersed initial conditions, per-scenario cubic descent
references, outcome state machine) in lockstep on the ambient JAX backend.

    python scripts/run_campaign_tpu.py                 # 1024 lanes on TPU
    python scripts/run_campaign_tpu.py --batch 4096    # the north-star point
    python scripts/run_campaign_tpu.py --cpu --batch 64 --steps 40   # smoke

Prints the campaign summary plus one JSON line with the sustained
solves/s. The TPU compile takes several minutes cold (remote compile
through the tunnel); timed windows exclude it.
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--steps", type=int, default=130)
    ap.add_argument("--n", type=int, default=20, help="MPC horizon")
    ap.add_argument("--cpu", action="store_true", help="force the CPU backend")
    ap.add_argument("--chol", action="store_true",
                    help="per-cycle Cholesky factorization instead of the "
                         "warm-started KKT inverse")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from gpmpc_tpu.dynamics import Rocket3DoFParams, rocket3dof as r3
    from gpmpc_tpu.experiments import (
        SimulationConfig,
        campaign_statistics,
        run_campaign,
        sample_initial_conditions,
        summarize,
    )
    from gpmpc_tpu.mpc import RTIConfig, make_rti_controller
    from gpmpc_tpu.ops.qp import ADMMConfig
    from gpmpc_tpu.reference import cubic_descent_reference

    p = Rocket3DoFParams()
    cfg = RTIConfig(
        N=args.n,
        warm_kkt=not args.chol,
        accept_pri_tol=5e-3,
        admm=ADMMConfig(max_iter=50, polish=False, adaptive_rho=False,
                        scaling=3),
    )
    F = lambda x, u: r3.step(p, x, u, cfg.dt)
    xT = jnp.zeros(7).at[0].set(2.0)
    sim = SimulationConfig(max_steps=args.steps, altitude_mean=30.0,
                           altitude_std=2.0)
    x0s = sample_initial_conditions(jax.random.PRNGKey(0), sim, args.batch)
    ref_fn = lambda x0: cubic_descent_reference(x0, xT, 100, cfg.dt)
    cinit, cstep = make_rti_controller(
        F, cfg, xT, reference_fn=ref_fn, ref_horizon=args.steps)
    camp = jax.jit(lambda xs: run_campaign(cinit, cstep, F, xs, sim))

    def timed():
        # fetch a scalar to anchor the timing (block_until_ready does not
        # block through the axon relay)
        t0 = time.time()
        res = camp(x0s)
        float(jax.device_get(jnp.sum(res["outcome"])))
        return res, time.time() - t0

    _, compile_s = timed()
    res, run_s = timed()
    stats = campaign_statistics(res)
    print(summarize(jax.device_get(stats)))
    cycles = args.batch * args.steps
    print(json.dumps({
        "scenarios": args.batch,
        "steps": args.steps,
        "compile_s": round(compile_s, 1),
        "run_s": round(run_s, 2),
        "control_cycles_total": cycles,
        "solves_per_sec": round(cycles / run_s, 0),
        "success_rate": float(stats["success_rate"]),
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
