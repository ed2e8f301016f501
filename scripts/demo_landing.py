#!/usr/bin/env python
"""Closed-loop RTI-MPC landing demo — the de-facto integration test.

Mirrors the reference's ``scripts/demo_mpc_tracking.py``: generate a descent
reference, track it closed-loop with MPC, and exit 0/1 against explicit
pass/fail criteria (pos err < 1 m, |v| < 2 m/s, landed < 0.5 m altitude,
``demo_mpc_tracking.py:182-187``).

Usage: python scripts/demo_landing.py [--steps 110] [--batch 8] [--tpu]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=110)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--tpu", action="store_true", help="run on the ambient TPU backend")
    ap.add_argument("--model", choices=["3dof", "6dof"], default="3dof")
    args = ap.parse_args()

    import jax

    if not args.tpu:
        os.environ.setdefault("JAX_PLATFORMS", "cpu")
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from gpmpc_tpu.mpc import RTIConfig, rti_closed_loop
    from gpmpc_tpu.reference import cubic_descent_reference, pad_reference

    B = args.batch
    if args.model == "6dof":
        from gpmpc_tpu.dynamics import Rocket6DoFParams, rocket6dof as r6
        from gpmpc_tpu.mpc import rti_config_6dof

        p = Rocket6DoFParams()
        cfg = rti_config_6dof(p)
        F = lambda x, u: r6.step(p, x, u, cfg.dt)
        xT = r6.create_initial_state(p, altitude=0.0)
        x0s = jax.vmap(
            lambda a, h: r6.create_initial_state(
                p, altitude=20.0 + a, horizontal=(h, -h), velocity=(-2.0, 0.0, 0.0))
        )(jnp.linspace(-2, 2, B), jnp.linspace(-0.5, 0.5, B))
    else:
        from gpmpc_tpu.dynamics import Rocket3DoFParams, rocket3dof as r3

        p = Rocket3DoFParams()
        cfg = RTIConfig()
        F = lambda x, u: r3.step(p, x, u, cfg.dt)
        xT = jnp.zeros(7).at[0].set(2.0)
        x0s = jnp.tile(jnp.array([2.0, 30.0, 1.0, -0.5, -3.0, 0.0, 0.0]), (B, 1))
        x0s = x0s.at[:, 1].add(jnp.linspace(-3, 3, B))
        x0s = x0s.at[:, 2].add(jnp.linspace(-1, 1, B))

    def run_one(x):
        Xr = pad_reference(
            cubic_descent_reference(x, xT, args.steps - 10, cfg.dt), cfg.N + 20
        )
        return rti_closed_loop(F, cfg, x, xT, args.steps, X_ref_full=Xr)

    run = jax.jit(jax.vmap(run_one))
    t0 = time.time()
    out = jax.block_until_ready(run(x0s))
    compile_s = time.time() - t0
    t0 = time.time()
    out = jax.block_until_ready(run(x0s))
    run_s = time.time() - t0

    v = jax.vmap(jnp.linalg.norm)(out["x_final"][:, 4:7])
    perr = jax.vmap(jnp.linalg.norm)(out["x_final"][:, 2:4])
    alt = out["x_final"][:, 1]
    landed = out["landed"]

    print(f"devices: {jax.devices()}")
    print(f"batch={B} steps={args.steps}  compile {compile_s:.1f}s  run {run_s*1e3:.0f} ms")
    print(f"landed:         {int(landed.sum())}/{B}")
    print(f"touchdown |v|:  max {float(v.max()):.3f}  mean {float(v.mean()):.3f} m/s")
    print(f"position error: max {float(perr.max()):.3f} m")
    print(f"final altitude: max {float(alt.max()):.3f} m")

    ok = (
        bool(landed.all())
        and float(v.max()) < 2.0
        and float(perr.max()) < 1.0
        and float(alt.max()) < 0.5
    )
    print("PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
