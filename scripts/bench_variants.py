#!/usr/bin/env python
"""Compare RTI cycle variants on the live backend (bench.py methodology).

Usage: python scripts/bench_variants.py [BATCH] [STEPS] [variant ...]
Variants: sparse_warm, sparse_chol, cond, cond_pallas, cond25, cond_adapt,
          cond_ipm, cond_ipm12
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from gpmpc_tpu.dynamics import Rocket3DoFParams, rocket3dof as r3
from gpmpc_tpu.mpc import RTIConfig, rti_init, rti_step
from gpmpc_tpu.ops.qp import ADMMConfig

N = 20
BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 512
STEPS = int(sys.argv[2]) if len(sys.argv) > 2 else 10
WHICH = sys.argv[3:] or ["sparse_warm", "cond", "cond_pallas", "cond25"]
WINDOWS = 3

VARIANTS = {
    "sparse_warm": RTIConfig(
        N=N, accept_pri_tol=5e-3, warm_kkt=True,
        admm=ADMMConfig(max_iter=50, polish=False, adaptive_rho=False, scaling=3),
    ),
    "sparse_chol": RTIConfig(
        N=N, accept_pri_tol=5e-3,
        admm=ADMMConfig(max_iter=50, polish=False, rho_adapt_chunks=1, scaling=3),
    ),
    "cond": RTIConfig(
        N=N, accept_pri_tol=5e-3, condensed=True,
        admm=ADMMConfig(max_iter=50, polish=False, adaptive_rho=False,
                        scaling=3, use_pallas="off"),
    ),
    "cond_pallas": RTIConfig(
        N=N, accept_pri_tol=5e-3, condensed=True,
        admm=ADMMConfig(max_iter=50, polish=False, adaptive_rho=False,
                        scaling=3, use_pallas="on"),
    ),
    "cond25": RTIConfig(
        N=N, accept_pri_tol=5e-3, condensed=True,
        admm=ADMMConfig(max_iter=25, check_interval=25, polish=False,
                        adaptive_rho=False, scaling=3, use_pallas="off"),
    ),
    "cond_adapt": RTIConfig(
        N=N, accept_pri_tol=5e-3, condensed=True,
        admm=ADMMConfig(max_iter=50, polish=False, rho_adapt_chunks=1,
                        scaling=3, use_pallas="off"),
    ),
    # Mehrotra IPM on the condensed QP: ~15-20 Newton iterations of batched
    # normal-equation factorizations instead of ~50-100 HBM-streaming ADMM
    # matvecs (closed-loop landing parity tested in tests/test_mpc.py)
    "cond_ipm": RTIConfig(N=N, condensed=True, solver="ipm"),
    "cond_ipm12": RTIConfig(N=N, condensed=True, solver="ipm", ipm_iters=12),
    # landing quality saturates at 10 Newton iters (CPU sweep: identical
    # touchdown state for 10-20; 8 still lands at 0.34 m/s)
    "cond_ipm10": RTIConfig(N=N, condensed=True, solver="ipm", ipm_iters=10),
}

p = Rocket3DoFParams()
xT = jnp.zeros(7).at[0].set(2.0)
x0s = jnp.tile(jnp.array([2.0, 30.0, 0.0, 0.0, -3.0, 0.0, 0.0]), (BATCH, 1))
x0s = x0s.at[:, 1].add(jnp.linspace(0.0, 5.0, BATCH))

for name in WHICH:
    cfg = VARIANTS[name]
    F = lambda x, u: r3.step(p, x, u, cfg.dt)
    states = jax.vmap(
        lambda x: rti_init(cfg, x, xT, step_fn=F if cfg.warm_kkt else None)
    )(x0s)

    @jax.jit
    def window(states, xs, cfg=cfg, F=F):
        def body(carry, _):
            states, xs = carry
            sols, states = jax.vmap(lambda s, x: rti_step(F, cfg, s, x))(states, xs)
            xs = jax.vmap(lambda x, u: r3.step(p, x, u, cfg.dt))(xs, sols.u0)
            return (states, xs), None

        (states, xs), _ = jax.lax.scan(body, (states, xs), None, length=STEPS)
        return states, xs, jnp.mean(xs[:, 1])

    s, x, alt = window(states, x0s)
    _ = float(jax.device_get(alt))
    t0 = time.time()
    for _ in range(WINDOWS):
        s, x, alt = window(s, x)
        _ = float(jax.device_get(alt))
    cycle_ms = (time.time() - t0) / (STEPS * WINDOWS) * 1e3
    sps = BATCH * 1000.0 / cycle_ms
    print(f"{name:14s} {cycle_ms:7.2f} ms/cycle  {sps:11.0f} solves/s  "
          f"meets_50hz={cycle_ms < 20.0}")
