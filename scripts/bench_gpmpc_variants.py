#!/usr/bin/env python
"""Compare GP-MPC cycle variants on the live backend (bench.py methodology).

Usage: python scripts/bench_gpmpc_variants.py [BATCH] [STEPS] [variant ...]
Variants: see VARIANTS dict (base, tape*, 1x100_nf flagship, 1x100_lanes*)
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from gpmpc_tpu.dynamics import Rocket3DoFParams, rocket3dof as r3
from gpmpc_tpu.learning import explore_gp_3dof
from gpmpc_tpu.mpc import GPMPCConfig, RTIConfig, gp_mpc_init, gp_mpc_solve
from gpmpc_tpu.ops.qp import ADMMConfig

N = 20
BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 512
STEPS = int(sys.argv[2]) if len(sys.argv) > 2 else 10
WHICH = sys.argv[3:] or ["base", "1x100_nf", "1x100_lanes"]
WINDOWS = 3

p = Rocket3DoFParams()
p_true = p.replace(rho=1.0, C_D=1.0, A_ref=0.1)
dt = 0.1
F = lambda x, u: r3.step(p, x, u, dt)
F_true = lambda x, u: r3.step(p_true, x, u, dt)
xT = jnp.zeros(7).at[0].set(2.0)

_, mean_fn, var_fn = explore_gp_3dof(
    jax.random.PRNGKey(0), jax.random.PRNGKey(1), p, F_true, dt=dt
)


def mk(mi, ci, apt, tape, mv="f32", scp=2, certs=True, pallas="off",
       scaling=3, eps=1e-4, rows=None, unroll=1, tail=0):
    return GPMPCConfig(
        base=RTIConfig(
            N=N, accept_pri_tol=apt, condensed=True,
            admm=ADMMConfig(max_iter=mi, check_interval=ci, polish=False,
                            adaptive_rho=False, scaling=scaling,
                            use_pallas=pallas, matvec_dtype=mv,
                            infeas_certs=certs, eps_abs=eps, eps_rel=eps,
                            row_structure=rows, iter_unroll=unroll,
                            tail_f32_iters=tail),
        ),
        scp_iterations=scp, tighten=True, rollout_gp_tape=tape,
    )


VARIANTS = {
    "base": mk(100, 25, 5e-3, False),
    "tape": mk(100, 50, 5e-3, True),
    "tape_50": mk(50, 50, 1e-2, True),
    "tape_75": mk(75, 25, 1e-2, True),
    "tape_bf16": mk(100, 50, 2e-2, True, "bf16"),
    "2x50_nc": mk(50, 50, 1e-2, True, certs=False),
    # the flagship bench config
    "1x100_nf": mk(100, 50, 1e-2, True, scp=1, certs=False),
    "1x150_nf": mk(150, 50, 1e-2, True, scp=1, certs=False),
    "2x50_nf": mk(50, 50, 1e-2, True, certs=False),
    # real-time iteration + bf16 operator streams / shorter schedules
    "1x100_bf16_nf": mk(100, 50, 2e-2, True, "bf16", scp=1, certs=False),
    "1x50_nf": mk(50, 50, 1e-2, True, scp=1, certs=False),
    "1x50_bf16_nf": mk(50, 50, 2e-2, True, "bf16", scp=1, certs=False),
    "1x75_bf16_nf": mk(75, 25, 2e-2, True, "bf16", scp=1, certs=False),
    # fixed-cost levers: fewer Ruiz sweeps, early exit with looser solver
    # eps (acceptance is accept_pri_tol anyway), dense vs structured matvec
    "1x50_s1_nf": mk(50, 50, 1e-2, True, scp=1, certs=False, scaling=1),
    "1x50_s2_nf": mk(50, 50, 1e-2, True, scp=1, certs=False, scaling=2),
    "1x100_ci25_eps3": mk(100, 25, 1e-2, True, scp=1, certs=False, eps=1e-3),
    "1x50_dense_nf": mk(50, 50, 1e-2, True, scp=1, certs=False,
                        rows=(("dense", N * 10),)),
    "1x50_s1_ci25_eps3": mk(50, 25, 1e-2, True, scp=1, certs=False,
                            scaling=1, eps=1e-3),
    # loop-trip overhead: unrolled ADMM iteration chunks
    "1x50_s2_u5": mk(50, 50, 1e-2, True, scp=1, certs=False, scaling=2,
                     unroll=5),
    "1x50_s2_u10": mk(50, 50, 1e-2, True, scp=1, certs=False, scaling=2,
                      unroll=10),
    "1x50_s2_u25": mk(50, 50, 1e-2, True, scp=1, certs=False, scaling=2,
                      unroll=25),
    # the RT campaign config with bf16 operand streams — the roofline
    # question at batch 4096 where the ADMM bulk should be HBM-bound
    "1x50_s2_u25_bf16": mk(50, 50, 2e-2, True, "bf16", scp=1, certs=False,
                           scaling=2, unroll=25),
    # and with the dense (structure-less) matvec at the same schedule
    "1x50_s2_u25_dense": mk(50, 50, 1e-2, True, scp=1, certs=False,
                            scaling=2, unroll=25, rows=(("dense", N * 10),)),
    # bf16 + fewer Ruiz sweeps / shorter schedule (4096 HBM-regime probes)
    "1x50_s1_u25_bf16": mk(50, 50, 2e-2, True, "bf16", scp=1, certs=False,
                           scaling=1, unroll=25),
    "1x40_s2_u20_bf16": mk(40, 40, 2e-2, True, "bf16", scp=1, certs=False,
                           scaling=2, unroll=20),
    # bf16 bulk + f32 tail: same 50-iteration total, but the last 10/15 run
    # with the f32 operands so the iterate re-converges to the f32 fixed
    # point (removes the quantization bias that killed plain bf16 at 4096)
    "1x40t10_s2_u20_bf16": mk(40, 40, 1e-2, True, "bf16", scp=1, certs=False,
                              scaling=2, unroll=20, tail=10),
    "1x35t15_s2_u35_bf16": mk(35, 35, 1e-2, True, "bf16", scp=1, certs=False,
                              scaling=2, unroll=35, tail=15),
    "1x50t10_s2_u25_bf16": mk(50, 50, 1e-2, True, "bf16", scp=1, certs=False,
                              scaling=2, unroll=25, tail=10),
    "1x50_s2_lanes": mk(50, 50, 1e-2, True, scp=1, certs=False, scaling=2,
                        pallas="lanes"),
    "1x100_s2_u10": mk(100, 50, 1e-2, True, scp=1, certs=False, scaling=2,
                       unroll=10),
    # multi-lane VMEM-resident Pallas chunks (L lanes per grid cell)
    "1x100_lanes": mk(100, 50, 1e-2, True, scp=1, certs=False,
                      pallas="lanes"),
    "1x100_lanes25": mk(100, 25, 1e-2, True, scp=1, certs=False,
                        pallas="lanes"),
    # Mehrotra IPM subproblem solver (~15-20 Newton factorizations instead
    # of 100 streamed ADMM matvecs; closed-loop parity tested)
    "1x_ipm": GPMPCConfig(
        base=RTIConfig(N=N, condensed=True, solver="ipm"),
        scp_iterations=1, tighten=True, rollout_gp_tape=True),
    "1x_ipm12": GPMPCConfig(
        base=RTIConfig(N=N, condensed=True, solver="ipm", ipm_iters=12),
        scp_iterations=1, tighten=True, rollout_gp_tape=True),
    "1x_ipm10": GPMPCConfig(
        base=RTIConfig(N=N, condensed=True, solver="ipm", ipm_iters=10),
        scp_iterations=1, tighten=True, rollout_gp_tape=True),
}

x0s = jnp.tile(jnp.array([2.0, 30.0, 0.0, 0.0, -3.0, 0.0, 0.0]), (BATCH, 1))
x0s = x0s.at[:, 1].add(jnp.linspace(0.0, 5.0, BATCH))

for name in WHICH:
    cfg = VARIANTS[name]
    states = jax.vmap(
        lambda x: gp_mpc_init(
            cfg, x, xT,
            step_fn=F if cfg.warm_kkt else None,
            gp_mean_fn=mean_fn if cfg.warm_kkt else None,
        )
    )(x0s)

    @jax.jit
    def window(states, xs, cfg=cfg):
        def body(carry, _):
            states, xs = carry
            sols, states = jax.vmap(
                lambda s, x: gp_mpc_solve(F, mean_fn, var_fn, cfg, s, x)
            )(states, xs)
            xs = jax.vmap(F_true)(xs, sols.u0)
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
          f"meets_50hz={cycle_ms < 20.0}", flush=True)

print(f"batch={BATCH} N=20 devices={jax.devices()}", flush=True)
