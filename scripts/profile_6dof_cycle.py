#!/usr/bin/env python
"""Component-level timing of the 6-DoF quaternion GP-MPC control cycle.

Same methodology as profile_gpmpc_cycle.py (scan-of-STEPS windows under one
jit dispatch, fetch-anchored timing), at the 14-state real-time campaign
configuration (1 SCP iteration, rollout tape, 100-iteration ADMM budget at
check_interval=50/iter_unroll=25 — the EXACT run_campaign_tpu --rt solver
config, so stage times compose to the campaign cycle). Answers the VERDICT
r3 item-4 question: is the 3-DoF/6-DoF throughput gap the quaternion
rollout/linearization or the wider QP?  Also prints XLA's compiled
bytes-accessed / peak-temp numbers for the composed cycle so a
parts-vs-whole gap can be attributed (fusion/remat/spill) instead of
guessed at.

Usage: python scripts/profile_6dof_cycle.py [--cpu] [BATCH] [STEPS]
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

if "--cpu" in sys.argv:
    # the env var alone is too late: the axon sitecustomize pins the TPU
    # backend at interpreter start (see tests/conftest.py)
    sys.argv.remove("--cpu")
    jax.config.update("jax_platforms", "cpu")
ELIDE = "--elide" in sys.argv
if ELIDE:
    sys.argv.remove("--elide")
import jax.numpy as jnp

from gpmpc_tpu.dynamics import Rocket6DoFParams, rocket6dof as r6
from gpmpc_tpu.dynamics.linearize import trajectory_jacobians
from gpmpc_tpu.learning import pretrain_gp_6dof
from gpmpc_tpu.mpc import (
    GPMPCConfig,
    gp_mpc_init,
    gp_mpc_solve,
    rti_config_6dof,
)
from gpmpc_tpu.mpc.gp_mpc import _augmented_rollout
from gpmpc_tpu.mpc.rti import _condensed_admm_cfg
from gpmpc_tpu.mpc.uncertainty_prop import box_tightening, propagate_linear
from gpmpc_tpu.ops.qp import ADMMConfig
from gpmpc_tpu.ops.qp.admm import _factor, _rho_vec
from gpmpc_tpu.ops.qp.condensed import build_condensed_qp
from gpmpc_tpu.ops.qp.ruiz import ruiz_equilibrate
from gpmpc_tpu.reference import cubic_descent_reference
from gpmpc_tpu.utils import enable_compilation_cache

enable_compilation_cache()

N = 20
BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
STEPS = int(sys.argv[2]) if len(sys.argv) > 2 else 10
WINDOWS = 3

p = Rocket6DoFParams()
p_true = p.replace(rho=0.8, C_A=0.05 * jnp.eye(3))
dt = 0.1
F = lambda x, u: r6.step(p, x, u, dt)
wind = jnp.zeros(14).at[5].set(0.10).at[6].set(0.06)
plant = lambda x, u: r6.step(p_true, x, u, dt) + dt * wind
xT = r6.create_initial_state(p, altitude=0.0)

_, mean_fn, var_fn = pretrain_gp_6dof(jax.random.PRNGKey(42), p, plant,
                                      n_episodes=4)

# EXACT run_campaign_tpu.py --model 6dof --controller gp_mpc --rt solver
# config (build_6dof): full 100-iteration budget, check_interval=50,
# scaling=2, no certificates, unroll 25
base = rti_config_6dof(
    p, N=N,
    admm=ADMMConfig(max_iter=100, polish=False, adaptive_rho=False,
                    scaling=2, use_pallas="off", check_interval=50,
                    infeas_certs=False, iter_unroll=25),
    bound_translation=not ELIDE,
).replace(accept_pri_tol=1e-2, condensed=True)
cfg = GPMPCConfig(base=base, scp_iterations=1, tighten=True,
                  rollout_gp_tape=True)
admm_cycle = _condensed_admm_cfg(base)  # row-structured: what the cycle runs

key = jax.random.PRNGKey(3)
x0s = jax.vmap(
    lambda k: r6.create_initial_state(
        p,
        altitude=15.0 + 2.0 * jax.random.normal(k),
        velocity=(-2.0, 0.1, 0.0),
    )
)(jax.random.split(key, BATCH))
ref0 = lambda x0: cubic_descent_reference(x0, xT, 90, dt)
states = jax.vmap(lambda x: gp_mpc_init(cfg, x, xT))(x0s)
states = states.replace(
    x_ref=jax.vmap(lambda x: ref0(x)[: N + 1])(x0s))


def timed(name, fn, *args, analyze=False):
    out = fn(*args)
    anchor = jax.tree.leaves(out)[0]
    _ = jax.device_get(jnp.ravel(anchor)[0])
    t0 = time.time()
    for _i in range(WINDOWS):
        out = fn(*args)
        anchor = jax.tree.leaves(out)[0]
        _ = jax.device_get(jnp.ravel(anchor)[0])
    dt_ms = (time.time() - t0) / (WINDOWS * STEPS) * 1e3
    print(f"{name:44s} {dt_ms:8.2f} ms/cycle", flush=True)
    if analyze:
        try:
            c = fn.lower(*args).compile()
            ca = c.cost_analysis()
            ca = ca[0] if isinstance(ca, (list, tuple)) else ca
            gb = ca.get("bytes accessed", 0) / 1e9 / STEPS
            fl = ca.get("flops", 0) / 1e12 / STEPS
            print(f"  bytes accessed {gb:8.2f} GB/cycle   "
                  f"flops {fl:6.3f} TF/cycle", flush=True)
            ma = c.memory_analysis()
            if ma is not None:
                print(f"  peak temp {ma.temp_size_in_bytes/1e9:6.2f} GB   "
                      f"args {ma.argument_size_in_bytes/1e9:6.2f} GB   "
                      f"output {ma.output_size_in_bytes/1e9:6.2f} GB",
                      flush=True)
        except Exception as e:  # analysis is best-effort (backend-dependent)
            print(f"  (cost analysis unavailable: {e})", flush=True)
    return dt_ms


def repeat(body):
    @jax.jit
    def run(carry):
        def step(c, _):
            return body(c), None

        c, _ = jax.lax.scan(step, carry, None, length=STEPS)
        return c

    return run


def full_cycle(carry):
    st, xs = carry
    sols, st = jax.vmap(
        lambda s, x: gp_mpc_solve(F, mean_fn, var_fn, cfg, s, x)
    )(st, xs)
    xs = jax.vmap(plant)(xs, sols.u0)
    return (st, xs)


timed("FULL 6-DoF GP-MPC cycle (+plant)", repeat(full_cycle), (states, x0s),
      analyze=True)


def rollout_only(carry):
    st, xs = carry
    X = jax.vmap(
        lambda s, x: _augmented_rollout(
            F, mean_fn, s.X_lin.at[0].set(x), s.U_lin, dt
        )
    )(st, xs)
    xs = xs + 1e-20 * jnp.sum(X, axis=(1, 2))[:, None]
    return (st, xs)


timed("quaternion rollout (GP mean/knot)", repeat(rollout_only), (states, x0s))


def lin_only(carry):
    st, xs = carry
    Aks, _, _ = jax.vmap(
        lambda s: trajectory_jacobians(F, s.X_lin, s.U_lin)
    )(st)
    xs = xs + 1e-20 * jnp.sum(Aks, axis=(1, 2, 3))[:, None]
    return (st, xs)


timed("linearize only (14-state AD)", repeat(lin_only), (states, x0s))


def gp_only(carry):
    st, xs = carry

    def one(s):
        gm = jax.vmap(mean_fn)(s.X_lin[:-1], s.U_lin)
        gv = jax.vmap(var_fn)(s.X_lin[:-1], s.U_lin)
        return jnp.sum(gm) + jnp.sum(gv)

    tot = jax.vmap(one)(st)
    xs = xs + 1e-20 * tot[:, None]
    return (st, xs)


timed("structured GP mean+var per knot", repeat(gp_only), (states, x0s))


def prop_only(carry):
    st, xs = carry

    def one(s):
        Aks, _, _ = trajectory_jacobians(F, s.X_lin, s.U_lin)
        gv = jax.vmap(var_fn)(s.X_lin[:-1], s.U_lin)
        Sigma0 = cfg.sigma0_scale * jnp.eye(14)
        prop = propagate_linear(Aks, s.X_lin, Sigma0, gv, dt)
        return jnp.sum(box_tightening(prop.covariances, cfg.confidence))

    tot = jax.vmap(one)(st)
    xs = xs + 1e-20 * tot[:, None]
    return (st, xs)


timed("lin + GPvar + cov-prop + tighten", repeat(prop_only), (states, x0s))


def build_only(carry):
    st, xs = carry

    def one(s, x):
        Aks, Bks, cks = trajectory_jacobians(F, s.X_lin, s.U_lin)
        data, Gs, ds = build_condensed_qp(
            Aks, Bks, cks, x, base.Q, base.R, base.Qf, s.x_ref,
            base.x_min, base.x_max, base.u_min, base.u_max,
            base.Gx, base.gx_l, base.gx_u, base.Gu, base.gu_l, base.gu_u,
            x_bound_mask=base.x_bound_mask,
        )
        return data

    data = jax.vmap(one)(st, xs)
    xs = xs + 1e-20 * jnp.sum(data.A, axis=(1, 2))[:, None]
    return (st, xs)


timed("linearize + condensed QP build", repeat(build_only), (states, x0s))


def prep(s, x):
    Aks, Bks, cks = trajectory_jacobians(F, s.X_lin, s.U_lin)
    data, _, _ = build_condensed_qp(
        Aks, Bks, cks, x, base.Q, base.R, base.Qf, s.x_ref,
        base.x_min, base.x_max, base.u_min, base.u_max,
        base.Gx, base.gx_l, base.gx_u, base.Gu, base.gu_l, base.gu_u,
        x_bound_mask=base.x_bound_mask,
    )
    return data


data0 = jax.jit(jax.vmap(prep))(states, x0s)
jax.block_until_ready(data0.P)
print(f"condensed QP: n={data0.P.shape[-1]} m={data0.A.shape[-2]} "
      f"A batch bytes={data0.A.nbytes/1e6:.0f} MB", flush=True)


# NOTE: data0 is threaded through the carry (a jit ARGUMENT), never a
# closure constant — at batch 4096 the 300+MB QP batch baked into the
# program was rejected by the remote-compile tunnel (HTTP 413).
def factor_only(carry):
    st, xs, d0 = carry

    def one(d, r):
        sd, scal = ruiz_equilibrate(d, base.admm.scaling)
        rho_v = _rho_vec(sd.l, sd.u, r)
        K = _factor(sd.P, sd.A, rho_v, base.admm.sigma)
        return jnp.sum(K)

    tot = jax.vmap(one)(d0, st.rho)
    xs = xs + 1e-20 * tot[:, None]
    return (st, xs, d0)


timed("Ruiz + rho + KKT factor", repeat(factor_only), (states, x0s, data0))

from gpmpc_tpu.ops.qp import solve as qp_solve


def admm_dense(carry):
    st, xs, d0 = carry
    sol = jax.vmap(
        lambda d, r, y: qp_solve(d, None, y, base.admm, rho0=r)
    )(d0, st.rho, st.y_prev)
    xs = xs + 1e-20 * jnp.sum(sol.x, axis=1)[:, None]
    return (st, xs, d0)


timed("QP solve, dense-A stream", repeat(admm_dense), (states, x0s, data0),
      analyze=True)


def admm_structured(carry):
    st, xs, d0 = carry
    sol = jax.vmap(
        lambda d, r, y: qp_solve(d, None, y, admm_cycle, rho0=r)
    )(d0, st.rho, st.y_prev)
    xs = xs + 1e-20 * jnp.sum(sol.x, axis=1)[:, None]
    return (st, xs, d0)


timed("QP solve, row-structured (in-cycle cfg)", repeat(admm_structured),
      (states, x0s, data0), analyze=True)

print(f"batch={BATCH} N={N} devices={jax.devices()}", flush=True)
