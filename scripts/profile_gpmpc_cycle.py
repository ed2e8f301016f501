#!/usr/bin/env python
"""Component-level timing of the GP-MPC control cycle (condensed QP path).

Times each stage of the benched GP-MPC configuration in isolation: the
GP-augmented re-anchoring rollout, AD linearization + GP posterior (mean and
variance at every knot), covariance propagation + tightening, condensed QP
build, Ruiz + KKT factorization, ADMM iteration chunks, and the full cycle.
Methodology follows profile_cycle.py: each stage runs in a scan-of-STEPS
window under one jit dispatch so the tunnel round trip amortizes out.

Usage: python scripts/profile_gpmpc_cycle.py [BATCH] [STEPS]
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from gpmpc_tpu.dynamics import Rocket3DoFParams, rocket3dof as r3
from gpmpc_tpu.dynamics.linearize import trajectory_jacobians
from gpmpc_tpu.learning import explore_gp_3dof
from gpmpc_tpu.mpc import GPMPCConfig, RTIConfig, gp_mpc_init, gp_mpc_solve
from gpmpc_tpu.mpc.gp_mpc import _augmented_rollout
from gpmpc_tpu.mpc.uncertainty_prop import box_tightening, propagate_linear
from gpmpc_tpu.ops.qp import ADMMConfig, solve
from gpmpc_tpu.ops.qp.admm import _factor, _rho_vec
from gpmpc_tpu.ops.qp.condensed import build_condensed_qp
from gpmpc_tpu.ops.qp.ruiz import ruiz_equilibrate

N = 20
BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 512
STEPS = int(sys.argv[2]) if len(sys.argv) > 2 else 50
WINDOWS = 3

p = Rocket3DoFParams()
p_true = p.replace(rho=1.0, C_D=1.0, A_ref=0.1)
dt = 0.1
F = lambda x, u: r3.step(p, x, u, dt)
F_true = lambda x, u: r3.step(p_true, x, u, dt)
xT = jnp.zeros(7).at[0].set(2.0)

# -- fitted GP (same protocol as bench.py, via the shared helper) -------------
_, mean_fn, var_fn = explore_gp_3dof(
    jax.random.PRNGKey(0), jax.random.PRNGKey(1), p, F_true, dt=dt
)

# EXACT bench.py flagship config (round 5): RT schedule (1 SCP iter, tape,
# 50-iteration/1-chunk ADMM) with every loose-envelope bound row elided —
# so the stage table answers "what remains in the 7.9 ms cycle"
cfg = GPMPCConfig(
    base=RTIConfig(
        N=N, accept_pri_tol=1e-2, condensed=True,
        x_bound_mask=(False,) * 7,
        admm=ADMMConfig(max_iter=50, check_interval=50, polish=False,
                        adaptive_rho=False, scaling=2, use_pallas="off",
                        infeas_certs=False, iter_unroll=25),
    ),
    scp_iterations=1, tighten=True, rollout_gp_tape=True,
)
base = cfg.base

x0s = jnp.tile(jnp.array([2.0, 30.0, 0.0, 0.0, -3.0, 0.0, 0.0]), (BATCH, 1))
x0s = x0s.at[:, 1].add(jnp.linspace(0.0, 5.0, BATCH))
states = jax.vmap(lambda x: gp_mpc_init(cfg, x, xT))(x0s)


def timed(name, fn, *args):
    out = fn(*args)
    anchor = jax.tree.leaves(out)[0]
    _ = jax.device_get(jnp.ravel(anchor)[0])
    t0 = time.time()
    for _i in range(WINDOWS):
        out = fn(*args)
        anchor = jax.tree.leaves(out)[0]
        _ = jax.device_get(jnp.ravel(anchor)[0])
    dt_ms = (time.time() - t0) / (WINDOWS * STEPS) * 1e3
    print(f"{name:40s} {dt_ms:8.2f} ms/cycle", flush=True)
    return dt_ms


def repeat(body):
    @jax.jit
    def run(carry):
        def step(c, _):
            return body(c), None

        c, _ = jax.lax.scan(step, carry, None, length=STEPS)
        return c

    return run


# -- full cycle ---------------------------------------------------------------
def full_cycle(carry):
    st, xs = carry
    sols, st = jax.vmap(
        lambda s, x: gp_mpc_solve(F, mean_fn, var_fn, cfg, s, x)
    )(st, xs)
    xs = jax.vmap(F_true)(xs, sols.u0)
    return (st, xs)


timed("FULL GP-MPC cycle (+plant)", repeat(full_cycle), (states, x0s))


# -- stage: augmented rollout -------------------------------------------------
def rollout_only(carry):
    st, xs = carry
    X = jax.vmap(
        lambda s, x: _augmented_rollout(
            F, mean_fn, s.X_lin.at[0].set(x), s.U_lin, dt
        )
    )(st, xs)
    xs = xs + 1e-20 * jnp.sum(X, axis=(1, 2))[:, None]
    return (st, xs)


timed("augmented rollout (GP mean/knot)", repeat(rollout_only), (states, x0s))


# -- stage: linearize + GP posterior ------------------------------------------
def lin_gp_only(carry):
    st, xs = carry

    def one(s):
        Aks, Bks, cks = trajectory_jacobians(F, s.X_lin, s.U_lin)
        gm = jax.vmap(mean_fn)(s.X_lin[:-1], s.U_lin)
        gv = jax.vmap(var_fn)(s.X_lin[:-1], s.U_lin)
        return jnp.sum(Aks) + jnp.sum(gm) + jnp.sum(gv)

    tot = jax.vmap(one)(st)
    xs = xs + 1e-20 * tot[:, None]
    return (st, xs)


timed("linearize + GP mean+var per knot", repeat(lin_gp_only), (states, x0s))


def lin_only(carry):
    st, xs = carry
    Aks, _, _ = jax.vmap(
        lambda s: trajectory_jacobians(F, s.X_lin, s.U_lin)
    )(st)
    xs = xs + 1e-20 * jnp.sum(Aks, axis=(1, 2, 3))[:, None]
    return (st, xs)


timed("linearize only", repeat(lin_only), (states, x0s))


# -- stage: covariance propagation + tightening -------------------------------
def prop_only(carry):
    st, xs = carry

    def one(s):
        Aks, _, _ = trajectory_jacobians(F, s.X_lin, s.U_lin)
        gv = jax.vmap(var_fn)(s.X_lin[:-1], s.U_lin)
        Sigma0 = cfg.sigma0_scale * jnp.eye(7)
        prop = propagate_linear(Aks, s.X_lin, Sigma0, gv, dt)
        return jnp.sum(box_tightening(prop.covariances, cfg.confidence))

    tot = jax.vmap(one)(st)
    xs = xs + 1e-20 * tot[:, None]
    return (st, xs)


timed("lin + GPvar + cov-prop + tighten", repeat(prop_only), (states, x0s))


# -- stage: condensed build ---------------------------------------------------
def build_only(carry):
    st, xs = carry

    def one(s, x):
        Aks, Bks, cks = trajectory_jacobians(F, s.X_lin, s.U_lin)
        data, Gs, ds = build_condensed_qp(
            Aks, Bks, cks, x, base.Q, base.R, base.Qf, s.x_ref,
            base.x_min, base.x_max, base.u_min, base.u_max,
            x_bound_mask=base.x_bound_mask,
        )
        return data

    data = jax.vmap(one)(st, xs)
    xs = xs + 1e-20 * jnp.sum(data.A, axis=(1, 2))[:, None]
    return (st, xs)


timed("linearize + condensed QP build", repeat(build_only), (states, x0s))


# precomputed condensed data for solver-only stages
def prep(s, x):
    Aks, Bks, cks = trajectory_jacobians(F, s.X_lin, s.U_lin)
    data, _, _ = build_condensed_qp(
        Aks, Bks, cks, x, base.Q, base.R, base.Qf, s.x_ref,
        base.x_min, base.x_max, base.u_min, base.u_max,
        x_bound_mask=base.x_bound_mask,
    )
    return data


data0 = jax.jit(jax.vmap(prep))(states, x0s)
jax.block_until_ready(data0.P)


# -- stage: Ruiz + factor -----------------------------------------------------
def factor_only(carry):
    st, xs = carry

    def one(d, r):
        sd, scal = ruiz_equilibrate(d, base.admm.scaling)
        rho_v = _rho_vec(sd.l, sd.u, r)
        K = _factor(sd.P, sd.A, rho_v, base.admm.sigma)
        return jnp.sum(K)

    tot = jax.vmap(one)(data0, st.rho)
    xs = xs + 1e-20 * tot[:, None]
    return (st, xs)


timed("Ruiz + rho + Cholesky-inv factor", repeat(factor_only), (states, x0s))


def ruiz_only(carry):
    st, xs = carry

    def one(d):
        sd, scal = ruiz_equilibrate(d, base.admm.scaling)
        return jnp.sum(sd.A)

    tot = jax.vmap(one)(data0)
    xs = xs + 1e-20 * tot[:, None]
    return (st, xs)


timed("Ruiz only", repeat(ruiz_only), (states, x0s))


# -- stage: full ADMM solve on prebuilt data ----------------------------------
def solve_only(carry):
    st, xs = carry

    def one(d, s):
        return solve(d, s.U_lin.reshape(-1), s.y_prev, base.admm, rho0=s.rho)

    sol = jax.vmap(one)(data0, st)
    xs = xs + 1e-20 * sol.x[:, :7]
    return (st, xs)


timed(f"solve (Ruiz+factor+{base.admm.max_iter} ADMM+checks)",
      repeat(solve_only), (states, x0s))



print(f"\nbatch={BATCH} N={N} scp_iters={cfg.scp_iterations} "
      f"devices={jax.devices()}", flush=True)
