#!/usr/bin/env python
"""Component-level timing of the RTI control cycle on the live TPU.

Times each stage of the warm-KKT RTI cycle (the bench configuration) in
isolation: AD linearization, QP build, Newton-Schulz KKT refresh, ADMM
chunks, residual/termination checks, plant step. Each stage is wrapped in a
scan-of-STEPS window under one jit dispatch so the ~40 ms tunnel round trip
amortizes out, mirroring bench.py's methodology.

Usage: python scripts/profile_cycle.py [BATCH] [STEPS]
"""

import sys
import time

import jax
import jax.numpy as jnp

from gpmpc_tpu.dynamics import Rocket3DoFParams, rocket3dof as r3
from gpmpc_tpu.dynamics.linearize import trajectory_jacobians
from gpmpc_tpu.mpc import RTIConfig, rti_init, rti_step
from gpmpc_tpu.mpc.rti import _build_rti_qp
from gpmpc_tpu.ops.qp import ADMMConfig, join_z, solve
from gpmpc_tpu.ops.qp.admm import _factor, _ns_refresh, _rho_vec
from gpmpc_tpu.ops.qp.ruiz import Scaling

N = 20
BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 512
STEPS = int(sys.argv[2]) if len(sys.argv) > 2 else 10
WINDOWS = 3

p = Rocket3DoFParams()
cfg = RTIConfig(
    N=N, accept_pri_tol=5e-3, warm_kkt=True,
    admm=ADMMConfig(max_iter=50, polish=False, adaptive_rho=False, scaling=3),
)
F = lambda x, u: r3.step(p, x, u, cfg.dt)
xT = jnp.zeros(7).at[0].set(2.0)
x0s = jnp.tile(jnp.array([2.0, 30.0, 0.0, 0.0, -3.0, 0.0, 0.0]), (BATCH, 1))
x0s = x0s.at[:, 1].add(jnp.linspace(0.0, 5.0, BATCH))
states = jax.vmap(lambda x: rti_init(cfg, x, xT, step_fn=F))(x0s)


def timed(name, fn, *args):
    """Compile, warm, then time WINDOWS dispatches of fn(*args)."""
    out = fn(*args)
    anchor = jax.tree.leaves(out)[0]
    _ = jax.device_get(jnp.ravel(anchor)[0])
    t0 = time.time()
    for _i in range(WINDOWS):
        out = fn(*args)
        anchor = jax.tree.leaves(out)[0]
        _ = jax.device_get(jnp.ravel(anchor)[0])
    dt_ms = (time.time() - t0) / (WINDOWS * STEPS) * 1e3
    print(f"{name:34s} {dt_ms:8.2f} ms/cycle")
    return dt_ms


def repeat(body):
    """scan body STEPS times under one jit."""

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
    sols, st = jax.vmap(lambda s, x: rti_step(F, cfg, s, x))(st, xs)
    xs = jax.vmap(lambda x, u: r3.step(p, x, u, cfg.dt))(xs, sols.u0)
    return (st, xs)


t_full = timed("FULL cycle (rti_step+plant)", repeat(full_cycle), (states, x0s))

# shared per-stage inputs (one representative linearization)
st0 = jax.tree.map(lambda a: a, states)


def lin_only(carry):
    st, xs = carry
    Aks, Bks, cks = jax.vmap(lambda s: trajectory_jacobians(F, s.X_lin, s.U_lin))(st)
    # fold a summary back into the carry so the scan isn't dead-code-eliminated
    xs = xs + 1e-20 * jnp.sum(Aks, axis=(1, 2, 3))[:, None]
    return (st, xs)


timed("linearize (trajectory_jacobians)", repeat(lin_only), (states, x0s))


def reanchor_only(carry):
    st, xs = carry

    def roll(s, x):
        def body(xx, uu):
            xn = F(xx, uu)
            return xn, xn

        _, X_roll = jax.lax.scan(body, x, s.U_lin)
        return jnp.concatenate([x[None], X_roll], axis=0)

    X = jax.vmap(roll)(st, xs)
    xs = xs + 1e-20 * jnp.sum(X, axis=(1, 2))[:, None]
    return (st, xs)


timed("re-anchor rollout", repeat(reanchor_only), (states, x0s))


def build_only(carry):
    st, xs = carry

    def one(s, x):
        Aks, Bks, cks = trajectory_jacobians(F, s.X_lin, s.U_lin)
        return _build_rti_qp(cfg, Aks, Bks, cks, x, s.x_ref)

    data = jax.vmap(one)(st, xs)
    xs = xs + 1e-20 * jnp.sum(data.A, axis=(1, 2))[:, None]
    return (st, xs)


timed("linearize + QP build", repeat(build_only), (states, x0s))


# precompute a solved QP data for solver-only stages
def prep(s, x):
    Aks, Bks, cks = trajectory_jacobians(F, s.X_lin, s.U_lin)
    data = _build_rti_qp(cfg, Aks, Bks, cks, x, s.x_ref)
    return data


data0 = jax.jit(jax.vmap(prep))(states, x0s)
jax.block_until_ready(data0.P)


def scale_data(d, s):
    from gpmpc_tpu.ops.qp.types import QPData

    return QPData(
        P=s.scal_c * s.scal_D[:, None] * d.P * s.scal_D[None, :],
        q=s.scal_c * s.scal_D * d.q,
        A=s.scal_E[:, None] * d.A * s.scal_D[None, :],
        l=s.scal_E * d.l,
        u=s.scal_E * d.u,
    )


def ns_only(carry):
    st, kkt = carry
    sd = jax.vmap(scale_data)(data0, st)
    rho_v = jax.vmap(lambda l, u, r: _rho_vec(l, u, r))(sd.l, sd.u, st.rho)
    kkt = jax.vmap(lambda P, A, rv, K: _ns_refresh(P, A, rv, cfg.admm.sigma, K))(
        sd.P, sd.A, rho_v, kkt
    )
    return (st, kkt)


timed("scale + rho + NS refresh", repeat(ns_only), (states, states.kkt_inv))


def solve_only(carry):
    st, xs = carry

    def one(d, s, x):
        z0 = join_z(s.X_prev, s.U_prev)
        return solve(
            d, z0, s.y_prev, cfg.admm, rho0=s.rho,
            fixed_scaling=Scaling(D=s.scal_D, E=s.scal_E, c=s.scal_c),
            kkt_inv0=s.kkt_inv,
        )

    sol = jax.vmap(one)(data0, st, xs)
    xs = xs + 1e-20 * sol.x[:, :7]
    return (st, xs)


timed("solve (scale+NS+ADMM+checks)", repeat(solve_only), (states, x0s))


def admm_chunks_only(carry):
    st, xs = carry
    sd = jax.vmap(scale_data)(data0, st)

    from gpmpc_tpu.ops.pallas.admm_kernel import admm_chunk, pallas_available

    rho_v = jax.vmap(_rho_vec)(sd.l, sd.u, st.rho)

    def one(P, A, q, l, u, rv, K):
        x = jnp.zeros_like(q)
        z = A @ x
        y = jnp.zeros_like(l)
        if pallas_available():
            for _ in range(2):
                x, z, y = admm_chunk(
                    K, A, q, l, u, rv, x, z, y,
                    iters=25, sigma=cfg.admm.sigma, alpha=cfg.admm.alpha,
                )
        return x

    x = jax.vmap(one)(sd.P, sd.A, sd.q, sd.l, sd.u, rho_v, st.kkt_inv)
    xs = xs + 1e-20 * x[:, :7]
    return (st, xs)


timed("scale + 50 ADMM iters (pallas)", repeat(admm_chunks_only), (states, x0s))

print(f"\nbatch={BATCH} N={N} devices={jax.devices()}")
