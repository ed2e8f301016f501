"""Successive convexification (SCVX) trajectory optimization.

TPU-native counterpart of ``/root/reference/src/reference/scvx_interface.py``:
per-iteration convex subproblem with fuel cost Σ dt‖T‖ + virtual-control
penalty λ_vc‖ν‖ (``:235-246``), linearized dynamics with ν slack
(``:254-259``), box bounds and trust regions (``:261-280``), and the outer
re-linearization loop until ‖dx‖, ‖du‖ < tol and ‖ν‖ small (``:315-374``).

Differences by design: each subproblem is the shared dense ADMM QP (the
nonsmooth ‖T‖ and ‖ν‖ terms become slack variables with linear cost via the
standard epigraph-free ℓ₁/ℓ₂-squared reformulation: fuel is approximated by
Σ dt‖T‖² weighting plus a linear term at the linearization point, and ν gets
a quadratic penalty — for powered descent this drives ν → 0 identically and
the fuel-quadratic matches the reference's converged behavior closely); free
final time is handled by an outer scalar sweep over candidate durations
(SURVEY.md §7 hard part 7) instead of a σ decision variable. Fixed iteration
counts; the whole solve jits and vmaps over initial conditions.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
from flax import struct

from ..dynamics.linearize import trajectory_jacobians
from ..ops.qp import ADMMConfig, QPData, SOLVED, join_z, solve, split_z
from ..ops.qp.mpc_qp import build_constraints, build_stage_rows

Array = jax.Array


@struct.dataclass
class SCVXConfig:
    """(mirrors ``SCVXConfig``: N=50 knots, trust regions, vc penalty)."""

    N: int = struct.field(pytree_node=False, default=50)
    n_x: int = struct.field(pytree_node=False, default=7)
    n_u: int = struct.field(pytree_node=False, default=3)
    iterations: int = struct.field(pytree_node=False, default=15)
    trust_x: float = 8.0
    trust_u: float = 3.0
    # geometric trust-region decay per SCP iteration: large early regions
    # let the plan restructure, the decay forces a fixed point (the
    # reference shrinks on rejection, scvx_interface.py:344-356; a fixed
    # schedule is the static-shape equivalent)
    trust_shrink: float = 0.9
    # TRUE fuel objective: minimize -m_N (mass is a state, so fuel is
    # linear in z — matches the reference's sum dt*||T|| once integrated,
    # without the quadratic surrogate's high-thrust bias)
    w_fuel: float = 1.0
    # optional stage cost tracking the straight-line interpolation (off by
    # default: it fights time-aggressive descents)
    w_stage: float = 0.0
    # proximal regularization toward the linearization point: conditions the
    # otherwise terminal-only QP for ADMM without biasing SCP fixed points
    # (its gradient vanishes at the incumbent)
    w_prox: float = 0.05
    eps_reg: float = 1e-4
    # accept a subproblem step when the ADMM primal residual is below this
    # even if the eps_abs/eps_rel test has not fired — the outer loop
    # re-anchors on the exact rollout, so slightly inexact steps are safe
    accept_pri_tol: float = 5e-3
    w_vc: float = 1e3  # virtual-control penalty λ_vc
    w_terminal: float = 100.0
    u_min: Array = struct.field(default_factory=lambda: jnp.array([0.3, -5.0, -5.0]))
    u_max: Array = struct.field(default_factory=lambda: jnp.array([5.0, 5.0, 5.0]))
    x_min: Array = struct.field(
        # mass bounded at m_dry: leaving it free lets the linearized
        # mass-thrust coupling drive the plan to unphysical negative mass
        default_factory=lambda: jnp.array([1.0, 0.0, -100.0, -100.0, -50.0, -50.0, -50.0])
    )
    x_max: Array = struct.field(
        default_factory=lambda: jnp.array([1e20, 500.0, 100.0, 100.0, 50.0, 50.0, 50.0])
    )
    admm: ADMMConfig = struct.field(
        default_factory=lambda: ADMMConfig(max_iter=1000, polish=True)
    )
    # optional per-stage facet rows (e.g. mpc.glideslope_rows — the
    # reference's SCVX formulation carries the glideslope constraint,
    # scvx_interface.py:261-280); Gx applies to x_k for k=1..N, Gu to u_k
    Gx: Optional[Array] = None
    gx_l: Optional[Array] = None
    gx_u: Optional[Array] = None
    Gu: Optional[Array] = None
    gu_l: Optional[Array] = None
    gu_u: Optional[Array] = None


class SCVXSolution(NamedTuple):
    """(mirrors ``SCVXSolution``)."""

    X: Array  # (N+1, n_x)
    U: Array  # (N, n_u)
    converged: Array
    fuel_used: Array
    defect: Array  # max dynamics defect of the returned trajectory
    dt: Array


def scvx_solve(
    step_fn_dt: Callable[[Array, Array, Array], Array],
    config: SCVXConfig,
    x0: Array,
    x_target: Array,
    dt: Array,
    X_init: Optional[Array] = None,
    U_init: Optional[Array] = None,
) -> SCVXSolution:
    """Fixed-final-time SCVX: ``step_fn_dt(x, u, dt) → x⁺``.

    Outer loop: linearize along (X, U) → convex QP with trust regions and a
    terminal-state penalty → update. ``vmap`` over x0 for trajectory-library
    seeding; wrap with :func:`scvx_free_time` for duration optimization.
    """
    N, n_x, n_u = config.N, config.n_x, config.n_u
    nz = (N + 1) * n_x + N * n_u

    alphas = jnp.linspace(0.0, 1.0, N + 1)[:, None]
    X = (1 - alphas) * x0[None] + alphas * x_target[None] if X_init is None else X_init
    U = (
        jnp.tile(jnp.zeros(n_u).at[0].set(x0[0]), (N, 1)) if U_init is None else U_init
    )

    F = lambda x, u: step_fn_dt(x, u, dt)

    # objective: TRUE fuel (linear -w_fuel*m_N), soft terminal, proximal
    # regularization toward the linearization point, optional interpolation
    # tracking (w_stage, off by default)
    Q_track = config.w_stage * jnp.diag(
        jnp.concatenate([jnp.zeros(1), jnp.ones(n_x - 1)])
    )
    Q = Q_track + (config.w_prox + config.eps_reg) * jnp.eye(n_x)
    Qf = config.w_terminal * jnp.diag(
        jnp.array([0.0] + [1.0] * (n_x - 1))
    ) + (config.w_prox + config.eps_reg) * jnp.eye(n_x)
    R = (config.w_prox + config.eps_reg) * jnp.eye(n_u)
    X_ref_interp = (1 - alphas) * x0[None] + alphas * x_target[None]

    def iteration(carry, _):
        X, U, rho, tr_scale = carry
        # linearize around the exact rollout of the incumbent controls
        # (defect-free linearization point — the same re-anchoring pattern as
        # the GP-MPC SCP; trust regions then always contain a feasible plan)
        def roll(x, u):
            xn = F(x, u)
            return xn, xn

        _, Xr = jax.lax.scan(roll, x0, U)
        X_lin = jnp.concatenate([x0[None], Xr], axis=0)

        Aks, Bks, cks = trajectory_jacobians(F, X_lin, U)

        tr_x = config.trust_x * tr_scale
        tr_u = config.trust_u * tr_scale
        Xlo = jnp.maximum(config.x_min[None, :], X_lin - tr_x)
        Xhi = jnp.minimum(config.x_max[None, :], X_lin + tr_x)
        Ulo = jnp.maximum(config.u_min[None, :], U - tr_u)
        Uhi = jnp.minimum(config.u_max[None, :], U + tr_u)
        A, l, u = build_constraints(Aks, Bks, cks, x0, Xlo, Xhi, Ulo, Uhi)
        if config.Gx is not None or config.Gu is not None:
            A_ext, l_ext, u_ext = build_stage_rows(
                N, n_x, n_u,
                config.Gx, config.gx_l, config.gx_u,
                config.Gu, config.gu_l, config.gu_u,
            )
            A = jnp.concatenate([A, A_ext], axis=0)
            l = jnp.concatenate([l, l_ext])
            u = jnp.concatenate([u, u_ext])

        P = jnp.zeros((nz, nz))
        stage = jax.scipy.linalg.block_diag(Q, R)
        k = jnp.arange(N)
        base = k * (n_x + n_u)
        rows = base[:, None, None] + jnp.arange(n_x + n_u)[None, :, None]
        cols = base[:, None, None] + jnp.arange(n_x + n_u)[None, None, :]
        P = P.at[rows, cols].set(jnp.broadcast_to(stage, (N, n_x + n_u, n_x + n_u)))
        P = P.at[nz - n_x :, nz - n_x :].set(Qf)
        Qf_term = config.w_terminal * jnp.diag(
            jnp.array([0.0] + [1.0] * (n_x - 1))
        )
        q = jnp.concatenate(
            [
                jnp.concatenate(
                    [
                        -(X_ref_interp[:-1] @ Q_track.T)
                        - config.w_prox * X_lin[:-1],
                        -config.w_prox * U,
                    ],
                    axis=1,
                ).reshape(-1),
                -(Qf_term @ x_target) - config.w_prox * X_lin[-1],
            ]
        )
        # linear true-fuel term: minimize -w_fuel * m_N (mass is z[nz-n_x])
        q = q.at[nz - n_x].add(-config.w_fuel)

        sol = solve(QPData(P=P, q=q, A=A, l=l, u=u), join_z(X_lin, U),
                    None, config.admm, rho0=rho)
        ok = (sol.status == SOLVED) | (sol.pri_res < config.accept_pri_tol)
        X_new, U_new = split_z(sol.x, N, n_x, n_u)
        X = jnp.where(ok, X_new, X_lin)
        U = jnp.where(ok, U_new, U)
        return (X, U, sol.rho, tr_scale * config.trust_shrink), (ok,)

    (X, U, _, _), (oks,) = jax.lax.scan(
        iteration,
        (X, U, jnp.asarray(config.admm.rho), jnp.asarray(1.0)),
        None,
        length=config.iterations,
    )

    # final feasibility: integrate U exactly and measure terminal error
    def roll(x, u):
        xn = F(x, u)
        return xn, xn

    _, Xr = jax.lax.scan(roll, x0, U)
    X_exact = jnp.concatenate([x0[None], Xr], axis=0)
    defect = jnp.max(jnp.abs(X_exact[-1][1:] - x_target[1:]))
    fuel = x0[0] - X_exact[-1, 0]
    return SCVXSolution(
        X=X_exact, U=U,
        # converged = the plan is dynamically real (exact-rollout terminal
        # defect small) and the final subproblem was accepted. Early-
        # iteration QP rejections are recoverable — the loop re-anchors on
        # the exact rollout — so requiring all(oks) would discard marginal
        # but genuinely converged durations in the free-time sweep.
        converged=oks[-1] & (defect < 1.0),
        fuel_used=fuel,
        defect=defect,
        dt=dt,
    )


def scvx_free_time(
    step_fn_dt, config: SCVXConfig, x0: Array, x_target: Array,
    dt_candidates: Array,
) -> SCVXSolution:
    """Free-final-time via a vmapped sweep over durations: solve fixed-time
    SCVX for each candidate dt and pick the lowest-fuel converged solution
    (the outer scalar search replacing the reference's σ dilation variable,
    ``scvx_interface.py:232``)."""
    sols = jax.vmap(lambda dt: scvx_solve(step_fn_dt, config, x0, x_target, dt))(
        dt_candidates
    )
    score = jnp.where(sols.converged, sols.fuel_used, jnp.inf)
    # fall back to min-defect when nothing converged
    score = jnp.where(
        jnp.any(sols.converged), score, sols.defect
    )
    best = jnp.argmin(score)
    return jax.tree.map(lambda a: a[best], sols)


class SimpleSCVX:
    """PD-rollout reference generator fallback (``scvx_interface.py:409-481``):
    no optimization, just a dynamically feasible descent profile."""

    def __init__(self, step_fn_dt, config: Optional[SCVXConfig] = None):
        self.step_fn_dt = step_fn_dt
        self.config = config or SCVXConfig()

    def generate(self, x0: Array, x_target: Array, dt: float,
                 n_steps: Optional[int] = None) -> SCVXSolution:
        N = n_steps or self.config.N
        kp, kd = 0.4, 1.2

        def body(x, _):
            e_pos = x_target[1:4] - x[1:4]
            e_vel = x_target[4:7] - x[4:7]
            g_comp = jnp.zeros(3).at[0].set(x[0])  # cancels −1 gravity
            u = g_comp + kp * e_pos + kd * e_vel
            T = jnp.linalg.norm(u)
            u = u * jnp.clip(T, self.config.u_min[0], self.config.u_max[0]) / jnp.maximum(T, 1e-8)
            xn = self.step_fn_dt(x, u, dt)
            return xn, (xn, u)

        _, (X, U) = jax.lax.scan(body, x0, None, length=N)
        X = jnp.concatenate([x0[None], X], axis=0)
        return SCVXSolution(
            X=X, U=U,
            converged=jnp.asarray(True),
            fuel_used=x0[0] - X[-1, 0],
            defect=jnp.max(jnp.abs(X[-1][1:4] - x_target[1:4])),
            dt=jnp.asarray(dt),
        )


SCVXSolver = scvx_solve  # name-parity alias
