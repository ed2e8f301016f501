"""Real-Time-Iteration MPC on the batched ADMM solver — the performance path.

TPU-native counterpart of the reference's OSQP RTI controller
(``/root/reference/src/mpc/osqp_rti.py``) and the Diehl RTI scheme
(``rti_mpc.py``): one linearize→QP→shift cycle per control step, with
warm starting from the shifted previous solution and fallback to it when the
QP fails (``osqp_rti.py:521-552``).

Differences by design (SURVEY.md §7):
- Linearization is exact AD of the discrete step (vmapped over the horizon)
  instead of finite differences (``osqp_rti.py:374-401``) or hand-derived
  approximate Jacobians (``:656-710``).
- The whole step — linearize, build QP, ADMM iterations, extract, shift — is
  one jitted pure function of (params, state, x); ``vmap`` runs thousands of
  scenarios in lockstep, ``lax.scan`` runs the closed loop on-device.
- The prepare/feedback phase split (``osqp_rti.py:480-567``) collapses into
  one fused program; the solver's adapted ρ and duals are carried in the
  controller state (OSQP workspace semantics).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from ..dynamics.linearize import trajectory_jacobians
from ..ops.qp import (
    ADMMConfig,
    IPMConfig,
    SOLVED,
    build_mpc_qp,
    join_z,
    solve,
    solve_ipm,
    split_z,
)
from ..ops.qp.admm import _factor, _rho_vec
from ..ops.qp.condensed import build_condensed_qp, recover_states
from ..ops.qp.mpc_qp import build_stage_rows, extend_qp
from ..ops.qp.ruiz import Scaling, ruiz_equilibrate

Array = jax.Array


def _n_extra_rows(config) -> int:
    n_gx = _n_gx_rows(config)
    n_gu = 0 if config.Gu is None else config.Gu.shape[0]
    return config.N * (n_gx + n_gu)


def _n_gx_rows(config) -> int:
    """Per-stage state-row count: constant facet block OR linearized rows."""
    if config.stage_rows_fn is not None:
        if config.Gx is not None:
            raise ValueError(
                "stage_rows_fn replaces the Gx block — set Gx=None")
        if config.n_stage_rows <= 0:
            raise ValueError("stage_rows_fn requires n_stage_rows > 0")
        return config.n_stage_rows
    if config.Gx is None:
        return 0
    # constant (n_gx, n_x) block tiled over stages, or an explicit
    # per-stage (N, n_gx, n_x) array (build_condensed_qp accepts both)
    return config.Gx.shape[1] if config.Gx.ndim == 3 else config.Gx.shape[0]


def _gx_rows(config, X_lin):
    """(Gx, gx_l, gx_u) for the condensed builder: the configured constant
    block, or the per-cycle linearization around ``X_lin``."""
    if config.stage_rows_fn is not None:
        return config.stage_rows_fn(X_lin)
    return config.Gx, config.gx_l, config.gx_u


def _n_bound_states(config) -> int:
    """State components with condensed bound rows (see x_bound_mask)."""
    if config.x_bound_mask is None:
        return config.n_x
    return sum(bool(b) for b in config.x_bound_mask)


def _stage_rows(config):
    """(A_ext, l_ext, u_ext) for the configured facet rows."""
    if config.Gx is not None and config.Gx.ndim == 3:
        raise ValueError(
            "per-stage (N, n_gx, n_x) Gx requires condensed=True (the "
            "sparse stage-row builder tiles one constant block)")
    return build_stage_rows(
        config.N, config.n_x, config.n_u,
        config.Gx, config.gx_l, config.gx_u,
        config.Gu, config.gu_l, config.gu_u,
    )


def _build_rti_qp(config, Aks, Bks, cks, x_current, x_ref):
    """The LTV QP plus any configured per-stage facet rows."""
    if config.stage_rows_fn is not None:
        raise ValueError(
            "stage_rows_fn (linearized state rows) requires condensed=True")
    data = build_mpc_qp(
        Aks, Bks, cks, x_current,
        config.Q, config.R, config.Qf, x_ref,
        config.x_min, config.x_max, config.u_min, config.u_max,
    )
    if config.Gx is not None or config.Gu is not None:
        data = extend_qp(data, *_stage_rows(config))
    return data


def _condensed_admm_cfg(config):
    """ADMM config with the condensed QP's row structure declared (see
    ops/qp/condensed.py row order): state-bound rows Γ are block-lower-
    triangular (stage k depends only on u₀..u_k — ~45% structural zeros),
    control-bound rows are the identity, state facets share Γ's BLT
    structure, and control facets are block-diagonal (stage-local). The
    solver's iteration matvecs then stream only structural nonzeros.
    User-set row_structure wins."""
    if config.admm.row_structure is not None:
        return config.admm
    N, n_u = config.N, config.n_u
    n_b = _n_bound_states(config)
    # horizon chunking for the BLT segments: C=5 keeps 60% of the dense
    # stream with few extra matvec ops; fall back to coarser C when the
    # horizon doesn't divide (C=1 degenerates to a dense segment)
    C = next((c for c in (5, 4, 3, 2) if N % c == 0), 1)
    s = N // C
    segs = []
    if n_b:
        segs.append(("blt", C, s * n_b, s * n_u))
    segs.append(("diag", N * n_u))
    n_gx = _n_gx_rows(config)
    if n_gx:
        # per-stage linearized rows share the constant facet block's BLT
        # pattern (row k touches u_0..u_k via Γ) — the declaration is about
        # sparsity, not values
        segs.append(("blt", C, s * n_gx, s * n_u))
    if config.Gu is not None:
        # the facet block Gu is stage-constant by construction
        # (build_condensed_qp tiles one Gu over all stages) → stream the
        # shared block once per iteration, not N copies
        segs.append(("blockdiag_shared", N, config.Gu.shape[0], n_u))
    return config.admm.replace(row_structure=tuple(segs))


def _solve_qp(config, state, Aks, Bks, cks, x_current, z0_XU, y0):
    """Solve one RTI subproblem in the configured formulation; returns
    (sol, X_sol, U_sol). ``z0_XU`` is the (X, U) primal warm start."""
    N = config.N
    X0, U0 = z0_XU
    if config.condensed:
        Gx, gx_l, gx_u = _gx_rows(config, state.X_lin)
        data, Gs, ds = build_condensed_qp(
            Aks, Bks, cks, x_current,
            config.Q, config.R, config.Qf, state.x_ref,
            config.x_min, config.x_max, config.u_min, config.u_max,
            Gx, gx_l, gx_u,
            config.Gu, config.gu_l, config.gu_u,
            x_bound_mask=config.x_bound_mask,
        )
        if config.solver == "ipm":
            # Mehrotra IPM on the condensed box(+facet) QP: no equality rows
            # (x0 is eliminated), so n_eq=0. ~15-20 Newton iterations of
            # MXU-shaped normal-equation factorizations replace ~100 ADMM
            # HBM-streaming matvec iterations — a bench variant; the ADMM
            # default carries OSQP parity and warm-start semantics. The IPM
            # has no penalty/KKT carry, so ρ rides through unchanged, and
            # its f32-approximate duals must NOT enter the carried dual
            # warm start (solve_ipm contract) — y0 rides through instead.
            if config.warm_kkt:
                raise ValueError("solver='ipm' does not compose with "
                                 "warm_kkt (no KKT inverse to carry)")
            sol = solve_ipm(
                data, IPMConfig(n_eq=0, iters=config.ipm_iters)
            ).replace(rho=state.rho, y=y0)
            U_sol = sol.x.reshape(N, config.n_u)
            X_sol = recover_states(Gs, ds, sol.x, x_current)
            return sol, X_sol, U_sol
        admm = _condensed_admm_cfg(config)
        if config.warm_kkt:
            sol = solve(
                data, U0.reshape(-1), y0, admm, rho0=state.rho,
                fixed_scaling=Scaling(
                    D=state.scal_D, E=state.scal_E, c=state.scal_c
                ),
                kkt_inv0=state.kkt_inv,
            )
        else:
            sol = solve(data, U0.reshape(-1), y0, admm, rho0=state.rho)
        U_sol = sol.x.reshape(N, config.n_u)
        X_sol = recover_states(Gs, ds, sol.x, x_current)
        return sol, X_sol, U_sol
    if config.solver == "ipm":
        raise ValueError(
            "solver='ipm' requires the condensed form (the sparse z=[X;U] "
            "layout interleaves its dynamics equality rows)")
    data = _build_rti_qp(config, Aks, Bks, cks, x_current, state.x_ref)
    if config.warm_kkt:
        sol = solve(
            data, join_z(X0, U0), y0, config.admm, rho0=state.rho,
            fixed_scaling=Scaling(D=state.scal_D, E=state.scal_E, c=state.scal_c),
            kkt_inv0=state.kkt_inv,
        )
    else:
        sol = solve(data, join_z(X0, U0), y0, config.admm, rho0=state.rho)
    X_sol, U_sol = split_z(sol.x, N, config.n_x, config.n_u)
    return sol, X_sol, U_sol


@struct.dataclass
class RTIConfig:
    """RTI settings (defaults mirror ``OSQPRTIConfig``, ``osqp_rti.py:45-71``,
    and its 3-DoF cost/bound choices ``:168-201``)."""

    N: int = struct.field(pytree_node=False, default=15)
    dt: float = 0.1
    n_x: int = struct.field(pytree_node=False, default=7)
    n_u: int = struct.field(pytree_node=False, default=3)

    Q: Array = struct.field(
        default_factory=lambda: jnp.diag(
            jnp.array([0.0, 10.0, 10.0, 10.0, 1.0, 1.0, 1.0])
        )
    )
    R: Array = struct.field(default_factory=lambda: jnp.eye(3) * 0.01)
    Qf: Array = struct.field(
        default_factory=lambda: jnp.diag(
            jnp.array([0.0, 10.0, 10.0, 10.0, 1.0, 1.0, 1.0]) * 10.0
        )
    )
    x_min: Array = struct.field(
        default_factory=lambda: jnp.array([-1e20, -100.0, -100.0, -100.0, -50.0, -50.0, -50.0])
    )
    x_max: Array = struct.field(
        default_factory=lambda: jnp.array([1e20, 500.0, 100.0, 100.0, 50.0, 50.0, 50.0])
    )
    u_min: Array = struct.field(default_factory=lambda: jnp.array([0.3, -5.0, -5.0]))
    u_max: Array = struct.field(default_factory=lambda: jnp.array([5.0, 5.0, 5.0]))

    # default: polish on for conservative accuracy (the active-set KKT refit
    # reaches f32-floor duals on the badly-scaled landing QP whose mass
    # column is cost-free). Real-time deployments instead set accept_pri_tol
    # and drop polish — landing quality is identical with warm starts.
    admm: ADMMConfig = struct.field(
        default_factory=lambda: ADMMConfig(max_iter=100, polish=True)
    )
    # "admm" (default: OSQP semantics, warm starts, ρ/KKT carry — the
    # certified real-time path) or "ipm" (condensed only): a bench variant
    # replacing ~100 HBM-streaming matvec iterations with ~15-20 Newton
    # iterations of batched normal-equation factorizations. Closed-loop
    # landing parity is tested UNDER REFERENCE TRACKING (the supported
    # configuration); with a bare go-to-target cost the exact solver
    # descends measurably faster than the sloppier ADMM (2.3 vs 0.8 m/s
    # touchdown on the 3-DoF drive) — same sharp-solver-exploits-the-cost
    # effect as LMPCConfig's touchdown shaping notes. The 6-DoF cone-
    # constrained stack (8+8 facet rows) also runs on it: measured 0.151 vs
    # 0.309 m/s touchdown, 100% solve success, reference-tracked closed
    # loop. Per-chip wall time is hardware-dependent (measure with
    # scripts/bench_variants.py).
    solver: str = struct.field(pytree_node=False, default="admm")
    ipm_iters: int = struct.field(pytree_node=False, default=20)
    warm_start_duals: bool = struct.field(pytree_node=False, default=True)
    # accept a plan whose primal residual is below this even when the dual
    # termination test has not fired (warm-started RTI plans are primal-
    # feasible long before the duals settle; 0 disables the relaxation)
    accept_pri_tol: float = 0.0
    # carry the KKT inverse across cycles: the Ruiz scaling is frozen at init
    # and the factorization becomes a Newton–Schulz refresh of the previous
    # inverse (~7× cheaper than the Cholesky path per cycle). Requires
    # rti_init(..., step_fn=...) so the initial factorization exists, and an
    # admm config with adaptive_rho disabled (ρ rides in the state instead).
    warm_kkt: bool = struct.field(pytree_node=False, default=False)
    # Re-simulate the linearization trajectory from the measured state each
    # cycle. The reference linearizes around the previous QP solution
    # (osqp_rti.py:539), which under plant-model mismatch drifts away from
    # reality and makes the lateral channels chatter; re-anchoring costs one
    # rollout and keeps the linearization honest.
    reanchor: bool = struct.field(pytree_node=False, default=True)
    # Condensed QP: eliminate states, variables = controls only (N·n_u vs
    # (N+1)·n_x + N·n_u) — see ops/qp/condensed.py. ~5× smaller ADMM matvecs
    # and a 40× cheaper per-cycle factorization, at the cost of the classic
    # condensed conditioning (ΓᵀQΓ); the solution is the same u*. Composes
    # with warm_kkt: the (N·n_u)² KKT inverse is then Newton–Schulz-refreshed
    # across cycles under the frozen init-time Ruiz scaling, removing the
    # per-cycle Cholesky/triangular-solve entirely.
    condensed: bool = struct.field(pytree_node=False, default=False)
    # optional per-stage general linear rows (polyhedral glideslope /
    # gimbal-cone facets): Gx·x_k ∈ [gx_l, gx_u] for k=1..N (stage 0 is
    # pinned by the x_init equality), Gu·u_k ∈ [gu_l, gu_u] for every
    # k < N. None disables (pure box QP).
    Gx: Optional[Array] = None
    gx_l: Optional[Array] = None
    gx_u: Optional[Array] = None
    Gu: Optional[Array] = None
    gu_l: Optional[Array] = None
    gu_u: Optional[Array] = None
    # condensed form only: which state components get bound rows (static
    # tuple of n_x bools; None = all). The state-bound rows are the Γ stream
    # — the ADMM iteration's dominant HBM operand — and components whose box
    # is a decorative envelope (±50..500 m translation boxes that cannot bind
    # in a descent; the reference's NLPs carry no translation boxes at all,
    # only glideslope) should not pay rows: eliding the 7 translation rows of
    # the 6-DoF RT config cuts the profiled ~40 GB/cycle constraint stream
    # roughly in half at batch 4096. Elided components keep dynamics and cost;
    # they lose only their box rows (and any chance back-off on that box) and
    # the state trust region in GP-SCP — acceptable exactly when the box
    # could never bind. The sparse (z=[X;U]) form ignores this.
    x_bound_mask: Optional[tuple] = struct.field(
        pytree_node=False, default=None
    )
    # per-cycle LINEARIZED state rows (condensed form only): a static
    # callable ``fn(X_lin) -> (Gx, gx_l, gx_u)`` with Gx (N, n_gx, n_x)
    # and bounds (N, n_gx) (or broadcastable), re-evaluated at every solve
    # around the current linearization trajectory — the SCP treatment of a
    # SMOOTH nonlinear path constraint (the reference hands these to IPOPT
    # symbolically, ``constraints.py:198-419``; here the constraint rides
    # the same per-cycle linearization as the dynamics). One row per stage
    # replaces an n-facet inner polyhedral approximation — n× fewer rows in
    # the ADMM's dominant BLT stream, and exact (to first order) instead of
    # conservative. ``n_stage_rows`` must state n_gx (static row
    # accounting). Mutually exclusive with constant ``Gx`` rows (the fn
    # REPLACES the Gx block; constant Gu facet rows still compose).
    stage_rows_fn: Optional[Callable] = struct.field(
        pytree_node=False, default=None
    )
    n_stage_rows: int = struct.field(pytree_node=False, default=0)


@struct.dataclass
class RTIState:
    """Controller state carried across control steps (the analogue of the
    OSQP workspace + linearization/warm-start members, ``osqp_rti.py:150-166``)."""

    X_lin: Array  # (N+1, n_x) linearization trajectory
    U_lin: Array  # (N, n_u)
    X_prev: Array  # shifted warm start
    U_prev: Array
    y_prev: Array  # dual warm start
    rho: Array  # adapted ADMM penalty
    x_ref: Array  # (N+1, n_x) reference
    # warm-KKT carry (zero-size placeholders when warm_kkt is off)
    kkt_inv: Array = None
    scal_D: Array = None
    scal_E: Array = None
    scal_c: Array = None


class RTISolution(NamedTuple):
    """Per-step output (mirrors ``OSQPRTISolution``, ``osqp_rti.py:74-87``)."""

    u0: Array
    X_opt: Array
    U_opt: Array
    cost: Array
    iterations: Array
    success: Array


def rti_init(
    config: RTIConfig,
    x0: Array,
    x_target: Array,
    X_init: Optional[Array] = None,
    U_init: Optional[Array] = None,
    u_hover: Optional[Array] = None,
    step_fn: Optional[Callable[[Array, Array], Array]] = None,
) -> RTIState:
    """Initialize with a linear state interpolation and hover thrust guess
    (``osqp_rti.py:403-452``). With ``config.warm_kkt`` pass ``step_fn`` so
    the initial QP scaling and KKT inverse can be computed."""
    N = config.N
    alphas = jnp.linspace(0.0, 1.0, N + 1)[:, None]
    X_lin = (1 - alphas) * x0[None, :] + alphas * x_target[None, :] if X_init is None else X_init
    if U_init is None:
        if u_hover is None:
            u_hover = jnp.zeros(config.n_u).at[0].set(x0[0])  # m·g in normalized units
        U_lin = jnp.tile(u_hover, (N, 1))
    else:
        U_lin = U_init
    if config.condensed:
        # rows = N state-bound blocks + N control-bound blocks + facets
        m = N * (_n_bound_states(config) + config.n_u) + _n_extra_rows(config)
    else:
        # total rows = eq rows (N+1)·n_x + n_vars bound rows + facet rows
        n_vars = (N + 1) * config.n_x + N * config.n_u
        m = (N + 1) * config.n_x + n_vars + _n_extra_rows(config)
    dtype = X_lin.dtype
    if config.warm_kkt:
        if step_fn is None:
            raise ValueError("warm_kkt requires rti_init(..., step_fn=...)")
        # factor the QP that the FIRST rti_step will actually see: with
        # re-anchoring on, that is the rollout of U_lin from x0, not the
        # interpolation (a mismatched initial inverse starts outside the
        # Newton–Schulz convergence region and the refresh never recovers)
        if config.reanchor:
            def _roll(xx, uu):
                xn = step_fn(xx, uu)
                return xn, xn

            _, X_roll0 = jax.lax.scan(_roll, x0, U_lin)
            X_fact = jnp.concatenate([x0[None], X_roll0], axis=0)
        else:
            X_fact = X_lin
        Aks, Bks, cks = trajectory_jacobians(step_fn, X_fact, U_lin)
        if config.condensed:
            Gx0, gx_l0, gx_u0 = _gx_rows(config, X_fact)
            data, _, _ = build_condensed_qp(
                Aks, Bks, cks, x0,
                config.Q, config.R, config.Qf,
                jnp.tile(x_target, (N + 1, 1)),
                config.x_min, config.x_max, config.u_min, config.u_max,
                Gx0, gx_l0, gx_u0,
                config.Gu, config.gu_l, config.gu_u,
                x_bound_mask=config.x_bound_mask,
            )
        else:
            data = _build_rti_qp(
                config, Aks, Bks, cks, x0, jnp.tile(x_target, (N + 1, 1))
            )
        sdata, scal = ruiz_equilibrate(data, max(config.admm.scaling, 3))
        rho_v = _rho_vec(sdata.l, sdata.u, jnp.asarray(config.admm.rho, dtype))
        kkt_inv = _factor(sdata.P, sdata.A, rho_v, config.admm.sigma)
        D, E, c = scal.D, scal.E, scal.c
    else:
        kkt_inv = jnp.zeros((0, 0), dtype)
        D = jnp.zeros(0, dtype)
        E = jnp.zeros(0, dtype)
        c = jnp.asarray(1.0, dtype)
    return RTIState(
        X_lin=X_lin,
        U_lin=U_lin,
        X_prev=X_lin,
        U_prev=U_lin,
        y_prev=jnp.zeros(m, X_lin.dtype),
        rho=jnp.asarray(config.admm.rho, X_lin.dtype),
        x_ref=jnp.tile(x_target, (N + 1, 1)),
        kkt_inv=kkt_inv,
        scal_D=D,
        scal_E=E,
        scal_c=c,
    )


def rti_step(
    step_fn: Callable[[Array, Array], Array],
    config: RTIConfig,
    state: RTIState,
    x_current: Array,
) -> Tuple[RTISolution, RTIState]:
    """One combined prepare+feedback RTI cycle (``osqp_rti.py:569-599``).

    ``step_fn(x, u) → x⁺`` is the discrete dynamics (e.g.
    ``partial(rocket3dof.step, params, dt=config.dt)``). Pure function —
    jit/vmap/scan it freely.
    """
    N = config.N

    if config.reanchor:
        def roll(x, u):
            xn = step_fn(x, u)
            return xn, xn

        _, X_roll = jax.lax.scan(roll, x_current, state.U_lin)
        state = state.replace(
            X_lin=jnp.concatenate([x_current[None], X_roll], axis=0)
        )

    # preparation: linearize along the current trajectory (AD, vmapped)
    Aks, Bks, cks = trajectory_jacobians(step_fn, state.X_lin, state.U_lin)

    # feedback: warm-started ADMM solve
    y0 = state.y_prev if config.warm_start_duals else jnp.zeros_like(state.y_prev)
    sol, X_sol, U_sol = _solve_qp(
        config, state, Aks, Bks, cks, x_current,
        (state.X_prev, state.U_prev), y0,
    )
    ok = (sol.status == SOLVED) | (sol.pri_res <= config.accept_pri_tol)
    # fallback: reuse the shifted previous solution on failure (osqp_rti.py:546-552)
    X_opt = jnp.where(ok, X_sol, state.X_prev)
    U_opt = jnp.where(ok, U_sol, state.U_prev)

    # shift for the next cycle's warm start
    X_shift = jnp.concatenate([X_opt[1:], X_opt[-1:]], axis=0)
    U_shift = jnp.concatenate([U_opt[1:], U_opt[-1:]], axis=0)

    new_state = state.replace(
        X_lin=X_opt,
        U_lin=U_opt,
        X_prev=X_shift,
        U_prev=U_shift,
        y_prev=jnp.where(ok, sol.y, state.y_prev),
        rho=sol.rho,
        **({"kkt_inv": sol.kkt_inv} if config.warm_kkt else {}),
    )
    return (
        RTISolution(
            u0=U_opt[0],
            X_opt=X_opt,
            U_opt=U_opt,
            cost=jnp.where(ok, sol.obj, jnp.inf),
            iterations=sol.iterations,
            success=ok,
        ),
        new_state,
    )


def rti_prepare(
    step_fn: Callable[[Array, Array], Array],
    config: RTIConfig,
    state: RTIState,
):
    """Preparation phase: linearize along the current trajectory and build
    the QP *before* the measurement arrives (the Diehl RTI split,
    ``rti_mpc.py:282-319`` / ``osqp_rti.py:480-499``). Returns the prepared
    (Aks, Bks, cks) to hand to :func:`rti_feedback`."""
    return trajectory_jacobians(step_fn, state.X_lin, state.U_lin)


def rti_feedback(
    config: RTIConfig,
    state: RTIState,
    prepared,
    x_current: Array,
) -> Tuple[RTISolution, RTIState]:
    """Feedback phase: pin the measured state and solve
    (``osqp_rti.py:501-567``). Use with :func:`rti_prepare` when the two
    phases are pipelined around the measurement; ``rti_step`` fuses both."""
    N = config.N
    Aks, Bks, cks = prepared
    y0 = state.y_prev if config.warm_start_duals else jnp.zeros_like(state.y_prev)
    sol, X_sol, U_sol = _solve_qp(
        config, state, Aks, Bks, cks, x_current,
        (state.X_prev, state.U_prev), y0,
    )
    ok = (sol.status == SOLVED) | (sol.pri_res <= config.accept_pri_tol)
    X_opt = jnp.where(ok, X_sol, state.X_prev)
    U_opt = jnp.where(ok, U_sol, state.U_prev)
    X_shift = jnp.concatenate([X_opt[1:], X_opt[-1:]], axis=0)
    U_shift = jnp.concatenate([U_opt[1:], U_opt[-1:]], axis=0)
    new_state = state.replace(
        X_lin=X_opt, U_lin=U_opt, X_prev=X_shift, U_prev=U_shift,
        y_prev=jnp.where(ok, sol.y, state.y_prev), rho=sol.rho,
        # carry the NS-refreshed inverse like rti_step does — refreshing from
        # the stale init-time factorization every cycle would silently lose
        # the KKT chain once the trajectory drifts
        **({"kkt_inv": sol.kkt_inv} if config.warm_kkt else {}),
    )
    return (
        RTISolution(
            u0=U_opt[0], X_opt=X_opt, U_opt=U_opt,
            cost=jnp.where(ok, sol.obj, jnp.inf),
            iterations=sol.iterations, success=ok,
        ),
        new_state,
    )


def simple_rti_step(
    step_fn: Callable[[Array, Array], Array],
    config: RTIConfig,
    state: RTIState,
    x_current: Array,
    gd_steps: int = 15,
    lr: float = 0.05,
) -> Tuple[Array, RTIState]:
    """Gradient-descent fallback without the QP (mirrors ``SimpleRTI``,
    ``rti_mpc.py:483-577``): descend the tracking cost of a rollout w.r.t.
    the control sequence, clip to the thrust box."""

    def rollout_cost(U):
        def body(x, u):
            return step_fn(x, u), x

        xN, X = jax.lax.scan(body, x_current, U)
        E = jnp.concatenate([X, xN[None]], axis=0) - state.x_ref
        return jnp.einsum("ki,ij,kj->", E, config.Q, E) + jnp.einsum(
            "ki,ij,kj->", U, config.R, U
        )

    def gd(U, _):
        g = jax.grad(rollout_cost)(U)
        return jnp.clip(U - lr * g, config.u_min[None, :], config.u_max[None, :]), None

    U, _ = jax.lax.scan(gd, state.U_lin, None, length=gd_steps)
    U_shift = jnp.concatenate([U[1:], U[-1:]], axis=0)
    return U[0], state.replace(U_lin=U_shift, U_prev=U_shift)


def make_rti_controller(
    step_fn: Callable[[Array, Array], Array],
    config: RTIConfig,
    x_target: Array,
    reference_fn: Optional[Callable[[Array], Array]] = None,
    ref_horizon: int = 100,
) -> Tuple[Callable, Callable]:
    """(controller_init, controller_step) pair for the Monte-Carlo campaign
    protocol (``experiments.monte_carlo.run_campaign``).

    ``reference_fn(x0) → (T, n_x)`` optionally generates a per-scenario
    descent reference at init (e.g. ``cubic_descent_reference``); the step
    then tracks the receding window at step k. The reference trajectory rides
    in the controller state so it vmaps per-scenario.
    """

    def cinit(x0: Array):
        state = rti_init(config, x0, x_target,
                         step_fn=step_fn if config.warm_kkt else None)
        if reference_fn is not None:
            X_ref_full = reference_fn(x0)
            need = ref_horizon + config.N + 1
            pad = jnp.tile(X_ref_full[-1:], (max(need - X_ref_full.shape[0], 1), 1))
            X_ref_full = jnp.concatenate([X_ref_full, pad], axis=0)[:need]
            return (state, X_ref_full)
        return state

    def cstep(cstate, x: Array, k: Array):
        if reference_fn is not None:
            state, X_ref_full = cstate
            kk = jnp.minimum(k, ref_horizon - 1)
            window = jax.lax.dynamic_slice_in_dim(X_ref_full, kk, config.N + 1, axis=0)
            state = state.replace(x_ref=window)
            sol, new_state = rti_step(step_fn, config, state, x)
            return sol.u0, (new_state, X_ref_full)
        sol, new_state = rti_step(step_fn, config, cstate, x)
        return sol.u0, new_state

    return cinit, cstep


def rti_closed_loop(
    step_fn: Callable[[Array, Array], Array],
    config: RTIConfig,
    x0: Array,
    x_target: Array,
    n_steps: int,
    landing_altitude: float = 0.1,
    sim_step_fn: Optional[Callable[[Array, Array], Array]] = None,
    X_ref_full: Optional[Array] = None,
) -> dict:
    """Closed-loop simulation: scan over {solve → apply u0 → step → check}
    with landing lanes frozen (mirrors the loop in ``nominal_mpc.py:449-529``
    on the RTI controller; altitude-based termination ``:519``).

    ``sim_step_fn`` lets the plant differ from the controller model (for
    dispersion/fault injection); defaults to ``step_fn``. ``X_ref_full`` is an
    optional time-indexed reference trajectory of length ≥ n_steps + N + 1;
    each control step tracks the receding window starting at the current step
    (the windowing/padding of ``nominal_mpc.py:481-500``). Without it the
    loop tracks the constant target.
    """
    plant = sim_step_fn or step_fn
    state0 = rti_init(config, x0, x_target, u_hover=None,
                      step_fn=step_fn if config.warm_kkt else None)

    def body(carry, k):
        x, state, landed, steps = carry
        if X_ref_full is not None:
            window = jax.lax.dynamic_slice_in_dim(X_ref_full, k, config.N + 1, axis=0)
            state = state.replace(x_ref=window)
        sol, state_new = rti_step(step_fn, config, state, x)
        x_next = plant(x, sol.u0)
        now_landed = x_next[1] < landing_altitude
        x_out = jnp.where(landed, x, x_next)
        state_out = jax.tree.map(
            lambda a, b: jnp.where(landed, a, b), state, state_new
        )
        steps = steps + jnp.where(landed, 0, 1)
        return (x_out, state_out, landed | now_landed, steps), (
            x_out,
            jnp.where(landed, jnp.zeros_like(sol.u0), sol.u0),
            sol.success,
        )

    (x_final, _, landed, steps), (X, U, succ) = jax.lax.scan(
        body, (x0, state0, jnp.asarray(False), jnp.asarray(0, jnp.int32)),
        jnp.arange(n_steps),
    )
    return {
        "X": jnp.concatenate([x0[None], X], axis=0),
        "U": U,
        "x_final": x_final,
        "landed": landed,
        "steps": steps,
        "solver_success": succ,
    }
