"""GP-augmented MPC: SCP loop over the shared batched QP solver.

TPU-native counterpart of ``/root/reference/src/mpc/gp_mpc.py``: forward
simulation with the GP mean added to the learned slices (``:139-175,
258-281``), linear uncertainty propagation per iteration (``:283-291,
348-353``), the ≤``scp_iterations`` SCP loop — linearize nominal + GP-mean
affine term, solve a trust-region QP, re-propagate (``:299-353``) — and
chance-constraint tightening from the propagated σ (``:177-215``).

Where the reference hands each subproblem to CasADi/IPOPT (``:462-467``),
here every SCP iteration is the same dense ADMM QP as the RTI path, with the
trust region expressed as per-stage box bounds — so the whole GP-MPC solve is
one fixed-iteration-count XLA program that vmaps over scenarios.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from ..dynamics.linearize import trajectory_jacobians
from ..ops.qp import (
    IPMConfig,
    SOLVED,
    build_mpc_qp,
    extend_qp,
    join_z,
    solve,
    solve_ipm,
    split_z,
)
from ..ops.qp.admm import _factor, _rho_vec
from ..ops.qp.condensed import build_condensed_qp, recover_states
from ..ops.qp.ruiz import Scaling, ruiz_equilibrate
from .rti import (
    RTIConfig,
    _condensed_admm_cfg,
    _gx_rows,
    _n_bound_states,
    _n_extra_rows,
    _stage_rows,
)
from .constraints import normal_quantile
from .uncertainty_prop import box_tightening, propagate_linear

Array = jax.Array


@struct.dataclass
class GPMPCConfig:
    """(mirrors ``GPMPCConfig``, ``gp_mpc.py:44-80`` — trust regions
    ``:427-435``, convergence tol ``:337-343``)."""

    base: RTIConfig = struct.field(default_factory=RTIConfig)
    scp_iterations: int = struct.field(pytree_node=False, default=5)
    trust_region_x: float = 10.0
    trust_region_u: float = 5.0
    convergence_tol: float = 1e-4
    # chance-constraint tightening
    tighten: bool = struct.field(pytree_node=False, default=True)
    confidence: float = 0.95
    sigma0_scale: float = 1e-6
    # σ-multiplier selection (reference gp_params.yaml:84-93 beta_method):
    # "quantile" uses the Gaussian quantile κ(confidence) — the reference's
    # "theoretical" Gaussian-marginal bound; "fixed" uses beta_fixed
    # directly; "calibrated" scales the quantile by beta_calibration (set it
    # from a measured realized-violation campaign — see
    # scripts/run_calibration_tpu.py).
    beta_method: str = struct.field(pytree_node=False, default="quantile")
    beta_fixed: float = 2.0
    beta_calibration: float = 1.0
    # which state components get box back-offs. None = all except mass (0)
    # and altitude (1): backing off the altitude floor forbids the planned
    # touchdown itself and forces late braking (the reference tightens
    # thrust/glideslope/tilt path constraints, never the landing coordinate —
    # constraints.py:427-509).
    tighten_mask: Optional[Array] = None
    # re-anchor the linearization with the GP-AUGMENTED rollout (the
    # reference's forward simulation, gp_mpc.py:258-281). With a coverage-
    # limited GP the 20-step open-loop rollout compounds prediction error and
    # the anchor (= trust-region center) drifts off the reachable manifold;
    # False anchors on the nominal rollout while the GP still enters every
    # defect c_k (the part that matters for the plan).
    augment_rollout: bool = struct.field(pytree_node=False, default=True)
    # carry the KKT inverse across SCP iterations AND control steps: the Ruiz
    # scaling is frozen at init and each SCP subproblem's factorization
    # becomes a Newton–Schulz refresh of the previous inverse (same machinery
    # as RTIConfig.warm_kkt). Requires gp_mpc_init(..., step_fn=...) and an
    # admm config with adaptive_rho disabled (ρ rides in the state).
    warm_kkt: bool = struct.field(pytree_node=False, default=False)
    # evaluate the rollout GP residuals as a frozen per-knot tape (one
    # batched posterior eval at the incumbent plan's knots) instead of
    # sequentially at each rollout state. The tape differs from the exact
    # augmented rollout by O(Δx·∂μ/∂x) — second order in the re-anchoring
    # step — while replacing 20 latency-bound sequential GP posteriors with
    # one batched one (~2.5 ms/cycle at batch 512).
    rollout_gp_tape: bool = struct.field(pytree_node=False, default=False)


class GPMPCSolution(NamedTuple):
    X_opt: Array
    U_opt: Array
    u0: Array
    cost: Array
    scp_iters: Array
    converged: Array
    success: Array
    Sigmas: Array  # propagated covariances (N+1, n_x, n_x)


@struct.dataclass
class GPMPCState:
    """Warm-start carry across control steps."""

    X_lin: Array
    U_lin: Array
    x_ref: Array
    rho: Array
    # ADMM dual warm start, carried across SCP iterations AND control steps
    # (the OSQP-workspace semantics of the RTI path; without it every
    # subproblem restarts its duals from zero and real-time iteration budgets
    # leave the plans primal-feasible but far from optimal)
    y_prev: Array = None
    # warm-KKT carry (zero-size placeholders when config.warm_kkt is off)
    kkt_inv: Array = None
    scal_D: Array = None
    scal_E: Array = None
    scal_c: Array = None


def _augmented_rollout(step_fn, gp_mean_fn, X_guess, U, dt):
    """Forward simulate with the GP mean added to the learned slices
    (``gp_mpc.py:139-175``): x⁺ = F(x,u) + dt·lift(μ_GP(x,u))."""

    def body(x, u):
        x_next = step_fn(x, u) + dt * gp_mean_fn(x, u)
        return x_next, x_next

    # unroll: per-step work is a few tiny fused ops; trip overhead dominates
    _, X = jax.lax.scan(body, X_guess[0], U, unroll=4)
    return jnp.concatenate([X_guess[:1], X], axis=0)


def gp_mpc_solve(
    step_fn: Callable[[Array, Array], Array],
    gp_mean_fn: Callable[[Array, Array], Array],
    gp_var_fn: Callable[[Array, Array], Array],
    config: GPMPCConfig,
    state: GPMPCState,
    x0: Array,
) -> Tuple[GPMPCSolution, GPMPCState]:
    """One receding-horizon GP-MPC solve.

    - ``step_fn(x,u) → x⁺``: nominal discrete dynamics.
    - ``gp_mean_fn(x,u) → lifted residual`` (n_x-vector, already through
      ``lift_residual``) and ``gp_var_fn(x,u) → (n_gp,) variances``.
    Everything jits; vmap over (state, x0) for scenario batches.
    """
    cfg = config.base
    N, n_x, n_u = cfg.N, cfg.n_x, cfg.n_u
    dt = cfg.dt

    aug_step = lambda x, u: step_fn(x, u) + dt * gp_mean_fn(x, u)

    # re-anchor: forward-simulate the warm-start controls from the measured
    # state so the linearization trajectory is dynamically consistent
    # (gp_mpc.py:258-281); trust regions are then meaningful.
    if config.augment_rollout and config.rollout_gp_tape:
        # frozen residual tape: one batched GP eval at the incumbent knots
        tape = jax.vmap(gp_mean_fn)(state.X_lin[:-1], state.U_lin)

        def tape_body(x, inp):
            u, mu = inp
            x_next = step_fn(x, u) + dt * mu
            return x_next, x_next

        _, X_roll = jax.lax.scan(tape_body, x0, (state.U_lin, tape), unroll=4)
        X_sim = jnp.concatenate([x0[None], X_roll], axis=0)
    else:
        roll_mean = gp_mean_fn if config.augment_rollout else (
            lambda x, u: jnp.zeros(n_x, x0.dtype)
        )
        X_sim = _augmented_rollout(
            step_fn, roll_mean, state.X_lin.at[0].set(x0), state.U_lin, dt
        )

    def scp_iter(carry, _):
        X_lin, U_lin, rho, y_prev, kkt_inv, dX_prev, done = carry

        # linearize the NOMINAL dynamics; the GP mean enters only the affine
        # defect term c_k (gp_mpc.py:299-321). Differentiating through the GP
        # posterior (especially a variance-gated one) produces noisy Jacobians
        # that destabilize the QP, and the reference deliberately avoids it.
        Aks, Bks, cks_nom = trajectory_jacobians(step_fn, X_lin, U_lin)
        gp_means = jax.vmap(gp_mean_fn)(X_lin[:-1], U_lin)
        cks = cks_nom + dt * gp_means

        # uncertainty propagation + tightened per-stage box bounds
        gp_vars = jax.vmap(gp_var_fn)(X_lin[:-1], U_lin)
        Sigma0 = config.sigma0_scale * jnp.eye(n_x, dtype=X_lin.dtype)
        prop = propagate_linear(Aks, X_lin, Sigma0, gp_vars, dt)
        if config.tighten:
            if config.beta_method == "fixed":
                kap = jnp.asarray(config.beta_fixed, X_lin.dtype)
            elif config.beta_method == "calibrated":
                kap = config.beta_calibration * normal_quantile(
                    jnp.asarray(config.confidence, X_lin.dtype))
            elif config.beta_method == "quantile":
                kap = None
            else:
                raise ValueError(
                    f"beta_method={config.beta_method!r}; expected "
                    "'quantile', 'fixed', or 'calibrated'")
            backoff = box_tightening(prop.covariances, config.confidence,
                                     kappa=kap)
            # never let back-offs cross a narrow box (e.g. quaternion
            # component bounds) — a crossed box makes the whole QP infeasible
            # and every solve gets rejected; cap at 40% of the box width
            width = jnp.broadcast_to(cfg.x_max - cfg.x_min, X_lin.shape)
            backoff = jnp.minimum(backoff, 0.4 * width)
            if config.tighten_mask is None:
                tmask = jnp.ones(n_x, X_lin.dtype).at[0].set(0.0).at[1].set(0.0)
                if n_x == 14:
                    # canonical 6-DoF layout [m, r, v, q, ω]: never back off
                    # the quaternion coordinate box — attitude uncertainty
                    # belongs in the tilt/rate path constraints (the
                    # reference tightens thrust/glideslope/tilt, never state
                    # coordinates, constraints.py:427-509). A q-box back-off
                    # of ~|q| makes the whole QP infeasible and every solve
                    # gets rejected once the GP variance grows off-data.
                    tmask = tmask.at[7].set(0.0).at[8].set(0.0)
                    tmask = tmask.at[9].set(0.0).at[10].set(0.0)
            else:
                tmask = config.tighten_mask.astype(X_lin.dtype)
            backoff = backoff * tmask[None, :]
        else:
            backoff = jnp.zeros_like(X_lin)

        # trust region ∩ absolute bounds ∩ chance back-offs
        Xlo = jnp.maximum(cfg.x_min[None, :] + backoff, X_lin - config.trust_region_x)
        Xhi = jnp.minimum(cfg.x_max[None, :] - backoff, X_lin + config.trust_region_x)
        Ulo = jnp.maximum(cfg.u_min[None, :], U_lin - config.trust_region_u)
        Uhi = jnp.minimum(cfg.u_max[None, :], U_lin + config.trust_region_u)

        if cfg.condensed:
            # per-cycle linearized state rows (smooth-cone SCP treatment)
            # ride the same iterate the dynamics were linearized around
            Gx_r, gx_l_r, gx_u_r = _gx_rows(cfg, X_lin)
            data, Gs, ds = build_condensed_qp(
                Aks, Bks, cks, x0, cfg.Q, cfg.R, cfg.Qf, state.x_ref,
                Xlo, Xhi, Ulo, Uhi,
                Gx_r, gx_l_r, gx_u_r, cfg.Gu, cfg.gu_l, cfg.gu_u,
                x_bound_mask=cfg.x_bound_mask,
            )
            if cfg.solver == "ipm":
                # Mehrotra IPM on the condensed trust-region QP (box rows
                # only after state elimination → n_eq=0) — the same bench
                # variant as RTIConfig(solver='ipm'). The ADMM workspace
                # carry (ρ AND duals) rides through untouched: solve_ipm's
                # duals are f32-approximate and its own contract forbids
                # warm-starting from them, so y_prev keeps the last ADMM
                # dual in case a schedule hands back.
                sol = solve_ipm(
                    data, IPMConfig(n_eq=0, iters=cfg.ipm_iters)
                ).replace(rho=rho, y=y_prev)
            else:
                sol = solve(
                    data, U_lin.reshape(-1), y_prev, _condensed_admm_cfg(cfg),
                    rho0=rho,
                )
            U_new = sol.x.reshape(N, n_u)
            X_new = recover_states(Gs, ds, sol.x, x0)
        else:
            if cfg.solver == "ipm":
                raise ValueError(
                    "solver='ipm' requires the condensed form (the sparse "
                    "z=[X;U] layout interleaves its dynamics equality rows)")
            if cfg.stage_rows_fn is not None:
                raise ValueError(
                    "stage_rows_fn (linearized state rows) requires "
                    "condensed=True")
            data = build_mpc_qp(
                Aks, Bks, cks, x0, cfg.Q, cfg.R, cfg.Qf, state.x_ref,
                Xlo, Xhi, Ulo, Uhi,
            )
            if cfg.Gx is not None or cfg.Gu is not None:
                # facet rows (glideslope / gimbal cone) ride along in every
                # SCP subproblem, same as the RTI path
                data = extend_qp(data, *_stage_rows(cfg))
            z0 = join_z(X_lin, U_lin)
            if config.warm_kkt:
                sol = solve(
                    data, z0, y_prev, cfg.admm, rho0=rho,
                    fixed_scaling=Scaling(
                        D=state.scal_D, E=state.scal_E, c=state.scal_c
                    ),
                    kkt_inv0=kkt_inv,
                )
                # keep a frozen lane's inverse untouched so later control
                # steps resume the refresh chain from the last live
                # factorization
                kkt_inv = jnp.where(done, kkt_inv, sol.kkt_inv)
            else:
                sol = solve(data, z0, y_prev, cfg.admm, rho0=rho)
            X_new, U_new = split_z(sol.x, N, n_x, n_u)
        # accept primal-feasible plans below the tolerance even when the dual
        # termination test has not fired, like the RTI path (warm-started SCP
        # subproblems are primal-feasible long before the duals settle)
        ok = (sol.status == SOLVED) | (sol.pri_res <= cfg.accept_pri_tol)
        X_new = jnp.where(ok, X_new, X_lin)
        U_new = jnp.where(ok, U_new, U_lin)

        dX = jnp.max(jnp.abs(X_new - X_lin)) + jnp.max(jnp.abs(U_new - U_lin))
        # a REJECTED solve leaves the iterate unchanged (dX = 0) — that is a
        # failure, not convergence; keep iterating so the carried duals/ρ can
        # recover on the next subproblem
        newly_done = ok & (dX < config.convergence_tol)
        X_out = jnp.where(done, X_lin, X_new)
        U_out = jnp.where(done, U_lin, U_new)
        # carry the duals even when the plan is rejected: they are the ADMM
        # workspace's progress toward this (slowly-varying) QP family, and
        # discarding them on rejection locks cold-started lanes into
        # rejecting forever (OSQP keeps its workspace across solves likewise;
        # the fallback above already protects the *control*)
        y_out = jnp.where(done, y_prev, sol.y)
        return (X_out, U_out, sol.rho, y_out, kkt_inv, dX, done | newly_done), (
            ok, prop.covariances
        )

    init = (
        X_sim,
        state.U_lin,
        state.rho,
        state.y_prev,
        state.kkt_inv,
        jnp.asarray(jnp.inf, x0.dtype),
        jnp.asarray(False),
    )
    (X_opt, U_opt, rho, y_prev, kkt_inv, dX, converged), (oks, Sigma_hist) = jax.lax.scan(
        scp_iter, init, None, length=config.scp_iterations
    )

    # re-anchor the trajectory at the measured state for the next cycle
    X_shift = jnp.concatenate([X_opt[1:], X_opt[-1:]], axis=0)
    U_shift = jnp.concatenate([U_opt[1:], U_opt[-1:]], axis=0)
    new_state = state.replace(
        X_lin=X_shift, U_lin=U_shift, rho=rho, y_prev=y_prev,
        **({"kkt_inv": kkt_inv} if config.warm_kkt else {}),
    )

    e = X_opt - state.x_ref
    cost = jnp.einsum("ki,ij,kj->", e[:-1], cfg.Q, e[:-1]) + jnp.einsum(
        "ki,ij,kj->", U_opt, cfg.R, U_opt
    ) + e[-1] @ cfg.Qf @ e[-1]

    return (
        GPMPCSolution(
            X_opt=X_opt,
            U_opt=U_opt,
            u0=U_opt[0],
            cost=cost,
            scp_iters=jnp.asarray(config.scp_iterations, jnp.int32),
            converged=converged,
            success=jnp.any(oks),
            Sigmas=Sigma_hist[-1],
        ),
        new_state,
    )


def gp_mpc_init(
    config: GPMPCConfig, x0: Array, x_target: Array,
    X_init: Optional[Array] = None, U_init: Optional[Array] = None,
    step_fn: Optional[Callable[[Array, Array], Array]] = None,
    gp_mean_fn: Optional[Callable[[Array, Array], Array]] = None,
) -> GPMPCState:
    """With ``config.warm_kkt`` pass ``step_fn`` (and the live ``gp_mean_fn``
    if any) so the initial Ruiz scaling and KKT inverse can be computed on
    the QP the first SCP iteration will actually see — the augmented rollout
    from x0, not the interpolation (same re-anchoring rule as
    ``rti.rti_init``: a mismatched initial inverse starts outside the
    Newton–Schulz convergence region)."""
    cfg = config.base
    N = cfg.N
    dtype = x0.dtype
    alphas = jnp.linspace(0.0, 1.0, N + 1)[:, None]
    X_lin = (1 - alphas) * x0[None] + alphas * x_target[None] if X_init is None else X_init
    U_lin = (
        jnp.tile(jnp.zeros(cfg.n_u).at[0].set(x0[0]), (N, 1)) if U_init is None else U_init
    )
    if config.warm_kkt and cfg.condensed:
        # The condensed M = ΓᵀWΓ + … is rebuilt from scratch by every
        # re-linearization, and under GP-SCP steps (augmented defects +
        # tightened boxes re-centering) it moves far enough that the
        # Newton–Schulz refresh chain loses track of it — while the exact
        # (N·n_u)² condensed factorization costs almost nothing (measured ~0
        # at batch 512 on TPU v5e). The condensed path therefore always
        # factors exactly, per subproblem. (RTI's one-linearization cycles
        # drift slowly enough that its condensed warm_kkt is safe — see
        # tests/test_mpc.py::TestWarmKKT.)
        raise ValueError(
            "condensed GP-MPC does not support warm_kkt (and does not need "
            "it: the condensed factorization is cheap; use condensed alone)"
        )
    if config.warm_kkt:
        if step_fn is None:
            raise ValueError("warm_kkt requires gp_mpc_init(..., step_fn=...)")
        gmean = gp_mean_fn or (lambda x, u: jnp.zeros(cfg.n_x, dtype))
        X_fact = _augmented_rollout(
            step_fn, gmean, X_lin.at[0].set(x0), U_lin, cfg.dt
        )
        Aks, Bks, cks = trajectory_jacobians(step_fn, X_fact, U_lin)
        data = build_mpc_qp(
            Aks, Bks, cks, x0, cfg.Q, cfg.R, cfg.Qf,
            jnp.tile(x_target, (N + 1, 1)),
            cfg.x_min, cfg.x_max, cfg.u_min, cfg.u_max,
        )
        if cfg.Gx is not None or cfg.Gu is not None:
            data = extend_qp(data, *_stage_rows(cfg))
        sdata, scal = ruiz_equilibrate(data, max(cfg.admm.scaling, 3))
        rho_v = _rho_vec(sdata.l, sdata.u, jnp.asarray(cfg.admm.rho, dtype))
        kkt_inv = _factor(sdata.P, sdata.A, rho_v, cfg.admm.sigma)
        D, E, c = scal.D, scal.E, scal.c
    else:
        kkt_inv = jnp.zeros((0, 0), dtype)
        D = jnp.zeros(0, dtype)
        E = jnp.zeros(0, dtype)
        c = jnp.asarray(1.0, dtype)
    if cfg.condensed:
        m = N * (_n_bound_states(cfg) + cfg.n_u) + _n_extra_rows(cfg)
    else:
        n_vars = (N + 1) * cfg.n_x + N * cfg.n_u
        m = (N + 1) * cfg.n_x + n_vars + _n_extra_rows(cfg)
    return GPMPCState(
        X_lin=X_lin, U_lin=U_lin,
        x_ref=jnp.tile(x_target, (N + 1, 1)),
        rho=jnp.asarray(cfg.admm.rho, X_lin.dtype),
        y_prev=jnp.zeros(m, dtype),
        kkt_inv=kkt_inv, scal_D=D, scal_E=E, scal_c=c,
    )


def make_gp_mpc_controller(
    step_fn, gp_mean_fn, gp_var_fn, config: GPMPCConfig, x_target: Array,
    reference_fn: Optional[Callable] = None, ref_horizon: int = 100,
):
    """(controller_init, controller_step) for the Monte-Carlo protocol."""

    def cinit(x0):
        st = gp_mpc_init(
            config, x0, x_target,
            step_fn=step_fn if config.warm_kkt else None,
            gp_mean_fn=gp_mean_fn if config.warm_kkt else None,
        )
        if reference_fn is not None:
            Xr = reference_fn(x0)
            need = ref_horizon + config.base.N + 1
            pad = jnp.tile(Xr[-1:], (max(need - Xr.shape[0], 1), 1))
            return (st, jnp.concatenate([Xr, pad], axis=0)[:need])
        return st

    def cstep(cstate, x, k):
        if reference_fn is not None:
            st, Xr = cstate
            kk = jnp.minimum(k, ref_horizon - 1)
            st = st.replace(
                x_ref=jax.lax.dynamic_slice_in_dim(Xr, kk, config.base.N + 1, axis=0)
            )
            sol, st2 = gp_mpc_solve(step_fn, gp_mean_fn, gp_var_fn, config, st, x)
            return sol.u0, (st2, Xr)
        sol, st2 = gp_mpc_solve(step_fn, gp_mean_fn, gp_var_fn, config, cstate, x)
        return sol.u0, st2

    return cinit, cstep


class SimpleGPPredictor:
    """Augmented-dynamics rollout helper (mirrors ``SimpleGPPredictor``,
    ``gp_mpc.py:505-574``)."""

    def __init__(self, step_fn, gp_mean_fn, dt: float = 0.1):
        self.step_fn = step_fn
        self.gp_mean_fn = gp_mean_fn
        self.dt = dt

    def rollout(self, x0: Array, U: Array) -> Array:
        def body(x, u):
            xn = self.step_fn(x, u) + self.dt * self.gp_mean_fn(x, u)
            return xn, xn

        _, X = jax.lax.scan(body, x0, U)
        return jnp.concatenate([x0[None], X], axis=0)
