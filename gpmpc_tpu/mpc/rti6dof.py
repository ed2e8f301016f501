"""6-DoF quaternion RTI-MPC configuration and constraint handling.

Brings the RTI controller up on the full 14-state quaternion model
(SURVEY.md §7 M7; the reference solves this as a CasADi/IPOPT NLP,
``nominal_mpc.py:151-447``). The QP works in the full 14-dim state with the
renormalized discrete step linearized by AD; the nonconvex thrust annulus and
gimbal cone are handled by

- an inner box approximation in the QP: u_x ∈ [T_min·cosδ_max + margin,
  T_max], |u_y|,|u_z| ≤ T_max·sinδ_max/√2 (every box point satisfies both
  ‖u‖ ≤ T_max and the gimbal cone; the lower bound keeps ‖u‖ ≥ T_min), or
- polyhedral cone facets (``rti_config_6dof(cone_facets=8)``): per-stage
  linear rows cosφ_j·u_y + sinφ_j·u_z ≤ cos(π/n)·tanδ_max·u_x — an inner
  approximation of the true cone that couples lateral to axial authority
  instead of capping it at the T_min corner (ditto ``glideslope_facets``
  for the position cone), and always
- exact post-projection ``clamp_thrust ∘ clamp_gimbal`` on the applied u0
  (mirroring the reference's post-hoc handling, ``rocket_6dof.py:634-669``).

Tilt/rate limits are enforced through the attitude weights and the box
bounds on q_y, q_z, ω (|q_tilt| ≤ sin(θ_max/2), |ω| ≤ ω_max/√3 per axis —
inner approximations of the quadratic constraints).
"""

from __future__ import annotations

import math
from typing import Callable, Optional, Tuple

import jax.numpy as jnp

from ..dynamics.rocket6dof import Rocket6DoFParams, clamp_gimbal, clamp_thrust
from ..ops.qp import ADMMConfig
from .cost_functions import CostWeights
from .rti import RTIConfig

Array = jnp.ndarray


def control_box_6dof(params: Rocket6DoFParams) -> Tuple[Array, Array]:
    """Inner box of the thrust annulus ∩ gimbal cone (body frame, +x axis).

    The cone couples the lateral limit to axial thrust (|u_perp| ≤ u_x tanδ),
    so the box's lateral half-width is set by the *lowest* admissible u_x:
    lat = T_min·sinδ/√2; then u_x_max shrinks so the max-thrust corner stays
    inside ‖u‖ ≤ T_max. Every box point is exactly feasible.
    """
    ux_min = params.T_min * math.cos(params.delta_max)
    lat = params.T_min * math.sin(params.delta_max) / math.sqrt(2.0)
    ux_max = math.sqrt(max(params.T_max**2 - 2.0 * lat**2, ux_min**2))
    u_min = jnp.array([ux_min + 1e-3, -lat, -lat])
    u_max = jnp.array([ux_max, lat, lat])
    return u_min, u_max


def gimbal_cone_rows(
    params: Rocket6DoFParams, n_facets: int = 8
) -> Tuple[Array, Array, Array]:
    """Inner polyhedral facets of the gimbal cone ‖u_perp‖ ≤ u_x·tanδ_max.

    Facet j: cosφ_j·u_y + sinφ_j·u_z ≤ cos(π/n)·tanδ_max·u_x. Because
    max_j(cosφ_j a + sinφ_j b) ≥ ‖(a,b)‖·cos(π/n), every point satisfying all
    facets satisfies the true cone — an inner approximation whose loss is
    1−cos(π/n) (≈8% at n=8, 2% at n=16), versus the lateral box's
    T_min·sinδ/√2 cap which forfeits most of the cone at high throttle.
    Returns (Gu, gu_l, gu_u) for :class:`rti.RTIConfig`.
    """
    phis = 2.0 * math.pi * jnp.arange(n_facets) / n_facets
    shrink = math.cos(math.pi / n_facets) * math.tan(params.delta_max)
    Gu = jnp.stack(
        [-shrink * jnp.ones(n_facets), jnp.cos(phis), jnp.sin(phis)], axis=1
    )
    return Gu, jnp.full(n_facets, -jnp.inf), jnp.zeros(n_facets)


def glideslope_rows(
    gamma_gs: float, n_x: int, n_facets: int = 8, h_offset: float = 0.2
) -> Tuple[Array, Array, Array]:
    """Inner polyhedral facets of the glideslope cone ‖r_horiz‖ ≤ h·tanγ
    (``constraints.eval_glideslope``; reference
    ``src/mpc/constraints.py:112-132``). Uses the shared state layout
    x = [m, h, r_y, r_z, …] of both rocket models. ``h_offset`` drops the
    cone vertex that far below the pad (‖r_horiz‖ ≤ (h+h₀)·tanγ) so the
    terminal-approach QPs stay feasible as h → 0 — without it the cone
    pinches to a point at touchdown and the last few cycles fall back to
    the shifted plan. Returns (Gx, gx_l, gx_u).
    """
    phis = 2.0 * math.pi * jnp.arange(n_facets) / n_facets
    shrink = math.cos(math.pi / n_facets) * math.tan(gamma_gs)
    Gx = jnp.zeros((n_facets, n_x))
    Gx = Gx.at[:, 1].set(-shrink)
    Gx = Gx.at[:, 2].set(jnp.cos(phis))
    Gx = Gx.at[:, 3].set(jnp.sin(phis))
    return (
        Gx,
        jnp.full(n_facets, -jnp.inf),
        jnp.full(n_facets, shrink * h_offset),
    )


def glideslope_linearized(
    gamma_gs: float, h_offset: float = 0.2, eps: float = 1e-3
):
    """Per-cycle linearization of the SMOOTH glideslope cone
    ‖r_horiz‖ ≤ (h + h₀)·tanγ — the reference's formulation
    (``src/mpc/constraints.py:112-132`` hands the smooth constraint to
    IPOPT symbolically; here it rides the SCP's per-cycle linearization
    like the dynamics do). Returns a ``RTIConfig.stage_rows_fn``:

        fn(X_lin) -> (Gx (N,1,n_x), gx_l (N,1), gx_u (N,1))

    One row per stage replaces an n-facet inner polyhedral approximation —
    n× fewer rows in the ADMM's dominant Γ-composed stream, and exact to
    first order instead of cos(π/n)-conservative. The Euclidean norm is
    ε-smoothed (‖r‖_ε = √(r·r + ε²)) so the row is defined on the cone
    axis; because ‖·‖_ε is convex, the linearized set is an OUTER
    approximation that the SCP tightens as the iterate converges (standard
    successive linearization; the closed-loop cone adherence is what the
    tests gate). ``h_offset`` drops the cone vertex below the pad exactly
    like :func:`glideslope_rows`.
    """
    tan_g = math.tan(gamma_gs)

    def fn(X_lin: Array):
        Xs = X_lin[1:]  # stage rows apply at x_1..x_N
        N, n_x = Xs.shape
        r = Xs[:, 2:4]
        nrm = jnp.sqrt(jnp.sum(r * r, axis=1) + eps * eps)
        G = jnp.zeros((N, 1, n_x), Xs.dtype)
        G = G.at[:, 0, 1].set(tan_g)
        G = G.at[:, 0, 2].set(-r[:, 0] / nrm)
        G = G.at[:, 0, 3].set(-r[:, 1] / nrm)
        # tanγ·h − (r̄/‖r̄‖ε)·r ≥ −tanγ·h₀ + ‖r̄‖ε − r̄·r̄/‖r̄‖ε
        #                       = −tanγ·h₀ + ε²/‖r̄‖ε
        lo = (-tan_g * h_offset + eps * eps / nrm)[:, None]
        hi = jnp.full_like(lo, jnp.inf)
        return G, lo, hi

    return fn


def state_box_6dof(params: Rocket6DoFParams) -> Tuple[Array, Array]:
    """State bounds: loose translation boxes + tilt/rate inner boxes."""
    big = 1e20
    q_tilt = math.sin(min(params.theta_max, math.pi * 0.499) / 2.0)
    w_ax = params.omega_max / math.sqrt(3.0)
    lo = jnp.array(
        [-big, -10.0, -100.0, -100.0, -50.0, -50.0, -50.0,
         -1.0, -1.0, -q_tilt, -q_tilt, -w_ax, -w_ax, -w_ax]
    )
    hi = jnp.array(
        [big, 500.0, 100.0, 100.0, 50.0, 50.0, 50.0,
         1.0, 1.0, q_tilt, q_tilt, w_ax, w_ax, w_ax]
    )
    return lo, hi


def rti_config_6dof(
    params: Optional[Rocket6DoFParams] = None,
    N: int = 15,
    dt: float = 0.1,
    weights: Optional[CostWeights] = None,
    admm: Optional[ADMMConfig] = None,
    cone_facets: int = 0,
    glideslope_facets: int = 0,
    glideslope_smooth: bool = False,
    bound_translation: bool = True,
) -> RTIConfig:
    """Build an :class:`RTIConfig` for the 14-state quaternion model.

    ``cone_facets > 0`` replaces the conservative lateral-thrust box with
    that many polyhedral gimbal-cone rows in the QP (the box then only caps
    u_x and the outer lateral extent T_max·sinδ; the facets couple lateral
    to axial authority). ``glideslope_facets > 0`` adds position glideslope
    rows. 0 keeps the pure box QP.

    ``bound_translation=False`` drops the condensed QP's bound rows for the
    7 translation components [m, r, v] — their ±100..500 m boxes are loose
    envelopes that cannot bind in a landing approach (the reference's 6-DoF
    NLP bounds attitude/rate and constrains position via the glideslope
    cone, never via translation boxes — ``src/mpc/constraints.py:198-419``),
    yet their Γ rows are HALF of the ADMM iteration's dominant HBM stream.
    The attitude/rate rows (q box, ω box) are kept: they bind.
    """
    params = params or Rocket6DoFParams()
    w = weights or CostWeights()
    x_min, x_max = state_box_6dof(params)
    extra = {}
    if not bound_translation:
        extra["x_bound_mask"] = (False,) * 7 + (True,) * 7
    if cone_facets:
        ux_min = params.T_min * math.cos(params.delta_max)
        lat = params.T_max * math.sin(params.delta_max)
        u_min = jnp.array([ux_min + 1e-3, -lat, -lat])
        u_max = jnp.array([params.T_max, lat, lat])
        Gu, gu_l, gu_u = gimbal_cone_rows(params, cone_facets)
        extra.update(Gu=Gu, gu_l=gu_l, gu_u=gu_u)
    else:
        u_min, u_max = control_box_6dof(params)
    if glideslope_smooth:
        if glideslope_facets:
            raise ValueError(
                "glideslope_smooth replaces glideslope_facets — pick one")
        extra.update(
            stage_rows_fn=glideslope_linearized(params.gamma_gs),
            n_stage_rows=1,
        )
    elif glideslope_facets:
        Gx, gx_l, gx_u = glideslope_rows(params.gamma_gs, 14, glideslope_facets)
        extra.update(Gx=Gx, gx_l=gx_l, gx_u=gx_u)
    return RTIConfig(
        N=N,
        dt=dt,
        n_x=14,
        n_u=3,
        Q=w.Q_6dof(),
        R=w.R(3),
        Qf=w.P_6dof(),
        x_min=x_min,
        x_max=x_max,
        u_min=u_min,
        u_max=u_max,
        admm=admm or ADMMConfig(max_iter=100, polish=True),
        **extra,
    )


def project_control_6dof(params: Rocket6DoFParams, u: Array) -> Array:
    """Exact feasibility projection applied to u0 before the plant."""
    return clamp_thrust(params, clamp_gimbal(params, u))


def make_rti6dof_controller(
    step_fn: Callable[[Array, Array], Array],
    params: Rocket6DoFParams,
    config: RTIConfig,
    x_target: Array,
    reference_fn: Optional[Callable] = None,
    ref_horizon: int = 120,
):
    """(cinit, cstep) for Monte-Carlo campaigns, with the exact control
    projection composed after the QP."""
    from .rti import make_rti_controller

    cinit, cstep = make_rti_controller(
        step_fn, config, x_target, reference_fn=reference_fn, ref_horizon=ref_horizon
    )

    def cstep_proj(cstate, x, k):
        u, cstate = cstep(cstate, x, k)
        return project_control_6dof(params, u), cstate

    return cinit, cstep_proj
