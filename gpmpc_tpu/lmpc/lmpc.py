"""Learning MPC (Rosolia–Borrelli) with sampled safe sets.

TPU-native counterpart of ``/root/reference/src/lmpc/lmpc.py``: per-solve KNN
terminal-vertex query with fuel filtering (``:267-284``), an MPC problem with
the convex-hull terminal constraint x_N ∈ Conv(SS_local) in λ-form with soft
slack (``:314-329``), terminal cost Q_valuesᵀλ (``:342-345``), warm start
with λ initialized at the nearest vertex (``:348-363``), and the episode
runner that adds successful trajectories back into the safe set
(``:472-542``).

Where the reference builds a CasADi NLP per solve (``:366-399``), here the
problem is the shared dense ADMM QP with a λ/slack block appended to the
decision vector, linearized along the shifted previous trajectory (RTI
style) — one fixed-shape program that vmaps over scenario batches and whose
safe set grows inside the episode scan.
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
    QPData,
    build_constraints,
    build_cost,
    join_z,
    solve,
    solve_ipm,
    split_z,
)
from ..ops.qp.condensed import build_condensed_qp, recover_states
from ..terminal.convex_hull import hull_constraint_rows
from ..terminal.local_safe_set import KNNResult, knn_query
from ..terminal.safe_set import SafeSet

Array = jax.Array


@struct.dataclass
class LMPCConfig:
    """(mirrors ``LMPCConfig``: N=15, n_terminal_vertices=10, slack 1e4)."""

    N: int = struct.field(pytree_node=False, default=15)
    dt: float = 0.1
    n_x: int = struct.field(pytree_node=False, default=7)
    n_u: int = struct.field(pytree_node=False, default=3)
    n_terminal_vertices: int = struct.field(pytree_node=False, default=10)
    # slack/reg weights are multiples of the local Q-value span (see
    # lmpc_solve: the raw cost-to-go values are O(1e4-1e5), so absolute
    # weights like the reference's 1e4 (lmpc.py:314-329) would make the hull
    # effectively soft; span-relative weights keep it near-hard)
    slack_weight: float = 10.0
    lambda_reg: float = 1e-2
    feasibility_tol: float = 1e-2
    Q: Array = struct.field(
        default_factory=lambda: jnp.diag(jnp.array([0.0, 10.0, 10.0, 10.0, 1.0, 1.0, 1.0]))
    )
    R: Array = struct.field(default_factory=lambda: jnp.eye(3) * 0.01)
    x_min: Array = struct.field(
        default_factory=lambda: jnp.array([-1e20, -100.0, -100.0, -100.0, -50.0, -50.0, -50.0])
    )
    x_max: Array = struct.field(
        default_factory=lambda: jnp.array([1e20, 500.0, 100.0, 100.0, 50.0, 50.0, 50.0])
    )
    u_min: Array = struct.field(default_factory=lambda: jnp.array([0.3, -5.0, -5.0]))
    u_max: Array = struct.field(default_factory=lambda: jnp.array([5.0, 5.0, 5.0]))
    # the near-LP λ block converges primal-first and needs (a) ρ-adaptation
    # room across many chunks (16 chunks stall at ~1e-2 primal / ~30 dual)
    # and (b) a fully-equilibrated condensed operator (GᵀWG + span-scaled
    # λ/slack diag spans orders of magnitude; 10 Ruiz sweeps leave the QP
    # marginal, 20 reach SOLVED in ~550 iterations). The condensed form's
    # structured matvecs make the larger budget cheaper than the old sparse
    # 400-iteration config.
    admm: ADMMConfig = struct.field(
        default_factory=lambda: ADMMConfig(
            max_iter=800, polish=True, rho_adapt_chunks=32, scaling=20
        )
    )
    m_dry: float = 1.0
    fuel_margin: float = 0.0
    # endgame fuel-filter fallback (see terminal.local_safe_set.knn_query):
    # without it the final-descent QPs are infeasible by construction and
    # per-round qp_success_rate caps at ~0.85 on dispersed fleets
    fuel_filter_fallback: bool = struct.field(pytree_node=False, default=True)
    # restrict the hull vertices to the single trajectory of the NEAREST
    # valid neighbor. The λ-hull interpolates cost-to-go linearly between
    # vertices; for the nonlinear rocket that interpolation is only
    # defensible ALONG one flown trajectory — vertices mixed from several
    # trajectories give the terminal cost an optimistic (unreachable) value
    # between them, which is the measured source of fleet-scale probe-cost
    # non-monotonicity (cost bumps appear exactly when other lanes'
    # trajectories join the set). Off by default: the mixed hull is the
    # reference's construction (lmpc.py:267-345) and is less conservative.
    hull_same_trajectory: bool = struct.field(pytree_node=False, default=False)
    # Q-aware terminal candidates: query this many NEAREST states, then keep
    # the n_terminal_vertices with LOWEST stored cost-to-go among them
    # (0 = off: plain nearest-K, the reference's policy). Motivation: on a
    # fleet-scale safe set (10⁵-10⁶ states) the 10 nearest neighbors of the
    # predicted terminal state are near-duplicates from many lanes crossing
    # the same region, all with interchangeable mediocre Q — the value
    # iteration has no descent direction and V(x0) flatlines while candidate
    # churn lets realized cost regress (measured, round-3 1024-lane
    # artifact: V stuck at 104.9k, probe 95.6k → 105.0k). Selecting the
    # lowest-Q vertices WITHIN the local pool keeps the hull anchored to
    # reachable states (the pool is still the nearest ones) but always
    # offers the best locally-known continuations, which is what
    # Q^{j+1} ≤ Q^j needs (lmpc.py:4-24).
    candidate_pool: int = struct.field(pytree_node=False, default=0)
    # distance-penalized candidate score: q + candidate_dist_weight·d²
    # (weighted state distance from knn_query). With weight 0 the pool pick
    # is pure lowest-Q, which lets the hull teleport onto low-Q vertices far
    # from the plan's reachable terminal neighborhood — measured on the
    # 256-lane fleet as a 27%-optimistic round-1 V(x0) that then *rises* as
    # the set densifies. The penalty prices the extra stage cost of steering
    # to a farther vertex, keeping V estimates consistent across rounds
    # while preserving the lowest-Q descent pressure among near-equals.
    candidate_dist_weight: float = 0.0
    # terminal-vertex memory: carry the previous solve's K hull vertices as
    # candidates for the next solve (a vertex only drops out when a better-
    # scoring one appears or it turns fuel-infeasible). LMPC's value
    # monotonicity argument (lmpc.py:4-24) needs D^j ⊇ D^{j-1} — the plain
    # KNN restriction breaks that premise (a densifying safe set CONTRACTS
    # the local neighborhood, silently evicting good vertices and letting
    # V(x0) rise), and this restores it: the previous plan's terminal hull
    # stays available, so V is non-increasing up to solver noise.
    vertex_memory: bool = struct.field(pytree_node=False, default=False)
    # condensed form: states eliminated via X = G·U + d, z = [U; λ; s]
    # (~4.5× fewer variables at N=15, ~17× less ADMM matvec traffic with the
    # row structure declared) — the same QP, solution-parity-tested against
    # the sparse z=[X;U;λ;s] form
    condensed: bool = struct.field(pytree_node=False, default=True)
    # condensed bound-row elision (see RTIConfig.x_bound_mask): the default
    # x_min/x_max above are ±50..500 loose envelopes that cannot bind in a
    # descent — eliding them drops N·n_x of the hull QP's N·(n_x+n_u)+K+n_x+1
    # rows (landing behavior certified equal on the fleet campaign gates)
    x_bound_mask: Optional[tuple] = struct.field(
        pytree_node=False, default=None)
    # "ipm" (default; Mehrotra predictor-corrector, condensed form only) or
    # "admm" (OSQP semantics, the 800-iteration budget above). The hull QP
    # is near-LP — the interior-point regime, and the reference's own LMPC
    # solver class (CasADi/IPOPT, lmpc.py:366-399). Measured on it the IPM
    # is strictly better: ~15-20 Newton iterations reach a better objective
    # at 1e-6 feasibility than ADMM-800 (obj 8810.9 vs 8820.4, violation
    # 9.5e-7 vs 8.7e-4), 2.2x faster fleet rounds — and far more ROBUST on
    # cold dispersed starts: on 16 round-1 fleet QPs (single-seed safe set,
    # dispersed ICs) the IPM solves 84-89% while ADMM's adaptive-ρ
    # trajectory is chaotic — 44% at f32, 69% at f64, failing lanes stall
    # at primal residual O(10) with ρ locked in a bad basin, and the
    # episode fallback then flies a stale plan into the ground. ADMM stays
    # available (and certified in tests) for OSQP-parity and for warm
    # anchored solves, where both succeed.
    # Fleet GROWTH caveat (either solver, worst with the sharper IPM):
    # episodes terminate at the altitude crossing mid-horizon, so a faster
    # swoop truncates the cost sum and each round lands harder than the
    # last — pair growth campaigns with touchdown_speed_weight below.
    solver: str = struct.field(pytree_node=False, default="ipm")
    ipm_iters: int = struct.field(pytree_node=False, default=20)
    # touchdown-speed shaping: extra velocity cost near the ground, gated
    # smoothly on below gate_altitude, applied to the EPISODE stage cost
    # (and hence the stored cost-to-go values). Without it the episode
    # terminates at the altitude crossing mid-horizon, so a fast swoop
    # truncates the cost sum and IS the optimum — touchdowns drift toward
    # (and past) the 2 m/s success gate across LMPC iterations (measured
    # with both solvers; the fleet's mean rose 1.08→1.42 m/s over 6
    # unshaped IPM rounds and single-IC chains reached 2.05-2.12 m/s,
    # churning rejected episodes). The shaping steers through the
    # value-learning pathway only: hard landings store expensive Q-values,
    # so the terminal Qᵀλ term avoids their vertices. Deliberately NOT
    # added to the QP stage cost: stiff near-ground velocity weights make
    # the subproblems thrust-infeasible and crash the fleet (measured:
    # 85 m/s ballistic lanes at weight 2e4).
    #
    # The penalty is a hinge on EXCESS speed, (|v|² − free_speed²)₊, not on
    # speed itself: pricing all near-ground motion distorts the seed
    # trajectory's Q-values too (its own descent pays the gate), which
    # steepens the terminal-cost gradient along the seed and sends round-1
    # dispersed lanes ballistic reaching for deep vertices (measured:
    # 1-2 crashed lanes/16 at weights 100-250 with a plain |v|² gate).
    # With the hinge the ~0.7-1 m/s seed stores zero shaping cost, so the
    # round-1 landscape is untouched and only faster-than-free swoops pay.
    #
    # Default 250, chosen on dispersed-fleet outcomes (the production
    # workload): 6 IPM rounds hold 100% success with bounded touchdowns
    # (~1.0-1.35 m/s) and the probe lane improving on the seed. Heavier
    # weights are a trap: at 1000 a single-IC chain equilibrates beautifully
    # (flat plain cost 20% under seed, ~1.7 m/s) but the FLEET destabilizes
    # in later rounds (success 100%→87.5%, ballistic lanes) — once stored
    # episodes carry shaping cost the terminal-Q gradient steepens, the
    # same mechanism that crashes round 1 under a non-hinged gate. At 250 a
    # single-IC chain rides the 2 m/s gate by episode 3 and churns
    # rejections, but realized plain cost stays flat 16% under the seed —
    # the gate simply stops absorbing worse vertices. 0 = off (touchdowns
    # drift through the success gate). All figures measured, 16-lane CPU
    # fleets / 4-episode chains, 2026-08-18.
    touchdown_speed_weight: float = 250.0
    touchdown_gate_altitude: float = 1.5
    touchdown_gate_width: float = 0.25
    touchdown_free_speed: float = 1.0


class LMPCSolution(NamedTuple):
    """(mirrors ``LMPCSolution``)."""

    X_opt: Array
    U_opt: Array
    u0: Array
    lam: Array
    terminal_q: Array
    success: Array
    slack_norm: Array
    # solver diagnostics (the reference logs solve stats on every solution)
    qp_status: Array
    qp_pri_res: Array


@struct.dataclass
class LMPCState:
    """Warm-start carry across control steps."""

    X_lin: Array
    U_lin: Array
    x_ref: Array
    rho: Array
    # previous solve's terminal-vertex indices (−1 = unset); only consulted
    # when config.vertex_memory is on
    prev_vertices: Array = struct.field(
        default_factory=lambda: jnp.full((10,), -1, jnp.int32))


def lmpc_init(
    config: LMPCConfig, x0: Array, x_target: Array,
    prev_vertices: Optional[Array] = None,
) -> LMPCState:
    N = config.N
    alphas = jnp.linspace(0.0, 1.0, N + 1)[:, None]
    return LMPCState(
        X_lin=(1 - alphas) * x0[None] + alphas * x_target[None],
        U_lin=jnp.tile(jnp.zeros(config.n_u).at[0].set(x0[0]), (N, 1)),
        x_ref=jnp.tile(x_target, (N + 1, 1)),
        rho=jnp.asarray(config.admm.rho),
        prev_vertices=(
            jnp.full((config.n_terminal_vertices,), -1, jnp.int32)
            if prev_vertices is None else prev_vertices.astype(jnp.int32)),
    )


def lmpc_solve(
    step_fn: Callable[[Array, Array], Array],
    config: LMPCConfig,
    safe_set: SafeSet,
    state: LMPCState,
    x0: Array,
) -> Tuple[LMPCSolution, LMPCState]:
    """One receding-horizon LMPC solve (``lmpc.py:244-399``)."""
    N, n_x, n_u, K = config.N, config.n_x, config.n_u, config.n_terminal_vertices
    nz = (N + 1) * n_x + N * n_u
    n_ext = nz + K + n_x

    # re-anchor: forward-simulate the warm-start controls from the measured
    # state so the linearization trajectory is dynamically consistent (the
    # same re-anchoring the GP-MPC SCP does; without it the interpolated
    # init makes every early QP primal-infeasible)
    def roll(x, u):
        xn = step_fn(x, u)
        return xn, xn

    _, X_roll = jax.lax.scan(roll, x0, state.U_lin)
    X_sim = jnp.concatenate([x0[None], X_roll], axis=0)

    # terminal vertex set around the predicted terminal state, fuel-filtered
    # (with the endgame fallback — see knn_query: an emptied filter would
    # make the Σλ=1 row infeasible for the rest of the episode)
    fuel_avail = x0[0] - config.m_dry - config.fuel_margin
    pool = max(config.candidate_pool, K) if config.candidate_pool else K
    res = knn_query(
        safe_set, X_sim[-1], pool, fuel_available=fuel_avail,
        fallback_unfiltered=config.fuel_filter_fallback,
    )
    if pool > K:
        # keep the K lowest-score valid candidates of the local pool (invalid
        # rows sort last and stay invalid after the gather)
        score = jnp.where(
            res.valid,
            res.q_values + config.candidate_dist_weight * res.distances**2,
            jnp.inf,
        )
        _, sel = jax.lax.top_k(-score, K)
        res = KNNResult(
            indices=res.indices[sel], distances=res.distances[sel],
            states=res.states[sel], q_values=res.q_values[sel],
            valid=res.valid[sel],
        )
    if config.vertex_memory:
        # merge the previous solve's vertices into the candidate set and
        # keep the K best by the same score — restores D^j ⊇ D^{j-1} (see
        # LMPCConfig.vertex_memory)
        from ..terminal.local_safe_set import default_state_weights
        from ..ops.linalg import weighted_sq_dists

        prev = state.prev_vertices
        pidx = jnp.maximum(prev, 0)
        feas = safe_set.feasible_mask(fuel_avail)
        if config.fuel_filter_fallback:
            feas = jnp.where(jnp.any(feas), feas, safe_set.mask)
        dup = jnp.any(pidx[:, None] == res.indices[None, :], axis=1)
        pvalid = (prev >= 0) & feas[pidx] & ~dup
        wts = default_state_weights(n_x)
        pd2 = weighted_sq_dists(
            X_sim[-1][None], safe_set.states[pidx], wts)[0]
        cand = KNNResult(
            indices=jnp.concatenate([res.indices, pidx]),
            distances=jnp.concatenate(
                [res.distances, jnp.sqrt(jnp.maximum(pd2, 0.0))]),
            states=jnp.concatenate([res.states, safe_set.states[pidx]]),
            q_values=jnp.concatenate([res.q_values, safe_set.q_values[pidx]]),
            valid=jnp.concatenate([res.valid, pvalid]),
        )
        score = jnp.where(
            cand.valid,
            cand.q_values + config.candidate_dist_weight * cand.distances**2,
            jnp.inf,
        )
        _, sel = jax.lax.top_k(-score, K)
        res = KNNResult(
            indices=cand.indices[sel], distances=cand.distances[sel],
            states=cand.states[sel], q_values=cand.q_values[sel],
            valid=cand.valid[sel],
        )
    if config.hull_same_trajectory:
        tids = safe_set.traj_ids[res.indices]
        nearest = jnp.argmin(jnp.where(res.valid, res.distances, jnp.inf))
        res = res._replace(valid=res.valid & (tids == tids[nearest]))

    # RTI-style linearization
    Aks, Bks, cks = trajectory_jacobians(step_fn, X_sim, state.U_lin)
    state = state.replace(X_lin=X_sim)

    # warm start: λ at the nearest valid vertex
    lam0 = jax.nn.one_hot(jnp.argmin(
        jnp.where(res.valid, res.distances, jnp.inf)), K)

    # The terminal cost Qᵀλ is shifted by the minimum valid Q — exact under
    # Σλ = 1 — so the solver sees only the O(span) cost *differences*, not
    # the huge absolute cost-to-go level.
    q_lam = jnp.where(res.valid, res.q_values, 0.0)
    q_min = jnp.min(jnp.where(res.valid, q_lam, jnp.inf))
    q_shift = jnp.where(res.valid, q_lam - q_min, 0.0)
    span = jnp.maximum(jnp.max(q_shift), 1.0)

    if config.condensed:
        # z = [U; λ; s]: states eliminated via X = G·U + d (Qf = 0 — the
        # hull Q term replaces the terminal tracking cost)
        nu = N * n_u
        n_ext_c = nu + K + n_x
        base, Gs, ds = build_condensed_qp(
            Aks, Bks, cks, x0, config.Q, config.R, jnp.zeros((n_x, n_x)),
            state.x_ref, config.x_min, config.x_max, config.u_min, config.u_max,
            x_bound_mask=config.x_bound_mask,
        )
        A_hull, l_hull, u_hull, _ = hull_constraint_rows(
            res.states, res.q_values, res.valid, nu, xN_offset=0, soft=True
        )
        # condensed coordinates: x_N = G_N·U + d_N, so the identity block on
        # x_N becomes G_N over the U columns and the equality shifts by −d_N
        A_hull = A_hull.at[:n_x, :nu].set(Gs[-1])
        l_hull = l_hull.at[:n_x].add(-ds[-1])
        u_hull = u_hull.at[:n_x].add(-ds[-1])

        P = jnp.zeros((n_ext_c, n_ext_c))
        P = P.at[:nu, :nu].set(base.P)
        P = P.at[nu : nu + K, nu : nu + K].set(
            config.lambda_reg * span * jnp.eye(K))
        P = P.at[nu + K :, nu + K :].set(
            config.slack_weight * span * jnp.eye(n_x))
        q = jnp.concatenate([base.q, q_shift, jnp.zeros(n_x)])
        m_base = base.A.shape[0]
        A = jnp.zeros((m_base + A_hull.shape[0], n_ext_c))
        A = A.at[:m_base, :nu].set(base.A)
        A = A.at[m_base:, :].set(A_hull)
        l = jnp.concatenate([base.l, l_hull])
        u = jnp.concatenate([base.u, u_hull])
        if config.solver == "ipm":
            # IPM contract: equality rows last. The hull block arrives as
            # [n_x hull-eq; Σλ; K λ-bounds] — move the bounds ahead of the
            # equalities (static permutation)
            perm = (list(range(m_base))
                    + list(range(m_base + n_x + 1, m_base + n_x + 1 + K))
                    + list(range(m_base, m_base + n_x + 1)))
            perm = jnp.asarray(perm)
            sol = solve_ipm(
                QPData(P=P, q=q, A=A[perm], l=l[perm], u=u[perm]),
                IPMConfig(n_eq=n_x + 1, iters=config.ipm_iters),
            )
        else:
            # slack warm start at its true value for the λ warm start
            # (x_N − v_nearest): the hull equality rows then start feasible
            s0 = X_sim[-1] - (lam0 @ res.states)
            z0 = jnp.concatenate(
                [state.U_lin.reshape(-1), lam0, s0])
            admm = config.admm
            if admm.row_structure is None:
                # declare the condensed base rows' structure (the hull rows
                # stay a trailing dense segment); see ops/qp/condensed.py
                # row order
                C = next((c for c in (5, 4, 3, 2) if N % c == 0), 1)
                s_blk = N // C
                n_b = (n_x if config.x_bound_mask is None
                       else sum(bool(b) for b in config.x_bound_mask))
                segs = (("diag", nu),) if n_b == 0 else (
                    ("blt", C, s_blk * n_b, s_blk * n_u), ("diag", nu))
                admm = admm.replace(row_structure=segs)
            sol = solve(QPData(P=P, q=q, A=A, l=l, u=u), z0, None, admm,
                        rho0=state.rho)
        U_new = sol.x[:nu].reshape(N, n_u)
        X_new = recover_states(Gs, ds, sol.x[:nu], x0)
        lam = sol.x[nu : nu + K]
        slack = sol.x[nu + K :]
    else:
        if config.solver == "ipm":
            # the sparse z=[X;U;λ;s] layout interleaves its equality rows,
            # which the IPM contract (equality rows last) cannot express —
            # and "ipm" is the DEFAULT, so raising here would break the
            # previously-valid LMPCConfig(condensed=False) construction.
            # Fall back to the certified ADMM path for the sparse form.
            import warnings

            warnings.warn(
                "LMPC sparse form solves on ADMM (solver='ipm' applies to "
                "the condensed form only)", stacklevel=2)
        # sparse z = [X; U; λ; s]
        P_base, q_base = build_cost(
            N, config.Q, config.R, jnp.zeros((n_x, n_x)), state.x_ref
        )
        A_base, l_base, u_base = build_constraints(
            Aks, Bks, cks, x0, config.x_min, config.x_max,
            config.u_min, config.u_max
        )
        A_hull, l_hull, u_hull, _ = hull_constraint_rows(
            res.states, res.q_values, res.valid, nz, xN_offset=nz - n_x,
            soft=True,
        )
        P = jnp.zeros((n_ext, n_ext))
        P = P.at[:nz, :nz].set(P_base)
        P = P.at[nz : nz + K, nz : nz + K].set(
            config.lambda_reg * span * jnp.eye(K))
        P = P.at[nz + K :, nz + K :].set(
            config.slack_weight * span * jnp.eye(n_x))
        q = jnp.concatenate([q_base, q_shift, jnp.zeros(n_x)])
        m_base = A_base.shape[0]
        A = jnp.zeros((m_base + A_hull.shape[0], n_ext))
        A = A.at[:m_base, :nz].set(A_base)
        A = A.at[m_base:, :].set(A_hull)
        l = jnp.concatenate([l_base, l_hull])
        u = jnp.concatenate([u_base, u_hull])
        s0 = X_sim[-1] - (lam0 @ res.states)
        z0 = jnp.concatenate(
            [join_z(state.X_lin, state.U_lin), lam0, s0])
        sol = solve(QPData(P=P, q=q, A=A, l=l, u=u), z0, None, config.admm,
                    rho0=state.rho)
        X_new, U_new = split_z(sol.x[:nz], N, n_x, n_u)
        lam = sol.x[nz : nz + K]
        slack = sol.x[nz + K :]

    # acceptance: primal-feasible plans are usable even when the dual is not
    # yet tight (ADMM on the near-LP λ block converges primal-first); also
    # require at least one usable vertex
    ok = (
        ((sol.status == SOLVED) | (sol.pri_res <= config.feasibility_tol))
        & jnp.any(res.valid)
    )

    X_opt = jnp.where(ok, X_new, state.X_lin)
    U_opt = jnp.where(ok, U_new, state.U_lin)
    X_shift = jnp.concatenate([X_opt[1:], X_opt[-1:]], axis=0)
    U_shift = jnp.concatenate([U_opt[1:], U_opt[-1:]], axis=0)

    new_state = state.replace(
        X_lin=X_shift, U_lin=U_shift,
        # the IPM has no penalty to warm-start; keep the carried ρ intact
        rho=state.rho if config.solver == "ipm" else sol.rho,
        prev_vertices=(
            jnp.where(res.valid, res.indices, -1).astype(jnp.int32)
            if config.vertex_memory else state.prev_vertices),
    )
    return (
        LMPCSolution(
            X_opt=X_opt,
            U_opt=U_opt,
            u0=U_opt[0],
            lam=lam,
            terminal_q=q_lam @ lam,
            success=ok,
            slack_norm=jnp.linalg.norm(slack),
            qp_status=sol.status,
            qp_pri_res=sol.pri_res,
        ),
        new_state,
    )


def lmpc_plan_value(
    step_fn: Callable[[Array, Array], Array],
    config: LMPCConfig,
    safe_set: SafeSet,
    x0: Array,
    x_target: Array,
    settle: int = 4,
    prev_vertices: Optional[Array] = None,
) -> Tuple[Array, Array, Array]:
    """The controller's value estimate V(x0) = planned stage cost + terminal
    Qᵀλ at a fixed state, after ``settle`` re-solves to converge the RTI
    warm start. THIS is the quantity LMPC's value iteration drives down as
    the safe set grows (Rosolia–Borrelli iteration cost, lmpc.py:10-13) and
    the right fleet-scale monotonicity metric: the REALIZED episode cost is
    step-quantized — landing two steps later (e.g. to touch down 40% softer)
    adds ~2 stage costs of altitude error and reads as a 5-10% "regression"
    (measured: realized probe cost tracked episode length exactly, 96.5k@54
    steps vs 106.8k@60, while V(x0) fell monotonically 107.5k → 94.1k over
    the same six rounds). Returns (value, last_solve_ok, terminal_vertices);
    with ``config.vertex_memory``, feed ``terminal_vertices`` back as
    ``prev_vertices`` on the NEXT evaluation (e.g. the next fleet round) so
    the cross-round candidate set is non-contracting — the premise the
    monotonicity argument needs (see LMPCConfig.vertex_memory)."""
    st = lmpc_init(config, x0, x_target, prev_vertices=prev_vertices)

    def body(st, _):
        sol, st = lmpc_solve(step_fn, config, safe_set, st, x0)
        return st, sol

    st, sols = jax.lax.scan(body, st, None, length=settle)
    # sum the SAME stage cost that populates the safe set's Q-values
    # (default_stage_cost includes the touchdown-gate shaping on 7-state
    # layouts) — a bare Q/R quadratic here would mix two cost definitions
    # in V(x0) = plan + terminal Q whenever the plan dips near the gate
    plans = jax.vmap(
        lambda X, U: jnp.sum(jax.vmap(
            lambda x, u: default_stage_cost(x, u, x_target, config)
        )(X[:-1], U))
    )(sols.X_opt, sols.U_opt)
    values = plans + sols.terminal_q
    # every ACCEPTED settle iterate is a feasible plan, so each value is a
    # valid upper bound on V(x0); report the best found over the settled
    # half. The last iterate alone wiggles ±0.3-0.7% across rounds (the RTI
    # warm-start path oscillates, and deeper settles don't contract it —
    # measured at settle 8 and 16), which is larger than the true per-round
    # improvement once the fleet converges.
    half = settle // 2
    idx = jnp.arange(settle)
    cand = jnp.where((idx >= half) & sols.success, values, jnp.inf)
    best = jnp.min(cand)
    last = values[-1]
    value = jnp.where(jnp.isfinite(best), best, last)
    ok = jnp.any(sols.success[half:]) | sols.success[-1]
    return value, ok, st.prev_vertices


def default_stage_cost(x: Array, u: Array, x_target: Array, config: LMPCConfig) -> Array:
    e = x - x_target
    quad = e @ config.Q @ e + u @ config.R @ u
    if config.n_x not in (7, 14):
        # the touchdown gate hardcodes the shared [m, r(3), v(3), …] layout
        # (altitude x[1], velocity x[4:7]) of BOTH rocket models; on any
        # other state layout the shaping indices would silently price the
        # wrong components — plain quadratic there (pass a stage_cost_fn to
        # the episode runners to shape custom layouts)
        return quad
    gate = jax.nn.sigmoid(
        (config.touchdown_gate_altitude - x[1]) / config.touchdown_gate_width
    )
    excess = jnp.maximum(
        0.0, jnp.sum(x[4:7] ** 2) - config.touchdown_free_speed**2
    )
    return quad + config.touchdown_speed_weight * gate * excess


def lmpc_config_6dof(
    params=None,
    N: int = 15,
    dt: float = 0.1,
    **overrides,
) -> LMPCConfig:
    """LMPC on the full 14-state quaternion model — the reference's primary
    LMPC formulation (its NLP embeds the symbolic 6-DoF dynamics,
    ``/root/reference/src/lmpc/lmpc.py:417-470``, with the 3-DoF
    ``SimpleLMPC`` as the reduced skeleton ``:561-603``). ``lmpc_solve`` is
    model-generic; this factory supplies the 14-dim pieces: the Szmuk
    cost weights, the attitude/rate state box, the thrust-annulus ∩
    gimbal-cone inner control box, and the 6-DoF dry mass. The λ-hull then
    interpolates 14-dim stored states (quaternion components as vertex
    coordinates — exact under Σλ=1 near-upright, where the renormalizing
    step absorbs the O(‖q‖−1) interpolation defect) and the KNN query uses
    the 14-dim block weights (``local_safe_set.default_state_weights``).
    """
    from ..dynamics.rocket6dof import Rocket6DoFParams
    from ..mpc.cost_functions import CostWeights
    from ..mpc.rti6dof import control_box_6dof, state_box_6dof

    p = params or Rocket6DoFParams()
    w = CostWeights()
    x_min, x_max = state_box_6dof(p)
    u_min, u_max = control_box_6dof(p)
    return LMPCConfig(
        N=N, dt=dt, n_x=14, n_u=3,
        Q=w.Q_6dof(), R=w.R(3),
        x_min=x_min, x_max=x_max, u_min=u_min, u_max=u_max,
        m_dry=p.m_dry,
        **overrides,
    )


def fly_episode(
    step_fn: Callable[[Array, Array], Array],
    config: LMPCConfig,
    safe_set: SafeSet,
    x0: Array,
    x_target: Array,
    max_steps: int,
    landing_altitude: float = 0.1,
    stage_cost_fn: Optional[Callable] = None,
) -> dict:
    """Closed-loop LMPC episode against a *frozen* safe set; returns the
    realized trajectory and outcome without inserting it (so it vmaps over
    a scenario fleet — see :func:`run_fleet_iterations`)."""
    cost_fn = stage_cost_fn or (lambda x, u: default_stage_cost(x, u, x_target, config))
    state0 = lmpc_init(config, x0, x_target)

    def body(carry, _):
        x, st, landed, steps = carry
        sol, st_new = lmpc_solve(step_fn, config, safe_set, st, x)
        x_next = step_fn(x, sol.u0)
        now_landed = x_next[1] < landing_altitude
        x_out = jnp.where(landed, x, x_next)
        st_out = jax.tree.map(lambda a, b: jnp.where(landed, a, b), st, st_new)
        steps = steps + jnp.where(landed, 0, 1)
        cost = jnp.where(landed, 0.0, cost_fn(x, sol.u0))
        return (x_out, st_out, landed | now_landed, steps), (
            x_out, jnp.where(landed, jnp.zeros_like(sol.u0), sol.u0), cost,
            sol.success, ~landed,
        )

    (x_f, _, landed, steps), (X, U, costs, qp_ok, live) = jax.lax.scan(
        body, (x0, state0, jnp.asarray(False), jnp.asarray(0, jnp.int32)),
        None, length=max_steps,
    )
    X_full = jnp.concatenate([x0[None], X], axis=0)
    # landing quality gate before safe-set insertion
    soft = jnp.linalg.norm(x_f[4:7]) < 2.0
    success = landed & soft
    return {
        "X": X_full,
        "U": U,
        "costs": costs,
        "x_final": x_f,
        "landed": landed,
        "success": success,
        "steps": steps,
        "total_cost": jnp.sum(costs),
        # over LIVE steps only (frozen post-landing re-solves are not flown)
        "qp_success_rate": jnp.sum((qp_ok & live).astype(jnp.float32))
        / jnp.maximum(jnp.sum(live.astype(jnp.float32)), 1.0),
    }


def run_episode(
    step_fn: Callable[[Array, Array], Array],
    config: LMPCConfig,
    safe_set: SafeSet,
    x0: Array,
    x_target: Array,
    max_steps: int,
    landing_altitude: float = 0.1,
    stage_cost_fn: Optional[Callable] = None,
) -> Tuple[dict, SafeSet]:
    """Closed-loop LMPC episode; on success the realized trajectory (with its
    cost-to-go) joins the safe set and the iteration counter advances
    (``lmpc.py:472-542``). Fixed ``max_steps`` with frozen lanes."""
    out = fly_episode(
        step_fn, config, safe_set, x0, x_target, max_steps,
        landing_altitude, stage_cost_fn,
    )
    ss_new = safe_set.add_trajectory(
        out["X"][:-1], out["U"], out["costs"], valid=out["success"]
    )
    return out, ss_new


def run_iterations(
    step_fn, config: LMPCConfig, safe_set: SafeSet, x0: Array, x_target: Array,
    n_iterations: int, max_steps: int,
) -> Tuple[list, SafeSet]:
    """Iterative improvement loop: repeat episodes, each adding to the safe
    set; returns per-iteration summaries (costs should be non-increasing —
    the LMPC monotonicity property)."""
    summaries = []
    for _ in range(n_iterations):
        out, safe_set = run_episode(
            step_fn, config, safe_set, x0, x_target, max_steps
        )
        summaries.append({k: out[k] for k in ("success", "steps", "total_cost")})
    return summaries, safe_set


def run_fleet_iterations(
    step_fn,
    config: LMPCConfig,
    safe_set: SafeSet,
    x0s: Array,  # (B, n_x) fleet of initial conditions
    x_target: Array,
    n_rounds: int,
    max_steps: int,
) -> Tuple[list, SafeSet]:
    """Fleet LMPC: every lane flies an episode against the same frozen safe
    set in lockstep (one vmapped XLA program per round — the scenario-axis
    parallelism SURVEY §2.10 calls for, where the reference's episode loop
    is strictly sequential, ``online_learner.py:529-677``); the successful
    trajectories then merge into the safe set in deterministic lane order
    before the next round. Freezing the set within a round keeps lanes
    independent — episodes shard over any device mesh with outcome-identical
    results (exact state parity is limited by f32 reduction-order noise
    under different batch tilings, amplified by the near-LP hull QP; see
    tests/test_parallel.py) — and the growth the sequential runner would
    have seen mid-round arrives one round later.
    """
    fly = jax.jit(
        jax.vmap(
            lambda ss, x: fly_episode(
                step_fn, config, ss, x, x_target, max_steps
            ),
            in_axes=(None, 0),
        )
    )

    def add_many(ss, X, U, costs, success):
        def body(ss, tr):
            Xi, Ui, ci, oki = tr
            return ss.add_trajectory(Xi[:-1], Ui, ci, valid=oki), None

        ss, _ = jax.lax.scan(body, ss, (X, U, costs, success))
        return ss

    add_many = jax.jit(add_many)

    summaries = []
    for _ in range(n_rounds):
        out = fly(safe_set, x0s)
        safe_set = add_many(
            safe_set, out["X"], out["U"], out["costs"], out["success"]
        )
        summaries.append(
            {
                "success_rate": float(jnp.mean(out["success"].astype(jnp.float32))),
                "total_cost_mean": float(jnp.mean(out["total_cost"])),
                "steps_mean": float(jnp.mean(out["steps"].astype(jnp.float32))),
                "qp_success_rate": float(jnp.mean(out["qp_success_rate"])),
            }
        )
    return summaries, safe_set


class SimpleLMPC:
    """Reduced stand-in (``lmpc.py:561-603``): tracks the lowest-Q neighbor
    as a receding target using a plain quadratic controller."""

    def __init__(self, config: Optional[LMPCConfig] = None):
        self.config = config or LMPCConfig()

    def control(self, safe_set: SafeSet, x: Array) -> Array:
        res = knn_query(safe_set, x, self.config.n_terminal_vertices)
        best = jnp.argmin(jnp.where(res.valid, res.q_values, jnp.inf))
        idx = res.indices[best]
        return safe_set.controls[idx]
