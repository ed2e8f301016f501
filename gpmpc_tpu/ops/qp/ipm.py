"""Batched primal-dual interior-point QP solver (Mehrotra predictor-corrector).

Second member of the solver family (SURVEY §7 "ADMM first; optional PDIP
later"): same ``QPData`` canonical form as :mod:`.admm`,

    min ½ zᵀPz + qᵀz   s.t.   l ≤ Az ≤ u,

fixed iteration count, static shapes, vmappable. Where it wins: near-LP
problems whose active set ADMM resolves slowly — the LMPC convex-hull QP
needs an 800-iteration ADMM budget (with 32 ρ-adaptation chunks and 20 Ruiz
sweeps) yet still returns a slightly wrong active set; the IPM reaches a
strictly better objective at 1e-6 feasibility in ~15 Newton iterations
(measured: objective 8810.9 vs 8820.4, violation 9.5e-7 vs 8.7e-4 on the
canonical LMPC hull QP). Each iteration is matmul-shaped (AᵀWA formation +
one batched Cholesky shared by predictor and corrector), so ~25 iterations
stream ~10× fewer bytes than the 800 ADMM matvec sweeps.

Where ADMM stays the right tool: the receding-horizon RTI/GP-MPC cycle —
warm starts carry across control steps (IPMs restart from the central path
every solve) and the 50-iteration warm ADMM is already far cheaper than a
cold IPM solve.

Contract: **equality rows (l_i == u_i) must be the LAST ``n_eq`` rows** of
``A`` — they get an explicit multiplier block (eliminating them through the
log barrier crushes the step length; measured, not guessed). Inequality
rows may be one- or two-sided (±inf handled). Infeasible problems are not
certified (the barrier diverges; status stays MAX_ITER) — the intended
workloads (LMPC hull with soft slack, projection QPs) are feasible by
construction.

f32 notes: the solver Ruiz-equilibrates internally (the span-scaled LMPC
weights span ~7 decades; without equilibration the f32 normal equations
stall at μ ≈ 1e-3), clamps the barrier row weights, and freezes the iterate
once μ drops below ``mu_tol`` or a direction goes non-finite — past that
point the f32 normal equations are too ill-conditioned to improve and would
otherwise destroy the converged iterate (measured NaN at μ ≈ 1e-5).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from .ruiz import ruiz_equilibrate
from .types import MAX_ITER, SOLVED, QPData, QPSolution

Array = jax.Array

_BIG = 1e10  # bounds beyond this are treated as infinite


@struct.dataclass
class IPMConfig:
    """Mehrotra predictor-corrector settings. ``n_eq``: number of trailing
    equality rows (static — part of the compiled program's structure)."""

    n_eq: int = struct.field(pytree_node=False, default=0)
    iters: int = struct.field(pytree_node=False, default=20)
    ruiz_iters: int = struct.field(pytree_node=False, default=10)
    tau: float = 0.99  # fraction-to-boundary
    mu_tol: float = 1e-5  # freeze threshold on the scaled barrier parameter
    dua_freeze: float = 1e-3  # scaled stationarity required before freezing
    w_max: float = 1e7  # barrier row-weight clamp (f32 conditioning)
    jitter: float = 1e-6  # normal-equations regularization
    # unscaled termination tolerances (OSQP-style relative form). The
    # primal converges to ~1e-4-1e-3 of the f64 optimum; the DUAL vector is
    # f32-approximate — it converges in the equilibrated space, and the
    # unscale (D⁻¹/c) amplifies its residual by the problem's scale spread
    # (measured ~1e-2 unscaled stationarity on O(30)-normed QPs) — hence
    # tolerances looser than the ADMM path's
    eps_abs: float = 2e-3
    eps_rel: float = 2e-3


def solve_ipm(data: QPData, config: IPMConfig | None = None) -> QPSolution:
    """Solve one QP; ``vmap`` over a leading batch axis of ``data`` for many.

    The last ``config.n_eq`` rows of ``data.A`` must be equality rows
    (l == u). Returns the shared :class:`QPSolution` container (``rho`` is
    reported as 0 — there is no ADMM penalty to warm-start)."""
    cfg = config or IPMConfig()
    sdata, sc = ruiz_equilibrate(data, iters=cfg.ruiz_iters)
    zbar, ybar, sbar, mu, it_used = _ipm_core(
        sdata.P, sdata.q, sdata.A, sdata.l, sdata.u, cfg
    )
    x = sc.D * zbar
    y = (sc.E / sc.c) * ybar
    z = data.A @ x

    # unscaled residuals; status = primal feasibility + scaled
    # complementarity. The solver is PRIMAL-focused: x converges to
    # ~1e-4-1e-3 of the f64 optimum (oracle-tested), while the f32 dual
    # vector can stay rough on badly-scaled problems — dua_res is reported
    # for transparency but does not gate SOLVED (the intended consumers,
    # the LMPC/projection solves, never read y; use the ADMM path when
    # certified duals matter, e.g. for warm starts).
    viol = jnp.maximum(jnp.maximum(data.l - z, z - data.u), 0.0)
    pri_res = jnp.max(viol)
    dua_vec = data.P @ x + data.q + data.A.T @ y
    dua_res = jnp.max(jnp.abs(dua_vec))
    eps_pri = cfg.eps_abs + cfg.eps_rel * jnp.maximum(
        jnp.max(jnp.abs(z)), jnp.maximum(
            jnp.max(jnp.abs(jnp.clip(data.l, -_BIG, _BIG))),
            jnp.max(jnp.abs(jnp.clip(data.u, -_BIG, _BIG)))),
    )
    ok = (pri_res <= eps_pri) & (mu <= 10.0 * cfg.mu_tol)
    status = jnp.where(ok, SOLVED, MAX_ITER).astype(jnp.int32)
    obj = 0.5 * x @ data.P @ x + data.q @ x
    return QPSolution(
        x=x, y=y, z=z, obj=obj, pri_res=pri_res, dua_res=dua_res,
        iterations=it_used, status=status,
        rho=jnp.zeros((), data.q.dtype),
    )


def _ipm_core(P, q, A, l, u, cfg: IPMConfig):
    n = P.shape[0]
    m = A.shape[0]
    n_eq = cfg.n_eq
    dtype = P.dtype
    mI = m - n_eq
    A_I, A_E = A[:mI], A[mI:]
    lI = jnp.maximum(l[:mI], -_BIG)
    uI = jnp.minimum(u[:mI], _BIG)
    b_E = l[mI:]

    eps_g = 1e-8
    I_n = jnp.eye(n, dtype=dtype)

    # start: z = 0, s = Az clipped strictly inside the box (r_pri ~ 0),
    # unit multipliers on finite sides
    z0 = jnp.zeros(n, dtype)
    margin = jnp.minimum(0.25 * (uI - lI), 1.0)
    s0 = jnp.clip(A_I @ z0, lI + margin, uI - margin)
    fin_l = l[:mI] > -_BIG
    fin_u = u[:mI] < _BIG
    zl0 = jnp.where(fin_l, 1.0, 1e-8).astype(dtype)
    zu0 = jnp.where(fin_u, 1.0, 1e-8).astype(dtype)
    yE0 = jnp.zeros(n_eq, dtype)
    n_fin = jnp.maximum(jnp.sum(fin_l) + jnp.sum(fin_u), 1)

    def directions(solveM, W, gl, gu, zl, zu, r_d, r_pI, r_pE, X, sigma_mu):
        """Newton direction for a given centering target, reusing the
        factorization (``solveM``) and the Schur block ``X = M⁻¹A_Eᵀ``."""
        rcl = sigma_mu - zl * gl
        rcu = sigma_mu - zu * gu
        c = rcu / gu - rcl / gl
        r1 = -(r_d + A_I.T @ (c + W * r_pI))
        dz0 = solveM(r1)
        if n_eq > 0:
            # relative jitter: near convergence the active-set weights make
            # M huge, so S = A_E M⁻¹ A_Eᵀ shrinks like 1/W — an absolute
            # jitter would dominate it and freeze the equality duals short
            # of stationarity
            S = A_E @ X
            S = S + (1e-6 * jnp.trace(S) / n_eq + 1e-30) * jnp.eye(
                n_eq, dtype=dtype)
            dyE = jnp.linalg.solve(S, A_E @ dz0 + r_pE)
            dz = dz0 - X @ dyE
        else:
            dyE = jnp.zeros(0, dtype)
            dz = dz0
        ds = A_I @ dz + r_pI
        dzl = (rcl - zl * ds) / gl
        dzu = (rcu + zu * ds) / gu
        return dz, ds, dzl, dzu, dyE

    def step_len(gl, gu, zl, zu, ds, dzl, dzu):
        """Separate primal/dual fraction-to-boundary."""
        a1 = jnp.where(ds < 0, -gl / ds, jnp.inf)
        a2 = jnp.where(ds > 0, gu / ds, jnp.inf)
        a3 = jnp.where(dzl < 0, -zl / dzl, jnp.inf)
        a4 = jnp.where(dzu < 0, -zu / dzu, jnp.inf)
        ap = jnp.minimum(cfg.tau * jnp.min(jnp.minimum(a1, a2)), 1.0)
        ad = jnp.minimum(cfg.tau * jnp.min(jnp.minimum(a3, a4)), 1.0)
        return ap, ad

    def body(carry, _):
        z, s, zl, zu, yE, it_used = carry
        gl = jnp.maximum(s - lI, eps_g)
        gu = jnp.maximum(uI - s, eps_g)
        mu = (jnp.sum(jnp.where(fin_l, zl * gl, 0.0))
              + jnp.sum(jnp.where(fin_u, zu * gu, 0.0))) / n_fin

        W = jnp.clip(zl / gl + zu / gu, 0.0, cfg.w_max)
        r_d = P @ z + q + A_I.T @ (zu - zl) + A_E.T @ yE
        r_pI = A_I @ z - s
        r_pE = A_E @ z - b_E
        # freeze only once complementarity AND (scaled) stationarity have
        # settled — μ alone can undershoot while the duals are still growing
        frozen = (mu < cfg.mu_tol) & (jnp.max(jnp.abs(r_d)) < cfg.dua_freeze)
        M = P + (A_I.T * W) @ A_I
        Lc = jnp.linalg.cholesky(M + cfg.jitter * I_n)
        solveM = lambda B: jax.scipy.linalg.cho_solve((Lc, True), B)
        X = solveM(A_E.T) if n_eq > 0 else None

        # predictor (affine scaling)
        dz, ds, dzl, dzu, dyE = directions(
            solveM, W, gl, gu, zl, zu, r_d, r_pI, r_pE, X, 0.0)
        ap, ad = step_len(gl, gu, zl, zu, ds, dzl, dzu)
        gl_a = jnp.maximum(s + ap * ds - lI, eps_g)
        gu_a = jnp.maximum(uI - s - ap * ds, eps_g)
        mu_aff = (jnp.sum(jnp.where(fin_l, (zl + ad * dzl) * gl_a, 0.0))
                  + jnp.sum(jnp.where(fin_u, (zu + ad * dzu) * gu_a, 0.0))
                  ) / n_fin
        sigma = jnp.clip((mu_aff / jnp.maximum(mu, 1e-14)) ** 3, 0.0, 1.0)

        # corrector (same factorization)
        dz, ds, dzl, dzu, dyE = directions(
            solveM, W, gl, gu, zl, zu, r_d, r_pI, r_pE, X, sigma * mu)
        ap, ad = step_len(gl, gu, zl, zu, ds, dzl, dzu)

        good = (jnp.all(jnp.isfinite(dz)) & jnp.all(jnp.isfinite(ds))
                & jnp.all(jnp.isfinite(dzl)) & jnp.all(jnp.isfinite(dzu))
                & jnp.all(jnp.isfinite(dyE)) & jnp.isfinite(ap)
                & jnp.isfinite(ad))
        live = good & ~frozen
        # select, don't multiply: 0 * inf = NaN would poison the frozen
        # iterate when a post-convergence direction goes non-finite
        upd = lambda old, new: jnp.where(live, new, old)
        z = upd(z, z + ap * dz)
        s = upd(s, jnp.clip(s + ap * ds, lI + eps_g, uI - eps_g))
        zl = upd(zl, jnp.maximum(zl + ad * dzl, 1e-14))
        zu = upd(zu, jnp.maximum(zu + ad * dzu, 1e-14))
        yE = upd(yE, yE + ad * dyE)
        it_used = it_used + live.astype(jnp.int32)
        return (z, s, zl, zu, yE, it_used), None

    (z, s, zl, zu, yE, it_used), _ = jax.lax.scan(
        body, (z0, s0, zl0, zu0, yE0, jnp.asarray(0, jnp.int32)),
        None, length=cfg.iters,
    )
    # dual vector in row order: inequality rows carry zu - zl, equality
    # rows their free multiplier
    y = jnp.concatenate([zu - zl, yE])
    gl = jnp.maximum(s - lI, eps_g)
    gu = jnp.maximum(uI - s, eps_g)
    mu = (jnp.sum(jnp.where(fin_l, zl * gl, 0.0))
          + jnp.sum(jnp.where(fin_u, zu * gu, 0.0))) / n_fin
    return z, y, s, mu, it_used
