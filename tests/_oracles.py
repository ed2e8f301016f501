"""Independent f64 NumPy oracles for parity testing.

None of this code shares any implementation with the JAX solver paths in
``gpmpc_tpu`` — that independence is the point: agreement between the two
certifies correctness against the algorithm literature, not against our own
code.

Contents:

- :func:`ipm_solve` — dense Mehrotra predictor-corrector interior-point QP
  solver for ``min 1/2 x'Px + q'x  s.t.  l <= Ax <= u``. Solves the small
  (few-hundred-variable) MPC QPs to ~1e-10 KKT residuals; used to generate
  the committed golden fixtures (scripts/make_golden_fixtures.py) and as a
  subproblem solver for the sigma-SCP oracle below.

- :func:`osqp_numpy` — a faithful NumPy rendering of OSQP's published
  algorithm (Stellato et al. 2020): modified Ruiz equilibration with cost
  scaling, sigma-regularized KKT with per-row rho (equality rows boosted
  1e3x), alpha over-relaxation, and OSQP's exact unscaled eps_abs/eps_rel
  termination test. Settings default to the reference's
  (/root/reference/src/mpc/osqp_rti.py:54-60).

- :func:`sigma_scp` — free-final-time trajectory optimization with the
  Szmuk-style time-dilation variable sigma as a *decision variable of the
  convex subproblem* (the reference's formulation,
  scvx_interface.py:232-280): dynamics normalized to tau in [0,1],
  x' = sigma f(x,u), linearized per SCP iteration, fuel = -m_N objective,
  hard terminal rows, virtual-control slack, shrinking trust regions. Used
  to certify that ``gpmpc_tpu.reference.scvx_free_time``'s duration sweep
  finds the same (t_f, fuel) optimum.
"""

from __future__ import annotations

import numpy as np

INF = 1e30


# ---------------------------------------------------------------------------
# Dense Mehrotra predictor-corrector IPM
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

    it = 0
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
        t = sigma * mu - ds_a * dz_a
        dx, dy, ds, dz = solve_newton(r_dual, r_eq, r_ineq, t)

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
# OSQP's published algorithm in NumPy at the reference settings
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
    K_inv = np.linalg.inv(K)  # small dense problem; explicit inverse is fine

    x = np.zeros(n)
    zv = np.zeros(m)
    y = np.zeros(m)
    status = "max_iter"
    iters = max_iter
    for k in range(1, max_iter + 1):
        rhs = np.concatenate([sigma * x - qs, zv - rho_inv * y])
        sol = K_inv @ rhs
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
# Sigma-based free-final-time SCP (Szmuk time-dilation formulation)
# ---------------------------------------------------------------------------

def _f_3dof(x, u, alpha_mdot, g_I, eps=1e-6):
    """3-DoF point-mass continuous dynamics, written independently in NumPy
    (mirrors the physics of gpmpc_tpu.dynamics.rocket3dof.f, drag-free)."""
    m, v = x[0], x[4:7]
    T = np.sqrt(u @ u + eps**2)
    return np.concatenate([[-alpha_mdot * T], v, u / m + g_I])


def _jac_3dof(x, u, alpha_mdot, eps=1e-6):
    m = x[0]
    T = np.sqrt(u @ u + eps**2)
    Jx = np.zeros((7, 7))
    Jx[1:4, 4:7] = np.eye(3)
    Jx[4:7, 0] = -u / m**2
    Ju = np.zeros((7, 3))
    Ju[0] = -alpha_mdot * u / T
    Ju[4:7] = np.eye(3) / m
    return Jx, Ju


def sigma_scp(x0, xT, N=40, iters=20, sigma0=8.0,
              sigma_lo=2.0, sigma_hi=15.0,
              alpha_mdot=1.0 / 30.0, g_I=(-1.0, 0.0, 0.0),
              u_min=(0.3, -5.0, -5.0), u_max=(5.0, 5.0, 5.0),
              m_dry=1.0, m_max=2.5, w_vc=1e4):
    """Free-final-time 3-DoF descent via the sigma time-dilation SCP.

    Normalized time tau in [0,1], Euler steps x_{k+1} = x_k + (sigma/N)
    f(x_k,u_k); decision variables (X, U, sigma, nu); objective: maximize
    final mass (true fuel, linear) + quadratic virtual-control penalty;
    hard terminal position/velocity rows; trust regions shrink 0.8x after
    iteration 3. Returns (X, U, sigma*, fuel*).
    """
    x0 = np.asarray(x0, np.float64)
    xT = np.asarray(xT, np.float64)
    g_I = np.asarray(g_I, np.float64)
    u_min = np.asarray(u_min, np.float64)
    u_max = np.asarray(u_max, np.float64)
    n_x, n_u = 7, 3
    nX = (N + 1) * n_x
    nU = N * n_u
    nV = N * n_x
    n = nX + nU + 1 + nV
    iU, iS, iV = nX, nX + nU, nX + nU + 1

    Xb = np.linspace(x0, xT, N + 1)
    Ub = np.tile(np.array([x0[0] * np.linalg.norm(g_I), 0.0, 0.0]), (N, 1))
    Sb = sigma0
    tr_x, tr_u, tr_s = 10.0, 3.0, 3.0

    for it in range(iters):
        s = Sb / N
        P = np.eye(n) * 1e-6
        P[iV:, iV:] = np.eye(nV) * w_vc
        q = np.zeros(n)
        q[N * n_x + 0] = -1.0  # maximize final mass
        rows, lo, up = [], [], []

        def add(row, l_, u_):
            rows.append(row); lo.append(l_); up.append(u_)

        for i in range(n_x):  # init condition
            r = np.zeros(n); r[i] = 1.0
            add(r, x0[i], x0[i])
        for k in range(N):  # dynamics defects with nu slack
            Jx, Ju = _jac_3dof(Xb[k], Ub[k], alpha_mdot)
            fk = _f_3dof(Xb[k], Ub[k], alpha_mdot, g_I)
            rhs = s * (Jx @ Xb[k] + Ju @ Ub[k])
            blk_x = np.eye(n_x) + s * Jx
            blk_u = s * Ju
            for i in range(n_x):
                r = np.zeros(n)
                r[k * n_x:(k + 1) * n_x] = blk_x[i]
                r[iU + k * n_u: iU + (k + 1) * n_u] = blk_u[i]
                r[iS] = fk[i] / N
                r[(k + 1) * n_x + i] = -1.0
                r[iV + k * n_x + i] = 1.0
                add(r, rhs[i], rhs[i])
        for i in range(1, 7):  # hard terminal: position and velocity
            r = np.zeros(n); r[N * n_x + i] = 1.0
            add(r, xT[i], xT[i])
        A = np.asarray(rows); l = np.asarray(lo); u = np.asarray(up)

        # variable bounds: physical ∩ trust region
        xlo = np.full(n, -INF); xhi = np.full(n, INF)
        for k in range(N + 1):
            b = k * n_x
            xlo[b + 0] = max(m_dry, Xb[k, 0] - tr_x)
            xhi[b + 0] = min(m_max, Xb[k, 0] + tr_x)
            xlo[b + 1] = max(0.0, Xb[k, 1] - tr_x)
            xhi[b + 1] = Xb[k, 1] + tr_x
            for i in range(2, 7):
                xlo[b + i] = Xb[k, i] - tr_x
                xhi[b + i] = Xb[k, i] + tr_x
        for k in range(N):
            b = iU + k * n_u
            for i in range(n_u):
                xlo[b + i] = max(u_min[i], Ub[k, i] - tr_u)
                xhi[b + i] = min(u_max[i], Ub[k, i] + tr_u)
        xlo[iS] = max(sigma_lo, Sb - tr_s)
        xhi[iS] = min(sigma_hi, Sb + tr_s)
        Ib = np.eye(n)[:iV]  # no bounds needed on the nu block
        A = np.vstack([A, Ib])
        l = np.concatenate([l, xlo[:iV]])
        u = np.concatenate([u, xhi[:iV]])

        z, _ = ipm_solve(P, q, A, l, u, tol=1e-9, max_iter=120)
        Xb = z[:nX].reshape(N + 1, n_x)
        Ub = z[iU:iU + nU].reshape(N, n_u)
        Sb = float(z[iS])
        if it > 3:
            tr_x *= 0.8; tr_u *= 0.8; tr_s *= 0.8

    return Xb, Ub, Sb, x0[0] - Xb[-1, 0]
