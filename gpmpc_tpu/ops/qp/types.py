"""QP problem/solution containers shared by all solvers.

Canonical form (OSQP form, ``/root/reference/src/mpc/osqp_rti.py:101-105``):

    min  ½ zᵀPz + qᵀz
    s.t. l ≤ Az ≤ u

Equality rows are expressed as l_i = u_i. All containers are pytrees so a
batch of QPs is just a leading axis and ``vmap(solve)`` solves them in
lockstep on the MXU.
"""

from __future__ import annotations

import jax
from flax import struct

Array = jax.Array

# status codes (int so they live in device memory per batch lane)
SOLVED = 0
MAX_ITER = 1
PRIMAL_INFEASIBLE = 2
DUAL_INFEASIBLE = 3

STATUS_NAMES = {
    SOLVED: "solved",
    MAX_ITER: "max_iter_reached",
    PRIMAL_INFEASIBLE: "primal_infeasible",
    DUAL_INFEASIBLE: "dual_infeasible",
}


@struct.dataclass
class QPData:
    """Dense QP data. P: (n,n) symmetric PSD, q: (n,), A: (m,n), l,u: (m,)."""

    P: Array
    q: Array
    A: Array
    l: Array
    u: Array

    @property
    def n(self) -> int:
        return self.q.shape[-1]

    @property
    def m(self) -> int:
        return self.l.shape[-1]


@struct.dataclass
class QPSolution:
    """Solver output. ``x`` primal, ``y`` dual (multipliers of l ≤ Az ≤ u),
    ``z`` the slack estimate Ax at the solution."""

    x: Array
    y: Array
    z: Array
    obj: Array
    pri_res: Array
    dua_res: Array
    iterations: Array
    status: Array
    rho: Array  # adapted ADMM penalty at exit (feed back in as rho0 to warm-start)
    # scaled-space KKT inverse at exit (feed back as kkt_inv0 with the same
    # fixed_scaling for a Newton–Schulz warm factorization); None unless the
    # caller opted into the warm-KKT path
    kkt_inv: object = None

    @property
    def success(self):
        return self.status == SOLVED
