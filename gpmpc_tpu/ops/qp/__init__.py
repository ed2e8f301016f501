"""Batched convex-QP solvers — the single solver family that replaces the
reference's five separate native-solver call sites (OSQP RTI, IPOPT NLPs,
safety QP, hull membership/projection, SCVX subproblems; SURVEY.md §7)."""

from .admm import ADMMConfig, solve, solve_batch, solve_jit
from .ipm import IPMConfig, solve_ipm
from .condensed import (
    build_condensed_qp,
    n_condensed_constraints,
    prediction_matrices,
    recover_states,
)
from .mpc_qp import (
    build_constraints,
    build_cost,
    build_mpc_qp,
    build_stage_rows,
    extend_qp,
    join_z,
    n_constraints,
    n_vars,
    split_z,
)
from .types import (
    DUAL_INFEASIBLE,
    MAX_ITER,
    PRIMAL_INFEASIBLE,
    SOLVED,
    STATUS_NAMES,
    QPData,
    QPSolution,
)

__all__ = [
    "ADMMConfig",
    "IPMConfig",
    "solve_ipm",
    "DUAL_INFEASIBLE",
    "MAX_ITER",
    "PRIMAL_INFEASIBLE",
    "SOLVED",
    "STATUS_NAMES",
    "QPData",
    "QPSolution",
    "build_condensed_qp",
    "build_constraints",
    "build_cost",
    "build_mpc_qp",
    "build_stage_rows",
    "n_condensed_constraints",
    "prediction_matrices",
    "recover_states",
    "extend_qp",
    "join_z",
    "n_constraints",
    "n_vars",
    "solve",
    "solve_batch",
    "solve_jit",
    "split_z",
]
