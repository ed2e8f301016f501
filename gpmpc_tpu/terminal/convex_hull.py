"""Convex-hull terminal constraints in vertex (λ) representation.

TPU-native counterpart of ``/root/reference/src/terminal/convex_hull.py``:
the terminal constraint x_N = Σλᵢvᵢ, Σλ = 1, λ ≥ 0 (``:1-18``); membership
testing via the λ-feasibility QP (the reference's own fallback when Delaunay
is unavailable, ``:125-178`` — here it is the *primary* method, replacing
Qhull); projection min‖x − Vλ‖² (``:180-229``); and the terminal-set manager
tying a KNN query to the hull vertex set (``:364-459``). The CasADi
``add_constraints`` builder (``:240-361``) corresponds to
:func:`hull_constraint_rows`, which emits the rows the LMPC QP appends for
its λ block.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.qp import ADMMConfig, QPData, SOLVED
from ..ops.qp import solve as qp_solve
from .local_safe_set import KNNResult, LocalSafeSetConfig, knn_query
from .safe_set import SafeSet

Array = jax.Array
_BIG = 1e20


class HullProjection(NamedTuple):
    point: Array  # V'λ — closest point in the hull
    lam: Array  # (K,) barycentric weights
    distance: Array  # ‖x − Vλ‖
    inside: Array  # bool — distance ≈ 0


def project_onto_hull(
    vertices: Array,  # (K, n_x) hull vertices (inactive rows allowed)
    x: Array,
    vertex_valid: Optional[Array] = None,
    admm: Optional[ADMMConfig] = None,
    tol: float = 1e-3,
) -> HullProjection:
    """min_λ ‖x − Vᵀλ‖² s.t. Σλ = 1, λ ≥ 0 on the shared QP solver
    (``convex_hull.py:180-229``). Invalid vertices are pinned to λ = 0."""
    K, n_x = vertices.shape
    valid = jnp.ones(K, bool) if vertex_valid is None else vertex_valid
    admm = admm or ADMMConfig(max_iter=150, polish=True)

    V = vertices * valid[:, None].astype(vertices.dtype)
    P = V @ V.T + 1e-8 * jnp.eye(K, dtype=vertices.dtype)
    q = -(V @ x)
    # rows: Σλ = 1 ; λ bounds (invalid rows forced to 0)
    A = jnp.concatenate([valid.astype(vertices.dtype)[None, :], jnp.eye(K)], axis=0)
    l = jnp.concatenate([jnp.ones(1), jnp.zeros(K)])
    u = jnp.concatenate([jnp.ones(1), jnp.where(valid, 1.0, 0.0)])
    sol = qp_solve(QPData(P=P, q=q, A=A, l=l, u=u), config=admm)
    lam = sol.x
    point = V.T @ lam
    dist = jnp.linalg.norm(x - point)
    return HullProjection(
        point=point, lam=lam, distance=dist,
        inside=(dist <= tol) & (sol.status == SOLVED),
    )


def contains(
    vertices: Array, x: Array, vertex_valid: Optional[Array] = None,
    tol: float = 1e-3,
) -> Array:
    """Membership via projection distance (``convex_hull.py:125-178``)."""
    return project_onto_hull(vertices, x, vertex_valid, tol=tol).inside


def hull_constraint_rows(
    vertices: Array,  # (K, n_x)
    q_values: Array,  # (K,)
    vertex_valid: Array,  # (K,)
    n_z: int,  # width of the base decision vector (x/u block)
    xN_offset: int,  # column offset of x_N within the base decision vector
    soft: bool = True,
) -> Tuple[Array, Array, Array, Array]:
    """Rows and cost pieces for appending a hull λ block to an MPC QP.

    Extended decision vector z_ext = [z_base; λ(K); s(n_x slack)]:
        x_N − Vᵀλ − s = 0   (n_x equality rows; s pinned to 0 in hard mode)
        Σλ = 1,  0 ≤ λᵢ ≤ valid_i
    Returns (A_rows, l, u, q_lambda) where q_lambda is the linear terminal
    cost Q_valuesᵀλ (``lmpc.py:342-345``); the caller adds the slack
    penalty to P (``lmpc.py:314-329``).
    """
    K, n_x = vertices.shape
    n_ext = n_z + K + n_x
    vf = vertex_valid.astype(vertices.dtype)

    rows = n_x + 1 + K
    A = jnp.zeros((rows, n_ext))
    # x_N − Vᵀλ − s = 0
    A = A.at[jnp.arange(n_x), xN_offset + jnp.arange(n_x)].set(1.0)
    A = A.at[:n_x, n_z : n_z + K].set(-(vertices * vf[:, None]).T)
    A = A.at[jnp.arange(n_x), n_z + K + jnp.arange(n_x)].set(-1.0)
    # Σλ = 1
    A = A.at[n_x, n_z : n_z + K].set(vf)
    # λ bounds
    A = A.at[n_x + 1 + jnp.arange(K), n_z + jnp.arange(K)].set(1.0)

    l = jnp.concatenate([jnp.zeros(n_x), jnp.ones(1), jnp.zeros(K)])
    u = jnp.concatenate([jnp.zeros(n_x), jnp.ones(1), jnp.where(vertex_valid, 1.0, 0.0)])
    q_lambda = jnp.where(vertex_valid, q_values, 0.0)
    return A, l, u, q_lambda


class ConvexHullConstraint:
    """OO facade (name parity with ``ConvexHullConstraint``)."""

    def __init__(self, vertices: Array, vertex_valid: Optional[Array] = None):
        self.vertices = vertices
        self.vertex_valid = (
            jnp.ones(vertices.shape[0], bool) if vertex_valid is None else vertex_valid
        )

    def contains(self, x: Array, tol: float = 1e-3) -> Array:
        return contains(self.vertices, x, self.vertex_valid, tol)

    def project(self, x: Array) -> HullProjection:
        return project_onto_hull(self.vertices, x, self.vertex_valid)


# CasADi-name parity: the QP-row builder plays that role here.
CasADiConvexHullConstraint = ConvexHullConstraint


class TerminalSetManager:
    """KNN query → hull vertices + Q values (``convex_hull.py:364-459``)."""

    def __init__(self, n_vertices: int = 10,
                 knn_config: Optional[LocalSafeSetConfig] = None):
        self.n_vertices = n_vertices
        self.knn_config = knn_config or LocalSafeSetConfig(K=n_vertices)

    def get_terminal_set(
        self, ss: SafeSet, x_query: Array, fuel_available=None
    ) -> KNNResult:
        """Local vertices around the expected terminal state
        (``lmpc.py:267-284``)."""
        return knn_query(ss, x_query, self.n_vertices, None, fuel_available)
