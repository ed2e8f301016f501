"""MPC QP construction: linearized-dynamics LTV problem → dense OSQP-form QP.

Mirrors the reference's sparse-triplet builder
(``/root/reference/src/mpc/osqp_rti.py:203-372``) with the same decision
layout z = [x₀, u₀, x₁, u₁, …, x_N] and the same row order

    [ x₀ = x_init ;  A_k x_k + B_k u_k − x_{k+1} = −c_k ;  I z bounds ]

but built as fully-vectorized dense scatters (no Python triplet loops) so the
whole construction traces into a handful of XLA ops and vmaps over a scenario
batch. Dense is the right call on TPU: for N≈15–30 the matrix is a few
hundred square and the ADMM KKT solve runs on the MXU.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .types import QPData

Array = jax.Array


def n_vars(N: int, n_x: int, n_u: int) -> int:
    return (N + 1) * n_x + N * n_u


def n_constraints(N: int, n_x: int, n_u: int) -> int:
    return (N + 1) * n_x + n_vars(N, n_x, n_u)


def join_z(X: Array, U: Array) -> Array:
    """(N+1,n_x),(N,n_u) → interleaved decision vector (``osqp_rti.py:601``)."""
    N, n_u = U.shape
    n_x = X.shape[1]
    body = jnp.concatenate([X[:-1], U], axis=1).reshape(N * (n_x + n_u))
    return jnp.concatenate([body, X[-1]])


def split_z(z: Array, N: int, n_x: int, n_u: int) -> Tuple[Array, Array]:
    """Decision vector → (X, U) (``osqp_rti.py:616``)."""
    body = z[: N * (n_x + n_u)].reshape(N, n_x + n_u)
    X = jnp.concatenate([body[:, :n_x], z[None, N * (n_x + n_u) :]], axis=0)
    return X, body[:, n_x:]


def build_cost(
    N: int,
    Q: Array,
    R: Array,
    Qf: Array,
    x_ref: Array,
    u_ref: Optional[Array] = None,
) -> Tuple[Array, Array]:
    """Block-diagonal P = diag(Q,R,…,Q,R,Q_f) and reference-tracking
    q = [−Q x_ref_k; −R u_ref_k; …; −Q_f x_ref_N] (``osqp_rti.py:203-258``;
    the reference leaves the control slots of q at zero — pass u_ref=None for
    that behavior)."""
    n_x, n_u = Q.shape[0], R.shape[0]
    nz = n_vars(N, n_x, n_u)
    stage = jax.scipy.linalg.block_diag(Q, R)  # (n_x+n_u, n_x+n_u)
    P = jnp.zeros((nz, nz), Q.dtype)
    k = jnp.arange(N)
    base = k * (n_x + n_u)
    rows = base[:, None, None] + jnp.arange(n_x + n_u)[None, :, None]
    cols = base[:, None, None] + jnp.arange(n_x + n_u)[None, None, :]
    P = P.at[rows, cols].set(jnp.broadcast_to(stage, (N, n_x + n_u, n_x + n_u)))
    P = P.at[N * (n_x + n_u) :, N * (n_x + n_u) :].set(Qf)

    qx = -(x_ref[:-1] @ Q.T)  # (N, n_x)
    qu = jnp.zeros((N, n_u), Q.dtype) if u_ref is None else -(u_ref @ R.T)
    q = jnp.concatenate(
        [jnp.concatenate([qx, qu], axis=1).reshape(-1), -(Qf @ x_ref[-1])]
    )
    return P, q


def build_constraints(
    Aks: Array,  # (N, n_x, n_x) discrete dynamics Jacobians
    Bks: Array,  # (N, n_x, n_u)
    cks: Array,  # (N, n_x) affine terms
    x_init: Array,  # (n_x,)
    x_min: Array,
    x_max: Array,
    u_min: Array,
    u_max: Array,
) -> Tuple[Array, Array, Array]:
    """Constraint matrix and bounds (``osqp_rti.py:260-372``)."""
    N, n_x, n_u = Bks.shape
    nz = n_vars(N, n_x, n_u)
    n_eq = (N + 1) * n_x
    dtype = Aks.dtype

    A = jnp.zeros((n_eq + nz, nz), dtype)
    # x_0 = x_init
    A = A.at[jnp.arange(n_x), jnp.arange(n_x)].set(1.0)
    # dynamics rows: A_k x_k + B_k u_k − x_{k+1} = −c_k
    k = jnp.arange(N)
    row0 = n_x + k * n_x
    col0 = k * (n_x + n_u)
    ri = row0[:, None, None] + jnp.arange(n_x)[None, :, None]
    cA = col0[:, None, None] + jnp.arange(n_x)[None, None, :]
    A = A.at[ri, cA].set(Aks)
    cB = col0[:, None, None] + n_x + jnp.arange(n_u)[None, None, :]
    A = A.at[ri[:, :, :n_u], cB].set(Bks)
    cI = col0[:, None] + n_x + n_u + jnp.arange(n_x)[None, :]
    A = A.at[row0[:, None] + jnp.arange(n_x)[None, :], cI].set(-1.0)
    # identity for variable bounds
    A = A.at[n_eq + jnp.arange(nz), jnp.arange(nz)].set(1.0)

    # equality bounds
    eq = jnp.concatenate([x_init, (-cks).reshape(-1)])
    # variable bounds in interleaved layout; bounds may be constant (n,) or
    # per-stage ((N+1, n_x) / (N, n_u)) — e.g. trust regions and chance
    # back-offs in the SCP loop
    Xlo = jnp.broadcast_to(x_min, (N + 1, n_x))
    Xhi = jnp.broadcast_to(x_max, (N + 1, n_x))
    Ulo = jnp.broadcast_to(u_min, (N, n_u))
    Uhi = jnp.broadcast_to(u_max, (N, n_u))
    zb_lo = jnp.concatenate(
        [jnp.concatenate([Xlo[:-1], Ulo], axis=1).reshape(-1), Xlo[-1]]
    )
    zb_hi = jnp.concatenate(
        [jnp.concatenate([Xhi[:-1], Uhi], axis=1).reshape(-1), Xhi[-1]]
    )
    l = jnp.concatenate([eq, zb_lo])
    u = jnp.concatenate([eq, zb_hi])
    return A, l, u


def build_stage_rows(
    N: int,
    n_x: int,
    n_u: int,
    Gx: Optional[Array] = None,  # (n_gx, n_x) applied to x_k, k=1..N
    gx_l: Optional[Array] = None,
    gx_u: Optional[Array] = None,
    Gu: Optional[Array] = None,  # (n_gu, n_u) applied to every u_k, k=0..N-1
    gu_l: Optional[Array] = None,
    gu_u: Optional[Array] = None,
) -> Tuple[Array, Array, Array]:
    """Per-stage general linear rows Gx·x_k ∈ [gx_l, gx_u], Gu·u_k ∈
    [gu_l, gu_u] in the interleaved decision layout — the polyhedral
    glideslope / gimbal-cone facets that identity bound rows can't express
    (the reference enforces these inside its CasADi NLPs,
    ``/root/reference/src/mpc/constraints.py:112-209``; here they are plain
    QP rows appended to the LTV problem). State rows skip stage 0: x_0 is
    pinned by the x_init equality, so a facet row there is redundant when
    satisfied and makes the whole QP infeasible when the *measured* state
    starts outside the set. Returns (A_ext, l_ext, u_ext)."""
    nz = n_vars(N, n_x, n_u)
    n_gx = 0 if Gx is None else Gx.shape[0]
    n_gu = 0 if Gu is None else Gu.shape[0]
    dtype = (Gx if Gx is not None else Gu).dtype
    m_ext = N * n_gx + N * n_gu
    A = jnp.zeros((m_ext, nz), dtype)
    ls, us = [], []
    if n_gx:
        s = jnp.arange(1, N + 1)
        ri = ((s - 1) * n_gx)[:, None, None] + jnp.arange(n_gx)[None, :, None]
        ci = (s * (n_x + n_u))[:, None, None] + jnp.arange(n_x)[None, None, :]
        A = A.at[ri, ci].set(jnp.broadcast_to(Gx, (N, n_gx, n_x)))
        ls.append(jnp.tile(gx_l, N))
        us.append(jnp.tile(gx_u, N))
    if n_gu:
        s = jnp.arange(N)
        ri = (N * n_gx + s * n_gu)[:, None, None] + jnp.arange(n_gu)[None, :, None]
        ci = (s * (n_x + n_u) + n_x)[:, None, None] + jnp.arange(n_u)[None, None, :]
        A = A.at[ri, ci].set(jnp.broadcast_to(Gu, (N, n_gu, n_u)))
        ls.append(jnp.tile(gu_l, N))
        us.append(jnp.tile(gu_u, N))
    return A, jnp.concatenate(ls), jnp.concatenate(us)


def extend_qp(data: QPData, A_ext: Array, l_ext: Array, u_ext: Array) -> QPData:
    """Append general constraint rows to a built QP (cost unchanged)."""
    return QPData(
        P=data.P,
        q=data.q,
        A=jnp.concatenate([data.A, A_ext], axis=0),
        l=jnp.concatenate([data.l, l_ext]),
        u=jnp.concatenate([data.u, u_ext]),
    )


def build_mpc_qp(
    Aks: Array,
    Bks: Array,
    cks: Array,
    x_init: Array,
    Q: Array,
    R: Array,
    Qf: Array,
    x_ref: Array,
    x_min: Array,
    x_max: Array,
    u_min: Array,
    u_max: Array,
    u_ref: Optional[Array] = None,
) -> QPData:
    """Assemble the full LTV-MPC QP in OSQP form."""
    N = Bks.shape[0]
    P, q = build_cost(N, Q, R, Qf, x_ref, u_ref)
    A, l, u = build_constraints(Aks, Bks, cks, x_init, x_min, x_max, u_min, u_max)
    return QPData(P=P, q=q, A=A, l=l, u=u)
