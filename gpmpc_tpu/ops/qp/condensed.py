"""Condensed MPC QP: eliminate states, decision variables = controls only.

The sparse form (``mpc_qp.py``, mirroring ``/root/reference/src/mpc/
osqp_rti.py:203-372``) keeps z = [x₀,u₀,…,x_N] with (N+1)·n_x equality rows.
That is the right layout for a CPU sparse-LDLᵀ solver like OSQP; on TPU it is
not: the ADMM iteration cost is three dense matvecs whose operands are the
(n×n) KKT inverse and the (m×n) constraint matrix, and at n = 207, m = 354
(N=20, 3-DoF) those matvecs are memory/latency-bound streams that dominate
the whole control cycle (measured 26 ms of a 36 ms cycle at batch 512).

Condensing substitutes x_{k+1} = A_k x_k + B_k u_k + c_k forward:

    X = Γ·U + d,   Γ_{k,j} = A_{k-1}…A_{j+1} B_j,   d_k = A…(x₀) + Σ A…c

so the QP has n = N·n_u variables (60 vs 207), no equality rows, and
m = N·(n_x+n_u) (+facets) general rows (200 vs 354). The same solution u* is
recovered (states were never free — the equality rows pinned them), the KKT
factorization drops 40× in flops (60³ vs 207³), and every ADMM matvec shrinks
~5×. Prediction-matrix conditioning is benign here: the descent dynamics'
one-step Jacobians have spectral radius ≈1 over N=20 stages, and Ruiz
equilibration runs on the condensed data regardless.

Row order: [ state bounds k=1..N ; control bounds k=0..N-1 ;
             Gx facets k=1..N ; Gu facets k=0..N-1 ].
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .types import QPData

Array = jax.Array


def prediction_matrices(
    Aks: Array,  # (N, n_x, n_x)
    Bks: Array,  # (N, n_x, n_u)
    cks: Array,  # (N, n_x)
    x0: Array,  # (n_x,)
) -> Tuple[Array, Array]:
    """Γ stages and free response: returns (Gs, ds) with
    Gs[k] = Γ_{k+1} (n_x, N·n_u) and ds[k] = d_{k+1}, k = 0..N-1, where
    x_{k+1} = Γ_{k+1} U + d_{k+1}."""
    N, n_x, n_u = Bks.shape
    nu = N * n_u

    def body(carry, inp):
        G, d = carry
        A_k, B_k, c_k, k = inp
        Gn = A_k @ G
        Gn = jax.lax.dynamic_update_slice(Gn, B_k, (0, k * n_u))
        dn = A_k @ d + c_k
        return (Gn, dn), (Gn, dn)

    # unroll: the body is one (n_x,n_x)@(n_x,nu) matmul — at these sizes the
    # loop-trip overhead rivals the math, and N is small (15-20)
    (_, _), (Gs, ds) = jax.lax.scan(
        body,
        (jnp.zeros((n_x, nu), Aks.dtype), x0),
        (Aks, Bks, cks, jnp.arange(N)),
        unroll=4,
    )
    return Gs, ds


def recover_states(Gs: Array, ds: Array, u: Array, x0: Array) -> Array:
    """(N+1, n_x) trajectory from the condensed solution."""
    X = jnp.einsum("kij,j->ki", Gs, u) + ds
    return jnp.concatenate([x0[None], X], axis=0)


def build_condensed_qp(
    Aks: Array,
    Bks: Array,
    cks: Array,
    x0: Array,
    Q: Array,
    R: Array,
    Qf: Array,
    x_ref: Array,  # (N+1, n_x) or (n_x,)
    x_min: Array,  # (n_x,) or (N+1, n_x)
    x_max: Array,
    u_min: Array,  # (n_u,) or (N, n_u)
    u_max: Array,
    Gx: Optional[Array] = None,
    gx_l: Optional[Array] = None,
    gx_u: Optional[Array] = None,
    Gu: Optional[Array] = None,
    gu_l: Optional[Array] = None,
    gu_u: Optional[Array] = None,
    x_bound_mask: Optional[tuple] = None,
) -> Tuple[QPData, Array, Array]:
    """Assemble the condensed QP; returns (data, Gs, ds) — keep (Gs, ds) for
    :func:`recover_states`. Cost/bound semantics match ``build_mpc_qp``
    (objective ½(x−r)ᵀQ(x−r) per stage; the x₀ term is constant and drops).

    ``x_bound_mask`` (static tuple of n_x bools) selects which state
    components get bound rows; None = all. The state-bound rows are the Γ
    stream — the dominant HBM operand of the ADMM iteration — so components
    whose box is decorative (±50..500 m translation envelopes that cannot
    bind in a descent; the reference's 6-DoF NLP has no translation boxes at
    all, only glideslope — ``src/mpc/constraints.py:112-132``) should not pay
    rows. Elided components keep their dynamics (states are condensed, never
    free) and their cost terms; only the box rows go. The profiled 6-DoF RT
    cycle streams ~40 GB/cycle at batch 4096 through these rows — elision of
    the 7 translation rows halves that."""
    N, n_x, n_u = Bks.shape
    nu = N * n_u
    dtype = Aks.dtype

    Gs, ds = prediction_matrices(Aks, Bks, cks, x0)

    x_ref = jnp.broadcast_to(x_ref, (N + 1, n_x))
    # stage weights: Q for k=1..N-1, Qf for k=N (index k-1 into Gs/ds)
    Wg = jnp.concatenate(
        [jnp.broadcast_to(Q, (N - 1, n_x, n_x)), Qf[None]], axis=0
    )
    WG = jnp.einsum("kij,kjl->kil", Wg, Gs)  # (N, n_x, nu)
    P = jnp.einsum("kij,kil->jl", Gs, WG)
    # P += blockdiag(R × N)
    k = jnp.arange(N)
    ri = (k * n_u)[:, None, None] + jnp.arange(n_u)[None, :, None]
    ci = (k * n_u)[:, None, None] + jnp.arange(n_u)[None, None, :]
    P = P.at[ri, ci].add(jnp.broadcast_to(R, (N, n_u, n_u)))
    P = 0.5 * (P + P.T)

    err = ds - x_ref[1:]  # (N, n_x)
    q = jnp.einsum("kil,ki->l", WG, err)

    # rows: state bounds (Γ rows), control bounds (identity), facets
    Xlo = jnp.broadcast_to(x_min, (N + 1, n_x))[1:]
    Xhi = jnp.broadcast_to(x_max, (N + 1, n_x))[1:]
    Ulo = jnp.broadcast_to(u_min, (N, n_u)).reshape(-1)
    Uhi = jnp.broadcast_to(u_max, (N, n_u)).reshape(-1)

    if x_bound_mask is not None:
        sel = tuple(i for i, keep in enumerate(x_bound_mask) if keep)
        n_sel = len(sel)
        sel = jnp.asarray(sel, jnp.int32) if n_sel else None
    else:
        sel, n_sel = None, n_x

    # keep genuinely-free rows at ±inf instead of (±inf − d_k), so the
    # solver's free-row detection (|bound| ≥ 1e20) still fires after scaling
    big = 1e19
    if sel is not None:
        Gs_b, ds_b = Gs[:, sel, :], ds[:, sel]
        Xlo_b, Xhi_b = Xlo[:, sel], Xhi[:, sel]
    else:
        Gs_b, ds_b, Xlo_b, Xhi_b = Gs, ds, Xlo, Xhi
    if n_sel:
        A_state = Gs_b.reshape(N * n_sel, nu)
        l_state = jnp.where(Xlo_b <= -big, Xlo_b, Xlo_b - ds_b).reshape(-1)
        u_state = jnp.where(Xhi_b >= big, Xhi_b, Xhi_b - ds_b).reshape(-1)
        blocks = [A_state]
        ls = [l_state]
        us = [u_state]
    else:
        blocks, ls, us = [], [], []

    A_ctrl = jnp.eye(nu, dtype=dtype)

    blocks.append(A_ctrl)
    ls.append(Ulo)
    us.append(Uhi)

    if Gx is not None:
        # Gx: (n_gx, n_x) — one facet block tiled over stages — or
        # (N, n_gx, n_x) — PER-STAGE rows, e.g. a smooth cone linearized at
        # each knot of the SCP trajectory (row k applies at x_{k+1}, the
        # state Gs[k]/ds[k] predict). Bounds broadcast (n_gx,) or (N, n_gx).
        if Gx.ndim == 3:
            n_gx = Gx.shape[1]
            A_gx = jnp.einsum("kij,kjl->kil", Gx, Gs).reshape(N * n_gx, nu)
            Gd = jnp.einsum("kij,kj->ki", Gx, ds)  # (N, n_gx)
        else:
            n_gx = Gx.shape[0]
            A_gx = jnp.einsum("ij,kjl->kil", Gx, Gs).reshape(N * n_gx, nu)
            Gd = jnp.einsum("ij,kj->ki", Gx, ds)  # (N, n_gx)
        L = jnp.broadcast_to(gx_l, (N, n_gx))
        U = jnp.broadcast_to(gx_u, (N, n_gx))
        l_gx = jnp.where(L <= -big, L, L - Gd)
        u_gx = jnp.where(U >= big, U, U - Gd)
        blocks.append(A_gx)
        ls.append(l_gx.reshape(-1))
        us.append(u_gx.reshape(-1))
    if Gu is not None:
        n_gu = Gu.shape[0]
        A_gu = jnp.zeros((N * n_gu, nu), dtype)
        ri = (k * n_gu)[:, None, None] + jnp.arange(n_gu)[None, :, None]
        ci = (k * n_u)[:, None, None] + jnp.arange(n_u)[None, None, :]
        A_gu = A_gu.at[ri, ci].set(jnp.broadcast_to(Gu, (N, n_gu, n_u)))
        blocks.append(A_gu)
        ls.append(jnp.tile(gu_l, N))
        us.append(jnp.tile(gu_u, N))

    data = QPData(
        P=P,
        q=q,
        A=jnp.concatenate(blocks, axis=0),
        l=jnp.concatenate(ls),
        u=jnp.concatenate(us),
    )
    return data, Gs, ds


def n_condensed_constraints(
    N: int, n_x: int, n_u: int, n_gx: int = 0, n_gu: int = 0,
    x_bound_mask: Optional[tuple] = None,
) -> int:
    n_b = n_x if x_bound_mask is None else sum(bool(b) for b in x_bound_mask)
    return N * (n_b + n_u + n_gx + n_gu)
