"""Batched OSQP-semantics ADMM QP solver in pure JAX.

TPU-native replacement for the OSQP C solver used by the reference RTI loop
(``/root/reference/src/mpc/osqp_rti.py:454-478,501-567``). Same operator
splitting (Stellato et al. 2020), same knobs (σ, α over-relaxation, per-row ρ
with equality boosting, Ruiz ``scaling`` iterations, eps_abs/eps_rel
termination) — but everything is dense, fixed-shape, and vmappable, so
thousands of MPC QPs solve in lockstep as one XLA program:

    (P + σI + AᵀRA) x̃ᵏ⁺¹ = σxᵏ − q + Aᵀ(R zᵏ − yᵏ)
    z̃ᵏ⁺¹ = A x̃ᵏ⁺¹
    xᵏ⁺¹  = α x̃ᵏ⁺¹ + (1−α) xᵏ
    zᵏ⁺¹  = Π_[l,u]( α z̃ᵏ⁺¹ + (1−α) zᵏ + R⁻¹ yᵏ )
    yᵏ⁺¹  = yᵏ + R( α z̃ᵏ⁺¹ + (1−α) zᵏ − zᵏ⁺¹ )

The KKT solve uses an explicit Cholesky-based inverse of the (n×n) reduced
matrix so each iteration is a batched MXU matvec; for MPC horizons the
matrix is a few-hundred square. Early termination is emulated in lockstep by
freezing converged lanes (the returned iterate equals the one OSQP would
have stopped at).

Design notes vs OSQP C:
- ρ adapts only on a *static* leading-chunk schedule
  (``rho_adapt_chunks``) instead of OSQP's data-dependent trigger: every
  batch lane stays on one program, and the expensive refactorization is
  bounded.
- primal/dual infeasibility certificates use the δx/δy tests on the same
  fixed schedule.
- successive solves can carry the adapted ρ (``rho0``), the Ruiz scaling
  (``fixed_scaling``), and the KKT inverse (``kkt_inv0``, refreshed by
  Newton–Schulz) — the OSQP workspace idea extended to factorization reuse.
- the iteration chunks optionally run as a Pallas kernel with the lane's
  matrices pinned in VMEM (``use_pallas``).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

from .ruiz import Scaling, ruiz_equilibrate
from .types import DUAL_INFEASIBLE, MAX_ITER, PRIMAL_INFEASIBLE, SOLVED, QPData, QPSolution

Array = jax.Array

_RHO_MIN = 1e-6
_RHO_MAX = 1e6
_INF = 1e20  # treat |bound| above this as infinite


@struct.dataclass
class ADMMConfig:
    """Solver settings; defaults mirror the reference OSQP settings
    (``osqp_rti.py:54-60``) except max_iter, which defaults higher because
    fixed-schedule lockstep iterations are nearly free on TPU."""

    max_iter: int = struct.field(pytree_node=False, default=250)
    check_interval: int = struct.field(pytree_node=False, default=25)
    # batch-global early exit: run the post-adaptation iteration chunks
    # under a while_loop that stops once EVERY lane in the vmapped batch is
    # done (converged lanes are frozen either way, so the output is
    # identical to the fixed schedule — the skipped chunks would have been
    # identity updates). Warm-started receding-horizon cycles typically
    # converge well inside the budget, so lockstep campaigns pay only the
    # straggler lane's iterations instead of max_iter every cycle.
    early_exit: bool = struct.field(pytree_node=False, default=True)
    eps_abs: float = 1e-4
    eps_rel: float = 1e-4
    eps_infeas: float = 1e-6
    sigma: float = 1e-6
    alpha: float = 1.6
    rho: float = 0.1
    rho_eq_scale: float = 1e3
    adaptive_rho: bool = struct.field(pytree_node=False, default=True)
    # number of leading check-chunks allowed to adapt rho + refactorize; the
    # refactorization costs ~half a 100-iteration sweep on TPU, so warm-
    # started real-time paths set this to 1 while cold solves keep more
    rho_adapt_chunks: int = struct.field(pytree_node=False, default=4)
    scaling: int = struct.field(pytree_node=False, default=10)
    # Newton–Schulz refresh iterations for a carried KKT inverse (kkt_inv0);
    # raise when successive QPs drift fast (e.g. GP-augmented SCP near the
    # ground) so the inverse keeps tracking the matrix
    ns_iters: int = struct.field(pytree_node=False, default=4)
    # Active-set KKT polish at exit (OSQP `polish`; reference runs with it off
    # for speed, ``osqp_rti.py:58`` — turn on for high-accuracy SCP/parity).
    polish: bool = struct.field(pytree_node=False, default=False)
    polish_delta: float = 1e-4
    polish_refine_iters: int = struct.field(pytree_node=False, default=6)
    # run the iteration chunks as a Pallas VMEM-resident kernel:
    # "auto" = one-lane kernel on TPU backends, "on"/"off" force it (off on
    # CPU tests; bit-compatible with the jnp path — see tests/test_pallas.py).
    # "lanes" = the multi-lane kernel (L lanes resident per grid cell, VPU
    # multiply-reduce matvecs) — requires the solve to be vmapped over a
    # lane batch; reduction order differs from the jnp path (allclose, not
    # bitwise). "lanes_interpret" runs it in interpreter mode (CPU tests).
    use_pallas: str = struct.field(pytree_node=False, default="auto")
    # static declaration of A's row structure, in row order: a tuple of
    # segments, each one of
    #   ("dense", n_rows)                    — no structure
    #   ("diag", n_rows)                     — exact diagonal block over
    #                                          columns [0, n_rows)
    #   ("blt", n_blocks, blk_r, blk_c)      — block-lower-triangular: block
    #                                          (i, j) nonzero only for j ≤ i
    #   ("blockdiag", n_blocks, blk_r, blk_c) — block-diagonal (stage-local
    #                                          rows, e.g. per-stage facets)
    # Rows past the declared segments are treated dense. The iteration
    # matvecs then stream only structural nonzeros (compacted once per
    # solve), instead of the full m×n array twice per iteration — on the
    # condensed MPC shape (BLT state rows ≈55% dense, identity control
    # rows, block-diagonal control facets) this cuts the ADMM HBM traffic
    # roughly in half. Diagonal scaling (Ruiz) preserves every declared
    # zero, so the declaration survives equilibration. None = dense.
    row_structure: Optional[tuple] = struct.field(
        pytree_node=False, default=None
    )
    # compute primal/dual infeasibility certificates at every check (OSQP's
    # δx/δy tests). Off in real-time configs: the certificates cost ~as much
    # as the residual test itself (4 extra matvecs per check) and the
    # controller's acceptance/fallback ladder already handles unsolved
    # subproblems; infeasible QPs then report MAX_ITER instead.
    infeas_certs: bool = struct.field(pytree_node=False, default=True)
    # unroll factor for the iteration loop inside each check-interval chunk:
    # the iteration body is a handful of small batched matvecs, so at modest
    # batch sizes the per-trip loop overhead (TPU while-loop bookkeeping +
    # kernel launches) rivals the math; unrolling amortizes it at the price
    # of code size / compile time. Results are bitwise identical.
    iter_unroll: int = struct.field(pytree_node=False, default=1)
    # dtype of the loop-invariant matrices (A, KKT inverse) inside the
    # iteration matvecs: "bf16" halves the HBM traffic of the memory-bound
    # ADMM bulk (accumulation stays f32 via preferred_element_type; iterates,
    # bounds, projections, and all residual/termination tests stay f32). The
    # fixed point shifts by the bf16 quantization of the operators (~4e-3
    # relative); gate with accept_pri_tol / landing-quality checks. Applies
    # to the XLA path only (the Pallas kernel keeps its matrices in VMEM
    # where bandwidth is not the bottleneck).
    matvec_dtype: str = struct.field(pytree_node=False, default="f32")
    # with matvec_dtype="bf16": run this many EXTRA iterations with the f32
    # operands after the chunked bf16 bulk. ADMM on a convex QP has one fixed
    # point per operator; switching back to the f32 operator warm-started
    # from the bf16 iterate converges to the f32 fixed point, so a short
    # tail removes the bf16 quantization bias (the reason plain bf16 was
    # rejected at batch 4096 — docs/architecture.md round-4 sweep) while the
    # bulk still streams half the bytes. Lanes already converged (under the
    # always-f32 residual test) stay frozen. 0 = no tail.
    tail_f32_iters: int = struct.field(pytree_node=False, default=0)


def _compact_structure(A: Array, segs: tuple, E: Optional[Array] = None,
                       D: Optional[Array] = None) -> tuple:
    """Extract compact per-segment operands from the (scaled) dense A.

    One-time copies costing ~one A-stream; the iteration matvecs then read
    only structural nonzeros. Returns ops in row order; any rows past the
    declared segments become a trailing dense segment. ``E``/``D`` are the
    Ruiz row/column scalings of A (needed by "blockdiag_shared", whose
    scaled stage blocks differ only by diagonal factors).
    """
    m, n = A.shape
    ops = []
    r0 = 0
    for seg in segs:
        kind = seg[0]
        if kind == "dense":
            nr = seg[1]
            ops.append(("dense", A[r0 : r0 + nr]))
            r0 += nr
        elif kind == "diag":
            nr = seg[1]
            ops.append(("diag", jnp.diagonal(A[r0 : r0 + nr])))
            r0 += nr
        elif kind == "blt":
            _, C, h, w = seg
            blocks = tuple(
                A[r0 + i * h : r0 + (i + 1) * h, : (i + 1) * w]
                for i in range(C)
            )
            ops.append(("blt", blocks, C, h, w))
            r0 += C * h
        elif kind == "blockdiag":
            _, nb, h, w = seg
            if nb * w != n:
                raise ValueError("blockdiag segment must tile all columns")
            seg_A = A[r0 : r0 + nb * h].reshape(nb, h, nb, w)
            idx = jnp.arange(nb)
            ops.append(("blockdiag", seg_A[idx, :, idx, :]))  # (nb, h, w)
            r0 += nb * h
        elif kind == "blockdiag_shared":
            # block-diagonal whose UNSCALED block is one shared (h, w) matrix
            # repeated every stage (stage-constant facet rows, e.g. the
            # gimbal cone's Gu): the scaled stage-k block is
            # diag(E_k)·B·diag(D_k), so store the scaled stage-0 block plus
            # per-stage row/col RATIO vectors r_k = E_k/E_0, c_k = D_k/D_0 —
            # the iteration streams h·w + nb·(h+w) floats instead of nb·h·w.
            _, nb, h, w = seg
            if nb * w != n:
                raise ValueError("blockdiag_shared segment must tile all columns")
            if E is not None and D is not None:
                E_seg = E[r0 : r0 + nb * h].reshape(nb, h)
                D_seg = D.reshape(nb, w)
                r_fac = E_seg / E_seg[0]
                c_fac = D_seg / D_seg[0]
            else:  # unscaled A: stage blocks are identical by contract
                r_fac = jnp.ones((nb, h), A.dtype)
                c_fac = jnp.ones((nb, w), A.dtype)
            ops.append((
                "blockdiag_shared", A[r0 : r0 + h, :w], r_fac, c_fac,
            ))
            r0 += nb * h
        else:
            raise ValueError(f"unknown row-structure segment {kind!r}")
    if r0 > m:
        raise ValueError("row structure exceeds A's rows")
    if r0 < m:
        ops.append(("dense", A[r0:]))
    return tuple(ops)


def _cast_ops(ops: tuple, dtype) -> tuple:
    """Cast the streamed matrix operands; diagonal factors stay f32 (their
    stream is negligible and keeping them exact preserves the scaled bounds)."""
    out = []
    for op in ops:
        if op[0] == "diag":
            out.append(op)
        elif op[0] == "blt":
            out.append((op[0], tuple(b.astype(dtype) for b in op[1]), *op[2:]))
        else:
            # matrix operand only; auxiliary factors (blockdiag_shared's
            # per-stage scale ratios) stay f32 — their stream is negligible
            out.append((op[0], op[1].astype(dtype), *op[2:]))
    return tuple(out)


def _materialize_ops(ops: tuple, m: int, n: int, dtype) -> Array:
    """Dense (m, n) matrix of the operator the streamed ``ops`` actually
    apply. Used to factor the KKT system from EXACTLY the applied operator
    when the stream is bf16 (operator/factor consistency is per row: "diag"
    segments stream f32 and stay f32; every other segment's operand is
    rounded the same way the stream rounds it — including composite kinds
    like blockdiag_shared, where bf16(B)·r·c ≠ bf16(B·r·c))."""
    rows = []
    for op in ops:
        kind = op[0]
        if kind == "dense":
            rows.append(op[1].astype(dtype))
        elif kind == "diag":
            d = op[1]
            nr = d.shape[0]
            blk = jnp.zeros((nr, n), dtype)
            rows.append(blk.at[jnp.arange(nr), jnp.arange(nr)].set(d))
        elif kind == "blt":
            _, blocks, C, h, w = op
            for i, b in enumerate(blocks):
                pad = jnp.zeros((h, n - (i + 1) * w), dtype)
                rows.append(jnp.concatenate([b.astype(dtype), pad], axis=1))
        elif kind == "blockdiag":
            Bd = op[1].astype(dtype)
            nb, h, w = Bd.shape
            eye = jnp.eye(nb, dtype=dtype)
            # (nb, h, nb, w) with block k on the diagonal
            full = jnp.einsum("kij,kl->kilj", Bd, eye).reshape(nb * h, nb * w)
            rows.append(full)
        else:  # blockdiag_shared
            _, B0, r, c = op
            B0 = B0.astype(dtype)
            nb, h = r.shape
            w = c.shape[1]
            Bd = r[:, :, None] * B0[None] * c[:, None, :]
            eye = jnp.eye(nb, dtype=dtype)
            full = jnp.einsum("kij,kl->kilj", Bd, eye).reshape(nb * h, nb * w)
            rows.append(full)
    return jnp.concatenate(rows, axis=0)


def _make_A_ops(ops: tuple, n: int):
    """(A_apply, AT_apply) from compacted structure ops. bf16 operands use
    dot_general with f32 accumulation; iterates stay f32 throughout."""

    def mv(M, v):  # M·v
        if M.dtype != jnp.bfloat16:
            return M @ v
        return jax.lax.dot_general(
            M, v.astype(M.dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    def mvT(M, t):  # Mᵀ·t
        if M.dtype != jnp.bfloat16:
            return M.T @ t
        return jax.lax.dot_general(
            M, t.astype(M.dtype), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    def bmv(Bd, V):  # (nb,h,w)·(nb,w) → (nb,h)
        return jnp.einsum(
            "kij,kj->ki", Bd, V.astype(Bd.dtype),
            preferred_element_type=jnp.float32,
        )

    def bmvT(Bd, T):  # (nb,h,w)ᵀ·(nb,h) → (nb,w)
        return jnp.einsum(
            "kij,ki->kj", Bd, T.astype(Bd.dtype),
            preferred_element_type=jnp.float32,
        )

    def smv(B0, r, c, V):  # shared-block blockdiag: r_k·(B0 @ (c_k·v_k))
        cV = c * V
        prod = jax.lax.dot_general(
            cV.astype(B0.dtype), B0, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) if B0.dtype == jnp.bfloat16 else cV @ B0.T
        return r * prod

    def smvT(B0, r, c, T):  # transpose: c_k·(B0ᵀ @ (r_k·t_k))
        rT = r * T
        prod = jax.lax.dot_general(
            rT.astype(B0.dtype), B0, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) if B0.dtype == jnp.bfloat16 else rT @ B0
        return c * prod

    def A_apply(v):
        outs = []
        for op in ops:
            kind = op[0]
            if kind == "dense":
                outs.append(mv(op[1], v))
            elif kind == "diag":
                outs.append(op[1] * v[: op[1].shape[0]])
            elif kind == "blt":
                _, blocks, C, h, w = op
                outs.extend(mv(blocks[i], v[: (i + 1) * w]) for i in range(C))
            elif kind == "blockdiag_shared":
                _, B0, r, c = op
                nb, w = c.shape
                outs.append(smv(B0, r, c, v.reshape(nb, w)).reshape(-1))
            else:  # blockdiag
                Bd = op[1]
                nb, _, w = Bd.shape
                outs.append(bmv(Bd, v.reshape(nb, w)).reshape(-1))
        return jnp.concatenate(outs) if len(outs) > 1 else outs[0]

    def AT_apply(t):
        out = jnp.zeros(n, t.dtype)
        r0 = 0
        for op in ops:
            kind = op[0]
            if kind == "dense":
                nr = op[1].shape[0]
                out = out + mvT(op[1], t[r0 : r0 + nr])
                r0 += nr
            elif kind == "diag":
                nr = op[1].shape[0]
                out = out.at[:nr].add(op[1] * t[r0 : r0 + nr])
                r0 += nr
            elif kind == "blt":
                _, blocks, C, h, w = op
                for i in range(C):
                    out = out.at[: (i + 1) * w].add(
                        mvT(blocks[i], t[r0 + i * h : r0 + (i + 1) * h])
                    )
                r0 += C * h
            elif kind == "blockdiag_shared":
                _, B0, r, c = op
                nb, h = r.shape
                out = out + smvT(
                    B0, r, c, t[r0 : r0 + nb * h].reshape(nb, h)
                ).reshape(-1)
                r0 += nb * h
            else:  # blockdiag
                Bd = op[1]
                nb, h, _ = Bd.shape
                out = out + bmvT(Bd, t[r0 : r0 + nb * h].reshape(nb, h)).reshape(-1)
                r0 += nb * h
        return out

    return A_apply, AT_apply


def _rho_vec(l: Array, u: Array, rho: Array) -> Array:
    """Per-row ρ: equality rows boosted ×1e3, free rows dropped to ρ_min."""
    eq = (u - l) <= 1e-9
    free = (l <= -_INF) & (u >= _INF)
    r = jnp.where(eq, rho * 1e3, rho)
    r = jnp.where(free, _RHO_MIN, r)
    return jnp.clip(r, _RHO_MIN, _RHO_MAX)


def _factor(P: Array, A: Array, rho_v: Array, sigma: float) -> Array:
    """Explicit inverse of M = P + σI + Aᵀ diag(ρ) A via Cholesky.

    TPU note: the per-iteration KKT solve must be a matmul, not a triangular
    solve — sequential substitution is ~100× slower than the MXU matvec at
    these sizes (measured 12 ms vs 0.1 ms per iteration at n≈212, batch 256).
    Computing M⁻¹ once per factorization (an O(n³) one-time cost on the MXU)
    makes each of the ~100 ADMM iterations a single batched matvec. Accuracy
    is equivalent at f32 for the Ruiz-equilibrated M, and the active-set
    polish removes the residual error regardless.
    """
    n = P.shape[0]
    M = P + sigma * jnp.eye(n, dtype=P.dtype) + (A.T * rho_v[None, :]) @ A
    L = jnp.linalg.cholesky(M)
    Linv = jax.scipy.linalg.solve_triangular(L, jnp.eye(n, dtype=P.dtype), lower=True)
    return Linv.T @ Linv


def _kkt_solve(Minv: Array, rhs: Array) -> Array:
    return Minv @ rhs


def _ns_refresh(P: Array, A: Array, rho_v: Array, sigma: float, X0: Array,
                iters: int = 4) -> Array:
    """Newton–Schulz refresh of the KKT inverse from a previous-cycle X0:
    X ← 2X − X M X (symmetric form, quadratic convergence for
    ‖I − M X0‖ < 1). Pure matmuls — ~7× cheaper on TPU than the Cholesky
    factorization when M changes only slightly between RTI cycles. If the
    refresh diverges (re-linearization jumped too far) the previous inverse
    is kept; the ADMM tolerates an inexact KKT solve and the acceptance test
    guards the plan.
    """
    n = P.shape[0]
    M = P + sigma * jnp.eye(n, dtype=P.dtype) + (A.T * rho_v[None, :]) @ A

    eye = jnp.eye(n, dtype=P.dtype)

    def body(X, _):
        MX = M @ X
        X_new = 2.0 * X - X @ MX
        return X_new, None

    X, _ = jax.lax.scan(body, X0, None, length=iters)
    # monotone acceptance: keep the refreshed inverse only if it actually
    # reduced the KKT residual (norm estimates of the NS convergence region
    # are too conservative to gate on; a divergent refresh shows up directly)
    e0 = jnp.linalg.norm(M @ X0 - eye)
    e1 = jnp.linalg.norm(M @ X - eye)
    return jnp.where(e1 < e0, X, X0)


def _polish(data: QPData, x: Array, y: Array, z: Array, cfg: "ADMMConfig"):
    """Active-set KKT polish (OSQP §5.2): guess the active set from the ADMM
    duals, solve the equality-constrained KKT system with static shapes by
    masking inactive rows to ν_i = 0, and clean f32 error with iterative
    refinement on the δ-regularized system.
    """
    P, q, A, l, u = data.P, data.q, data.A, data.l, data.u
    n, m = data.n, data.m
    dtype = P.dtype

    # OSQP active-set guess: a bound is active when the slack is smaller than
    # the (signed) dual pushing into it: lower iff z−l < −y, upper iff u−z < y.
    eq = (u - l) <= 1e-9
    act_low = ((z - l) < -y) | eq
    act_high = ((u - z) < y) | eq
    active = act_low | act_high
    b = jnp.where(act_high & ~act_low, u, jnp.where(act_low & ~act_high, l, l))
    b = jnp.where(active, b, 0.0)
    af = active.astype(dtype)

    # Regularized KKT system K = [[P+δI, Aaᵀ], [Aa, −D]] with
    # D = diag(1−a) + δ·diag(a). Solved via the Schur complement
    # S = P + δI + Aaᵀ D⁻¹ Aa — an n×n SPD Cholesky (the MXU-friendly path;
    # a batched (n+m)² LU costs ~8× more and dominates the TPU profile).
    # δ is kept moderate so S stays f32-conditioned; the iterative refinement
    # below removes the O(δ) regularization error against the exact K₀.
    delta = jnp.asarray(cfg.polish_delta, dtype)
    Aa = af[:, None] * A
    Dinv = 1.0 / (1.0 - af + delta * af)
    S = P + delta * jnp.eye(n, dtype=dtype) + (Aa.T * Dinv[None, :]) @ Aa
    Ls = jnp.linalg.cholesky(S)
    Lsi = jax.scipy.linalg.solve_triangular(Ls, jnp.eye(n, dtype=dtype), lower=True)
    Sinv = Lsi.T @ Lsi

    def kkt_solve(r1, r2):
        """Solve K [x;ν] = [r1; r2] via x = S⁻¹(r1 + AaᵀD⁻¹r2), ν = D⁻¹(Aa x − r2)."""
        x = Sinv @ (r1 + Aa.T @ (Dinv * r2))
        nu = Dinv * (Aa @ x - r2)
        return x, nu

    x_p, nu_p = kkt_solve(-q, b)

    def refine(carry, _):
        x_p, nu_p = carry
        # residual of the unregularized K₀ = [[P, Aaᵀ], [Aa, −diag(1−a)]]
        r1 = -q - (P @ x_p + Aa.T @ nu_p)
        r2 = b - (Aa @ x_p - (1.0 - af) * nu_p)
        dx, dnu = kkt_solve(r1, r2)
        return (x_p + dx, nu_p + dnu), None

    (x_p, nu_p), _ = jax.lax.scan(
        refine, (x_p, nu_p), None, length=cfg.polish_refine_iters
    )

    sol = jnp.concatenate([x_p, nu_p])
    y_p = jnp.where(active, nu_p, 0.0)
    z_p = jnp.clip(A @ x_p, l, u)
    ok = jnp.all(jnp.isfinite(sol))
    return (
        jnp.where(ok, x_p, x),
        jnp.where(ok, y_p, y),
        jnp.where(ok, z_p, z),
    )


def solve(
    data: QPData,
    x0: Optional[Array] = None,
    y0: Optional[Array] = None,
    config: Optional[ADMMConfig] = None,
    rho0: Optional[Array] = None,
    fixed_scaling: Optional[Scaling] = None,
    kkt_inv0: Optional[Array] = None,
) -> QPSolution:
    """Solve one QP (vmap over a leading batch axis of `data`/`x0`/`y0` for
    many). Warm starts accept *unscaled* x0/y0 like ``osqp.warm_start``;
    pass the previous solution's ``rho`` as ``rho0`` to keep the adapted
    penalty across successive solves (OSQP workspace semantics).

    ``fixed_scaling`` reuses a precomputed Ruiz equilibration (any fixed
    diagonal scaling is a valid preconditioner) — required when carrying the
    KKT inverse across solves via ``kkt_inv0``, which replaces the Cholesky
    factorization with a Newton–Schulz refresh of the previous inverse. The
    returned ``QPSolution.kkt_inv`` feeds the next call.
    """
    cfg = config or ADMMConfig()
    dtype = data.P.dtype
    n, m = data.n, data.m

    # -- scaling ------------------------------------------------------------
    if fixed_scaling is not None:
        scal = fixed_scaling
        sdata = QPData(
            P=scal.c * scal.D[:, None] * data.P * scal.D[None, :],
            q=scal.c * scal.D * data.q,
            A=scal.E[:, None] * data.A * scal.D[None, :],
            l=scal.E * data.l,
            u=scal.E * data.u,
        )
    elif cfg.scaling > 0:
        sdata, scal = ruiz_equilibrate(data, cfg.scaling)
    else:
        sdata = data
        scal = Scaling(
            D=jnp.ones(n, dtype), E=jnp.ones(m, dtype), c=jnp.asarray(1.0, dtype)
        )
    P, q, A, l, u = sdata.P, sdata.q, sdata.A, sdata.l, sdata.u
    D, E, c = scal.D, scal.E, scal.c
    Dinv, Einv = 1.0 / D, 1.0 / E

    x = jnp.zeros(n, dtype) if x0 is None else Dinv * x0
    y = jnp.zeros(m, dtype) if y0 is None else (c / E) * y0
    z = A @ x

    rho_init = jnp.asarray(cfg.rho if rho0 is None else rho0, dtype)
    rho_v = _rho_vec(l, u, rho_init)

    # -- dispatch selection (must precede the factorization: the Pallas
    # paths apply the f32 A in VMEM, so the KKT factor must come from the
    # f32 A there regardless of matvec_dtype) --------------------------------
    if cfg.use_pallas == "on":
        pallas_iters = True
    elif cfg.use_pallas == "auto":
        from ..pallas.admm_kernel import pallas_available

        pallas_iters = pallas_available()
    else:
        pallas_iters = False

    lanes_chunk = None
    if cfg.use_pallas in ("lanes", "lanes_interpret"):
        from ..pallas.admm_kernel import make_admm_chunk_lanes

        pallas_iters = False
        lanes_chunk = make_admm_chunk_lanes(
            cfg.check_interval, cfg.sigma, cfg.alpha,
            interpret=cfg.use_pallas == "lanes_interpret",
        )
    pallas_active = pallas_iters or lanes_chunk is not None
    if pallas_active and cfg.matvec_dtype == "bf16" and cfg.tail_f32_iters > 0:
        raise ValueError(
            "tail_f32_iters > 0 cannot run on a Pallas iteration path "
            "(use_pallas=%r applies the f32 A in VMEM; the bf16 bulk + f32 "
            "tail split only exists on the XLA stream path). Set "
            "use_pallas='off' or tail_f32_iters=0." % cfg.use_pallas
        )

    # structure-aware streamed operands, compacted once per solve (cost ≈ one
    # A-stream, amortized over all iterations; see ADMMConfig.row_structure)
    segs = cfg.row_structure if cfg.row_structure is not None else (("dense", m),)
    bf16_stream = cfg.matvec_dtype == "bf16" and not pallas_active
    ops_f32 = _compact_structure(A, segs, E=scal.E, D=scal.D)
    ops_stream = _cast_ops(ops_f32, jnp.bfloat16) if bf16_stream else ops_f32
    A_apply, AT_apply = _make_A_ops(ops_stream, n)

    # Operator-consistent bf16: the iteration applies the bf16-ROUNDED Ā, so
    # the KKT system must be factored from the same Ā. Factoring from the f32
    # A while iterating with Ā makes the splitting map expansive (measured:
    # the random-QP suite diverges to ~1e6 by 200 iterations) — that
    # inconsistency, not the ~4e-3 fixed-point shift, is what collapsed the
    # batch-4096 bf16 campaign. With a consistent pair the bulk is EXACT ADMM
    # on the perturbed QP(Ā) and converges to a nearby fixed point; the f32
    # tail (tail_f32_iters) then removes the remaining bias. The factored
    # matrix is MATERIALIZED from the streamed operands (``_materialize_ops``)
    # so factor and operator agree per row for every segment kind ("diag"
    # stays f32, composite kinds round exactly like their stream). Pallas
    # paths apply the f32 A → factor from A.
    A_fact = _materialize_ops(ops_stream, m, n, dtype) if bf16_stream else A
    if kkt_inv0 is not None:
        L = _ns_refresh(P, A_fact, rho_v, cfg.sigma, kkt_inv0, iters=cfg.ns_iters)
    else:
        L = _factor(P, A_fact, rho_v, cfg.sigma)

    q_unsc_norm = jnp.max(jnp.abs(Dinv * q)) / c

    def residuals(x, z, y):
        """Unscaled residuals and their relative normalizers."""
        Ax = A @ x
        r_prim = jnp.max(jnp.abs(Einv * (Ax - z)))
        Px = P @ x
        ATy = A.T @ y
        r_dual = jnp.max(jnp.abs(Dinv * (Px + q + ATy))) / c
        prim_norm = jnp.maximum(jnp.max(jnp.abs(Einv * Ax)), jnp.max(jnp.abs(Einv * z)))
        dual_norm = jnp.maximum(
            jnp.maximum(jnp.max(jnp.abs(Dinv * Px)), jnp.max(jnp.abs(Dinv * ATy))) / c,
            q_unsc_norm,
        )
        return r_prim, r_dual, prim_norm, dual_norm

    def make_one_iter(L_mv, A_apply=A_apply, AT_apply=AT_apply):
        if L_mv.dtype == jnp.bfloat16:
            def L_apply(v):
                return jax.lax.dot_general(
                    L_mv, v.astype(L_mv.dtype), (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
        else:
            L_apply = lambda v: L_mv @ v

        def one_iter(carry):
            x, z, y, rho_v = carry
            rhs = cfg.sigma * x - q + AT_apply(rho_v * z - y)
            x_t = L_apply(rhs)
            z_t = A_apply(x_t)
            x_new = cfg.alpha * x_t + (1.0 - cfg.alpha) * x
            z_relax = cfg.alpha * z_t + (1.0 - cfg.alpha) * z
            z_new = jnp.clip(z_relax + y / rho_v, l, u)
            y_new = y + rho_v * (z_relax - z_new)
            return x_new, z_new, y_new

        return one_iter

    # the chunk schedule runs n_chunks · check_interval iterations; a
    # non-dividing pair silently truncates the budget (found live: a 6-DoF
    # bf16-tail config at max_iter=80, check_interval=50 ran 50 bulk
    # iterations, not 80 — enough to flip campaign success). The guard is
    # two-sided: max_iter < check_interval would silently OVERRUN the
    # declared budget instead (n_chunks floors at 1, so e.g. max_iter=20
    # with the default check_interval=25 runs 25 iterations).
    if cfg.max_iter % cfg.check_interval != 0:
        would = max(cfg.max_iter // cfg.check_interval, 1) * cfg.check_interval
        raise ValueError(
            f"max_iter={cfg.max_iter} must be a multiple of "
            f"check_interval={cfg.check_interval} (the chunked schedule "
            f"would run {would} iterations instead)"
        )
    n_chunks = max(cfg.max_iter // cfg.check_interval, 1)

    def make_chunk(allow_refactor: bool):
        def chunk(state, _):
            return _chunk_body(state, allow_refactor)

        return chunk

    def _chunk_body(state, allow_refactor):
        x, z, y, rho_v, L, rho, it, done, status, _, _ = state
        x_prev, y_prev = x, y

        if lanes_chunk is not None:
            x_n, z_n, y_n = lanes_chunk(L, A, q, l, u, rho_v, x, z, y)
        elif pallas_iters:
            from ..pallas.admm_kernel import admm_chunk

            x_n, z_n, y_n = admm_chunk(
                L, A, q, l, u, rho_v, x, z, y,
                iters=cfg.check_interval, sigma=cfg.sigma, alpha=cfg.alpha,
            )
        else:
            if cfg.matvec_dtype == "bf16":
                # one cast per chunk (loop-invariant), halving the per-
                # iteration HBM stream of the KKT inverse (A's operands are
                # cast once per solve above)
                one_iter = make_one_iter(L.astype(jnp.bfloat16))
            else:
                one_iter = make_one_iter(L)

            def body(c, _):
                xx, zz, yy = one_iter((c[0], c[1], c[2], rho_v))
                return (xx, zz, yy), None

            (x_n, z_n, y_n), _ = jax.lax.scan(
                body, (x, z, y), None, length=cfg.check_interval,
                unroll=cfg.iter_unroll,
            )
        # freeze converged/infeasible lanes
        keep = ~done
        x = jnp.where(keep, x_n, x)
        z = jnp.where(keep, z_n, z)
        y = jnp.where(keep, y_n, y)
        it = it + jnp.where(keep, cfg.check_interval, 0)

        r_prim, r_dual, prim_norm, dual_norm = residuals(x, z, y)
        eps_prim = cfg.eps_abs + cfg.eps_rel * prim_norm
        eps_dual = cfg.eps_abs + cfg.eps_rel * dual_norm
        converged = (r_prim <= eps_prim) & (r_dual <= eps_dual)

        if cfg.infeas_certs:
            # infeasibility certificates on the unscaled δ sequences; with
            # scaled diffs dy_s = ȳ−ȳ_prev, dx_s = x̄−x̄_prev the unscaled are
            #   δy = (E/c)·dy_s,  Aᵀδy = D⁻¹Āᵀdy_s/c,  δx = D·dx_s,
            #   Pδx = D⁻¹P̄dx_s/c,  qᵀδx = q̄·dx_s/c,  Aδx = E⁻¹Ādx_s
            dy_s = y - y_prev
            dy = (E / c) * dy_s
            dy_norm = jnp.max(jnp.abs(dy))
            dx_s = x - x_prev
            dx = D * dx_s
            dx_norm = jnp.max(jnp.abs(dx))
            uu = jnp.where(u >= _INF, 0.0, Einv * u)
            ll = jnp.where(l <= -_INF, 0.0, Einv * l)
            prim_cert = (
                (dy_norm > 1e-12)
                & (jnp.max(jnp.abs(Dinv * (A.T @ dy_s))) / c
                   <= cfg.eps_infeas * dy_norm)
                & ((jnp.dot(uu, jnp.maximum(dy, 0))
                    + jnp.dot(ll, jnp.minimum(dy, 0)))
                   <= cfg.eps_infeas * dy_norm)
            )
            Adx = Einv * (A @ dx_s)
            dual_cert = (
                (dx_norm > 1e-12)
                & (jnp.max(jnp.abs(Dinv * (P @ dx_s))) / c
                   <= cfg.eps_infeas * dx_norm)
                & (jnp.dot(q, dx_s) / c <= cfg.eps_infeas * dx_norm)
                & (jnp.all(jnp.where(
                    u >= _INF, True, Adx <= cfg.eps_infeas * dx_norm)))
                & (jnp.all(jnp.where(
                    l <= -_INF, True, Adx >= -cfg.eps_infeas * dx_norm)))
            )
        else:
            # real-time mode: the acceptance/fallback ladder above the solver
            # handles pathological subproblems; skip the certificate matvecs
            prim_cert = jnp.asarray(False)
            dual_cert = jnp.asarray(False)

        status = jnp.where(done, status, jnp.where(
            converged,
            SOLVED,
            jnp.where(prim_cert, PRIMAL_INFEASIBLE,
                      jnp.where(dual_cert, DUAL_INFEASIBLE, MAX_ITER)),
        ))
        done = done | converged | (~done & (prim_cert | dual_cert))

        # adaptive ρ (scaled-residual ratio, OSQP rule) — only on chunks where
        # the *static* schedule allows it: the refactorization is a batched
        # Cholesky+inverse that costs ~half a full 100-iteration sweep, so it
        # runs once after the burn-in chunk instead of every check.
        if cfg.adaptive_rho and allow_refactor:
            ratio = jnp.sqrt(
                (r_prim / jnp.maximum(prim_norm, 1e-10))
                / jnp.maximum(r_dual / jnp.maximum(dual_norm, 1e-10), 1e-10)
            )
            rho_new = jnp.clip(rho * jnp.clip(ratio, 0.1, 10.0), _RHO_MIN, _RHO_MAX)
            upd = (~done) & ((ratio > 5.0) | (ratio < 0.2))
            rho = jnp.where(upd, rho_new, rho)
            rho_v_new = _rho_vec(l, u, rho)
            rho_v = jnp.where(upd, rho_v_new, rho_v)
            L = jnp.where(upd, _factor(P, A_fact, rho_v_new, cfg.sigma), L)

        return (x, z, y, rho_v, L, rho, it, done, status, r_prim, r_dual), None

    status0 = jnp.asarray(MAX_ITER, jnp.int32)
    zero = jnp.asarray(0.0, dtype)
    init = (x, z, y, rho_v, L, rho_init, jnp.asarray(0, jnp.int32),
            jnp.asarray(False), status0, zero, zero)
    # adapt phase: leading chunks may adapt ρ and refactorize; the remaining
    # chunks share one factorization
    n_adapt = min(cfg.rho_adapt_chunks, n_chunks) if cfg.adaptive_rho else 0
    state = init
    if n_adapt > 0:
        state, _ = jax.lax.scan(make_chunk(True), state, None, length=n_adapt)
    n_rest = n_chunks - n_adapt
    if n_rest > 0:
        if cfg.early_exit:
            # while_loop over chunks: under vmap the condition is OR-reduced
            # across lanes, so the loop stops at the first chunk boundary
            # where every lane is done — identical output (frozen lanes are
            # identity updates), straggler-bounded cost
            def cond(carry):
                k, st = carry
                return (k < n_rest) & ~st[7]

            def body(carry):
                k, st = carry
                st, _ = _chunk_body(st, False)
                return (k + 1, st)

            _, state = jax.lax.while_loop(
                cond, body, (jnp.asarray(0, jnp.int32), state)
            )
        else:
            state, _ = jax.lax.scan(
                make_chunk(False), state, None, length=n_rest
            )
    # residuals of the returned iterate were computed by the last live chunk
    # (frozen lanes keep the residuals they converged at)
    (x, z, y, rho_v, L, rho, it, done, status, r_prim, r_dual) = state

    if (
        cfg.matvec_dtype == "bf16"
        and cfg.tail_f32_iters > 0
        and lanes_chunk is None
        and not pallas_iters
    ):
        # f32 tail: re-converge toward the f32 fixed point from the bf16
        # iterate (see ADMMConfig.tail_f32_iters). The tail gets its own
        # operator-consistent factorization from the TRUE f32 A (one cheap
        # (n×n) factor; the bulk's L solves the perturbed QP(Ā)). Frozen
        # lanes (converged under the f32 residual test, or certified
        # infeasible) stay frozen. The one-trip while_loop mirrors
        # early_exit: under vmap the condition is OR-reduced across lanes,
        # so a fully-converged batch skips the tail entirely instead of
        # running tail_f32_iters discarded iterations.
        def tail_trip(c):
            k, _, _, _ = c
            return (k < 1) & ~done

        def tail_run(c):
            k, xx, zz, yy = c
            L_tail = _factor(P, A, rho_v, cfg.sigma)
            one_iter_f32 = make_one_iter(L_tail, *_make_A_ops(ops_f32, n))

            def tail_body(cc, _):
                x1, z1, y1 = one_iter_f32((cc[0], cc[1], cc[2], rho_v))
                return (x1, z1, y1), None

            (xx, zz, yy), _ = jax.lax.scan(
                tail_body, (xx, zz, yy), None, length=cfg.tail_f32_iters,
                unroll=cfg.iter_unroll,
            )
            return (k + 1, xx, zz, yy)

        _, x_t, z_t, y_t = jax.lax.while_loop(
            tail_trip, tail_run, (jnp.asarray(0, jnp.int32), x, z, y)
        )
        keep = ~done
        x = jnp.where(keep, x_t, x)
        z = jnp.where(keep, z_t, z)
        y = jnp.where(keep, y_t, y)
        it = it + jnp.where(keep, cfg.tail_f32_iters, 0)
        rp, rd, pn, dn = residuals(x, z, y)
        r_prim = jnp.where(keep, rp, r_prim)
        r_dual = jnp.where(keep, rd, r_dual)
        tail_ok = (rp <= cfg.eps_abs + cfg.eps_rel * pn) & (
            rd <= cfg.eps_abs + cfg.eps_rel * dn
        )
        status = jnp.where(keep & tail_ok, SOLVED, status)
        done = done | tail_ok

    # unscale
    x_u = D * x
    y_u = (E * y) / c
    z_u = Einv * z

    if cfg.polish:
        x_p, y_p, z_p = _polish(data, x_u, y_u, z_u, cfg)
        # accept the polished point only if it improves the KKT error
        def kkt_err(xx, yy, zz):
            r1 = jnp.max(jnp.abs(data.A @ xx - zz))
            r2 = jnp.max(jnp.abs(data.P @ xx + data.q + data.A.T @ yy))
            viol = jnp.maximum(
                jnp.max(jnp.maximum(data.A @ xx - data.u, 0.0)),
                jnp.max(jnp.maximum(data.l - data.A @ xx, 0.0)),
            )
            return jnp.maximum(jnp.maximum(r1, r2), viol)

        better = kkt_err(x_p, y_p, z_p) < kkt_err(x_u, y_u, z_u)
        x_u = jnp.where(better, x_p, x_u)
        y_u = jnp.where(better, y_p, y_u)
        z_u = jnp.where(better, z_p, z_u)
        r_prim = jnp.where(
            better, jnp.max(jnp.abs(data.A @ x_u - z_u)), r_prim
        )
        r_dual = jnp.where(
            better,
            jnp.max(jnp.abs(data.P @ x_u + data.q + data.A.T @ y_u)),
            r_dual,
        )
        # re-run the termination test on the polished point so a successful
        # polish upgrades MAX_ITER → SOLVED (OSQP reports `solved` likewise)
        Ax_u = data.A @ x_u
        pn = jnp.maximum(jnp.max(jnp.abs(Ax_u)), jnp.max(jnp.abs(z_u)))
        dn = jnp.maximum(
            jnp.maximum(jnp.max(jnp.abs(data.P @ x_u)), jnp.max(jnp.abs(data.A.T @ y_u))),
            jnp.max(jnp.abs(data.q)),
        )
        now_ok = (r_prim <= cfg.eps_abs + cfg.eps_rel * pn) & (
            r_dual <= cfg.eps_abs + cfg.eps_rel * dn
        )
        status = jnp.where((status == MAX_ITER) & now_ok, SOLVED, status)
    obj = 0.5 * x_u @ (data.P @ x_u) + data.q @ x_u

    return QPSolution(
        x=x_u, y=y_u, z=z_u, obj=obj,
        pri_res=r_prim, dua_res=r_dual,
        iterations=it, status=status, rho=rho,
        kkt_inv=L if kkt_inv0 is not None else None,
    )


@partial(jax.jit, static_argnames=("config",))
def solve_jit(data: QPData, x0=None, y0=None, config: Optional[ADMMConfig] = None,
              rho0=None):
    return solve(data, x0, y0, config, rho0)


def solve_batch(
    data: QPData,
    x0: Optional[Array] = None,
    y0: Optional[Array] = None,
    config: Optional[ADMMConfig] = None,
    rho0: Optional[Array] = None,
) -> QPSolution:
    """Solve a batch of QPs stacked on the leading axis (lockstep vmap)."""
    cfg = config or ADMMConfig()
    if x0 is None:
        x0 = jnp.zeros(data.q.shape, data.q.dtype)
    if y0 is None:
        y0 = jnp.zeros(data.l.shape, data.l.dtype)
    if rho0 is None:
        rho0 = jnp.full(data.l.shape[0], cfg.rho, data.l.dtype)
    return jax.vmap(lambda d, xx, yy, rr: solve(d, xx, yy, cfg, rr))(data, x0, y0, rho0)
