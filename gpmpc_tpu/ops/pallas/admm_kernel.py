"""Pallas TPU kernel for the ADMM inner iteration loop.

The ADMM bulk is ~75% of the RTI cycle on TPU. Each iteration is three
per-lane matvecs (Aᵀ·, M⁻¹·, A·) plus elementwise updates — at batch 512,
n≈212 the XLA path streams ~0.5 MB of per-lane matrices from HBM *every
iteration* (≈1.2 ms/iter, memory-bound). This kernel pins one lane's
matrices (M⁻¹ ≈ 180 KB, A ≈ 353 KB) in VMEM for the whole chunk of
iterations, so HBM sees each matrix once per chunk instead of once per
iteration.

The kernel runs one QP lane per grid cell; batching comes from `jax.vmap`
over the `pallas_call` (which prepends a grid dimension). Vectors are kept
as (1, k) rows — vector·matrix products lower onto the MXU with an 8-sublane
padded operand, and the elementwise projection runs on the VPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _chunk_kernel(
    Minv_ref, A_ref, q_ref, l_ref, u_ref, rho_ref,
    x_ref, z_ref, y_ref,
    xo_ref, zo_ref, yo_ref,
    *, iters: int, sigma: float, alpha: float,
):
    Minv = Minv_ref[:]
    Amat = A_ref[:]
    q = q_ref[:]
    lv = l_ref[:]
    uv = u_ref[:]
    rho = rho_ref[:]
    inv_rho = 1.0 / rho

    def body(_, carry):
        x, z, y = carry  # (1,n), (1,m), (1,m)
        t = rho * z - y
        # Aᵀ t as the vector-matrix product t·A : (1,m)@(m,n) → (1,n)
        rhs = sigma * x - q + jax.lax.dot_general(
            t, Amat, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        # M⁻¹ rhs (M⁻¹ symmetric): (1,n)@(n,n) → (1,n)
        xt = jax.lax.dot_general(
            rhs, Minv, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        # A xt as xt·Aᵀ : contract (1,n) with A's n axis → (1,m)
        zt = jax.lax.dot_general(
            xt, Amat, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        xn = alpha * xt + (1.0 - alpha) * x
        zr = alpha * zt + (1.0 - alpha) * z
        zn = jnp.clip(zr + y * inv_rho, lv, uv)
        yn = y + rho * (zr - zn)
        return xn, zn, yn

    x, z, y = jax.lax.fori_loop(
        0, iters, body, (x_ref[:], z_ref[:], y_ref[:])
    )
    xo_ref[:] = x
    zo_ref[:] = z
    yo_ref[:] = y


@functools.partial(
    jax.jit, static_argnames=("iters", "sigma", "alpha", "interpret")
)
def admm_chunk(
    Minv: Array,  # (n, n) KKT inverse (scaled space)
    A: Array,  # (m, n)
    q: Array,  # (n,)
    l: Array,  # (m,)
    u: Array,  # (m,)
    rho_v: Array,  # (m,)
    x: Array,  # (n,)
    z: Array,  # (m,)
    y: Array,  # (m,)
    iters: int,
    sigma: float,
    alpha: float,
    interpret: bool = False,
):
    """Run ``iters`` ADMM iterations fully on-chip; returns (x, z, y).

    vmap over the leading axis of every argument for a batch of lanes.
    """
    n = q.shape[-1]
    m = l.shape[-1]
    kernel = functools.partial(
        _chunk_kernel, iters=iters, sigma=float(sigma), alpha=float(alpha)
    )
    vec = lambda k: jax.ShapeDtypeStruct((1, k), jnp.float32)
    xo, zo, yo = pl.pallas_call(
        kernel,
        out_shape=[vec(n), vec(m), vec(m)],
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 9,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        interpret=interpret,
    )(
        Minv, A, q[None, :], l[None, :], u[None, :], rho_v[None, :],
        x[None, :], z[None, :], y[None, :],
    )
    return xo[0], zo[0], yo[0]


def pallas_available() -> bool:
    """True when the default backend can run the compiled kernel."""
    return jax.default_backend() == "tpu"


# =============================================================================
# Multi-lane VMEM-resident chunk kernel
# =============================================================================
#
# The one-lane-per-grid-cell kernel above loses to the XLA path on the
# condensed QP shape (n=60, m=200): its per-cell work is a serial string of
# (1,k)-row MXU matvecs whose issue latency dominates. This kernel instead
# processes L lanes per grid cell and expresses each batched matvec as a VPU
# multiply-reduce over the sublane axis:
#
#     (Aᵀt)[l, j] = Σ_i  A[l, i, j] · t[l, i]      (reduce over sublanes)
#
# with A stored BOTH as (L, m, n) and transposed (L, n, m) so every reduction
# over the second-to-last axis (lane-axis reductions are slow). All operands
# live in VMEM for the whole chunk: HBM sees each lane's matrices once per
# chunk instead of once per iteration — the XLA path's ~110 KB/lane/iteration
# stream (the cycle's roofline) collapses to ~110 KB/lane/chunk.


def _lanes_kernel(
    Amn_ref, Anm_ref, Minv_ref, q_ref, l_ref, u_ref, rho_ref,
    x_ref, z_ref, y_ref,
    xo_ref, zo_ref, yo_ref,
    *, iters: int, sigma: float, alpha: float,
):
    Amn = Amn_ref[:]  # (L, m, n)
    Anm = Anm_ref[:]  # (L, n, m)
    Minv = Minv_ref[:]  # (L, n, n), symmetric
    q = q_ref[:]  # (L, n)
    lv = l_ref[:]  # (L, m)
    uv = u_ref[:]
    rho = rho_ref[:]
    inv_rho = 1.0 / rho

    def body(_, carry):
        x, z, y = carry  # (L, n), (L, m), (L, m)
        t = rho * z - y
        rhs = sigma * x - q + jnp.sum(Amn * t[:, :, None], axis=1)
        xt = jnp.sum(Minv * rhs[:, :, None], axis=1)
        zt = jnp.sum(Anm * xt[:, :, None], axis=1)
        xn = alpha * xt + (1.0 - alpha) * x
        zr = alpha * zt + (1.0 - alpha) * z
        zn = jnp.clip(zr + y * inv_rho, lv, uv)
        yn = y + rho * (zr - zn)
        return xn, zn, yn

    x, z, y = jax.lax.fori_loop(
        0, iters, body, (x_ref[:], z_ref[:], y_ref[:])
    )
    xo_ref[:] = x
    zo_ref[:] = z
    yo_ref[:] = y


def _pick_lanes(batch: int, m: int, n: int, max_lanes: int = 16,
                vmem_budget: int = 8 * 2**20) -> int:
    """Largest divisor of ``batch`` ≤ max_lanes whose per-cell VMEM footprint
    (both A layouts + M⁻¹ + ~10 (m|n)-vectors, last dim padded to the 128-lane
    tile) fits the budget — half of a v5e core's ~16 MB, leaving room for the
    loop temporaries. The condensed shape (m=200, n=60) admits L=16
    (~3.5 MB); the sparse shape (m=354, n=207) drops to L≈4."""
    pad = lambda k: -(-k // 128) * 128
    per_lane = 4 * (
        m * pad(n) + n * pad(m) + n * pad(n) + 6 * pad(m) + 4 * pad(n)
    )
    cap = max(1, min(max_lanes, vmem_budget // max(per_lane, 1)))
    for cand in range(min(cap, batch), 0, -1):
        if batch % cand == 0:
            return cand
    return 1


def _lanes_call(Minv, A, q, l, u, rho_v, x, z, y, iters, sigma, alpha,
                interpret=False):
    """Batched entry: every argument carries a leading lane axis B."""
    B, m, n = A.shape
    L = _pick_lanes(B, m, n)
    kernel = functools.partial(
        _lanes_kernel, iters=iters, sigma=float(sigma), alpha=float(alpha)
    )
    grid = (B // L,)
    mat = lambda *s: pl.BlockSpec(
        (L, *s), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    vec = lambda k: pl.BlockSpec(
        (L, k), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    xo, zo, yo = pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=[
            jax.ShapeDtypeStruct((B, n), jnp.float32),
            jax.ShapeDtypeStruct((B, m), jnp.float32),
            jax.ShapeDtypeStruct((B, m), jnp.float32),
        ],
        in_specs=[
            mat(m, n), mat(n, m), mat(n, n),
            vec(n), vec(m), vec(m), vec(m),
            vec(n), vec(m), vec(m),
        ],
        out_specs=[vec(n), vec(m), vec(m)],
        interpret=interpret,
    )(
        A, jnp.swapaxes(A, 1, 2), Minv,
        q, l, u, rho_v, x, z, y,
    )
    return xo, zo, yo


def make_admm_chunk_lanes(iters: int, sigma: float, alpha: float,
                          interpret: bool = False):
    """Per-lane callable with a custom vmap rule: unbatched it runs the plain
    jnp iteration (identical math); under ``jax.vmap`` the whole batch drops
    into one multi-lane Pallas kernel with L lanes resident per grid cell.
    Shaped for ``solve()``'s per-lane call site, which is always vmapped in
    campaign/bench use.
    """

    @jax.custom_batching.custom_vmap
    def chunk(Minv, A, q, l, u, rho_v, x, z, y):
        inv_rho = 1.0 / rho_v

        def body(_, carry):
            xx, zz, yy = carry
            t = rho_v * zz - yy
            rhs = sigma * xx - q + A.T @ t
            xt = Minv @ rhs
            zt = A @ xt
            xn = alpha * xt + (1.0 - alpha) * xx
            zr = alpha * zt + (1.0 - alpha) * zz
            zn = jnp.clip(zr + yy * inv_rho, l, u)
            yn = yy + rho_v * (zr - zn)
            return xn, zn, yn

        return jax.lax.fori_loop(0, iters, body, (x, z, y))

    @chunk.def_vmap
    def _chunk_vmap(axis_size, in_batched, *args):
        # broadcast unbatched operands (e.g. an all-lanes-identical zero warm
        # start, which JAX tracks as an unbatched constant) to the lane axis
        args = tuple(
            a if b else jnp.broadcast_to(a[None], (axis_size, *a.shape))
            for a, b in zip(args, in_batched)
        )
        out = _lanes_call(*args, iters, sigma, alpha, interpret=interpret)
        return out, (True, True, True)

    return chunk
