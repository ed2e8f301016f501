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
