"""Dense linear-algebra building blocks: Riccati/ARE solvers, robust
Cholesky, weighted distances.

TPU-native replacements for the scipy/LAPACK calls the reference leans on
(``scipy.linalg.solve_discrete_are`` in ``cost_functions.py:207`` and
``backup_controller.py:164``; jittered Cholesky in ``exact_gp.py:163-175``).
AREs are solved with the structure-preserving doubling algorithm — a fixed
count of matrix multiplies/solves, so it jits and vmaps cleanly (no
data-dependent QZ decompositions).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def solve_dare(A: Array, B: Array, Q: Array, R: Array, iters: int = 25) -> Array:
    """Discrete algebraic Riccati equation P = AᵀPA − AᵀPB(R+BᵀPB)⁻¹BᵀPA + Q.

    Structure-preserving doubling (quadratic convergence; ``iters``=25 reaches
    f32 precision for any reasonably conditioned system).
    """
    n = A.shape[0]
    eye = jnp.eye(n, dtype=A.dtype)
    G0 = B @ jnp.linalg.solve(R, B.T)

    def body(carry, _):
        Ak, Gk, Hk = carry
        W = eye + Gk @ Hk
        # solve W X = Ak  and  W Y = Gk (shared LU would be nicer; XLA fuses)
        WinvA = jnp.linalg.solve(W, Ak)
        WinvG = jnp.linalg.solve(W, Gk)
        A_next = Ak @ WinvA
        G_next = Gk + Ak @ WinvG @ Ak.T
        H_next = Hk + Ak.T @ Hk @ WinvA
        return (A_next, G_next, H_next), None

    (_, _, H), _ = jax.lax.scan(body, (A, G0, Q), None, length=iters)
    return 0.5 * (H + H.T)


def dlqr(A: Array, B: Array, Q: Array, R: Array, iters: int = 25) -> Tuple[Array, Array]:
    """Discrete LQR gain K and cost-to-go P with u = −K x
    (mirrors ``cost_functions.py:179-239``)."""
    P = solve_dare(A, B, Q, R, iters)
    K = jnp.linalg.solve(R + B.T @ P @ B, B.T @ P @ A)
    return K, P


def solve_care(A: Array, B: Array, Q: Array, R: Array, iters: int = 30) -> Array:
    """Continuous ARE AᵀP + PA − PBR⁻¹BᵀP + Q = 0 via the matrix sign
    function of the Hamiltonian (Newton iteration Z ← ½(Z + Z⁻¹))."""
    n = A.shape[0]
    G = B @ jnp.linalg.solve(R, B.T)
    H = jnp.block([[A, -G], [-Q, -A.T]])

    def body(Z, _):
        Zinv = jnp.linalg.inv(Z)
        # determinant-based scaling accelerates convergence
        d = jnp.abs(jnp.linalg.det(Z)) ** (-1.0 / (2 * n))
        return 0.5 * (d * Z + Zinv / d), None

    Z, _ = jax.lax.scan(body, H, None, length=iters)
    # sign(H) = Z. The stable subspace span[I; X] satisfies Z[I; X] = −[I; X]:
    #   Z12 X = −(Z11 + I),  (Z22 + I) X = −Z21  — stack and least-squares.
    eye = jnp.eye(n, dtype=A.dtype)
    M = jnp.concatenate([Z[:n, n:], Z[n:, n:] + eye], axis=0)
    rhs = -jnp.concatenate([Z[:n, :n] + eye, Z[n:, :n]], axis=0)
    P, *_ = jnp.linalg.lstsq(M, rhs)
    return 0.5 * (P + P.T)


def clqr(A: Array, B: Array, Q: Array, R: Array, iters: int = 30) -> Tuple[Array, Array]:
    """Continuous LQR gain K = R⁻¹BᵀP and P."""
    P = solve_care(A, B, Q, R, iters)
    K = jnp.linalg.solve(R, B.T @ P)
    return K, P


def robust_cholesky(M: Array, jitters=(0.0, 1e-8, 1e-6, 1e-4, 1e-2)) -> Tuple[Array, Array]:
    """Cholesky with fixed-policy jitter escalation (branch-free analogue of
    the reference's retry loop, ``exact_gp.py:163-175``).

    Computes the factor at every jitter level and selects the first finite
    one — all under one fused program, no Python control flow. Returns
    (L, jitter_used).
    """
    n = M.shape[-1]
    eye = jnp.eye(n, dtype=M.dtype)
    scale = jnp.maximum(jnp.mean(jnp.diagonal(M, axis1=-2, axis2=-1)), 1e-30)
    js = jnp.asarray(jitters, M.dtype) * scale
    Ls = jax.vmap(lambda j: jnp.linalg.cholesky(M + j * eye))(js)
    ok = jax.vmap(lambda L: jnp.all(jnp.isfinite(L)))(Ls)
    # first finite factorization; if NONE is finite, take the LAST (largest
    # jitter) level rather than argmax-of-all-False's level 0 — level 0 is
    # the raw matrix and would silently hand a NaN factor to callers that
    # carry it forever (e.g. a lane's online GP)
    idx = jnp.where(jnp.any(ok), jnp.argmax(ok), len(jitters) - 1)
    return Ls[idx], js[idx]


def cho_solve(L: Array, b: Array) -> Array:
    """Solve (L Lᵀ) x = b given lower-triangular L."""
    y = jax.scipy.linalg.solve_triangular(L, b, lower=True)
    return jax.scipy.linalg.solve_triangular(L.T, y, lower=False)


def weighted_sq_dists(X: Array, Z: Array, w: Array) -> Array:
    """Pairwise squared distances ‖(x−z)·√w‖² as one matmul (MXU-friendly):
    ‖a‖²+‖b‖²−2a·b with a = X√w, b = Z√w (the vectorized scaled-distance
    trick the reference uses inside its SE-ARD kernel, ``kernels.py:205-236``).
    """
    sw = jnp.sqrt(w)
    Xs = X * sw
    Zs = Z * sw
    d = (
        jnp.sum(Xs * Xs, axis=-1)[:, None]
        + jnp.sum(Zs * Zs, axis=-1)[None, :]
        - 2.0 * Xs @ Zs.T
    )
    return jnp.maximum(d, 0.0)
