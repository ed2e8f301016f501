"""Sparse (inducing-point) Gaussian processes: FITC and VFE.

TPU-native counterpart of ``/root/reference/src/gp/sparse_gp.py``: FITC with
the diagonal Λ correction and B = I + AAᵀ factorization (``:192-219``), the
VFE ELBO with its trace term (``:221-251``), k-means inducing-point
initialization (``:122-148`` — here ``ops.kmeans`` instead of scipy), O(M²)
prediction via the v = L⁻¹k*, w = L_B⁻¹v solves (``:255-305``), refit-style
updates (``:328-353``), and shared-inducing multi-output (``:391-511``).

Static shapes throughout: training data is capacity-padded with a mask
(masked points get unit Λ and zero cross-covariance, which drops them from
every factor exactly), so online updates never retrace.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..ops.kmeans import kmeans
from ..ops.linalg import robust_cholesky
from .exact_gp import GPPrediction

Array = jax.Array


@struct.dataclass
class SparseGPState:
    kernel: object
    Z: Array  # (M, d) inducing inputs
    X: Array  # (cap, d) training inputs (padded)
    y: Array  # (cap,)
    mask: Array  # (cap,)
    log_noise: Array  # ()
    method: str = struct.field(pytree_node=False, default="fitc")
    # cached factors: explicit INVERSES of the Cholesky factors. Prediction
    # and refit are then pure matmuls — a TPU triangular solve serializes
    # over the factor's rows, and with per-lane states under vmap (one GP
    # per scenario) the 160-RHS data-side solve was the entire cost of the
    # in-loop refit (measured: ~56 ms per cadence firing at 512 lanes,
    # vs <1 ms as matmuls; same trick as ops/qp/admm._factor)
    Luu_inv: Array = None  # (M, M)
    LB_inv: Array = None  # (M, M)
    c: Array = None  # (M,)

    @property
    def n_inducing(self):
        return self.Z.shape[0]

    @property
    def count(self):
        return jnp.sum(self.mask)


def _factors(kernel, Z, X, y, mask, log_noise, method: str):
    """Shared FITC/VFE factor computation (sparse_gp.py:150-251).

    Returns explicit triangular INVERSES: the only triangular solves are
    M-RHS identity solves (M sequential row steps on TPU); every data-side
    operation — the (M, cap) whitening, the c projection, prediction — is a
    matmul against them. See :class:`SparseGPState` for the measured
    motivation.
    """
    jitter = 1e-6
    M = Z.shape[0]
    mf = mask.astype(X.dtype)
    noise = jnp.exp(2.0 * log_noise)
    eye = jnp.eye(M, dtype=X.dtype)

    Kuu = kernel(Z, Z) + jitter * eye
    Kuf = kernel(Z, X) * mf[None, :]
    kff = kernel.diagonal(X)

    # two jitter levels, not the default five: robust_cholesky evaluates
    # EVERY level (vmapped select, no lazy branching), and a batched 32x32
    # Cholesky at 512 lanes x 3 outputs costs ~5 ms/level on the v5e — the
    # 5-level default made the in-loop refit 58 ms/firing. Healthy matrices
    # take level 0 (bitwise-identical to before); degenerate ones (e.g.
    # duplicated recency-Z rows) jump straight to the big relative jitter.
    Luu, _ = robust_cholesky(Kuu, jitters=(0.0, 1e-3))
    Luu_inv = jax.scipy.linalg.solve_triangular(Luu, eye, lower=True)
    V = Luu_inv @ Kuf  # (M, cap)
    qff = jnp.sum(V * V, axis=0)  # diag of Qff

    if method == "fitc":
        lam = jnp.maximum(kff - qff, 1e-8) + noise  # per-point Λ (":198")
    else:  # vfe
        lam = jnp.full_like(kff, noise)
    lam = jnp.where(mask, lam, 1.0)

    A = V / jnp.sqrt(lam)[None, :]
    B = eye + A @ A.T
    # B ⪰ I by construction: a plain single-level factorization always works
    LB, _ = robust_cholesky(B, jitters=(0.0,))
    LB_inv = jax.scipy.linalg.solve_triangular(LB, eye, lower=True)
    ym = (y * mf) / jnp.sqrt(lam)
    c = LB_inv @ (A @ ym)
    return Luu_inv, LB_inv, c, lam, qff, kff, ym


def init_inducing_points(
    key: Array, X: Array, n_inducing: int, mask: Optional[Array] = None
) -> Array:
    """k-means centroids as inducing points (``sparse_gp.py:122-148``)."""
    Z, _ = kmeans(key, X, n_inducing, mask=mask)
    return Z


def fit_sparse(
    kernel,
    X: Array,
    y: Array,
    Z: Array,
    noise: float = 1e-2,
    mask: Optional[Array] = None,
    capacity: Optional[int] = None,
    method: str = "fitc",
) -> SparseGPState:
    n, d = X.shape
    if capacity is not None and capacity > n:
        X = jnp.concatenate([X, jnp.zeros((capacity - n, d), X.dtype)])
        y = jnp.concatenate([y, jnp.zeros(capacity - n, y.dtype)])
        m = jnp.concatenate(
            [jnp.ones(n, bool) if mask is None else mask, jnp.zeros(capacity - n, bool)]
        )
    else:
        m = jnp.ones(n, bool) if mask is None else mask
    log_noise = jnp.asarray(jnp.log(noise), X.dtype)
    return refit_sparse(kernel, Z, X, y, m, log_noise, method)


def refit_sparse(kernel, Z, X, y, mask, log_noise, method: str = "fitc") -> SparseGPState:
    Luu_inv, LB_inv, c, *_ = _factors(kernel, Z, X, y, mask, log_noise, method)
    return SparseGPState(
        kernel=kernel, Z=Z, X=X, y=y, mask=mask, log_noise=log_noise,
        method=method, Luu_inv=Luu_inv, LB_inv=LB_inv, c=c,
    )


def predict_sparse(state: SparseGPState, Xs: Array) -> GPPrediction:
    """O(M²) per point: v = Luu⁻¹k*, w = LB⁻¹v (``sparse_gp.py:255-305``) —
    as matmuls against the cached inverses (vmap/TPU-friendly)."""
    Ksu = state.kernel(Xs, state.Z)  # (n_s, M)
    v = state.Luu_inv @ Ksu.T  # (M, n_s)
    w = state.LB_inv @ v
    mean = w.T @ state.c
    kss = state.kernel.diagonal(Xs)
    var = kss - jnp.sum(v * v, axis=0) + jnp.sum(w * w, axis=0)
    return GPPrediction(mean=mean, variance=jnp.maximum(var, 0.0))


def sparse_lml(kernel, Z, X, y, mask, log_noise, method: str = "fitc") -> Array:
    """FITC marginal likelihood / VFE ELBO (``sparse_gp.py:192-251``)."""
    _, LB_inv, c, lam, qff, kff, ym = _factors(kernel, Z, X, y, mask, log_noise, method)
    n = jnp.sum(mask)
    quad = jnp.sum(ym * ym) - jnp.sum(c * c)
    # log|B| = -2 Σ log diag(LB⁻¹): the inverse of a triangular factor has
    # reciprocal diagonal
    logdet = -2.0 * jnp.sum(jnp.log(jnp.diagonal(LB_inv))) + jnp.sum(
        jnp.where(mask, jnp.log(lam), 0.0)
    )
    lml = -0.5 * (quad + logdet + n * jnp.log(2.0 * jnp.pi))
    if method == "vfe":
        noise = jnp.exp(2.0 * log_noise)
        trace = jnp.sum(jnp.where(mask, kff - qff, 0.0))
        lml = lml - 0.5 * trace / noise
    return lml


def update_sparse(state: SparseGPState, X_new: Array, y_new: Array) -> SparseGPState:
    """Append new points into free capacity slots and refit
    (``sparse_gp.py:328-353`` refits on concatenation; here capacity is fixed
    and the oldest points are overwritten ring-buffer style when full)."""
    cap = state.X.shape[0]
    k = X_new.shape[0]
    count = jnp.sum(state.mask)
    idx = (count + jnp.arange(k)) % cap
    X = state.X.at[idx].set(X_new)
    y = state.y.at[idx].set(y_new)
    mask = state.mask.at[idx].set(True)
    return refit_sparse(
        state.kernel, state.Z, X, y, mask, state.log_noise, state.method
    )


def optimize_sparse_hyperparameters(
    kernel, Z, X, y, mask, log_noise,
    steps: int = 200, learning_rate: float = 0.05,
    optimize_inducing: bool = False, method: str = "fitc",
):
    """Adam on (kernel, log_noise[, Z]) against the FITC/VFE objective."""
    params = (kernel, log_noise, Z)
    opt = optax.adam(learning_rate)

    def nll(params):
        k, ln, zz = params
        if not optimize_inducing:
            zz = jax.lax.stop_gradient(zz)
        return -sparse_lml(k, zz, X, y, mask, ln, method)

    def step(carry, _):
        params, opt_state = carry
        loss, g = jax.value_and_grad(nll)(params)
        updates, opt_state = opt.update(g, opt_state)
        return (optax.apply_updates(params, updates), opt_state), loss

    (params, _), losses = jax.lax.scan(step, (params, opt.init(params)), None, length=steps)
    k, ln, zz = params
    return k, ln, zz, losses[-1]


# =============================================================================
# Multi-output with shared inducing points (sparse_gp.py:391-511)
# =============================================================================


@struct.dataclass
class MultiOutputSparseGPState:
    kernels: object  # stacked pytree, leading axis n_out
    Z: Array  # (M, d) shared inducing inputs
    X: Array  # (cap, d) shared training inputs
    Y: Array  # (n_out, cap)
    mask: Array
    log_noise: Array  # (n_out,)
    method: str = struct.field(pytree_node=False, default="fitc")
    Luu_inv: Array = None  # (n_out, M, M) — triangular-inverse factors
    LB_inv: Array = None
    c: Array = None  # (n_out, M)

    @property
    def n_outputs(self):
        return self.Y.shape[0]


def fit_sparse_multi(
    kernels, X: Array, Y: Array, Z: Array, noise: float = 1e-2,
    mask: Optional[Array] = None, capacity: Optional[int] = None,
    method: str = "fitc",
) -> MultiOutputSparseGPState:
    """``Y`` is (n, n_out); kernels stacked with leading axis n_out."""
    n, d = X.shape
    n_out = Y.shape[1]
    if capacity is not None and capacity > n:
        X = jnp.concatenate([X, jnp.zeros((capacity - n, d), X.dtype)])
        Y = jnp.concatenate([Y, jnp.zeros((capacity - n, n_out), Y.dtype)])
        m = jnp.concatenate(
            [jnp.ones(n, bool) if mask is None else mask, jnp.zeros(capacity - n, bool)]
        )
    else:
        m = jnp.ones(n, bool) if mask is None else mask
    ln = jnp.full((n_out,), jnp.log(noise), X.dtype)
    return refit_sparse_multi(kernels, Z, X, Y.T, m, ln, method)


def refit_sparse_multi(kernels, Z, X, YT, mask, log_noise, method="fitc"):
    def one(kernel, y, ln):
        Luu_inv, LB_inv, c, *_ = _factors(kernel, Z, X, y, mask, ln, method)
        return Luu_inv, LB_inv, c

    Luu_inv, LB_inv, c = jax.vmap(one)(kernels, YT, log_noise)
    return MultiOutputSparseGPState(
        kernels=kernels, Z=Z, X=X, Y=YT, mask=mask, log_noise=log_noise,
        method=method, Luu_inv=Luu_inv, LB_inv=LB_inv, c=c,
    )


def predict_sparse_multi(state: MultiOutputSparseGPState, Xs: Array) -> GPPrediction:
    def one(kernel, Luu_inv, LB_inv, c):
        Ksu = kernel(Xs, state.Z)
        v = Luu_inv @ Ksu.T
        w = LB_inv @ v
        mean = w.T @ c
        var = kernel.diagonal(Xs) - jnp.sum(v * v, axis=0) + jnp.sum(w * w, axis=0)
        return mean, jnp.maximum(var, 0.0)

    mean, var = jax.vmap(one)(state.kernels, state.Luu_inv, state.LB_inv, state.c)
    return GPPrediction(mean=mean.T, variance=var.T)


def update_sparse_multi(
    state: MultiOutputSparseGPState, X_new: Array, Y_new: Array
) -> MultiOutputSparseGPState:
    """Ring-buffer insert + refit (Y_new is (k, n_out))."""
    cap = state.X.shape[0]
    k = X_new.shape[0]
    count = jnp.sum(state.mask)
    idx = (count + jnp.arange(k)) % cap
    X = state.X.at[idx].set(X_new)
    YT = state.Y.at[:, idx].set(Y_new.T)
    mask = state.mask.at[idx].set(True)
    return refit_sparse_multi(
        state.kernels, state.Z, X, YT, mask, state.log_noise, state.method
    )
