"""Exact O(N³) Gaussian-process regression with static shapes.

TPU-native counterpart of ``/root/reference/src/gp/exact_gp.py``: Cholesky
fit with jitter escalation (``:118-184``), log marginal likelihood
(``:186-211``), posterior mean/var/cov (``:213-268``), prior/posterior
sampling (``:289-355``), hyperparameter MLE (``:357-421``), and independent
multi-output GPs (``:427-535``).

Static-shape design: training data lives in capacity-padded arrays with a
boolean mask. Masked rows are replaced by identity rows in the Gram matrix,
which the Cholesky factorization provably maps to unit diagonal/zero
off-diagonal entries — so one fixed-shape factorization serves any active
count, and the ring-buffer online updaters never change shapes. Optimization
is optax Adam on the (kernel, log_noise) pytree with ``jax.grad`` of the
analytic LML — replacing scipy L-BFGS-B (``exact_gp.py:403``).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..ops.linalg import robust_cholesky

Array = jax.Array


class GPPrediction(NamedTuple):
    """(mirrors ``GPPrediction``, ``exact_gp.py:34-44``)."""

    mean: Array
    variance: Array
    covariance: Optional[Array] = None

    @property
    def std(self):
        return jnp.sqrt(jnp.maximum(self.variance, 0.0))


@struct.dataclass
class ExactGPState:
    """Fitted posterior factors (kernel + data + Cholesky + α)."""

    kernel: object
    X: Array  # (cap, d) padded inputs
    y: Array  # (cap,) padded targets
    mask: Array  # (cap,) bool — active rows
    log_noise: Array  # () observation noise log σ_n
    L: Array  # (cap, cap) masked Cholesky factor
    alpha: Array  # (cap,) K⁻¹y

    @property
    def count(self):
        return jnp.sum(self.mask)


def _masked_gram(kernel, X: Array, mask: Array, log_noise: Array) -> Array:
    """Gram matrix with masked rows/cols replaced by identity and noise on
    the active diagonal."""
    K = kernel(X, X)
    mf = mask.astype(K.dtype)
    M = mf[:, None] * mf[None, :]
    noise = jnp.exp(2.0 * log_noise)
    diag = jnp.where(mask, noise, 1.0)
    return K * M + jnp.diag(diag)


def fit(
    kernel,
    X: Array,
    y: Array,
    noise: float = 1e-2,
    mask: Optional[Array] = None,
    capacity: Optional[int] = None,
) -> ExactGPState:
    """Fit = Gram + robust Cholesky + α solve (``exact_gp.py:118-184``).

    Pads to ``capacity`` when given so later refits share one compiled shape.
    """
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
    return refit(kernel, X, y * m.astype(y.dtype), m, log_noise)


def refit(kernel, X: Array, y: Array, mask: Array, log_noise: Array) -> ExactGPState:
    """Recompute factors for given (padded) data — the jittable core."""
    K = _masked_gram(kernel, X, mask, log_noise)
    L, _ = robust_cholesky(K)
    z = jax.scipy.linalg.solve_triangular(L, y * mask.astype(y.dtype), lower=True)
    alpha = jax.scipy.linalg.solve_triangular(L.T, z, lower=False)
    return ExactGPState(
        kernel=kernel, X=X, y=y, mask=mask, log_noise=log_noise, L=L, alpha=alpha
    )


def log_marginal_likelihood(
    kernel, X: Array, y: Array, mask: Array, log_noise: Array
) -> Array:
    """log p(y|X,θ) = −½ yᵀα − Σ log L_ii − (n/2) log 2π over active rows
    (``exact_gp.py:186-211``; masked identity rows contribute zero)."""
    K = _masked_gram(kernel, X, mask, log_noise)
    L, _ = robust_cholesky(K)
    ym = y * mask.astype(y.dtype)
    z = jax.scipy.linalg.solve_triangular(L, ym, lower=True)
    quad = jnp.sum(z * z)
    logdet = 2.0 * jnp.sum(jnp.where(mask, jnp.log(jnp.diagonal(L)), 0.0))
    n = jnp.sum(mask)
    return -0.5 * quad - 0.5 * logdet - 0.5 * n * jnp.log(2.0 * jnp.pi)


def predict(
    state: ExactGPState, Xs: Array, full_cov: bool = False
) -> GPPrediction:
    """Posterior mean/variance via triangular solves (``exact_gp.py:213-268``)."""
    mf = state.mask.astype(Xs.dtype)
    Ks = state.kernel(Xs, state.X) * mf[None, :]
    mean = Ks @ state.alpha
    V = jax.scipy.linalg.solve_triangular(state.L, Ks.T, lower=True)
    if full_cov:
        cov = state.kernel(Xs, Xs) - V.T @ V
        var = jnp.diagonal(cov)
        return GPPrediction(mean=mean, variance=jnp.maximum(var, 0.0), covariance=cov)
    var = state.kernel.diagonal(Xs) - jnp.sum(V * V, axis=0)
    return GPPrediction(mean=mean, variance=jnp.maximum(var, 0.0))


def predict_one(state: ExactGPState, x: Array) -> Tuple[Array, Array]:
    """Single-point posterior (scalar mean, variance)."""
    pr = predict(state, x[None])
    return pr.mean[0], pr.variance[0]


def sample_prior(kernel, key: Array, Xs: Array, n_samples: int = 1) -> Array:
    """Draw prior functions (``exact_gp.py:289-317``)."""
    K = kernel(Xs, Xs)
    L, _ = robust_cholesky(K)
    eps = jax.random.normal(key, (n_samples, Xs.shape[0]), K.dtype)
    return eps @ L.T


def sample_posterior(
    state: ExactGPState, key: Array, Xs: Array, n_samples: int = 1
) -> Array:
    """Draw posterior functions (``exact_gp.py:319-355``)."""
    pr = predict(state, Xs, full_cov=True)
    L, _ = robust_cholesky(pr.covariance)
    eps = jax.random.normal(key, (n_samples, Xs.shape[0]), Xs.dtype)
    return pr.mean[None, :] + eps @ L.T


def optimize_hyperparameters(
    kernel,
    X: Array,
    y: Array,
    mask: Optional[Array] = None,
    log_noise: Optional[Array] = None,
    steps: int = 200,
    learning_rate: float = 0.05,
    optimize_noise: bool = True,
) -> Tuple[object, Array, Array]:
    """MLE by Adam on the (kernel, log_noise) pytree (``exact_gp.py:357-421``).
    Returns (kernel*, log_noise*, final_nll). Jittable; vmap over stacked
    kernels for multi-restart."""
    m = jnp.ones(X.shape[0], bool) if mask is None else mask
    ln = jnp.asarray(jnp.log(1e-2), X.dtype) if log_noise is None else log_noise

    params = (kernel, ln)
    opt = optax.adam(learning_rate)

    def nll(params):
        k, ln = params
        ln_eff = ln if optimize_noise else jax.lax.stop_gradient(ln)
        return -log_marginal_likelihood(k, X, y, m, ln_eff)

    def step(carry, _):
        params, opt_state = carry
        loss, g = jax.value_and_grad(nll)(params)
        updates, opt_state = opt.update(g, opt_state)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), loss

    (params, _), losses = jax.lax.scan(step, (params, opt.init(params)), None, length=steps)
    k, ln = params
    return k, ln, losses[-1]


# =============================================================================
# Multi-output: independent GP per output with shared X (exact_gp.py:427-535)
# =============================================================================


@struct.dataclass
class MultiOutputExactGPState:
    """Stacked per-output states: kernels have a leading output axis, as do
    y/L/alpha. One vmapped Cholesky for all outputs."""

    kernels: object  # pytree with leading axis n_out on every leaf
    X: Array  # (cap, d) shared inputs
    Y: Array  # (n_out, cap)
    mask: Array  # (cap,)
    log_noise: Array  # (n_out,)
    L: Array  # (n_out, cap, cap)
    alpha: Array  # (n_out, cap)

    @property
    def n_outputs(self):
        return self.Y.shape[0]


def fit_multi(
    kernels, X: Array, Y: Array, noise: float = 1e-2,
    mask: Optional[Array] = None, capacity: Optional[int] = None,
) -> MultiOutputExactGPState:
    """``kernels`` is a stacked kernel pytree (leading axis = n_out); build
    one with e.g. ``jax.tree.map(lambda *xs: jnp.stack(xs), *kernel_list)``.
    ``Y`` is (n, n_out) and is transposed/padded internally."""
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
    return refit_multi(kernels, X, Y.T, m, ln)


def refit_multi(kernels, X, YT, mask, log_noise) -> MultiOutputExactGPState:
    def one(kernel, y, ln):
        s = refit(kernel, X, y, mask, ln)
        return s.L, s.alpha

    L, alpha = jax.vmap(one)(kernels, YT * mask.astype(YT.dtype), log_noise)
    return MultiOutputExactGPState(
        kernels=kernels, X=X, Y=YT, mask=mask, log_noise=log_noise, L=L, alpha=alpha
    )


def predict_multi(state: MultiOutputExactGPState, Xs: Array) -> GPPrediction:
    """(n_s, n_out) mean and variance."""

    def one(kernel, L, alpha):
        mf = state.mask.astype(Xs.dtype)
        Ks = kernel(Xs, state.X) * mf[None, :]
        mean = Ks @ alpha
        V = jax.scipy.linalg.solve_triangular(L, Ks.T, lower=True)
        var = kernel.diagonal(Xs) - jnp.sum(V * V, axis=0)
        return mean, jnp.maximum(var, 0.0)

    mean, var = jax.vmap(one)(state.kernels, state.L, state.alpha)
    return GPPrediction(mean=mean.T, variance=var.T)


def stack_kernels(kernel_list):
    """List of identically-structured kernels → stacked pytree."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *kernel_list)
