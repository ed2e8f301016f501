"""GP hyperparameter retuning strategies for the online learning loop.

TPU-native counterpart of ``/root/reference/src/learning/hyperparameter_tuner.py``:
MLE in log space (``:162-197``), MAP with a log-normal prior (``:199-229``),
random-search cross-validation (``:231-263``), retrain triggers (``:83-95``)
and an error-driven adaptive scheduler (``:486-567``). Gradients come from
``jax.grad`` of the analytic (sparse) LML instead of numeric differences;
the optimizer is optax Adam over the kernel pytree.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..gp.sparse_gp import sparse_lml

Array = jax.Array


@struct.dataclass
class HyperparameterConfig:
    """(mirrors ``HyperparameterConfig``)."""

    steps: int = struct.field(pytree_node=False, default=150)
    learning_rate: float = 0.05
    retrain_every_episodes: int = 5
    method: str = struct.field(pytree_node=False, default="mle")
    # MAP log-normal prior on each log-hyperparameter
    prior_mean: float = 0.0
    prior_std: float = 1.0
    # bounds in log space (applied by clipping after each step)
    log_lower: float = -6.0
    log_upper: float = 6.0


def tune_mle(
    config: HyperparameterConfig, kernel, Z, X, y, mask, log_noise,
    method: str = "fitc",
) -> Tuple[object, Array, Array]:
    """Maximum-likelihood tuning (``hyperparameter_tuner.py:162-197``)."""
    return _tune(config, kernel, Z, X, y, mask, log_noise, method, map_prior=False)


def tune_map(
    config: HyperparameterConfig, kernel, Z, X, y, mask, log_noise,
    method: str = "fitc",
) -> Tuple[object, Array, Array]:
    """MAP with log-normal priors (``hyperparameter_tuner.py:199-229``)."""
    return _tune(config, kernel, Z, X, y, mask, log_noise, method, map_prior=True)


def _tune(config, kernel, Z, X, y, mask, log_noise, method, map_prior):
    params = (kernel, log_noise)
    opt = optax.adam(config.learning_rate)

    def loss_fn(params):
        k, ln = params
        nll = -sparse_lml(k, Z, X, y, mask, ln, method)
        if map_prior:
            for leaf in jax.tree.leaves(k) + [ln]:
                nll = nll + 0.5 * jnp.sum(
                    ((leaf - config.prior_mean) / config.prior_std) ** 2
                )
        return nll

    def step(carry, _):
        params, opt_state = carry
        loss, g = jax.value_and_grad(loss_fn)(params)
        updates, opt_state2 = opt.update(g, opt_state)
        new_params = jax.tree.map(
            lambda p: jnp.clip(p, config.log_lower, config.log_upper),
            optax.apply_updates(params, updates),
        )
        # the LML Cholesky can fail (NaN) at aggressive hyperparameters in
        # f32; a clipped NaN stays NaN forever, so reject non-finite steps
        # and continue from the last good iterate (the reference's L-BFGS-B
        # line search rejects such steps implicitly)
        ok = jnp.isfinite(loss)
        for leaf in jax.tree.leaves(g):
            ok = ok & jnp.all(jnp.isfinite(leaf))
        keep = lambda n, o: jnp.where(ok, n, o)
        params = jax.tree.map(keep, new_params, params)
        opt_state = jax.tree.map(keep, opt_state2, opt_state)
        return (params, opt_state), loss

    params0 = params
    (params, _), losses = jax.lax.scan(
        step, (params, opt.init(params)), None, length=config.steps
    )
    # never return a tuning that is worse (or non-finite) than the init
    loss_tuned = loss_fn(params)
    loss_init = loss_fn(params0)
    better = jnp.isfinite(loss_tuned) & (loss_tuned <= loss_init)
    params = jax.tree.map(
        lambda n, o: jnp.where(better, n, o), params, params0
    )
    k, ln = params
    return k, ln, jnp.where(better, loss_tuned, loss_init)


def tune_cv_random(
    config: HyperparameterConfig, key: Array, kernel, Z, X, y, mask, log_noise,
    n_candidates: int = 16, perturb_scale: float = 0.5, method: str = "fitc",
) -> Tuple[object, Array, Array]:
    """Random-search "CV": sample log-space perturbations of the current
    hyperparameters, score each by the held-in LML, keep the best
    (``hyperparameter_tuner.py:231-263``; the reference's CV proxy is also an
    in-sample NLL). Fully vmapped over candidates."""
    flat, treedef = jax.tree.flatten((kernel, log_noise))
    sizes = [jnp.size(f) for f in flat]

    def perturb(key):
        keys = jax.random.split(key, len(flat))
        newf = [
            f + perturb_scale * jax.random.normal(k, jnp.shape(f))
            for f, k in zip(flat, keys)
        ]
        return jax.tree.unflatten(treedef, newf)

    keys = jax.random.split(key, n_candidates)
    cands = jax.vmap(perturb)(keys)

    def score(cand):
        k, ln = cand
        return sparse_lml(k, Z, X, y, mask, ln, method)

    lmls = jax.vmap(score)(cands)
    # include the incumbent
    inc = sparse_lml(kernel, Z, X, y, mask, log_noise, method)
    best = jnp.argmax(lmls)
    take = lambda leaf_batch, leaf_inc: jnp.where(
        lmls[best] > inc, leaf_batch[best], leaf_inc
    )
    k_best, ln_best = jax.tree.map(
        take, cands, (kernel, log_noise)
    )
    return k_best, ln_best, jnp.maximum(lmls[best], inc)


class HyperparameterTuner:
    """Facade with retrain-trigger bookkeeping (``hyperparameter_tuner.py:83-95``)."""

    def __init__(self, config: Optional[HyperparameterConfig] = None):
        self.config = config or HyperparameterConfig()
        self.episodes_since = 0

    def should_retrain(self, episodes_done: int) -> bool:
        return (
            episodes_done > 0
            and episodes_done % self.config.retrain_every_episodes == 0
        )

    def tune(self, kernel, Z, X, y, mask, log_noise, method="fitc",
             key: Optional[Array] = None):
        if self.config.method == "mle":
            return tune_mle(self.config, kernel, Z, X, y, mask, log_noise, method)
        if self.config.method == "map":
            return tune_map(self.config, kernel, Z, X, y, mask, log_noise, method)
        if self.config.method == "cv":
            return tune_cv_random(
                self.config, key or jax.random.PRNGKey(0),
                kernel, Z, X, y, mask, log_noise, method=method,
            )
        raise ValueError(f"unknown tuning method {self.config.method!r}")


@struct.dataclass
class AdaptiveHyperparameterScheduler:
    """Error-increase trigger (``hyperparameter_tuner.py:486-567``): track a
    running prediction-error average; flag a retrain when the recent error
    exceeds the long-run error by ``ratio``."""

    long_avg: Array = struct.field(default_factory=lambda: jnp.asarray(0.0))
    recent_avg: Array = struct.field(default_factory=lambda: jnp.asarray(0.0))
    n: Array = struct.field(default_factory=lambda: jnp.asarray(0, jnp.int32))
    ratio: float = 1.5
    long_decay: float = 0.995
    recent_decay: float = 0.9

    def observe(self, error: Array):
        long_avg = jnp.where(
            self.n == 0, error, self.long_decay * self.long_avg + (1 - self.long_decay) * error
        )
        recent_avg = jnp.where(
            self.n == 0, error,
            self.recent_decay * self.recent_avg + (1 - self.recent_decay) * error,
        )
        trigger = (self.n > 10) & (recent_avg > self.ratio * long_avg)
        return self.replace(
            long_avg=long_avg, recent_avg=recent_avg, n=self.n + 1
        ), trigger
