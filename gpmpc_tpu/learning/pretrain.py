"""Offline GP pretraining: on-policy episodes → residuals → fitted GP.

The reference trains its GPs from residual data gathered while flying the
true plant (``/root/reference/src/learning/online_learner.py:357-390``;
``scripts/run_experiments.py:75-87`` fits offline from the same kind of
data). This module packages that protocol as pure-JAX functions so
benchmarks, campaigns and the experiment CLI share one fitted-GP
construction.

Protocol (matches the reference's episode loop, vectorized): a nominal-model
RTI controller flies descent episodes on the TRUE plant from several initial
conditions, with small control excitation for identifiability; residuals
d = (x⁺_true − F_nom(x,u))/dt on the learned slices are collected
(``online_update.py:559-685`` semantics via ``ResidualCollector``) and a
sparse residual GP is fitted. On-policy data matters: the GP is queried along
closed-loop descents, so hover-noise exploration leaves exactly the queried
region uncovered.

Returns (gp, mean_fn, var_fn) where the two closures are jit/vmap/scan-safe
in the exact form ``gp_mpc_solve`` consumes (variance-gated mean lifted to
the full state).
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from ..dynamics import rocket3dof as r3, rocket6dof as r6
from ..gp import ResidualCollector, Simple3DoFGP, StructuredGPConfig, StructuredRocketGP

Array = jax.Array


def _tune_multi(gp_state, tune_steps: int):
    """MLE-retune each output's kernel hyperparameters on the fitted sparse
    state, then refit the factors (``hyperparameter_tuner.py:162-197``
    protocol). ARD lengthscale optimization is what makes the residual GP
    robust off the training trajectory: the moment-matched init over-trusts
    low-variance feature dimensions and the posterior collapses to the prior
    a short distance from the data."""
    from ..gp.sparse_gp import refit_sparse_multi
    from .hyperparameter_tuner import HyperparameterConfig, tune_mle

    g = gp_state
    hcfg = HyperparameterConfig(steps=tune_steps)

    def one(kernel, y, ln):
        k_new, ln_new, _ = tune_mle(hcfg, kernel, g.Z, g.X, y, g.mask, ln,
                                    method=g.method)
        return k_new, ln_new

    kernels, log_noise = jax.vmap(one)(g.kernels, g.Y, g.log_noise)
    return refit_sparse_multi(kernels, g.Z, g.X, g.Y, g.mask, log_noise, g.method)


def _on_policy_episodes(
    key: Array, controller_init, controller_step, plant_step, clamp_fn,
    x0s: Array, episode_len: int, excitation: float,
) -> Tuple[Array, Array, Array]:
    """Fly one episode per IC (vmapped) with excited controls on the true
    plant; returns flattened (X, U, X_next)."""

    def episode(x0, ekey):
        cstate = controller_init(x0)

        def body(carry, k):
            x, cstate = carry
            u, cstate = controller_step(cstate, x, k)
            u = clamp_fn(
                u + excitation * jax.random.normal(jax.random.fold_in(ekey, k), (3,))
            )
            # freeze at touchdown: an episode long enough to cover the flare
            # must not stream sub-ground dynamics into the residual set
            xn = jnp.where(x[1] <= 0.1, x, plant_step(x, u))
            return (xn, cstate), (x, u, xn)

        (_, _), (X, U, Xn) = jax.lax.scan(body, (x0, cstate), jnp.arange(episode_len))
        return X, U, Xn

    keys = jax.random.split(key, x0s.shape[0])
    X, U, Xn = jax.vmap(episode)(x0s, keys)
    d = x0s.shape[1]
    return X.reshape(-1, d), U.reshape(-1, 3), Xn.reshape(-1, d)


def collect_residuals_3dof(
    key: Array, p_nom, true_step_fn: Callable[[Array, Array], Array],
    dt: float = 0.1, n_episodes: int = 4, episode_len: int = 64,
    excitation: float = 0.05, x0s: Optional[Array] = None,
) -> Tuple[Array, Array, Array]:
    """(X, U, residuals) from nominal-RTI descent episodes on the true plant."""
    from ..mpc import RTIConfig, make_rti_controller
    from ..reference import cubic_descent_reference

    F_nom = lambda x, u: r3.step(p_nom, x, u, dt)
    xT = jnp.zeros(7).at[0].set(2.0)
    ref_fn = lambda x0: cubic_descent_reference(x0, xT, 80, dt)
    ci, cs = make_rti_controller(
        F_nom, RTIConfig(N=20, dt=dt), xT, reference_fn=ref_fn, ref_horizon=100
    )
    if x0s is None:
        base = jnp.array([2.0, 27.0, 0.0, 0.0, -3.0, 0.0, 0.0])
        kk = jax.random.split(key, 2)[0]
        noise = jax.random.normal(kk, (n_episodes, 7)) * jnp.array(
            [0.0, 2.0, 1.0, 1.0, 0.4, 0.25, 0.25]
        )
        x0s = base[None, :] + noise
    X, U, Xn = _on_policy_episodes(
        key, ci, cs, true_step_fn, lambda u: r3.clamp_thrust(p_nom, u),
        x0s, episode_len, excitation,
    )
    # drop frozen post-touchdown rows (x == xn is not a flown transition);
    # host-side concrete filtering — pretraining runs outside jit
    import numpy as np

    moved = np.asarray(jnp.any(X != Xn, axis=1))
    X, U, Xn = X[moved], U[moved], Xn[moved]
    res = ResidualCollector(dt=dt).collect_batch(F_nom, X, U, Xn)
    return X, U, res


def pretrain_gp_3dof(
    key: Array, p_nom, true_step_fn: Callable[[Array, Array], Array],
    dt: float = 0.1, n_episodes: int = 4, episode_len: int = 64,
    n_inducing: int = 48, gated: bool = True, tune_steps: int = 150,
) -> Tuple[Simple3DoFGP, Callable, Callable]:
    """Fitted :class:`Simple3DoFGP` + (mean_fn, var_fn) for ``gp_mpc_solve``.

    ``mean_fn(x,u) → (7,)`` is the (optionally variance-gated) velocity-
    residual mean lifted into the state; ``var_fn(x,u) → (3,)`` the posterior
    variances.
    """
    kc, kf = jax.random.split(key)
    X, U, res = collect_residuals_3dof(
        kc, p_nom, true_step_fn, dt, n_episodes, episode_len
    )
    n = X.shape[0]
    gp = Simple3DoFGP.create(
        StructuredGPConfig(max_data_points=n, n_inducing=min(n_inducing, n))
    )
    gp = gp.add_data_batch(X, U, res).fit(kf)
    if tune_steps > 0:
        gp = gp.replace(gp=_tune_multi(gp.gp, tune_steps))
    predict = gp.predict_gated if gated else gp.predict
    mean_fn = lambda x, u: Simple3DoFGP.lift_residual(predict(x, u)[0], 7)
    var_fn = lambda x, u: gp.predict(x, u)[1]
    return gp, mean_fn, var_fn


def explore_gp_3dof(
    key_explore: Array, key_fit: Array, p_nom,
    true_step_fn: Callable[[Array, Array], Array],
    dt: float = 0.1, n_points: int = 128, n_inducing: int = 48,
) -> Tuple[Simple3DoFGP, Callable, Callable]:
    """Cheap scan-exploration GP fit — the bench/profiler setup.

    A single ``lax.scan`` of randomized hover-thrust excitation on the true
    plant (resetting when the altitude drops), fit with no hyperparameter
    tuning. Compile cost matters in the benches; prediction quality does not
    beyond capturing the residual trend — the episode-based
    :func:`pretrain_gp_3dof` is the production path. Returns
    ``(gp, mean_fn, var_fn)`` shaped for ``gp_mpc_solve``.
    """
    F_nom = lambda x, u: r3.step(p_nom, x, u, dt)

    def explore(x, k):
        u = r3.clamp_thrust(
            p_nom,
            r3.hover_thrust(p_nom, x)
            + 0.3 * jax.random.normal(jax.random.fold_in(key_explore, k), (3,)),
        )
        xn = true_step_fn(x, u)
        x_out = jnp.where(
            xn[1] > 0.5, xn,
            jnp.array([2.0, 25.0, -1.0, 2.0, -4.0, -0.5, 0.1]),
        )
        return x_out, (x, u, xn)

    x_start = jnp.array([2.0, 30.0, 1.0, -1.0, -3.0, 0.5, 0.2])
    _, (X, U, Xn) = jax.lax.scan(explore, x_start, jnp.arange(n_points))
    res = ResidualCollector(dt=dt).collect_batch(F_nom, X, U, Xn)
    gp = Simple3DoFGP.create(
        StructuredGPConfig(max_data_points=n_points, n_inducing=n_inducing)
    )
    gp = gp.add_data_batch(X, U, res).fit(key_fit)
    mean_fn = lambda x, u: Simple3DoFGP.lift_residual(
        gp.predict_gated(x, u)[0], 7
    )
    var_fn = lambda x, u: gp.predict(x, u)[1]
    return gp, mean_fn, var_fn


def collect_residuals_6dof(
    key: Array, p_nom, true_step_fn: Callable[[Array, Array], Array],
    dt: float = 0.1, n_episodes: int = 4, episode_len: int = 64,
    excitation: float = 0.03, x0s: Optional[Array] = None,
) -> Tuple[Array, Array, Array]:
    """6-DoF analogue: nominal 6-DoF RTI descent episodes on the true plant."""
    from ..mpc import make_rti_controller
    from ..mpc.rti6dof import rti_config_6dof
    from ..reference import cubic_descent_reference

    F_nom = lambda x, u: r6.step(p_nom, x, u, dt)
    cfg = rti_config_6dof(p_nom, N=15, dt=dt)
    xT = r6.create_initial_state(p_nom, altitude=0.0)
    # fly the same kind of profile the downstream campaigns fly (cubic
    # descent reference) — on-policy feature coverage; constant-target
    # episodes leave the GP at its prior along real descents
    ref_fn = lambda x0: cubic_descent_reference(x0, xT, 80, dt)
    ci, cs = make_rti_controller(
        F_nom, cfg, xT, reference_fn=ref_fn, ref_horizon=episode_len + 1
    )
    if x0s is None:
        kk = jax.random.split(key, 2)[0]
        alts = 17.0 + 6.0 * jax.random.uniform(kk, (n_episodes,))
        vels = jnp.stack([
            -3.5 + 1.5 * jax.random.uniform(jax.random.fold_in(kk, 1), (n_episodes,)),
            0.6 * jax.random.normal(jax.random.fold_in(kk, 2), (n_episodes,)),
            0.6 * jax.random.normal(jax.random.fold_in(kk, 3), (n_episodes,)),
        ], axis=1)
        horiz = 1.0 * jax.random.normal(jax.random.fold_in(kk, 4), (n_episodes, 2))
        x0s = jax.vmap(
            lambda a, v, h: r6.create_initial_state(
                p_nom, altitude=a, velocity=tuple(v), horizontal=tuple(h)
            )
        )(alts, vels, horiz)
    X, U, Xn = _on_policy_episodes(
        key, ci, cs, true_step_fn, lambda u: r6.clamp_thrust(p_nom, u),
        x0s, episode_len, excitation,
    )
    res = ResidualCollector(dt=dt).collect_batch(F_nom, X, U, Xn)
    return X, U, res


def pretrain_gp_6dof(
    key: Array, p_nom, true_step_fn: Callable[[Array, Array], Array],
    dt: float = 0.1, n_episodes: int = 4, episode_len: int = 64,
    n_inducing: int = 48, gated: bool = True, tune_steps: int = 150,
) -> Tuple[StructuredRocketGP, Callable, Callable]:
    """Fitted :class:`StructuredRocketGP` + (mean_fn, var_fn): the 6-output
    [d_v, d_ω] residual model lifted to the 14-state
    (``structured_gp.py:307-338``). ``tune_steps > 0`` runs MLE
    hyperparameter optimization (essential for closed-loop use — see
    :func:`_tune_multi`)."""
    kc, kf = jax.random.split(key)
    X, U, res = collect_residuals_6dof(
        kc, p_nom, true_step_fn, dt, n_episodes, episode_len
    )
    n = X.shape[0]
    gp = StructuredRocketGP.create(
        StructuredGPConfig(max_data_points=n, n_inducing=min(n_inducing, n))
    )
    gp = gp.add_data_batch(X, U, res).fit(kf)
    if tune_steps > 0:
        gp = gp.replace(
            trans_gp=_tune_multi(gp.trans_gp, tune_steps),
            rot_gp=_tune_multi(gp.rot_gp, tune_steps),
        )
    predict = gp.predict_gated if gated else gp.predict
    mean_fn = lambda x, u: StructuredRocketGP.lift_residual(predict(x, u)[0], 14)
    var_fn = lambda x, u: gp.predict(x, u)[1]
    return gp, mean_fn, var_fn
