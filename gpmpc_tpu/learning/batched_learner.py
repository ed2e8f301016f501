"""Campaign-scale online learning: a fleet of scenarios learns concurrently.

The reference's ``IterativeLearningRunner`` (``/root/reference/src/learning/
online_learner.py:529-677``) runs one episode at a time and records
transitions in a Python loop — fine at 8 episodes, useless at 4096. Here the
whole learning loop is ONE jitted ``lax.scan`` over learning rounds, with
every per-lane structure batched on the leading scenario axis:

- per-lane residual ring buffers (masked writes; post-touchdown rows drop),
- per-lane sparse-GP state (kernels, inducing points, Cholesky factors all
  carry a lane axis — SURVEY §7 hard part 8's "batch the Cholesky factors"),
- per-lane GP-MPC controllers whose mean/variance closures read the lane's
  own GP state,
- a refit barrier at round end (fixed cadence keeps shapes static: kmeans
  inducing re-init + FITC/VFE refit, vmapped over lanes),
- an optional cadenced per-lane Adam MLE hyperparameter retune (the
  reference retunes every 5 episodes, ``online_learner.py:239-241``) under
  ``lax.cond`` on the scalar round index.

Both model families run through the same loop: the 3-output velocity GP on
the 3-DoF point mass and the reference's 6-output structured GP on the
6-DoF quaternion model (``structured_gp.py:4-22``,
``online_learner.py:529-677``).

No host loop over steps, episodes, or lanes; the scenario axis shards over a
device mesh like any other campaign (``gpmpc_tpu.parallel``).
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
from flax import struct

from ..dynamics import rocket3dof as r3, rocket6dof as r6
from ..gp import (
    ResidualCollector,
    Simple3DoFGP,
    StructuredGPConfig,
    StructuredRocketGP,
)
from ..mpc import GPMPCConfig
from ..mpc.gp_mpc import gp_mpc_init, gp_mpc_solve
from ..reference import cubic_descent_reference

Array = jax.Array


@struct.dataclass
class BatchedLearningConfig:
    """Fleet learning settings (the batched analogue of
    ``OnlineLearningConfig``, reference ``online_learner.py:36-63``)."""

    n_rounds: int = struct.field(pytree_node=False, default=3)
    max_steps: int = struct.field(pytree_node=False, default=110)
    dt: float = 0.1
    landing_altitude: float = 0.1
    success_speed: float = 2.0
    min_points_for_gp: int = 16  # activation gate (":244-248")
    gp: StructuredGPConfig = struct.field(
        pytree_node=False,
        default_factory=lambda: StructuredGPConfig(max_data_points=128, n_inducing=32),
    )
    # per-lane Adam MLE hyperparameter retune cadence in rounds (reference
    # retune_interval=5 episodes, online_learner.py:239-241); 0 disables and
    # the refit barrier keeps the data-moment lengthscale heuristic
    tune_every: int = struct.field(pytree_node=False, default=0)
    tune_steps: int = struct.field(pytree_node=False, default=60)


def _template_gp(config: StructuredGPConfig, key: Array, n_x: int):
    """A structurally-complete (fitted-on-dummy-data) per-lane GP so the scan
    carry has a fixed pytree structure from round 0. Predictions from the
    dummy fit are never used: the activation gate selects zero instead."""
    if n_x >= 14:
        gp = StructuredRocketGP.create(config)
        x_dummy = jnp.zeros(14).at[0].set(2.0).at[1].set(10.0).at[7].set(1.0)
        gp = gp.add_data(x_dummy, jnp.zeros(3).at[0].set(2.0), jnp.zeros(6))
    else:
        gp = Simple3DoFGP.create(config)
        x_dummy = jnp.zeros(7).at[0].set(2.0).at[1].set(10.0)
        gp = gp.add_data(x_dummy, jnp.zeros(3).at[0].set(2.0), jnp.zeros(3))
    return gp.fit(key)


def _tune_lane(gp, steps: int):
    """Per-lane Adam MLE retune of every output's kernel hyperparameters on
    the lane's own buffer, then a factor refit (``pretrain._tune_multi`` per
    lane; vmapped over the fleet by the caller)."""
    from .pretrain import _tune_multi

    if isinstance(gp, StructuredRocketGP):
        return gp.replace(
            trans_gp=_tune_multi(gp.trans_gp, steps),
            rot_gp=_tune_multi(gp.rot_gp, steps),
        )
    return gp.replace(gp=_tune_multi(gp.gp, steps))


def run_batched_learning(
    key: Array,
    p_nom,
    plant_step: Callable[[Array, Array], Array],
    x0s: Array,  # (B, n_x)
    config: Optional[BatchedLearningConfig] = None,
    mpc: Optional[GPMPCConfig] = None,
    x_target: Optional[Array] = None,
) -> Dict:
    """Run ``n_rounds`` of fleet learning; every lane flies each round with
    its OWN GP (round 0 flies nominal), then refits on its own buffer.

    The state dimension of ``x0s`` picks the model family: 7 → 3-DoF point
    mass with the 3-output velocity GP, 14 → 6-DoF quaternion model with the
    6-output structured [d_v, d_ω] GP.

    Returns per-round, per-lane metrics plus the final batched GP state:
    ``landed (R,B)``, ``touchdown_speed (R,B)``, ``model_err (R,B)`` — the
    mean one-step prediction error of each lane's controller model along its
    flown trajectory, the direct measure that learning helps — and
    ``gp_fitted (B,)``, ``gps`` (lane-batched GP pytree).
    """
    cfg = config or BatchedLearningConfig()
    B, n_x = x0s.shape
    dt = cfg.dt
    if n_x >= 14:
        gp_cls = StructuredRocketGP
        if mpc is None:
            from ..mpc.rti6dof import rti_config_6dof
            from ..ops.qp import ADMMConfig

            # the campaign-certified 6-DoF GP-MPC configuration (condensed
            # QP, fixed-ρ 100-iteration ADMM, chance tightening). Tightening
            # is load-bearing while LEARNING: the raw GP between retunes is
            # rough, and without variance back-offs its corrections walk the
            # final descent off the braking profile (measured: 2.6-5.3 m/s
            # touchdowns vs 0.33 m/s with tightening, same fleet)
            mpc = GPMPCConfig(
                base=rti_config_6dof(p_nom, N=15, dt=dt, admm=ADMMConfig(
                    max_iter=100, polish=False, adaptive_rho=False,
                    scaling=3, use_pallas="off",
                )).replace(accept_pri_tol=1e-2, condensed=True),
                scp_iterations=2, tighten=True,
            )
        xT = (
            r6.create_initial_state(p_nom, altitude=0.0)
            if x_target is None else x_target
        )
        F_nom = lambda x, u: r6.step(p_nom, x, u, dt)
    else:
        gp_cls = Simple3DoFGP
        mpc = mpc or GPMPCConfig(scp_iterations=2, tighten=False)
        xT = jnp.zeros(7).at[0].set(2.0) if x_target is None else x_target
        F_nom = lambda x, u: r3.step(p_nom, x, u, dt)
    collector = ResidualCollector(dt=dt)

    k_tmpl, k_rounds = jax.random.split(key)
    gp_t = _template_gp(cfg.gp, k_tmpl, n_x)
    gps0 = jax.tree.map(
        lambda a: jnp.broadcast_to(jnp.asarray(a)[None], (B,) + jnp.shape(a)), gp_t
    )
    fitted0 = jnp.zeros(B, bool)

    ref_len = cfg.max_steps - 10
    need = cfg.max_steps + mpc.base.N + 1

    def episode(gp, use_gp: Array, x0: Array):
        """One closed-loop episode flying with this lane's (gated) GP."""

        def mean_fn(x, u):
            m, _ = gp.predict_gated(x, u)
            m = jnp.where(use_gp, m, jnp.zeros_like(m))
            return gp_cls.lift_residual(m, n_x)

        def var_fn(x, u):
            v = gp.predict(x, u)[1]
            return jnp.where(use_gp, v, jnp.zeros_like(v))

        Xr = cubic_descent_reference(x0, xT, ref_len, dt)
        pad = jnp.tile(Xr[-1:], (need - Xr.shape[0], 1))
        Xr = jnp.concatenate([Xr, pad], axis=0)[:need]
        st = gp_mpc_init(mpc, x0, xT)

        def body(carry, k):
            x, st, landed = carry
            stw = st.replace(
                x_ref=jax.lax.dynamic_slice_in_dim(
                    Xr, jnp.minimum(k, cfg.max_steps - 1), mpc.base.N + 1, axis=0
                )
            )
            sol, st_new = gp_mpc_solve(F_nom, mean_fn, var_fn, mpc, stw, x)
            x_next = plant_step(x, sol.u0)
            x_out = jnp.where(landed, x, x_next)
            st_out = jax.tree.map(lambda a, b: jnp.where(landed, a, b), st, st_new)
            # controller-model one-step prediction error on live steps
            pred = F_nom(x, sol.u0) + dt * mean_fn(x, sol.u0)
            err = jnp.where(landed, 0.0, jnp.linalg.norm(x_next - pred))
            return (x_out, st_out, landed | (x_next[1] < cfg.landing_altitude)), (
                x, sol.u0, x_out, ~landed, err
            )

        (x_f, _, landed), (X, U, Xn, live, errs) = jax.lax.scan(
            body, (x0, st, jnp.asarray(False)), jnp.arange(cfg.max_steps)
        )
        n_live = jnp.maximum(jnp.sum(live.astype(jnp.float32)), 1.0)
        return {
            "x_final": x_f,
            "landed": landed,
            "speed": jnp.linalg.norm(x_f[4:7]),
            "X": X, "U": U, "Xn": Xn,
            # a frozen lane repeats x: exclude those rows from training
            "valid": live & jnp.any(jnp.abs(Xn - X) > 1e-12, axis=1),
            "model_err": jnp.sum(errs) / n_live,
        }

    def round_body(carry, inp):
        r, rkey = inp
        gps, fitted = carry
        ep = jax.vmap(episode)(gps, fitted, x0s)

        res = jax.vmap(lambda X, U, Xn: collector.collect_batch(F_nom, X, U, Xn))(
            ep["X"], ep["U"], ep["Xn"]
        )
        gps = jax.vmap(
            lambda gp, X, U, R, v: gp.add_data_batch_masked(X, U, R, v)
        )(gps, ep["X"], ep["U"], res, ep["valid"])
        # refit barrier: every lane refits on its own buffer (kmeans + FITC)
        keys = jax.random.split(rkey, B)
        gps = jax.vmap(lambda gp, k: gp.fit(k))(gps, keys)
        if cfg.tune_every > 0:
            gps = jax.lax.cond(
                (r % cfg.tune_every) == cfg.tune_every - 1,
                lambda g: jax.vmap(lambda gp: _tune_lane(gp, cfg.tune_steps))(g),
                lambda g: g,
                gps,
            )
        fitted = fitted | (
            jax.vmap(lambda gp: gp.buffer_count)(gps) >= cfg.min_points_for_gp
        )
        metrics = {
            "landed": ep["landed"],
            "touchdown_speed": ep["speed"],
            "model_err": ep["model_err"],
            "success": ep["landed"] & (ep["speed"] < cfg.success_speed),
        }
        return (gps, fitted), metrics

    (gps, fitted), metrics = jax.lax.scan(
        round_body, (gps0, fitted0),
        (jnp.arange(cfg.n_rounds), jax.random.split(k_rounds, cfg.n_rounds)),
    )
    metrics.update({"gp_fitted": fitted})
    metrics["gps"] = gps
    return metrics
