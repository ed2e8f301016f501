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
  inducing re-init + FITC/VFE refit, vmapped over lanes).

No host loop over steps, episodes, or lanes; the scenario axis shards over a
device mesh like any other campaign (``gpmpc_tpu.parallel``).
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
from flax import struct

from ..dynamics import rocket3dof as r3
from ..gp import ResidualCollector, Simple3DoFGP, StructuredGPConfig
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


def _template_gp(config: StructuredGPConfig, key: Array) -> Simple3DoFGP:
    """A structurally-complete (fitted-on-dummy-data) per-lane GP so the scan
    carry has a fixed pytree structure from round 0. Predictions from the
    dummy fit are never used: the activation gate selects zero instead."""
    gp = Simple3DoFGP.create(config)
    x_dummy = jnp.zeros(7).at[0].set(2.0).at[1].set(10.0)
    gp = gp.add_data(x_dummy, jnp.zeros(3).at[0].set(2.0), jnp.zeros(3))
    return gp.fit(key)


def run_batched_learning(
    key: Array,
    p_nom,
    plant_step: Callable[[Array, Array], Array],
    x0s: Array,  # (B, 7)
    config: Optional[BatchedLearningConfig] = None,
    mpc: Optional[GPMPCConfig] = None,
    x_target: Optional[Array] = None,
) -> Dict:
    """Run ``n_rounds`` of fleet learning; every lane flies each round with
    its OWN GP (round 0 flies nominal), then refits on its own buffer.

    Returns per-round, per-lane metrics plus the final batched GP state:
    ``landed (R,B)``, ``touchdown_speed (R,B)``, ``model_err (R,B)`` — the
    mean one-step prediction error of each lane's controller model along its
    flown trajectory, the direct measure that learning helps — and
    ``gp_fitted (B,)``, ``gps`` (lane-batched :class:`Simple3DoFGP`).
    """
    cfg = config or BatchedLearningConfig()
    mpc = mpc or GPMPCConfig(scp_iterations=2, tighten=False)
    B = x0s.shape[0]
    dt = cfg.dt
    xT = jnp.zeros(7).at[0].set(2.0) if x_target is None else x_target
    F_nom = lambda x, u: r3.step(p_nom, x, u, dt)
    collector = ResidualCollector(dt=dt)

    k_tmpl, k_rounds = jax.random.split(key)
    gp_t = _template_gp(cfg.gp, k_tmpl)
    gps0 = jax.tree.map(
        lambda a: jnp.broadcast_to(jnp.asarray(a)[None], (B,) + jnp.shape(a)), gp_t
    )
    fitted0 = jnp.zeros(B, bool)

    ref_len = cfg.max_steps - 10
    need = cfg.max_steps + mpc.base.N + 1

    def episode(gp: Simple3DoFGP, use_gp: Array, x0: Array):
        """One closed-loop episode flying with this lane's (gated) GP."""

        def mean_fn(x, u):
            m, _ = gp.predict_gated(x, u)
            m = jnp.where(use_gp, m, jnp.zeros_like(m))
            return Simple3DoFGP.lift_residual(m, 7)

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

    def round_body(carry, rkey):
        gps, fitted = carry
        ep = jax.vmap(episode)(gps, fitted, x0s)

        res = jax.vmap(lambda X, U, Xn: collector.collect_batch(F_nom, X, U, Xn))(
            ep["X"], ep["U"], ep["Xn"]
        )
        feats = jax.vmap(lambda gp, X, U: gp.extractor.extract_batch(X, U))(
            gps, ep["X"], ep["U"]
        )
        bufs = jax.vmap(lambda gp, F, R, v: gp.buffer.add_batch_masked(F, R, v))(
            gps, feats, res, ep["valid"]
        )
        gps = jax.vmap(lambda gp, b: gp.replace(buffer=b))(gps, bufs)
        # refit barrier: every lane refits on its own buffer (kmeans + FITC)
        keys = jax.random.split(rkey, B)
        gps = jax.vmap(lambda gp, k: gp.fit(k))(gps, keys)
        fitted = fitted | (bufs.count >= cfg.min_points_for_gp)
        metrics = {
            "landed": ep["landed"],
            "touchdown_speed": ep["speed"],
            "model_err": ep["model_err"],
            "success": ep["landed"] & (ep["speed"] < cfg.success_speed),
        }
        return (gps, fitted), metrics

    (gps, fitted), metrics = jax.lax.scan(
        round_body, (gps0, fitted0), jax.random.split(k_rounds, cfg.n_rounds)
    )
    metrics.update({"gp_fitted": fitted})
    metrics["gps"] = gps
    return metrics
