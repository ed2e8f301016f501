"""Online learning INSIDE the 50 Hz GP-MPC control loop, at campaign scale.

The reference updates its GP *during* control on a cadence
(``/root/reference/src/gp/online_update.py:14-16,53-56`` — novelty-gated
buffer insert every cycle, factor update every ``update_interval`` points —
and ``/root/reference/src/learning/online_learner.py:193-196`` — in-episode
incremental updates). This module is the campaign-scale composition: one
controller whose per-lane state carries the GP itself, so a ``vmap``-ped
Monte-Carlo campaign has every lane observing its own residuals each cycle
and refitting its own sparse-GP factors on a lockstep cadence — all inside
the one scanned XLA program.

TPU-first design notes (why this is NOT the reference's loop translated):

- The GP state (inducing points, stacked kernels, Cholesky factors, ring
  buffer) is a flax pytree riding in the ``lax.scan`` carry; "update the GP"
  is a pure function of that carry, so 512 lanes update concurrently with no
  host round trip (the reference mutates a Python object per scenario).
- The per-cycle observation is a masked one-hot ring-buffer insert plus a
  novelty gate — O(capacity·d) streamed elementwise work, no scatter, no
  retrace (static shapes throughout).
- The refit (Kuf kernel cross-covariances, M×M Cholesky, triangular solves)
  runs under ``lax.cond`` on the *scalar* step counter: the predicate is
  unbatched under ``vmap``, so XLA keeps real control flow and the refit
  cost is paid only every ``refit_every``-th cycle, in lockstep across
  lanes — the TPU analogue of the reference's ``update_interval``.
- Inducing points are initialized from the lane's own planned descent
  profile (features along the cubic reference); every cadenced refit then
  re-centers Z on the MOST RECENT ``n_inducing`` admitted points (one
  gather — no k-means in the control path). Recency is the right coverage
  rule here: FITC's posterior variance floors at k** − q** wherever Z is
  far, so a stale Z cannot exploit fresh data in a newly-entered flight
  regime no matter how much of it the buffer holds; the controller queries
  near the *current* regime, which is exactly what the latest points cover.
  (Measured on the dispersed-plant campaign: k-means-refresh-every-50
  leaves a sawtooth — error falls 20× right after a refresh and decays
  back within ~30 cycles; recency-Z holds the 10–20× reduction flat.)
- Hyperparameters refresh by empirical Bayes on the same low cadence
  (masked data moments → ARD lengthscales, output variance → signal
  variance): jittable, a few fused reductions, no Adam loop in the control
  path (the full MLE retune stays in the between-episode fleet learner).

The controller follows the (controller_init, controller_step) Monte-Carlo
protocol of ``experiments.monte_carlo``, so ``run_campaign`` composes it
unchanged; ``online_controller_info`` exports the per-lane prediction-error
trace that shows learning happening *during* the campaign.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from ..gp import Simple3DoFGP, StructuredGPConfig, StructuredRocketGP
from ..gp.sparse_gp import refit_sparse_multi
from ..gp.structured_gp import RingBuffer, _data_lengthscales, _stacked_kernels
from ..mpc import GPMPCConfig
from ..mpc.gp_mpc import GPMPCState, gp_mpc_init, gp_mpc_solve

Array = jax.Array


@struct.dataclass
class OnlineGPMPCConfig:
    """Cadences mirror the reference's ``OnlineUpdateConfig``
    (``online_update.py:40-72``: update_interval=10, refit_interval=100)."""

    mpc: GPMPCConfig = struct.field(pytree_node=False)
    gp: StructuredGPConfig = struct.field(
        pytree_node=False,
        default_factory=lambda: StructuredGPConfig(
            max_data_points=160, n_inducing=32
        ),
    )
    # factor-refresh cadence in control cycles (reference update_interval);
    # each refit also re-centers Z on the most recent n_inducing points
    refit_every: int = struct.field(pytree_node=False, default=10)
    # empirical-Bayes hyperparameter refresh cadence (reference
    # refit_interval); 0 disables
    refresh_every: int = struct.field(pytree_node=False, default=20)
    # hyperparameter refresh waits for this many points (data moments on a
    # near-degenerate trajectory snippet give collapsed lengthscales)
    min_points_hypers: int = struct.field(pytree_node=False, default=24)
    # activation gate (online_learner.py:244-248)
    min_points: int = struct.field(pytree_node=False, default=12)
    # novelty admission (online_update.py:108-132)
    min_distance: float = struct.field(pytree_node=False, default=0.01)
    dt: float = struct.field(pytree_node=False, default=0.1)


@struct.dataclass
class OnlineGPMPCState:
    """Per-lane carry: MPC warm starts + the lane's own live GP."""

    mpc: GPMPCState
    Xr: Array  # padded reference trajectory
    gp: object  # Simple3DoFGP (7-state) or StructuredRocketGP (14-state)
    x_prev: Array
    u_prev: Array
    have_prev: Array  # bool: (x_prev, u_prev) is a real flown transition
    n_accepted: Array  # novelty-admitted points
    n_refits: Array
    err_hist: Array  # (err_len,) one-step model |error| per cycle (nan=n/a)


def _envelope_block(gcfg, Fe: Array, n_out: int, buf: RingBuffer):
    """Multi-output sparse state for one GP block from envelope features:
    evenly-subsampled Z, moment lengthscales, factors on the (empty) buffer."""
    M = gcfg.n_inducing
    idx = jnp.linspace(0, Fe.shape[0] - 1, M).round().astype(jnp.int32)
    mask_all = jnp.ones(Fe.shape[0], bool)
    kernels = _stacked_kernels(
        gcfg.kernel, Fe.shape[1], n_out, _data_lengthscales(Fe, mask_all)
    )
    log_noise = jnp.full((n_out,), jnp.log(gcfg.noise), Fe.dtype)
    return refit_sparse_multi(
        kernels, Fe[idx], buf.X, buf.Y.T, buf.mask, log_noise, gcfg.method
    )


def init_online_gp(
    cfg: OnlineGPMPCConfig, x0: Array, x_target: Array, ref_horizon: int
):
    """Empty-buffer GP with envelope-derived inducing points and priors.

    Z = features along the lane's planned cubic descent (evenly subsampled);
    ARD lengthscales from the moments of those envelope features. With zero
    data the posterior equals the prior (zero mean), and the variance gate in
    ``predict_gated`` keeps the correction off until real data arrives.
    14-state targets get the reference's 6-output structured model (separate
    translational/rotational blocks, ``structured_gp.py:4-22``).
    """
    from ..reference import cubic_descent_reference

    gcfg = cfg.gp
    Xr = cubic_descent_reference(x0, x_target, ref_horizon, cfg.dt)
    # hover-ish thrust along the profile: T ≈ m·g vertically
    Ur = jnp.zeros((Xr.shape[0], 3)).at[:, 0].set(Xr[:, 0])
    if x0.shape[-1] >= 14:
        gp = StructuredRocketGP.create(gcfg)
        Ft = gp.trans_extractor.extract_batch(Xr, Ur)
        Fr = gp.rot_extractor.extract_batch(Xr, Ur)
        return gp.replace(
            trans_gp=_envelope_block(gcfg, Ft, 3, gp.trans_buffer),
            rot_gp=_envelope_block(gcfg, Fr, 3, gp.rot_buffer),
            is_fitted=True,
        )
    gp = Simple3DoFGP.create(gcfg)
    Fe = gp.extractor.extract_batch(Xr, Ur)
    return gp.replace(gp=_envelope_block(gcfg, Fe, 3, gp.buffer), is_fitted=True)


def _recent_Z(buf: RingBuffer, Z_fallback: Array) -> Array:
    """The most recent ``M`` admitted feature rows (newest-first gather from
    the ring); slots beyond ``count`` keep the fallback (envelope) rows."""
    M = Z_fallback.shape[0]
    j = jnp.arange(M)
    idx = (buf.head - 1 - j) % buf.capacity
    have = j < buf.count
    return jnp.where(have[:, None], buf.X[idx], Z_fallback)


def _refit_block(g, buf: RingBuffer):
    """Recenter one block's Z on the latest points and recompute factors."""
    return refit_sparse_multi(
        g.kernels, _recent_Z(buf, g.Z), buf.X, buf.Y.T, buf.mask,
        g.log_noise, g.method,
    )


def _refit_recent(gp):
    """The cadenced in-loop update: re-center Z on the latest points and
    recompute the FITC/VFE factors on the full masked buffer."""
    if isinstance(gp, StructuredRocketGP):
        return gp.replace(
            trans_gp=_refit_block(gp.trans_gp, gp.trans_buffer),
            rot_gp=_refit_block(gp.rot_gp, gp.rot_buffer),
        )
    return gp.replace(gp=_refit_block(gp.gp, gp.buffer))


def _refresh_block(g, buf: RingBuffer, min_pts: int):
    """Empirical-Bayes hyperparameter refresh of one block, then a refit.
    Lanes below ``min_pts`` keep their envelope-derived hyperparameters
    (per-lane predicate, lockstep cadence)."""
    take = buf.count >= min_pts
    n_out = g.log_noise.shape[0]
    kernels = g.kernels
    if hasattr(kernels, "log_lengthscales"):
        ls = _data_lengthscales(buf.X, buf.mask)
        kernels = kernels.replace(
            log_lengthscales=jnp.where(
                take, jnp.tile(jnp.log(ls)[None], (n_out, 1)),
                kernels.log_lengthscales,
            )
        )
    if hasattr(kernels, "log_variance"):
        mf = buf.mask.astype(buf.Y.dtype)
        n = jnp.maximum(jnp.sum(mf), 1.0)
        mu = jnp.sum(buf.Y * mf[:, None], axis=0) / n
        var = jnp.sum(((buf.Y - mu) ** 2) * mf[:, None], axis=0) / n
        lv = 0.5 * jnp.log(jnp.maximum(var * 2.0, 1e-4))
        kernels = kernels.replace(
            log_variance=jnp.where(take, lv, kernels.log_variance)
        )
    return refit_sparse_multi(
        kernels, _recent_Z(buf, g.Z), buf.X, buf.Y.T, buf.mask,
        g.log_noise, g.method,
    )


def _refresh_hypers(gp, min_pts: int):
    if isinstance(gp, StructuredRocketGP):
        return gp.replace(
            trans_gp=_refresh_block(gp.trans_gp, gp.trans_buffer, min_pts),
            rot_gp=_refresh_block(gp.rot_gp, gp.rot_buffer, min_pts),
        )
    return gp.replace(gp=_refresh_block(gp.gp, gp.buffer, min_pts))


def _observe(gp, x_prev: Array, u_prev: Array, r: Array, accept: Array,
             min_distance: float):
    """Novelty-gated ring insert (``online_update.py:108-132`` semantics on
    the masked static-shape store — see :meth:`RingBuffer.add_if_novel`).
    ``r`` is the learned-slice residual (3 or 6 outputs); the structured
    model gates novelty on the translational features and admits both blocks
    together (lockstep buffers, like ``add_data``)."""
    if isinstance(gp, StructuredRocketGP):
        ft = gp.trans_extractor.extract(x_prev, u_prev)
        fr = gp.rot_extractor.extract(x_prev, u_prev)
        tbuf, ok = gp.trans_buffer.add_if_novel(
            ft, r[:3], min_distance, accept=accept)
        rbuf, _ = gp.rot_buffer.add_if_novel(fr, r[3:6], -1.0, accept=ok)
        return gp.replace(trans_buffer=tbuf, rot_buffer=rbuf), ok
    f = gp.extractor.extract(x_prev, u_prev)
    buf, ok = gp.buffer.add_if_novel(f, r, min_distance, accept=accept)
    return gp.replace(buffer=buf), ok


def make_online_gp_mpc_controller(
    step_fn: Callable[[Array, Array], Array],
    cfg: OnlineGPMPCConfig,
    x_target: Array,
    reference_fn: Callable[[Array], Array],
    ref_horizon: int,
    err_len: int,
):
    """(controller_init, controller_step) with in-loop learning.

    ``step_fn`` is the NOMINAL model; the plant the campaign flies is
    whatever ``run_campaign`` passes — the GP learns the gap online.
    """
    mcfg = cfg.mpc
    N = mcfg.base.N
    dt = cfg.dt
    n_x = x_target.shape[-1]

    def _mean_var(gp):
        use = gp.buffer_count >= cfg.min_points
        lift = type(gp).lift_residual

        def mean_fn(x, u):
            m, _ = gp.predict_gated(x, u)
            return lift(jnp.where(use, m, jnp.zeros_like(m)), n_x)

        def var_fn(x, u):
            v = gp.predict(x, u)[1]
            return jnp.where(use, v, jnp.zeros_like(v))

        return mean_fn, var_fn

    def cinit(x0: Array) -> OnlineGPMPCState:
        st = gp_mpc_init(mcfg, x0, x_target)
        Xr = reference_fn(x0)
        need = ref_horizon + N + 1
        pad = jnp.tile(Xr[-1:], (max(need - Xr.shape[0], 1), 1))
        Xr = jnp.concatenate([Xr, pad], axis=0)[:need]
        gp = init_online_gp(cfg, x0, x_target, ref_horizon)
        return OnlineGPMPCState(
            mpc=st, Xr=Xr, gp=gp,
            x_prev=x0, u_prev=jnp.zeros(3, x0.dtype),
            have_prev=jnp.asarray(False),
            n_accepted=jnp.asarray(0, jnp.int32),
            n_refits=jnp.asarray(0, jnp.int32),
            err_hist=jnp.full((err_len,), jnp.nan, x0.dtype),
        )

    def cstep(st: OnlineGPMPCState, x: Array, k: Array):
        gp = st.gp

        # a REAL flown transition: the campaign scan keeps stepping landed
        # lanes on their frozen touchdown state, and x == x_prev there —
        # "observing" that non-transition writes a huge fake residual
        # (frozen x vs the dynamics' prediction) into the buffer. Measured
        # (episode-carry campaign, run_online_safety_tpu): the junk
        # concentrates near the ground, so a GP carried into the NEXT
        # episode flies its endgame on poisoned data — success 0.96 → 0.58
        # over 3 episodes while in-flight error metrics kept improving.
        real = st.have_prev & jnp.any(x != st.x_prev)

        # -- measure: one-step error of the controller's CURRENT model on the
        # transition just flown (before it enters the buffer) -----------------
        mean_fn, var_fn = _mean_var(gp)
        pred = step_fn(st.x_prev, st.u_prev) + dt * mean_fn(st.x_prev, st.u_prev)
        err = jnp.linalg.norm(x[4:7] - pred[4:7])
        err_hist = st.err_hist.at[k].set(
            jnp.where(real, err, jnp.nan), mode="drop"
        )

        # -- observe: residual of the flown transition into the ring buffer --
        err_full = (x - step_fn(st.x_prev, st.u_prev)) / dt
        if n_x >= 14:
            r = jnp.concatenate([err_full[4:7], err_full[11:14]])
        else:
            r = err_full[4:7]
        gp, accepted = _observe(
            gp, st.x_prev, st.u_prev, r, real, cfg.min_distance)

        # -- cadenced refresh/refit (scalar predicates → real lax.cond) ------
        did_refresh = jnp.asarray(False)
        if cfg.refresh_every > 0:
            did_refresh = (k % cfg.refresh_every) == cfg.refresh_every - 1
            gp = jax.lax.cond(
                did_refresh,
                lambda g: _refresh_hypers(g, cfg.min_points_hypers),
                lambda g: g,
                gp,
            )
        # a refresh already refit on the recentered Z — don't pay the
        # factor build twice on cycles where both cadences align
        do_refit = ((k % cfg.refit_every) == cfg.refit_every - 1) & ~did_refresh
        gp = jax.lax.cond(do_refit, _refit_recent, lambda g: g, gp)

        # -- solve with the (possibly just-updated) lane GP -------------------
        mean_fn, var_fn = _mean_var(gp)
        kk = jnp.minimum(k, ref_horizon - 1)
        mpc = st.mpc.replace(
            x_ref=jax.lax.dynamic_slice_in_dim(st.Xr, kk, N + 1, axis=0)
        )
        sol, mpc = gp_mpc_solve(step_fn, mean_fn, var_fn, mcfg, mpc, x)

        new = st.replace(
            mpc=mpc, gp=gp, x_prev=x, u_prev=sol.u0,
            have_prev=jnp.asarray(True),
            n_accepted=st.n_accepted + accepted.astype(jnp.int32),
            n_refits=st.n_refits + (do_refit | did_refresh).astype(jnp.int32),
            err_hist=err_hist,
        )
        return sol.u0, new

    return cinit, cstep


def carry_gp_between_episodes(
    cinit: Callable[[Array], OnlineGPMPCState],
    st_final: OnlineGPMPCState,
    x0_next: Array,
) -> OnlineGPMPCState:
    """Fresh-episode controller state at ``x0_next`` with the learned GP
    carried over — the episode lifecycle of the reference's
    ``IterativeLearningRunner`` (``online_learner.py:564-611``): warm starts,
    reference, and error trace reset per episode; the model persists. The
    carried GP keeps its episode-1 inducing points and data (the recency
    refresh re-centers Z as new data arrives)."""
    fresh = cinit(x0_next)
    return fresh.replace(
        gp=st_final.gp,
        n_accepted=st_final.n_accepted,
        n_refits=st_final.n_refits,
    )


def online_controller_info(st: OnlineGPMPCState) -> dict:
    """``cstate_info`` hook for ``run_episode``/``run_campaign``: exports the
    learning trace (the artifact evidence that error falls DURING flight)."""
    return {
        "err_hist": st.err_hist,
        "gp_points": st.gp.buffer_count,
        "n_accepted": st.n_accepted,
        "n_refits": st.n_refits,
    }
