"""Structured residual GPs for rocket dynamics — the key learning model.

TPU-native counterpart of ``/root/reference/src/gp/structured_gp.py``:
separate multi-output GPs for the translational (d_v ∈ R³) and rotational
(d_ω ∈ R³) acceleration residuals, exploiting structure — mass flow and
kinematics are exact, only accelerations are learned (``:1-23``). Includes
the FIFO-capped data store (``:170-206``; here a fixed-capacity ring buffer),
fit via feature extraction (``:208-226``), batched prediction (``:228-305``),
the 6-D → 14-D residual lift (``:307-338``), the novelty test
var > τ·prior_var (``:340-359``), npz persistence (``:375-406``), and the
3-output ``Simple3DoFGP`` variant (``:414-496``).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from .features import (
    AtmosphereModel,
    RotationalFeatureExtractor,
    Simple3DoFFeatureExtractor,
    TranslationalFeatureExtractor,
)
from .kernels import create_kernel
from .sparse_gp import (
    MultiOutputSparseGPState,
    fit_sparse_multi,
    init_inducing_points,
    predict_sparse_multi,
    refit_sparse_multi,
)

Array = jax.Array


@struct.dataclass
class StructuredGPConfig:
    """(mirrors ``StructuredGPConfig``, ``structured_gp.py:100-130``)."""

    max_data_points: int = struct.field(pytree_node=False, default=512)
    n_inducing: int = struct.field(pytree_node=False, default=100)
    kernel: str = struct.field(pytree_node=False, default="se_ard")
    method: str = struct.field(pytree_node=False, default="fitc")
    noise: float = 1e-4
    novelty_threshold: float = 0.3  # var > τ·prior_var ⇒ novel (":340-359")
    # optional fixed ARD lengthscale inits per feature group (reference
    # gp_params.yaml:40-44); None = data-driven (_data_lengthscales). Tuples
    # (static) so the config stays hashable under jit.
    trans_lengthscales: Optional[tuple] = struct.field(
        pytree_node=False, default=None)
    rot_lengthscales: Optional[tuple] = struct.field(
        pytree_node=False, default=None)
    # initial signal variance per group (reference gp_params.yaml:46-49)
    signal_variance: float = struct.field(pytree_node=False, default=1.0)


@struct.dataclass
class RingBuffer:
    """Fixed-capacity FIFO feature/target store (replaces the Python list +
    cap of ``structured_gp.py:170-206``)."""

    X: Array  # (cap, d)
    Y: Array  # (cap, n_out)
    head: Array  # () next write slot
    count: Array  # () active rows (≤ cap)

    @classmethod
    def create(cls, capacity: int, d: int, n_out: int, dtype=jnp.float32):
        return cls(
            X=jnp.zeros((capacity, d), dtype),
            Y=jnp.zeros((capacity, n_out), dtype),
            head=jnp.asarray(0, jnp.int32),
            count=jnp.asarray(0, jnp.int32),
        )

    @property
    def capacity(self) -> int:
        return self.X.shape[0]

    @property
    def mask(self) -> Array:
        return jnp.arange(self.capacity) < self.count

    def add(self, x: Array, y: Array) -> "RingBuffer":
        # one-hot row select, not a dynamic-index scatter: under vmap (one
        # buffer per scenario) the scatter serializes per lane on TPU —
        # measured 4.7x slower at batch 512 than this single-stream form
        cap = self.capacity
        sel = (jnp.arange(cap) == self.head)[:, None]
        return self.replace(
            X=jnp.where(sel, jnp.broadcast_to(x, self.X.shape), self.X),
            Y=jnp.where(sel, jnp.broadcast_to(y, self.Y.shape), self.Y),
            head=(self.head + 1) % cap,
            count=jnp.minimum(self.count + 1, cap),
        )

    def add_if_novel(
        self, x: Array, y: Array, min_distance, accept: Array = None
    ) -> Tuple["RingBuffer", Array]:
        """Novelty-gated conditional insert (the per-cycle in-loop observe
        path — ``online_update.py:108-132`` semantics on this store): the
        point enters only when its distance to every stored row exceeds
        ``min_distance`` (and ``accept``, if given). Returns (buffer, ok).
        Same one-hot write form as :meth:`add` — see that note."""
        d2 = jnp.sum((self.X - x[None]) ** 2, axis=1)
        d2 = jnp.where(self.mask, d2, jnp.inf)
        ok = jnp.sqrt(jnp.min(d2)) > min_distance
        if accept is not None:
            ok = ok & accept
        cap = self.capacity
        sel = ((jnp.arange(cap) == self.head) & ok)[:, None]
        return self.replace(
            X=jnp.where(sel, jnp.broadcast_to(x, self.X.shape), self.X),
            Y=jnp.where(sel, jnp.broadcast_to(y, self.Y.shape), self.Y),
            head=jnp.where(ok, (self.head + 1) % cap, self.head),
            count=jnp.where(ok, jnp.minimum(self.count + 1, cap), self.count),
        ), ok

    def add_batch(self, Xb: Array, Yb: Array) -> "RingBuffer":
        k = Xb.shape[0]
        idx = (self.head + jnp.arange(k)) % self.capacity
        return self.replace(
            X=self.X.at[idx].set(Xb),
            Y=self.Y.at[idx].set(Yb),
            head=(self.head + k) % self.capacity,
            count=jnp.minimum(self.count + k, self.capacity),
        )

    def add_batch_masked(self, Xb: Array, Yb: Array, valid: Array) -> "RingBuffer":
        """Admit only rows with ``valid=True`` (static shapes: invalid rows
        scatter to an out-of-bounds slot and are dropped). The write order of
        valid rows is preserved, so the FIFO semantics match a sequential
        ``add`` of the valid subsequence — this is how batched episode
        transcripts (with frozen post-touchdown rows) enter the store."""
        cap = self.capacity
        pos = (self.head + jnp.cumsum(valid.astype(jnp.int32)) - 1) % cap
        idx = jnp.where(valid, pos, cap)  # cap = out of bounds ⇒ dropped
        k = jnp.sum(valid.astype(jnp.int32))
        return self.replace(
            X=self.X.at[idx].set(Xb, mode="drop"),
            Y=self.Y.at[idx].set(Yb, mode="drop"),
            head=(self.head + k) % cap,
            count=jnp.minimum(self.count + k, cap),
        )


@struct.dataclass
class StructuredRocketGP:
    """Six-output residual model: d_v from translational features, d_ω from
    rotational features (``structured_gp.py:135-406``)."""

    config: StructuredGPConfig = struct.field(pytree_node=False)
    trans_extractor: TranslationalFeatureExtractor
    rot_extractor: RotationalFeatureExtractor
    trans_buffer: RingBuffer
    rot_buffer: RingBuffer
    trans_gp: Optional[MultiOutputSparseGPState] = None
    rot_gp: Optional[MultiOutputSparseGPState] = None
    is_fitted: bool = struct.field(pytree_node=False, default=False)

    @classmethod
    def create(cls, config: Optional[StructuredGPConfig] = None) -> "StructuredRocketGP":
        cfg = config or StructuredGPConfig()
        atm = AtmosphereModel()
        te = TranslationalFeatureExtractor(atmosphere=atm)
        re = RotationalFeatureExtractor(atmosphere=atm)
        return cls(
            config=cfg,
            trans_extractor=te,
            rot_extractor=re,
            trans_buffer=RingBuffer.create(cfg.max_data_points, te.n_features, 3),
            rot_buffer=RingBuffer.create(cfg.max_data_points, re.n_features, 3),
        )

    # -- data ---------------------------------------------------------------
    def add_data(self, x: Array, u: Array, residual: Array) -> "StructuredRocketGP":
        """residual is the 6-vector [d_v(3), d_ω(3)]."""
        ft = self.trans_extractor.extract(x, u)
        fr = self.rot_extractor.extract(x, u)
        return self.replace(
            trans_buffer=self.trans_buffer.add(ft, residual[:3]),
            rot_buffer=self.rot_buffer.add(fr, residual[3:6]),
        )

    def add_data_batch(self, X: Array, U: Array, residuals: Array) -> "StructuredRocketGP":
        Ft = self.trans_extractor.extract_batch(X, U)
        Fr = self.rot_extractor.extract_batch(X, U)
        return self.replace(
            trans_buffer=self.trans_buffer.add_batch(Ft, residuals[:, :3]),
            rot_buffer=self.rot_buffer.add_batch(Fr, residuals[:, 3:6]),
        )

    def add_data_batch_masked(
        self, X: Array, U: Array, residuals: Array, valid: Array
    ) -> "StructuredRocketGP":
        """Masked batch insert into both buffers (the fleet-learner path —
        see ``RingBuffer.add_batch_masked``)."""
        Ft = self.trans_extractor.extract_batch(X, U)
        Fr = self.rot_extractor.extract_batch(X, U)
        return self.replace(
            trans_buffer=self.trans_buffer.add_batch_masked(
                Ft, residuals[:, :3], valid),
            rot_buffer=self.rot_buffer.add_batch_masked(
                Fr, residuals[:, 3:6], valid),
        )

    @property
    def buffer_count(self) -> Array:
        """Stored-point count (both buffers fill in lockstep)."""
        return self.trans_buffer.count

    # -- fit ----------------------------------------------------------------
    def fit(self, key: Array) -> "StructuredRocketGP":
        """Fit both sparse GPs on the buffered data (``structured_gp.py:208-226``)."""
        cfg = self.config
        kt, kr = jax.random.split(key)

        def fit_one(key, buf, d, fixed_ls):
            ls = (jnp.asarray(fixed_ls, jnp.float32) if fixed_ls is not None
                  else _data_lengthscales(buf.X, buf.mask))
            kernels = _stacked_kernels(
                cfg.kernel, d, 3, ls, variance=cfg.signal_variance
            )
            Z = init_inducing_points(
                key, buf.X, min(cfg.n_inducing, buf.capacity), mask=buf.mask
            )
            return fit_sparse_multi(
                kernels, buf.X, buf.Y, Z, noise=cfg.noise,
                mask=buf.mask, method=cfg.method,
            )

        return self.replace(
            trans_gp=fit_one(kt, self.trans_buffer,
                             self.trans_extractor.n_features,
                             cfg.trans_lengthscales),
            rot_gp=fit_one(kr, self.rot_buffer,
                           self.rot_extractor.n_features,
                           cfg.rot_lengthscales),
            is_fitted=True,
        )

    def refit(self) -> "StructuredRocketGP":
        """Refit with current buffers, keeping kernels and inducing points
        (the online-update cadence path — no kmeans, fully jittable)."""
        tg, rg = self.trans_gp, self.rot_gp
        tb, rb = self.trans_buffer, self.rot_buffer
        return self.replace(
            trans_gp=refit_sparse_multi(
                tg.kernels, tg.Z, tb.X, tb.Y.T, tb.mask, tg.log_noise, tg.method
            ),
            rot_gp=refit_sparse_multi(
                rg.kernels, rg.Z, rb.X, rb.Y.T, rb.mask, rg.log_noise, rg.method
            ),
        )

    # -- predict ------------------------------------------------------------
    def predict(self, x: Array, u: Array) -> Tuple[Array, Array]:
        """(mean, var) 6-vectors of [d_v, d_ω] (``structured_gp.py:228-305``)."""
        ft = self.trans_extractor.extract(x, u)[None]
        fr = self.rot_extractor.extract(x, u)[None]
        pt = predict_sparse_multi(self.trans_gp, ft)
        pr = predict_sparse_multi(self.rot_gp, fr)
        mean = jnp.concatenate([pt.mean[0], pr.mean[0]])
        var = jnp.concatenate([pt.variance[0], pr.variance[0]])
        return mean, var

    def predict_batch(self, X: Array, U: Array) -> Tuple[Array, Array]:
        Ft = self.trans_extractor.extract_batch(X, U)
        Fr = self.rot_extractor.extract_batch(X, U)
        pt = predict_sparse_multi(self.trans_gp, Ft)
        pr = predict_sparse_multi(self.rot_gp, Fr)
        return (
            jnp.concatenate([pt.mean, pr.mean], axis=1),
            jnp.concatenate([pt.variance, pr.variance], axis=1),
        )

    def predict_gated(self, x: Array, u: Array) -> Tuple[Array, Array]:
        """Variance-gated prediction: the mean is scaled by
        w = clip(1 − σ²/σ²_prior, 0, 1) per output, so the correction fades
        to zero where the GP has no data (prevents confident extrapolation
        from destabilizing the controller — the control-oriented form of the
        reference's novelty test, ``structured_gp.py:340-359``)."""
        mean, var = self.predict(x, u)
        prior = jnp.concatenate([
            jnp.exp(self.trans_gp.kernels.log_variance),
            jnp.exp(self.rot_gp.kernels.log_variance),
        ])
        w = jnp.clip(1.0 - var / jnp.maximum(prior, 1e-12), 0.0, 1.0)
        return mean * w, var

    # -- residual lift (structured_gp.py:307-338) ---------------------------
    @staticmethod
    def lift_residual(residual6: Array, n_x: int = 14) -> Array:
        """6-D acceleration residual → full-state residual: d_v into the
        velocity slice [4:7], d_ω into the rate slice [11:14]."""
        out = jnp.zeros(n_x, residual6.dtype)
        out = out.at[4:7].set(residual6[:3])
        if n_x >= 14:
            out = out.at[11:14].set(residual6[3:6])
        return out

    # -- novelty (structured_gp.py:340-359) ---------------------------------
    def is_novel(self, x: Array, u: Array) -> Array:
        _, var = self.predict(x, u)
        prior = jnp.concatenate([
            jnp.exp(jax.tree.leaves(self.trans_gp.kernels)[0][:1] * 0 +
                    self.trans_gp.kernels.log_variance),
            jnp.exp(self.rot_gp.kernels.log_variance),
        ])
        return jnp.any(var > self.config.novelty_threshold * prior)

    # -- persistence (structured_gp.py:375-406) -----------------------------
    def save(self, path: str) -> None:
        leaves, _ = jax.tree.flatten(self)
        np.savez(path, *[np.asarray(x) for x in leaves])

    def load(self, path: str) -> "StructuredRocketGP":
        """Restore leaves into a structurally-identical instance."""
        data = np.load(path)
        leaves = [jnp.asarray(data[k]) for k in data.files]
        _, treedef = jax.tree.flatten(self)
        return jax.tree.unflatten(treedef, leaves)


def _stacked_kernels(name: str, d: int, n_out: int, lengthscales=None,
                     variance: float = 1.0):
    """Stack n_out kernels; per-dimension ARD lengthscales default to 1 or to
    a data-driven scale (see ``_data_lengthscales``)."""
    ks = [create_kernel(name, d, variance=variance) for _ in range(n_out)]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *ks)
    if lengthscales is not None and hasattr(stacked, "log_lengthscales"):
        stacked = stacked.replace(
            log_lengthscales=jnp.tile(jnp.log(lengthscales)[None, :], (n_out, 1))
        )
    return stacked


def _data_lengthscales(X: Array, mask: Array) -> Array:
    """ARD lengthscale init ∝ per-dimension std of the active data, scaled by
    √d (floored). Unnormalized physical features span 0–30 units; unit
    lengthscales would make every query look "far" and collapse predictions
    to the prior. The √d factor keeps the *total* scaled distance between
    typical points O(1) instead of O(d), so moderate extrapolation (a couple
    of σ in a few dimensions) still generalizes.
    """
    mf = mask.astype(X.dtype)
    n = jnp.maximum(jnp.sum(mf), 1.0)
    mu = jnp.sum(X * mf[:, None], axis=0) / n
    var = jnp.sum(((X - mu) ** 2) * mf[:, None], axis=0) / n
    d = X.shape[1]
    return jnp.maximum(jnp.sqrt(var) * jnp.sqrt(float(d)), 0.1)


@struct.dataclass
class Simple3DoFGP:
    """Three-output velocity-residual GP on 11-dim features
    (``structured_gp.py:414-496``)."""

    config: StructuredGPConfig = struct.field(pytree_node=False)
    extractor: Simple3DoFFeatureExtractor
    buffer: RingBuffer
    gp: Optional[MultiOutputSparseGPState] = None
    is_fitted: bool = struct.field(pytree_node=False, default=False)

    @classmethod
    def create(cls, config: Optional[StructuredGPConfig] = None) -> "Simple3DoFGP":
        cfg = config or StructuredGPConfig()
        ex = Simple3DoFFeatureExtractor()
        return cls(
            config=cfg,
            extractor=ex,
            buffer=RingBuffer.create(cfg.max_data_points, ex.n_features, 3),
        )

    def add_data(self, x: Array, u: Array, residual3: Array) -> "Simple3DoFGP":
        return self.replace(
            buffer=self.buffer.add(self.extractor.extract(x, u), residual3)
        )

    def add_data_batch(self, X: Array, U: Array, R: Array) -> "Simple3DoFGP":
        return self.replace(
            buffer=self.buffer.add_batch(self.extractor.extract_batch(X, U), R)
        )

    def add_data_batch_masked(
        self, X: Array, U: Array, R: Array, valid: Array
    ) -> "Simple3DoFGP":
        return self.replace(
            buffer=self.buffer.add_batch_masked(
                self.extractor.extract_batch(X, U), R, valid)
        )

    @property
    def buffer_count(self) -> Array:
        return self.buffer.count

    def fit(self, key: Array) -> "Simple3DoFGP":
        cfg = self.config
        kernels = _stacked_kernels(
            cfg.kernel, self.extractor.n_features, 3,
            _data_lengthscales(self.buffer.X, self.buffer.mask),
        )
        Z = init_inducing_points(
            key, self.buffer.X, min(cfg.n_inducing, self.buffer.capacity),
            mask=self.buffer.mask,
        )
        gp = fit_sparse_multi(
            kernels, self.buffer.X, self.buffer.Y, Z, noise=cfg.noise,
            mask=self.buffer.mask, method=cfg.method,
        )
        return self.replace(gp=gp, is_fitted=True)

    def refit(self) -> "Simple3DoFGP":
        g, b = self.gp, self.buffer
        return self.replace(
            gp=refit_sparse_multi(g.kernels, g.Z, b.X, b.Y.T, b.mask, g.log_noise, g.method)
        )

    def predict(self, x: Array, u: Array) -> Tuple[Array, Array]:
        f = self.extractor.extract(x, u)[None]
        pr = predict_sparse_multi(self.gp, f)
        return pr.mean[0], pr.variance[0]

    def predict_batch(self, X: Array, U: Array) -> Tuple[Array, Array]:
        F = self.extractor.extract_batch(X, U)
        pr = predict_sparse_multi(self.gp, F)
        return pr.mean, pr.variance

    def predict_gated(self, x: Array, u: Array) -> Tuple[Array, Array]:
        """Variance-gated mean (see ``StructuredRocketGP.predict_gated``)."""
        mean, var = self.predict(x, u)
        prior = jnp.exp(self.gp.kernels.log_variance)
        w = jnp.clip(1.0 - var / jnp.maximum(prior, 1e-12), 0.0, 1.0)
        return mean * w, var

    @staticmethod
    def lift_residual(residual3: Array, n_x: int = 7) -> Array:
        out = jnp.zeros(n_x, residual3.dtype)
        return out.at[4:7].set(residual3)

    # persistence (mirrors structured_gp.py:375-406)
    def save(self, path: str) -> None:
        leaves, _ = jax.tree.flatten(self)
        np.savez(path, *[np.asarray(x) for x in leaves])

    def load(self, path: str) -> "Simple3DoFGP":
        data = np.load(path)
        leaves = [jnp.asarray(data[k]) for k in data.files]
        _, treedef = jax.tree.flatten(self)
        return jax.tree.unflatten(treedef, leaves)
