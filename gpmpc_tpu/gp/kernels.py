"""GP covariance kernels as pytree dataclasses.

TPU-native counterpart of ``/root/reference/src/gp/kernels.py``: SE-ARD /
isotropic SE / Matérn 3/2 & 5/2 with ARD / Sum / Product / WhiteNoise, the
vectorized scaled-distance trick (‖x‖²+‖z‖²−2x·z, ``kernels.py:205-236``),
and ``+``/``*`` composition (``:33-122``).

Design: a kernel is an immutable flax.struct dataclass whose leaves are the
log-hyperparameters. That makes the *kernel itself* the optimization variable
— ``jax.grad`` of the log marginal likelihood w.r.t. the kernel pytree
replaces the reference's hand-derived log-space gradients (``:279-318``), and
``optax`` updates it directly. Gram matrices are one matmul on the MXU.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import struct

Array = jax.Array


def _sq_dists(X: Array, Z: Array, inv_ls: Array) -> Array:
    """Scaled pairwise squared distances via the matmul identity."""
    Xs = X * inv_ls
    Zs = Z * inv_ls
    d2 = (
        jnp.sum(Xs * Xs, axis=-1)[:, None]
        + jnp.sum(Zs * Zs, axis=-1)[None, :]
        - 2.0 * Xs @ Zs.T
    )
    return jnp.maximum(d2, 0.0)


class _KernelOps:
    """Mixin providing composition operators and the parameter interface."""

    def __add__(self, other):
        return SumKernel(parts=(self, other))

    def __mul__(self, other):
        return ProductKernel(parts=(self, other))

    def diagonal(self, X: Array) -> Array:
        return jnp.diagonal(self(X, X))

    # reference-style flat parameter access (kernels.py:84-122); the pytree
    # itself is the canonical parameter container.
    def get_params(self) -> Array:
        leaves = jax.tree.leaves(self)
        return jnp.concatenate([jnp.ravel(p) for p in leaves]) if leaves else jnp.zeros(0)

    def set_params(self, theta: Array):
        leaves, treedef = jax.tree.flatten(self)
        out, i = [], 0
        for leaf in leaves:
            n = leaf.size
            out.append(jnp.reshape(theta[i : i + n], jnp.shape(leaf)))
            i += n
        return jax.tree.unflatten(treedef, out)

    @property
    def n_params(self) -> int:
        return sum(p.size for p in jax.tree.leaves(self))


@struct.dataclass
class SquaredExponentialARD(_KernelOps):
    """k(x,z) = σ² exp(−½ Σ (x_d−z_d)²/ℓ_d²)  (``kernels.py:130-318``)."""

    log_variance: Array
    log_lengthscales: Array

    @classmethod
    def create(cls, n_dims: int, variance: float = 1.0, lengthscale: float = 1.0):
        return cls(
            log_variance=jnp.asarray(jnp.log(variance), jnp.float32),
            log_lengthscales=jnp.full((n_dims,), jnp.log(lengthscale), jnp.float32),
        )

    def __call__(self, X: Array, Z: Array) -> Array:
        inv_ls = jnp.exp(-self.log_lengthscales)
        return jnp.exp(self.log_variance) * jnp.exp(-0.5 * _sq_dists(X, Z, inv_ls))

    def diagonal(self, X: Array) -> Array:
        return jnp.full(X.shape[0], jnp.exp(self.log_variance))


# reference aliases (kernels.py exports RBF / SE_ARD)
RBF = SquaredExponentialARD
SE_ARD = SquaredExponentialARD


@struct.dataclass
class SquaredExponentialIso(_KernelOps):
    """Isotropic SE (``kernels.py:392-474``)."""

    log_variance: Array
    log_lengthscale: Array

    @classmethod
    def create(cls, variance: float = 1.0, lengthscale: float = 1.0):
        return cls(
            log_variance=jnp.asarray(jnp.log(variance), jnp.float32),
            log_lengthscale=jnp.asarray(jnp.log(lengthscale), jnp.float32),
        )

    def __call__(self, X: Array, Z: Array) -> Array:
        inv = jnp.exp(-self.log_lengthscale)
        d2 = _sq_dists(X, Z, jnp.full(X.shape[-1], inv))
        return jnp.exp(self.log_variance) * jnp.exp(-0.5 * d2)

    def diagonal(self, X: Array) -> Array:
        return jnp.full(X.shape[0], jnp.exp(self.log_variance))


@struct.dataclass
class Matern32(_KernelOps):
    """Matérn ν=3/2 with ARD (``kernels.py:482-570``)."""

    log_variance: Array
    log_lengthscales: Array

    @classmethod
    def create(cls, n_dims: int, variance: float = 1.0, lengthscale: float = 1.0):
        return cls(
            log_variance=jnp.asarray(jnp.log(variance), jnp.float32),
            log_lengthscales=jnp.full((n_dims,), jnp.log(lengthscale), jnp.float32),
        )

    def __call__(self, X: Array, Z: Array) -> Array:
        inv_ls = jnp.exp(-self.log_lengthscales)
        r = jnp.sqrt(_sq_dists(X, Z, inv_ls) + 1e-12)
        s = jnp.sqrt(3.0) * r
        return jnp.exp(self.log_variance) * (1.0 + s) * jnp.exp(-s)

    def diagonal(self, X: Array) -> Array:
        return jnp.full(X.shape[0], jnp.exp(self.log_variance))


@struct.dataclass
class Matern52(_KernelOps):
    """Matérn ν=5/2 with ARD (``kernels.py:578-668``)."""

    log_variance: Array
    log_lengthscales: Array

    @classmethod
    def create(cls, n_dims: int, variance: float = 1.0, lengthscale: float = 1.0):
        return cls(
            log_variance=jnp.asarray(jnp.log(variance), jnp.float32),
            log_lengthscales=jnp.full((n_dims,), jnp.log(lengthscale), jnp.float32),
        )

    def __call__(self, X: Array, Z: Array) -> Array:
        inv_ls = jnp.exp(-self.log_lengthscales)
        d2 = _sq_dists(X, Z, inv_ls)
        r = jnp.sqrt(d2 + 1e-12)
        s = jnp.sqrt(5.0) * r
        return jnp.exp(self.log_variance) * (1.0 + s + 5.0 * d2 / 3.0) * jnp.exp(-s)

    def diagonal(self, X: Array) -> Array:
        return jnp.full(X.shape[0], jnp.exp(self.log_variance))


@struct.dataclass
class WhiteNoise(_KernelOps):
    """k(x,z) = σ²·δ(x=z) (``kernels.py:790-844``). Contributes only where
    inputs coincide exactly (the Gram diagonal in practice)."""

    log_variance: Array

    @classmethod
    def create(cls, variance: float = 1e-2):
        return cls(log_variance=jnp.asarray(jnp.log(variance), jnp.float32))

    def __call__(self, X: Array, Z: Array) -> Array:
        same = jnp.all(X[:, None, :] == Z[None, :, :], axis=-1)
        return jnp.exp(self.log_variance) * same.astype(X.dtype)

    def diagonal(self, X: Array) -> Array:
        return jnp.full(X.shape[0], jnp.exp(self.log_variance))


@struct.dataclass
class SumKernel(_KernelOps):
    """k = Σ kᵢ (``kernels.py:676-726``)."""

    parts: Sequence = struct.field(default_factory=tuple)

    def __call__(self, X: Array, Z: Array) -> Array:
        out = self.parts[0](X, Z)
        for k in self.parts[1:]:
            out = out + k(X, Z)
        return out

    def diagonal(self, X: Array) -> Array:
        out = self.parts[0].diagonal(X)
        for k in self.parts[1:]:
            out = out + k.diagonal(X)
        return out


@struct.dataclass
class ProductKernel(_KernelOps):
    """k = Π kᵢ (``kernels.py:734-782``)."""

    parts: Sequence = struct.field(default_factory=tuple)

    def __call__(self, X: Array, Z: Array) -> Array:
        out = self.parts[0](X, Z)
        for k in self.parts[1:]:
            out = out * k(X, Z)
        return out

    def diagonal(self, X: Array) -> Array:
        out = self.parts[0].diagonal(X)
        for k in self.parts[1:]:
            out = out * k.diagonal(X)
        return out


def create_kernel(name: str, n_dims: int, **kw) -> _KernelOps:
    """Factory mirroring ``kernels.py:852-898``."""
    name = name.lower()
    if name in ("rbf", "se", "se_ard", "squared_exponential"):
        return SquaredExponentialARD.create(n_dims, **kw)
    if name in ("se_iso", "rbf_iso"):
        return SquaredExponentialIso.create(**kw)
    if name in ("matern32", "matern_32", "matern3/2"):
        return Matern32.create(n_dims, **kw)
    if name in ("matern52", "matern_52", "matern5/2"):
        return Matern52.create(n_dims, **kw)
    if name in ("white", "white_noise", "noise"):
        return WhiteNoise.create(**kw)
    raise ValueError(f"unknown kernel {name!r}")
