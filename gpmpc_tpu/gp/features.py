"""Physics-informed feature extraction for GP residual models.

TPU-native counterpart of ``/root/reference/src/gp/features.py``: exponential
atmosphere (``:44-63``), 13-dim translational features (``:149-270``), 12-dim
rotational features (``:273-365``), 11-dim 3-DoF features (``:368-444``), and
the combined extractor (``:447-491``). The reference's Python-loop batch path
(``:129-146``) becomes a plain ``vmap``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from ..dynamics.rocket6dof import dcm_from_quaternion

Array = jax.Array

TRANSLATIONAL_DIM = 13
ROTATIONAL_DIM = 12
SIMPLE3DOF_DIM = 11


@struct.dataclass
class AtmosphereModel:
    """ρ(h) = ρ₀ e^(−h/H) (``features.py:44-63``)."""

    rho0: float = 1.0
    scale_height: float = 10.0

    def density(self, h: Array) -> Array:
        return self.rho0 * jnp.exp(-jnp.maximum(h, 0.0) / self.scale_height)


def translational_features(x: Array, u: Array, atmosphere: AtmosphereModel) -> Array:
    """[v_I(3), |v|, q_dyn, α, β, T_B(3), |T|, h, ρ] — 13-dim
    (``features.py:149-270``). Angles of attack/sideslip from body velocity."""
    h = x[1]
    v_I = x[4:7]
    q = x[7:11]
    vmag = jnp.linalg.norm(v_I)
    rho = atmosphere.density(h)
    q_dyn = 0.5 * rho * vmag**2

    C_IB = dcm_from_quaternion(q)
    v_B = C_IB.T @ v_I
    # angle of attack about body x (long axis): α from v_B z/x, β from y/x
    alpha = jnp.arctan2(v_B[2], jnp.maximum(jnp.abs(v_B[0]), 1e-8) * jnp.sign(v_B[0] + 1e-12))
    beta = jnp.arcsin(jnp.clip(v_B[1] / jnp.maximum(vmag, 1e-8), -1.0, 1.0))

    T_mag = jnp.linalg.norm(u)
    return jnp.concatenate(
        [v_I, jnp.array([vmag, q_dyn, alpha, beta]), u, jnp.array([T_mag, h, rho])]
    )


def rotational_features(x: Array, u: Array, atmosphere: AtmosphereModel) -> Array:
    """[ω_B(3), |ω|, T_B(3), v_B(3), |v|, q_dyn] — 12-dim (``features.py:273-365``)."""
    v_I = x[4:7]
    q = x[7:11]
    omega = x[11:14]
    vmag = jnp.linalg.norm(v_I)
    rho = atmosphere.density(x[1])
    q_dyn = 0.5 * rho * vmag**2
    C_IB = dcm_from_quaternion(q)
    v_B = C_IB.T @ v_I
    wmag = jnp.linalg.norm(omega)
    return jnp.concatenate(
        [omega, wmag[None], u, v_B, jnp.array([vmag, q_dyn])]
    )


def simple_3dof_features(x: Array, u: Array, atmosphere: AtmosphereModel) -> Array:
    """[v(3), |v|, T(3), |T|, h, ρ, m] — 11-dim (``features.py:368-444``)."""
    v = x[4:7]
    vmag = jnp.linalg.norm(v)
    T_mag = jnp.linalg.norm(u)
    rho = atmosphere.density(x[1])
    return jnp.concatenate(
        [v, vmag[None], u, jnp.array([T_mag, x[1], rho, x[0]])]
    )


def combined_features(x: Array, u: Array, atmosphere: AtmosphereModel) -> Array:
    """Concatenated translational+rotational — 25-dim (``features.py:447-491``)."""
    return jnp.concatenate(
        [translational_features(x, u, atmosphere), rotational_features(x, u, atmosphere)]
    )


@struct.dataclass
class TranslationalFeatureExtractor:
    atmosphere: AtmosphereModel = struct.field(default_factory=AtmosphereModel)
    n_features: int = struct.field(pytree_node=False, default=TRANSLATIONAL_DIM)

    def extract(self, x: Array, u: Array) -> Array:
        return translational_features(x, u, self.atmosphere)

    def extract_batch(self, X: Array, U: Array) -> Array:
        return jax.vmap(self.extract)(X, U)


@struct.dataclass
class RotationalFeatureExtractor:
    atmosphere: AtmosphereModel = struct.field(default_factory=AtmosphereModel)
    n_features: int = struct.field(pytree_node=False, default=ROTATIONAL_DIM)

    def extract(self, x: Array, u: Array) -> Array:
        return rotational_features(x, u, self.atmosphere)

    def extract_batch(self, X: Array, U: Array) -> Array:
        return jax.vmap(self.extract)(X, U)


@struct.dataclass
class Simple3DoFFeatureExtractor:
    atmosphere: AtmosphereModel = struct.field(default_factory=AtmosphereModel)
    n_features: int = struct.field(pytree_node=False, default=SIMPLE3DOF_DIM)

    def extract(self, x: Array, u: Array) -> Array:
        return simple_3dof_features(x, u, self.atmosphere)

    def extract_batch(self, X: Array, U: Array) -> Array:
        return jax.vmap(self.extract)(X, U)


@struct.dataclass
class CombinedFeatureExtractor:
    atmosphere: AtmosphereModel = struct.field(default_factory=AtmosphereModel)
    n_features: int = struct.field(
        pytree_node=False, default=TRANSLATIONAL_DIM + ROTATIONAL_DIM
    )

    def extract(self, x: Array, u: Array) -> Array:
        return combined_features(x, u, self.atmosphere)

    def extract_batch(self, X: Array, U: Array) -> Array:
        return jax.vmap(self.extract)(X, U)
