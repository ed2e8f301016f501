"""Ruiz equilibration for QP data (modified Ruiz, OSQP-style).

Scales the KKT-block matrix [[P, Aᵀ], [A, 0]] toward unit row/col ∞-norms
with diagonal D (n) and E (m), plus a scalar cost scaling c — the same
preconditioning OSQP applies with ``scaling=k`` iterations
(``/root/reference/src/mpc/osqp_rti.py:60,477``). Pure JAX, fixed iteration
count, vmappable.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .types import QPData

Array = jax.Array

_MIN_SCALE = 1e-4
_MAX_SCALE = 1e4


class Scaling(NamedTuple):
    D: Array  # (n,) primal variable scaling
    E: Array  # (m,) constraint scaling
    c: Array  # () cost scaling


def _safe_limit(s):
    return jnp.clip(s, _MIN_SCALE, _MAX_SCALE)


def ruiz_equilibrate(data: QPData, iters: int = 10) -> tuple[QPData, Scaling]:
    """Return (scaled QPData, Scaling). Scaled problem:

        P̄ = c·D P D,  q̄ = c·D q,  Ā = E A D,  l̄ = E l,  ū = E u

    Recover unscaled solution: x = D x̄, y = c⁻¹ E ȳ.
    """
    P, q, A, l, u = data.P, data.q, data.A, data.l, data.u
    n, m = data.n, data.m

    def body(carry, _):
        P, q, A, l, u, D, E, c = carry
        # column ∞-norms of [[P],[A]] for D; row ∞-norms of A for E
        col_norm = jnp.maximum(
            jnp.max(jnp.abs(P), axis=0), jnp.max(jnp.abs(A), axis=0)
        )
        row_norm = jnp.max(jnp.abs(A), axis=1)
        d = _safe_limit(1.0 / jnp.sqrt(jnp.maximum(col_norm, _MIN_SCALE)))
        e = _safe_limit(1.0 / jnp.sqrt(jnp.maximum(row_norm, _MIN_SCALE)))
        P = d[:, None] * P * d[None, :]
        q = d * q
        A = e[:, None] * A * d[None, :]
        l = e * l
        u = e * u
        # cost scaling: mean column norm of P (plus |q|∞) toward 1
        p_norm = jnp.mean(jnp.max(jnp.abs(P), axis=0))
        gamma = _safe_limit(
            1.0 / jnp.maximum(jnp.maximum(p_norm, jnp.max(jnp.abs(q))), _MIN_SCALE)
        )
        P = gamma * P
        q = gamma * q
        return (P, q, A, l, u, D * d, E * e, c * gamma), None

    D0 = jnp.ones(n, P.dtype)
    E0 = jnp.ones(m, P.dtype)
    c0 = jnp.asarray(1.0, P.dtype)
    (P, q, A, l, u, D, E, c), _ = jax.lax.scan(
        body, (P, q, A, l, u, D0, E0, c0), None, length=iters
    )
    return QPData(P=P, q=q, A=A, l=l, u=u), Scaling(D=D, E=E, c=c)
