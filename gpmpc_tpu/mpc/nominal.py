"""Nominal (GP-free) MPC — the reference's NLP MPC surface.

TPU-native counterpart of ``/root/reference/src/mpc/nominal_mpc.py``: the
reference builds a CasADi multiple-shooting NLP and hands it to IPOPT
(``:263-447``); here the same problem is the SCP loop of
``gp_mpc.gp_mpc_solve`` with the GP identically zero — linearize, trust
region QP, repeat — which converges to the same KKT points for these
problems. ``MPCSolution`` mirrors the reference result type (incl. the
``u0`` property, ``nominal_mpc.py:79-82``); the closed-loop runner mirrors
``simulate_closed_loop`` (``:449-529``).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from .gp_mpc import GPMPCConfig, GPMPCState, gp_mpc_init, gp_mpc_solve


Array = jax.Array


class MPCSolution(NamedTuple):
    """(mirrors ``MPCSolution``, ``nominal_mpc.py:60-82``)."""

    success: Array
    X_opt: Array
    U_opt: Array
    cost: Array
    iterations: Array

    @property
    def u0(self) -> Array:
        return self.U_opt[0]


# reference-parity config name: an MPCConfig is the RTI base + SCP settings
MPCConfig = GPMPCConfig


class NominalMPC:
    """SCP NLP MPC (works for 7- and 14-state models — pass the matching
    RTIConfig, e.g. ``rti6dof.rti_config_6dof()`` for the quaternion model).
    """

    def __init__(
        self,
        step_fn: Callable[[Array, Array], Array],
        config: Optional[GPMPCConfig] = None,
    ):
        self.step_fn = step_fn
        self.config = config or GPMPCConfig(tighten=False)
        n_x = self.config.base.n_x
        self._zero_mean = lambda x, u: jnp.zeros(n_x)
        self._zero_var = lambda x, u: jnp.zeros(6 if n_x >= 14 else 3)
        self._state: Optional[GPMPCState] = None
        self._solve = jax.jit(
            lambda st, x: gp_mpc_solve(
                self.step_fn, self._zero_mean, self._zero_var, self.config, st, x
            )
        )

    def setup(self, x0: Array, x_target: Array) -> None:
        self._state = gp_mpc_init(
            self.config, x0, x_target,
            step_fn=self.step_fn if self.config.warm_kkt else None,
        )

    def solve(self, x0: Array, x_target: Optional[Array] = None) -> MPCSolution:
        """Receding-horizon solve with internal warm-start carry."""
        if self._state is None:
            if x_target is None:
                raise ValueError("call setup() or pass x_target on first solve")
            self.setup(x0, x_target)
        if x_target is not None:
            self._state = self._state.replace(
                x_ref=jnp.tile(x_target, (self.config.base.N + 1, 1))
            )
        sol, self._state = self._solve(self._state, x0)
        return MPCSolution(
            success=sol.success,
            X_opt=sol.X_opt,
            U_opt=sol.U_opt,
            cost=sol.cost,
            iterations=sol.scp_iters,
        )

    def simulate_closed_loop(
        self,
        x0: Array,
        x_target: Array,
        n_steps: int,
        landing_altitude: float = 0.1,
        plant_step: Optional[Callable] = None,
    ) -> dict:
        """Closed loop with landing termination (``nominal_mpc.py:449-529``)."""
        plant = plant_step or self.step_fn
        self.setup(x0, x_target)
        solve = self._solve

        def body(carry, _):
            x, st, landed = carry
            sol, st = gp_mpc_solve(
                self.step_fn, self._zero_mean, self._zero_var, self.config, st, x
            )
            x_next = jnp.where(landed, x, plant(x, sol.u0))
            return (x_next, st, landed | (x_next[1] < landing_altitude)), (
                x_next, sol.u0
            )

        run = jax.jit(
            lambda x, st: jax.lax.scan(
                body, (x, st, jnp.asarray(False)), None, length=n_steps
            )
        )
        (x_f, _, landed), (X, U) = run(x0, self._state)
        return {
            "X": jnp.concatenate([x0[None], X], axis=0),
            "U": U,
            "x_final": x_f,
            "landed": landed,
        }


class NominalMPC3DoF(NominalMPC):
    """Name-parity 3-DoF variant (``nominal_mpc.py:542-679``) — the default
    GPMPCConfig already carries the reference's 3-DoF cost/bounds."""


def make_nominal_mpc_controller(step_fn, config, x_target,
                                reference_fn=None, ref_horizon: int = 100):
    """(cinit, cstep) Monte-Carlo adapter (``NominalMPCWrapper`` parity)."""
    from .gp_mpc import make_gp_mpc_controller

    n_x = config.base.n_x
    zero_mean = lambda x, u: jnp.zeros(n_x)
    zero_var = lambda x, u: jnp.zeros(6 if n_x >= 14 else 3)
    return make_gp_mpc_controller(
        step_fn, zero_mean, zero_var, config, x_target,
        reference_fn=reference_fn, ref_horizon=ref_horizon,
    )
