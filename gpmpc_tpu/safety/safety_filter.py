"""Predictive safety filter (Wabersich–Zeilinger) with LQR backup.

TPU-native counterpart of ``/root/reference/src/safety/safety_filter.py``:
the safety check — one step under the candidate u, then N−1 backup-LQR steps,
terminal Lyapunov test V(x_N) ≤ α (``:237-307``) plus immediate constraint
checks (``:309-339``) — and, when unsafe, the minimal intervention
QP min ‖u − u_nom‖² s.t. V(x_N(u)) ≤ α·margin (``:346-458``).

Where the reference builds a CasADi NLP per intervention, here the terminal
Lyapunov constraint is linearized through the rollout by AD and solved on the
shared dense QP solver in a fixed small SCP loop; the gradient-descent
fallback (``:484-531``) exists as ``filter_gradient``. Everything is a pure
function — the filter runs inside the Monte-Carlo scan with masked
interventions (no branching).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
from flax import struct

from ..ops.qp import ADMMConfig, QPData, SOLVED
from ..ops.qp import solve as qp_solve
from .backup_controller import LQRBackupController
from .invariant_sets import EllipsoidalInvariantSet

Array = jax.Array


@struct.dataclass
class SafetyFilterConfig:
    """(mirrors ``SafetyFilterConfig``, ``safety_filter.py:39-68``; N=10)."""

    N: int = struct.field(pytree_node=False, default=10)
    dt: float = 0.1
    alpha_margin: float = 0.9  # V(x_N) ≤ α·margin in the intervention QP
    scp_iterations: int = struct.field(pytree_node=False, default=2)
    soft: bool = struct.field(pytree_node=False, default=True)
    slack_weight: float = 1e4
    u_min: Array = struct.field(default_factory=lambda: jnp.array([0.3, -5.0, -5.0]))
    u_max: Array = struct.field(default_factory=lambda: jnp.array([5.0, 5.0, 5.0]))
    # recovery policy (reference safety_params.yaml:91-98): after
    # ``max_consecutive`` interventions in a row, "switch_to_backup" hands
    # the lane to the backup controller for the rest of the episode (sticky,
    # masked — no branching inside the campaign scan); "continue" keeps
    # filtering forever.
    max_consecutive: int = struct.field(pytree_node=False, default=10)
    after_max: str = struct.field(pytree_node=False, default="continue")


class SafetyFilterResult(NamedTuple):
    """(mirrors ``SafetyFilterResult``, ``safety_filter.py:72-84``)."""

    u: Array
    intervened: Array
    safe: Array
    lyapunov_value: Array
    qp_success: Array


def _backup_rollout_terminal(
    step_fn: Callable, backup: LQRBackupController, x: Array, u: Array, N: int
) -> Array:
    """x_N after [u, backup, backup, …] (``safety_filter.py:278-307``)."""
    x1 = step_fn(x, u)

    def body(xx, _):
        xn = step_fn(xx, backup.control(xx))
        return xn, None

    xN, _ = jax.lax.scan(body, x1, None, length=N - 1)
    return xN


def check_safety(
    step_fn: Callable,
    backup: LQRBackupController,
    invariant: EllipsoidalInvariantSet,
    config: SafetyFilterConfig,
    x: Array,
    u: Array,
    constraint_fn: Optional[Callable[[Array, Array], Array]] = None,
) -> tuple[Array, Array]:
    """(is_safe, V(x_N)) — terminal Lyapunov + immediate constraints."""
    xN = _backup_rollout_terminal(step_fn, backup, x, u, config.N)
    V = invariant.value(xN)
    safe = V <= invariant.alpha
    if constraint_fn is not None:
        safe = safe & jnp.all(constraint_fn(x, u) <= 0.0)
    return safe, V


def filter_control(
    step_fn: Callable,
    backup: LQRBackupController,
    invariant: EllipsoidalInvariantSet,
    config: SafetyFilterConfig,
    x: Array,
    u_nominal: Array,
    admm: Optional[ADMMConfig] = None,
) -> SafetyFilterResult:
    """The full filter: pass u_nominal through when safe, otherwise the
    minimal-intervention QP (``safety_filter.py:184-235,346-458``).

    The QP (decision = u, plus one slack s in soft mode):
        min ‖u − u_nom‖² + w·s²
        s.t. V0 + gᵀ(u − u_lin) ≤ α·margin + s,  u_min ≤ u ≤ u_max,  s ≥ 0
    iterated ``scp_iterations`` times re-linearizing V(x_N(u)) by AD.
    """
    admm = admm or ADMMConfig(max_iter=100, polish=True)
    n_u = u_nominal.shape[0]
    safe, V0_nom = check_safety(step_fn, backup, invariant, config, x, u_nominal)

    VN = lambda u: invariant.value(
        _backup_rollout_terminal(step_fn, backup, x, u, config.N)
    )
    target = config.alpha_margin * invariant.alpha

    def scp_body(carry, _):
        u_lin, _ = carry
        V0, g = jax.value_and_grad(VN)(u_lin)
        # decision z = [u, s]
        nz = n_u + 1
        P = jnp.eye(nz).at[n_u, n_u].set(config.slack_weight)
        q = jnp.concatenate([-u_nominal, jnp.zeros(1)])
        A_rows = jnp.zeros((2 + nz, nz))
        A_rows = A_rows.at[0, :n_u].set(g).at[0, n_u].set(-1.0)  # V lin ≤ target + s
        A_rows = A_rows.at[1, n_u].set(1.0)  # s ≥ 0
        A_rows = A_rows.at[2:, :].set(jnp.eye(nz))
        big = jnp.asarray(1e20)
        slack_hi = big if config.soft else 0.0
        l = jnp.concatenate(
            [jnp.array([-big, 0.0]), config.u_min, jnp.zeros(1)]
        )
        uu = jnp.concatenate(
            [jnp.array([target - V0 + g @ u_lin, slack_hi]),
             config.u_max, jnp.full(1, slack_hi)]
        )
        data = QPData(P=P, q=q, A=A_rows, l=l, u=uu)
        sol = qp_solve(data, jnp.concatenate([u_lin, jnp.zeros(1)]), None, admm)
        ok = sol.status == SOLVED
        u_new = jnp.where(ok, sol.x[:n_u], u_lin)
        return (u_new, ok), None

    (u_qp, qp_ok), _ = jax.lax.scan(
        scp_body, (u_nominal, jnp.asarray(True)), None, length=config.scp_iterations
    )
    # fall back to the pure backup control if the QP failed
    u_fallback = backup.control(x)
    u_filtered = jnp.where(qp_ok, u_qp, u_fallback)
    u_out = jnp.where(safe, u_nominal, u_filtered)

    return SafetyFilterResult(
        u=u_out,
        intervened=~safe,
        safe=safe,
        lyapunov_value=V0_nom,
        qp_success=qp_ok,
    )


def filter_gradient(
    step_fn: Callable,
    backup: LQRBackupController,
    invariant: EllipsoidalInvariantSet,
    config: SafetyFilterConfig,
    x: Array,
    u_nominal: Array,
    steps: int = 20,
    lr: float = 0.1,
) -> SafetyFilterResult:
    """Projected-gradient fallback without the QP (``safety_filter.py:484-531``):
    descend V(x_N(u)) until under the margin, projecting into the thrust box."""
    safe, V0 = check_safety(step_fn, backup, invariant, config, x, u_nominal)
    Vx = lambda u: invariant.value(
        _backup_rollout_terminal(step_fn, backup, x, u, config.N)
    )
    target = config.alpha_margin * invariant.alpha

    def body(u, _):
        V, g = jax.value_and_grad(Vx)(u)
        u_new = jnp.clip(u - lr * g, config.u_min, config.u_max)
        return jnp.where(V > target, u_new, u), None

    u_safe, _ = jax.lax.scan(body, u_nominal, None, length=steps)
    u_out = jnp.where(safe, u_nominal, u_safe)
    return SafetyFilterResult(
        u=u_out, intervened=~safe, safe=safe, lyapunov_value=V0,
        qp_success=jnp.asarray(True),
    )


def simulate_filtered(
    step_fn: Callable,
    backup: LQRBackupController,
    invariant: EllipsoidalInvariantSet,
    config: SafetyFilterConfig,
    controller_fn: Callable[[Array, Array], Array],
    x0: Array,
    n_steps: int,
) -> dict:
    """Closed loop with the filter applied every cycle
    (``safety_filter.py:533-566``)."""

    def body(x, k):
        u_nom = controller_fn(x, k)
        res = filter_control(step_fn, backup, invariant, config, x, u_nom)
        x_next = step_fn(x, res.u)
        return x_next, (x_next, res.u, res.intervened)

    _, (X, U, interventions) = jax.lax.scan(body, x0, jnp.arange(n_steps))
    return {
        "X": jnp.concatenate([x0[None], X], axis=0),
        "U": U,
        "interventions": interventions,
        "n_interventions": jnp.sum(interventions),
    }


def make_filtered_controller(
    controller_init,
    controller_step,
    step_fn: Callable,
    backup: LQRBackupController,
    invariant: EllipsoidalInvariantSet,
    config: SafetyFilterConfig,
    admm: Optional[ADMMConfig] = None,
    half_step: int = 10**9,
    step_fn_from_inner: Optional[Callable] = None,
):
    """Compose any ``(controller_init, controller_step)`` pair with the
    predictive safety filter so it can run *inside* a vmapped Monte-Carlo
    campaign (the reference applies the filter per-step inside MC episodes,
    ``monte_carlo.py:455-543``).

    The wrapped controller state is ``(inner_state, n_interventions,
    consecutive, switched)``; pass :func:`filtered_controller_info` as
    ``run_campaign``'s ``cstate_info`` to surface per-lane intervention
    counts (and backup switches) in the results.

    Recovery policy (``config.after_max``, reference
    ``safety_params.yaml:91-98``): with ``"switch_to_backup"``, a lane whose
    filter intervened ``config.max_consecutive`` steps in a row flies the
    backup controller for the rest of the episode (a lane the filter has to
    override every step is one whose nominal controller is fighting the
    recoverability certificate — stop consulting it). ``"continue"``
    (default) filters forever.

    ``step_fn_from_inner(inner_state) -> step_fn`` optionally derives the
    filter's recoverability model from the (possibly learning) inner
    controller's state — e.g. nominal + the lane's own learned GP mean — so
    the filter's certificate improves WITH the model instead of staying
    pinned to the nominal+pad model while the controller outgrows it (the
    reference's filter likewise consumes the learner's current model,
    ``online_learner.py:592-601``). None keeps the static ``step_fn``.
    """
    if config.after_max not in ("continue", "switch_to_backup"):
        raise ValueError(
            f"after_max={config.after_max!r}; expected 'continue' or "
            "'switch_to_backup'"
        )
    switch = config.after_max == "switch_to_backup"

    def finit(x0):
        return (controller_init(x0), jnp.asarray(0, jnp.int32),
                jnp.asarray(0, jnp.int32), jnp.asarray(0, jnp.int32),
                jnp.asarray(False))

    def fstep(state, x, k):
        inner, n_int, n_early, consec, switched = state
        u_nom, inner2 = controller_step(inner, x, k)
        sf = step_fn if step_fn_from_inner is None else step_fn_from_inner(inner2)
        res = filter_control(sf, backup, invariant, config, x, u_nom, admm)
        # don't count post-touchdown frozen lanes (the campaign scan keeps
        # stepping a landed lane's controller on its frozen ground state)
        in_flight = x[1] > 0.15
        hit = (res.intervened & in_flight).astype(jnp.int32)
        early = hit * (k < half_step).astype(jnp.int32)
        consec = jnp.where(res.intervened & in_flight, consec + 1, 0)
        if switch:
            switched = switched | (consec >= config.max_consecutive)
            u_bak = jnp.clip(backup.control(x), config.u_min, config.u_max)
            u = jnp.where(switched, u_bak, res.u)
        else:
            u = res.u
        return u, (inner2, n_int + hit, n_early + early, consec, switched)

    return finit, fstep


def filtered_controller_info(state) -> dict:
    """``cstate_info`` extractor for campaigns over a filtered controller.
    ``n_interventions_early`` counts hits at k < the factory's ``half_step``
    — the early/late split is the within-episode learning trace (an online
    learner should intervene less in the second half)."""
    _, n_int, n_early, _, switched = state
    return {"n_interventions": n_int, "n_interventions_early": n_early,
            "switched_to_backup": switched}


@struct.dataclass
class SimpleSafetyFilter:
    """Magnitude clamp only (``safety_filter.py:569-601``)."""

    u_min: Array
    u_max: Array

    def filter(self, x: Array, u: Array) -> SafetyFilterResult:
        u_clamped = jnp.clip(u, self.u_min, self.u_max)
        changed = jnp.any(jnp.abs(u_clamped - u) > 1e-9)
        return SafetyFilterResult(
            u=u_clamped, intervened=changed, safe=~changed,
            lyapunov_value=jnp.asarray(0.0), qp_success=jnp.asarray(True),
        )
