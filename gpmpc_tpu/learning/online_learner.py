"""Online learning orchestration: episode lifecycle, periodic GP refits,
safe-set expansion, hyperparameter retuning.

TPU-native counterpart of ``/root/reference/src/learning/online_learner.py``:
episode lifecycle with callbacks (``:146-168``), periodic in-episode
incremental GP updates (``:193-196, 330-355``), end-of-episode batch refit
with diverse subset selection (``:357-390``), safe-set expansion on success
(``:392-435``), hyperparameter retraining every ``retrain_every`` episodes
(``:239-241, 437-459``), a GP activation gate after ``min_episodes``
(``:244-248``), statistics (``:461-526``) and the full closed-loop
``IterativeLearningRunner`` (``:529-677``).

Episodes run as jitted scans; the between-episode bookkeeping (refit,
retune, safe-set insertion) is host-orchestrated over pure jitted pieces —
the natural split for a TPU training loop.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from ..gp.structured_gp import Simple3DoFGP, StructuredGPConfig
from ..terminal.safe_set import SafeSet
from .data_manager import DataManager
from .hyperparameter_tuner import HyperparameterConfig, HyperparameterTuner
from .novelty_selector import NoveltyConfig, NoveltySelector, select_diverse

Array = jax.Array


@dataclass
class OnlineLearningConfig:
    """(mirrors ``OnlineLearningConfig``, ``online_learner.py:36-63``)."""

    buffer_capacity: int = 1024
    batch_refit_points: int = 256
    update_interval: int = 10  # in-episode incremental update cadence
    retrain_every: int = 5  # hyperparameter retune cadence (episodes)
    min_episodes_before_gp: int = 1  # GP activation gate
    residual_mode: str = "velocity"
    dt: float = 0.1
    novelty: NoveltyConfig = field(default_factory=NoveltyConfig)
    hyper: HyperparameterConfig = field(default_factory=HyperparameterConfig)
    gp: StructuredGPConfig = field(default_factory=StructuredGPConfig)


@dataclass
class LearningStatistics:
    """(mirrors ``LearningStatistics``, ``online_learner.py:66-79``)."""

    episodes: int = 0
    successes: int = 0
    episode_costs: list = field(default_factory=list)
    episode_outcomes: list = field(default_factory=list)
    gp_refits: int = 0
    hyper_retunes: int = 0

    @property
    def success_rate(self) -> float:
        return self.successes / max(self.episodes, 1)


class OnlineLearner:
    """Host-side orchestrator over jitted pieces."""

    def __init__(
        self,
        step_fn: Callable[[Array, Array], Array],
        config: Optional[OnlineLearningConfig] = None,
        safe_set: Optional[SafeSet] = None,
        n_x: int = 7,
        n_u: int = 3,
    ):
        self.config = config or OnlineLearningConfig()
        self.step_fn = step_fn
        self.n_x, self.n_u = n_x, n_u
        self.data = DataManager.create(
            self.config.buffer_capacity, n_x, n_u,
            dt=self.config.dt, residual_mode=self.config.residual_mode,
        )
        self.gp = Simple3DoFGP.create(self.config.gp) if n_x == 7 else None
        self.safe_set = safe_set
        self.novelty = NoveltySelector(self.config.novelty)
        self.tuner = HyperparameterTuner(self.config.hyper)
        self.stats = LearningStatistics()
        self._key = jax.random.PRNGKey(0)

    # -- episode lifecycle ---------------------------------------------------

    def add_transition(self, x, u, x_next):
        self.data = self.data.add_transition(
            self.step_fn, x, u, x_next, jnp.asarray(self.stats.episodes, jnp.int32)
        )

    def gp_active(self) -> bool:
        """Activation gate (``online_learner.py:244-248``)."""
        return (
            self.gp is not None
            and self.gp.is_fitted
            and self.stats.episodes >= self.config.min_episodes_before_gp
        )

    def predict_residual(self, x, u):
        if not self.gp_active():
            return jnp.zeros(self.n_x), jnp.zeros(3)
        mean, var = self.gp.predict(x, u)
        return Simple3DoFGP.lift_residual(mean, self.n_x), var

    def end_episode(
        self,
        succeeded: bool,
        episode_cost: float,
        trajectory: Optional[tuple] = None,  # (X, U, stage_costs) for the safe set
    ):
        """End-of-episode bookkeeping (``online_learner.py:198-248``)."""
        ep = self.stats.episodes
        self.data = self.data.end_episode(jnp.asarray(ep, jnp.int32), jnp.asarray(succeeded))
        self.stats.episodes += 1
        self.stats.successes += int(succeeded)
        self.stats.episode_costs.append(float(episode_cost))
        self.stats.episode_outcomes.append(bool(succeeded))

        # safe-set expansion on success (:392-435)
        if succeeded and self.safe_set is not None and trajectory is not None:
            X, U, costs = trajectory
            self.safe_set = self.safe_set.add_trajectory(X, U, costs)

        # batch GP refit with diverse subset selection (:357-390)
        self._batch_gp_update()

        # periodic hyperparameter retuning (:239-241)
        if self.gp_active() and self.tuner.should_retrain(self.stats.episodes):
            self._retrain_hyperparameters()

    # -- GP updates ----------------------------------------------------------

    def _batch_gp_update(self):
        store = self.data.store
        n = int(store.count)
        if n < 8 or self.gp is None:
            return
        self._key, k1, k2 = jax.random.split(self._key, 3)
        m = self.data.training_mask()
        k_sel = min(self.config.batch_refit_points, self.config.gp.max_data_points)
        idx = select_diverse(k1, store.X, min(k_sel, n), mask=m)
        gp = Simple3DoFGP.create(self.config.gp)
        gp = gp.add_data_batch(store.X[idx], store.U[idx], store.R[idx])
        self.gp = gp.fit(k2)
        self.stats.gp_refits += 1

    def _retrain_hyperparameters(self):
        """(``online_learner.py:437-459``) — retune the velocity GP's kernels
        against the sparse objective, then refit factors."""
        g = self.gp.gp
        buf = self.gp.buffer

        def tune_one(kernel, y, ln):
            k_new, ln_new, _ = self.tuner.tune(
                kernel, g.Z, buf.X, y, buf.mask, ln, method=g.method
            )
            return k_new, ln_new

        kernels, log_noise = jax.vmap(tune_one)(g.kernels, buf.Y.T, g.log_noise)
        from ..gp.sparse_gp import refit_sparse_multi

        self.gp = self.gp.replace(
            gp=refit_sparse_multi(
                kernels, g.Z, buf.X, buf.Y.T, buf.mask, log_noise, g.method
            )
        )
        self.stats.hyper_retunes += 1

    # -- stats / persistence (online_learner.py:461-526) ---------------------

    def get_statistics(self) -> dict:
        return {
            "episodes": self.stats.episodes,
            "successes": self.stats.successes,
            "success_rate": self.stats.success_rate,
            "gp_refits": self.stats.gp_refits,
            "hyper_retunes": self.stats.hyper_retunes,
            "buffer_count": int(self.data.store.count),
            "episode_costs": list(self.stats.episode_costs),
        }

    def save(self, directory: str):
        import os

        os.makedirs(directory, exist_ok=True)
        self.data.save(os.path.join(directory, "data.npz"))
        if self.gp is not None and self.gp.is_fitted:
            self.gp.save(os.path.join(directory, "gp.npz"))
        if self.safe_set is not None:
            self.safe_set.save(os.path.join(directory, "safe_set.npz"))

    def load(self, directory: str):
        import os

        self.data = self.data.load(os.path.join(directory, "data.npz"))
        gp_path = os.path.join(directory, "gp.npz")
        if self.gp is not None and os.path.exists(gp_path) and self.gp.is_fitted:
            self.gp = self.gp.load(gp_path)
        ss_path = os.path.join(directory, "safe_set.npz")
        if self.safe_set is not None and os.path.exists(ss_path):
            self.safe_set = self.safe_set.load(ss_path)


class IterativeLearningRunner:
    """Full closed loop: controller → (optional safety filter) → plant →
    record → episode end (``online_learner.py:529-677``).

    ``controller_factory(learner) → (cinit, cstep)`` lets each episode's
    controller see the freshest GP.
    """

    def __init__(
        self,
        learner: OnlineLearner,
        plant_step: Callable[[Array, Array], Array],
        controller_factory: Callable,
        safety_filter: Optional[Callable[[Array, Array], Array]] = None,
        landing_altitude: float = 0.1,
        max_steps: int = 150,
        success_speed: float = 2.0,
    ):
        self.learner = learner
        self.plant_step = plant_step
        self.controller_factory = controller_factory
        self.safety_filter = safety_filter
        self.landing_altitude = landing_altitude
        self.max_steps = max_steps
        self.success_speed = success_speed

    def run_episode(self, x0: Array) -> dict:
        cinit, cstep = self.controller_factory(self.learner)
        sf = self.safety_filter

        def body(carry, k):
            x, cstate, landed = carry
            u, cstate = cstep(cstate, x, k)
            if sf is not None:
                u = sf(x, u)
            x_next = self.plant_step(x, u)
            x_out = jnp.where(landed, x, x_next)
            return (x_out, cstate, landed | (x_next[1] < self.landing_altitude)), (
                x, u, x_out
            )

        run = jax.jit(lambda x: jax.lax.scan(
            body, (x, cinit(x), jnp.asarray(False)), jnp.arange(self.max_steps)
        ))
        (x_f, _, landed), (X, U, X_next) = run(x0)

        # record all real transitions (pre-touchdown)
        moved = jnp.any(jnp.abs(X_next - X) > 1e-12, axis=1)
        for i in range(self.max_steps):
            if bool(moved[i]):
                self.learner.add_transition(X[i], U[i], X_next[i])

        speed = float(jnp.linalg.norm(x_f[4:7]))
        success = bool(landed) and speed < self.success_speed
        cost = float(jnp.sum(jnp.linalg.norm(U, axis=1)))
        self.learner.end_episode(success, cost)
        return {
            "x_final": x_f,
            "landed": bool(landed),
            "success": success,
            "touchdown_speed": speed,
            "cost": cost,
        }

    def run(self, x0s: Array) -> list:
        return [self.run_episode(x0s[i]) for i in range(x0s.shape[0])]
