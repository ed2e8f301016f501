"""Device meshes and sharded Monte-Carlo campaigns.

The reference has no distributed machinery at all (SURVEY.md §2.10 — its
``n_workers`` parameter runs sequentially, ``monte_carlo.py:617-631``). This
module is the capability set that replaces/absorbs it:

- scenario batch engine: the campaign vmaps over scenarios (DP analogue);
- multi-host sharding: the scenario axis shards over a
  ``Mesh(('hosts','chips'))`` (flattened to one ``'scenarios'`` axis here —
  lay hosts×chips out contiguously so collectives ride ICI);
- collective reductions: campaign statistics are lowered to ``psum``-style
  cross-device reductions by XLA under jit with sharded inputs;
- safe-set global aggregation: per-shard sets are gathered and merged with
  the deterministic top-K prune (``terminal.safe_set.merge_safe_sets``).
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..experiments.monte_carlo import (
    LandingCriteria,
    SimulationConfig,
    campaign_statistics,
    run_campaign,
)
from ..terminal.safe_set import SafeSet, merge_safe_sets

Array = jax.Array


def scenario_mesh(devices: Optional[Sequence] = None) -> Mesh:
    """1-D mesh over all (or given) devices with a ``'scenarios'`` axis.
    On a multi-host pod, pass ``jax.devices()`` after ``jax.distributed``
    initialization — device order keeps each host's chips contiguous so the
    scenario shards communicate over ICI first."""
    devs = np.asarray(devices if devices is not None else jax.devices())
    return Mesh(devs, axis_names=("scenarios",))


def shard_scenarios(mesh: Mesh, tree):
    """Place a pytree with a leading scenario axis onto the mesh."""
    sh = NamedSharding(mesh, P("scenarios"))
    return jax.device_put(tree, sh)


def replicate(mesh: Mesh, tree):
    sh = NamedSharding(mesh, P())
    return jax.device_put(tree, sh)


def run_sharded_campaign(
    mesh: Mesh,
    controller_init: Callable,
    controller_step: Callable,
    plant_step: Callable,
    x0s: Array,
    sim: SimulationConfig,
    criteria: Optional[LandingCriteria] = None,
) -> Dict:
    """The distributed Monte-Carlo entry: shard ICs over the mesh, run the
    vmapped campaign under jit (XLA keeps every per-scenario computation
    local to its shard and inserts collectives only for the statistics
    reductions), and return *replicated* aggregate statistics.

    Batch size must divide the mesh size. Works identically on one chip, a
    multi-chip host, and a multi-host pod (and on the CPU test mesh via
    ``--xla_force_host_platform_device_count``).
    """
    criteria = criteria or LandingCriteria()
    n = x0s.shape[0]
    n_dev = mesh.devices.size
    if n % n_dev != 0:
        raise ValueError(f"batch {n} must divide the mesh size {n_dev}")

    x0s = shard_scenarios(mesh, x0s)

    @jax.jit
    def campaign(x0s):
        res = run_campaign(
            controller_init, controller_step, plant_step, x0s, sim, criteria
        )
        return res, campaign_statistics(res)

    with mesh:
        results, stats = campaign(x0s)
    return {"results": results, "stats": stats}


def gather_safe_sets(shard_sets: Sequence[SafeSet], capacity: int) -> SafeSet:
    """Host-side all-gather analogue: merge per-shard safe sets with the
    deterministic global top-K prune (SURVEY.md §2.10 'safe-set global
    aggregation'). On a real pod each host contributes its local set via
    ``jax.experimental.multihost_utils`` gathers before this merge."""
    return merge_safe_sets(list(shard_sets), capacity=capacity)


def per_host_keys(base_key: Array, n_hosts: int) -> Array:
    """Deterministic per-host PRNG folds (the shared-IC broadcast device,
    ``monte_carlo.py:700-707`` → fold_in per host)."""
    return jax.vmap(lambda i: jax.random.fold_in(base_key, i))(jnp.arange(n_hosts))
