"""Multi-host machinery: jax.distributed bootstrap, ('hosts','chips') mesh,
explicit shard_map+psum campaign statistics, cross-host safe-set gather.

The reference has no distributed machinery at all (SURVEY.md §2.10); this is
the SURVEY §5.8 plan made real:

- :func:`initialize_distributed` — ``jax.distributed.initialize`` bootstrap,
  env-driven and a no-op in single-process runs (so every entry point can
  call it unconditionally).
- :func:`hosts_chips_mesh` — the ``('hosts','chips')`` mesh: scenario shards
  communicate over ICI within a host row first, DCN only across hosts.
- :func:`sharded_campaign_statistics` — campaign statistics as EXPLICIT
  ``shard_map`` + ``psum`` collectives (not compiler-inferred reductions):
  the cross-shard semantics are designed, not left to the partitioner —
  every statistic is a tree of per-shard partial sums + one psum over the
  scenario axes.
- :func:`gather_safe_sets_global` — per-host successful-trajectory exchange
  via ``multihost_utils.process_allgather`` + the deterministic global top-K
  merge (``terminal.safe_set.merge_safe_sets``).
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..experiments.monte_carlo import OUTCOME_NAMES, SUCCESS, wilson_interval
from ..terminal.safe_set import SafeSet, merge_safe_sets

Array = jax.Array


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Bootstrap ``jax.distributed`` for a multi-host pod.

    Arguments default to the standard environment (``JAX_COORDINATOR_ADDRESS``
    / ``JAX_NUM_PROCESSES`` / ``JAX_PROCESS_ID``, or the TPU pod metadata
    that ``jax.distributed.initialize()`` discovers on real pods). Returns
    True when a multi-process runtime was initialized, False for the
    single-process no-op — callers never need to branch.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])
    # NOTE: must NOT probe jax.process_count() here — that initializes the
    # XLA backend and jax.distributed.initialize() then refuses to run (it
    # must precede any backend use). is_initialized() reads the coordination
    # client only. (Bug found by the 2-process test, tests/test_multiprocess.py.)
    if jax.distributed.is_initialized():
        return jax.process_count() > 1
    if coordinator_address is None:
        return False  # single-process run
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return jax.process_count() > 1


def hosts_chips_mesh(devices: Optional[Sequence] = None) -> Mesh:
    """2-D ``('hosts','chips')`` mesh: rows are hosts (local chips contiguous
    → every within-row collective rides ICI), columns are per-host chips.
    In a single-host run the 'hosts' axis has size 1 and the mesh is
    semantically identical to the flat scenario mesh. Scenario arrays shard
    over BOTH axes with ``P(('hosts', 'chips'))``."""
    devs = list(devices) if devices is not None else jax.devices()
    n_hosts = max(jax.process_count(), 1)
    if len(devs) % n_hosts != 0:
        n_hosts = 1  # explicit device subset that ignores process layout
    per_host = len(devs) // n_hosts
    grid = np.asarray(devs).reshape(n_hosts, per_host)
    return Mesh(grid, axis_names=("hosts", "chips"))


def scenario_spec(mesh: Mesh) -> P:
    """PartitionSpec sharding the leading scenario axis over every mesh axis."""
    return P(tuple(mesh.axis_names))


def shard_over_mesh(mesh: Mesh, tree):
    sh = NamedSharding(mesh, scenario_spec(mesh))
    return jax.device_put(tree, sh)


def sharded_campaign_statistics(mesh: Mesh, results: Dict) -> Dict:
    """Campaign statistics with EXPLICIT collectives: each shard reduces its
    local lanes, one ``psum`` over the mesh axes produces replicated global
    sums, and the derived statistics (success rate, Wilson CI, success-only
    moments) are computed from those sums. Matches
    ``experiments.campaign_statistics`` numerically (tested), but the
    communication pattern is pinned down instead of compiler-inferred.
    """
    axes = tuple(mesh.axis_names)
    spec = P(axes)
    n_total = results["outcome"].shape[0]

    def local(outcome, fuel, speed, err, steps):
        ok = outcome == SUCCESS
        okf = ok.astype(jnp.float32)

        def allsum(v):
            return jax.lax.psum(jnp.sum(v), axes)

        sums = {
            "n": allsum(jnp.ones_like(okf)),
            "succ": allsum(okf),
            "fuel": allsum(fuel * okf),
            "fuel2": allsum(fuel * fuel * okf),
            "speed": allsum(speed * okf),
            "err": allsum(err * okf),
            "steps": allsum(steps.astype(jnp.float32) * okf),
        }
        counts = {
            name: allsum((outcome == code).astype(jnp.float32))
            for code, name in OUTCOME_NAMES.items()
        }
        # Derived statistics computed HERE, after the psum, while still
        # inside the shard_map: every output is P()-replicated, so on a
        # multi-process pod no eager op ever touches a non-fully-addressable
        # array (host code just reads an addressable shard).
        denom = jnp.maximum(sums["succ"], 1.0)
        fuel_mean = sums["fuel"] / denom
        fuel_var = jnp.maximum(sums["fuel2"] / denom - fuel_mean**2, 0.0)
        lo, hi = wilson_interval(sums["succ"], sums["n"])
        return {
            "success_rate": sums["succ"] / sums["n"],
            "success_ci": (lo, hi),
            "outcome_counts": counts,
            "fuel_used_mean": fuel_mean,
            "fuel_used_std": jnp.sqrt(fuel_var),
            "landing_speed_mean": sums["speed"] / denom,
            "landing_error_mean": sums["err"] / denom,
            "steps_mean": sums["steps"] / denom,
        }

    stats = jax.jit(
        jax.shard_map(
            local, mesh=mesh,
            in_specs=(spec, spec, spec, spec, spec),
            out_specs=P(),
        )
    )(
        results["outcome"], results["fuel_used"], results["landing_speed"],
        results["landing_error"], results["steps"],
    )
    stats["n_runs"] = n_total
    return stats


def gather_safe_sets_global(local_set: SafeSet, capacity: Optional[int] = None) -> SafeSet:
    """Cross-host safe-set exchange: all-gather every host's set over DCN
    (episode-boundary traffic per SURVEY §5.8) and merge with the
    deterministic top-K prune. Single-process: identity merge."""
    capacity = capacity or local_set.capacity
    if jax.process_count() <= 1:
        return merge_safe_sets([local_set], capacity=capacity)
    from jax.experimental import multihost_utils

    gathered = multihost_utils.process_allgather(
        jax.tree.map(jnp.asarray, local_set)
    )
    n_hosts = jax.process_count()
    shards = [
        jax.tree.map(lambda a: a[i], gathered) for i in range(n_hosts)
    ]
    return merge_safe_sets(shards, capacity=capacity)


def broadcast_from_host0(tree):
    """Replicate host-0's pytree to all hosts (the shared-IC broadcast of
    ``compare_controllers``, monte_carlo.py:700-707). Single-process: identity."""
    if jax.process_count() <= 1:
        return tree
    from jax.experimental import multihost_utils

    return multihost_utils.broadcast_one_to_all(tree)
