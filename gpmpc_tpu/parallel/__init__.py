"""Parallel/distributed layer: device meshes, sharded campaigns, collectives
(SURVEY.md §2.10 / §5.8 — capabilities absent from the reference)."""

from .mesh import (
    gather_safe_sets,
    per_host_keys,
    replicate,
    run_sharded_campaign,
    scenario_mesh,
    shard_scenarios,
)

__all__ = [
    "gather_safe_sets",
    "per_host_keys",
    "replicate",
    "run_sharded_campaign",
    "scenario_mesh",
    "shard_scenarios",
]
