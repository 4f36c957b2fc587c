"""Mesh + sharding layer: scenario/vehicle axes over TPU slices."""
from .consensus_spmd import make_consensus_spmd_step  # noqa: F401
from .mesh import (  # noqa: F401
    planner_mesh,
    replicated,
    scenario_sharding,
    shard_scenarios,
    sharded_batch_step,
)
