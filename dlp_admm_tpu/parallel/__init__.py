"""Mesh + sharding layer: scenario/vehicle axes over TPU slices."""
from .mesh import (  # noqa: F401
    planner_mesh,
    replicated,
    scenario_sharding,
    shard_scenarios,
    sharded_batch_step,
)
