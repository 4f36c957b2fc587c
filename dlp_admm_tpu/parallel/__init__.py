"""Mesh + sharding layer: scenario/vehicle axes over TPU slices."""
from .consensus_spmd import (  # noqa: F401
    make_consensus_spmd_step,
    run_scenario_batch,
)
from .mesh import (  # noqa: F401
    planner_mesh,
    replicated,
    scenario_sharding,
    shard_scenarios,
    sharded_batch_step,
)
