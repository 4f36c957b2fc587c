"""Device mesh + sharding helpers for the planner fleet.

The reference has no distributed backend at all (SURVEY.md §2.3): its
"communication" is in-process array copies. Here the inherent parallel axes
become mesh dimensions:

* ``scenario`` — independent MPC rollouts (stochastic scenario batches,
  fleet-scale serving): pure data parallelism, DCN-safe.
* ``vehicle``  — per-vehicle local solves within one scenario; the bar-state
  broadcast becomes an all-gather and the consensus reductions become psums
  over ICI (SURVEY.md §2.3 axes 1/2/5).

Sharding is expressed with ``NamedSharding`` + jit (GSPMD inserts the
collectives); :func:`sharded_batch_step` is the unit the multi-chip dry-run
and the benchmark drive.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def planner_mesh(n_scenario: Optional[int] = None,
                 n_vehicle: int = 1) -> Mesh:
    """Build a (scenario, vehicle) mesh over the available devices.

    ``n_scenario`` defaults to ``len(devices) // n_vehicle``. On one device
    this degenerates to a 1x1 mesh — everything still runs (SURVEY.md §7.6).
    """
    devs = np.array(jax.devices())
    if n_scenario is None:
        n_scenario = max(len(devs) // n_vehicle, 1)
    n = n_scenario * n_vehicle
    mesh_devs = devs[:n].reshape(n_scenario, n_vehicle)
    return Mesh(mesh_devs, axis_names=("scenario", "vehicle"))


def scenario_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis sharding over the scenario mesh dimension."""
    return NamedSharding(mesh, P("scenario"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_scenarios(mesh: Mesh, pytree):
    """Place a scenario-batched pytree (leading axis = scenario) onto the
    mesh, sharded over the scenario axis."""
    sh = scenario_sharding(mesh)
    return jax.tree.map(lambda a: jax.device_put(a, sh), pytree)


def sharded_batch_step(engine, mesh: Mesh):
    """Jit a scenario-batched MPC step of ``engine`` over ``mesh``.

    ``engine`` is a planner with ``_mpc_step_impl(xt, u_warm, step_idx)``
    (e.g. :class:`~dlp_admm_tpu.models.pi_admm.PiAdmmEngine`). Returns a
    function ``step(xts [S, ...], u_warms [S, ...], step_idx)`` with inputs
    and outputs sharded over the scenario axis — pure data parallelism; the
    per-scenario math is replicated over the vehicle mesh dimension. For
    genuine vehicle-axis partitioning (local solves sharded per vehicle,
    bar-state as all_gather, residuals as psum) use
    :func:`~dlp_admm_tpu.parallel.consensus_spmd.make_consensus_spmd_step`.
    One compiled program serves the whole fleet — the TPU-native replacement
    for the reference's per-scenario Python processes.
    """
    sh = scenario_sharding(mesh)
    batched = jax.vmap(engine._mpc_step_impl, in_axes=(0, 0, None))
    return jax.jit(batched, in_shardings=(sh, sh, None), out_shardings=sh)
