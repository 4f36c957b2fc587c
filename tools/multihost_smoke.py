"""Per-process multi-host smoke: run one scenario-sharded PI-ADMM step
collectively across 2 CPU processes (BASELINE.md ">= 2 hosts" row).

Usage (run once per process):
    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=4 \
        python tools/multihost_smoke.py <process_id> <num_processes> <port>
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["JAX_PLATFORMS"] = "cpu"
# run in production dtype (f32) even when launched from the x64 test env
os.environ.pop("JAX_ENABLE_X64", None)
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=4").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# sitecustomize imports jax before this script's env tweaks apply, so the
# env var alone cannot force either flag — set the configs directly
jax.config.update("jax_enable_x64", False)


def main(proc_id: int, n_proc: int, port: int) -> None:
    import jax.numpy as jnp
    import numpy as np

    from dlp_admm_tpu.parallel import multihost

    multihost.initialize(coordinator_address=f"localhost:{port}",
                         num_processes=n_proc, process_id=proc_id)
    assert jax.process_count() == n_proc, jax.process_count()
    mesh = multihost.multihost_planner_mesh(n_vehicle=2)
    assert mesh.shape["scenario"] * mesh.shape["vehicle"] == \
        jax.device_count()

    from dlp_admm_tpu.config import (DualUpdateConfig, PiAdmmConfig,
                                     SolverConfig)
    from dlp_admm_tpu.models.pi_admm import PiAdmmEngine
    from dlp_admm_tpu.parallel.mesh import sharded_batch_step
    from dlp_admm_tpu.scenarios import pi_admm_initial_states

    cfg = PiAdmmConfig(iter_num=3)
    eng = PiAdmmEngine(cfg, DualUpdateConfig(),
                       SolverConfig(qp_iters=30, qp_tol=1e-5),
                       layout="pairwise", dtype=jnp.float32)
    n_scen = mesh.shape["scenario"] * 2
    xt0 = np.asarray(pi_admm_initial_states(cfg), np.float32)
    rng = np.random.default_rng(0)                     # same seed everywhere
    xts = xt0[None] + 0.05 * rng.normal(
        size=(n_scen,) + xt0.shape).astype(np.float32)
    us = np.zeros((n_scen, cfg.num_veh, cfg.horizon), np.float32)
    xts_g, us_g = multihost.make_global_batch(mesh, (xts, us))

    step = sharded_batch_step(eng, mesh)
    xt_next, _, rec = step(xts_g, us_g, jnp.asarray(0, jnp.int32))
    jax.block_until_ready(xt_next)
    local = np.concatenate([np.asarray(s.data)
                            for s in xt_next.addressable_shards])
    assert np.all(np.isfinite(local))
    print(f"MULTIHOST_OK process={proc_id}/{n_proc} "
          f"devices={jax.device_count()} local_scen={local.shape[0]}",
          flush=True)

    # -- part 2: consensus-SPMD flagship step, collectively across the
    # processes (VERDICT r3 next #5). The vehicle axis (all_gather/psum
    # bar-state exchange) lives inside each host's devices; the scenario
    # axis spans both processes, so the jitted shard_map program executes
    # as one multi-process SPMD computation. Every process computes the
    # same single-device reference locally (same seed) and checks the
    # shards it owns against it.
    from jax.sharding import NamedSharding, PartitionSpec as P

    from dlp_admm_tpu.config import ObcaConfig
    from dlp_admm_tpu.models.obca import ConsensusObcaPlanner
    from dlp_admm_tpu.parallel.consensus_spmd import make_consensus_spmd_step

    pl = ConsensusObcaPlanner(
        ObcaConfig(num_veh=2, horizon=5, max_admm_iters=2, rho=100.0),
        scfg=SolverConfig(ip_iters=5, ip_tol=1e-6),
        use_staged=False, edge_mode="joint", dtype=jnp.float32)
    n_scen2 = mesh.shape["scenario"]
    rng2 = np.random.default_rng(1)
    init = np.broadcast_to(np.asarray(pl.refs[:, 0, :]),
                           (n_scen2, 2, 5)).copy()
    init[:, :, :2] += 0.05 * rng2.normal(size=(n_scen2, 2, 2))
    init = init.astype(np.float32)
    bs = pl.create_bar_state()
    bs_np = jax.tree.map(
        lambda a: np.broadcast_to(np.asarray(a), (n_scen2,) + a.shape), bs)

    # single-process reference on this host's devices only
    ref_next, *_ = jax.jit(jax.vmap(pl._mpc_step_impl, in_axes=(0, 0, None)))(
        jnp.asarray(init), jax.tree.map(jnp.asarray, bs_np),
        jnp.asarray(0, jnp.int32))
    ref_next = np.asarray(ref_next)

    sv = NamedSharding(mesh, P("scenario", "vehicle"))

    def globalize(a):
        return jax.make_array_from_callback(a.shape, sv, lambda idx: a[idx])

    init_g = globalize(init)
    bs_g = jax.tree.map(globalize, bs_np)
    spmd_step = make_consensus_spmd_step(pl, mesh)
    next_g, bs_out, iters_g, *_ = spmd_step(init_g, bs_g,
                                            jnp.asarray(0, jnp.int32))
    jax.block_until_ready(next_g)
    for sh in next_g.addressable_shards:
        np.testing.assert_allclose(np.asarray(sh.data), ref_next[sh.index],
                                   atol=5e-4)
    print(f"MULTIHOST_CONSENSUS_OK process={proc_id}/{n_proc} "
          f"local_shards={len(next_g.addressable_shards)}", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]))
