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
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=4").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


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


if __name__ == "__main__":
    main(int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]))
