"""TPU fleet demo: the consensus-OBCA flagship on-device, single run and
scenario batch.

The round-5 production configuration: the full 42-step overtaking run in
f32 on the TPU (equilibrated staged IP + annealed local prox — see
PARITY.md "Flagship TPU residency"), then a 16-scenario perturbed batch
through the consensus-SPMD step (the compilable batched form on the v5e).

Run on a TPU host:   python examples/flagship_tpu_fleet.py
On CPU it falls back to the f64 profile automatically.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.abspath(__file__)), ".."))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_dlp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from dlp_admm_tpu.config import ObcaConfig, SolverConfig
from dlp_admm_tpu.models.obca import ConsensusObcaPlanner
from dlp_admm_tpu.parallel import run_scenario_batch


def main():
    on_tpu = jax.default_backend() == "tpu"
    if not on_tpu:
        jax.config.update("jax_enable_x64", True)
    dtype = jnp.float32 if on_tpu else jnp.float64
    print(f"devices: {jax.devices()}  dtype={dtype.__name__}")

    pl = ConsensusObcaPlanner(
        ObcaConfig(horizon=8, min_dis=0.1, rho=100.0, max_admm_iters=50),
        scfg=SolverConfig(ip_iters=40, ip_tol=1e-4 if on_tpu else 1e-6),
        local_prox=700.0, prox_growth=1.5,
        prox_tau_max=1.0e9 if on_tpu else 3.0e10,
        dtype=dtype)

    # single run: the reference driver's 42-step overtaking MPC
    t0 = time.time()
    states, its, prs, dus, _ = pl.run_scan()
    el = time.time() - t0
    d = np.linalg.norm(states[:, 0, :2] - states[:, 1, :2], axis=-1)
    res_ok = int(((prs <= 0.01) & (dus <= 0.01)).sum())
    print(f"single run: {len(its)} steps in {el:.1f}s (incl compile), "
          f"res_ok {res_ok}/{len(its)}, min distance {d.min():.2f} m")

    # fleet batch: 16 perturbed scenarios through the SPMD step
    rng = np.random.default_rng(0)
    init0 = np.asarray(pl.refs[:, 0, :])
    inits = np.broadcast_to(init0, (16,) + init0.shape).copy()
    inits[1:, :, :2] += 0.25 * rng.normal(size=(15, 2, 2))
    t0 = time.time()
    st, its_b, prs_b, dus_b, _, gaps = run_scenario_batch(pl, inits, 20)
    el = time.time() - t0
    p = st[..., :2]
    d_lane = np.linalg.norm(p[:, :, 0] - p[:, :, 1], axis=-1).min(axis=0)
    print(f"fleet batch: 16 scenarios x 20 steps in {el:.1f}s, "
          f"{int(its_b.sum())} consensus iterations, per-lane min distance "
          f"{d_lane.min():.2f}-{d_lane.max():.2f} m, "
          f"gap median {np.median(gaps):.4f}")


if __name__ == "__main__":
    main()
