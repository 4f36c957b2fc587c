"""Ad-hoc: on-TPU A/B of the fused driver's whole-run iteration budget —
quality-margin vs throughput at the bench workload (bench.py gates
converged_fraction >= 0.90; the budget is the knob that trades it/s for
slow-lane convergence headroom).

Usage: PYTHONPATH=. python tools/exp_budget_ab.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from dlp_admm_tpu.config import DualUpdateConfig, PiAdmmConfig, SolverConfig
from dlp_admm_tpu.models.pi_admm import PiAdmmEngine
from dlp_admm_tpu.scenarios import pi_admm_overtake_refs

num_veh, horizon, n_scen, n_steps = 16, 30, 128, 12
speeds = tuple(8.0 if i % 2 == 0 else 4.0 for i in range(num_veh))
cfg = PiAdmmConfig(num_veh=num_veh, horizon=horizon, speeds=speeds,
                   dis_thres=2.0, iter_num=40, eps_pri=1.0, eps_dual=1.0,
                   stop_needs_clearance=False, eps_per_edge=True)
refs, xt0 = pi_admm_overtake_refs(cfg)
rng = np.random.default_rng(0)
xts = jnp.asarray(
    xt0[None] + np.concatenate([
        0.5 * rng.normal(size=(n_scen,) + xt0[:, :2].shape),
        np.zeros((n_scen, num_veh, 1))], axis=-1), jnp.float32)
us = jnp.zeros((n_scen, num_veh, horizon), jnp.float32)


def run(budget):
    eng = PiAdmmEngine(cfg, DualUpdateConfig(windup_sat=200.0),
                       SolverConfig(qp_iters=16, qp_tol=1e-4, qp_segments=1,
                                    qp_ns_iters=10, qp_unroll=16),
                       layout="pairwise", refs=refs, n_sqp=1, pair_budget=24,
                       carry_admm_state=True, edge_prox_tau=2.0,
                       dtype=jnp.float32)
    rec = eng.run_fused_batch(xts, us, n_steps, budget)
    jax.block_until_ready(rec.xt)
    t0 = time.time()
    rec = eng.run_fused_batch(xts, us, n_steps, budget)
    jax.block_until_ready(rec.xt)
    el = time.time() - t0
    iters = np.asarray(rec.iterations)
    total = int(iters.sum())
    capped = int(np.sum(~np.asarray(rec.converged)))
    hw = int(iters.sum(axis=1).max())
    h = np.concatenate([np.asarray(xts)[None],
                        np.moveaxis(np.asarray(rec.xt), 1, 0)])
    p = h[..., :2]
    d = np.linalg.norm(p[:, :, :, None, :] - p[:, :, None, :, :], axis=-1)
    d += 1e9 * np.eye(num_veh)
    conv = 1.0 - capped / (n_steps * n_scen)
    print(f"budget={budget}: {total/el:8.1f} it/s  conv={conv:.4f} "
          f"min_d={d.min():.3f} loop_eff={total/(hw*n_scen):.3f} "
          f"wall/step={el/n_steps:.3f}s", flush=True)


if __name__ == "__main__":
    for b in (210, 250, 300, 400):
        run(b)
