"""Round-5: batch-scaling curve for the fused PI-ADMM bench (VERDICT r4
next #5 — "the latency-bound claim gets numbers").

Sweeps the scenario count of the exact bench.py workload (16-vehicle H=30
overtaking, fused whole-run driver, per-lane budget 210) and records
effective iterations/s + wall/step. The bench point should sit at the
knee of this curve; MFU is reported honestly from the XLA cost model at
the chosen point.

Usage: python tools/exp_scen_sweep.py [--scens 128,256,512,1024]
"""
import argparse
import os
import sys
import time

os.environ["JAX_ENABLE_X64"] = "0"

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_dlp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dlp_admm_tpu.config import (DualUpdateConfig, PiAdmmConfig,  # noqa: E402
                                 SolverConfig)
from dlp_admm_tpu.models.pi_admm import PiAdmmEngine  # noqa: E402
from dlp_admm_tpu.scenarios import pi_admm_overtake_refs  # noqa: E402


def build_engine(iter_num=40):
    num_veh, horizon = 16, 30
    speeds = tuple(8.0 if i % 2 == 0 else 4.0 for i in range(num_veh))
    cfg = PiAdmmConfig(num_veh=num_veh, horizon=horizon, speeds=speeds,
                       dis_thres=2.0, iter_num=iter_num, eps_pri=1.0,
                       eps_dual=1.0,
                       stop_needs_clearance=False, eps_per_edge=True)
    refs, xt0 = pi_admm_overtake_refs(cfg)
    eng = PiAdmmEngine(cfg, DualUpdateConfig(windup_sat=200.0),
                       SolverConfig(qp_iters=16, qp_tol=1e-4, qp_segments=1,
                                    qp_ns_iters=10, qp_unroll=16),
                       layout="pairwise", refs=refs, n_sqp=1, pair_budget=24,
                       carry_admm_state=True, edge_prox_tau=2.0,
                       dtype=jnp.float32)
    return eng, cfg, xt0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scens", default="64,128,256,512,1024")
    ap.add_argument("--steps", type=int, default=12)
    ap.add_argument("--budget", type=int, default=210)
    ap.add_argument("--iter-num", type=int, default=40,
                    help="per-step ADMM cap (the capped-lane lever: lanes "
                         "whose hard step needs more than this cap there "
                         "even with whole-run budget left)")
    args = ap.parse_args()
    print(f"devices: {jax.devices()}", file=sys.stderr)
    eng, cfg, xt0 = build_engine(args.iter_num)
    rng = np.random.default_rng(0)
    rows = []
    for n_scen in [int(x) for x in args.scens.split(",")]:
        xts = jnp.asarray(
            xt0[None] + np.concatenate([
                0.5 * rng.normal(size=(n_scen,) + xt0[:, :2].shape),
                np.zeros((n_scen, cfg.num_veh, 1))], axis=-1), jnp.float32)
        us = jnp.zeros((n_scen, cfg.num_veh, cfg.horizon), jnp.float32)
        rec = eng.run_fused_batch(xts, us, args.steps, args.budget)
        jax.block_until_ready(rec.xt)          # compile + warm
        t0 = time.time()
        rec = eng.run_fused_batch(xts, us, args.steps, args.budget)
        jax.block_until_ready(rec.xt)
        el = time.time() - t0
        iters = np.asarray(rec.iterations)
        total = int(iters.sum())
        hw = int(iters.sum(axis=1).max())
        conv = float(np.asarray(rec.converged).mean())
        rows.append((n_scen, total / el, el / args.steps, hw, conv))
        print(f"n_scen={n_scen:5d}: {total / el:9.1f} it/s   "
              f"wall/step {el / args.steps:7.3f} s   hw_trips {hw:4d}   "
              f"conv {conv:.4f}   total_iters {total}")
    best = max(rows, key=lambda r: r[1])
    print(f"knee: n_scen={best[0]} at {best[1]:.1f} it/s")


if __name__ == "__main__":
    main()
