"""Round-5 experiment: OBCA-line scale points (VERDICT r4 missing #2).

Two measurements the round-4 bench lacked:
  (a) a scenario-batched consensus-OBCA run (S >= 16, V = 2) — the OBCA
      analogue of the reference's stochastic scenario batching
      (``centralized_overtaking_stochastic.py:21-79``, which reruns one
      Python process per scenario);
  (b) a V = 8 consensus-OBCA point (the staged IP makes V = 8 tractable
      per tools/exp_kkt.py; round 4 demonstrated it only on single solves).

Usage:
  python tools/exp_obca_batch.py batch [--scen 16] [--steps 42] [--cpu]
  python tools/exp_obca_batch.py v8    [--steps 10] [--cpu]
"""
import argparse
import os
import sys
import time

cpu = "--cpu" in sys.argv
if cpu:
    os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_ENABLE_X64"] = "0"

import jax  # noqa: E402

if cpu:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_dlp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dlp_admm_tpu.config import ObcaConfig, SolverConfig, VehicleConfig  # noqa: E402
from dlp_admm_tpu.models.obca import ConsensusObcaPlanner  # noqa: E402


def flagship_planner(num_veh=2, ip_iters=40, tau_max=1.0e9):
    return ConsensusObcaPlanner(
        ObcaConfig(num_veh=num_veh, horizon=8, min_dis=0.1, rho=100.0,
                   max_admm_iters=50),
        scfg=SolverConfig(ip_iters=ip_iters, ip_tol=1e-4),
        local_prox=700.0, prox_growth=1.5, prox_tau_max=tau_max,
        dtype=jnp.float32)


def min_pair_dist(states, num_veh):
    p = states[..., :2]                          # [n+1, S, V, 2]
    d = np.linalg.norm(p[..., :, None, :] - p[..., None, :, :], axis=-1)
    d = d + 1e9 * np.eye(num_veh)
    return float(d.min())


def run_spmd_batch(pl, inits, n_steps):
    """Scenario-batched flagship run (consensus-SPMD step on a 1x1 mesh —
    the compilable batched form; see consensus_spmd docstring)."""
    from dlp_admm_tpu.parallel.consensus_spmd import run_scenario_batch
    return run_scenario_batch(pl, inits, n_steps)


def run_batch(n_scen, n_steps, timed=True, jitter=0.5, ip_iters=40,
              tau_max=1.0e9):
    pl = flagship_planner(2, ip_iters=ip_iters, tau_max=tau_max)
    rng = np.random.default_rng(0)
    init0 = np.asarray(pl.refs[:, 0, :])
    inits = np.broadcast_to(init0, (n_scen,) + init0.shape).copy()
    # lateral + longitudinal jitter, zero for scenario 0 (the pinned run)
    pert = jitter * rng.normal(size=(n_scen, 2, 2))
    pert[0] = 0.0
    inits[:, :, :2] += pert
    t0 = time.time()
    st, its, prs, dus, cvs, gaps = run_spmd_batch(pl, inits, n_steps)
    compile_el = time.time() - t0
    el = compile_el
    if timed:
        t0 = time.time()
        st, its, prs, dus, cvs, gaps = run_spmd_batch(pl, inits, n_steps)
        el = time.time() - t0
    total_iters = int(its.sum())
    res_ok = int(((prs <= 0.01) & (dus <= 0.01)).sum())
    lanes = its.size
    d = min_pair_dist(st, 2)
    print(f"batch S={n_scen} V=2 steps={n_steps}: compile+1st {compile_el:.1f}s"
          f"  timed {el:.1f}s  total_iters={total_iters}"
          f"  it/s={total_iters / el:.1f}  wall/step={el / n_steps:.3f}s")
    print(f"  res_ok={res_ok}/{lanes}  min_dist={d:.3f} m"
          f"  gap_med={np.median(gaps):.4f} gap_max={gaps.max():.3f}"
          f"  finite={bool(np.all(np.isfinite(st)))}")
    print(f"  per-scenario iters: {its.sum(axis=1)}")
    p = st[..., :2]
    d_lane = np.linalg.norm(p[:, :, 0] - p[:, :, 1], axis=-1).min(axis=0)
    print(f"  per-scenario min dist: {np.round(d_lane, 3).tolist()}")
    print(f"  per-scenario res_ok: "
          f"{((prs <= 0.01) & (dus <= 0.01)).sum(axis=1).tolist()}")
    print(f"  per-scenario gap max: "
          f"{np.round(gaps.max(axis=1), 2).tolist()}")
    return total_iters / el, res_ok / lanes, d


def run_v8(n_steps):
    pl = flagship_planner(8)
    init = pl.refs[:, 0, :]
    t0 = time.time()
    st, its, prs, dus, cvs, oks, kkts, gaps = pl.run_scan(
        n_steps=n_steps, return_health=True)
    el = time.time() - t0
    res_ok = int(((prs <= 0.01) & (dus <= 0.01)).sum())
    d = min_pair_dist(st[:, None], 8)
    print(f"V=8 steps={n_steps}: wall(incl compile) {el:.1f}s "
          f"total_iters={int(its.sum())}")
    t0 = time.time()
    st, its, prs, dus, cvs, oks, kkts, gaps = pl.run_scan(
        n_steps=n_steps, return_health=True)
    el = time.time() - t0
    d = min_pair_dist(st[:, None], 8)
    print(f"  timed {el:.1f}s  it/s={float(its.sum()) / el:.2f}  "
          f"wall/step={el / n_steps:.3f}s")
    print(f"  res_ok={res_ok}/{n_steps}  min_dist={d:.3f} m  "
          f"gap_med={np.median(gaps):.4f}  "
          f"finite={bool(np.all(np.isfinite(st)))}")
    print(f"  iters: {its}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["batch", "v8"])
    ap.add_argument("--scen", type=int, default=16)
    ap.add_argument("--steps", type=int, default=42)
    ap.add_argument("--jitter", type=float, default=0.5)
    ap.add_argument("--ip-iters", type=int, default=40)
    ap.add_argument("--tau-max", type=float, default=1.0e9)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    print(f"devices: {jax.devices()}", file=sys.stderr)
    if args.mode == "batch":
        run_batch(args.scen, args.steps, jitter=args.jitter,
                  ip_iters=args.ip_iters, tau_max=args.tau_max)
    else:
        run_v8(min(args.steps, 10) if args.steps == 42 else args.steps)


if __name__ == "__main__":
    main()
