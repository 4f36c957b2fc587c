"""Round-5 experiment: can the consensus-OBCA flagship run in f32?

VERDICT r4 missing #1: the flagship's full 42-step run executes on the host
CPU in f64 because (a) f32 KKT solves were measured failing (nlp_ok=0) at
the 1e4/1e5/1e7 objective-weight spread and (b) the TPU f64-emulation path
crashes the v5e worker. Route (a) of the fix plan is an f32-robust staged
IP; this tool measures where f32 actually breaks TODAY (the round-4
annealed-prox profile post-dates the nlp_ok=0 measurement) and A/Bs the
conditioning levers.

Usage:
  python tools/exp_f32_flagship.py cpu32          # flagship, CPU f32
  python tools/exp_f32_flagship.py cpu64          # control, CPU f64
  python tools/exp_f32_flagship.py tpu32          # flagship, TPU f32
  python tools/exp_f32_flagship.py tpu32 --steps 10

Round-5 measurement log on the v5e (42 steps, res_ok / min_dist / it/s):
  f64 CPU control:                    42/42  4.140 m  (9.8 it/s r4)
  f32 TPU pre-fix (raw LU, no clamp): 39/42  4.059 m  (nlp health poor)
  f32 TPU equil+refine+clamp 1e9:     40/42  4.020 m  30.9 it/s  <- CHOSEN
  f32 TPU ip_iters 50 (vs 40):        34/42  2.697 m  24.6 it/s  (worse)
  f32 TPU tau_max 3e9 (vs 1e9):       39/42  3.987 m  30.8 it/s  (worse)
The chosen profile is what bench.py pins; the two knob probes above are
the evidence the (ip_iters=40, tau_max=1e9) point is a measured optimum,
not a guess.
"""
import argparse
import os
import sys
import time

mode = sys.argv[1] if len(sys.argv) > 1 else "cpu32"
if mode.startswith("cpu"):
    os.environ["JAX_PLATFORMS"] = "cpu"
# x64 only for the f64 control: under x64 mode python-float literals promote
# f32 arrays to f64 at several sites, so the f32 planner runs in pure-f32
# default mode (exactly how it would run on the TPU)
os.environ["JAX_ENABLE_X64"] = "1" if mode.endswith("64") else "0"

import jax  # noqa: E402

if mode.startswith("cpu"):
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", mode.endswith("64"))
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_dlp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dlp_admm_tpu.config import ObcaConfig, SolverConfig  # noqa: E402
from dlp_admm_tpu.models.obca import ConsensusObcaPlanner  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["cpu32", "cpu64", "tpu32"])
    ap.add_argument("--steps", type=int, default=None)
    ap.add_argument("--ip-tol", type=float, default=None)
    ap.add_argument("--ip-iters", type=int, default=40)
    ap.add_argument("--timed", action="store_true",
                    help="run twice, time the cached-compile second run")
    ap.add_argument("--tau-max", type=float, default=None,
                    help="override prox_tau_max (default: 3e10 f64 / 1e9 f32)")
    args = ap.parse_args()

    dtype = jnp.float64 if args.mode.endswith("64") else jnp.float32
    # f32 cannot certify KKT errors at 1e-6 (eps ~ 6e-8 relative on 1e2
    # magnitudes); default the tolerance per dtype unless overridden
    tol = args.ip_tol if args.ip_tol is not None else (
        1e-6 if dtype == jnp.float64 else 1e-4)

    print(f"devices: {jax.devices()}  dtype={dtype.__name__}  tol={tol}",
          file=sys.stderr)
    # the bench.py round-4 flagship operating point; f32 clamps the anneal
    # at 1e9 (larger tau breaks the f32 staged KKT solves, measured here)
    pl = ConsensusObcaPlanner(
        ObcaConfig(horizon=8, min_dis=0.1, rho=100.0, max_admm_iters=50),
        scfg=SolverConfig(ip_iters=args.ip_iters, ip_tol=tol),
        local_prox=700.0, prox_growth=1.5,
        prox_tau_max=args.tau_max if args.tau_max is not None
        else (3.0e10 if dtype == jnp.float64 else 1.0e9),
        dtype=dtype)

    t0 = time.time()
    states, its, prs, dus, cvs, oks, kkts, gaps = pl.run_scan(
        n_steps=args.steps, return_health=True)
    el = time.time() - t0
    if args.timed:
        t0 = time.time()
        states, its, prs, dus, cvs, oks, kkts, gaps = pl.run_scan(
            n_steps=args.steps, return_health=True)
        el = time.time() - t0
        print(f"timed (post-compile): {el:.1f}s, "
              f"{float(its.sum()) / el:.2f} it/s, "
              f"{el / len(its):.3f} s/step")
    p = states[..., :2]
    d = np.linalg.norm(p[:, 0] - p[:, 1], axis=-1)
    res_ok = int(((prs <= 0.01) & (dus <= 0.01)).sum())
    n = len(its)
    print(f"steps={n} wall={el:.1f}s ({el / n:.2f}s/step incl compile) "
          f"iters_total={int(its.sum())}")
    print(f"res_ok={res_ok}/{n}  min_dist={d.min():.3f} m  "
          f"finite={bool(np.all(np.isfinite(states)))}")
    print(f"nlp_ok (loc, edge) mean: {oks.mean(axis=0)}")
    print(f"nlp_kkt (loc, edge) max: {kkts.max(axis=0)}")
    print(f"consensus gap: max={gaps.max():.4f} "
          f"p90={np.percentile(gaps, 90):.4f} median={np.median(gaps):.4f}")
    hdr = ("step  it  primal      dual        gap       locok edgeok "
           "lockkt  edgekkt")
    print(hdr)
    for k in range(n):
        print(f"{k:4d} {int(its[k]):3d} {prs[k]:.5e} {dus[k]:.5e} "
              f"{gaps[k]:.3e} {oks[k, 0]:5.2f} {oks[k, 1]:6.2f} "
              f"{kkts[k, 0]:.1e} {kkts[k, 1]:.1e}")


if __name__ == "__main__":
    main()
