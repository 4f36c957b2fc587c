"""Ad-hoc: per-step lane-iteration distribution of the bench workload.

Sizes the short-cap + retry-pass split (VERDICT r3 next #1): a vmapped
``lax.while_loop`` executes max-over-lanes trips, so the waste per step is
sum_lanes(max - own). Prints, per MPC step, the lane iteration quantiles at
a deep cap (60) — if the p99 lane converges by ~35 the tail is slow-but-
convergent (a retry pass recovers it); if it caps at 60 it oscillates.

Usage: python tools/exp_iter_dist.py [n_scen] [cap]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from dlp_admm_tpu.config import DualUpdateConfig, PiAdmmConfig, SolverConfig
from dlp_admm_tpu.models.pi_admm import PiAdmmEngine
from dlp_admm_tpu.scenarios import pi_admm_overtake_refs

n_scen = int(sys.argv[1]) if len(sys.argv) > 1 else 32
cap = int(sys.argv[2]) if len(sys.argv) > 2 else 60
num_veh, horizon, n_steps = 16, 30, 8
speeds = tuple(8.0 if i % 2 == 0 else 4.0 for i in range(num_veh))

cfg = PiAdmmConfig(num_veh=num_veh, horizon=horizon, speeds=speeds,
                   dis_thres=2.0, iter_num=cap, eps_pri=1.0, eps_dual=1.0,
                   stop_needs_clearance=False, eps_per_edge=True)
refs, xt0 = pi_admm_overtake_refs(cfg)
eng = PiAdmmEngine(cfg, DualUpdateConfig(windup_sat=200.0),
                   SolverConfig(qp_iters=16, qp_tol=1e-4, qp_segments=1,
                                qp_ns_iters=10, qp_unroll=16),
                   layout="pairwise", refs=refs, n_sqp=1, pair_budget=24,
                   carry_admm_state=True, dtype=jnp.float32)
rng = np.random.default_rng(0)
xts = jnp.asarray(
    xt0[None] + np.concatenate([
        0.5 * rng.normal(size=(n_scen,) + xt0[:, :2].shape),
        np.zeros((n_scen, num_veh, 1))], axis=-1), jnp.float32)
us = jnp.zeros((n_scen, num_veh, horizon), jnp.float32)
admm = jax.tree.map(lambda a: jnp.broadcast_to(a, (n_scen,) + a.shape),
                    eng.init_admm_carry())
step = jax.jit(jax.vmap(eng._mpc_step_carry_impl, in_axes=(0, 0, 0, None)))
w = step(xts, us, admm, jnp.asarray(0, jnp.int32))
jax.block_until_ready(w[0])

xt, u = xts, us
t0 = time.time()
for k in range(n_steps):
    u = jnp.concatenate([u[:, :, 1:], u[:, :, -1:]], axis=2)
    xt, u, admm, rec = step(xt, u, admm, jnp.asarray(k, jnp.int32))
    it = np.sort(np.asarray(rec.iterations))
    r = np.asarray(rec.primal_res)
    s = np.asarray(rec.dual_res)
    capped = it >= cap
    print(f"step {k}: mean={it.mean():5.1f} p50={it[len(it)//2]:3d} "
          f"p75={it[int(len(it)*.75)]:3d} p90={it[int(len(it)*.9)]:3d} "
          f"max={it[-1]:3d} capped={int(capped.sum()):3d}/{n_scen} "
          f"r[capped] max={r[np.asarray(rec.iterations) >= cap].max() if capped.any() else 0:8.2f} "
          f"s[capped] max={s[np.asarray(rec.iterations) >= cap].max() if capped.any() else 0:8.2f}",
          file=sys.stderr, flush=True)
print(f"wall={(time.time()-t0):.2f}s for {n_steps} steps @ {n_scen} lanes, "
      f"cap {cap}", file=sys.stderr)
