"""A/B isolating the round-3 bench regression (VERDICT r3 next #1).

Round 2 measured 904.8 it/s at converged_fraction 0.61 (n_scen=32, cap 15,
no carry, fixed eps); round 3 measured 371.9 it/s at 0.916 (n_scen=128,
cap 30, hat-cell carry, eps_per_edge). This grid isolates which change paid
for the quality and which merely burned wall-clock:

    n_scen in {32, 128}  x  carry {on, off}  x  eps_per_edge {on, off}

Each cell reports effective it/s, converged fraction, per-MPC-step wall,
and the per-lane iteration distribution (mean / p90 / max per step) — the
distribution is what sizes the short-cap + retry-pass split (a vmapped
``lax.while_loop`` executes max-over-lanes trips, so waste ==
sum(max - own)).

Run on the TPU:  python tools/exp_bench_ab.py
Recorded result (TPU v5 lite via tunnel, 2026-08-20):

  n_scen= 32 carry=0 eps_pe=0 |  712.7 it/s  conv=0.938 wall/step=0.653  iters mean=14.6 p90=25 max=30
  n_scen= 32 carry=1 eps_pe=0 | 1306.0 it/s  conv=0.938 wall/step=0.305  iters mean=12.4 p90=25 max=30
  n_scen= 32 carry=0 eps_pe=1 | 1478.6 it/s  conv=0.938 wall/step=0.315  iters mean=14.6 p90=25 max=30
  n_scen= 32 carry=1 eps_pe=1 | 1300.3 it/s  conv=0.938 wall/step=0.306  iters mean=12.4 p90=25 max=30
  n_scen=128 carry=0 eps_pe=0 |   74.7 it/s  conv=0.943 wall/step=24.733 iters mean=14.4 p90=23 max=30
  n_scen=128 carry=1 eps_pe=0 | 1050.9 it/s  conv=0.916 wall/step=1.656  iters mean=13.6 p90=28 max=30
  n_scen=128 carry=0 eps_pe=1 | 1119.2 it/s  conv=0.943 wall/step=1.650  iters mean=14.4 p90=23 max=30
  n_scen=128 carry=1 eps_pe=1 | 1051.2 it/s  conv=0.916 wall/step=1.656  iters mean=12.8 p90=28 max=30

Findings:
(a) The round-3 number (371.9 it/s) does NOT reproduce on the same code —
    the same cell (128/carry/eps_pe) measures 1051 it/s here. The remote-TPU
    tunnel has large run-to-run variance (note the 24.7 s/step outlier in
    the first 128-lane cell: one stalled dispatch poisons a 4-step window).
    Conclusion: the r3 "regression" was mostly measurement, not code — but
    the bench must be made robust to it (more steps, best-of-2 timing).
(b) Per-lane-trip cost is ~1.4x better at 32 lanes than 128 on this chip
    (0.0095 vs 0.0129 s/trip-per-128-lanes-equivalent): 128 lanes does NOT
    amortize; 32 is the sweet spot.
(c) The cross-step carry cuts ~2 iterations/lane; eps_per_edge buys
    converged lanes at V=16 (its effect here is muted because windup_sat
    200 already fixed most of the round-2 non-convergence).
(d) The residual waste is the while_loop tail: mean 12-14 iterations but
    max 30 every step => ~55% masked trips. tools/exp_iter_dist.py shows
    the tail is slow-but-convergent (1/256 lane-steps capped at 60; p90 25,
    max 56), so a fused-step loop with end-of-run lane compaction recovers
    it (see bench.py round 4).
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from dlp_admm_tpu.config import DualUpdateConfig, PiAdmmConfig, SolverConfig
from dlp_admm_tpu.models.pi_admm import PiAdmmEngine
from dlp_admm_tpu.scenarios import pi_admm_overtake_refs

num_veh, horizon, n_steps = 16, 30, 4
speeds = tuple(8.0 if i % 2 == 0 else 4.0 for i in range(num_veh))


def run(n_scen, carry, eps_pe):
    cfg = PiAdmmConfig(num_veh=num_veh, horizon=horizon, speeds=speeds,
                       dis_thres=2.0, iter_num=30, eps_pri=1.0, eps_dual=1.0,
                       stop_needs_clearance=False, eps_per_edge=eps_pe)
    refs, xt0 = pi_admm_overtake_refs(cfg)
    eng = PiAdmmEngine(cfg, DualUpdateConfig(windup_sat=200.0),
                       SolverConfig(qp_iters=16, qp_tol=1e-4, qp_segments=1,
                                    qp_ns_iters=10, qp_unroll=16),
                       layout="pairwise", refs=refs, n_sqp=1, pair_budget=24,
                       carry_admm_state=carry, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    xts = jnp.asarray(
        xt0[None] + np.concatenate([
            0.5 * rng.normal(size=(n_scen,) + xt0[:, :2].shape),
            np.zeros((n_scen, num_veh, 1))], axis=-1), jnp.float32)
    us = jnp.zeros((n_scen, num_veh, horizon), jnp.float32)

    if carry:
        step = jax.jit(jax.vmap(eng._mpc_step_carry_impl,
                                in_axes=(0, 0, 0, None)))
        admm0 = jax.tree.map(
            lambda a: jnp.broadcast_to(a, (n_scen,) + a.shape),
            eng.init_admm_carry())
        w = step(xts, us, admm0, jnp.asarray(0, jnp.int32))
    else:
        step = jax.jit(jax.vmap(eng._mpc_step_impl, in_axes=(0, 0, None)))
        admm0 = None
        w = step(xts, us, jnp.asarray(0, jnp.int32))
    jax.block_until_ready(w[0])

    xt, u, admm = xts, us, admm0
    total_iters, capped, iters_all = 0, 0, []
    t0 = time.time()
    for k in range(n_steps):
        u = jnp.concatenate([u[:, :, 1:], u[:, :, -1:]], axis=2)
        if carry:
            xt, u, admm, rec = step(xt, u, admm, jnp.asarray(k, jnp.int32))
        else:
            xt, u, rec = step(xt, u, jnp.asarray(k, jnp.int32))
        it = np.asarray(rec.iterations)
        iters_all.append(it)
        total_iters += int(it.sum())
        capped += int((it >= cfg.iter_num).sum())
    jax.block_until_ready(xt)
    el = time.time() - t0
    it = np.concatenate(iters_all)
    conv = 1.0 - capped / (n_steps * n_scen)
    print(f"n_scen={n_scen:3d} carry={int(carry)} eps_pe={int(eps_pe)} | "
          f"{total_iters/el:7.1f} it/s  conv={conv:.3f} "
          f"wall/step={el/n_steps:.3f} iters mean={it.mean():.1f} "
          f"p90={int(np.percentile(it, 90))} max={int(it.max())}",
          file=sys.stderr, flush=True)


if __name__ == "__main__":
    print(f"devices: {jax.devices()}", file=sys.stderr)
    for n_scen in (32, 128):
        for eps_pe in (False, True):
            for carry in (False, True):
                run(n_scen, carry, eps_pe)
