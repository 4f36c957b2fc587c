"""Ad-hoc: full-bench quality + speed comparison across solver configs."""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from dlp_admm_tpu.config import DualUpdateConfig, PiAdmmConfig, SolverConfig
from dlp_admm_tpu.models.pi_admm import PiAdmmEngine
from dlp_admm_tpu.scenarios import pi_admm_overtake_refs

num_veh, horizon, n_scen, n_steps = 16, 30, 32, 4
speeds = tuple(8.0 if i % 2 == 0 else 4.0 for i in range(num_veh))
cfg = PiAdmmConfig(num_veh=num_veh, horizon=horizon, speeds=speeds,
                   dis_thres=2.0, iter_num=15, eps_pri=1.0, eps_dual=1.0,
                   stop_needs_clearance=False)
refs, xt0 = pi_admm_overtake_refs(cfg)
rng = np.random.default_rng(0)
xts0 = jnp.asarray(
    xt0[None] + np.concatenate([
        0.5 * rng.normal(size=(n_scen,) + xt0[:, :2].shape),
        np.zeros((n_scen, num_veh, 1))], axis=-1), jnp.float32)
us0 = jnp.zeros((n_scen, num_veh, horizon), jnp.float32)


def run(name, scfg):
    eng = PiAdmmEngine(cfg, DualUpdateConfig(), scfg, layout="pairwise",
                       refs=refs, n_sqp=1, pair_budget=24, dtype=jnp.float32)
    step = jax.jit(jax.vmap(eng._mpc_step_impl, in_axes=(0, 0, None)))
    xt_w, _, _ = step(xts0, us0, jnp.asarray(0, jnp.int32))
    jax.block_until_ready(xt_w)
    total_iters = 0
    xt, u = xts0, us0
    xts_hist = [np.asarray(xt)]
    rs, ss = [], []
    t0 = time.time()
    for k in range(n_steps):
        u = jnp.concatenate([u[:, :, 1:], u[:, :, -1:]], axis=2)
        xt, u, rec = step(xt, u, jnp.asarray(k, jnp.int32))
        total_iters += int(np.sum(np.asarray(rec.iterations)))
        xts_hist.append(np.asarray(xt))
        rs.append(float(np.mean(rec.primal_res)))
        ss.append(float(np.mean(rec.dual_res)))
    jax.block_until_ready(xt)
    el = time.time() - t0
    # min pairwise distance across scenarios/steps
    h = np.stack(xts_hist)  # [S+1, n_scen, V, 3]
    p = h[..., :2]
    d = np.linalg.norm(p[:, :, :, None, :] - p[:, :, None, :, :], axis=-1)
    d = d + 1e9 * np.eye(num_veh)
    print(f"{name:32s} {total_iters/el:8.1f} it/s  iters={total_iters:4d}  "
          f"min_d={d.min():.3f}  r_bar={np.mean(rs):.3f} s_bar={np.mean(ss):.3f}",
          file=sys.stderr)


run("bench baseline (40it/2seg/ns14)", SolverConfig(
    qp_iters=40, qp_tol=1e-4, qp_segments=2, qp_ns_iters=14))
run("30it/1seg/ns14/unroll", SolverConfig(
    qp_iters=30, qp_tol=1e-4, qp_segments=1, qp_ns_iters=14, qp_unroll=30))
run("40it/1seg/ns14/unroll", SolverConfig(
    qp_iters=40, qp_tol=1e-4, qp_segments=1, qp_ns_iters=14, qp_unroll=40))
run("20it/1seg/ns12/unroll", SolverConfig(
    qp_iters=20, qp_tol=1e-4, qp_segments=1, qp_ns_iters=12, qp_unroll=20))
run("16it/1seg/ns10/unroll", SolverConfig(
    qp_iters=16, qp_tol=1e-4, qp_segments=1, qp_ns_iters=10, qp_unroll=16))
run("12it/1seg/ns8/unroll", SolverConfig(
    qp_iters=12, qp_tol=1e-4, qp_segments=1, qp_ns_iters=8, qp_unroll=12))
run("8it/1seg/ns8/unroll", SolverConfig(
    qp_iters=8, qp_tol=1e-4, qp_segments=1, qp_ns_iters=8, qp_unroll=8))
