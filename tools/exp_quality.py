"""Ad-hoc: 20-step quality check of loose vs tight QP budgets (16 veh,
perturbed starts like bench.py so collision machinery engages)."""
import sys

import jax
import jax.numpy as jnp
import numpy as np

from dlp_admm_tpu.config import DualUpdateConfig, PiAdmmConfig, SolverConfig
from dlp_admm_tpu.models.pi_admm import PiAdmmEngine
from dlp_admm_tpu.scenarios import pi_admm_overtake_refs

num_veh, horizon, n_scen, n_steps = 16, 30, 8, 20
speeds = tuple(8.0 if i % 2 == 0 else 4.0 for i in range(num_veh))
cfg = PiAdmmConfig(num_veh=num_veh, horizon=horizon, speeds=speeds,
                   dis_thres=2.0, iter_num=15, eps_pri=1.0, eps_dual=1.0,
                   stop_needs_clearance=False)
refs, xt0 = pi_admm_overtake_refs(cfg)
rng = np.random.default_rng(0)
xts0 = jnp.asarray(
    xt0[None] + np.concatenate([
        0.9 * rng.normal(size=(n_scen,) + xt0[:, :2].shape),
        np.zeros((n_scen, num_veh, 1))], axis=-1), jnp.float32)
us0 = jnp.zeros((n_scen, num_veh, horizon), jnp.float32)


def run(name, scfg):
    eng = PiAdmmEngine(cfg, DualUpdateConfig(), scfg, layout="pairwise",
                       refs=refs, n_sqp=1, pair_budget=24, dtype=jnp.float32)
    step = jax.jit(jax.vmap(eng._mpc_step_impl, in_axes=(0, 0, None)))
    xt, u = xts0, us0
    hist, iters = [np.asarray(xt)], 0
    for k in range(n_steps):
        u = jnp.concatenate([u[:, :, 1:], u[:, :, -1:]], axis=2)
        xt, u, rec = step(xt, u, jnp.asarray(k, jnp.int32))
        iters += int(np.sum(np.asarray(rec.iterations)))
        hist.append(np.asarray(xt))
    h = np.stack(hist)                      # [S+1, n_scen, V, 3]
    p = h[..., :2]
    d = np.linalg.norm(p[:, :, :, None, :] - p[:, :, None, :, :], axis=-1)
    d = d + 1e9 * np.eye(num_veh)
    d_end = d[5:]                           # after avoidance has had effect
    print(f"{name:28s} min_d(all)={d.min():.3f} min_d(t>5)={d_end.min():.3f}"
          f"  iters_tot={iters:5d}  finite={np.all(np.isfinite(h))}",
          file=sys.stderr)


run("40it/2seg/ns14 (old bench)", SolverConfig(
    qp_iters=40, qp_tol=1e-4, qp_segments=2, qp_ns_iters=14))
run("16it/1seg/ns10", SolverConfig(
    qp_iters=16, qp_tol=1e-4, qp_segments=1, qp_ns_iters=10, qp_unroll=16))
run("12it/1seg/ns8", SolverConfig(
    qp_iters=12, qp_tol=1e-4, qp_segments=1, qp_ns_iters=8, qp_unroll=12))
run("8it/1seg/ns8", SolverConfig(
    qp_iters=8, qp_tol=1e-4, qp_segments=1, qp_ns_iters=8, qp_unroll=8))
