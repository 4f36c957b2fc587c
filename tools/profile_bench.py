"""Ad-hoc breakdown of the bench MPC step (not part of the package)."""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from dlp_admm_tpu.config import DualUpdateConfig, PiAdmmConfig, SolverConfig
from dlp_admm_tpu.models import pi_admm as M
from dlp_admm_tpu.models.pi_admm import PiAdmmEngine
from dlp_admm_tpu.scenarios import pi_admm_overtake_refs

num_veh, horizon, n_scen = 16, 30, 32
speeds = tuple(8.0 if i % 2 == 0 else 4.0 for i in range(num_veh))
cfg = PiAdmmConfig(num_veh=num_veh, horizon=horizon, speeds=speeds,
                   dis_thres=2.0, iter_num=15, eps_pri=1.0, eps_dual=1.0,
                   stop_needs_clearance=False)
refs, xt0 = pi_admm_overtake_refs(cfg)
scfg = SolverConfig(qp_iters=40, qp_tol=1e-4)
eng = PiAdmmEngine(cfg, DualUpdateConfig(), scfg, layout="pairwise",
                   refs=refs, n_sqp=1, pair_budget=24, dtype=jnp.float32)

rng = np.random.default_rng(0)
xts = jnp.asarray(
    xt0[None] + np.concatenate([
        0.5 * rng.normal(size=(n_scen,) + xt0[:, :2].shape),
        np.zeros((n_scen, num_veh, 1))], axis=-1), jnp.float32)
us = jnp.zeros((n_scen, num_veh, horizon), jnp.float32)

def timeit(name, fn, *a, reps=5):
    out = fn(*a); jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*a)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / reps
    print(f"{name:30s} {dt*1e3:9.2f} ms", file=sys.stderr)
    return out

# --- pieces, batched over scenarios -----------------------------------------
h1 = horizon + 1
p = eng.n_pairs
k = 24

@jax.jit
@jax.vmap
def local_affines(xt):
    return eng._local_affines(xt)

aff = timeit("local_affines (per step)", local_affines, xts)

ref_flat = eng._ref_window(jnp.asarray(0, jnp.int32))

@jax.jit
def local_solves(aff, us):
    def one(aff_s, u_s):
        hats = jnp.zeros((num_veh, num_veh - 1, 2 * h1), jnp.float32)
        duals = jnp.zeros_like(hats)
        w = jnp.ones((num_veh, num_veh - 1), jnp.float32)
        return eng._local_solve(aff_s, u_s, ref_flat, hats, duals, w,
                                jnp.float32(cfg.rho))
    return jax.vmap(one)(aff, us)

u_l, pos_l = timeit("local QP solve (per iter)", local_solves, aff, us)

from dlp_admm_tpu.ops.pairs import pair_indices
ii, jj = pair_indices(num_veh)
ii, jj = ii[:k], jj[:k]

@jax.jit
def edge_solves(xts, us):
    def one(xt, u):
        xt_pairs = jnp.stack([xt[ii], xt[jj]], axis=1)
        spd_pairs = jnp.stack([eng.spd[ii], eng.spd[jj]], axis=1)
        pos_p = jnp.zeros((k, 2, 2 * h1), jnp.float32)
        dual_p = jnp.zeros_like(pos_p)
        ld = jnp.ones((k, 2), jnp.float32)
        u0 = jnp.stack([u[ii], u[jj]], axis=1)
        y0 = jnp.zeros((k, M.edge_qp_m(cfg)), jnp.float32)
        def op(xt_p, spd_p, pp, dp, ldp, u0p, y0p):
            return M._solve_pair_edge_qp(xt_p, spd_p, pp, dp, ldp, u0p,
                                         cfg, scfg, 1, y0=y0p)
        return jax.vmap(op)(xt_pairs, spd_pairs, pos_p, dual_p, ld, u0, y0)
    return jax.vmap(one)(xts, us)

timeit("edge QPs x24 (per iter)", edge_solves, xts, us)

# edge affine alone
@jax.jit
def edge_affines(xts, us):
    def one(xt, u):
        xt_pairs = jnp.stack([xt[ii], xt[jj]], axis=1).reshape(-1, 3)
        spd_pairs = jnp.stack([eng.spd[ii], eng.spd[jj]],
                              axis=1).reshape(-1)
        u0 = jnp.stack([u[ii], u[jj]], axis=1).reshape(-1, horizon)
        return jax.vmap(lambda a, b, c: M._edge_affine(
            a, b, c, cfg.dt, cfg.wheel_base))(xt_pairs, spd_pairs, u0)
    return jax.vmap(one)(xts, us)

timeit("edge affine jacfwd (per iter)", edge_affines, xts, us)

# full step
step = jax.jit(jax.vmap(eng._mpc_step_impl, in_axes=(0, 0, None)))
out = timeit("FULL step (<=15 iters)", step, xts, us, jnp.asarray(0, jnp.int32), reps=3)
print("iters used:", np.asarray(out[2].iterations), file=sys.stderr)
