"""A/B: block-tridiagonal KKT solve backends at planner shapes (VERDICT
r4 next #8 — the SURVEY §7.4 "speed-of-light" component, measurement-first
like tools/exp_qp_ab.py).

Contenders, all solving the same [S, T, B, B] batched system:
  lu     — vmapped block_thomas_solve (lax.scan + jnp.linalg.solve -> the
           XLA LuDecomposition custom call); the f64/default path
  equil  — vmapped block_thomas_solve with the f32 Ruiz-equilibrated
           refined solve (equil_solve); the production f32 path
  gj     — scan with the in-XLA no-pivot Gauss-Jordan (linalg.gj_solve)
  pallas — one fused VPU kernel per 128-lane tile running the whole
           forward/backward recursion (solvers/thomas_pallas.py)

Shapes: the flagship local-stage system is [T=7, B=19] at batch S = 2
(V=2 vehicles, one scenario); scenario batching scales S; the V=8 local
system is B=42+ wide. Blocks are generated planner-like: SPD-dominant
with a +tau diagonal spike on a random row subset (the annealed-prox
regime) and Ruiz-equilibrated, matching what the staged IP feeds the
solver after scaling.

Usage: python tools/exp_thomas_ab.py [--cpu]
"""
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

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dlp_admm_tpu.solvers.ip_staged import block_thomas_solve  # noqa: E402
from dlp_admm_tpu.solvers import linalg  # noqa: E402
from dlp_admm_tpu.solvers.thomas_pallas import (  # noqa: E402
    block_thomas_solve_pallas)


def make_problem(s, t, b, seed=0, tau=1e4):
    """Planner-like equilibrated blocks: SPD-dominant + prox spikes."""
    rng = np.random.default_rng(seed)
    q = rng.normal(size=(s, t, b, b)).astype(np.float32)
    diag = q @ q.transpose(0, 1, 3, 2) / b + 2.0 * np.eye(b, dtype=np.float32)
    spike = (rng.random((s, t, b)) < 0.3) * tau
    diag = diag + np.einsum('stb,bc->stbc', spike.astype(np.float32),
                            np.eye(b, dtype=np.float32))
    upper = 0.3 * rng.normal(size=(s, t, b, b)).astype(np.float32)
    rhs = rng.normal(size=(s, t, b)).astype(np.float32)
    # Ruiz pass (what the staged IP's scaling leaves the solver with)
    r = np.maximum(np.abs(diag).max(axis=-1), 1e-6)
    d = 1.0 / np.sqrt(r)
    diag = diag * d[..., :, None] * d[..., None, :]
    upper = upper * d[..., :, None] * d[..., None, :]
    rhs = rhs * d
    return jnp.asarray(diag), jnp.asarray(upper), jnp.asarray(rhs)


def residual(diag, upper, rhs, sol):
    t = rhs.shape[1]
    up = jnp.concatenate(
        [upper[:, :t - 1], jnp.zeros_like(upper[:, :1])], axis=1)
    nxt = jnp.concatenate([sol[:, 1:], jnp.zeros_like(sol[:, :1])], axis=1)
    prv = jnp.concatenate([jnp.zeros_like(sol[:, :1]), sol[:, :-1]], axis=1)
    r = (jnp.einsum('stij,stj->sti', diag, sol)
         + jnp.einsum('stij,stj->sti', up, nxt)
         + jnp.einsum('stji,stj->sti', jnp.concatenate(
             [jnp.zeros_like(up[:, :1]), up[:, :-1]], axis=1), prv)
         - rhs)
    return float(jnp.max(jnp.abs(r)))


def bench(fn, args, n=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / n * 1e3, out


def gj_thomas(diag, upper, rhs):
    """block_thomas_solve with gj_solve as the per-stage solver (monkey-
    patched through the module's dense_solve/equil_solve hooks)."""
    t = rhs.shape[1]

    def one(d, u, r):
        return block_thomas_solve(d, u, r)
    # swap the f32 solver for gj: block_thomas_solve picks equil_solve for
    # f32; temporarily rebind
    import dlp_admm_tpu.solvers.ip_staged as stg
    orig = stg.equil_solve
    stg.equil_solve = linalg.gj_solve
    try:
        f = jax.jit(jax.vmap(one))
        out = f(diag, upper, rhs)
        jax.block_until_ready(out)
    finally:
        stg.equil_solve = orig
    return f


def main():
    print(f"devices: {jax.devices()}", file=sys.stderr)
    shapes = [(2, 7, 19), (32, 7, 19), (256, 7, 19), (32, 7, 43)]
    vth = jax.jit(jax.vmap(block_thomas_solve))
    for (s, t, b) in shapes:
        diag, upper, rhs = make_problem(s, t, b)
        ms_eq, sol_eq = bench(vth, (diag, upper[:, :t - 1], rhs))
        gj_f = gj_thomas(diag, upper[:, :t - 1], rhs)
        ms_gj, sol_gj = bench(gj_f, (diag, upper[:, :t - 1], rhs))
        ms_pl, sol_pl = bench(block_thomas_solve_pallas,
                              (diag, upper[:, :t - 1], rhs))
        res = {k: residual(diag, upper, rhs, v) for k, v in
               [("equil", sol_eq), ("gj", sol_gj), ("pallas", sol_pl)]}
        dmax = float(jnp.max(jnp.abs(sol_pl - sol_eq)))
        print(f"S={s:4d} T={t} B={b:2d}:  equil {ms_eq:7.3f} ms   "
              f"gj {ms_gj:7.3f} ms   pallas {ms_pl:7.3f} ms   "
              f"|pl-equil| {dmax:.2e}   res eq/gj/pl "
              f"{res['equil']:.1e}/{res['gj']:.1e}/{res['pallas']:.1e}")


if __name__ == "__main__":
    main()
