"""QP-path timing at the bench's QP shapes (VERDICT r2 #6 A/B record).

Measured on TPU v5 lite (round 3), XLA batched path vs the fused per-QP
Pallas segment kernel that used to live in solvers/qp_pallas.py:

    B=2048 n=30 m=59  (bench local QPs):  XLA 0.10 ms | Pallas 39.08 ms
    B=768  n=90 m=150 (bench edge QPs):   XLA 10.59 ms | Pallas 26.20 ms

The per-QP kernel pads each tiny operand to 128 lanes and re-stages it per
program, losing 2.5-390x to XLA's batched fused matmuls — so the kernel was
DELETED (commit history has it). This tool keeps timing the surviving XLA
path at those shapes.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax
import jax.numpy as jnp
import numpy as np

from dlp_admm_tpu.config import SolverConfig
from dlp_admm_tpu.solvers.qp import solve_qp_batch


def make_batch(rng, b, n, m, dtype=jnp.float32):
    g = rng.normal(size=(b, n, n)).astype(np.float32)
    p = np.einsum('bij,bkj->bik', g, g) + 3.0 * np.eye(n, dtype=np.float32)
    q = rng.normal(size=(b, n)).astype(np.float32)
    a = rng.normal(size=(b, m, n)).astype(np.float32)
    lo = np.full((b, m), -1.0, np.float32)
    hi = np.full((b, m), 1.0, np.float32)
    return tuple(jnp.asarray(x, dtype) for x in (p, q, a, lo, hi))


def bench_shape(b, n, m, reps=5):
    rng = np.random.default_rng(0)
    data = make_batch(rng, b, n, m)
    cfg = SolverConfig(qp_iters=16, qp_tol=1e-4, qp_segments=1,
                       qp_ns_iters=10, qp_unroll=16)
    fn = jax.jit(lambda *d: solve_qp_batch(*d, cfg))
    t0 = time.time()
    out = fn(*data)
    jax.block_until_ready(out.x)
    comp = time.time() - t0
    t0 = time.time()
    for _ in range(reps):
        out = fn(*data)
    jax.block_until_ready(out.x)
    run = (time.time() - t0) / reps
    conv = float(jnp.mean(out.converged.astype(jnp.float32)))
    print(f"B={b} n={n} m={m} xla: compile={comp:6.1f}s "
          f"run={run * 1e3:8.2f}ms conv={conv:.2f}", flush=True)


if __name__ == "__main__":
    bench_shape(2048, 30, 59)    # bench local QPs (16 veh x 128 scen)
    bench_shape(768, 90, 150)    # bench edge QPs (24-pair budget x 32 scen)
