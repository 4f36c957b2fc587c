"""A/B: dense-KKT vs staged block-tridiagonal IP on the OBCA solves.

VERDICT r2 #5 done-criterion: measured speedup on the H=15 centralized and
H=8 consensus local solves, and the centralized planner tractable at V=8+.
Run on the TPU (or CPU with JAX_PLATFORMS=cpu for a structural check):

    python tools/exp_kkt.py [V ...]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
# NOTE: do NOT launch with PYTHONPATH=/root/repo — it breaks the axon TPU
# plugin discovery in this image; the sys.path insert above is enough.
import jax
import jax.numpy as jnp
import numpy as np

from dlp_admm_tpu.config import ObcaConfig, SolverConfig
from dlp_admm_tpu.models.obca import CentralizedObcaPlanner, \
    ConsensusObcaPlanner

DTYPE = jnp.float32 if jax.devices()[0].platform != "cpu" else jnp.float64


def _time(fn, *args, reps=3):
    t0 = time.time()
    out = fn(*args)
    jax.block_until_ready(out)
    compile_s = time.time() - t0
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return compile_s, (time.time() - t0) / reps


def bench_centralized(v):
    rows = []
    for staged in (True, False):
        if not staged and v > 4:
            rows.append((staged, float("nan"), float("nan")))
            continue   # dense Hessian assembly explodes past V=4
        pl = CentralizedObcaPlanner(
            ObcaConfig(num_veh=v, horizon=15, min_dis=1.0),
            scfg=SolverConfig(ip_iters=40, ip_tol=1e-6),
            use_staged=staged, dtype=DTYPE)
        x0 = jnp.asarray(pl.refs[:, 0, :], DTYPE)
        warm = pl._warm_start(pl.refs[:, :15, :])
        fn = jax.jit(lambda s, w: pl._solve_impl(s, jnp.asarray(0, jnp.int32),
                                                 w))
        comp, run = _time(fn, x0, warm)
        kkt = float(fn(x0, warm)[3].kkt_error)
        print(f"centralized V={v:2d} staged={int(staged)}: "
              f"compile={comp:7.1f}s run={run * 1e3:9.2f}ms kkt={kkt:.2e}",
              flush=True)
        rows.append((staged, comp, run))
    if len(rows) == 2 and np.isfinite(rows[1][2]):
        print(f"  -> speedup x{rows[1][2] / rows[0][2]:.2f}", flush=True)


def bench_local(v=2, h=8):
    for staged in (True, False):
        pl = ConsensusObcaPlanner(
            ObcaConfig(num_veh=v, horizon=h),
            scfg=SolverConfig(ip_iters=40, ip_tol=1e-6),
            use_staged=staged, dtype=DTYPE)
        bs = pl.create_bar_state()
        init = jnp.asarray(pl.refs[:, 0, :], DTYPE)
        ref_win = pl.refs[:, :h, :]
        rho = jnp.asarray(100.0, DTYPE)
        mask = jnp.ones((v, v - 1), DTYPE)
        p = pl._local_params(bs, init, ref_win, rho, mask)
        x0 = pl._local_warm(ref_win, p)

        from dlp_admm_tpu.solvers.ip import solve_nlp
        from dlp_admm_tpu.solvers.ip_staged import solve_staged
        if staged:
            sp = pl._local_staged_params(bs, init, ref_win, rho, mask)
            w0 = jax.vmap(pl._loc_to_staged)(x0)
            fn = jax.jit(lambda ww, pp: jax.vmap(
                lambda a, b: solve_staged(pl._local_staged, a, b, pl.scfg)
            )(ww, pp).w)
            comp, run = _time(fn, w0, sp)
        else:
            fn = jax.jit(lambda xx, pp: jax.vmap(
                lambda a, b: solve_nlp(pl._local_nlp, a, b, pl.scfg)
            )(xx, pp).x)
            comp, run = _time(fn, x0, p)
        print(f"local V={v} H={h} staged={int(staged)}: "
              f"compile={comp:7.1f}s run={run * 1e3:9.2f}ms", flush=True)


if __name__ == "__main__":
    vs = [int(a) for a in sys.argv[1:]] or [2, 4, 8]
    bench_local()
    for v in vs:
        bench_centralized(v)
