"""Ad-hoc: the flagship's full 42-step overtaking run (VERDICT r3 next #3/#6).

Reproduces the PARITY.md claim (37/42 steps converged, mean ~13 iterations,
min distance > 3.5 m, all inner NLPs converged) and A/Bs the conflict-window
stabilizer candidates (proximal regularization on the edge z-states).

Usage:  python tools/exp_flagship.py [tau ...]
  (each tau is an edge proximal weight to test; 0 = round-3 baseline)

Ref driver being matched: decentralized_overtaking_ADMM.py:31-96 (42 MPC
steps = T/dt - horizon = 50 - 8, cap 50, thresholds 0.01).
"""
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from dlp_admm_tpu.config import ObcaConfig, SolverConfig
from dlp_admm_tpu.models.obca import ConsensusObcaPlanner


def run(tau, dtype, platform):
    jax.config.update("jax_platforms", platform)
    if dtype == jnp.float64:
        jax.config.update("jax_enable_x64", True)
    kw = {} if tau is None else dict(edge_prox=tau)
    pl = ConsensusObcaPlanner(
        ObcaConfig(horizon=8, min_dis=0.1, rho=100.0, max_admm_iters=50),
        scfg=SolverConfig(ip_iters=40, ip_tol=1e-6), dtype=dtype, **kw)
    t0 = time.time()
    states, its, prs, dus, cvs = pl.run_scan()
    el = time.time() - t0
    p = states[..., :2]
    d = np.linalg.norm(p[:, 0] - p[:, 1], axis=-1)
    n = len(its)
    res_ok = its < 50           # while_loop exited early <=> residuals <= 0.01
    capped_at = np.nonzero(~res_ok)[0]
    print(f"tau={tau} {platform}/"
          f"{'f64' if dtype == jnp.float64 else 'f32'}: "
          f"res_ok {int(res_ok.sum())}/{n}, cc_ok {int(cvs.sum())}/{n}, "
          f"mean_it={its.mean():.1f}, min_d={d.min():.3f} m, "
          f"capped_steps={[int(i) for i in capped_at]}, wall={el:.1f}s",
          file=sys.stderr, flush=True)
    return res_ok, its, d


if __name__ == "__main__":
    taus = [None if a == "base" else float(a) for a in sys.argv[1:]] or [None]
    for tau in taus:
        run(tau, jnp.float64, "cpu")
