"""Ad-hoc: cross-formulation parity oracle (VERDICT r3 next #4).

The reference solves the SAME joint problem twice: once as one NLP
(`centralized/optimizer.py:78-102`) and once decomposed by consensus ADMM
(`decentralized/optimizer.py:170-201`). Nothing in the repo checked that the
two formulations agree. This script runs both planners on the identical
2-vehicle overtaking config (same horizon, min_dis, references) and reports
trajectory deviation, objective-cost gap, and min-distance agreement — the
numbers behind tests/test_parity_oracle.py.

Usage: PYTHONPATH=. python tools/exp_parity.py [n_steps]
"""
import sys
import time

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402

from dlp_admm_tpu.config import ObcaConfig, SolverConfig  # noqa: E402
from dlp_admm_tpu.models.obca import (CentralizedObcaPlanner,  # noqa: E402
                                      ConsensusObcaPlanner)


def tracking_cost(states, ctrls, refs, ocfg):
    """The shared objective both formulations minimize per step (ref
    generate_object: r=0.1 I on controls, q=I on state tracking —
    centralized/optimizer.py:104-115; the consensus locals weight with
    r_ctrl/q_state but the *driver-level* comparison uses the realized
    trajectory)."""
    n = states.shape[0]
    err = states[:, :, :2] - np.moveaxis(np.asarray(refs), 1, 0)[:n, :, :2]
    return float(np.sum(err ** 2))


def main(n_steps=30):
    ocfg = ObcaConfig(horizon=8, min_dis=0.1, rho=100.0, max_admm_iters=50)
    scfg = SolverConfig(ip_iters=40, ip_tol=1e-6)

    t0 = time.time()
    cen = CentralizedObcaPlanner(ocfg, scfg=scfg, warm_mode="previous")
    c_states, c_ctrls, c_infos = cen.run(n_steps=n_steps)
    t_cen = time.time() - t0

    t0 = time.time()
    con = ConsensusObcaPlanner(ocfg, scfg=scfg)
    s_states, its, prs, dus, cvs = con.run_scan(n_steps=n_steps)
    t_con = time.time() - t0

    dev = np.linalg.norm(c_states[:, :, :2] - s_states[:, :, :2], axis=-1)
    p_c, p_s = c_states[:, :, :2], s_states[:, :, :2]
    d_c = np.linalg.norm(p_c[:, 0] - p_c[:, 1], axis=-1)
    d_s = np.linalg.norm(p_s[:, 0] - p_s[:, 1], axis=-1)
    cost_c = tracking_cost(c_states, c_ctrls, cen.refs, ocfg)
    cost_s = tracking_cost(s_states, None, con.refs, ocfg)

    print(f"n_steps={n_steps}  wall cen={t_cen:.1f}s con={t_con:.1f}s")
    print(f"max per-step position deviation: {dev.max():.4f} m "
          f"(mean {dev.mean():.4f})")
    print(f"tracking cost: centralized={cost_c:.4f} consensus={cost_s:.4f} "
          f"gap={(cost_s - cost_c) / max(cost_c, 1e-9) * 100:+.2f}%")
    print(f"min distance: centralized={d_c.min():.3f} consensus={d_s.min():.3f}")
    print(f"consensus res_ok {int((its < ocfg.max_admm_iters).sum())}/{len(its)}"
          f" mean_it={its.mean():.1f}")
    print(f"centralized converged {sum(i['converged'] for i in c_infos)}"
          f"/{len(c_infos)}")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 30)
