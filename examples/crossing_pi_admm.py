"""PI-ADMM demo: 2-vehicle intersection crossing with adaptive-rho PI duals.

The TPU-native equivalent of running ``casadi_old_PI_ADMM/main.py`` (classic)
or ``casadi/main.py`` (pairwise gating) — switch with ``--layout``.

Run:  JAX_PLATFORMS=cpu python examples/crossing_pi_admm.py [classic|pairwise]
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.abspath(__file__)), ".."))

import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np

from dlp_admm_tpu.config import SolverConfig
from dlp_admm_tpu.mpc import run_pi_admm


def main(layout: str = "pairwise"):
    res = run_pi_admm(scfg=SolverConfig(qp_iters=200, qp_tol=1e-7),
                      layout=layout,
                      plot_path=f"crossing_{layout}.png")
    d = np.linalg.norm(res.states[:, 0, :2] - res.states[:, 1, :2], axis=1)
    print(res.metrics.summary())
    print("min inter-vehicle distance: %.2f m" % d.min())
    return res


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "pairwise")
