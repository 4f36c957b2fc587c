"""Flagship demo: consensus-ADMM OBCA overtaking (2 vehicles).

The TPU-native equivalent of running
``Distributed_planner/decentralized_overtaking_ADMM.py``.

Run:  JAX_PLATFORMS=cpu python examples/overtaking_consensus.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.abspath(__file__)), ".."))

import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np

from dlp_admm_tpu.config import Formulation, ObcaConfig, SolverConfig
from dlp_admm_tpu.mpc import run_obca


def main():
    res = run_obca(
        Formulation.CONSENSUS,
        ocfg=ObcaConfig(horizon=8, min_dis=0.1, rho=100.0,
                        max_admm_iters=15),
        scfg=SolverConfig(ip_iters=40, ip_tol=1e-6),
        n_steps=30,
        plot_path="overtaking_consensus.png")
    d = np.linalg.norm(res.states[:, 0, :2] - res.states[:, 1, :2], axis=1)
    print(res.metrics.summary())
    print("min inter-vehicle distance: %.2f m" % d.min())
    print("trajectory plot: overtaking_consensus.png")
    return res


if __name__ == "__main__":
    main()
