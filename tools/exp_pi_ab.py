"""A/B experiment: dual-update strategies x windup modes (sum_iter_num).

Reproduces the reference's PI-vs-plain comparison harness (the ``trad``
toggle of ``casadi_old_PI_ADMM/main.py:16,138`` and ``param.PI`` /
``param.windup`` of ``ADMM_CVX_two_veh_intesection_PI_antiwindup.m:24-25``)
on the canonical 2-vehicle crossing scenario: whole MPC run per variant,
report total consensus iterations (``sum_iter_num``), capped steps, and the
minimum inter-vehicle distance.

Usage: PYTHONPATH=. JAX_PLATFORMS=cpu python tools/exp_pi_ab.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

if os.environ.get("JAX_PLATFORMS") == "cpu":
    # the ambient sitecustomize pins the axon TPU platform programmatically;
    # the env var alone does not force CPU
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402

from dlp_admm_tpu.config import (DualStrategy, DualUpdateConfig,  # noqa: E402
                                 PiAdmmConfig, SolverConfig, WindupMode)
from dlp_admm_tpu.models.pi_admm import PiAdmmEngine  # noqa: E402

VARIANTS = {
    # the reference's trad=1 branch: lam += rho * r, nothing else
    "plain": DualUpdateConfig(
        strategy=DualStrategy.PLAIN, windup=WindupMode.NONE,
        adaptive_rho=False),
    "plain+sat": DualUpdateConfig(
        strategy=DualStrategy.PLAIN, windup=WindupMode.SAT,
        adaptive_rho=False),
    # the paper's algorithm (casadi_old_PI_ADMM/main.py:128-151)
    "pi_reciprocal+aw": DualUpdateConfig(
        strategy=DualStrategy.PI_RECIPROCAL, windup=WindupMode.SAT_BACKCALC,
        adaptive_rho=True),
    "pi_reciprocal (no windup)": DualUpdateConfig(
        strategy=DualStrategy.PI_RECIPROCAL, windup=WindupMode.NONE,
        adaptive_rho=True),
    # the MATLAB sigmoid schedule (ADMM_CVX_..._PI_antiwindup.m:160-188)
    "pi_sigmoid+aw": DualUpdateConfig(
        strategy=DualStrategy.PI_SIGMOID, windup=WindupMode.SAT_BACKCALC,
        windup_sat=30.0, adaptive_rho=False),
}


def matlab_point():
    """The MATLAB file's own operating point
    (``ADMM_CVX_two_veh_intesection_PI_antiwindup.m:6-25,43``): horizon 8,
    beta 1000, Pnorm 5, rho 3.5, windup_sat 30; saturation applies to BOTH
    the plain and PI arms there (the windup block is outside the PI branch,
    ``:172-188``).

    Measured here (CPU f64, eps grid {0.5, 1, 2, 4}): the sigmoid PI does
    NOT reduce iterations at this point (it uses slightly more), but it is
    what makes the closed loop SAFE — plain dual ascent stops early on
    trajectories that violate the 2 m clearance (min_d 1.73-1.80 m across
    the eps grid) while sigmoid+sat keeps >= 2.13 m and adding
    back-calculation widens it to 2.63-4.94 m. Committed as
    ``tests/test_pi_vs_plain.py::test_pi_sigmoid_safety_vs_plain``.
    """
    cfg = PiAdmmConfig(horizon=8, dis_thres=2.0, beta=1000.0, p_norm=5.0,
                       rho=3.5, eps_pri=2.0, eps_dual=2.0)
    scfg = SolverConfig(qp_iters=120, qp_tol=1e-6)
    for name, dc in {
        "plain+sat30": DualUpdateConfig(
            strategy=DualStrategy.PLAIN, windup=WindupMode.SAT,
            windup_sat=30.0, adaptive_rho=False),
        "sig+sat30": DualUpdateConfig(
            strategy=DualStrategy.PI_SIGMOID, windup=WindupMode.SAT,
            windup_sat=30.0, adaptive_rho=False),
        "sig+aw30": DualUpdateConfig(
            strategy=DualStrategy.PI_SIGMOID, windup=WindupMode.SAT_BACKCALC,
            windup_sat=30.0, adaptive_rho=False),
    }.items():
        eng = PiAdmmEngine(cfg, dc, scfg, layout="classic")
        rec = eng.run_scan()
        iters = np.asarray(rec.iterations)
        x = np.asarray(rec.xt)
        d = np.linalg.norm(x[:, 0, :2] - x[:, 1, :2], axis=-1)
        print(f"matlab point: {name:12s} sum_iter={int(iters.sum()):5d} "
              f"capped={int((iters >= cfg.iter_num).sum()):3d} "
              f"min_d={d.min():.2f}")


def main():
    cfg = PiAdmmConfig()
    scfg = SolverConfig(qp_iters=120, qp_tol=1e-6)
    print(f"crossing scenario: {cfg.num_veh} vehicles, H={cfg.horizon}, "
          f"{cfg.n_mpc_steps} MPC steps, eps_pri={cfg.eps_pri}, "
          f"eps_dual={cfg.eps_dual}, iteration cap {cfg.iter_num}")
    rows = []
    for name, dc in VARIANTS.items():
        eng = PiAdmmEngine(cfg, dc, scfg, layout="classic")
        rec = eng.run_scan()
        iters = np.asarray(rec.iterations)
        x = np.asarray(rec.xt)
        d = np.linalg.norm(x[:, 0, :2] - x[:, 1, :2], axis=-1)
        rows.append((name, int(iters.sum()), int((iters >= cfg.iter_num).sum()),
                     float(d.min())))
    base = rows[0][1]
    print(f"{'variant':28s} {'sum_iter_num':>12s} {'capped':>7s} "
          f"{'min_dist':>9s} {'vs plain':>9s}")
    for name, tot, capped, mind in rows:
        print(f"{name:28s} {tot:12d} {capped:7d} {mind:9.2f} {tot/base:9.2f}")


if __name__ == "__main__":
    main()
    matlab_point()
