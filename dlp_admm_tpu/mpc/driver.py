"""Unified receding-horizon driver: one entry point for every formulation.

The reference's "API" is running one of ten top-level scripts (SURVEY.md
§1 L5); here a single config-driven runner selects the formulation
(:class:`~dlp_admm_tpu.config.Formulation`), executes the MPC loop with
metrics/checkpointing, and returns a structured result. This is the
config-system surface demanded by SURVEY.md §5 ("scenario, horizon, num_veh,
formulation, dual-update, windup, delay model, solver iterations, mesh
shape").
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

from ..config import (DualUpdateConfig, Formulation, ObcaConfig, PiAdmmConfig,
                      SolverConfig, VehicleConfig)
from ..utils.metrics import RunMetrics
from ..utils.plotting import plot_trajectories


@dataclasses.dataclass
class RunResult:
    states: np.ndarray          # [T+1, V, state_dim]
    metrics: RunMetrics
    extras: dict


def run_obca(formulation: Formulation = Formulation.CONSENSUS,
             ocfg: Optional[ObcaConfig] = None,
             vcfg: Optional[VehicleConfig] = None,
             scfg: SolverConfig = SolverConfig(),
             n_steps: Optional[int] = None,
             plot_path: Optional[str] = None,
             **planner_kwargs) -> RunResult:
    """Run an OBCA-line formulation end to end.

    ``CENTRALIZED`` ≙ ``centralized_overtaking.py`` (+ ``use_delay_tightening``
    for the stochastic variant), ``CONSENSUS`` ≙
    ``decentralized_overtaking_ADMM.py``, ``BILEVEL`` ≙ the MISC line,
    ``TIGHTENING`` ≙ ``decentralized_overtaking_tighting.py``.

    ``vcfg=None`` selects the formulation's reference default: the tighting
    line's ``veh_config.py:18`` variant (T=7, prob=0.99) for
    ``TIGHTENING``/``TIGHTENING_SLACK``, the plain ``VehicleConfig`` for the
    rest. A caller-supplied ``vcfg`` is always honored.
    """
    from ..models.bilevel import (BilevelObcaPlanner, TighteningObcaPlanner,
                                  TighteningSlackObcaPlanner)
    from ..models.obca import CentralizedObcaPlanner, ConsensusObcaPlanner

    metrics = RunMetrics()
    extras: dict = {}

    if vcfg is None:
        vcfg = (VehicleConfig(T=7.0, prob=0.99)
                if formulation in (Formulation.TIGHTENING,
                                   Formulation.TIGHTENING_SLACK)
                else VehicleConfig())

    if formulation is Formulation.CENTRALIZED:
        ocfg = ocfg or ObcaConfig(horizon=15, min_dis=1.0)
        pl = CentralizedObcaPlanner(ocfg, vcfg, scfg, **planner_kwargs)
        with metrics.step_timer():
            states, ctrls, infos = pl.run(n_steps)
        for t, info in enumerate(infos):
            metrics.log_step(t, info["iters"], kkt=info["kkt"])
        extras["controls"] = ctrls
    elif formulation is Formulation.CONSENSUS:
        ocfg = ocfg or ObcaConfig(horizon=8, min_dis=0.1, rho=100.0,
                                  max_admm_iters=15)
        pl = ConsensusObcaPlanner(ocfg, vcfg, scfg, **planner_kwargs)
        with metrics.step_timer():
            states, iters, residuals, flags = pl.run(n_steps)
        for t, it in enumerate(iters):
            metrics.log_step(t, it, primal=residuals[t][0],
                             dual=residuals[t][1], converged=flags[t])
        extras["converge_flags"] = flags
    elif formulation is Formulation.BILEVEL:
        ocfg = ocfg or ObcaConfig(horizon=8, min_dis=1.0)
        pl = BilevelObcaPlanner(ocfg, vcfg, scfg, **planner_kwargs)
        with metrics.step_timer():
            states, infos = pl.run(n_steps)
        for t, info in enumerate(infos):
            metrics.log_step(t, 1, elastic=float(info["elastic"]))
    elif formulation in (Formulation.TIGHTENING,
                         Formulation.TIGHTENING_SLACK):
        cls = (TighteningSlackObcaPlanner
               if formulation is Formulation.TIGHTENING_SLACK
               else TighteningObcaPlanner)
        ocfg = ocfg or ObcaConfig(horizon=8, min_dis=1.0)
        pl = cls(ocfg, vcfg, scfg, **planner_kwargs)
        with metrics.step_timer():
            states, infos = pl.run(n_steps)
        for t, info in enumerate(infos):
            metrics.log_step(t, 1, elastic=float(info["elastic"]))
    elif formulation is Formulation.ALADIN:
        # ALADIN coordinates the unicycle consensus problem (VERDICT r4
        # next #6): agents = vehicles, coupling = consensus position
        # copies. It is a PiAdmmConfig-shaped instance, so delegate —
        # callers wanting full control use run_pi_admm(layout='aladin').
        return run_pi_admm(scfg=scfg, layout="aladin", n_steps=n_steps,
                           plot_path=plot_path, **planner_kwargs)
    else:
        raise ValueError(f"unknown formulation {formulation}")

    if plot_path:
        plot_trajectories(states, plot_path, vcfg,
                          title=formulation.value)
    extras["planner"] = pl
    return RunResult(states=states, metrics=metrics, extras=extras)


def run_pi_admm(cfg: Optional[PiAdmmConfig] = None,
                dual_cfg: DualUpdateConfig = DualUpdateConfig(),
                scfg: SolverConfig = SolverConfig(),
                layout: str = "classic",
                n_steps: Optional[int] = None,
                xt0: Optional[np.ndarray] = None,
                plot_path: Optional[str] = None,
                **engine_kwargs) -> RunResult:
    """Run the unicycle PI-ADMM planner (``classic`` ≙
    ``casadi_old_PI_ADMM/main.py``, ``pairwise`` ≙ ``casadi/main.py``) or
    the ALADIN coordinator on the same problem (``layout='aladin'`` —
    SURVEY.md §2.4's fifth coordination layout, on a planning instance)."""
    from ..models.pi_admm import PiAdmmEngine

    cfg = cfg or PiAdmmConfig()
    if layout == "aladin":
        from ..models.aladin import AladinUnicyclePlanner
        pl = AladinUnicyclePlanner(cfg, scfg=scfg, **engine_kwargs)
        metrics = RunMetrics()
        with metrics.step_timer():
            states, iters = pl.run(n_steps=n_steps)
        for t, it in enumerate(iters):
            metrics.log_step(t, int(it))
        if plot_path:
            plot_trajectories(states, plot_path, footprints=False,
                              title="aladin")
        return RunResult(states=states, metrics=metrics,
                         extras={"planner": pl, "iterations": iters})
    eng = PiAdmmEngine(cfg, dual_cfg, scfg, layout=layout, **engine_kwargs)
    metrics = RunMetrics()
    with metrics.step_timer():
        rec = eng.run(xt0=xt0, n_steps=n_steps)
    for t in range(len(rec.iterations)):
        metrics.log_step(t, int(rec.iterations[t]),
                         rho=float(rec.rho[t]),
                         dual_min=float(rec.dual_min[t]),
                         dual_max=float(rec.dual_max[t]))
    states = np.concatenate([rec.xt], axis=0)
    if plot_path:
        plot_trajectories(states, plot_path, footprints=False,
                          title=f"pi_admm[{layout}]")
    return RunResult(states=states, metrics=metrics,
                     extras={"u_applied": rec.u_applied})
