"""The flagship's full 42-step overtaking run, committed as CI (VERDICT r3
next #3 — the PARITY.md convergence claim backed by an executable test).

Reference driver being matched: the 2-vehicle consensus-ADMM OBCA MPC
(`/root/reference/Distributed_planner/decentralized_overtaking_ADMM.py:31-96`:
42 MPC steps = T/dt - horizon = 50 - 8, ADMM cap 50, primal/dual thresholds
0.01). The reference itself caps on the hardest conflict-window steps
(`:86-90`) at ANY iteration budget — round 4 established they sit on a
pass-side limit cycle — and its de-facto oracle is visual collision-freedom.

With annealed proximal damping of the local solves (``local_prox=700,
prox_growth=1.5`` — the round-4 limit-cycle breaker; investigation record
in ``tools/exp_conflict_window.py``) the full run EXITS UNDER THE
REFERENCE'S OWN STOPPING RULE on every step where the reference caps.
Measured at pin time (CPU f64, tuned profile rho=100, staged locals +
staged edge, lamb_bar_decay=0.5): 42/42 steps at both 0.01 residual
thresholds, mean 19.7 iterations, zero capped steps, min center distance
4.140 m (base profile: 37/42, 3.646 m). Floors below leave margin for the
limit cycle's measured environment sensitivity (base profile varied
34-37/42 across CPU thread configs).

Honesty note (ADVICE r4): those 0.01 residuals are the reference's
CHANGE-based definitions, which the annealed prox partially forces; the
un-fakeable companion is the actual consensus gap ||local - z||_1, also
asserted below — measured median 0.009 across the run, 0.25-0.37 on the
conflict-window steps at exit (safety-valid near-consensus points, not
exact consensus; see PARITY.md "Honesty caveat").
"""
import numpy as np

from dlp_admm_tpu.config import ObcaConfig, SolverConfig
from dlp_admm_tpu.models.obca import ConsensusObcaPlanner


class TestFlagshipFullRun:
    def test_42_step_overtaking_convergence(self):
        pl = ConsensusObcaPlanner(
            ObcaConfig(horizon=8, min_dis=0.1, rho=100.0, max_admm_iters=50),
            scfg=SolverConfig(ip_iters=40, ip_tol=1e-6),
            local_prox=700.0, prox_growth=1.5)
        states, its, prs, dus, cvs, oks, kkts, gaps = pl.run_scan(
            return_health=True)
        n = len(its)
        assert n == 42, n
        assert np.all(np.isfinite(states))

        # converged steps: both residuals at or below the reference's 0.01.
        # Measured 42/42; floor 40 for environment wiggle. The reference
        # NEVER converges the 5 conflict-window steps.
        res_ok = (prs <= 0.011) & (dus <= 0.011)
        assert int(res_ok.sum()) >= 40, \
            f"only {int(res_ok.sum())}/42 steps converged"
        # the early-exit iteration counts agree with the residual flags
        assert np.array_equal(res_ok, its < 50)
        assert its.mean() < 24.0, f"mean iterations regressed: {its.mean()}"

        # collision-free overtake with margin (measured 4.140 m)
        p = states[..., :2]
        d = np.linalg.norm(p[:, 0] - p[:, 1], axis=-1)
        assert d.min() > 3.8, f"min distance regressed: {d.min():.3f}"
        # the overtake actually happened: veh0 (20 m/s) started behind and
        # ends ahead of veh1 (10 m/s)
        assert states[0, 0, 0] < states[0, 1, 0]
        assert states[-1, 0, 0] > states[-1, 1, 0]

        # solver health: the final ADMM iteration's local and edge NLPs
        # converged on (nearly) every step
        assert float(np.mean(oks == 1.0)) >= 0.9, oks.min(axis=0)

        # the ACTUAL consensus gap (not change-based; ADVICE r4): small on
        # the nominal steps (measured median 0.009), bounded through the
        # conflict window (measured max 0.375)
        assert float(np.median(gaps)) < 0.02, np.median(gaps)
        assert float(gaps.max()) < 1.0, gaps.max()
