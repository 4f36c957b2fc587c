"""Ad-hoc: conflict-window stabilizer A/B on the flagship's 42-step run
(VERDICT r3 next #6 — kill the 5 capped conflict-window steps).

Every candidate measured (CPU f64, tuned profile rho=100, cap 50; base =
res_ok 37/42, capped steps 26-30, the overtaking pass itself):

  base                 res_ok 37/42  mean_it 13.1  capped [26..30]
  cap=150              res_ok 37/42  capped steps still cap with primal
                       residuals 1.2-48 -> a genuine LIMIT CYCLE in the
                       pass-side branch decision, not slowness
  edge_prox tau=1      res_ok 34/42  (worse; also 5/20 -> 30/32)
  lamb_ij_relax 0.15   res_ok 35/42
  lamb_ij_relax 0.5    res_ok 36/42
  dual_rho 30          res_ok 35/42
  dual_rho 10          res_ok 28/42
  lamb_bar_decay 0.3   res_ok 34/42
  relax 0.15 + dr 30   res_ok 33/42
  hysteresis (freeze lamb_ij while primal rises), relax 0.3/0.5/1.0:
                       res_ok 33/36/35 /42

Conclusion: the oscillation is robust to every damping-class stabilizer
in THIS family; the tuned base profile is the optimum of it. The reference
caps on the same steps (decentralized_overtaking_ADMM.py:86-90) and
proceeds. RESOLVED later in round 4 by annealed LOCAL proximal damping
(local_prox=700, prox_growth=1.5 -> 42/42 steps converge): the full
investigation, including why branch commitment and windup changes fail,
is in tools/exp_conflict_window.py.

Usage: PYTHONPATH=. python tools/exp_stabilizers.py
"""
import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from dlp_admm_tpu.config import ObcaConfig, SolverConfig  # noqa: E402
from dlp_admm_tpu.models.obca import ConsensusObcaPlanner  # noqa: E402


def run(tag, ocfg_kw=None, **kw):
    pl = ConsensusObcaPlanner(
        ObcaConfig(horizon=8, min_dis=0.1, rho=100.0, max_admm_iters=50,
                   **(ocfg_kw or {})),
        scfg=SolverConfig(ip_iters=40, ip_tol=1e-6), **kw)
    st, its, prs, dus, cvs = pl.run_scan()
    capped = np.nonzero(its >= 50)[0]
    p = st[..., :2]
    d = np.linalg.norm(p[:, 0] - p[:, 1], axis=-1)
    print(f"{tag}: res_ok {int((its < 50).sum())}/42 mean_it={its.mean():.1f}"
          f" capped={capped.tolist()} min_d={d.min():.3f}", flush=True)


if __name__ == "__main__":
    run("base")
    run("edge_prox1", edge_prox=1.0)
    run("relax0.5", lamb_ij_relax=0.5)
    run("dual_rho30", ocfg_kw=dict(dual_rho=30.0))
    run("decay0.3", lamb_bar_decay=0.3)
    run("hyst", lamb_ij_hysteresis=True)
