"""Ad-hoc: per-iteration anatomy of the flagship's conflict-window limit
cycle (step 27 of the 42-step overtaking run, the first capped step).

Uses :meth:`ConsensusObcaPlanner.mpc_step_trace` on the checkpointed carry
at step 27. Findings (CPU f64, tuned profile):

- the consensus z's pass-side gap (mean y_0 - y_1) flips SIGN 17-25 times
  in 50 iterations — the pass-left/right branch genuinely alternates;
- the inner local/edge NLPs themselves fail to converge on most
  iterations (nlp_ok min over {local, edge} is 1.0 on only ~35% of
  iterations at ip_iters=40), so the outer loop iterates on half-solved
  subproblems;
- raising the inner budget does NOT fix it: ip_iters=80 -> nlp_ok-frac
  0.64, primal ~16 (vs threshold 0.01); ip_iters=160 -> nlp_ok-frac 0.10,
  primal ~50. The conflict-window local NLPs are themselves oscillating
  under the jagged exchanged certificates — a nonconvex pathology, not an
  iteration-budget problem. Matches the damping-family A/B
  (tools/exp_stabilizers.py): no stabilizer in that family helps.

The reference caps on the same steps and proceeds
(decentralized_overtaking_ADMM.py:86-90); parity holds.

Usage: PYTHONPATH=. python tools/exp_limit_cycle.py
"""
import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402

from dlp_admm_tpu.config import ObcaConfig, SolverConfig  # noqa: E402
from dlp_admm_tpu.models.obca import ConsensusObcaPlanner  # noqa: E402
from dlp_admm_tpu.utils.checkpoint import load_carry  # noqa: E402

CKPT = "/tmp/flag27.ckpt"


def main():
    base = ConsensusObcaPlanner(
        ObcaConfig(horizon=8, min_dis=0.1, rho=100.0, max_admm_iters=50),
        scfg=SolverConfig(ip_iters=40, ip_tol=1e-6))
    import os
    if not os.path.exists(CKPT):
        base.run(n_steps=27, checkpoint_path=CKPT)
    for ipi in (40, 80, 160):
        pl = ConsensusObcaPlanner(
            ObcaConfig(horizon=8, min_dis=0.1, rho=100.0, max_admm_iters=50),
            scfg=SolverConfig(ip_iters=ipi, ip_tol=1e-6))
        init_state = jnp.asarray(pl.refs[:, 0, :], pl.dtype)
        bs = pl.create_bar_state()
        (init_state, bs), start = load_carry(CKPT, (init_state, bs))
        _, hist = jax.jit(
            lambda s, b: pl.mpc_step_trace(s, b, start, 50))(init_state, bs)
        pr = np.asarray(hist["primal"])
        ok = np.asarray(hist["nlp_ok"]).min(axis=1)
        zy = np.asarray(hist["zy_gap"])
        print(f"ip_iters={ipi}: primal mean(last10)={pr[-10:].mean():.1f} "
              f"nlp_ok-frac={float((ok == 1.0).mean()):.2f} "
              f"zy sign flips={int((np.diff(np.sign(zy)) != 0).sum())}")


if __name__ == "__main__":
    main()
