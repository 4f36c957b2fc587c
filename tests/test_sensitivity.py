"""Sensitivity floors for the hand-tuned stabilizer constants (VERDICT r3
weak #7): the constants that govern correctness-critical behavior must not
sit on a knife edge. ``tools/exp_stabilizers.py`` holds the full-run A/B
table; this is the committed cheap twin — a 6-step slice of the flagship
overtaking run (ref ``decentralized_overtaking_ADMM.py:31-96``) at 3x
perturbations of each constant, asserting the safety/convergence envelope
is unchanged.

The slice covers approach steps (the conflict window proper, steps 26-30,
is pinned by tests/test_flagship_convergence.py at the tuned values); what
this guards is that a 3x drift of the penalty weights does not silently
break feasibility handling or the certificate exchange in the nominal
regime.
"""
import numpy as np
import pytest

from dlp_admm_tpu.config import ObcaConfig, SolverConfig
from dlp_admm_tpu.models.obca import ConsensusObcaPlanner

N_STEPS = 6


def run_slice(elastic_w=None, cert_norm_bound=None, n_steps=N_STEPS,
              **planner_kw):
    pl = ConsensusObcaPlanner(
        ObcaConfig(horizon=8, min_dis=0.1, rho=100.0, max_admm_iters=50),
        scfg=SolverConfig(ip_iters=40, ip_tol=1e-6), **planner_kw)
    if elastic_w is not None:
        # correctness-critical exact-penalty weight (obca.py ctor); above
        # the optimal multipliers any value reproduces the hard-constraint
        # solution — that range is what this sweep pins
        pl.elastic_w = elastic_w
    if cert_norm_bound is not None:
        pl.cert_norm_bound = cert_norm_bound
    st, its, prs, dus, cvs, oks, kkts, gaps = pl.run_scan(
        n_steps=n_steps, return_health=True)
    p = st[..., :2]
    d = np.linalg.norm(p[:, 0] - p[:, 1], axis=-1)
    return its, float(d.min()), oks


@pytest.mark.parametrize("elastic_w", [3.0e6, 3.0e7])
def test_elastic_w_3x_band(elastic_w):
    """l1 exact-penalty weight perturbed 3x down/up from the tuned 1e7:
    every approach step still converges, full safety margin, all inner
    NLPs healthy."""
    its, min_d, oks = run_slice(elastic_w=elastic_w)
    assert np.all(its < 50), f"capped steps at elastic_w={elastic_w}: {its}"
    assert min_d > 3.5, f"margin regressed at elastic_w={elastic_w}: {min_d}"
    assert np.min(oks) > 0.99, "inner NLP health regressed"


@pytest.mark.parametrize("tau0,growth", [(500.0, 1.4), (1000.0, 1.6)])
def test_annealed_prox_band(tau0, growth):
    """The round-4 limit-cycle breaker's constants perturbed around the
    tuned (700, 1.5) — the constants ADVICE r4 flagged as the sensitive
    ones. This slice covers the conflict-window ENTRY (steps 10-13, where
    the round-4 f32/f64 traces show the first capped steps); the asserted
    envelope is the safety/feasibility claim, not the exact 42/42 iteration
    profile (which tools/exp_conflict_window.py's committed table shows
    varies across (tau0, growth) — e.g. (1000, 1.45) converged 38/42).
    """
    its, min_d, oks = run_slice(n_steps=14, local_prox=tau0,
                                prox_growth=growth)
    assert int((its < 50).sum()) >= 12, \
        f"(tau0={tau0}, g={growth}): {its}"
    assert min_d > 3.5, f"margin regressed at ({tau0}, {growth}): {min_d}"


@pytest.mark.parametrize("bound", [0.9, 0.99])
def test_cert_norm_bound_band(bound):
    """(4c) strict-interior margin swept across [0.9, 0.99] (tuned: 0.95).
    The exchanged certificates must stay usable in the locals' hard (5b)
    rows across the band. (lamb_ij_relax / lamb_bar_decay / dual_rho have
    full-run A/B evidence in tools/exp_stabilizers.py.)"""
    its, min_d, oks = run_slice(cert_norm_bound=bound)
    assert np.all(its < 50), f"capped steps at bound={bound}: {its}"
    assert min_d > 3.5, f"margin regressed at bound={bound}: {min_d}"
    assert np.min(oks) > 0.99, "inner NLP health regressed"
