"""Whole-run ``lax.scan`` MPC drivers match the host-loop drivers exactly.

VERDICT r1 item #6: the scan drivers kill per-step host dispatch; these
tests pin that they are pure re-expressions (identical trajectories and
iteration counts), so either driver can serve any run.
"""
import numpy as np

from dlp_admm_tpu.config import (DualUpdateConfig, ObcaConfig, PiAdmmConfig,
                                 SolverConfig)
from dlp_admm_tpu.models.obca import ConsensusObcaPlanner
from dlp_admm_tpu.models.pi_admm import PiAdmmEngine


class TestScanDriver:
    def test_pi_admm_scan_matches_host_loop(self):
        cfg = PiAdmmConfig(iter_num=4)
        eng = PiAdmmEngine(cfg, DualUpdateConfig(),
                           SolverConfig(qp_iters=60, qp_tol=1e-6),
                           layout="pairwise")
        xt0 = np.array([[-3.0, 0.0, 0.0], [0.0, 6.0, -np.pi / 2]])
        host = eng.run(xt0=xt0, n_steps=5)
        scan = eng.run_scan(xt0=xt0, n_steps=5)
        np.testing.assert_allclose(np.asarray(scan.xt),
                                   np.asarray(host.xt), atol=1e-12)
        np.testing.assert_array_equal(np.asarray(scan.iterations),
                                      np.asarray(host.iterations))
        np.testing.assert_allclose(np.asarray(scan.primal_res),
                                   np.asarray(host.primal_res), atol=1e-12)

    def test_consensus_scan_matches_host_loop(self):
        pl = ConsensusObcaPlanner(
            ObcaConfig(horizon=5, max_admm_iters=2, rho=100.0),
            scfg=SolverConfig(ip_iters=5, ip_tol=1e-6))
        states, iters, _, flags = pl.run(n_steps=3)
        s_states, s_iters, _, _, s_flags = pl.run_scan(n_steps=3)
        np.testing.assert_allclose(s_states, states, atol=1e-12)
        np.testing.assert_array_equal(s_iters, iters)
        np.testing.assert_array_equal(s_flags, np.asarray(flags))
