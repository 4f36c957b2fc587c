"""Multi-vehicle (benchmark-scale) correctness tests."""
import jax.numpy as jnp
import numpy as np

from dlp_admm_tpu.config import DualUpdateConfig, PiAdmmConfig, SolverConfig
from dlp_admm_tpu.models.pi_admm import PiAdmmEngine
from dlp_admm_tpu.scenarios import pi_admm_overtake_refs

SCFG = SolverConfig(qp_iters=80, qp_tol=1e-5)


class TestSixteenVehicles:
    def test_overtake_batch_no_collisions(self):
        """8 lanes x (fast behind, slow ahead): every fast vehicle must keep
        clear of its lane partner; lanes must not mix."""
        num_veh = 16
        cfg = PiAdmmConfig(
            num_veh=num_veh, horizon=10,
            speeds=tuple(8.0 if i % 2 == 0 else 4.0 for i in range(num_veh)),
            dis_thres=2.0, iter_num=8, eps_pri=2.0, eps_dual=2.0,
            stop_needs_clearance=False)
        refs, xt0 = pi_admm_overtake_refs(cfg)
        eng = PiAdmmEngine(cfg, DualUpdateConfig(), SCFG, layout="pairwise",
                           refs=refs, n_sqp=1, pair_budget=16,
                           dtype=jnp.float64)
        rec = eng.run(xt0=xt0, n_steps=8)
        assert np.all(np.isfinite(rec.xt))
        xs, ys = rec.xt[:, :, 0], rec.xt[:, :, 1]
        # in-lane partners never collide (point-mass clearance > 1 m)
        for k in range(0, num_veh, 2):
            d = np.sqrt((xs[:, k] - xs[:, k + 1]) ** 2
                        + (ys[:, k] - ys[:, k + 1]) ** 2)
            assert d.min() > 1.0, f"lane pair {k} collided: {d.min()}"
        # vehicles stay near their lanes (no cross-lane chaos)
        lane_y = np.array([6.0 * (i // 2) for i in range(num_veh)])
        assert np.abs(ys - lane_y[None, :]).max() < 4.0

    def test_pair_budget_does_not_change_2veh_result(self):
        """With one pair, budget >= 1 must be a no-op."""
        cfg = PiAdmmConfig(iter_num=6)
        a = PiAdmmEngine(cfg, DualUpdateConfig(), SCFG, layout="pairwise",
                         pair_budget=1, dtype=jnp.float64)
        b = PiAdmmEngine(cfg, DualUpdateConfig(), SCFG, layout="pairwise",
                         dtype=jnp.float64)
        xt0 = np.array([[-3.0, 0.0, 0.0], [0.0, 6.0, -np.pi / 2]])
        ra = a.run(xt0=xt0, n_steps=4)
        rb = b.run(xt0=xt0, n_steps=4)
        np.testing.assert_allclose(np.asarray(ra.xt), np.asarray(rb.xt),
                                   atol=1e-12)


class TestConsensusMultiVehicle:
    """N > 2 generalization of the consensus-ADMM flagship (neighbour-slot
    layout): two overtaking pairs in adjacent lanes with pair gating."""

    def test_four_vehicle_two_lane_overtake(self):
        from dlp_admm_tpu.config import ObcaConfig
        from dlp_admm_tpu.models.obca import ConsensusObcaPlanner
        pl = ConsensusObcaPlanner(
            ObcaConfig(num_veh=4, horizon=8, min_dis=0.1, max_admm_iters=5,
                       rho=100.0),
            scfg=SolverConfig(ip_iters=40, ip_tol=1e-6),
            gate_pairs=True, gate_thres=12.0)
        states, iters, res, flags = pl.run(n_steps=4)
        assert np.all(np.isfinite(states))
        # lanes 0 and 6: each fast vehicle tracks its 20 m/s ref at the start
        np.testing.assert_allclose(states[:, 0, 0], 2.0 * np.arange(5),
                                   atol=0.5)
        np.testing.assert_allclose(states[:, 2, 0], 2.0 * np.arange(5),
                                   atol=0.5)
        # vehicles stay near their lanes
        lane_y = np.array([0.0, 0.0, 6.0, 6.0])
        assert np.abs(states[:, :, 1] - lane_y[None]).max() < 2.0
        # in-lane partners keep centre separation
        for a, b in [(0, 1), (2, 3)]:
            d = np.linalg.norm(states[:, a, :2] - states[:, b, :2], axis=-1)
            assert d.min() > 2.0

    def test_v2_neighbour_maps_match_reference_reversal(self):
        """For V = 2 the slot gathers must equal the reference's [::-1]."""
        from dlp_admm_tpu.config import ObcaConfig
        from dlp_admm_tpu.models.obca import ConsensusObcaPlanner
        pl = ConsensusObcaPlanner(ObcaConfig(horizon=8))
        bs = pl.create_bar_state()
        other = bs.lamb_ij[pl._nbr, pl._rev]        # [2, 1, N-1, 4]
        np.testing.assert_allclose(np.asarray(other[:, 0]),
                                   np.asarray(bs.lamb_ij[::-1, 0]))
        assert pl.N_FULL == 9 and pl.K == 1

    def test_four_vehicle_tightening(self):
        """N > 2 fixed-dual family: per-pair dual QCQPs batched over
        (pair, timestep); 4 vehicles in two overtaking lanes."""
        from dlp_admm_tpu.config import ObcaConfig
        from dlp_admm_tpu.models.bilevel import TighteningObcaPlanner
        pl = TighteningObcaPlanner(
            ObcaConfig(num_veh=4, horizon=8, min_dis=1.0),
            scfg=SolverConfig(ip_iters=40, ip_tol=1e-6))
        states, infos = pl.run(n_steps=10)
        assert np.all(np.isfinite(states))
        lane_y = np.array([0.0, 0.0, 6.0, 6.0])
        assert np.abs(states[:, :, 1] - lane_y[None]).max() < 2.0
        for a, b in [(0, 1), (2, 3)]:
            d = np.linalg.norm(states[:, a, :2] - states[:, b, :2], axis=-1)
            assert d.min() > 3.5

    def test_thres_per_veh_scaling_converges_v4(self):
        """The reference's 0.01 residual thresholds gate V-vehicle SUMS
        tuned at V=2 — at V >> 2 the same totals are V/2x stricter per
        vehicle (at V=8 every step of the CPU run caps on them,
        tools/exp_obca_batch.py / PARITY.md). ``thres_per_veh`` (the OBCA
        analogue of the PI line's eps_per_edge) scales them by V/2; this
        pins the mechanism at V=4: strictly fewer iterations on every
        step (measured (9,9,3) vs (10,10,4)) at identical safety."""
        from dlp_admm_tpu.config import ObcaConfig
        from dlp_admm_tpu.models.obca import ConsensusObcaPlanner

        def run(per_veh):
            pl = ConsensusObcaPlanner(
                ObcaConfig(num_veh=4, horizon=8, min_dis=0.1,
                           max_admm_iters=12, rho=100.0,
                           thres_per_veh=per_veh),
                scfg=SolverConfig(ip_iters=25, ip_tol=1e-6),
                gate_pairs=True, gate_thres=12.0,
                local_prox=700.0, prox_growth=1.5)
            states, iters, res, flags = pl.run(n_steps=3)
            assert np.all(np.isfinite(states))
            for a, b in [(0, 1), (2, 3)]:
                d = np.linalg.norm(states[:, a, :2] - states[:, b, :2],
                                   axis=-1)
                assert d.min() > 2.0
            return np.asarray(iters)

        it_fixed = run(False)
        it_scaled = run(True)
        assert int(it_scaled.sum()) < int(it_fixed.sum()), \
            (it_fixed, it_scaled)
        assert np.all(it_scaled <= it_fixed), (it_fixed, it_scaled)
