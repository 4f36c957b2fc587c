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
