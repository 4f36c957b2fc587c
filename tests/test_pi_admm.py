"""PI-ADMM engine end-to-end regression tests (SURVEY.md §4d).

The reference's de-facto oracle is visual: trajectories swerve and vehicles
never collide (SURVEY.md §4). These tests pin that behavior numerically on a
shortened crossing scenario (vehicles start near the intersection so the
collision machinery engages within a few MPC steps).
"""
import jax.numpy as jnp
import numpy as np
import pytest

from dlp_admm_tpu.config import (DualStrategy, DualUpdateConfig, PiAdmmConfig,
                                 SolverConfig, WindupMode)
from dlp_admm_tpu.models.pi_admm import PiAdmmEngine

SCFG = SolverConfig(qp_iters=120, qp_tol=1e-6)
# start 1 s from the crossing: conflict begins almost immediately
XT_NEAR = np.array([[-3.0, 0.0, 0.0], [0.0, 6.0, -np.pi / 2]])


def make_engine(layout, dual_cfg=None, **kw):
    cfg = PiAdmmConfig()
    dual_cfg = dual_cfg or DualUpdateConfig()
    return PiAdmmEngine(cfg, dual_cfg, SCFG, layout=layout, **kw)


def min_distance(rec):
    xs, ys = rec.xt[:, :, 0], rec.xt[:, :, 1]
    return float(np.min(np.sqrt((xs[:, 0] - xs[:, 1]) ** 2
                                + (ys[:, 0] - ys[:, 1]) ** 2)))


class TestClassicEngine:
    def test_converges_and_avoids_collision(self):
        eng = make_engine("classic")
        rec = eng.run(xt0=XT_NEAR, n_steps=10)
        # every step converged within the cap and produced finite state
        assert np.all(np.isfinite(rec.xt))
        assert rec.iterations.max() <= eng.cfg.iter_num
        # vehicles swerved (nonzero steering applied) and kept clearance
        assert np.abs(rec.u_applied).max() > 0.05
        assert min_distance(rec) > 1.0
        # plant advanced ~ dt * speed per step
        step_len = np.linalg.norm(np.diff(rec.xt[:, 0, :2], axis=0), axis=1)
        np.testing.assert_allclose(step_len, 0.4, atol=0.15)

    def test_no_conflict_tracks_reference(self):
        """Far-apart vehicles: controls stay near zero, tracking the straight
        reference lines."""
        eng = make_engine("classic")
        xt0 = np.array([[-10.0, 0.0, 0.0], [0.0, 20.0, -np.pi / 2]])
        rec = eng.run(xt0=xt0, n_steps=3)
        assert np.abs(rec.u_applied).max() < 0.02
        assert rec.iterations.max() <= 5
        # veh0 moves along +x at 4 m/s, veh1 along -y at 8 m/s
        np.testing.assert_allclose(rec.xt[-1, 0, 0], -10 + 3 * 0.4, atol=0.05)
        np.testing.assert_allclose(rec.xt[-1, 1, 1], 20 - 3 * 0.8, atol=0.05)

    def test_plain_strategy_runs(self):
        dual_cfg = DualUpdateConfig(strategy=DualStrategy.PLAIN,
                                    windup=WindupMode.SAT,
                                    adaptive_rho=False)
        eng = make_engine("classic", dual_cfg=dual_cfg)
        rec = eng.run(xt0=XT_NEAR, n_steps=6)
        assert np.all(np.isfinite(rec.xt))
        assert min_distance(rec) > 0.8

    def test_sigmoid_strategy_runs(self):
        dual_cfg = DualUpdateConfig(strategy=DualStrategy.PI_SIGMOID,
                                    windup=WindupMode.SAT_BACKCALC,
                                    windup_sat=30.0, ki=3.0,
                                    adaptive_rho=False)
        eng = make_engine("classic", dual_cfg=dual_cfg)
        rec = eng.run(xt0=XT_NEAR, n_steps=6)
        assert np.all(np.isfinite(rec.xt))
        assert min_distance(rec) > 0.8


class TestPairwiseEngine:
    def test_gating_early_exit(self):
        """No conflict anywhere: the coordination loop exits after one
        iteration with zero duals (ref casadi/main.py:115-116)."""
        eng = make_engine("pairwise")
        xt0 = np.array([[-10.0, 0.0, 0.0], [0.0, 20.0, -np.pi / 2]])
        rec = eng.run(xt0=xt0, n_steps=3)
        assert np.all(rec.iterations == 1)
        np.testing.assert_allclose(rec.dual_min, 0.0)
        np.testing.assert_allclose(rec.dual_max, 0.0)

    def test_converges_and_avoids_collision(self):
        eng = make_engine("pairwise")
        rec = eng.run(xt0=XT_NEAR, n_steps=10)
        assert np.all(np.isfinite(rec.xt))
        assert np.abs(rec.u_applied).max() > 0.05
        assert min_distance(rec) > 1.0

    def test_reference_al_semantics_flag(self):
        """al_mask_active_pairs=False reproduces the reference's
        unconditional AL-to-zero pull (casadi/PI_ADMM_class.py:125-129)."""
        eng = make_engine("pairwise", al_mask_active_pairs=False)
        xt0 = np.array([[-10.0, 0.0, 0.0], [0.0, 20.0, -np.pi / 2]])
        rec = eng.run(xt0=xt0, n_steps=2)
        # the AL term pulls positions toward the zero consensus cells, so
        # controls are no longer ~zero even without conflict
        assert np.all(np.isfinite(rec.xt))

    def test_three_vehicles(self):
        """Pairwise layout generalizes beyond the reference's 2 vehicles."""
        cfg = PiAdmmConfig(num_veh=3, speeds=(4.0, 8.0, 4.0))
        eng = PiAdmmEngine(cfg, DualUpdateConfig(), SCFG, layout="pairwise")
        xt0 = np.array([[-3.0, 0.0, 0.0], [0.0, 6.0, -np.pi / 2],
                        [3.0, 4.0, np.pi]])
        rec = eng.run(xt0=xt0, n_steps=5)
        assert np.all(np.isfinite(rec.xt))
        assert rec.xt.shape == (5, 3, 3)


class TestEdgeAffine:
    def test_closed_form_matches_ad(self):
        """The cumsum-based edge Jacobian equals jacfwd of the rollout."""
        from dlp_admm_tpu.models.pi_admm import _edge_affine, _edge_affine_ad
        rng = np.random.default_rng(3)
        for _ in range(4):
            xt = jnp.asarray(rng.normal(size=3))
            u0 = jnp.asarray(0.3 * rng.normal(size=12))
            spd = jnp.asarray(float(rng.uniform(2.0, 9.0)))
            p0, b = _edge_affine(xt, spd, u0, 0.1, 1.0)
            p0_ad, b_ad = _edge_affine_ad(xt, spd, u0, 0.1, 1.0)
            np.testing.assert_allclose(np.asarray(p0), np.asarray(p0_ad),
                                       rtol=1e-10, atol=1e-10)
            np.testing.assert_allclose(np.asarray(b), np.asarray(b_ad),
                                       rtol=1e-8, atol=1e-10)

    def test_local_closed_form_matches_ad(self):
        """The outer-ramp local Jacobian equals jacfwd of the local rollout."""
        from dlp_admm_tpu.models.pi_admm import (_local_affine,
                                                 _local_affine_ad)
        rng = np.random.default_rng(7)
        for _ in range(4):
            xt = jnp.asarray(rng.normal(size=3))
            spd = jnp.asarray(float(rng.uniform(2.0, 9.0)))
            p0, b = _local_affine(xt, spd, 12, 0.1, 1.0)
            p0_ad, b_ad = _local_affine_ad(xt, spd, 12, 0.1, 1.0)
            np.testing.assert_allclose(np.asarray(p0), np.asarray(p0_ad),
                                       rtol=1e-10, atol=1e-10)
            np.testing.assert_allclose(np.asarray(b), np.asarray(b_ad),
                                       rtol=1e-8, atol=1e-10)


class TestFusedRunner:
    """run_fused_batch (one while_loop over the whole run) must reproduce the
    per-step driver exactly — same trajectories AND same per-step iteration
    counts — while executing only max-over-lanes *total* iterations (the
    bench's loop-efficiency recovery; VERDICT r3 next-step #1)."""

    def _engine(self, cfg, refs):
        return PiAdmmEngine(
            cfg, DualUpdateConfig(windup_sat=200.0),
            SolverConfig(qp_iters=16, qp_tol=1e-4, qp_segments=1,
                         qp_ns_iters=10, qp_unroll=16),
            layout="pairwise", refs=refs, n_sqp=1,
            carry_admm_state=True, dtype=jnp.float64)

    def test_matches_per_step_driver(self):
        from dlp_admm_tpu.scenarios import pi_admm_overtake_refs
        num_veh, horizon, n_steps = 4, 8, 16
        speeds = tuple(8.0 if i % 2 == 0 else 4.0 for i in range(num_veh))
        cfg = PiAdmmConfig(num_veh=num_veh, horizon=horizon, speeds=speeds,
                           dis_thres=3.5, iter_num=20, eps_pri=0.5,
                           eps_dual=0.5, stop_needs_clearance=False,
                           eps_per_edge=True)
        refs, xt0 = pi_admm_overtake_refs(cfg)
        eng = self._engine(cfg, refs)

        rng = np.random.default_rng(0)
        n_lane = 2
        xts = np.asarray(xt0)[None] + np.concatenate(
            [0.4 * rng.normal(size=(n_lane, num_veh, 2)),
             np.zeros((n_lane, num_veh, 1))], axis=-1)
        frec = eng.run_fused_batch(
            jnp.asarray(xts), jnp.zeros((n_lane, num_veh, horizon)), n_steps)

        totals = np.asarray(frec.iterations).sum(axis=1)
        for lane in range(n_lane):
            rec = eng.run_scan(xt0=xts[lane], n_steps=n_steps)
            np.testing.assert_array_equal(np.asarray(frec.iterations[lane]),
                                          np.asarray(rec.iterations))
            np.testing.assert_allclose(np.asarray(frec.xt[lane]),
                                       np.asarray(rec.xt), atol=1e-8)
            np.testing.assert_allclose(np.asarray(frec.u_applied[lane]),
                                       np.asarray(rec.u_applied), atol=1e-8)
            np.testing.assert_allclose(np.asarray(frec.primal_res[lane]),
                                       np.asarray(rec.primal_res), atol=1e-8)
        # the conflict window must actually engage (multi-iteration steps)
        # and lanes must diverge so the fusion has waste to recover
        assert totals.max() > n_steps
        # hardware trips of the fused batch = max-over-lanes total
        assert totals.max() <= n_steps * cfg.iter_num

    def test_requires_pairwise(self):
        eng = make_engine("classic")
        with pytest.raises(ValueError):
            eng.run_fused_batch(jnp.zeros((1, 2, 3)), jnp.zeros((1, 2, 5)), 2)


class TestJointEdgeQp:
    """The stacked all-vehicle edge QP (the old line's formulation,
    casadi_old_PI_ADMM/PI_ADMM_class.py:141-179) — VERDICT r3 next #9."""

    def test_v2_joint_equals_pair(self):
        """For 2 vehicles the joint problem IS the single-pair problem, so
        both solvers must return the same controls and rollouts."""
        from dlp_admm_tpu.models.pi_admm import (_solve_joint_edge_qp,
                                                 _solve_pair_edge_qp)
        cfg = PiAdmmConfig()
        h = cfg.horizon
        rng = np.random.default_rng(5)
        xt = jnp.asarray(np.array([[-1.0, 0.0, 0.1], [0.5, 2.0, -1.4]]))
        spd = jnp.asarray([4.0, 8.0])
        pos_old = jnp.asarray(rng.normal(size=(2, 2 * (h + 1))))
        dual = jnp.asarray(0.1 * rng.normal(size=(2, 2 * (h + 1))))
        last_dis = jnp.asarray(rng.normal(size=(1, 2)))
        u0 = jnp.asarray(0.1 * rng.normal(size=(2, h)))
        scfg = SolverConfig(qp_iters=200, qp_tol=1e-9)
        uj, hatj, _, _ = _solve_joint_edge_qp(xt, spd, pos_old, dual,
                                              last_dis, u0, cfg, scfg)
        up, hatp, _, _ = _solve_pair_edge_qp(xt, spd, pos_old, dual,
                                             last_dis[0], u0, cfg, scfg)
        np.testing.assert_allclose(np.asarray(uj), np.asarray(up), atol=1e-6)
        np.testing.assert_allclose(np.asarray(hatj), np.asarray(hatp),
                                   atol=1e-6)

    def test_classic_three_vehicles(self):
        """The classic (stacked) layout now runs at N > 2: one joint edge
        QP over all vehicles with a hinge per pair."""
        cfg = PiAdmmConfig(num_veh=3, speeds=(4.0, 8.0, 4.0))
        eng = PiAdmmEngine(cfg, DualUpdateConfig(), SCFG, layout="classic")
        xt0 = np.array([[-3.0, 0.0, 0.0], [0.0, 6.0, -np.pi / 2],
                        [3.0, 4.0, np.pi]])
        rec = eng.run(xt0=xt0, n_steps=5)
        assert np.all(np.isfinite(rec.xt))
        assert rec.xt.shape == (5, 3, 3)
        # all three vehicles moved every step
        steps = np.linalg.norm(np.diff(
            np.concatenate([xt0[None, :, :2], rec.xt[:, :, :2]]), axis=0),
            axis=-1)
        assert steps.min() > 0.05
