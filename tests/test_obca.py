"""OBCA planner end-to-end tests (SURVEY.md §4d).

Short MPC runs on the overtaking scenario; oracles are the reference's
implicit ones: tracking when separated, swerve-and-separate when close,
finite states throughout.
"""
import jax.numpy as jnp
import numpy as np

from dlp_admm_tpu.config import ObcaConfig, SolverConfig
from dlp_admm_tpu.models.obca import (CentralizedObcaPlanner,
                                      ConsensusObcaPlanner)

SCFG = SolverConfig(ip_iters=40, ip_tol=1e-6)


class TestCentralized:
    def test_tracks_when_separated(self):
        pl = CentralizedObcaPlanner(ObcaConfig(horizon=15, min_dis=1.0),
                                    scfg=SCFG)
        states, ctrls, infos = pl.run(n_steps=3)
        assert all(i["converged"] for i in infos)
        # vehicles track their 20 / 10 m/s references exactly at the start
        np.testing.assert_allclose(states[:, 0, 0],
                                   2.0 * np.arange(4), atol=0.02)
        np.testing.assert_allclose(states[:, 1, 0],
                                   20 + 1.0 * np.arange(4), atol=0.02)
        np.testing.assert_allclose(states[:, :, 1], 0.0, atol=0.02)

    def test_duals_nonnegative_and_norm_bounded(self):
        pl = CentralizedObcaPlanner(ObcaConfig(horizon=15, min_dis=1.0),
                                    scfg=SCFG)
        xs, us, lam, sol = pl.solve_at(pl.refs[:, 0, :], 0)
        assert bool(sol.converged)
        assert float(lam.min()) >= -1e-8
        from dlp_admm_tpu.ops.geometry import halfspaces
        a_mat, _ = halfspaces(xs[:, 1:, :], pl.vcfg, False)
        at_l = np.einsum('tij,ti->tj', np.asarray(a_mat[0]),
                         np.asarray(lam[0, 0]))
        assert np.all(np.linalg.norm(at_l, axis=-1) <= 1.0 + 1e-6)

    def test_delay_tightening_variant_runs(self):
        """Stochastic variant (ref centralized_overtaking_stochastic.py)."""
        pl = CentralizedObcaPlanner(
            ObcaConfig(horizon=15, min_dis=1.0, use_delay_tightening=True),
            scfg=SCFG)
        states, _, infos = pl.run(n_steps=2)
        assert np.all(np.isfinite(states))


class TestIntersection:
    def test_centralized_crossing_collision_free(self):
        """OBCA intersection scenario (ref ``centralized/veh_config.py:50-67``,
        VERDICT r2 #10): two vehicles crossing at right angles — the
        references literally collide at (25, 0), so the joint NLP must
        deviate. ``warm_mode='previous'`` keeps the fixed-budget IP solver
        well-conditioned through the conflict window (the reference instead
        re-seeds from the colliding refs and leans on IPOPT's 1000-iteration
        robustness)."""
        from dlp_admm_tpu.config import VehicleConfig
        from dlp_admm_tpu.scenarios import ref_traj_intersection
        vcfg = VehicleConfig()
        refs = ref_traj_intersection(vcfg, 2)
        pl = CentralizedObcaPlanner(
            ObcaConfig(horizon=15, min_dis=0.5), vcfg,
            SolverConfig(ip_iters=40, ip_tol=1e-6), refs=refs,
            warm_mode="previous")
        states, ctrls, infos = pl.run(n_steps=28)
        assert np.all(np.isfinite(states))
        p = states[:, :, :2]
        d = np.linalg.norm(p[:, 0] - p[:, 1], axis=-1)
        # collision-free crossing: rectangle footprints are ~2.0 m wide, so
        # center distance must stay well above the footprint radius sum
        assert d.min() > 3.0, f"crossing too close: {d.min():.2f} m"
        # both vehicles actually crossed the conflict point at (25, 0)
        # (veh0 along +x, veh1 along -y)
        assert states[-1, 0, 0] > 25.0
        assert states[-1, 1, 1] < -0.5
        # conflict-free early steps converge to tolerance
        assert all(i["converged"] for i in infos[1:8])


class TestConsensus:
    def test_short_run_tracks_and_stays_finite(self):
        pl = ConsensusObcaPlanner(
            ObcaConfig(horizon=8, min_dis=0.1, max_admm_iters=5, rho=100.0),
            scfg=SCFG)
        states, iters, res, flags = pl.run(n_steps=4)
        assert np.all(np.isfinite(states))
        # start is conflict-free: near-reference tracking
        np.testing.assert_allclose(states[:, 0, 0], 2.0 * np.arange(5),
                                   atol=0.5)
        np.testing.assert_allclose(states[:, :, 1], 0.0, atol=0.6)

    def test_bar_state_shift(self):
        pl = ConsensusObcaPlanner(ObcaConfig(horizon=8), scfg=SCFG)
        bs = pl.create_bar_state()
        bs = bs._replace(local_x=jnp.arange(2 * 7 * 5, dtype=jnp.float64
                                            ).reshape(2, 7, 5))
        shifted = pl.shift_bar_state(bs)
        np.testing.assert_allclose(np.asarray(shifted.local_x[:, :-1]),
                                   np.asarray(bs.local_x[:, 1:]))
        np.testing.assert_allclose(np.asarray(shifted.local_x[:, -1]),
                                   np.asarray(bs.local_x[:, -1]))

    def test_check_converge_semantics(self):
        """check_converge (ref optimizer.py:225-235): true iff the coupled
        pairing equalities hold and the separation values clear min_dis."""
        pl = ConsensusObcaPlanner(ObcaConfig(horizon=8, min_dis=0.1),
                                  scfg=SCFG)
        bs = pl.create_bar_state()
        # construct an exact certificate: vehicles far apart along x,
        # lambda on the facing faces with weight w
        from dlp_admm_tpu.ops.geometry import halfspaces
        x0 = np.stack([np.stack([np.arange(1, 8) * 1.0, np.zeros(7),
                                 np.zeros(7), np.zeros(7), np.zeros(7)],
                                axis=-1),
                       np.stack([20 + np.arange(1, 8) * 1.0, np.zeros(7),
                                 np.zeros(7), np.zeros(7), np.zeros(7)],
                                axis=-1)])
        a_mat, b = halfspaces(jnp.asarray(x0), pl.vcfg, False)
        lamb = np.zeros((2, 1, 7, 4))     # [V, slots, N-1, 4]
        # veh0: weight on its +x face; veh1: weight on its -x face
        for v, direction in [(0, np.array([1.0, 0])),
                             (1, np.array([-1.0, 0]))]:
            rows = np.argmax(np.einsum('tij,j->ti', np.asarray(a_mat[v]),
                                       direction), axis=-1)
            for t, r in enumerate(rows):
                lamb[v, 0, t, r] = 1.0
        bs = bs._replace(a_mat=a_mat, b=b, lamb_ij=jnp.asarray(lamb))
        assert bool(pl.check_converge(bs))
        # shrink the gap below min_dis: fails
        x0[1, :, 0] -= 19.0 + 2.6
        a2, b2 = halfspaces(jnp.asarray(x0), pl.vcfg, False)
        bs2 = bs._replace(a_mat=a2, b=b2)
        assert not bool(pl.check_converge(bs2))


class TestScenarioBatchRunners:
    def test_batch_matches_single_and_scan_matches_steps(self):
        """The scenario-batched drivers (VERDICT r4 missing #2): an
        unperturbed lane of ``run_batch_steps`` / ``run_scan_batch`` must
        reproduce the single-scenario ``run_scan`` trajectory, and the two
        batch drivers must agree with each other (same program, scan vs
        host step loop)."""
        import jax
        import jax.numpy as jnp

        pl = ConsensusObcaPlanner(
            ObcaConfig(horizon=8, min_dis=0.1, rho=100.0, max_admm_iters=8),
            scfg=SolverConfig(ip_iters=10, ip_tol=1e-6))
        n_steps, n_scen = 3, 3
        init0 = np.asarray(pl.refs[:, 0, :])
        inits = np.broadcast_to(init0, (n_scen,) + init0.shape).copy()
        rng = np.random.default_rng(1)
        inits[1:, :, :2] += 0.3 * rng.normal(size=(n_scen - 1, 2, 2))

        st_b, its_b, prs_b, dus_b, cvs_b, gaps_b = pl.run_batch_steps(
            jnp.asarray(inits), n_steps)
        st_s, its_s, prs_s, dus_s, _ = pl.run_scan(n_steps=n_steps)
        np.testing.assert_allclose(st_b[:, 0], st_s, atol=1e-8)
        np.testing.assert_array_equal(its_b[0], its_s)

        st_c, its_c, prs_c, dus_c, cvs_c, gaps_c = pl.run_scan_batch(
            jnp.asarray(inits), n_steps)
        np.testing.assert_allclose(st_c, st_b, atol=1e-8)
        np.testing.assert_array_equal(its_c, its_b)
        np.testing.assert_allclose(gaps_c, gaps_b, atol=1e-8)
        assert np.all(np.isfinite(st_b))
