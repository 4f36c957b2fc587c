"""Bilevel (MISC) and tightening planner tests (SURVEY.md C8/C9)."""
import jax.numpy as jnp
import numpy as np

from dlp_admm_tpu.config import ObcaConfig, SolverConfig
from dlp_admm_tpu.models.bilevel import (BilevelObcaPlanner,
                                         TighteningObcaPlanner,
                                         TighteningSlackObcaPlanner,
                                         solve_collision_duals,
                                         solve_collision_duals_slack)
from dlp_admm_tpu.ops.geometry import halfspaces

SCFG = SolverConfig(ip_iters=40, ip_tol=1e-6)


def straight_states(x0, v, n, lane=0.0):
    x = x0 + v * 0.1 * np.arange(n)
    return np.stack([x, np.full(n, lane), np.full(n, v),
                     np.zeros(n), np.zeros(n)], axis=-1)


class TestCollisionDuals:
    def test_separated_duals_measure_distance(self):
        """For two axis-aligned rectangles 10 m apart (bumper gap 6.5 m) the
        dual value -sum b^T lam is the scaled separation distance."""
        s0 = jnp.asarray(straight_states(0.0, 10.0, 5)[None])
        s1 = jnp.asarray(straight_states(10.0, 10.0, 5)[None])
        states = jnp.concatenate([s0, s1], axis=0)
        a_mat, b = halfspaces(states)
        lam, sol = solve_collision_duals(a_mat[None], b[None], 1.0, SCFG)
        assert bool(np.all(np.asarray(sol.converged)))
        lam = lam[0]                     # single pair
        val = -(np.einsum('ti,ti->t', np.asarray(b[0]), np.asarray(lam[0]))
                + np.einsum('ti,ti->t', np.asarray(b[1]),
                            np.asarray(lam[1])))
        # gap 6.5 scaled by the 0.95 norm bound
        np.testing.assert_allclose(val, 6.5 * 0.95, atol=1e-3)

    def test_slack_duals_agree_with_plain(self):
        """The slack variant's optimum matches the plain dual problem's
        separation value (same lower-level problem, lifted with s): for
        separated rectangles -sum b^T lam is the gap (no 0.95 norm scaling —
        the slack form bounds ||s|| by exactly 1)."""
        s0 = jnp.asarray(straight_states(0.0, 10.0, 5)[None])
        s1 = jnp.asarray(straight_states(10.0, 10.0, 5)[None])
        states = jnp.concatenate([s0, s1], axis=0)
        a_mat, b = halfspaces(states)
        lam, s, sol = solve_collision_duals_slack(a_mat[None], b[None], 1.0,
                                                  SCFG)
        assert bool(np.all(np.asarray(sol.converged)))
        lam, s = lam[0], s[0]            # single pair
        val = -(np.einsum('ti,ti->t', np.asarray(b[0]), np.asarray(lam[0]))
                + np.einsum('ti,ti->t', np.asarray(b[1]),
                            np.asarray(lam[1])))
        np.testing.assert_allclose(val, 6.5, atol=1e-3)
        # the separating direction is the +x axis (unit length, at the bound)
        np.testing.assert_allclose(np.abs(np.asarray(s)[:, 0]), 1.0,
                                   atol=1e-3)
        np.testing.assert_allclose(np.asarray(s)[:, 1], 0.0, atol=1e-3)
        # (6a)/(6b): A^T lam = -s / +s
        g0 = np.einsum('tij,ti->tj', np.asarray(a_mat[0]), np.asarray(lam[0]))
        np.testing.assert_allclose(g0, -np.asarray(s), atol=1e-4)

    def test_overlap_keeps_warm_certificates(self):
        s0 = jnp.asarray(straight_states(0.0, 10.0, 3)[None])
        s1 = jnp.asarray(straight_states(1.0, 10.0, 3)[None])  # overlapping
        states = jnp.concatenate([s0, s1], axis=0)
        a_mat, b = halfspaces(states)
        warm = jnp.full((1, 2, 3, 4), 0.123)
        lam, sol = solve_collision_duals(a_mat[None], b[None], 1.0, SCFG,
                                         lam_warm=warm)
        assert not bool(np.any(np.asarray(sol.converged)))
        np.testing.assert_allclose(np.asarray(lam), 0.123)


class TestPlanners:
    def test_bilevel_keeps_separation(self):
        pl = BilevelObcaPlanner(scfg=SCFG, n_rounds=2)
        states, infos = pl.run(n_steps=12)
        assert np.all(np.isfinite(states))
        d = np.linalg.norm(states[:, 0, :2] - states[:, 1, :2], axis=1)
        # rear vehicle must brake to roughly car length + min_dis
        assert d.min() > 3.5

    def test_tightening_keeps_separation(self):
        pl = TighteningObcaPlanner(scfg=SCFG)
        states, infos = pl.run(n_steps=12)
        assert np.all(np.isfinite(states))
        d = np.linalg.norm(states[:, 0, :2] - states[:, 1, :2], axis=1)
        assert d.min() > 3.5

    def test_tightening_slack_keeps_separation(self):
        pl = TighteningSlackObcaPlanner(scfg=SCFG)
        states, infos = pl.run(n_steps=12)
        assert np.all(np.isfinite(states))
        d = np.linalg.norm(states[:, 0, :2] - states[:, 1, :2], axis=1)
        assert d.min() > 3.5

    def test_tightening_skips_collision_rows_at_t0(self):
        """At step 0 the collision rows are inactive (optimizer_ori.py:98-99):
        the first solve is pure tracking even with garbage bar state."""
        pl = TighteningObcaPlanner(scfg=SCFG)
        bs = pl.create_state()
        bs = bs._replace(b=bs.b + 100.0)  # poison the stale data
        init = jnp.asarray(pl.refs[:, 0, :])
        nxt, _, info = pl._mpc_step(init, bs, jnp.asarray(0, jnp.int32))
        np.testing.assert_allclose(np.asarray(nxt[:, 1]), 0.0, atol=1e-3)
