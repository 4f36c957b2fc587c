"""Fused Pallas OSQP path vs the XLA path (interpreter mode on CPU)."""
import jax.numpy as jnp
import numpy as np
import pytest

from dlp_admm_tpu.config import SolverConfig
from dlp_admm_tpu.solvers.qp import solve_qp

from test_qp import random_qp

PLAIN = SolverConfig(qp_iters=400, qp_tol=1e-8)
# the fused kernel iterates in f32 — 1e-6 is its realistic tolerance floor
PALLAS = SolverConfig(qp_iters=400, qp_tol=1e-6, qp_use_pallas=True,
                      qp_pallas_interpret=True)


class TestPallasPath:
    @pytest.mark.parametrize("seed", [0, 3])
    def test_matches_plain_path(self, seed):
        rng = np.random.default_rng(seed)
        prob = random_qp(rng, 10, 6)
        plain = solve_qp(*prob, PLAIN)
        fused = solve_qp(*prob, PALLAS)
        assert bool(fused.converged)
        # kernel runs in f32: compare at f32-level tolerance
        np.testing.assert_allclose(np.asarray(fused.x), np.asarray(plain.x),
                                   atol=5e-5, rtol=1e-4)

    def test_infinite_bounds(self):
        rng = np.random.default_rng(1)
        p_mat, q, a_mat, _, _ = random_qp(rng, 6, 3)
        lo = jnp.array([-jnp.inf, 0.0, -1.0])
        hi = jnp.array([jnp.inf, jnp.inf, 1.0])
        plain = solve_qp(p_mat, q, a_mat, lo, hi, PLAIN)
        fused = solve_qp(p_mat, q, a_mat, lo, hi, PALLAS)
        np.testing.assert_allclose(np.asarray(fused.x), np.asarray(plain.x),
                                   atol=5e-5, rtol=1e-4)

    def test_active_box(self):
        sol = solve_qp(jnp.eye(1) * 2, jnp.array([-6.0]), jnp.eye(1),
                       jnp.array([-1.0]), jnp.array([1.0]), PALLAS)
        np.testing.assert_allclose(float(sol.x[0]), 1.0, atol=1e-5)
