"""Interior-point NLP solver tests vs known optima (SURVEY.md §4c).

Includes the reference's own solver smoke test (the Rosenbrock-style IPOPT
check of ``casadi/test_casadi.py:8-27``) re-targeted at our solver.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dlp_admm_tpu.config import SolverConfig
from dlp_admm_tpu.solvers.ip import NLP, NLPSolution, solve_nlp, solve_nlp_batch

CFG = SolverConfig(ip_iters=60, ip_tol=1e-8)


def no_ce(x, p):
    return jnp.zeros((0,), x.dtype)


def no_ci(x, p):
    return jnp.zeros((0,), x.dtype)


class TestUnconstrained:
    def test_rosenbrock(self):
        """min (1-x)^2 + 100 (y - x^2)^2 -> (1, 1). This is the reference's
        installation smoke test (casadi/test_casadi.py)."""
        nlp = NLP(
            f=lambda x, p: (1 - x[0]) ** 2 + 100 * (x[1] - x[0] ** 2) ** 2,
            ce=no_ce, ci=no_ci)
        sol = solve_nlp(nlp, jnp.array([-1.2, 1.0]), None, CFG)
        np.testing.assert_allclose(np.asarray(sol.x), [1.0, 1.0], atol=1e-6)
        assert bool(sol.converged)

    def test_quadratic_bowl(self):
        nlp = NLP(f=lambda x, p: jnp.sum((x - p) ** 2), ce=no_ce, ci=no_ci)
        p = jnp.array([1.0, -2.0, 3.0])
        sol = solve_nlp(nlp, jnp.zeros(3), p, CFG)
        np.testing.assert_allclose(np.asarray(sol.x), np.asarray(p),
                                   atol=1e-7)


class TestEquality:
    def test_linear_objective_on_circle(self):
        """min x + y s.t. x^2 + y^2 = 1 -> (-1/sqrt2, -1/sqrt2)."""
        nlp = NLP(f=lambda x, p: x[0] + x[1],
                  ce=lambda x, p: jnp.array([x[0] ** 2 + x[1] ** 2 - 1.0]),
                  ci=no_ci)
        sol = solve_nlp(nlp, jnp.array([0.5, -0.8]), None, CFG)
        np.testing.assert_allclose(np.asarray(sol.x),
                                   [-2 ** -0.5, -2 ** -0.5], atol=1e-6)
        # multiplier: grad = [1,1] = y * [2x, 2y] -> y = -1/sqrt2... check KKT
        assert float(sol.kkt_error) < 1e-7

    def test_rosenbrock_with_linear_constraint(self):
        """min rosenbrock s.t. x + y = 1."""
        nlp = NLP(
            f=lambda x, p: (1 - x[0]) ** 2 + 100 * (x[1] - x[0] ** 2) ** 2,
            ce=lambda x, p: jnp.array([x[0] + x[1] - 1.0]),
            ci=no_ci)
        sol = solve_nlp(nlp, jnp.array([0.5, 0.5]), None, CFG)
        assert bool(sol.converged)
        np.testing.assert_allclose(float(sol.x[0] + sol.x[1]), 1.0, atol=1e-8)
        # stationary point of the restricted problem (known: x ~ 0.6188)
        x = float(sol.x[0])
        grad_restricted = (-2 * (1 - x) - 400 * x * ((1 - x) - x ** 2)
                           + 200 * ((1 - x) - x ** 2) * (-1))
        np.testing.assert_allclose(grad_restricted, 0.0, atol=1e-5)


class TestInequality:
    def test_active_bound(self):
        """min (x-3)^2 s.t. x <= 1 -> x = 1, z = 4."""
        nlp = NLP(f=lambda x, p: (x[0] - 3.0) ** 2,
                  ce=no_ce,
                  ci=lambda x, p: jnp.array([1.0 - x[0]]))
        sol = solve_nlp(nlp, jnp.array([0.0]), None, CFG)
        np.testing.assert_allclose(float(sol.x[0]), 1.0, atol=1e-6)
        np.testing.assert_allclose(float(sol.z[0]), 4.0, atol=1e-5)

    def test_inactive_bound(self):
        nlp = NLP(f=lambda x, p: (x[0] - 3.0) ** 2,
                  ce=no_ce,
                  ci=lambda x, p: jnp.array([10.0 - x[0]]))
        sol = solve_nlp(nlp, jnp.array([0.0]), None, CFG)
        np.testing.assert_allclose(float(sol.x[0]), 3.0, atol=1e-6)
        assert float(sol.z[0]) < 1e-6

    def test_qp_matches_closed_form(self):
        rng = np.random.default_rng(0)
        r = rng.normal(size=(6, 6))
        p_mat = jnp.asarray(r @ r.T + 6 * np.eye(6))
        q = jnp.asarray(rng.normal(size=6))
        a_mat = jnp.asarray(rng.normal(size=(3, 6)))
        b = jnp.asarray(rng.normal(size=3))
        nlp = NLP(f=lambda x, p: 0.5 * x @ p_mat @ x + q @ x,
                  ce=lambda x, p: a_mat @ x - b,
                  ci=no_ci)
        sol = solve_nlp(nlp, jnp.zeros(6), None, CFG)
        kkt = np.block([[np.asarray(p_mat), np.asarray(a_mat).T],
                        [np.asarray(a_mat), np.zeros((3, 3))]])
        expect = np.linalg.solve(kkt, np.concatenate([-np.asarray(q),
                                                      np.asarray(b)]))
        np.testing.assert_allclose(np.asarray(sol.x), expect[:6], atol=1e-6)

    def test_nonconvex_bilinear_obca_style(self):
        """min -b1@l1 - b2@l2 bilinear-style toy with norm constraint:
        max separation of two 1-D intervals [0,1] and [2,3] expressed as the
        OBCA dual (distance = 1)."""
        # halfspaces of interval [0,1]: x <= 1, -x <= 0 -> A1=[1,-1], b1=[1,0]
        # interval [2,3]: x <= 3, -x <= -2 -> A2=[1,-1], b2=[3,-2]
        a1 = jnp.array([1.0, -1.0])
        b1 = jnp.array([1.0, 0.0])
        a2 = jnp.array([1.0, -1.0])
        b2 = jnp.array([3.0, -2.0])

        def f(x, p):        # x = [l1 (2), l2 (2)]
            return -(-(b1 @ x[:2]) - b2 @ x[2:])  # maximize -b1l1 - b2l2

        def ce(x, p):       # A1^T l1 + A2^T l2 = 0
            return jnp.array([a1 @ x[:2] + a2 @ x[2:]])

        def ci(x, p):       # l >= 0, ||A1^T l1|| <= 1
            return jnp.concatenate([x, jnp.array([1.0 - (a1 @ x[:2]) ** 2])])

        sol = solve_nlp(NLP(f, ce, ci), jnp.array([0.1, 0.6, 0.6, 0.1]),
                        None, CFG)
        assert bool(sol.converged)
        # optimal value = separation distance = 1.0 (dual of min-distance)
        val = float(-(b1 @ sol.x[:2]) - b2 @ sol.x[2:])
        np.testing.assert_allclose(val, 1.0, atol=1e-5)


class TestBatch:
    def test_vmap_matches_single(self):
        nlp = NLP(f=lambda x, p: jnp.sum((x - p) ** 2) + 0.1 * jnp.sum(x ** 4),
                  ce=no_ce,
                  ci=lambda x, p: jnp.array([x[0] + 5.0]))
        p = jnp.asarray(np.random.default_rng(1).normal(size=(4, 3)))
        x0 = jnp.zeros((4, 3))
        bsol = solve_nlp_batch(nlp, x0, p, CFG)
        for i in range(4):
            single = solve_nlp(nlp, x0[i], p[i], CFG)
            np.testing.assert_allclose(np.asarray(bsol.x[i]),
                                       np.asarray(single.x), atol=1e-7)
