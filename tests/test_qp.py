"""QP solver tests: KKT conditions and closed-form oracles (SURVEY.md §4c)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dlp_admm_tpu.config import SolverConfig
from dlp_admm_tpu.solvers.qp import quadratic_from_fn, solve_qp, solve_qp_batch

CFG = SolverConfig(qp_iters=400, qp_tol=1e-9)


def random_qp(rng, n, m):
    """Random strictly convex QP with box-type constraints."""
    r = rng.normal(size=(n, n))
    p_mat = r @ r.T + n * np.eye(n)
    q = rng.normal(size=n)
    a_mat = rng.normal(size=(m, n))
    lo = rng.uniform(-2, -0.5, size=m)
    hi = rng.uniform(0.5, 2, size=m)
    return (jnp.asarray(p_mat), jnp.asarray(q), jnp.asarray(a_mat),
            jnp.asarray(lo), jnp.asarray(hi))


class TestSolveQP:
    def test_unconstrained_matches_linear_solve(self):
        rng = np.random.default_rng(0)
        p_mat, q, a_mat, _, _ = random_qp(rng, 6, 3)
        lo = jnp.full(3, -1e6)
        hi = jnp.full(3, 1e6)
        sol = solve_qp(p_mat, q, a_mat, lo, hi, CFG)
        expect = np.linalg.solve(np.asarray(p_mat), -np.asarray(q))
        np.testing.assert_allclose(np.asarray(sol.x), expect, atol=1e-6)
        assert bool(sol.converged)

    def test_equality_constrained_matches_kkt_solve(self):
        rng = np.random.default_rng(1)
        p_mat, q, a_mat, _, _ = random_qp(rng, 8, 3)
        b = jnp.asarray(rng.normal(size=3))
        sol = solve_qp(p_mat, q, a_mat, b, b, CFG)
        # closed form: [[P, A^T], [A, 0]] [x; nu] = [-q; b]
        n, m = 8, 3
        kkt = np.zeros((n + m, n + m))
        kkt[:n, :n] = np.asarray(p_mat)
        kkt[:n, n:] = np.asarray(a_mat).T
        kkt[n:, :n] = np.asarray(a_mat)
        rhs = np.concatenate([-np.asarray(q), np.asarray(b)])
        expect = np.linalg.solve(kkt, rhs)
        np.testing.assert_allclose(np.asarray(sol.x), expect[:n], atol=1e-6)
        np.testing.assert_allclose(np.asarray(sol.y), expect[n:], atol=1e-5)

    @pytest.mark.parametrize("seed", [2, 3, 4])
    def test_kkt_conditions_inequality(self, seed):
        rng = np.random.default_rng(seed)
        p_mat, q, a_mat, lo, hi = random_qp(rng, 10, 6)
        sol = solve_qp(p_mat, q, a_mat, lo, hi, CFG)
        assert bool(sol.converged), (sol.primal_res, sol.dual_res)
        x, y = np.asarray(sol.x), np.asarray(sol.y)
        ax = np.asarray(a_mat) @ x
        # stationarity
        np.testing.assert_allclose(
            np.asarray(p_mat) @ x + np.asarray(q) + np.asarray(a_mat).T @ y,
            0.0, atol=1e-6)
        # primal feasibility
        assert np.all(ax >= np.asarray(lo) - 1e-7)
        assert np.all(ax <= np.asarray(hi) + 1e-7)
        # complementarity / sign: y>0 only at upper bound, y<0 only at lower
        at_hi = np.isclose(ax, np.asarray(hi), atol=1e-6)
        at_lo = np.isclose(ax, np.asarray(lo), atol=1e-6)
        assert np.all(y[~(at_hi | at_lo)] < 1e-6)
        assert np.all(y[y > 1e-6] * 0 + at_hi[y > 1e-6])
        assert np.all(at_lo[y < -1e-6])

    def test_active_box_projection(self):
        """min (x-3)^2 s.t. -1 <= x <= 1 -> x = 1."""
        sol = solve_qp(jnp.eye(1) * 2, jnp.array([-6.0]), jnp.eye(1),
                       jnp.array([-1.0]), jnp.array([1.0]), CFG)
        np.testing.assert_allclose(float(sol.x[0]), 1.0, atol=1e-7)
        np.testing.assert_allclose(float(sol.y[0]), 4.0, atol=1e-6)

    def test_batch_matches_single(self):
        rng = np.random.default_rng(5)
        probs = [random_qp(rng, 7, 4) for _ in range(5)]
        batch = tuple(jnp.stack([p[i] for p in probs]) for i in range(5))
        bsol = solve_qp_batch(*batch, CFG)
        for k, prob in enumerate(probs):
            single = solve_qp(*prob, CFG)
            np.testing.assert_allclose(np.asarray(bsol.x[k]),
                                       np.asarray(single.x), atol=1e-8)

    def test_jit_and_warm_start(self):
        rng = np.random.default_rng(6)
        prob = random_qp(rng, 7, 4)
        f = jax.jit(lambda *a: solve_qp(*a, CFG))
        cold = f(*prob)
        warm = solve_qp(*prob, CFG, x0=cold.x, y0=cold.y)
        assert int(warm.iterations) <= int(cold.iterations)
        np.testing.assert_allclose(np.asarray(warm.x), np.asarray(cold.x),
                                   atol=1e-7)


class TestQuadraticFromFn:
    def test_recovers_quadratic_exactly(self):
        rng = np.random.default_rng(7)
        p = rng.normal(size=(5, 5))
        p = p @ p.T + np.eye(5)
        q = rng.normal(size=5)

        def fn(x):
            return 0.5 * x @ jnp.asarray(p) @ x + jnp.asarray(q) @ x + 3.0

        x_ref = jnp.asarray(rng.normal(size=5))
        p_got, q_got = quadratic_from_fn(fn, x_ref)
        np.testing.assert_allclose(np.asarray(p_got), p, atol=1e-9)
        np.testing.assert_allclose(np.asarray(q_got), q, atol=1e-8)

    def test_qp_from_traced_cost(self):
        """Solve min ||u - t||^2 + ||Du||^2 via the traced-cost path."""
        t = jnp.asarray(np.linspace(0, 1, 8))

        def cost(u):
            return jnp.sum((u - t) ** 2) + jnp.sum(jnp.diff(u) ** 2)

        p_mat, q = quadratic_from_fn(cost, jnp.zeros(8))
        a_mat = jnp.eye(8)
        sol = solve_qp(p_mat, q, a_mat, jnp.full(8, -10.0), jnp.full(8, 10.0),
                       CFG)
        # oracle by explicit dense solve
        d = np.diff(np.eye(8), axis=0)
        h = 2 * np.eye(8) + 2 * d.T @ d
        expect = np.linalg.solve(h, 2 * np.asarray(t))
        np.testing.assert_allclose(np.asarray(sol.x), expect, atol=1e-7)
