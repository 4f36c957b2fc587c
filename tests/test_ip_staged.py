"""Structured (block-tridiagonal) IP solver tests (SURVEY.md §7.4).

Oracles: the dense IP solver on the flattened problem (same algorithm, same
tolerances), plus a dense ``jnp.linalg.solve`` for the Thomas kernel.
"""
import jax
import jax.numpy as jnp
import numpy as np

from dlp_admm_tpu.config import SolverConfig
from dlp_admm_tpu.solvers.ip import NLP, solve_nlp
from dlp_admm_tpu.solvers.ip_staged import (StagedNLP, block_thomas_solve,
                                            solve_staged)


def _random_block_tridiag(rng, t, b):
    """Random SPD-ish symmetric block-tridiagonal (diag-dominant)."""
    diag = rng.normal(size=(t, b, b))
    diag = 0.5 * (diag + np.transpose(diag, (0, 2, 1)))
    diag += (b + 2.0) * np.eye(b)
    upper = 0.3 * rng.normal(size=(t, b, b))
    return diag, upper


def _densify(diag, upper):
    t, b = diag.shape[0], diag.shape[1]
    m = np.zeros((t * b, t * b))
    for k in range(t):
        m[k * b:(k + 1) * b, k * b:(k + 1) * b] = diag[k]
        if k + 1 < t:
            m[k * b:(k + 1) * b, (k + 1) * b:(k + 2) * b] = upper[k]
            m[(k + 1) * b:(k + 2) * b, k * b:(k + 1) * b] = upper[k].T
    return m


class TestBlockThomas:
    def test_matches_dense_solve(self):
        rng = np.random.default_rng(0)
        t, b = 7, 5
        diag, upper = _random_block_tridiag(rng, t, b)
        rhs = rng.normal(size=(t, b))
        got = block_thomas_solve(jnp.asarray(diag), jnp.asarray(upper),
                                 jnp.asarray(rhs))
        want = np.linalg.solve(_densify(diag, upper),
                               rhs.reshape(-1)).reshape(t, b)
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-8,
                                   atol=1e-10)

    def test_indefinite_kkt_style_blocks(self):
        """KKT-style saddle blocks (H, J^T; J, -eps I) still solve."""
        rng = np.random.default_rng(1)
        t, n, m = 5, 4, 2
        b = n + m
        diag = np.zeros((t, b, b))
        upper = np.zeros((t, b, b))
        for k in range(t):
            h = rng.normal(size=(n, n))
            h = h @ h.T + np.eye(n)
            j = rng.normal(size=(m, n))
            diag[k, :n, :n] = h
            diag[k, :n, n:] = j.T
            diag[k, n:, :n] = j
            diag[k, n:, n:] = -1e-8 * np.eye(m)
            if k + 1 < t:
                upper[k, :n, :n] = 0.1 * rng.normal(size=(n, n))
        rhs = rng.normal(size=(t, b))
        got = block_thomas_solve(jnp.asarray(diag), jnp.asarray(upper),
                                 jnp.asarray(rhs))
        want = np.linalg.solve(_densify(diag, upper),
                               rhs.reshape(-1)).reshape(t, b)
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6,
                                   atol=1e-8)


# a small constrained LQR-style tracking problem, staged vs dense ----------

T_STAGES, NX, NU = 6, 2, 1
B_W = NX + NU
A_DYN = np.array([[1.0, 0.1], [0.0, 1.0]])
B_DYN = np.array([[0.005], [0.1]])
X_INIT = np.array([1.0, 0.0])
REF = np.stack([np.linspace(0.8, -0.5, T_STAGES), np.zeros(T_STAGES)],
               axis=-1)
U_MAX = 0.8


def _stage_p():
    return dict(first=jnp.asarray([1.0] + [0.0] * (T_STAGES - 1)),
                ref=jnp.asarray(REF),
                init=jnp.broadcast_to(jnp.asarray(X_INIT), (T_STAGES, NX)))


def _staged_spec():
    def f_stage(w, p):
        x, u = w[:NX], w[NX:]
        return jnp.sum((x - p["ref"]) ** 2) + 0.1 * jnp.sum(u ** 2)

    def ce_link(w_prev, w, p):
        x_prev = jnp.where(p["first"] > 0, p["init"], w_prev[:NX])
        x, u = w[:NX], w[NX:]
        return x - (jnp.asarray(A_DYN) @ x_prev
                    + jnp.asarray(B_DYN) @ u)

    def ce_stage(w, p):
        return jnp.zeros((0,), w.dtype)

    def ci_stage(w, p):
        u = w[NX:]
        return jnp.concatenate([U_MAX + u, U_MAX - u])

    return StagedNLP(f_stage, ce_link, ce_stage, ci_stage)


def _dense_spec():
    def split(x):
        w = x.reshape(T_STAGES, B_W)
        return w[:, :NX], w[:, NX:]

    def f(x, p):
        xs, us = split(x)
        return jnp.sum((xs - jnp.asarray(REF)) ** 2) + 0.1 * jnp.sum(us ** 2)

    def ce(x, p):
        xs, us = split(x)
        xp = jnp.concatenate([jnp.asarray(X_INIT)[None], xs[:-1]], axis=0)
        r = xs - (xp @ jnp.asarray(A_DYN).T + us @ jnp.asarray(B_DYN).T)
        return r.reshape(-1)

    def ci(x, p):
        _, us = split(x)
        return jnp.concatenate([(U_MAX + us).reshape(-1),
                                (U_MAX - us).reshape(-1)])

    return NLP(f, ce, ci)


class TestStagedVsDense:
    def test_constrained_tracking_parity(self):
        cfg = SolverConfig(ip_iters=40, ip_tol=1e-8)
        w0 = jnp.zeros((T_STAGES, B_W), jnp.float64)
        sol_s = solve_staged(_staged_spec(), w0, _stage_p(), cfg)
        assert bool(sol_s.converged), float(sol_s.kkt_error)
        sol_d = solve_nlp(_dense_spec(), w0.reshape(-1), None, cfg)
        assert bool(sol_d.converged)
        np.testing.assert_allclose(np.asarray(sol_s.w).reshape(-1),
                                   np.asarray(sol_d.x), atol=1e-6)
        # control bound actually active at the start (the test is vacuous
        # against an interior optimum otherwise)
        assert float(jnp.max(jnp.abs(sol_s.w[:, NX:]))) > 0.75

    def test_stage_equalities(self):
        """ms > 0 path: pin u_0 + u_1-style per-stage equality."""
        base = _staged_spec()

        def ce_stage(w, p):
            # force u_k = 0 on the LAST stage only (masked elsewhere)
            return p["last"] * w[NX:]

        p = _stage_p()
        p["last"] = jnp.asarray([0.0] * (T_STAGES - 1) + [1.0])
        spec = StagedNLP(base.f_stage, base.ce_link, ce_stage, base.ci_stage)
        cfg = SolverConfig(ip_iters=40, ip_tol=1e-8)
        sol = solve_staged(spec, jnp.zeros((T_STAGES, B_W), jnp.float64),
                           p, cfg)
        assert bool(sol.converged)
        assert abs(float(sol.w[-1, NX])) < 1e-6

    def test_vmaps_over_batch(self):
        cfg = SolverConfig(ip_iters=30, ip_tol=1e-7)
        p = _stage_p()
        batch_p = jax.tree.map(
            lambda a: jnp.broadcast_to(a, (3,) + a.shape), p)
        w0 = jnp.zeros((3, T_STAGES, B_W), jnp.float64)
        sol = jax.vmap(lambda w, pp: solve_staged(
            _staged_spec(), w, pp, cfg))(w0, batch_p)
        assert sol.w.shape == (3, T_STAGES, B_W)
        assert bool(jnp.all(sol.converged))
        np.testing.assert_allclose(np.asarray(sol.w[0]),
                                   np.asarray(sol.w[1]), atol=1e-12)


class TestDenseSolve:
    def test_mixed_precision_path_matches_f64(self):
        """The TPU-f64 branch of solvers/linalg.dense_solve (Jacobi
        equilibration + f32 LU + f64 iterative refinement) must reproduce
        the f64 oracle on planner-conditioned systems (the flagship's
        1e7/1e5/1 weight spread -> cond ~1e8)."""
        import jax.numpy as jnp
        from dlp_admm_tpu.solvers.linalg import _tpu_f64_solve
        rng = np.random.default_rng(0)
        n = 19
        for _ in range(3):
            q = rng.normal(size=(n, n))
            a = q @ q.T + np.eye(n)
            w = 10.0 ** rng.integers(0, 8, size=n)
            a = a * np.sqrt(w)[:, None] * np.sqrt(w)[None, :]
            b = rng.normal(size=(n, 3)) * w[:, None]
            x_mp = np.asarray(_tpu_f64_solve(jnp.asarray(a), jnp.asarray(b)))
            res = np.linalg.norm(a @ x_mp - b) / np.linalg.norm(b)
            assert res < 1e-10, res
        # vector rhs path
        bv = rng.normal(size=n)
        xv = np.asarray(_tpu_f64_solve(jnp.asarray(a), jnp.asarray(bv)))
        assert np.linalg.norm(a @ xv - bv) / np.linalg.norm(bv) < 1e-10
