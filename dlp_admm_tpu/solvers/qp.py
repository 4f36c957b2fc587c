"""Batched dense OSQP-style QP solver (operator splitting / ADMM).

TPU-native replacement for the OSQP calls of the reference
(``ca.qpsol('osqp', ...)`` at ``casadi/main.py:96,146`` and the CVX/Gurobi
solves of the MATLAB line — SURVEY.md §2.2). The planner's QPs are tiny
(tens to a few hundred variables), so the right TPU shape is: **dense**
factorizations, **fixed** iteration counts, and ``vmap`` over the
vehicle/pair/scenario axes; thousands of independent QPs solve in one fused
kernel launch instead of thousands of host solver instantiations (the
reference rebuilds a solver object per subproblem per iteration — SURVEY.md §3
"hot loops").

Problem form (OSQP standard form):

    minimize    1/2 x^T P x + q^T x
    subject to  l <= A x <= u

Implementation mirrors the full OSQP recipe so badly-scaled planner QPs
(collision hinge weights of 1e4 next to unit-scale effort terms) converge:

* modified Ruiz equilibration of [[P, A^T], [A, 0]] + cost normalization
* splitting iteration with over-relaxation ``alpha``
* adaptive ``rho``: the iteration runs in segments; between segments rho is
  rescaled by sqrt(primal_res / dual_res) and the condensed KKT matrix is
  re-factorized (dense Cholesky — cheap at these sizes)

Equality rows (l == u) are handled by the clip automatically.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


from ..config import SolverConfig


class QPSolution(NamedTuple):
    x: jnp.ndarray           # primal solution [n]
    y: jnp.ndarray           # dual solution for l <= Ax <= u rows [m]
    z: jnp.ndarray           # constraint values A x (projected) [m]
    primal_res: jnp.ndarray  # ||Ax - z||_inf at exit (unscaled)
    dual_res: jnp.ndarray    # ||Px + q + A^T y||_inf at exit (unscaled)
    iterations: jnp.ndarray  # iterations until the residual tolerance was met
    converged: jnp.ndarray   # both residuals below cfg.qp_tol at exit


def _ruiz_equilibrate(p_mat, q, a_mat, n_iters: int = 5):
    """Modified Ruiz scaling (OSQP §5.1): infinity-norm equilibration of the
    stacked KKT matrix plus cost normalization. Returns scaled data and the
    diagonal scalings (d [n], e [m], c scalar)."""
    n = q.shape[0]
    m = a_mat.shape[0]
    dtype = q.dtype
    d = jnp.ones(n, dtype)
    e = jnp.ones(m, dtype)
    c = jnp.asarray(1.0, dtype)
    ps, qs, as_ = p_mat, q, a_mat

    def body(carry, _):
        ps, qs, as_, d, e, c = carry
        # column inf-norms of [[P],[A]] and rows of [A^T]
        col_p = jnp.max(jnp.abs(ps), axis=0)
        col_a = jnp.max(jnp.abs(as_), axis=0)
        delta_d = 1.0 / jnp.sqrt(jnp.maximum(jnp.maximum(col_p, col_a), 1e-8))
        row_a = jnp.max(jnp.abs(as_), axis=1)
        delta_e = 1.0 / jnp.sqrt(jnp.maximum(row_a, 1e-8))
        ps = delta_d[:, None] * ps * delta_d[None, :]
        qs = delta_d * qs
        as_ = delta_e[:, None] * as_ * delta_d[None, :]
        d = d * delta_d
        e = e * delta_e
        # cost normalization
        gamma = 1.0 / jnp.maximum(
            jnp.maximum(jnp.mean(jnp.max(jnp.abs(ps), axis=0)),
                        jnp.max(jnp.abs(qs))), 1e-8)
        ps = gamma * ps
        qs = gamma * qs
        c = c * gamma
        return (ps, qs, as_, d, e, c), None

    (ps, qs, as_, d, e, c), _ = jax.lax.scan(
        body, (ps, qs, as_, d, e, c), None, length=n_iters)
    return ps, qs, as_, d, e, c


def solve_qp(p_mat: jnp.ndarray, q: jnp.ndarray, a_mat: jnp.ndarray,
             lo: jnp.ndarray, hi: jnp.ndarray,
             cfg: SolverConfig = SolverConfig(),
             x0: Optional[jnp.ndarray] = None,
             y0: Optional[jnp.ndarray] = None) -> QPSolution:
    """Solve one QP; ``vmap`` this for batches.

    All shapes static: ``p_mat [n,n]``, ``q [n]``, ``a_mat [m,n]``,
    ``lo/hi [m]`` (infinities allowed). The iteration runs in 4 segments of
    ``cfg.qp_iters // 4`` steps with rho re-scaled and the KKT re-factorized
    between segments; iterates freeze once both unscaled residuals drop below
    ``cfg.qp_tol`` (convergence masking instead of data-dependent exit —
    SURVEY.md §7 hard part 2).
    """
    n = q.shape[0]
    m = lo.shape[0]
    dtype = q.dtype
    sigma, alpha = cfg.qp_sigma, cfg.qp_alpha

    ps, qs, as_, d, e, c = _ruiz_equilibrate(p_mat, q, a_mat)
    los = e * lo
    his = e * hi

    x = jnp.zeros(n, dtype) if x0 is None else x0 / d
    y = jnp.zeros(m, dtype) if y0 is None else c * y0 / e
    z = jnp.clip(as_ @ x, los, his)

    eye_n = jnp.eye(n, dtype=dtype)
    ata = as_.T @ as_

    n_segments = 4
    seg_len = max(cfg.qp_iters // n_segments, 1)

    def unscaled_residuals(x, z, y):
        prim = jnp.max(jnp.abs((as_ @ x - z) / e))
        dual = jnp.max(jnp.abs((ps @ x + qs + as_.T @ y) / (c * d)))
        return prim, dual

    def segment(carry, _):
        x, z, y, rho, done, iters = carry
        # explicit inverse instead of a Cholesky factorization: triangular
        # solves are sequential over n rows (latency-bound on TPU), whereas
        # applying a precomputed inverse is one MXU matmul per iteration.
        # The condensed matrix is SPD and Ruiz-equilibrated, so the inverse
        # is numerically safe at these sizes.
        kkt_inv = jnp.linalg.inv(ps + sigma * eye_n + rho * ata)

        if cfg.qp_use_pallas:
            # fused-kernel path: the whole segment runs inside one Pallas
            # program; convergence is checked per segment (a converged
            # iterate is a fixed point, so the extra in-segment iterations
            # are no-ops numerically)
            from .qp_pallas import osqp_iterate_fused
            x_new, z_new, y_new = osqp_iterate_fused(
                kkt_inv, as_, qs, los, his, x, z, y, rho,
                jnp.asarray(sigma, dtype), jnp.asarray(alpha, dtype),
                seg_len, interpret=cfg.qp_pallas_interpret)
            keep = lambda new, old: jnp.where(done, old, new)
            x, z, y = keep(x_new, x), keep(z_new, z), keep(y_new, y)
            prim, dual = unscaled_residuals(x, z, y)
            now_done = jnp.logical_and(prim < cfg.qp_tol, dual < cfg.qp_tol)
            iters = iters + seg_len * jnp.logical_not(done).astype(jnp.int32)
            done = jnp.logical_or(done, now_done)
        else:
            # residuals are only evaluated at segment boundaries: checking
            # them every iteration costs three extra reads of the (large)
            # constraint tensor per iteration — the measured HBM-bandwidth
            # bottleneck of the batched edge QPs. A converged iterate is a
            # fixed point, so the extra in-segment iterations are no-ops.
            def step(carry, _):
                x, z, y = carry
                rhs = sigma * x - qs + as_.T @ (rho * z - y)
                x_t = kkt_inv @ rhs
                z_t = as_ @ x_t
                x_new = alpha * x_t + (1 - alpha) * x
                z_relax = alpha * z_t + (1 - alpha) * z
                z_new = jnp.clip(z_relax + y / rho, los, his)
                y_new = y + rho * (z_relax - z_new)
                return (x_new, z_new, y_new), None

            (x_new, z_new, y_new), _ = jax.lax.scan(
                step, (x, z, y), None, length=seg_len)
            keep = lambda new, old: jnp.where(done, old, new)
            x, z, y = keep(x_new, x), keep(z_new, z), keep(y_new, y)
            prim, dual = unscaled_residuals(x, z, y)
            now_done = jnp.logical_and(prim < cfg.qp_tol, dual < cfg.qp_tol)
            iters = iters + seg_len * jnp.logical_not(done).astype(jnp.int32)
            done = jnp.logical_or(done, now_done)

        # adaptive rho (OSQP §5.2): balance scaled residual ratio
        prim_s = jnp.max(jnp.abs(as_ @ x - z))
        dual_s = jnp.max(jnp.abs(ps @ x + qs + as_.T @ y))
        prim_rel = prim_s / jnp.maximum(
            jnp.maximum(jnp.max(jnp.abs(as_ @ x)), jnp.max(jnp.abs(z))), 1e-8)
        dual_rel = dual_s / jnp.maximum(
            jnp.maximum(jnp.max(jnp.abs(ps @ x)),
                        jnp.maximum(jnp.max(jnp.abs(as_.T @ y)),
                                    jnp.max(jnp.abs(qs)))), 1e-8)
        new_rho = jnp.clip(
            rho * jnp.sqrt(prim_rel / jnp.maximum(dual_rel, 1e-12)),
            1e-6, 1e6)
        rho = jnp.where(done, rho, new_rho)
        return (x, z, y, rho, done, iters), None

    init = (x, z, y, jnp.asarray(cfg.qp_rho, dtype), jnp.asarray(False),
            jnp.asarray(0, jnp.int32))
    (x, z, y, _, done, iters), _ = jax.lax.scan(segment, init, None,
                                                length=n_segments)
    prim, dual = unscaled_residuals(x, z, y)
    # unscale solution
    return QPSolution(d * x, e * y / c, z / e, prim, dual, iters, done)


def solve_qp_batch(p_mat, q, a_mat, lo, hi, cfg: SolverConfig = SolverConfig(),
                   x0=None, y0=None) -> QPSolution:
    """Batch-of-QPs front-end: leading batch axis on every operand.

    One compiled kernel solves B independent QPs (per vehicle / per pair /
    per scenario); this is the unit the coordination layer vmaps/shards.
    """
    if x0 is None:
        x0 = jnp.zeros(q.shape, q.dtype)
    if y0 is None:
        y0 = jnp.zeros(lo.shape, q.dtype)
    return jax.vmap(
        lambda pp, qq, aa, ll, uu, xx, yy: solve_qp(pp, qq, aa, ll, uu, cfg,
                                                    xx, yy)
    )(p_mat, q, a_mat, lo, hi, x0, y0)


def quadratic_from_fn(fn, x_ref: jnp.ndarray, *args):
    """Extract (P, q) of a quadratic scalar function around ``x_ref``.

    The planner's subproblem costs are built as traced Python expressions
    (like the reference's CasADi graphs, e.g. ``PI_ADMM_class.py:114-133``);
    this converts them to explicit QP data once under jit: ``P = hess``,
    ``q = grad - P x_ref``. Exact for quadratics (the local PI-ADMM cost);
    for non-quadratics this is the Gauss/Newton model at ``x_ref``.
    """
    grad = jax.grad(fn)(x_ref, *args)
    p_mat = jax.hessian(fn)(x_ref, *args)
    q = grad - p_mat @ x_ref
    return p_mat, q
