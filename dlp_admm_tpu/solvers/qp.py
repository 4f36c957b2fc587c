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
  rescaled by sqrt(primal_res / dual_res) and the condensed KKT inverse is
  refreshed

Equality rows (l == u) are handled by the clip automatically.

TPU factorization strategy (profiled on v5e): batched LU (``linalg.inv``)
and Cholesky are *custom calls* — latency-bound sequential panel
factorizations that dwarf everything else in the solve (a batch-768 90x90
``inv`` costs ~24 ms; the same batch of Newton–Schulz matmul iterations
costs <1 ms). So the condensed KKT matrix ``P + sigma I + rho A^T A`` is
inverted ONCE per solve via Cholesky (the cheapest exact custom call), and
the per-segment rho refresh updates the inverse with a few Newton–Schulz
iterations (pure MXU matmuls): with the per-segment rho change factor
clipped to (0, 2), the spectral radius of ``I - X_old K_new`` is < 1 and
the quadratic NS iteration reconverges in <= 8 steps. See
``_spd_inverse`` / ``_ns_refresh``.
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


def _spd_inverse(k_mat: jnp.ndarray) -> jnp.ndarray:
    """Exact inverse of an SPD matrix via Cholesky.

    One factorization custom call + one triangular solve; ~2.6x cheaper than
    the batched-LU ``jnp.linalg.inv`` on TPU (both are latency-bound custom
    calls, but Cholesky does half the work and one solve instead of two).
    """
    n = k_mat.shape[-1]
    chol = jnp.linalg.cholesky(k_mat)
    eye = jnp.eye(n, dtype=k_mat.dtype)
    l_inv = jax.lax.linalg.triangular_solve(chol, eye, left_side=True,
                                            lower=True)
    return l_inv.T @ l_inv


def _ns_cold_inverse(k_mat: jnp.ndarray, n_iters: int) -> jnp.ndarray:
    """Inverse of an SPD matrix by Newton-Schulz from a cold seed — zero
    factorization custom calls, pure MXU matmuls.

    Seed ``X0 = I / ||K||_inf`` is spectrally safe for SPD ``K``:
    ``eig(X0 K) in (0, 1]`` so ``rho(I - X0 K) = 1 - lmin/||K||_inf < 1``.
    Error squares every iteration from ``~1 - 1/(c kappa)``; the planner's
    Ruiz-equilibrated KKT matrices measure ``kappa <= ~6e2`` (median 3e2),
    so ~16 iterations reach f32 accuracy and 18 covers f64 QP tests too.
    """
    n = k_mat.shape[-1]
    norm_inf = jnp.max(jnp.sum(jnp.abs(k_mat), axis=-1))
    x0 = jnp.eye(n, dtype=k_mat.dtype) / norm_inf
    return _ns_refresh(k_mat, x0, n_iters)


def _ns_refresh(k_new: jnp.ndarray, x_old: jnp.ndarray,
                n_iters: int = 8) -> jnp.ndarray:
    """Newton–Schulz refresh: re-converge an inverse after the matrix moved.

    ``X <- X (2I - K X)`` doubles the correct digits per step whenever
    ``spectral_radius(I - K X0) < 1``. Here ``K_new = K_old + (g-1) rho
    A^T A`` with the rho step factor ``g`` clipped below 2 by the caller, so
    ``I - X_old K_new = -(g-1) rho X_old A^T A`` has eigenvalues in
    ``(-(g-1), 0]`` for rho increases and ``[0, 1-g)`` for decreases — both
    inside the unit disk. Pure MXU matmuls: ~30x cheaper than refactorizing.
    """
    n = k_new.shape[-1]
    eye2 = 2.0 * jnp.eye(n, dtype=k_new.dtype)

    def body(x, _):
        return x @ (eye2 - k_new @ x), None

    x, _ = jax.lax.scan(body, x_old, None, length=n_iters)
    return x


def solve_qp(p_mat: jnp.ndarray, q: jnp.ndarray, a_mat: jnp.ndarray,
             lo: jnp.ndarray, hi: jnp.ndarray,
             cfg: SolverConfig = SolverConfig(),
             x0: Optional[jnp.ndarray] = None,
             y0: Optional[jnp.ndarray] = None) -> QPSolution:
    """Solve one QP; ``vmap`` this for batches.

    All shapes static: ``p_mat [n,n]``, ``q [n]``, ``a_mat [m,n]``,
    ``lo/hi [m]`` (infinities allowed). The iteration runs in 4 segments of
    ``cfg.qp_iters // 4`` steps with rho re-scaled and the KKT inverse
    refreshed between segments; iterates freeze once both unscaled residuals
    drop below ``cfg.qp_tol`` (convergence masking instead of
    data-dependent exit — SURVEY.md §7 hard part 2).

    All dots run at full f32 matmul precision: the TPU default (bf16 MXU
    passes) carries ~1e-2 relative error, which makes the ~1e-6-min-eig
    condensed KKT matrix numerically indefinite (NaN Cholesky) and stalls
    residuals far above ``qp_tol``. The extra MXU passes are noise next to
    the factorization custom call.
    """
    with jax.default_matmul_precision("float32"):
        return _solve_qp_f32(p_mat, q, a_mat, lo, hi, cfg, x0, y0)


def _solve_qp_f32(p_mat, q, a_mat, lo, hi, cfg, x0, y0) -> QPSolution:
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

    n_segments = cfg.qp_segments
    seg_len = max(cfg.qp_iters // n_segments, 1)

    def unscaled_residuals(x, z, y):
        prim = jnp.max(jnp.abs((as_ @ x - z) / e))
        dual = jnp.max(jnp.abs((ps @ x + qs + as_.T @ y) / (c * d)))
        return prim, dual

    def segment(carry, seg_idx):
        x, z, y, rho, done, iters, kkt_inv = carry
        # an explicit inverse (applied as one MXU matmul per iteration)
        # instead of per-iteration triangular solves; computed exactly once
        # (Cholesky) and refreshed across rho changes with Newton-Schulz
        # matmuls — factorization custom calls are the dominant cost of the
        # whole solve on TPU (see module docstring).
        kkt = ps + sigma * eye_n + rho * ata
        if seg_idx == 0:
            kkt_inv = (_ns_cold_inverse(kkt, cfg.qp_ns_iters)
                       if cfg.qp_kkt == "ns" else _spd_inverse(kkt))
        else:
            kkt_inv = _ns_refresh(kkt, kkt_inv)

        # residuals are only evaluated at segment boundaries: checking
        # them every iteration costs three extra reads of the (large)
        # constraint tensor per iteration — the measured HBM-bandwidth
        # bottleneck of the batched edge QPs. A converged iterate is a
        # fixed point, so the extra in-segment iterations are no-ops.
        # (A fused Pallas segment kernel was A/B-measured and removed in
        # round 3 — see tools/exp_qp_ab.py and SolverConfig's note: the
        # XLA batched path wins by 2.5-390x at planner shapes.)
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
            step, (x, z, y), None, length=seg_len,
            unroll=min(cfg.qp_unroll, seg_len))
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
        # the per-segment step factor is clipped to keep the Newton-Schulz
        # inverse refresh contractive (factor < 2, see _ns_refresh); the
        # clip only slows extreme rho swings down to one segment each
        factor = jnp.clip(jnp.sqrt(prim_rel / jnp.maximum(dual_rel, 1e-12)),
                          0.2, 1.9)
        new_rho = jnp.clip(rho * factor, 1e-6, 1e6)
        rho = jnp.where(done, rho, new_rho)
        return (x, z, y, rho, done, iters, kkt_inv)

    carry = (x, z, y, jnp.asarray(cfg.qp_rho, dtype), jnp.asarray(False),
             jnp.asarray(0, jnp.int32), jnp.zeros((n, n), dtype))
    # unrolled (segment 0 factorizes, the rest Newton-Schulz-refresh — the
    # bodies differ, and n_segments is tiny)
    for seg_idx in range(n_segments):
        carry = segment(carry, seg_idx)
    x, z, y, _, done, iters, _ = carry
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
