"""Structured interior-point solver for temporally-staged NLPs.

The OBCA subproblems are optimal-control problems: dynamics couple adjacent
horizon steps only, and every other constraint (OBCA duals, boxes, pairing)
lives within one step (ref ``decentralized/optimizer.py:84-129`` builds them
with a per-step loop; ``centralized/optimizer.py:148-194`` likewise). Their
KKT systems are therefore **block-tridiagonal** under a time-major variable
permutation — the structure SURVEY.md §7.4 names as this domain's
speed-of-light component. :mod:`.ip` ignores it and solves a dense
``[n+m_e]^2`` system per iteration; this module exploits it:

* the NLP is declared **per stage**: ``w[k]`` holds every step-``k`` decision
  block (states, controls, OBCA duals, slacks), constraints split into
  *link* equalities (dynamics, coupling ``w[k-1] -> w[k]``) and *stage*
  equalities/inequalities (everything else);
* all derivatives are **vmapped small Hessians/Jacobians per stage** —
  O(T) blocks of size 2b instead of one ``jax.hessian`` over the whole
  ``T b``-wide graph (the assembly, not just the solve, is what blows up
  the dense path at V >= 4);
* the condensed KKT solve is a **block-Thomas factorization**: a
  ``lax.scan`` over stages with one ``[B, B]`` solve each — O(T B^3)
  instead of O((T B)^3).

Iteration logic (slack barrier, fraction-to-boundary, l1-merit line search,
gradient scaling, NaN guard) mirrors :func:`..solvers.ip.solve_nlp` so the
two solvers are drop-in interchangeable on the same problem; parity is
asserted in ``tests/test_ip_staged.py``.

Stage convention: stages ``k = 0..T-1``. ``ce_link(w_prev, w_k, p_k)`` is
evaluated for every ``k`` with ``w_prev = w[k-1]`` (a zero ghost block at
``k = 0``); builders must gate the ghost read with a per-stage flag in
``p`` (e.g. ``jnp.where(p['first'], init_state, x_prev)``) so the k = 0
Jacobian w.r.t. the ghost is exactly zero.
"""
from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from .linalg import dense_solve, equil_solve
from ..config import SolverConfig


class StagedNLP(NamedTuple):
    """min sum_k f_stage(w_k, p_k)
    s.t.  ce_link(w_{k-1}, w_k, p_k) = 0    (dynamics-style coupling)
          ce_stage(w_k, p_k) = 0            (within-stage equalities)
          ci_stage(w_k, p_k) >= 0           (within-stage inequalities)
    """

    f_stage: Callable     # (w_k, p_k) -> scalar
    ce_link: Callable     # (w_prev, w_k, p_k) -> [ml]
    ce_stage: Callable    # (w_k, p_k) -> [ms]
    ci_stage: Callable    # (w_k, p_k) -> [q]


class StagedSolution(NamedTuple):
    w: jnp.ndarray           # [T, b]
    y_link: jnp.ndarray      # [T, ml] link-equality multipliers
    y_stage: jnp.ndarray     # [T, ms] stage-equality multipliers
    z: jnp.ndarray           # [T, q]  inequality multipliers (>= 0)
    s: jnp.ndarray           # [T, q]  slacks (> 0)
    kkt_error: jnp.ndarray
    iterations: jnp.ndarray
    converged: jnp.ndarray


def _prev(w):
    """w_{k-1} with a zero ghost block at k = 0."""
    return jnp.concatenate([jnp.zeros_like(w[:1]), w[:-1]], axis=0)


def _ftb(v, dv, tau):
    """Fraction-to-boundary over the whole [T, q] tensor."""
    ratio = jnp.where(dv < 0, -tau * v / jnp.where(dv < 0, dv, -1.0), 1.0)
    return jnp.minimum(1.0, jnp.min(ratio, initial=1.0))


def block_thomas_solve(diag, upper, rhs):
    """Solve a symmetric block-tridiagonal system.

    ``diag [T, B, B]``: diagonal blocks; ``upper [T-1 or T, B, B]``: blocks
    coupling stage k to k+1 (entry T-1, if present, is ignored); the
    subdiagonal is ``upper^T`` (symmetry). ``rhs [T, B]``. Returns ``[T, B]``.

    Sequential over stages (a lax.scan), one ``[B, B+1]`` solve per stage —
    the textbook block-Thomas recursion. For H <= 30 horizons the sequential
    chain is short; the per-stage solves are small dense ops that batch well
    under vmap over (vehicles x scenarios).

    In f32 each per-stage solve is Ruiz-equilibrated (:func:`..solvers.linalg
    .equil_solve`): the planner's annealed-prox Hessians mix O(1e6) diagonal
    curvature with O(1) constraint rows, which raw f32 LU cannot factor
    accurately (VERDICT r4 next #1a — the f32-on-TPU flagship enabler).
    """
    t, b = rhs.shape[0], rhs.shape[1]
    solve = dense_solve if rhs.dtype == jnp.float64 else equil_solve
    up = jnp.concatenate([upper[:t - 1],
                          jnp.zeros((1, b, b), rhs.dtype)], axis=0) \
        if upper.shape[0] >= t else jnp.concatenate(
            [upper, jnp.zeros((1, b, b), rhs.dtype)], axis=0)

    def fwd(carry, blk):
        x_prev, y_prev = carry           # X_{k-1} [B,B], y_{k-1} [B]
        d_k, u_km1, u_k, r_k = blk
        c_k = d_k - u_km1.T @ x_prev
        g_k = r_k - u_km1.T @ y_prev
        sol = solve(c_k, jnp.concatenate(
            [u_k, g_k[:, None]], axis=1))
        x_k, y_k = sol[:, :b], sol[:, b]
        return (x_k, y_k), (x_k, y_k)

    up_prev = jnp.concatenate([jnp.zeros((1, b, b), rhs.dtype), up[:-1]],
                              axis=0)
    (_, _), (xs, ys) = jax.lax.scan(
        fwd, (jnp.zeros((b, b), rhs.dtype), jnp.zeros((b,), rhs.dtype)),
        (diag, up_prev, up, rhs))

    def bwd(z_next, blk):
        x_k, y_k = blk
        z_k = y_k - x_k @ z_next
        return z_k, z_k

    _, zs = jax.lax.scan(bwd, jnp.zeros((b,), rhs.dtype), (xs, ys),
                         reverse=True)
    return zs


def solve_staged(snlp: StagedNLP, w0: jnp.ndarray, p,
                 cfg: SolverConfig = SolverConfig(),
                 yl0: Optional[jnp.ndarray] = None,
                 ys0: Optional[jnp.ndarray] = None,
                 z0: Optional[jnp.ndarray] = None) -> StagedSolution:
    """Solve one staged NLP instance (vmap for batches).

    Same algorithm as :func:`..solvers.ip.solve_nlp` (slack interior point,
    l1-merit backtracking, adaptive barrier), with per-stage derivative
    assembly and the block-Thomas KKT solve.
    """
    with jax.default_matmul_precision("float32"):
        return _solve_staged_f32(snlp, w0, p, cfg, yl0, ys0, z0)


def _solve_staged_f32(snlp, w0, p, cfg, yl0, ys0, z0):
    dtype = w0.dtype
    t, b = w0.shape
    p0 = jax.tree.map(lambda a: a[0], p)
    ml = jax.eval_shape(snlp.ce_link, w0[0], w0[0], p0).shape[0]
    ms = jax.eval_shape(snlp.ce_stage, w0[0], p0).shape[0]
    q = jax.eval_shape(snlp.ci_stage, w0[0], p0).shape[0]
    tau = 0.995
    sigma_mu = 0.2
    tol = cfg.ip_tol
    eps_reg = 1e-8

    # vmapped per-stage evaluators -----------------------------------------
    v_f = jax.vmap(snlp.f_stage)
    v_cl = jax.vmap(snlp.ce_link)
    v_cs = jax.vmap(snlp.ce_stage)
    v_ci = jax.vmap(snlp.ci_stage)

    # gradient-based scaling (ip.py:90-103), frozen at w0, per stage row
    g_max = 100.0
    raw_g = jax.vmap(jax.grad(snlp.f_stage))(w0, p)
    c_f = jnp.minimum(1.0, g_max / jnp.maximum(
        jnp.max(jnp.abs(raw_g), initial=0.0), 1e-8))
    wp0 = _prev(w0)
    raw_jl = jax.vmap(jax.jacfwd(snlp.ce_link, argnums=(0, 1)))(wp0, w0, p)
    s_l = jnp.minimum(1.0, g_max / jnp.maximum(jnp.maximum(
        jnp.max(jnp.abs(raw_jl[0]), axis=-1),
        jnp.max(jnp.abs(raw_jl[1]), axis=-1)), 1e-8)) \
        if ml else jnp.zeros((t, 0), dtype)
    raw_js = jax.vmap(jax.jacfwd(snlp.ce_stage))(w0, p)
    s_s = jnp.minimum(1.0, g_max / jnp.maximum(
        jnp.max(jnp.abs(raw_js), axis=-1), 1e-8)) \
        if ms else jnp.zeros((t, 0), dtype)
    raw_ji = jax.vmap(jax.jacfwd(snlp.ci_stage))(w0, p)
    s_i = jnp.minimum(1.0, g_max / jnp.maximum(
        jnp.max(jnp.abs(raw_ji), axis=-1), 1e-8)) \
        if q else jnp.zeros((t, 0), dtype)

    def f_tot(w):
        return c_f * jnp.sum(v_f(w, p))

    def cl_all(w):
        return s_l * v_cl(_prev(w), w, p) if ml else jnp.zeros((t, 0), dtype)

    def cs_all(w):
        return s_s * v_cs(w, p) if ms else jnp.zeros((t, 0), dtype)

    def ci_all(w):
        return s_i * v_ci(w, p) if q else jnp.zeros((t, 0), dtype)

    # per-stage scaled pieces for derivative assembly
    def f_k(w_k, p_k, c):
        return c * snlp.f_stage(w_k, p_k)

    def lag_stage(w_prev, w_k, p_k, yl_k, ys_k, z_k, sl_k, ss_k, si_k):
        """Stage-k Lagrangian contribution (scaled)."""
        val = c_f * snlp.f_stage(w_k, p_k)
        if ml:
            val -= yl_k @ (sl_k * snlp.ce_link(w_prev, w_k, p_k))
        if ms:
            val -= ys_k @ (ss_k * snlp.ce_stage(w_k, p_k))
        if q:
            val -= z_k @ (si_k * snlp.ci_stage(w_k, p_k))
        return val

    # Hessian of the stage contribution w.r.t. (w_prev, w_k): [2b, 2b]
    def stage_hess(w_prev, w_k, p_k, yl_k, ys_k, z_k, sl_k, ss_k, si_k):
        def pair_fn(v2):
            return lag_stage(v2[:b], v2[b:], p_k, yl_k, ys_k, z_k,
                             sl_k, ss_k, si_k)
        return jax.hessian(pair_fn)(jnp.concatenate([w_prev, w_k]))

    v_hess = jax.vmap(stage_hess)
    v_jl = jax.vmap(jax.jacfwd(snlp.ce_link, argnums=(0, 1)))
    v_js = jax.vmap(jax.jacfwd(snlp.ce_stage))
    v_ji = jax.vmap(jax.jacfwd(snlp.ci_stage))
    v_g = jax.vmap(jax.grad(snlp.f_stage))

    s_init = jnp.maximum(ci_all(w0), 1e-2)
    z_init = jnp.full((t, q), 1.0, dtype) if z0 is None else z0
    yl_init = jnp.zeros((t, ml), dtype) if yl0 is None else yl0
    ys_init = jnp.zeros((t, ms), dtype) if ys0 is None else ys0
    mu0 = jnp.maximum(jnp.asarray(cfg.ip_mu0, dtype),
                      jnp.mean(s_init * z_init) if q else 0.0)

    def merit(w, s, mu, nu):
        barrier = -mu * jnp.sum(jnp.log(jnp.maximum(s, 1e-300)))
        infeas = (jnp.sum(jnp.abs(cl_all(w))) + jnp.sum(jnp.abs(cs_all(w)))
                  + jnp.sum(jnp.abs(ci_all(w) - s)))
        return f_tot(w) + barrier + nu * infeas

    def resid_dual(w, yl, ys, z):
        """Stationarity residual [T, b] assembled from per-stage Jacobians."""
        g = c_f * v_g(w, p)
        wp = _prev(w)
        if ml:
            jl_p, jl_c = v_jl(wp, w, p)
            jl_p = s_l[:, :, None] * jl_p
            jl_c = s_l[:, :, None] * jl_c
            # A_k^T yl_k (own stage) + B_{k+1}^T yl_{k+1} (next stage's link)
            own = jnp.einsum('tmb,tm->tb', jl_c, yl)
            nxt = jnp.einsum('tmb,tm->tb', jl_p, yl)       # w_{k-1} slot of k
            nxt = jnp.concatenate([nxt[1:], jnp.zeros((1, b), dtype)], axis=0)
            g = g - own - nxt
        if ms:
            js = s_s[:, :, None] * v_js(w, p)
            g = g - jnp.einsum('tmb,tm->tb', js, ys)
        if q:
            ji = s_i[:, :, None] * v_ji(w, p)
            g = g - jnp.einsum('tmb,tm->tb', ji, z)
        return g

    def kkt_error(w, s, yl, ys, z):
        err = jnp.max(jnp.abs(resid_dual(w, yl, ys, z)), initial=0.0)
        err = jnp.maximum(err, jnp.max(jnp.abs(cl_all(w)), initial=0.0))
        err = jnp.maximum(err, jnp.max(jnp.abs(cs_all(w)), initial=0.0))
        err = jnp.maximum(err, jnp.max(jnp.abs(ci_all(w) - s), initial=0.0))
        err = jnp.maximum(err, jnp.max(jnp.abs(s * z), initial=0.0))
        return err

    bb = b + ml + ms                      # KKT block width

    def body(carry, _):
        w, s, yl, ys, z, mu, delta, done, iters = carry
        wp = _prev(w)

        # per-stage derivative blocks (all vmapped)
        hh = v_hess(wp, w, p, yl, ys, z,
                    s_l if ml else jnp.zeros((t, 0), dtype),
                    s_s if ms else jnp.zeros((t, 0), dtype),
                    s_i if q else jnp.zeros((t, 0), dtype))   # [T, 2b, 2b]
        q_blk = hh[:, b:, b:]             # d2/dw_k^2 of stage k
        p_blk = hh[:, :b, :b]             # d2/dw_prev^2 of stage k
        c_blk = hh[:, :b, b:]             # d2/dw_prev dw_k of stage k
        # H_kk = Q_k + P_{k+1};  H_{k,k+1} = C_{k+1}^T  (prev = k, cur = k+1)
        h_diag = q_blk + jnp.concatenate(
            [p_blk[1:], jnp.zeros((1, b, b), dtype)], axis=0)
        h_off = jnp.concatenate(
            [jnp.transpose(c_blk[1:], (0, 2, 1)),
             jnp.zeros((1, b, b), dtype)], axis=0)            # [T, b, b]

        if ml:
            jl_p, jl_c = v_jl(wp, w, p)
            jl_p = s_l[:, :, None] * jl_p                     # B_k [T, ml, b]
            jl_c = s_l[:, :, None] * jl_c                     # A_k [T, ml, b]
        else:
            jl_p = jl_c = jnp.zeros((t, 0, b), dtype)
        js = (s_s[:, :, None] * v_js(w, p)) if ms \
            else jnp.zeros((t, 0, b), dtype)
        ji = (s_i[:, :, None] * v_ji(w, p)) if q \
            else jnp.zeros((t, 0, b), dtype)

        c_l = cl_all(w)
        c_s = cs_all(w)
        r_i = ci_all(w) - s
        r_c = s * z - mu
        sigma = z / jnp.maximum(s, 1e-12)

        # condensed diag: H_kk + J_k^T Sigma J_k + delta I
        h_cond = (h_diag + jnp.einsum('tqb,tq,tqc->tbc', ji, sigma, ji)
                  + delta * jnp.eye(b, dtype=dtype))

        r_d = resid_dual(w, yl, ys, z)
        rhs_x = -(r_d + jnp.einsum(
            'tqb,tq->tb', ji, r_c / jnp.maximum(s, 1e-12) + sigma * r_i))

        # assemble per-stage KKT blocks [T, B, B] / [T, B]
        zed = jnp.zeros
        d_blk = jnp.concatenate([
            jnp.concatenate([h_cond, jnp.transpose(jl_c, (0, 2, 1)),
                             jnp.transpose(js, (0, 2, 1))], axis=2),
            jnp.concatenate([jl_c, -eps_reg * jnp.broadcast_to(
                jnp.eye(ml, dtype=dtype), (t, ml, ml)),
                zed((t, ml, ms), dtype)], axis=2),
            jnp.concatenate([js, zed((t, ms, ml), dtype),
                             -eps_reg * jnp.broadcast_to(
                jnp.eye(ms, dtype=dtype), (t, ms, ms))], axis=2)],
            axis=1)
        # U_k: rows (w_k) x cols (w_{k+1}, yl_{k+1}, ys_{k+1})
        b_next = jnp.concatenate([jl_p[1:], zed((1, ml, b), dtype)], axis=0)
        u_top = jnp.concatenate([h_off, jnp.transpose(b_next, (0, 2, 1)),
                                 zed((t, b, ms), dtype)], axis=2)
        u_blk = jnp.concatenate([u_top, zed((t, ml + ms, bb), dtype)], axis=1)
        rhs = jnp.concatenate([rhs_x, -c_l, -c_s], axis=1)    # [T, B]

        u_pad = jnp.concatenate([u_blk[:t - 1],
                                 jnp.zeros((1, bb, bb), dtype)], axis=0)
        u_prev = jnp.concatenate([jnp.zeros((1, bb, bb), dtype),
                                  u_pad[:-1]], axis=0)

        def tridiag_residual(vec):
            nxt = jnp.concatenate([vec[1:], jnp.zeros((1, bb), dtype)],
                                  axis=0)
            prv = jnp.concatenate([jnp.zeros((1, bb), dtype), vec[:-1]],
                                  axis=0)
            return (jnp.einsum('tij,tj->ti', d_blk, vec)
                    + jnp.einsum('tij,tj->ti', u_pad, nxt)
                    + jnp.einsum('tji,tj->ti', u_prev, prv) - rhs)

        sol = block_thomas_solve(d_blk, u_blk, rhs)           # [T, B]
        # iterative-refinement pass(es): Thomas without pivoting in f32
        # (the TPU path) loses enough accuracy on ill-conditioned stages to
        # stall the line search; each correction costs one extra block solve.
        # f32 gets a second pass (annealed-prox KKT blocks reach kappa ~1e6)
        n_refine = 1 if dtype == jnp.float64 else 2
        for _ in range(n_refine):
            sol = sol - block_thomas_solve(d_blk, u_blk,
                                           tridiag_residual(sol))
        # Solve verification: block-Thomas has NO pivoting across blocks, so
        # a (near-)singular leading block on a hard nonconvex instance yields
        # finite garbage the NaN guard misses — one tridiagonal matvec checks
        # the residual; a bad solve becomes a zero step + delta escalation
        # (the dense solver gets this robustness from LU partial pivoting).
        lin_res = tridiag_residual(sol)
        res_tol = 1e-4 * (1.0 + jnp.max(jnp.abs(rhs), initial=0.0))
        bad = jnp.logical_or(
            jnp.logical_not(jnp.all(jnp.isfinite(sol))),
            jnp.max(jnp.abs(lin_res), initial=0.0) > res_tol)
        sol = jnp.where(bad, jnp.zeros_like(sol), sol)
        dw = sol[:, :b]
        dyl = -sol[:, b:b + ml]
        dys = -sol[:, b + ml:]
        ds = jnp.einsum('tqb,tb->tq', ji, dw) + r_i
        dz = -(r_c + z * ds) / jnp.maximum(s, 1e-12)

        a_p_max = _ftb(s, ds, tau) if q else jnp.asarray(1.0, dtype)
        a_d = _ftb(z, dz, tau) if q else jnp.asarray(1.0, dtype)

        nu = jnp.maximum(10.0, 2.0 * jnp.maximum(
            jnp.max(jnp.abs(yl), initial=0.0) if ml else 0.0,
            jnp.maximum(jnp.max(jnp.abs(ys), initial=0.0) if ms else 0.0,
                        jnp.max(jnp.abs(z), initial=0.0) if q else 0.0)))
        phi0 = merit(w, s, mu, nu)
        alphas = a_p_max * (0.5 ** jnp.arange(6, dtype=dtype))
        phis = jax.vmap(lambda a: merit(
            w + a * dw, jnp.maximum(s + a * ds, 1e-12), mu, nu))(alphas)
        ok = jnp.logical_and(phis < phi0 + 1e-10 * jnp.abs(phi0) + 1e-12,
                             jnp.isfinite(phis))
        first_ok = jnp.argmax(ok)
        any_ok = jnp.logical_and(jnp.any(ok), jnp.logical_not(bad))
        # full rejection -> ZERO step (never walk up the merit) + delta bump
        a_p = jnp.where(any_ok, alphas[first_ok], 0.0)
        a_d2 = jnp.where(any_ok, a_d, 0.0)
        delta_next = jnp.where(any_ok, jnp.maximum(delta * 0.2, 1e-9),
                               jnp.minimum(jnp.maximum(delta, 1e-6) * 10.0,
                                           1e6))

        w_new = w + a_p * dw
        s_new = jnp.maximum(s + a_p * ds, 1e-12)
        yl_new = yl + a_d2 * dyl
        ys_new = ys + a_d2 * dys
        z_new = jnp.maximum(z + a_d2 * dz, 1e-12) if q else z
        mu_new = (jnp.maximum(sigma_mu * jnp.mean(s_new * z_new), tol / 10)
                  if q else jnp.asarray(tol / 10, dtype))

        err = kkt_error(w_new, s_new, yl_new, ys_new, z_new)
        now_done = err < tol
        keep = lambda a_, b_: jnp.where(done, b_, a_)
        return (keep(w_new, w), keep(s_new, s), keep(yl_new, yl),
                keep(ys_new, ys), keep(z_new, z), keep(mu_new, mu),
                keep(delta_next, delta), jnp.logical_or(done, now_done),
                iters + jnp.logical_not(done).astype(jnp.int32)), None

    init = (w0, s_init, yl_init, ys_init, z_init, jnp.asarray(mu0, dtype),
            jnp.asarray(1e-8, dtype), jnp.asarray(False),
            jnp.asarray(0, jnp.int32))
    (w, s, yl, ys, z, _, _, done, iters), _ = jax.lax.scan(
        body, init, None, length=cfg.ip_iters)
    # unscale multipliers/slacks (ip.py:215-218)
    yl_out = s_l * yl / c_f if ml else yl
    ys_out = s_s * ys / c_f if ms else ys
    z_out = s_i * z / c_f if q else z
    s_out = s / jnp.maximum(s_i, 1e-12) if q else s
    return StagedSolution(w=w, y_link=yl_out, y_stage=ys_out, z=z_out,
                          s=s_out, kkt_error=kkt_error(w, s, yl, ys, z),
                          iterations=iters, converged=done)
