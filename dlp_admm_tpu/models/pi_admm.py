"""Unicycle PI-ADMM planner: classic (stacked) and per-pair (gated) engines.

TPU-native re-implementation of the reference's PI-ADMM line (SURVEY.md
C10-C14):

* **classic** engine ≙ ``casadi_old_PI_ADMM/main.py`` / MATLAB
  ``ADMM_CVX_two_veh_intesection_PI_antiwindup.m``: one stacked consensus
  state per vehicle, edge solves all vehicles jointly, PI dual update with
  anti-windup and adaptive rho.
* **pairwise** engine ≙ ``casadi/main.py``: per-ordered-pair consensus cells
  ``hat_pos[i, j]`` and duals, collision-pair gating via ``edge_mat`` with
  early exit, per-pair edge subproblems — the scalable layout for the
  16-vehicle benchmark (dense ``[P, ...]`` tensors + masks instead of
  ``np.where(edge_mat == 1)`` gathers).

Key TPU redesigns vs the reference (SURVEY.md §3 hot loops, §7):

1. The reference rebuilds a CasADi+IPOPT/OSQP solver instance per subproblem
   per ADMM iteration per MPC step. Here each subproblem family is traced
   once: local solves are one vmapped batched QP; edge solves are a
   sequential-convexification loop (linearize the nonlinear edge rollout,
   solve a slack-form hinge QP) — also batched.
2. The collision hinge ``beta * max(0, thres^2 - dis)`` becomes slack
   variables ``t >= 0, t >= thres^2 - dis`` in the QP (exact reformulation of
   the convexified subproblem).
3. The inner ADMM loop is a ``lax.while_loop`` with a convergence flag — the
   compiled step runs exactly as many iterations as the reference's
   early-breaking Python loop.
4. The old Python port's ``range(num_veh-1)`` edge-AL bug (only vehicle 0
   entered the AL term, ``casadi_old_PI_ADMM/PI_ADMM_class.py:147-171``) is
   fixed to the MATLAB semantics (``cost_function_edge.m:15-35``): every
   vehicle's trajectory enters the AL, every ordered pair enters the hinge.
"""
from __future__ import annotations


from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import (DualUpdateConfig, PiAdmmConfig,
                      SolverConfig)
from ..coordination.dual_update import DualState, init_dual_state, update_dual
from ..coordination.residuals import (min_pair_distance, per_edge_residuals,
                                      stacked_residuals)
from ..ops.dynamics import unicycle_rollout_edge, unicycle_rollout_local
from ..ops.pairs import num_pairs, pair_indices
from ..solvers.qp import solve_qp


# %% affine models of the rollouts -------------------------------------------

def _local_affine_ad(xt_i, spd_i, horizon, dt, wheel_base):
    """AD reference for :func:`_local_affine` (kept for tests)."""

    def roll(u):
        x, y, _ = unicycle_rollout_local(xt_i, u, spd_i, dt, wheel_base)
        return jnp.concatenate([x, y])

    zero = jnp.zeros(horizon, xt_i.dtype)
    return roll(zero), jax.jacfwd(roll)(zero)


def _local_affine(xt_i, spd_i, horizon, dt, wheel_base):
    """pos(u) = pos0 + B u for the locally-linearized rollout (exact: the
    local rollout is affine in u — ref ``PI_ADMM_class.py:45-70``).

    Closed form instead of ``jacfwd`` (which costs H forward tangents): with
    the Taylor heading th0 fixed, ``th_k`` is linear in u
    (``dth_k/du_m = dt v / L`` for ``m < k``) and x/y integrate -v sin(th0) /
    +v cos(th0) times th, so

        dx_k/du_m = -(dt^2 v^2 / L) sin(th0) * max(k - 1 - m, 0)
        dy_k/du_m = +(dt^2 v^2 / L) cos(th0) * max(k - 1 - m, 0)

    One O(H^2) elementwise outer ramp; cheap enough to recompute per
    fused-loop trip (see :meth:`PiAdmmEngine.run_fused_batch`). Verified
    against the AD form in ``tests/test_pi_admm.py``.
    """
    dtype = xt_i.dtype
    zero = jnp.zeros(horizon, dtype)
    x0, y0, _ = unicycle_rollout_local(xt_i, zero, spd_i, dt, wheel_base)
    pose0 = jnp.concatenate([x0, y0])
    th0 = xt_i[2]
    c = dt * dt * spd_i * spd_i / wheel_base
    k = jnp.arange(horizon + 1, dtype=dtype)[:, None]
    m = jnp.arange(horizon, dtype=dtype)[None, :]
    ramp = jnp.maximum(k - 1.0 - m, 0.0)
    bx = -c * jnp.sin(th0) * ramp
    by = c * jnp.cos(th0) * ramp
    return pose0, jnp.concatenate([bx, by], axis=0)


def _edge_affine_ad(xt_i, spd_i, u0_i, dt, wheel_base):
    """AD reference for :func:`_edge_affine` (kept for tests)."""

    def roll(u):
        x, y, _ = unicycle_rollout_edge(xt_i, u, spd_i, dt, wheel_base)
        return jnp.concatenate([x, y])

    return roll(u0_i), jax.jacfwd(roll)(u0_i)


def _edge_affine(xt_i, spd_i, u0_i, dt, wheel_base):
    """First-order model of the *nonlinear* edge rollout at u0 (the SQP
    linearization replacing IPOPT's internal handling of
    ``dynamic_update_edge``, ref ``PI_ADMM_class.py:77-105``).

    Closed form instead of ``jacfwd`` over the scan (which costs H forward
    tangents): the edge model is exactly ``x_+ = x + dt v cos(th)``,
    ``th_+ = th + (dt v / L) u`` — the reference's "relinearized" RHS
    ``-v sin(th) th + v cos(th) + v th sin(th)`` simplifies to ``v cos(th)``
    — so ``th_k`` is *linear* in u and

        d x_k / d u_m = -(dt^2 v^2 / L) * sum_{j=m+1}^{k-1} sin(th_j)

    i.e. masked differences of sin/cos cumulative sums along the rolled-out
    headings. One rollout + O(H^2) elementwise ops, no AD pass.
    """
    h = u0_i.shape[0]
    x, y, th = unicycle_rollout_edge(xt_i, u0_i, spd_i, dt, wheel_base)
    pose0 = jnp.concatenate([x, y])
    c = dt * dt * spd_i * spd_i / wheel_base
    # S[k] = sum_{j<k} sin(th_j), k = 0..H (th_j for j = 0..H-1)
    zero = jnp.zeros((1,), th.dtype)
    s_cum = jnp.concatenate([zero, jnp.cumsum(jnp.sin(th[:-1]))])
    c_cum = jnp.concatenate([zero, jnp.cumsum(jnp.cos(th[:-1]))])
    k = jnp.arange(h + 1)[:, None]
    m = jnp.arange(h)[None, :]
    mask = (k >= m + 2).astype(th.dtype)
    bx = -c * (s_cum[k] - s_cum[m + 1]) * mask
    by = c * (c_cum[k] - c_cum[m + 1]) * mask
    return pose0, jnp.concatenate([bx, by], axis=0)


# %% local (vehicle-side) QP --------------------------------------------------

def _second_diff(h: int) -> np.ndarray:
    d = np.zeros((max(h - 2, 0), h))
    for k in range(h - 2):
        d[k, k], d[k, k + 1], d[k, k + 2] = 1.0, -2.0, 1.0
    return d


def _first_diff(h: int) -> np.ndarray:
    d = np.zeros((max(h - 1, 0), h))
    for k in range(h - 1):
        d[k, k], d[k, k + 1] = -1.0, 1.0
    return d


class _LocalStatics(NamedTuple):
    d2: jnp.ndarray       # [H-2, H] second difference (steering smoothness)
    a_con: jnp.ndarray    # [H + H-1, H] box + rate constraint rows
    lo: jnp.ndarray
    hi: jnp.ndarray


def _local_statics(cfg: PiAdmmConfig, dtype) -> _LocalStatics:
    h = cfg.horizon
    d2 = jnp.asarray(_second_diff(h), dtype)
    a_con = jnp.asarray(np.vstack([np.eye(h), _first_diff(h)]), dtype)
    lo = jnp.concatenate([jnp.full(h, -cfg.u_max, dtype),
                          jnp.full(h - 1, -cfg.du_max, dtype)])
    hi = -lo
    return _LocalStatics(d2, a_con, lo, hi)


def _solve_local_qp(pos0, b_mat, ref_flat, hats, duals, al_w, rho,
                    u_warm, statics: _LocalStatics, cfg: PiAdmmConfig,
                    scfg: SolverConfig):
    """One vehicle's primal QP (ref ``cost_function_primal``,
    ``PI_ADMM_class.py:110-133``).

    ``hats/duals``: ``[K, 2(H+1)]`` consensus/dual terms with weights
    ``al_w [K]`` (K = 1 stacked, K = V-1 per-pair).
    """
    btb = b_mat.T @ b_mat
    p_mat = (2.0 * cfg.p_norm * btb
             + 2.0 * statics.d2.T @ statics.d2
             + 2.0 * cfg.p_cost * jnp.eye(cfg.horizon, dtype=pos0.dtype)
             + rho * jnp.sum(al_w) * btb)
    q = 2.0 * cfg.p_norm * b_mat.T @ (pos0 - ref_flat)
    resid = pos0[None, :] - hats + duals           # [K, 2(H+1)]
    q = q + rho * b_mat.T @ jnp.sum(al_w[:, None] * resid, axis=0)
    sol = solve_qp(p_mat, q, statics.a_con, statics.lo, statics.hi, scfg,
                   x0=u_warm)
    return sol.x, pos0 + b_mat @ sol.x


# %% edge (coordinator-side) QP ----------------------------------------------

def _hinge_rows(be_i, be_j, pose0_i, pose0_j, last_dis, horizon):
    """Affine model of dis_temp_k for one pair at steps k = 1..H.

    ``dis_temp_k(u) = 2 <last_dis, pos_j_k - pos_i_k> - ||last_dis||^2``
    (ref ``cost_function_edge``, ``casadi/PI_ADMM_class.py:149-151``).
    Returns (const [H], g_i [H, H], g_j [H, H]) with
    ``dis_temp = const - g_i @ u_i + g_j @ u_j``.
    """
    h = horizon
    # rows of the flat pos vector: x_k at k, y_k at (H+1)+k, k = 1..H
    sel = jnp.arange(1, h + 1)
    gx_i, gy_i = be_i[sel, :], be_i[h + 1 + sel, :]
    gx_j, gy_j = be_j[sel, :], be_j[h + 1 + sel, :]
    px_i, py_i = pose0_i[sel], pose0_i[h + 1 + sel]
    px_j, py_j = pose0_j[sel], pose0_j[h + 1 + sel]
    ldx, ldy = last_dis[0], last_dis[1]
    const = (2.0 * (ldx * (px_j - px_i) + ldy * (py_j - py_i))
             - (ldx * ldx + ldy * ldy))
    g_i = 2.0 * (ldx * gx_i + ldy * gy_i)
    g_j = 2.0 * (ldx * gx_j + ldy * gy_j)
    return const, g_i, g_j


def edge_qp_m(cfg: PiAdmmConfig) -> int:
    """Constraint-row count of the per-pair edge QP (for dual warm starts)."""
    h = cfg.horizon
    return 2 * h + 2 * (h - 1) + h + h


def _solve_pair_edge_qp(xt_pair, spd_pair, pos_old_pair, dual_pair, last_dis,
                        u0, cfg: PiAdmmConfig, scfg: SolverConfig,
                        n_sqp: int = 2, y0=None, prox_tau: float = 0.0):
    """Edge subproblem for ONE vehicle pair via sequential convexification.

    Decision: ``w = [u_i (H), u_j (H), t (H)]``; objective
    ``2 beta sum(t) + Pcost ||u||^2 + rho/2 ||pos_old - pos_e(u) + dual||^2``;
    constraints box/rate on u, ``t >= 0``, ``t + dis_temp(u) >= thres^2``.
    The factor 2 on beta counts both ordered directions of the pair
    (MATLAB ``cost_function_edge.m:15-30`` sums over ordered pairs).

    ``prox_tau`` adds ``tau/2 ||u - u_lin||^2`` about the linearization
    point (the previous iteration's edge controls): a proximal term that
    damps the edge-side oscillation in tight conflict windows (VERDICT r3
    weak #6). ``tau = 0`` is exact reference semantics; the fixed point is
    unchanged for any tau because ``u = u_lin`` at convergence.

    Ref: the per-pair OSQP solve ``casadi/main.py:120-153``.
    """
    h = cfg.horizon
    dtype = pos_old_pair.dtype
    n = 3 * h
    rho = cfg.rho

    eye_h = jnp.eye(h, dtype=dtype)
    d1 = jnp.asarray(_first_diff(h), dtype)
    big = jnp.asarray(jnp.inf, dtype)

    # constant constraint rows: box u (2H), rate (2(H-1)), t >= 0 (H)
    zeros_hh = jnp.zeros((h, h), dtype)
    a_box = jnp.concatenate([jnp.eye(2 * h, dtype=dtype),
                             jnp.zeros((2 * h, h), dtype)], axis=1)
    a_rate = jnp.block([[d1, zeros_hh[: h - 1, :], zeros_hh[: h - 1, :]],
                        [zeros_hh[: h - 1, :], d1, zeros_hh[: h - 1, :]]])
    a_tpos = jnp.concatenate([jnp.zeros((h, 2 * h), dtype), eye_h], axis=1)

    lo_c = jnp.concatenate([jnp.full(2 * h, -cfg.u_max, dtype),
                            jnp.full(2 * (h - 1), -cfg.du_max, dtype),
                            jnp.zeros(h, dtype)])
    hi_c = jnp.concatenate([jnp.full(2 * h, cfg.u_max, dtype),
                            jnp.full(2 * (h - 1), cfg.du_max, dtype),
                            jnp.full(h, big, dtype)])

    if y0 is None:
        y0 = jnp.zeros(edge_qp_m(cfg), dtype)

    def sqp_iter(carry, _):
        u_lin, y_warm, _ = carry
        pose0_i, be_i = _edge_affine(xt_pair[0], spd_pair[0], u_lin[0],
                                     cfg.dt, cfg.wheel_base)
        pose0_j, be_j = _edge_affine(xt_pair[1], spd_pair[1], u_lin[1],
                                     cfg.dt, cfg.wheel_base)
        # affine pos_e(u) = c + Be u with c = pose0 - Be u_lin
        c_i = pose0_i - be_i @ u_lin[0]
        c_j = pose0_j - be_j @ u_lin[1]

        # quadratic objective blocks
        p_mat = jnp.zeros((n, n), dtype)
        p_mat = p_mat.at[: 2 * h, : 2 * h].add(
            (2.0 * cfg.p_cost + prox_tau) * jnp.eye(2 * h, dtype=dtype))
        p_mat = p_mat.at[:h, :h].add(rho * be_i.T @ be_i)
        p_mat = p_mat.at[h: 2 * h, h: 2 * h].add(rho * be_j.T @ be_j)
        # AL linear terms: rho/2 ||d - Be u||^2, d = pos_old + dual - c
        d_i = pos_old_pair[0] + dual_pair[0] - c_i
        d_j = pos_old_pair[1] + dual_pair[1] - c_j
        q = jnp.concatenate(
            [-rho * be_i.T @ d_i - prox_tau * u_lin[0],
             -rho * be_j.T @ d_j - prox_tau * u_lin[1],
             jnp.full(h, 2.0 * cfg.beta, dtype)])

        # hinge rows: t + dis_temp(u) >= thres^2
        const, g_i, g_j = _hinge_rows(be_i, be_j, c_i, c_j, last_dis, h)
        a_hinge = jnp.concatenate([-g_i, g_j, eye_h], axis=1)
        lo_h = cfg.dis_thres ** 2 - const
        hi_h = jnp.full(h, big, dtype)

        a_mat = jnp.concatenate([a_box, a_rate, a_tpos, a_hinge], axis=0)
        lo = jnp.concatenate([lo_c, lo_h])
        hi = jnp.concatenate([hi_c, hi_h])
        w0 = jnp.concatenate([u_lin.reshape(-1), jnp.zeros(h, dtype)])
        sol = solve_qp(p_mat, q, a_mat, lo, hi, scfg, x0=w0, y0=y_warm)
        u_new = sol.x[: 2 * h].reshape(2, h)
        return (u_new, sol.y, sol.converged), None

    init = (u0, y0, jnp.asarray(False))
    (u_opt, y_out, conv), _ = jax.lax.scan(sqp_iter, init, None, length=n_sqp)
    # consensus trajectories from the true nonlinear edge rollout
    # (ref casadi/main.py:156-158)
    ex, ey, _ = unicycle_rollout_edge(xt_pair, u_opt, spd_pair,
                                      cfg.dt, cfg.wheel_base)
    hat_pair = jnp.stack([ex, ey], axis=1)      # [2 sides, 2 xy, H+1]
    return u_opt, hat_pair, conv, y_out


def joint_edge_qp_m(cfg: PiAdmmConfig) -> int:
    """Constraint-row count of the joint (all-vehicle) edge QP."""
    v, h, p = cfg.num_veh, cfg.horizon, num_pairs(cfg.num_veh)
    return v * h + v * (h - 1) + p * h + p * h


def _solve_joint_edge_qp(xt, spd, pos_old, dual, last_dis, u0,
                         cfg: PiAdmmConfig, scfg: SolverConfig,
                         n_sqp: int = 2, y0=None, prox_tau: float = 0.0):
    """Edge subproblem over ALL vehicles jointly — the stacked formulation
    of the old reference line (``casadi_old_PI_ADMM/PI_ADMM_class.py:
    141-179`` builds ONE edge cost over every vehicle's hat-trajectory with
    a hinge per ordered pair; MATLAB ``cost_function_edge.m:15-35``), as
    opposed to the per-pair decomposition of ``casadi/main.py:120-153``.

    Decision ``w = [u_1..u_V (V H) | t_1..t_P (P H)]``; objective
    ``2 beta sum(t) + Pcost ||u||^2 + rho/2 sum_v ||pos_old_v - pos_e_v(u)
    + dual_v||^2``; constraints box/rate per vehicle, ``t >= 0``,
    ``t_p + dis_temp_p(u_i, u_j) >= thres^2`` per unordered pair (the
    factor 2 on beta counts both ordered directions).

    ``pos_old/dual``: ``[V, 2(H+1)]`` flat (x block then y block);
    ``last_dis``: ``[P, 2]`` seed displacement per pair; ``u0 [V, H]``.
    Returns ``(u_opt [V, H], hat [V, 2, H+1], converged, y_out)``.
    """
    v, h, p = cfg.num_veh, cfg.horizon, num_pairs(cfg.num_veh)
    idx_i, idx_j = pair_indices(v)
    dtype = pos_old.dtype
    n = v * h + p * h
    rho = cfg.rho
    big = jnp.asarray(jnp.inf, dtype)
    d1 = jnp.asarray(_first_diff(h), dtype)

    # constant rows: box on each u (VH), rate per vehicle (V(H-1)), t >= 0
    a_box = jnp.concatenate([jnp.eye(v * h, dtype=dtype),
                             jnp.zeros((v * h, p * h), dtype)], axis=1)
    a_rate = jnp.concatenate(
        [jnp.kron(jnp.eye(v, dtype=dtype), d1),
         jnp.zeros((v * (h - 1), p * h), dtype)], axis=1)
    a_tpos = jnp.concatenate([jnp.zeros((p * h, v * h), dtype),
                              jnp.eye(p * h, dtype=dtype)], axis=1)
    lo_c = jnp.concatenate([jnp.full(v * h, -cfg.u_max, dtype),
                            jnp.full(v * (h - 1), -cfg.du_max, dtype),
                            jnp.zeros(p * h, dtype)])
    hi_c = jnp.concatenate([jnp.full(v * h, cfg.u_max, dtype),
                            jnp.full(v * (h - 1), cfg.du_max, dtype),
                            jnp.full(p * h, big, dtype)])
    if y0 is None:
        y0 = jnp.zeros(joint_edge_qp_m(cfg), dtype)

    def sqp_iter(carry, _):
        u_lin, y_warm, _ = carry
        pose0, be = jax.vmap(lambda x_i, s_i, u_i: _edge_affine(
            x_i, s_i, u_i, cfg.dt, cfg.wheel_base))(xt, spd, u_lin)
        # affine pos_e_v(u_v) = c_v + Be_v u_v
        c_aff = pose0 - jnp.einsum('vij,vj->vi', be, u_lin)

        p_mat = jnp.zeros((n, n), dtype)
        p_mat = p_mat.at[: v * h, : v * h].add(
            (2.0 * cfg.p_cost + prox_tau) * jnp.eye(v * h, dtype=dtype))
        btb = rho * jnp.einsum('vik,vil->vkl', be, be)       # [V, H, H]
        blk = jax.scipy.linalg.block_diag(*[btb[i] for i in range(v)])
        p_mat = p_mat.at[: v * h, : v * h].add(blk)
        d_al = pos_old + dual - c_aff                          # [V, 2(H+1)]
        q_u = (-rho * jnp.einsum('vik,vi->vk', be, d_al)
               - prox_tau * u_lin).reshape(-1)
        q = jnp.concatenate([q_u, jnp.full(p * h, 2.0 * cfg.beta, dtype)])

        # hinge rows per pair: t_p + dis_temp_p(u_i, u_j) >= thres^2
        # (static Python loop: P is a trace-time constant and small for the
        # classic layouts; rows land in fixed column blocks)
        rows, consts = [], []
        eye_t = jnp.eye(p * h, dtype=dtype)
        for pi_ in range(p):
            i, j = int(idx_i[pi_]), int(idx_j[pi_])
            const, g_i, g_j = _hinge_rows(be[i], be[j], c_aff[i], c_aff[j],
                                          last_dis[pi_], h)
            row_u = jnp.zeros((h, v * h), dtype)
            row_u = row_u.at[:, i * h:(i + 1) * h].set(-g_i)
            row_u = row_u.at[:, j * h:(j + 1) * h].set(g_j)
            rows.append(jnp.concatenate(
                [row_u, eye_t[pi_ * h:(pi_ + 1) * h]], axis=1))
            consts.append(const)
        a_hinge = jnp.concatenate(rows, axis=0)
        lo_h = cfg.dis_thres ** 2 - jnp.concatenate(consts)
        a_mat = jnp.concatenate([a_box, a_rate, a_tpos, a_hinge], axis=0)
        lo = jnp.concatenate([lo_c, lo_h])
        hi = jnp.concatenate([hi_c, jnp.full(p * h, big, dtype)])
        w0 = jnp.concatenate([u_lin.reshape(-1), jnp.zeros(p * h, dtype)])
        sol = solve_qp(p_mat, q, a_mat, lo, hi, scfg, x0=w0, y0=y_warm)
        u_new = sol.x[: v * h].reshape(v, h)
        return (u_new, sol.y, sol.converged), None

    init = (u0, y0, jnp.asarray(False))
    (u_opt, y_out, conv), _ = jax.lax.scan(sqp_iter, init, None, length=n_sqp)
    ex, ey, _ = unicycle_rollout_edge(xt, u_opt, spd, cfg.dt, cfg.wheel_base)
    hat = jnp.stack([ex, ey], axis=1)                  # [V, 2, H+1]
    return u_opt, hat, conv, y_out


# %% engine -------------------------------------------------------------------

class StepRecord(NamedTuple):
    xt: jnp.ndarray            # [V, 3] state after the step
    u_applied: jnp.ndarray     # [V] first control of each vehicle
    iterations: jnp.ndarray    # ADMM iterations used this step
    primal_res: jnp.ndarray
    dual_res: jnp.ndarray
    rho: jnp.ndarray
    dual_min: jnp.ndarray
    dual_max: jnp.ndarray


class FusedRunRecord(NamedTuple):
    """Per-(lane, step) records of :meth:`PiAdmmEngine.run_fused_batch`.

    Leading axes ``[n_lanes, n_steps]`` (vs :class:`StepRecord`'s stacked
    ``[n_steps, ...]``)."""

    xt: jnp.ndarray            # [S, n_steps, V, 3] state after each step
    u_applied: jnp.ndarray     # [S, n_steps, V]
    iterations: jnp.ndarray    # [S, n_steps] ADMM iterations per step
    primal_res: jnp.ndarray    # [S, n_steps]
    dual_res: jnp.ndarray      # [S, n_steps]
    converged: jnp.ndarray     # [S, n_steps] bool: step's loop exited on the
    # residual test (False = stopped by the iteration cap / budget)


class AdmmCarry(NamedTuple):
    """Cross-MPC-step ADMM warm-start state of the pairwise engine.

    The reference zeroes all consensus cells and duals at every MPC step
    (``casadi/main.py:44-56``), so each step's inner loop re-discovers the
    same conflict from scratch. Carrying the (time-shifted) consensus cells
    across steps — the same idea as the OBCA line's ``iterate_next_state``
    bar-state shift (``decentralized/optimizer.py:337-344``) — warm-starts
    the edge problems and cuts iterations-to-convergence in the conflict
    window. Enable with ``PiAdmmEngine(..., carry_admm_state=True)``
    (documented deviation; default False keeps reference semantics).

    The PI dual-controller state (``dual``/``sum_err``/``diff_val``) is
    carried only with ``carry_dual_state=True``: measured on the 16-vehicle
    bench it HURTS (the controller re-winds from a stale operating point —
    0.42-0.62 converged fraction vs 0.74+ with cells-only carry), so the
    default resets it per step like the reference.
    """

    hat: jnp.ndarray        # [P, 2, 2, H+1] per-pair consensus cells
    hat_u: jnp.ndarray      # [P, 2, H] edge-control warm starts
    ey: jnp.ndarray         # [P, m] edge QP dual warm starts
    dual: jnp.ndarray       # [P, 2, 2, H+1] ADMM duals
    sum_err: jnp.ndarray    # PI integrator state
    diff_val: jnp.ndarray   # anti-windup back-calculation feed
    active: jnp.ndarray     # [P] pairs active at the previous step's end


class PiAdmmEngine:
    """Receding-horizon PI-ADMM planner (classic or pairwise layout).

    ``layout='classic'``: stacked consensus per vehicle (2-vehicle reference
    semantics); ``layout='pairwise'``: per-pair cells with proximity gating.
    """

    def __init__(self, cfg: PiAdmmConfig = PiAdmmConfig(),
                 dual_cfg: DualUpdateConfig = DualUpdateConfig(),
                 solver_cfg: SolverConfig = SolverConfig(),
                 layout: str = "classic",
                 refs: Optional[np.ndarray] = None,
                 n_sqp: int = 2,
                 al_mask_active_pairs: bool = True,
                 pair_budget: int = 10 ** 9,
                 carry_admm_state: bool = False,
                 carry_dual_state: bool = False,
                 edge_prox_tau: float = 0.0,
                 dtype=jnp.float64):
        from .. import scenarios
        self.cfg = cfg
        self.dual_cfg = dual_cfg
        self.solver_cfg = solver_cfg
        assert layout in ("classic", "pairwise")
        self.layout = layout
        self.n_sqp = n_sqp
        self.al_mask_active_pairs = al_mask_active_pairs
        # carry (time-shifted) consensus cells across MPC steps; optionally
        # also the dual-controller state (pairwise layout only; see AdmmCarry)
        self.carry_admm_state = carry_admm_state
        self.carry_dual_state = carry_dual_state
        if carry_admm_state and layout != "pairwise":
            raise ValueError("carry_admm_state requires layout='pairwise'")
        # max pairs solved per iteration (closest-first); pairs beyond the
        # budget are treated as inactive that iteration
        self.pair_budget = pair_budget
        # proximal damping of the edge QP about its previous controls
        # (tau/2 ||u - u_prev||^2; 0 = reference semantics) — see
        # _solve_pair_edge_qp
        self.edge_prox_tau = edge_prox_tau
        self.dtype = dtype
        if refs is None:
            refs = scenarios.pi_admm_crossing_refs(cfg)
        self.refs = jnp.asarray(refs, dtype)          # [V, 2, N]
        self.spd = jnp.asarray(cfg.speeds, dtype)
        self.statics = _local_statics(cfg, dtype)
        self.n_pairs = num_pairs(cfg.num_veh)
        self._mpc_step = jax.jit(self._mpc_step_impl)
        self._mpc_step_carry = jax.jit(self._mpc_step_carry_impl)

    # -- shared pieces ---------------------------------------------------

    def _ref_window(self, step_idx):
        """[V, 2(H+1)] flattened reference slice (x block then y block),
        ref ``cost_function_primal`` slicing ``PI_ADMM_class.py:116-117``."""
        h1 = self.cfg.horizon + 1
        win = jax.lax.dynamic_slice_in_dim(self.refs, step_idx, h1, axis=2)
        return jnp.concatenate([win[:, 0, :], win[:, 1, :]], axis=-1)

    def _local_affines(self, xt):
        """Per-vehicle (pos0, B) of the affine local rollout. Depends only on
        xt, so it is computed ONCE per MPC step and closed over by the ADMM
        loop body (the jacfwd would otherwise rerun every iteration)."""
        return jax.vmap(lambda xt_i, spd_i: _local_affine(
            xt_i, spd_i, self.cfg.horizon, self.cfg.dt,
            self.cfg.wheel_base))(xt, self.spd)

    def _local_solve(self, affines, u_warm, ref_flat, hats, duals, al_w, rho):
        """vmapped local QPs; hats/duals [V, K, 2(H+1)], al_w [V, K]."""
        pos0_all, b_all = affines

        def one(pos0, b_mat, warm_i, ref_i, hat_i, dual_i, w_i):
            return _solve_local_qp(pos0, b_mat, ref_i, hat_i, dual_i, w_i,
                                   rho, warm_i, self.statics, self.cfg,
                                   self.solver_cfg)

        u, pos_flat = jax.vmap(one)(pos0_all, b_all, u_warm, ref_flat, hats,
                                    duals, al_w)
        h1 = self.cfg.horizon + 1
        pos = jnp.stack([pos_flat[:, :h1], pos_flat[:, h1:]], axis=1)
        return u, pos                                  # [V, H], [V, 2, H+1]

    def _plant_rollout(self, xt, u):
        """Prediction/plant rollout of the local controls
        (ref ``main.py:128,185``: ``dynamic_update_edge`` numeric)."""
        return unicycle_rollout_edge(xt, u, self.spd, self.cfg.dt,
                                     self.cfg.wheel_base)

    # -- cross-step ADMM carry (pairwise layout) ---------------------------

    def init_admm_carry(self) -> AdmmCarry:
        """Zero carry ≙ the reference's per-step re-initialization."""
        p, h1 = self.n_pairs, self.cfg.horizon + 1
        cell = jnp.zeros((p, 2, 2, h1), self.dtype)
        return AdmmCarry(hat=cell,
                         hat_u=jnp.zeros((p, 2, self.cfg.horizon), self.dtype),
                         ey=jnp.zeros((p, edge_qp_m(self.cfg)), self.dtype),
                         dual=cell, sum_err=cell, diff_val=cell,
                         active=jnp.zeros(p, bool))

    def shift_admm_carry(self, c: AdmmCarry) -> AdmmCarry:
        """Advance the carry one MPC step: drop t=0, duplicate the tail on
        every horizon-indexed axis (the PI-ADMM analogue of the OBCA line's
        ``iterate_next_state``). The dual-controller state is reset unless
        ``carry_dual_state`` (see class docstring of :class:`AdmmCarry`)."""
        sh = lambda a: jnp.concatenate([a[..., 1:], a[..., -1:]], axis=-1)
        if self.carry_dual_state:
            dual, sum_err, diff_val = sh(c.dual), sh(c.sum_err), sh(c.diff_val)
        else:
            dual = sum_err = diff_val = jnp.zeros_like(c.dual)
        return AdmmCarry(hat=sh(c.hat), hat_u=sh(c.hat_u), ey=c.ey,
                         dual=dual, sum_err=sum_err,
                         diff_val=diff_val, active=c.active)

    # -- one MPC step (jitted) -------------------------------------------

    def _mpc_step_impl(self, xt, u_warm, step_idx):
        if self.layout == "classic":
            return self._mpc_step_classic(xt, u_warm, step_idx)
        xt_next, u, rec, _ = self._mpc_step_pairwise(xt, u_warm, step_idx,
                                                     None)
        return xt_next, u, rec

    def _mpc_step_carry_impl(self, xt, u_warm, admm: AdmmCarry, step_idx):
        """Pairwise MPC step threading the cross-step ADMM carry."""
        xt_next, u, rec, admm_out = self._mpc_step_pairwise(
            xt, u_warm, step_idx, self.shift_admm_carry(admm))
        return xt_next, u, admm_out, rec

    def _mpc_step_classic(self, xt, u_warm, step_idx):
        cfg = self.cfg
        v, h = cfg.num_veh, cfg.horizon
        h1 = h + 1
        ref_flat = self._ref_window(step_idx)
        # 1-step seed positions (ref main.py:44-45, without the np.around)
        seed = jnp.stack([xt[:, 0] + cfg.dt * self.spd * jnp.cos(xt[:, 2]),
                          xt[:, 1] + cfg.dt * self.spd * jnp.sin(xt[:, 2])],
                         axis=1)                       # [V, 2]
        zero_cell = jnp.zeros((v, 2, h1), self.dtype)
        dual0 = init_dual_state((v, 2, h1), cfg.rho, self.dtype)
        affines = self._local_affines(xt)

        def flat_cells(c):                             # [V,2,H+1] -> [V,1,2(H+1)]
            return jnp.concatenate([c[:, 0, :], c[:, 1, :]], axis=-1)[:, None, :]

        carry0 = dict(u=u_warm, pos=zero_cell, hat=zero_cell, hat_u=jnp.zeros(
            (v, h), self.dtype), last_hat=zero_cell, dual=dual0,
            ey=jnp.zeros(joint_edge_qp_m(cfg), self.dtype),
            it=jnp.asarray(0, jnp.int32), done=jnp.asarray(False),
            r=jnp.asarray(0.0, self.dtype), s=jnp.asarray(0.0, self.dtype))

        al_w = jnp.ones((v, 1), self.dtype)

        def body(c):
            # vehicle side
            u, pos = self._local_solve(affines, c["u"], ref_flat,
                                       flat_cells(c["hat"]),
                                       flat_cells(c["dual"].dual), al_w,
                                       c["dual"].rho)
            # edge side: ONE joint QP over all vehicles with a hinge per
            # pair — the old line's stacked formulation
            # (casadi_old_PI_ADMM/PI_ADMM_class.py:141-179); for V = 2 it
            # is exactly the single-pair problem
            idx_i, idx_j = pair_indices(cfg.num_veh)
            pos_flat = jnp.concatenate([pos[:, 0, :], pos[:, 1, :]], axis=-1)
            dual_flat = jnp.concatenate([c["dual"].dual[:, 0, :],
                                         c["dual"].dual[:, 1, :]], axis=-1)
            last_dis = seed[idx_j] - seed[idx_i]               # [P, 2]
            hat_u, hat, _, ey = _solve_joint_edge_qp(
                xt, self.spd, pos_flat, dual_flat, last_dis, c["hat_u"],
                cfg, self.solver_cfg, self.n_sqp,
                y0=c["ey"], prox_tau=self.edge_prox_tau)

            # dual update on the prediction rollout (ref main.py:128-151)
            px, py, _ = self._plant_rollout(xt, u)
            d_min = min_pair_distance(px, py, cfg.num_veh)
            dual = update_dual(c["dual"], pos - hat, d_min, self.dual_cfg)

            r, s = stacked_residuals(pos, hat, c["last_hat"], dual.rho)
            # clearance of the applied step, min over all pairs
            clearance = jnp.min(jnp.sqrt(
                (px[idx_i, 1] - px[idx_j, 1]) ** 2
                + (py[idx_i, 1] - py[idx_j, 1]) ** 2))
            ok = jnp.logical_and(r <= cfg.eps_pri, s <= cfg.eps_dual)
            if cfg.stop_needs_clearance:
                ok = jnp.logical_and(ok, clearance > cfg.dis_thres)
            return dict(u=u, pos=pos, hat=hat, hat_u=hat_u, last_hat=hat,
                        dual=dual, ey=ey, it=c["it"] + 1, done=ok, r=r, s=s)

        def cond(c):
            return jnp.logical_and(jnp.logical_not(c["done"]),
                                   c["it"] < cfg.iter_num)

        out = jax.lax.while_loop(cond, body, carry0)
        return self._finish_step(xt, out["u"], out["it"], out["r"], out["s"],
                                 out["dual"])

    def _side_of_map(self):
        """[V, V-1, 2] (pair_idx, side) gather map: for vehicle i, its (V-1)
        AL terms live at these (pair, side) slots of the dense pair cells."""
        v = self.cfg.num_veh
        idx_i, idx_j = pair_indices(v)
        side_of = np.zeros((v, v - 1, 2), np.int32)
        for vi in range(v):
            k = 0
            for pi_, (a, b) in enumerate(zip(idx_i, idx_j)):
                if a == vi:
                    side_of[vi, k] = (pi_, 0); k += 1
                elif b == vi:
                    side_of[vi, k] = (pi_, 1); k += 1
        return jnp.asarray(side_of)

    def _pairwise_iter(self, xt, seed, affines, ref_flat, side_of, c):
        """ONE pairwise consensus-ADMM iteration (local QPs -> gating ->
        per-pair edge QPs -> dual update -> residuals). Shared by the
        per-step ``lax.while_loop`` (:meth:`_mpc_step_pairwise`) and the
        fused whole-run loop (:meth:`run_fused_batch`)."""
        cfg = self.cfg
        v, p = cfg.num_veh, self.n_pairs
        idx_i, idx_j = pair_indices(v)
        k_budget = min(self.pair_budget, p)

        def gather_terms(cells):
            """[P,2,2,H+1] -> [V, V-1, 2(H+1)] per-vehicle AL terms."""
            flat = jnp.concatenate([cells[:, :, 0, :], cells[:, :, 1, :]],
                                   axis=-1)             # [P, 2, 2(H+1)]
            return flat[side_of[..., 0], side_of[..., 1]]

        # AL weights: masked to ever-active pairs (reference includes all
        # pairs unconditionally — see class docstring note 4 /
        # al_mask_active_pairs)
        if self.al_mask_active_pairs:
            w = c["ever"].astype(self.dtype)[side_of[..., 0]]
        else:
            w = jnp.ones((v, v - 1), self.dtype)
        u, pos = self._local_solve(affines, c["u"], ref_flat,
                                   gather_terms(c["hat"]),
                                   gather_terms(c["dual"].dual), w,
                                   c["dual"].rho)

        # gating (ref casadi/main.py:108-118): squared distance of the
        # local rollouts vs the *unsquared* threshold, per pair
        d2 = ((pos[idx_i, 0] - pos[idx_j, 0]) ** 2
              + (pos[idx_i, 1] - pos[idx_j, 1]) ** 2)   # [P, H+1]
        active = jnp.any(d2 < cfg.dis_thres, axis=-1)
        ever = jnp.logical_or(c["ever"], active)

        # per-pair edge QPs, vmapped over all pairs, masked updates
        pos_flat = jnp.concatenate([pos[:, 0, :], pos[:, 1, :]], axis=-1)
        dual_cells = c["dual"].dual
        dual_flat = jnp.concatenate([dual_cells[:, :, 0, :],
                                     dual_cells[:, :, 1, :]], axis=-1)
        last_dis = seed[idx_j] - seed[idx_i]            # [P, 2]

        xt_pairs = jnp.stack([xt[idx_i], xt[idx_j]], axis=1)      # [P,2,3]
        spd_pairs = jnp.stack([self.spd[idx_i], self.spd[idx_j]],
                              axis=1)                              # [P,2]
        pos_pairs_flat = jnp.stack([pos_flat[idx_i], pos_flat[idx_j]],
                                   axis=1)                # [P,2,2(H+1)]

        def one_pair(xt_p, spd_p, pos_p, dual_p, ld_p, u0, y0):
            return _solve_pair_edge_qp(xt_p, spd_p, pos_p, dual_p, ld_p,
                                       u0, cfg, self.solver_cfg,
                                       self.n_sqp, y0=y0,
                                       prox_tau=self.edge_prox_tau)

        # active-pair budget: at 16 vehicles only a handful of the 120
        # pair slots are ever in conflict — gather the k_budget closest
        # pairs (static shape), solve only those, scatter back. This is
        # the TPU-native form of `np.where(edge_mat == 1)` gating
        # (SURVEY.md §7 hard part 5).
        d2min = jnp.min(d2, axis=-1)
        if k_budget < p:
            _, sel = jax.lax.top_k(-d2min, k_budget)
        else:
            sel = jnp.arange(p)
        hat_u_k, hat_k, _, ey_k = jax.vmap(one_pair)(
            xt_pairs[sel], spd_pairs[sel], pos_pairs_flat[sel],
            dual_flat[sel], last_dis[sel], c["hat_u"][sel], c["ey"][sel])
        hat_u_new = c["hat_u"].at[sel].set(hat_u_k)
        hat_new = c["hat"].at[sel].set(hat_k)
        ey = c["ey"].at[sel].set(ey_k)

        m = active[:, None, None, None]
        hat = jnp.where(m, hat_new, c["hat"])
        hat_u = jnp.where(active[:, None, None], hat_u_new, c["hat_u"])

        # per-pair dual update (ref casadi/main.py:160-162): residual of
        # each side vs its consensus cell; d_min per pair
        pos_pairs = jnp.stack([pos[idx_i], pos[idx_j]], axis=1)
        r_cells = pos_pairs - hat                      # [P, 2, 2, H+1]
        d_pair = jnp.sqrt(jnp.min(d2, axis=-1))        # [P]
        dual_new = update_dual(c["dual"], r_cells,
                               d_pair[:, None, None, None], self.dual_cfg)
        # only active pairs move their dual state
        dual = DualState(
            dual=jnp.where(m, dual_new.dual, c["dual"].dual),
            sum_err=jnp.where(m, dual_new.sum_err, c["dual"].sum_err),
            diff_val=jnp.where(m, dual_new.diff_val, c["dual"].diff_val),
            rho=dual_new.rho)

        r, s = per_edge_residuals(pos_pairs[:, 0], hat[:, 0],
                                  c["last_hat"][:, 0], dual.rho, active)
        none_active = jnp.logical_and(jnp.sum(active) == 0,
                                      jnp.logical_not(c["ever"].any()))
        # per-edge tolerance scaling (see PiAdmmConfig.eps_per_edge): the
        # residual sums one 2*||.|| term per active edge, so the stop
        # threshold grows with the active-edge count
        scale = (jnp.maximum(jnp.sum(active.astype(r.dtype)), 1.0)
                 if cfg.eps_per_edge else 1.0)
        converged = jnp.logical_and(r <= cfg.eps_pri * scale,
                                    s <= cfg.eps_dual * scale)
        done = jnp.logical_or(none_active, converged)
        return dict(u=u, pos=pos, hat=hat, hat_u=hat_u, ey=ey,
                    last_hat=hat, dual=dual, ever=ever, it=c["it"] + 1,
                    done=done, r=r, s=s)

    def _pairwise_carry0(self, u_warm, admm0: AdmmCarry):
        """Initial per-step iteration carry from the (possibly shifted)
        cross-step ADMM carry."""
        cfg = self.cfg
        v, h1 = cfg.num_veh, cfg.horizon + 1
        rho0 = init_dual_state((), cfg.rho, self.dtype).rho
        dual0 = DualState(dual=admm0.dual, sum_err=admm0.sum_err,
                          diff_val=admm0.diff_val, rho=rho0)
        return dict(u=u_warm, pos=jnp.zeros((v, 2, h1), self.dtype),
                    hat=admm0.hat, hat_u=admm0.hat_u,
                    ey=admm0.ey,
                    last_hat=admm0.hat, dual=dual0,
                    ever=admm0.active, it=jnp.asarray(0, jnp.int32),
                    done=jnp.asarray(False),
                    r=jnp.asarray(0.0, self.dtype),
                    s=jnp.asarray(0.0, self.dtype))

    def _mpc_step_pairwise(self, xt, u_warm, step_idx,
                           admm0: Optional[AdmmCarry] = None):
        cfg = self.cfg
        ref_flat = self._ref_window(step_idx)
        seed = jnp.stack([xt[:, 0] + cfg.dt * self.spd * jnp.cos(xt[:, 2]),
                          xt[:, 1] + cfg.dt * self.spd * jnp.sin(xt[:, 2])],
                         axis=1)
        affines = self._local_affines(xt)
        side_of = self._side_of_map()
        if admm0 is None:
            admm0 = self.init_admm_carry()
        carry0 = self._pairwise_carry0(u_warm, admm0)

        def body(c):
            return self._pairwise_iter(xt, seed, affines, ref_flat, side_of,
                                       c)

        def cond(c):
            return jnp.logical_and(jnp.logical_not(c["done"]),
                                   c["it"] < cfg.iter_num)

        out = jax.lax.while_loop(cond, body, carry0)
        admm_out = AdmmCarry(hat=out["hat"], hat_u=out["hat_u"], ey=out["ey"],
                             dual=out["dual"].dual,
                             sum_err=out["dual"].sum_err,
                             diff_val=out["dual"].diff_val,
                             active=out["ever"])
        step_out = self._finish_step(xt, out["u"], out["it"], out["r"],
                                     out["s"], out["dual"])
        return step_out + (admm_out,)

    def _finish_step(self, xt, u, iters, r, s, dual: DualState):
        """Apply the first control and advance the plant
        (ref ``main.py:168-174``)."""
        px, py, pth = self._plant_rollout(xt, u)
        xt_next = jnp.stack([px[:, 1], py[:, 1], pth[:, 1]], axis=-1)
        rec = StepRecord(xt=xt_next, u_applied=u[:, 0], iterations=iters,
                         primal_res=r, dual_res=s, rho=dual.rho,
                         dual_min=jnp.min(dual.dual),
                         dual_max=jnp.max(dual.dual))
        return xt_next, u, rec

    # -- full MPC run: host loop (checkpointable) or one jitted lax.scan --

    def run_scan(self, xt0: Optional[np.ndarray] = None,
                 n_steps: Optional[int] = None):
        """Whole MPC run as ONE jitted ``lax.scan`` over steps.

        Kills the per-step host dispatch of :meth:`run` (the reference's
        outer Python loop, ``casadi_old_PI_ADMM/main.py:41``): the
        (xt, u_warm) carry never leaves the device and XLA pipelines the
        step programs back-to-back. Trajectories are identical to
        :meth:`run`; use :meth:`run` when you need per-step checkpointing.
        Returns the same stacked :class:`StepRecord` pytree.
        """
        from .. import scenarios
        cfg = self.cfg
        if xt0 is None:
            xt0 = scenarios.pi_admm_initial_states(cfg)
        xt = jnp.asarray(xt0, self.dtype)
        u = jnp.zeros((cfg.num_veh, cfg.horizon), self.dtype)
        n_steps = cfg.n_mpc_steps if n_steps is None else n_steps

        def step(carry, k):
            xt_c, u_c, admm = carry
            u_c = jnp.concatenate([u_c[:, 1:], u_c[:, -1:]], axis=1)
            if self.carry_admm_state:
                xt_c, u_c, admm, rec = self._mpc_step_carry_impl(
                    xt_c, u_c, admm, k)
            else:
                xt_c, u_c, rec = self._mpc_step_impl(xt_c, u_c, k)
            return (xt_c, u_c, admm), rec

        admm0 = (self.init_admm_carry() if self.layout == "pairwise"
                 else jnp.zeros(()))
        if not hasattr(self, "_run_scan_jit"):
            self._run_scan_jit = jax.jit(
                lambda c0, ks: jax.lax.scan(step, c0, ks))
        _, recs = self._run_scan_jit(
            (xt, u, admm0), jnp.arange(n_steps, dtype=jnp.int32))
        return jax.device_get(recs)

    # -- fused whole-run batched driver (pairwise layout) ------------------

    def _fused_lane(self, xt0, u0, admm_init: AdmmCarry, n_steps: int,
                    iter_budget: Optional[int] = None):
        """Whole MPC run for ONE scenario lane as a single ``lax.while_loop``
        over consensus iterations.

        The per-step driver synchronizes a vmapped batch at every MPC step:
        each step's while_loop runs until the SLOWEST lane's inner loop
        exits, so with mean ~13 but max 30 iterations per step ~55% of the
        executed lane-iterations were masked waste (BENCH_r03
        ``effective_iterations`` vs ``hardware_loop_trips``). Here a step
        that converges (or caps) is finished INLINE — apply the first
        control, advance the plant, shift the warm starts and the ADMM
        carry — and the same loop keeps iterating the lane's next step.
        Under ``vmap`` the batched loop executes max-over-lanes *total*
        (whole-run) iterations instead of the sum of per-step maxima: the
        waste drops from ``sum_k (max_lane it_k - it_lane_k)`` to
        ``max_lane(sum_k it_k) - sum_k it_lane_k``, which concentrates as
        steps accumulate (fast steps pay for slow ones within a lane).

        Numerically identical to the per-step driver: seed/affines/ref
        window are recomputed each trip from the lane state, which is
        frozen within a step, so every iteration sees the same values the
        per-step path computes once (asserted in
        ``tests/test_pi_admm.py::TestFusedRunner``).

        ``iter_budget`` (optional) bounds the lane's TOTAL iterations over
        the whole run — an anytime-MPC compute budget: when a step would
        leave fewer than one iteration per remaining step, its effective
        cap shrinks (never below 1). Bounds the batch's while-loop trips at
        ``iter_budget`` regardless of the difficulty tail; steps truncated
        by the budget report ``converged=False`` in the record. ``None``
        keeps exact per-step-cap semantics.
        """
        cfg = self.cfg
        side_of = self._side_of_map()
        cap = cfg.iter_num

        def start_carry(u_prev, admm_prev):
            # per-step entry ≙ run_scan's shift-warm-start + carry shift
            # (or the reference's per-step re-init when carry is off)
            admm_s = (self.shift_admm_carry(admm_prev)
                      if self.carry_admm_state else self.init_admm_carry())
            u_s = jnp.concatenate([u_prev[:, 1:], u_prev[:, -1:]], axis=1)
            return self._pairwise_carry0(u_s, admm_s)

        frec = jnp.zeros(n_steps, self.dtype)
        c0 = dict(adm=start_carry(u0, admm_init),
                  xt=jnp.asarray(xt0, self.dtype),
                  k=jnp.asarray(0, jnp.int32),
                  used=jnp.asarray(0, jnp.int32),
                  xt_rec=jnp.zeros((n_steps, cfg.num_veh, 3), self.dtype),
                  u_rec=jnp.zeros((n_steps, cfg.num_veh), self.dtype),
                  it_rec=jnp.zeros(n_steps, jnp.int32),
                  cv_rec=jnp.zeros(n_steps, bool),
                  r_rec=frec, s_rec=frec)

        def body(c):
            xt = c["xt"]
            seed = jnp.stack(
                [xt[:, 0] + cfg.dt * self.spd * jnp.cos(xt[:, 2]),
                 xt[:, 1] + cfg.dt * self.spd * jnp.sin(xt[:, 2])], axis=1)
            affines = self._local_affines(xt)
            ref_flat = self._ref_window(c["k"])
            d = self._pairwise_iter(xt, seed, affines, ref_flat, side_of,
                                    c["adm"])
            if iter_budget is None:
                cap_eff = cap
            else:
                # reserve one iteration for each remaining step
                reserve = n_steps - 1 - c["k"]
                cap_eff = jnp.clip(iter_budget - c["used"] - reserve, 1, cap)
            step_done = jnp.logical_or(d["done"], d["it"] >= cap_eff)
            # a lane past its last step keeps executing (vmapped SPMD) but
            # must not advance or write records
            live = c["k"] < n_steps
            adv = jnp.logical_and(step_done, live)

            # step finish, selected by adv (ref main.py:168-174)
            px, py, pth = self._plant_rollout(xt, d["u"])
            xt_next = jnp.stack([px[:, 1], py[:, 1], pth[:, 1]], axis=-1)
            admm_out = AdmmCarry(hat=d["hat"], hat_u=d["hat_u"], ey=d["ey"],
                                 dual=d["dual"].dual,
                                 sum_err=d["dual"].sum_err,
                                 diff_val=d["dual"].diff_val,
                                 active=d["ever"])
            fresh = start_carry(d["u"], admm_out)
            adm = jax.tree.map(lambda a, b: jnp.where(adv, a, b), fresh, d)

            def scat(rec, val):
                return jnp.where(adv, rec.at[c["k"]].set(val), rec)

            return dict(adm=adm,
                        xt=jnp.where(adv, xt_next, xt),
                        k=jnp.where(adv, c["k"] + 1, c["k"]),
                        used=jnp.where(adv, c["used"] + d["it"], c["used"]),
                        xt_rec=scat(c["xt_rec"], xt_next),
                        u_rec=scat(c["u_rec"], d["u"][:, 0]),
                        it_rec=scat(c["it_rec"], d["it"]),
                        cv_rec=scat(c["cv_rec"], d["done"]),
                        r_rec=scat(c["r_rec"], d["r"]),
                        s_rec=scat(c["s_rec"], d["s"]))

        out = jax.lax.while_loop(lambda c: c["k"] < n_steps, body, c0)
        return FusedRunRecord(xt=out["xt_rec"], u_applied=out["u_rec"],
                              iterations=out["it_rec"],
                              primal_res=out["r_rec"], dual_res=out["s_rec"],
                              converged=out["cv_rec"])

    def run_fused_batch(self, xts, us, n_steps: int,
                        iter_budget: Optional[int] = None) -> FusedRunRecord:
        """Fused whole-run driver over a batch of scenario lanes.

        ``xts [S, V, 3]``, ``us [S, V, H]`` -> :class:`FusedRunRecord` with
        ``[S, n_steps, ...]`` leaves. The executed while-loop trip count is
        ``max_lane(sum_k iterations)`` — recover it on the host as
        ``rec.iterations.sum(axis=1).max()`` for the loop-efficiency metric.
        ``iter_budget`` bounds that count per lane (see :meth:`_fused_lane`).
        """
        if self.layout != "pairwise":
            raise ValueError("run_fused_batch requires layout='pairwise'")
        cache = getattr(self, "_fused_cache", None)
        if cache is None:
            cache = self._fused_cache = {}
        key = (n_steps, iter_budget)
        if key not in cache:
            admm0 = self.init_admm_carry()
            cache[key] = jax.jit(jax.vmap(
                lambda xt, u: self._fused_lane(xt, u, admm0, n_steps,
                                               iter_budget)))
        return cache[key](xts, us)

    def run(self, xt0: Optional[np.ndarray] = None,
            n_steps: Optional[int] = None,
            checkpoint_path: Optional[str] = None, resume: bool = False):
        """MPC loop; pass ``checkpoint_path`` to persist the (xt, u) carry
        after every step and ``resume=True`` to continue a saved run
        (SURVEY.md §5: the MPC carry is the natural checkpoint unit —
        records of completed steps are not replayed)."""
        from .. import scenarios
        cfg = self.cfg
        if xt0 is None:
            xt0 = scenarios.pi_admm_initial_states(cfg)
        xt = jnp.asarray(xt0, self.dtype)
        u = jnp.zeros((cfg.num_veh, cfg.horizon), self.dtype)
        n_steps = cfg.n_mpc_steps if n_steps is None else n_steps
        admm = (self.init_admm_carry() if self.carry_admm_state else None)
        start = 0
        if checkpoint_path is not None and resume:
            import os
            if os.path.exists(checkpoint_path):
                from ..utils.checkpoint import load_carry
                like = (xt, u) if admm is None else (xt, u, admm)
                restored, start = load_carry(checkpoint_path, like)
                if admm is None:
                    xt, u = restored
                else:
                    xt, u, admm = restored
        records = []
        for step in range(start, n_steps):
            # shift-warm-start (ref main.py:85: init_u = [u[1:], u[-1]])
            u = jnp.concatenate([u[:, 1:], u[:, -1:]], axis=1)
            if self.carry_admm_state:
                xt, u, admm, rec = self._mpc_step_carry(
                    xt, u, admm, jnp.asarray(step, jnp.int32))
            else:
                xt, u, rec = self._mpc_step(xt, u,
                                            jnp.asarray(step, jnp.int32))
            records.append(jax.device_get(rec))
            if checkpoint_path is not None:
                from ..utils.checkpoint import save_carry
                carry = (xt, u) if admm is None else (xt, u, admm)
                save_carry(checkpoint_path, carry, step + 1)
        return jax.tree.map(lambda *xs: np.stack(xs), *records)
