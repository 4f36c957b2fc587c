"""ALADIN coordinator: Augmented-Lagrangian Alternating Direction Inexact
Newton (SURVEY.md C15).

TPU-native re-implementation of ``Distributed_planner/ALADIN/examples/
ALADIN_fun.py`` for consensus problems

    min sum_i f_i(y_i)   s.t.  sum_i A_i y_i = b,   h_i(y_i) = 0

One ALADIN iteration (ref ``example2.py:184-281``):

1. per-agent proximal NLPs
   ``min f_i(y) + lam^T A_i y + rho/2 (y - x_i)^T Sigma_i (y - x_i)``
   s.t. ``h_i(y) = 0``  — vmapped :func:`~..solvers.ip.solve_nlp` calls
   (ref ``create_subproblem`` ``ALADIN_fun.py:11-35``)
2. active-set constraint-Jacobian approximation: rows with nonzero residual
   are zeroed (ref ``constraint_jac_approx`` ``:37-46``)
3. modified gradient ``g_i = grad f_i + (J_real - J_approx)^T kappa_i``
   (ref ``:48-49``) and exact Hessians ``H_i = hess(f_i + kappa^T h_i)``
4. coupled equality QP over (dy, s):
   ``min sum 1/2 dy_i^T H_i dy_i + g_i^T dy_i + lam^T s + mu/2 ||s||^2``
   s.t. ``sum A_i (y_i + dy_i) - b = s``, ``C_i dy_i = 0`` — equality-only,
   so it collapses to ONE dense KKT solve (the reference spins up a fresh
   IPOPT instance, ``create_QP_problem`` ``:52-108``)
5. full-step update ``x+ = x + a1 (y - x) + a2 dy``,
   ``lam+ = lam + a3 (lam_QP - lam)`` (ref ``example2.py:258-281``)

Agents must share a common (f, h) structure — per-agent data lives in the
parameter pytree, and the agent axis is vmapped/shardable (SURVEY.md §3.5:
the coupled QP is the only global synchronization point).
"""
from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..solvers.linalg import dense_solve

from ..config import SolverConfig
from ..solvers.ip import NLP, solve_nlp


class AladinProblem(NamedTuple):
    """min sum_i f(y_i, p_i)  s.t.  sum_i A_i y_i = b,  h(y_i, p_i) = 0,
    and optionally g(y_i, p_i) >= 0.

    Inequalities are the standard ALADIN extension (round 5): the agent
    NLPs enforce them exactly (the IP subsolver handles ci natively) and
    the coupled QP holds the ACTIVE set fixed — active rows of g join the
    C_i equality rows ``C_i dy_i = 0``, inactive rows are dropped. The
    reference's ``constraint_jac_approx`` (``ALADIN_fun.py:37-46``) is the
    same active-set idea applied to its h rows.
    """

    f: Callable                 # (y [ny], p_i) -> scalar
    h: Callable                 # (y [ny], p_i) -> [mh] equality residuals
    a_mats: jnp.ndarray         # [N, mc, ny] coupling matrices
    b: jnp.ndarray              # [mc]
    g: Optional[Callable] = None  # (y [ny], p_i) -> [mg] inequalities >= 0


class AladinState(NamedTuple):
    x: jnp.ndarray              # [N, ny] primal iterates
    lam: jnp.ndarray            # [mc] coupling multipliers
    coupling_res: jnp.ndarray   # ||sum A_i y_i - b||_1 at the last iterate
    step_norm: jnp.ndarray      # rho * ||sum (y - x)||_1 (ref termination)


class AladinEngine:
    """Reusable ALADIN iteration; vmapped agents, single-KKT coupled QP."""

    def __init__(self, problem: AladinProblem, rho: float = 10.0,
                 mu: float = 1e4,
                 scfg: SolverConfig = SolverConfig(),
                 alpha: tuple = (1.0, 1.0, 1.0),
                 active_tol: float = 1e-6,
                 hess_reg: float = 1e-6,
                 globalization: str = "full_step",
                 merit_penalty: float = 1e3):
        """``globalization='linesearch'`` enables the l1-penalty backtracking
        of the third-party notebooks (ref ``reference/ALADIN-master/
        ALADIN_with_linesearch.ipynb`` — SURVEY.md C17): one alpha scales the
        (y - x), dy and lambda moves, chosen as the first candidate from
        {1, 1/2, ..., 2^-5} that decreases
        ``phi = sum f_i + pen * (||sum A_i x_i - b||_1 + sum ||h_i||_1)``;
        ``'full_step'`` is the plain ALADIN of ``ALADIN_fun.py`` (alpha=1)."""
        assert globalization in ("full_step", "linesearch")
        self.problem = problem
        self.rho, self.mu = rho, mu
        self.scfg = scfg
        self.alpha = alpha
        self.active_tol = active_tol
        self.hess_reg = hess_reg
        self.globalization = globalization
        self.merit_penalty = merit_penalty

        prob = problem

        def sub_f(y, q):
            p_i, a_i, lam, x_i = q
            return (prob.f(y, p_i) + lam @ (a_i @ y)
                    + rho / 2 * jnp.sum((y - x_i) ** 2))

        def sub_ce(y, q):
            p_i = q[0]
            return prob.h(y, p_i)

        def sub_ci(y, q):
            p_i = q[0]
            if prob.g is None:
                return jnp.zeros((0,), y.dtype)
            return prob.g(y, p_i)

        self._sub_nlp = NLP(sub_f, sub_ce, sub_ci)
        self.step = jax.jit(self._step_impl)

    def init_state(self, x0: jnp.ndarray) -> AladinState:
        mc = self.problem.b.shape[0]
        return AladinState(x=x0, lam=jnp.zeros(mc, x0.dtype),
                           coupling_res=jnp.asarray(jnp.inf, x0.dtype),
                           step_norm=jnp.asarray(jnp.inf, x0.dtype))

    def _step_impl(self, state: AladinState, p):
        prob = self.problem
        n_agents, mc, ny = prob.a_mats.shape
        dtype = state.x.dtype

        # 1. parallel proximal NLPs (ref example2.py:188-207)
        def solve_one(x_i, p_i, a_i):
            q = (p_i, a_i, state.lam, x_i)
            sol = solve_nlp(self._sub_nlp, x_i, q, self.scfg)
            # our IP convention is L = f - y^T h - z^T g; the reference's
            # kappa uses L = f + kappa^T h (IPOPT), so kappa = -y, and the
            # inequality multipliers map the same way (kappa_g = -z)
            return sol.x, -sol.y, -sol.z

        ys, kappas, kappas_g = jax.vmap(solve_one)(state.x, p, prob.a_mats)

        # 2./3. active-set Jacobians, modified gradients, exact Hessians.
        # Inequality handling (round 5): active rows of g (boundary within
        # active_tol) are held as equalities in the coupled QP; inactive
        # rows contribute nothing (their multipliers vanish at the NLP
        # optimum, so the modified-gradient correction is ~0 there too).
        def derive_one(y_i, p_i, kappa_i, kappa_g_i):
            h_val = prob.h(y_i, p_i)
            j_real = jax.jacfwd(prob.h)(y_i, p_i)
            active = jnp.abs(h_val) <= self.active_tol
            c_i = jnp.where(active[:, None], j_real, 0.0)
            g_i = (jax.grad(prob.f)(y_i, p_i)
                   + (j_real - c_i).T @ kappa_i)

            def lag(y):
                val = prob.f(y, p_i) + kappa_i @ prob.h(y, p_i)
                if prob.g is not None:
                    val = val + kappa_g_i @ prob.g(y, p_i)
                return val

            if prob.g is not None:
                g_val = prob.g(y_i, p_i)
                jg_real = jax.jacfwd(prob.g)(y_i, p_i)
                g_active = g_val <= self.active_tol
                cg_i = jnp.where(g_active[:, None], jg_real, 0.0)
                g_i = g_i + (jg_real - cg_i).T @ kappa_g_i
                c_i = jnp.concatenate([c_i, cg_i], axis=0)
            h_i = jax.hessian(lag)(y_i)
            h_i = h_i + self.hess_reg * jnp.eye(ny, dtype=dtype)
            return c_i, g_i, h_i

        c_all, g_all, h_all = jax.vmap(derive_one)(ys, p, kappas, kappas_g)
        mh = c_all.shape[1]

        # 4. coupled equality QP -> one dense KKT solve.
        # variables w = [dy (N*ny) | s (mc)]; constraints:
        #   coupling: sum A_i dy_i - s = b - sum A_i y_i
        #   active:   C_i dy_i = 0  (inactive rows are zero -> regularized)
        nv = n_agents * ny + mc
        h_blk = jax.scipy.linalg.block_diag(*[h_all[i] for i in
                                              range(n_agents)])
        big_h = jnp.zeros((nv, nv), dtype)
        big_h = big_h.at[:n_agents * ny, :n_agents * ny].set(h_blk)
        big_h = big_h.at[n_agents * ny:, n_agents * ny:].set(
            self.mu * jnp.eye(mc, dtype=dtype))
        big_g = jnp.concatenate([g_all.reshape(-1), state.lam])

        a_row = jnp.concatenate(
            [jnp.concatenate([prob.a_mats[i] for i in range(n_agents)],
                             axis=1), -jnp.eye(mc, dtype=dtype)], axis=1)
        c_rows = jnp.zeros((n_agents * mh, nv), dtype)
        for i in range(n_agents):
            c_rows = c_rows.at[i * mh:(i + 1) * mh,
                               i * ny:(i + 1) * ny].set(c_all[i])
        eq = jnp.concatenate([a_row, c_rows], axis=0)
        m_eq = eq.shape[0]
        rhs_eq = jnp.concatenate([
            prob.b - jnp.einsum('imn,in->m', prob.a_mats, ys),
            jnp.zeros(n_agents * mh, dtype)])
        kkt = jnp.block([[big_h, eq.T],
                         [eq, -1e-9 * jnp.eye(m_eq, dtype=dtype)]])
        sol = dense_solve(kkt, jnp.concatenate([-big_g, rhs_eq]))
        dy = sol[:n_agents * ny].reshape(n_agents, ny)
        lam_qp = sol[nv:nv + mc]

        # 5. step update (ref example2.py:258-281); optional l1-merit
        # backtracking globalization (SURVEY.md C17)
        a1, a2, a3 = self.alpha
        if self.globalization == "linesearch":
            pen = self.merit_penalty

            def merit(x_all):
                fs = jax.vmap(prob.f)(x_all, p)
                hs = jax.vmap(prob.h)(x_all, p)
                coup = jnp.einsum('imn,in->m', prob.a_mats, x_all) - prob.b
                val = (jnp.sum(fs) + pen * jnp.sum(jnp.abs(coup))
                       + pen * jnp.sum(jnp.abs(hs)))
                if prob.g is not None:
                    gs = jax.vmap(prob.g)(x_all, p)
                    val = val + pen * jnp.sum(jax.nn.relu(-gs))
                return val

            alphas = 0.5 ** jnp.arange(6, dtype=dtype)
            phi0 = merit(state.x)
            phis = jax.vmap(lambda a: merit(
                state.x + a * (ys - state.x) + a * dy))(alphas)
            ok = phis < phi0
            a_sel = jnp.where(jnp.any(ok), alphas[jnp.argmax(ok)],
                              alphas[-1])
            x_new = state.x + a_sel * (ys - state.x) + a_sel * dy
            lam_new = state.lam + a_sel * (lam_qp - state.lam)
        else:
            x_new = state.x + a1 * (ys - state.x) + a2 * dy
            lam_new = state.lam + a3 * (lam_qp - state.lam)

        coupling_res = jnp.sum(jnp.abs(
            jnp.einsum('imn,in->m', prob.a_mats, ys) - prob.b))
        step_norm = self.rho * jnp.sum(jnp.abs(ys - state.x))
        return AladinState(x=x_new, lam=lam_new, coupling_res=coupling_res,
                           step_norm=step_norm), ys

    def run(self, x0: jnp.ndarray, p, n_iters: int = 30,
            tol: Optional[float] = 1e-6,
            checkpoint_path: Optional[str] = None, resume: bool = False):
        """Host loop with the reference's termination test
        (``example2.py:211-216``): ``||sum A_i y_i - b||_1 <= eps`` and
        ``rho ||y - x||_1 <= eps``. ``checkpoint_path`` persists the
        AladinState carry per iteration; ``resume=True`` continues a saved
        run (SURVEY.md §5)."""
        import os
        state = self.init_state(x0)
        start = 0
        if checkpoint_path is not None and resume \
                and os.path.exists(checkpoint_path):
            from ..utils.checkpoint import load_carry
            state, start = load_carry(checkpoint_path, state)
        ys = state.x
        for it in range(start, n_iters):
            state, ys = self.step(state, p)
            if checkpoint_path is not None:
                from ..utils.checkpoint import save_carry
                save_carry(checkpoint_path, state, it + 1)
            if tol is not None and (float(state.coupling_res) <= tol
                                    and float(state.step_norm) <= tol):
                break
        return state, ys


class AladinUnicyclePlanner:
    """ALADIN as a *planner coordinator* (VERDICT r4 missing #3 / next #6):
    the unicycle consensus planning problem solved with the
    :class:`AladinEngine` instead of (PI-)ADMM.

    The reference declares ALADIN one of its coordination layouts (SURVEY.md
    §2.4) but never wires it to vehicles — its ``ALADIN/examples`` solve
    sensor-network prototypes (``example2.py:12-281``). This class closes
    that gap with the standard consensus lift of the multi-vehicle problem:

    * **agents = vehicles**. Agent i's decision is
      ``y_i = [u_i (H) | P_i (V*2H)]`` — its own steering sequence plus a
      local COPY of every vehicle's xy trajectory over the horizon.
    * **local equalities** ``h_i``: agent i's own slice of its copy must
      equal its affine unicycle rollout, ``P_i[i] - (pos0_i + B_i u_i) = 0``
      (the locally-linearized rollout of ``casadi/PI_ADMM_class.py:45-70``
      is exact-affine in u — :func:`~..models.pi_admm._local_affine`).
    * **local objective** ``f_i``: tracking + effort on the own slice plus
      the reference's smoothed collision hinge
      ``beta * relu(d_thres^2 - ||dp||^2)^2`` between the own slice and the
      copies of the other vehicles (halved: each unordered pair appears in
      two agents).
    * **coupling** ``sum_i A_i y_i = 0``: consecutive copies agree,
      ``P_i - P_{i+1} = 0`` — the consensus constraint ALADIN coordinates
      through its coupled QP (the one global synchronization point,
      SURVEY.md §3.5).

    MPC: per step, ALADIN iterates to the reference termination (coupling
    + step-norm, ``example2.py:211-216``) or ``max_iters``; the first
    control advances the plant through the exact nonlinear rollout (the
    NilsEdit plant convention, ``dynamic_update_simulation.m:1-22``).
    Compared against consensus-ADMM on the crossing scenario in
    ``tests/test_aladin.py::TestAladinPlanner``.
    """

    def __init__(self, cfg=None, rho: float = 50.0, mu: float = 1e4,
                 scfg: SolverConfig = SolverConfig(),
                 max_iters: int = 30, term_tol: float = 1e-2,
                 globalization: str = "linesearch",
                 hinge_margin: float = 0.3,
                 dtype=jnp.float64):
        # linesearch default: full-step ALADIN oscillates on the nonconvex
        # hinge in the crossing's conflict window (measured: min dist 0.57
        # and railed iterations; the l1-merit backtracking restores a clean
        # crossing). hinge_margin inflates the penalty onset past
        # dis_thres: the SQUARED hinge is C^1 but flat at the boundary, so
        # without margin the optimizer grazes ~5% inside the threshold.
        from ..config import PiAdmmConfig
        from .. import scenarios
        self.cfg = cfg = cfg or PiAdmmConfig()
        self.v = v = cfg.num_veh
        self.h = h = cfg.horizon
        self.dtype = dtype
        self.max_iters, self.term_tol = max_iters, term_tol
        self.hinge_margin = float(hinge_margin)
        self.refs = jnp.asarray(scenarios.pi_admm_crossing_refs(cfg),
                                dtype)                           # [V, 2, N]
        self.spd = jnp.asarray(cfg.speeds, dtype)
        ny = h + v * 2 * h
        mc = (v - 1) * 2 * h * v
        # coupling: for each consecutive pair (i, i+1), rows P_i - P_{i+1}
        a_mats = jnp.zeros((v, mc, ny), dtype)
        blk = 2 * h * v
        eye = jnp.eye(blk, dtype=dtype)
        for i in range(v):
            if i < v - 1:      # +P_i rows of pair (i, i+1)
                a_mats = a_mats.at[i, i * blk:(i + 1) * blk, h:].set(eye)
            if i > 0:          # -P_i rows of pair (i-1, i)
                a_mats = a_mats.at[i, (i - 1) * blk:i * blk, h:].set(-eye)
        self._prob = AladinProblem(f=self._f, h=self._h,
                                   a_mats=a_mats,
                                   b=jnp.zeros((mc,), dtype),
                                   g=self._g)
        self.engine = AladinEngine(self._prob, rho=rho, mu=mu, scfg=scfg,
                                   globalization=globalization)

    def _split(self, y):
        u = y[:self.h]
        p_all = y[self.h:].reshape(self.v, self.h, 2)
        return u, p_all

    def _f(self, y, p_i):
        cfg = self.cfg
        u, p_all = self._split(y)
        own = p_all[p_i["idx"]]
        obj = (cfg.p_norm * jnp.sum((own - p_i["ref"]) ** 2)
               + cfg.p_cost * jnp.sum(u ** 2))
        # smoothed pairwise hinge vs every copy (ref cost_function_edge
        # ``casadi_old_PI_ADMM/PI_ADMM_class.py:141-179`` penalizes
        # beta * max(0, thres^2 - d^2); squared here for C^1 smoothness,
        # halved because each unordered pair appears in two agents)
        d2 = jnp.sum((own[None] - p_all) ** 2, axis=-1)     # [V, H]
        mask = 1.0 - jax.nn.one_hot(p_i["idx"], self.v, dtype=y.dtype)
        thres = cfg.dis_thres + self.hinge_margin
        hinge = jax.nn.relu(thres ** 2 - d2) ** 2
        obj += 0.5 * cfg.beta * jnp.sum(mask[:, None] * hinge)
        return obj

    def _predict_own(self, u, p_i):
        """Affine local rollout positions for steps 1..H: [H, 2]."""
        from ..ops.dynamics import unicycle_rollout_local
        xs, ys_, _ = unicycle_rollout_local(
            p_i["xt"], u, p_i["spd"], self.cfg.dt, self.cfg.wheel_base)
        return jnp.stack([xs[1:], ys_[1:]], axis=-1)

    def _h(self, y, p_i):
        u, p_all = self._split(y)
        own = p_all[p_i["idx"]]
        return (own - self._predict_own(u, p_i)).reshape(-1)

    def _g(self, y, p_i):
        """Steering magnitude + rate limits (ref ``nonlcon_function``,
        ``casadi/PI_ADMM_class.py:181-192``: |u| <= pi/6, |du| <= pi/9).
        Without these the conflict-window maneuvers spin the heading
        unboundedly (measured: theta reached 26 rad)."""
        cfg = self.cfg
        u, _ = self._split(y)
        du = u[1:] - u[:-1]
        return jnp.concatenate([
            cfg.u_max - u, u + cfg.u_max,
            cfg.du_max - du, du + cfg.du_max])

    def _agent_params(self, xt, step_idx):
        ref_win = jax.lax.dynamic_slice_in_dim(
            self.refs, step_idx + 1, self.h, axis=2)        # [V, 2, H]
        return dict(idx=jnp.arange(self.v),
                    ref=jnp.moveaxis(ref_win, 1, 2),        # [V, H, 2]
                    xt=xt, spd=self.spd)

    def mpc_step(self, xt, u_warm, step_idx):
        """One MPC step: ALADIN to termination, apply first control via the
        exact nonlinear plant rollout. Returns (xt_next, u, iters)."""
        from ..ops.dynamics import unicycle_rollout_exact
        p = self._agent_params(xt, jnp.asarray(step_idx, jnp.int32))
        pos_warm = jax.vmap(lambda u_i, xt_i, s_i: self._predict_own(
            u_i, dict(xt=xt_i, spd=s_i)))(u_warm, xt, self.spd)  # [V, H, 2]
        pos_warm = jnp.broadcast_to(
            pos_warm.reshape(1, self.v * self.h * 2),
            (self.v, self.v * self.h * 2))
        x0 = jnp.concatenate([u_warm, pos_warm], axis=1)
        state = self.engine.init_state(x0)
        it = 0
        for it in range(1, self.max_iters + 1):
            state, ys = self.engine.step(state, p)
            if (float(state.coupling_res) <= self.term_tol
                    and float(state.step_norm) <= self.term_tol):
                break
        u = state.x[:, :self.h]                              # [V, H]
        xs, ys_, ths = jax.vmap(
            lambda x_i, u_i, s_i: unicycle_rollout_exact(
                x_i, u_i[:1], s_i, self.cfg.dt, self.cfg.wheel_base))(
                xt, u, self.spd)
        xt_next = jnp.stack([xs[:, 1], ys_[:, 1], ths[:, 1]], axis=-1)
        return xt_next, u, it

    def run(self, n_steps: Optional[int] = None):
        """Receding-horizon loop (ref ``casadi_old_PI_ADMM/main.py:41-174``
        structure). Returns (states [n+1, V, 3], iters [n])."""
        import numpy as np
        cfg = self.cfg
        n_steps = cfg.n_mpc_steps if n_steps is None else n_steps
        from ..scenarios import pi_admm_initial_states
        xt = jnp.asarray(pi_admm_initial_states(cfg), self.dtype)
        u = jnp.zeros((self.v, self.h), self.dtype)
        states, iters = [np.asarray(xt)], []
        for k in range(n_steps):
            xt, u, it = self.mpc_step(xt, u, k)
            # shift warm start (ref main.py:83: x0 = shifted u)
            u = jnp.concatenate([u[:, 1:], u[:, -1:]], axis=1)
            states.append(np.asarray(xt))
            iters.append(it)
        return np.stack(states), np.asarray(iters)
