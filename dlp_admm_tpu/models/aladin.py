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
    """min sum_i f(y_i, p_i)  s.t.  sum_i A_i y_i = b,  h(y_i, p_i) = 0."""

    f: Callable                 # (y [ny], p_i) -> scalar
    h: Callable                 # (y [ny], p_i) -> [mh] equality residuals
    a_mats: jnp.ndarray         # [N, mc, ny] coupling matrices
    b: jnp.ndarray              # [mc]


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
            return jnp.zeros((0,), y.dtype)

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
            # our IP convention is L = f - y^T h; the reference's kappa uses
            # L = f + kappa^T h (IPOPT), so kappa = -y
            return sol.x, -sol.y

        ys, kappas = jax.vmap(solve_one)(state.x, p, prob.a_mats)

        # 2./3. active-set Jacobians, modified gradients, exact Hessians
        def derive_one(y_i, p_i, kappa_i):
            h_val = prob.h(y_i, p_i)
            j_real = jax.jacfwd(prob.h)(y_i, p_i)
            active = jnp.abs(h_val) <= self.active_tol
            c_i = jnp.where(active[:, None], j_real, 0.0)
            g_i = (jax.grad(prob.f)(y_i, p_i)
                   + (j_real - c_i).T @ kappa_i)
            h_i = jax.hessian(
                lambda y: prob.f(y, p_i) + kappa_i @ prob.h(y, p_i))(y_i)
            h_i = h_i + self.hess_reg * jnp.eye(ny, dtype=dtype)
            return c_i, g_i, h_i

        c_all, g_all, h_all = jax.vmap(derive_one)(ys, p, kappas)
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
                return (jnp.sum(fs) + pen * jnp.sum(jnp.abs(coup))
                        + pen * jnp.sum(jnp.abs(hs)))

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
