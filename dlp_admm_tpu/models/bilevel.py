"""Bilevel (MISC) and constraint-tightening OBCA planners (SURVEY.md C8/C9).

* :class:`BilevelObcaPlanner` ≙ ``Distributed_planner/decentralized_MISC/
  optimizer.py``: local NLPs have NO dual decision variables — collision
  duals are fixed data from the edge; the edge solves only the lower-level
  collision-dual problem
  ``min b_0^T l_0 + b_1^T l_1  s.t.  A_0^T l_0 + A_1^T l_1 = 0,
  -sum b^T l >= d_min, ||A_i^T l_i|| <= 1, 0 <= l <= 5``
  (ref ``optimizer.py:223-257``, sign-reversed max as noted at ``:251-257``).
* :class:`TighteningObcaPlanner` ≙ ``decentralized_tighting/optimizer_ori.py``:
  ONE local pass + ONE edge pass per MPC step (no inner loop); locals use the
  *previous* step's (A, b, lambda) with collision rows skipped at t = 0
  (``optimizer_ori.py:98-99``); ``bar_state_update`` shifts predictions by 2
  steps and duplicates the tail (``:187-206``).

The reference implements both for 2 vehicles; here they are generalized to N
vehicles with the same neighbour-slot layout as the consensus flagship
(:mod:`.obca`): collision duals live per unordered pair as ``[P, 2, T, 4]``
tensors (side 0 = the lower-indexed vehicle), the per-pair lower-level dual
QCQPs are **independent** and solved as one vmapped batch over (pair,
timestep), and each vehicle's local NLP takes its K = V-1 neighbour rows as
fixed data. For ``num_veh == 2`` (P = 1, K = 1) this is exactly the
reference's formulation.

Both reuse the TPU-native pattern of :mod:`.obca`: vectorized constraints,
elastic l1 exact penalties on the stale-data collision rows, batched
interior-point solves.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ObcaConfig, SolverConfig, VehicleConfig
from ..ops.geometry import halfspaces
from ..solvers.ip import NLP, solve_nlp
from .obca import _box_residuals, _dyn_residual

# %% shared: the lower-level collision-dual problem ---------------------------


def _dual_nlp(min_dis: float, lam_hi: float = 5.0) -> NLP:
    """Per-(pair, timestep) collision-dual QCQP over x = [l_0 (4), l_1 (4)].

    Parameters p: ``a0/a1 [4,2]``, ``b0/b1 [4]``. Ref MISC
    ``edge_generate_constrain/_object`` ``optimizer.py:223-257``.
    """

    def f(x, p):
        return p["b0"] @ x[:4] + p["b1"] @ x[4:]

    def ce(x, p):
        return p["a0"].T @ x[:4] + p["a1"].T @ x[4:]

    def ci(x, p):
        sep = -p["b0"] @ x[:4] - p["b1"] @ x[4:] - min_dis
        n0 = 0.95 ** 2 - jnp.sum((p["a0"].T @ x[:4]) ** 2)
        n1 = 0.95 ** 2 - jnp.sum((p["a1"].T @ x[4:]) ** 2)
        return jnp.concatenate([jnp.array([sep, n0, n1]), x, lam_hi - x])

    return NLP(f, ce, ci)


def _dual_slack_nlp(min_dis: float, lam_hi: float = 1.0e4) -> NLP:
    """Per-(pair, timestep) collision-dual problem with an explicit separating
    direction s — the ``decentralized_tighting/optimizer.py`` (non-ori)
    variant: x = [l_0 (4), l_1 (4), s (2)],

        min b_0^T l_0 + b_1^T l_1
        s.t. A_0^T l_0 + s = 0,  A_1^T l_1 - s = 0            (6a)/(6b)
             -b_0^T l_0 - b_1^T l_1 >= min_dis                (6c-1)
             ||s||^2 <= 1,  -1 <= s <= 1,  0 <= l <= 1e4      (6c-2 + bounds)

    Ref ``optimizer.py:236-270`` (constraints), ``:258-268`` (bounds),
    ``:271-274`` (objective).
    """

    def f(x, p):
        return p["b0"] @ x[:4] + p["b1"] @ x[4:8]

    def ce(x, p):
        s = x[8:]
        return jnp.concatenate([p["a0"].T @ x[:4] + s,
                                p["a1"].T @ x[4:8] - s])

    def ci(x, p):
        lam = x[:8]
        s = x[8:]
        sep = -p["b0"] @ x[:4] - p["b1"] @ x[4:8] - min_dis
        sn = 1.0 - jnp.sum(s ** 2)
        return jnp.concatenate([jnp.array([sep, sn]), lam, lam_hi - lam,
                                1.0 - s, 1.0 + s])

    return NLP(f, ce, ci)


def solve_collision_duals(a_pair, b_pair, min_dis: float, scfg: SolverConfig,
                          lam_warm=None):
    """Batched edge dual solve over all pairs and timesteps.

    ``a_pair [P, 2, T, 4, 2]``, ``b_pair [P, 2, T, 4]`` -> ``lam
    [P, 2, T, 4]``. One vmapped IP solve over the flattened (pair, timestep)
    batch replaces the reference's per-step IPOPT instantiations.
    """
    nlp = _dual_nlp(min_dis)
    p_, t = b_pair.shape[0], b_pair.shape[2]
    p = dict(a0=a_pair[:, 0].reshape(p_ * t, 4, 2),
             a1=a_pair[:, 1].reshape(p_ * t, 4, 2),
             b0=b_pair[:, 0].reshape(p_ * t, 4),
             b1=b_pair[:, 1].reshape(p_ * t, 4))
    if lam_warm is None:
        x0 = jnp.full((p_ * t, 8), 0.5, b_pair.dtype)
    else:
        x0 = jnp.concatenate([lam_warm[:, 0], lam_warm[:, 1]],
                             axis=-1).reshape(p_ * t, 8)
    sol = jax.vmap(lambda xx, pp: solve_nlp(nlp, xx, pp, scfg))(x0, p)
    lam = jnp.stack([sol.x[:, :4].reshape(p_, t, 4),
                     sol.x[:, 4:].reshape(p_, t, 4)], axis=1)
    if lam_warm is not None:
        # when predicted trajectories interpenetrate the dual problem is
        # infeasible (no separating certificate exists) — keep the previous
        # step's certificates so the local separation rows retain a
        # restoring force (the reference gets the analogous effect from
        # IPOPT's least-infeasibility return)
        ok = sol.converged.reshape(p_, 1, t, 1)
        lam = jnp.where(ok, lam, lam_warm)
    return lam, sol


def solve_collision_duals_slack(a_pair, b_pair, min_dis: float,
                                scfg: SolverConfig, lam_warm=None,
                                s_warm=None):
    """Batched slack-variant edge solve: returns ``(lam [P,2,T,4],
    s [P,T,2], sol)``. Same warm-keep policy as
    :func:`solve_collision_duals`."""
    nlp = _dual_slack_nlp(min_dis)
    p_, t = b_pair.shape[0], b_pair.shape[2]
    p = dict(a0=a_pair[:, 0].reshape(p_ * t, 4, 2),
             a1=a_pair[:, 1].reshape(p_ * t, 4, 2),
             b0=b_pair[:, 0].reshape(p_ * t, 4),
             b1=b_pair[:, 1].reshape(p_ * t, 4))
    if lam_warm is None:
        x0 = jnp.full((p_ * t, 10), 0.5, b_pair.dtype)
        x0 = x0.at[:, 8:].set(0.0)
    else:
        x0 = jnp.concatenate(
            [lam_warm[:, 0], lam_warm[:, 1], s_warm],
            axis=-1).reshape(p_ * t, 10)
    sol = jax.vmap(lambda xx, pp: solve_nlp(nlp, xx, pp, scfg))(x0, p)
    lam = jnp.stack([sol.x[:, :4].reshape(p_, t, 4),
                     sol.x[:, 4:8].reshape(p_, t, 4)], axis=1)
    s = sol.x[:, 8:].reshape(p_, t, 2)
    if lam_warm is not None:
        ok = sol.converged.reshape(p_, t, 1)
        lam = jnp.where(ok[:, None], lam, lam_warm)
        s = jnp.where(ok, s, s_warm)
    return lam, s, sol


# %% shared: fixed-dual local NLP --------------------------------------------


class _FixedDualLocal:
    """Local tracking NLP with collision rows using FIXED duals as data.

    x = [X (5N) | U (2(N-1)) | e1 (K(N-1)) | e2 (2K(N-1))]; constraint rows
    are, per neighbour slot k, the (5a) separation row and the (5b)
    dual-feasibility coupling rows of ref
    ``decentralized_MISC/optimizer.py:101-133`` /
    ``decentralized_tighting/optimizer{_ori,}.py:101-126`` with the dual
    variables replaced by bar-state data. Both are elastic (l1 exact
    penalty via e1/e2 — stale bar data makes them transiently infeasible,
    which the reference leaves to IPOPT's restoration).

    ``coupling`` selects the (5b) form:
      * ``"other_a"`` — A(X)^T lam_self + A_other^T lam_other = 0
        (``optimizer_ori.py:119-123``, MISC ``optimizer.py:126-133``)
      * ``"slack"`` — A(X)^T lam_self + sgn * s_bar = 0 with sgn = +1 for
        the lower-indexed vehicle of the pair, -1 for the higher
        (``optimizer.py:121-125``; the reference's vehicle 0 / vehicle 1)
    """

    def __init__(self, ocfg: ObcaConfig, vcfg: VehicleConfig, dtype,
                 coupling: str = "other_a"):
        if coupling not in ("other_a", "slack"):
            raise ValueError(f"unknown coupling {coupling!r}")
        self.ocfg, self.vcfg, self.dtype = ocfg, vcfg, dtype
        self.coupling = coupling
        n = ocfg.horizon
        k = ocfg.num_veh - 1
        self.K = k
        self.sizes = dict(x=5 * n, u=2 * (n - 1), e1=k * (n - 1),
                          e2=2 * k * (n - 1))
        self.elastic_w = 1.0e7
        self.nlp = NLP(self._obj, self._ce, self._ci)

    def split(self, x):
        n = self.ocfg.horizon
        s = self.sizes
        o_u = s["x"]
        o_e1 = o_u + s["u"]
        o_e2 = o_e1 + s["e1"]
        return (x[:s["x"]].reshape(n, 5),
                x[o_u:o_e1].reshape(n - 1, 2),
                x[o_e1:o_e2].reshape(self.K, n - 1),
                x[o_e2:].reshape(self.K, n - 1, 2))

    def _obj(self, x, p):
        xs, us, e1, e2 = self.split(x)
        err = xs[1:] - p["ref_win"][1:]
        return (self.ocfg.r_ctrl * jnp.sum(us ** 2)
                + self.ocfg.q_state * jnp.sum(err ** 2)
                + self.elastic_w * (jnp.sum(e1) + jnp.sum(e2)))

    def _ce(self, x, p):
        xs, us, _, _ = self.split(x)
        return _dyn_residual(xs, us, p["init_state"], self.vcfg)

    def _raw_rows(self, xs, p):
        """(5a) separation margin [K, T] and (5b) coupling residual [K, T, 2]
        per neighbour slot, gated by p["active"] (the tightening variant
        skips collision rows at t_step == 0, optimizer_ori.py:98-99)."""
        a_self, b_self = halfspaces(xs[1:], self.vcfg,
                                    self.ocfg.use_delay_tightening)
        sep = (-jnp.einsum('ti,kti->kt', b_self, p["lam_self"])
               - jnp.einsum('kti,kti->kt', p["other_b"], p["lam_other"])
               - self.ocfg.min_dis)
        atl = jnp.einsum('tij,kti->ktj', a_self, p["lam_self"])
        if self.coupling == "slack":
            g = atl + p["sgn"][:, None, None] * p["s_bar"]
        else:
            g = atl + jnp.einsum('ktij,kti->ktj', p["other_a"],
                                 p["lam_other"])
        sep = jnp.where(p["active"], sep, 1.0)
        g = jnp.where(p["active"], g, 0.0)
        return sep, g

    def _ci(self, x, p):
        xs, us, e1, e2 = self.split(x)
        sep, g = self._raw_rows(xs, p)
        boxes = _box_residuals(xs, us, self.ocfg, self.vcfg)
        return jnp.concatenate([(sep + e1).reshape(-1), e1.reshape(-1),
                                (e2 - g).reshape(-1), (e2 + g).reshape(-1),
                                e2.reshape(-1), boxes])

    def warm(self, ref_win, p):
        s = self.sizes
        base = jnp.concatenate([
            ref_win.reshape(-1),
            jnp.zeros(s["u"] + s["e1"] + s["e2"], self.dtype)])
        sep, g = self._raw_rows(ref_win, p)
        e1 = (jnp.maximum(-sep, 0.0) + 0.01).reshape(-1)
        e2 = (jnp.abs(g) + 0.01).reshape(-1)
        return jnp.concatenate([base[:s["x"] + s["u"]], e1, e2])


class FixedDualState(NamedTuple):
    """Exchange state: halfspaces + per-pair duals (ref MISC/tighting
    ``mid_state``).

    ``lam [P, 2, T, 4]`` holds the dual pair per unordered vehicle pair
    (side 0 = lower-indexed vehicle); ``s [P, T, 2]`` is the
    separating-direction slack of the tightening slack variant (ref
    ``decentralized_tighting/optimizer.py:311`` ``mid_state.s``); the other
    planners carry zeros."""

    a_mat: jnp.ndarray   # [V, T, 4, 2]
    b: jnp.ndarray       # [V, T, 4]
    lam: jnp.ndarray     # [P, 2, T, 4]
    s: jnp.ndarray       # [P, T, 2]


class _FixedDualPlannerBase:
    """Common driver machinery for the bilevel and tightening planners."""

    coupling = "other_a"

    def __init__(self, ocfg: ObcaConfig, vcfg: VehicleConfig,
                 scfg: SolverConfig, refs: Optional[np.ndarray],
                 dtype=jnp.float64):
        from .. import scenarios
        from ..ops.pairs import pair_indices
        self.ocfg, self.vcfg, self.scfg = ocfg, vcfg, scfg
        self.dtype = dtype
        if refs is None:
            refs = scenarios.ref_traj_overtake(vcfg, ocfg.num_veh)
        self.refs = jnp.asarray(refs, dtype)
        v = ocfg.num_veh
        self.num_veh, self.K = v, v - 1
        # static neighbour/pair maps (shared layout with obca.Consensus)
        self.idx_i, self.idx_j = pair_indices(v)
        self._nbr = np.array([[j for j in range(v) if j != i]
                              for i in range(v)])          # [V, K]
        pid = np.zeros((v, v), dtype=np.int64)
        side = np.zeros((v, v), dtype=np.int64)
        for p_, (a, bb) in enumerate(zip(self.idx_i, self.idx_j)):
            pid[a, bb] = pid[bb, a] = p_
            side[a, bb] = 0          # a is the lower-indexed member
            side[bb, a] = 1
        rows = np.arange(v)[:, None]
        self._slot_pid = pid[rows, self._nbr]              # [V, K]
        self._slot_side = side[rows, self._nbr]            # [V, K]
        self.local = _FixedDualLocal(ocfg, vcfg, dtype, self.coupling)
        self._mpc_step = jax.jit(self._mpc_step_impl)

    def _pair_halfspaces(self, a_mat, b):
        """Gather per-vehicle halfspaces to per-pair sides:
        ``([P, 2, T, 4, 2], [P, 2, T, 4])``."""
        a_pair = jnp.stack([a_mat[self.idx_i], a_mat[self.idx_j]], axis=1)
        b_pair = jnp.stack([b[self.idx_i], b[self.idx_j]], axis=1)
        return a_pair, b_pair

    def create_state(self) -> FixedDualState:
        n = self.ocfg.horizon
        p_ = len(self.idx_i)
        ref0 = self.refs[:, 1:n, :]
        a0, b0 = halfspaces(ref0, self.vcfg, self.ocfg.use_delay_tightening)
        a_pair, b_pair = self._pair_halfspaces(a0, b0)
        s0 = jnp.zeros((p_, n - 1, 2), self.dtype)
        if self.coupling == "slack":
            lam, s0, _ = solve_collision_duals_slack(
                a_pair, b_pair, self.ocfg.min_dis, self.scfg)
        else:
            lam, _ = solve_collision_duals(a_pair, b_pair, self.ocfg.min_dis,
                                           self.scfg)
        return FixedDualState(a_mat=a0, b=b0, lam=lam, s=s0)

    def _local_solve(self, bs: FixedDualState, init_state, ref_win, active):
        v = self.num_veh
        # per-vehicle neighbour-slot gathers of the pair duals:
        # lam_self[i, k] = side of pair (i, nbr[i,k]) owned by i
        lam_self = bs.lam[self._slot_pid, self._slot_side]     # [V, K, T, 4]
        lam_other = bs.lam[self._slot_pid, 1 - self._slot_side]
        p = dict(init_state=init_state, ref_win=ref_win,
                 lam_self=lam_self, other_b=bs.b[self._nbr],
                 lam_other=lam_other,
                 active=jnp.broadcast_to(active, (v,)))
        if self.coupling == "slack":
            p["s_bar"] = bs.s[self._slot_pid]                  # [V, K, T, 2]
            # +1 on the lower-indexed side of each pair, -1 on the higher
            p["sgn"] = jnp.asarray(1.0 - 2.0 * self._slot_side, self.dtype)
        else:
            p["other_a"] = bs.a_mat[self._nbr]
        x0 = jax.vmap(self.local.warm)(ref_win, p)
        sol = jax.vmap(lambda xx, pp: solve_nlp(self.local.nlp, xx, pp,
                                                self.scfg))(x0, p)
        xs, us, e1, e2 = jax.vmap(self.local.split)(sol.x)
        e = jnp.maximum(jnp.max(e1, axis=(-2, -1)),
                        jnp.max(e2, axis=(-3, -2, -1)))
        return xs, us, e, sol

    def run(self, n_steps: Optional[int] = None,
            checkpoint_path: Optional[str] = None, resume: bool = False):
        """MPC loop with optional checkpoint/resume of the
        (init_state, FixedDualState) carry (SURVEY.md §5)."""
        import os
        ocfg, vcfg = self.ocfg, self.vcfg
        total = int(vcfg.T / vcfg.dt - ocfg.horizon)
        n_steps = total if n_steps is None else n_steps
        init_state = jnp.asarray(self.refs[:, 0, :], self.dtype)
        bs = self.create_state()
        start = 0
        if checkpoint_path is not None and resume \
                and os.path.exists(checkpoint_path):
            from ..utils.checkpoint import load_carry
            (init_state, bs), start = load_carry(checkpoint_path,
                                                 (init_state, bs))
        states = [np.asarray(init_state)]
        infos = []
        for t in range(start, n_steps):
            init_state, bs, info = self._mpc_step(
                init_state, bs, jnp.asarray(t, jnp.int32))
            states.append(np.asarray(init_state))
            infos.append(jax.device_get(info))
            if checkpoint_path is not None:
                from ..utils.checkpoint import save_carry
                save_carry(checkpoint_path, (init_state, bs), t + 1)
        return np.stack(states), infos


class BilevelObcaPlanner(_FixedDualPlannerBase):
    """MISC bilevel alternation (ref ``decentralized_MISC/optimizer.py``):
    per MPC step, a small fixed number of (local NLPs -> halfspace update ->
    edge dual solve) rounds — the reference caps this loop at a handful of
    iterations with no convergence test."""

    def __init__(self, ocfg: ObcaConfig = ObcaConfig(horizon=8, min_dis=1.0),
                 vcfg: VehicleConfig = VehicleConfig(),
                 scfg: SolverConfig = SolverConfig(),
                 refs: Optional[np.ndarray] = None, n_rounds: int = 3,
                 dtype=jnp.float64):
        self.n_rounds = n_rounds
        super().__init__(ocfg, vcfg, scfg, refs, dtype)

    def _mpc_step_impl(self, init_state, bs: FixedDualState, step_idx):
        n = self.ocfg.horizon
        ref_win = jax.lax.dynamic_slice_in_dim(self.refs, step_idx, n, axis=1)

        def round_(bs, _):
            xs, us, e, sol = self._local_solve(
                bs, init_state, ref_win, jnp.asarray(True))
            a_new, b_new = halfspaces(xs[:, 1:, :], self.vcfg,
                                      self.ocfg.use_delay_tightening)
            a_pair, b_pair = self._pair_halfspaces(a_new, b_new)
            lam, dsol = solve_collision_duals(
                a_pair, b_pair, self.ocfg.min_dis, self.scfg, bs.lam)
            bs = FixedDualState(a_mat=a_new, b=b_new, lam=lam, s=bs.s)
            return bs, (xs, jnp.max(e), dsol.kkt_error.max())

        bs, (xs_hist, e_hist, dual_kkt) = jax.lax.scan(
            round_, bs, None, length=self.n_rounds)
        xs = jax.tree.map(lambda a: a[-1], xs_hist)
        next_state = xs[:, 1, :]
        info = dict(elastic=e_hist[-1], dual_kkt=dual_kkt[-1])
        return next_state, bs, info


class TighteningObcaPlanner(_FixedDualPlannerBase):
    """Sequential constraint-tightening planner (ref ``decentralized_tighting/
    optimizer_ori.py``): one local pass with the previous step's (A, b, lam)
    and one edge dual re-solve per MPC step; predictions shifted by two steps
    with duplicated tail in ``bar_state_update`` (``:187-206``); collision
    rows inactive at t = 0. Default config uses T = 7 s and prob = 0.99
    (ref ``decentralized_tighting/veh_config.py:18``)."""

    def __init__(self, ocfg: ObcaConfig = ObcaConfig(horizon=8, min_dis=1.0),
                 vcfg: VehicleConfig = VehicleConfig(T=7.0, prob=0.99),
                 scfg: SolverConfig = SolverConfig(),
                 refs: Optional[np.ndarray] = None, dtype=jnp.float64):
        super().__init__(ocfg, vcfg, scfg, refs, dtype)

    def _mpc_step_impl(self, init_state, bs: FixedDualState, step_idx):
        n = self.ocfg.horizon
        ref_win = jax.lax.dynamic_slice_in_dim(self.refs, step_idx, n, axis=1)
        active = step_idx > 0
        xs, us, e, sol = self._local_solve(bs, init_state, ref_win, active)

        # bar_state_update with the 2-step shift + duplicated tail
        # (optimizer_ori.py:187-206): entries 0..T-3 from prediction steps
        # 2..T-1, last entry duplicated
        shift_idx = jnp.clip(jnp.arange(2, n + 1), None, n - 1)
        xs_shift = xs[:, shift_idx, :]
        a_new, b_new = halfspaces(xs_shift, self.vcfg,
                                  self.ocfg.use_delay_tightening)
        a_pair, b_pair = self._pair_halfspaces(a_new, b_new)
        lam, dsol = solve_collision_duals(a_pair, b_pair, self.ocfg.min_dis,
                                          self.scfg, bs.lam)
        bs = FixedDualState(a_mat=a_new, b=b_new, lam=lam, s=bs.s)
        info = dict(elastic=jnp.max(e), dual_kkt=dsol.kkt_error.max())
        return xs[:, 1, :], bs, info


class TighteningSlackObcaPlanner(TighteningObcaPlanner):
    """Constraint-tightening planner with the explicit separating-direction
    slack (ref ``decentralized_tighting/optimizer.py``, the non-exported
    variant): local (5b) rows couple A(X)^T lam to the shared direction
    ``+-s_bar`` (``:121-125``), and the edge re-solves duals AND the
    direction jointly under ||s||^2 <= 1 (``:236-270``)."""

    coupling = "slack"

    def _mpc_step_impl(self, init_state, bs: FixedDualState, step_idx):
        n = self.ocfg.horizon
        ref_win = jax.lax.dynamic_slice_in_dim(self.refs, step_idx, n, axis=1)
        active = step_idx > 0
        xs, us, e, sol = self._local_solve(bs, init_state, ref_win, active)

        # same 2-step prediction shift + duplicated tail as the ori variant
        shift_idx = jnp.clip(jnp.arange(2, n + 1), None, n - 1)
        xs_shift = xs[:, shift_idx, :]
        a_new, b_new = halfspaces(xs_shift, self.vcfg,
                                  self.ocfg.use_delay_tightening)
        a_pair, b_pair = self._pair_halfspaces(a_new, b_new)
        lam, s_new, dsol = solve_collision_duals_slack(
            a_pair, b_pair, self.ocfg.min_dis, self.scfg, bs.lam, bs.s)
        bs = FixedDualState(a_mat=a_new, b=b_new, lam=lam, s=s_new)
        info = dict(elastic=jnp.max(e), dual_kkt=dsol.kkt_error.max())
        return xs[:, 1, :], bs, info
