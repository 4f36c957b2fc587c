"""OBCA planners: centralized joint NLP and consensus-ADMM decomposition.

TPU-native re-implementation of the reference's ``Distributed_planner`` line
(SURVEY.md C6/C7), the paper's full-dimensional OBCA dual formulation:

* :class:`CentralizedObcaPlanner` ≙ ``centralized/optimizer.py`` +
  ``centralized_overtaking{,_stochastic}.py``: one joint NLP over all
  vehicles' states, controls and collision duals, solved receding-horizon.
* :class:`ConsensusObcaPlanner` ≙ ``decentralized/optimizer.py`` +
  ``decentralized_overtaking_ADMM.py`` (the flagship): per-vehicle NLPs over
  (X_i, U_i, lambda_loc) with augmented-Lagrangian coupling to an edge/RSU
  consensus NLP over Z = (states, lambda), plain dual ascent on lambda_bar.

Both planners express every IPOPT call of the reference as a
:class:`~dlp_admm_tpu.solvers.ip.NLP` spec solved by the batched
interior-point solver — one traced solver per problem family, vmapped over
vehicles (SURVEY.md §2.2). Constraints are fully vectorized over the horizon
(no per-timestep Python constraint loops), which keeps the AD Hessians cheap.

Collision constraint blocks (paper eq. (4)/(5)/(6); ref file:line cited per
method):

    (4a)  -b_i(x_i)^T l_i - b_j(x_j)^T l_j >= d_min
    (4b)  A_i(x_i)^T l_i + A_j(x_j)^T l_j  = 0
    (4c)  ||A_i(x_i)^T l_i||^2 <= 1,  l >= 0
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import DualUpdateConfig, ObcaConfig, SolverConfig, VehicleConfig
from ..coordination.dual_update import DualState, update_dual
from ..ops.dynamics import bicycle_rhs
from ..ops.geometry import halfspaces
from ..solvers.ip import NLP, NLPSolution, solve_nlp
from ..solvers.ip_staged import StagedNLP, solve_staged

# %% shared pieces ------------------------------------------------------------


def _dyn_residual(x_states, u_ctrls, init_state, cfg: VehicleConfig):
    """Vectorized init + Euler dynamics equality residuals.

    ``x_states [N, 5]``, ``u_ctrls [N-1, 2]``. Ref
    ``decentralized/optimizer.py:84-100`` builds these with a per-step loop;
    here one batched ``bicycle_rhs`` evaluation covers the horizon.
    """
    r0 = x_states[0] - init_state
    f = bicycle_rhs(x_states[:-1], u_ctrls, cfg)
    r_dyn = x_states[1:] - (x_states[:-1] + cfg.dt * f)
    return jnp.concatenate([r0, r_dyn.reshape(-1)])


def _box_residuals(x_states, u_ctrls, ocfg: ObcaConfig, vcfg: VehicleConfig):
    """State/control box bounds as >= 0 residuals
    (ref ``local_generate_variable`` ``optimizer.py:131-142``)."""
    lo_x = jnp.array([0.0, -ocfg.max_y, -vcfg.max_v, -2 * jnp.pi,
                      -vcfg.max_front_wheel_angle])
    hi_x = jnp.array([ocfg.max_x, ocfg.max_y, vcfg.max_v, 2 * jnp.pi,
                      vcfg.max_front_wheel_angle])
    hi_u = jnp.array([vcfg.max_acc, vcfg.max_steer_rate])
    return jnp.concatenate([
        (x_states - lo_x).reshape(-1), (hi_x - x_states).reshape(-1),
        (u_ctrls + hi_u).reshape(-1), (hi_u - u_ctrls).reshape(-1)])


# %% centralized joint planner (C6) -------------------------------------------


class CentralizedObcaPlanner:
    """Joint OBCA NLP over all vehicles, receding horizon.

    Ref ``centralized/optimizer.py:8-194``; horizon 15, R = 0.1 I, Q = I.
    Generalizes the reference's 2-vehicle collision block to all unordered
    pairs with per-(pair, side) duals; for ``num_veh == 2`` this is exactly
    the reference problem.
    """

    def __init__(self, ocfg: ObcaConfig = ObcaConfig(horizon=15),
                 vcfg: VehicleConfig = VehicleConfig(),
                 scfg: SolverConfig = SolverConfig(),
                 refs: Optional[np.ndarray] = None,
                 r_ctrl: float = 0.1, q_state: float = 1.0,
                 warm_mode: str = "reference",
                 use_staged: bool = True,
                 dtype=jnp.float64):
        from .. import scenarios
        from ..ops.pairs import pair_indices
        self.ocfg, self.vcfg, self.scfg = ocfg, vcfg, scfg
        self.dtype = dtype
        self.r_ctrl, self.q_state = r_ctrl, q_state
        # use_staged: solve the joint NLP with the block-tridiagonal staged
        # IP (solvers/ip_staged.py) instead of the dense-KKT solver — same
        # problem, O(N B^3) per iteration instead of O((N B)^3) (SURVEY §7.4)
        self.use_staged = use_staged
        # 'reference' re-seeds every MPC step from the reference window (the
        # reference's initialize(), centralized/optimizer.py:31-51, which
        # leans on IPOPT's 1000-iteration robustness); 'previous' shifts the
        # previous step's optimum — much better conditioned for the
        # fixed-budget IP solver when the reference path itself is infeasible
        # (e.g. crossing scenarios where the refs collide)
        assert warm_mode in ("reference", "previous")
        self.warm_mode = warm_mode
        if refs is None:
            refs = scenarios.ref_traj_overtake(vcfg, ocfg.num_veh)
        self.refs = jnp.asarray(refs, dtype)            # [V, T/dt+1, 5]
        self.idx_i, self.idx_j = pair_indices(ocfg.num_veh)
        v, n, p = ocfg.num_veh, ocfg.horizon, len(self.idx_i)
        self._sizes = dict(
            x=v * 5 * n, u=v * 2 * (n - 1), lam=p * 2 * 4 * (n - 1))
        self._nlp = NLP(self._objective, self._ce, self._ci)
        self._staged_nlp = StagedNLP(self._stage_f, self._stage_ce_link,
                                     self._stage_ce, self._stage_ci)
        self._solve = jax.jit(self._solve_impl)
        self._shift_warm = jax.jit(self._shift_warm_impl)

    # x layout: [X (V,N,5) | U (V,N-1,2) | LAM (P,2,N-1,4)]
    def _split(self, x):
        v, n = self.ocfg.num_veh, self.ocfg.horizon
        p = len(self.idx_i)
        s = self._sizes
        xs = x[:s["x"]].reshape(v, n, 5)
        us = x[s["x"]:s["x"] + s["u"]].reshape(v, n - 1, 2)
        lam = x[s["x"] + s["u"]:].reshape(p, 2, n - 1, 4)
        return xs, us, lam

    def _objective(self, x, p):
        """Tracking + effort (ref ``generate_object`` ``optimizer.py:104-115``)."""
        xs, us, _ = self._split(x)
        err = xs[:, 1:, :] - p["ref_win"][:, 1:, :]
        return (self.r_ctrl * jnp.sum(us ** 2)
                + self.q_state * jnp.sum(err ** 2))

    def _halfspaces_at(self, xs):
        """[V, N-1, 4, 2], [V, N-1, 4] halfspaces of steps 1..N-1
        (ref ``generate_constrain`` ``optimizer.py:168-181``)."""
        return halfspaces(xs[:, 1:, :], self.vcfg,
                          self.ocfg.use_delay_tightening)

    def _ce(self, x, p):
        xs, us, lam = self._split(x)
        dyn = jax.vmap(lambda xi, ui, si: _dyn_residual(xi, ui, si, self.vcfg)
                       )(xs, us, p["init_state"]).reshape(-1)
        a_mat, _ = self._halfspaces_at(xs)
        # (4b): A_i^T l_pi + A_j^T l_pj = 0 per pair per step
        at_li = jnp.einsum('ptij,pti->ptj', a_mat[self.idx_i], lam[:, 0])
        at_lj = jnp.einsum('ptij,pti->ptj', a_mat[self.idx_j], lam[:, 1])
        return jnp.concatenate([dyn, (at_li + at_lj).reshape(-1)])

    def _ci(self, x, p):
        xs, us, lam = self._split(x)
        a_mat, b = self._halfspaces_at(xs)
        # (4a): -b_i^T l_i - b_j^T l_j - d_min >= 0
        bl_i = jnp.einsum('pti,pti->pt', b[self.idx_i], lam[:, 0])
        bl_j = jnp.einsum('pti,pti->pt', b[self.idx_j], lam[:, 1])
        sep = -bl_i - bl_j - self.ocfg.min_dis
        # (4c): 1 - ||A_i^T l_i||^2 >= 0 (one side per pair suffices given 4b,
        # matching ref optimizer.py:192-194)
        at_li = jnp.einsum('ptij,pti->ptj', a_mat[self.idx_i], lam[:, 0])
        nrm = 1.0 - jnp.sum(at_li ** 2, axis=-1)
        boxes = jax.vmap(lambda xi, ui: _box_residuals(xi, ui, self.ocfg,
                                                       self.vcfg))(xs, us)
        return jnp.concatenate([sep.reshape(-1), nrm.reshape(-1),
                                lam.reshape(-1), boxes.reshape(-1)])

    # -- staged (block-tridiagonal) form ----------------------------------
    # Stage k = 0..N-2 holds every step-(k+1) decision block:
    # w_k = [X[:, k+1, :] (V*5) | U[:, k, :] (V*2) | LAM[:, :, k, :] (P*8)].
    # The joint NLP's KKT is block-tridiagonal in this ordering (dynamics
    # couple adjacent stages; OBCA rows live within a stage) — the structure
    # the reference hands to IPOPT's sparse solver (centralized/optimizer.py:
    # 148-194) and the dense path ignores.

    def _stage_split(self, w):
        v = self.ocfg.num_veh
        p = len(self.idx_i)
        xs = w[:5 * v].reshape(v, 5)
        us = w[5 * v:7 * v].reshape(v, 2)
        lam = w[7 * v:].reshape(p, 2, 4)
        return xs, us, lam

    def _stage_params(self, init_state, ref_win):
        t = self.ocfg.horizon - 1
        first = jnp.zeros((t,), self.dtype).at[0].set(1.0)
        return dict(first=first,
                    ref=jnp.moveaxis(ref_win[:, 1:, :], 1, 0),   # [T, V, 5]
                    init=jnp.broadcast_to(init_state,
                                          (t,) + init_state.shape))

    def _stage_f(self, w, pk):
        xs, us, _ = self._stage_split(w)
        return (self.r_ctrl * jnp.sum(us ** 2)
                + self.q_state * jnp.sum((xs - pk["ref"]) ** 2))

    def _stage_ce_link(self, w_prev, w, pk):
        xs, us, _ = self._stage_split(w)
        xp = jnp.where(pk["first"] > 0, pk["init"],
                       self._stage_split(w_prev)[0])
        f = bicycle_rhs(xp, us, self.vcfg)
        return (xs - (xp + self.vcfg.dt * f)).reshape(-1)

    def _stage_ce(self, w, pk):
        xs, _, lam = self._stage_split(w)
        a_mat, _ = halfspaces(xs, self.vcfg, self.ocfg.use_delay_tightening)
        at_li = jnp.einsum('pij,pi->pj', a_mat[self.idx_i], lam[:, 0])
        at_lj = jnp.einsum('pij,pi->pj', a_mat[self.idx_j], lam[:, 1])
        return (at_li + at_lj).reshape(-1)

    def _stage_ci(self, w, pk):
        xs, us, lam = self._stage_split(w)
        a_mat, b = halfspaces(xs, self.vcfg, self.ocfg.use_delay_tightening)
        bl_i = jnp.einsum('pi,pi->p', b[self.idx_i], lam[:, 0])
        bl_j = jnp.einsum('pi,pi->p', b[self.idx_j], lam[:, 1])
        sep = -bl_i - bl_j - self.ocfg.min_dis
        at_li = jnp.einsum('pij,pi->pj', a_mat[self.idx_i], lam[:, 0])
        nrm = 1.0 - jnp.sum(at_li ** 2, axis=-1)
        boxes = _box_residuals(xs, us, self.ocfg, self.vcfg)
        return jnp.concatenate([sep, nrm, lam.reshape(-1), boxes])

    def _to_staged(self, x):
        """Dense decision vector -> staged [T, b] (same variables)."""
        xs, us, lam = self._split(x)
        t = self.ocfg.horizon - 1
        return jnp.concatenate([
            jnp.moveaxis(xs[:, 1:], 1, 0).reshape(t, -1),
            jnp.moveaxis(us, 1, 0).reshape(t, -1),
            jnp.moveaxis(lam, 2, 0).reshape(t, -1)], axis=1)

    def _from_staged(self, w, init_state):
        t = self.ocfg.horizon - 1
        v, p = self.ocfg.num_veh, len(self.idx_i)
        xs_t = w[:, :5 * v].reshape(t, v, 5)
        us_t = w[:, 5 * v:7 * v].reshape(t, v, 2)
        lam_t = w[:, 7 * v:].reshape(t, p, 2, 4)
        xs = jnp.moveaxis(jnp.concatenate([init_state[None], xs_t], axis=0),
                          0, 1)                                  # [V, N, 5]
        return xs, jnp.moveaxis(us_t, 0, 1), jnp.moveaxis(lam_t, 0, 2)

    def _warm_start(self, ref_win):
        xs = ref_win.reshape(-1)
        us = jnp.zeros(self._sizes["u"], self.dtype)
        lam = jnp.full(self._sizes["lam"], 10.0, self.dtype)  # ref x0: 10
        return jnp.concatenate([xs, us, lam])

    def _shift_warm_impl(self, x_prev):
        """Shift the previous optimum one step (drop t=0, duplicate the
        tail) — the warm start for ``warm_mode='previous'``. The shifted
        tail state is advanced through the dynamics (instead of duplicated)
        so the warm start stays dynamics-feasible end to end."""
        xs, us, lam = self._split(x_prev)
        shift = lambda a, ax: jnp.concatenate(
            [jnp.take(a, jnp.arange(1, a.shape[ax]), axis=ax),
             jnp.take(a, jnp.asarray([a.shape[ax] - 1]), axis=ax)], axis=ax)
        xs_s, us_s = shift(xs, 1), shift(us, 1)
        tail = xs_s[:, -2] + self.vcfg.dt * bicycle_rhs(
            xs_s[:, -2], us_s[:, -1], self.vcfg)
        xs_s = xs_s.at[:, -1].set(tail)
        return jnp.concatenate([xs_s.reshape(-1), us_s.reshape(-1),
                                shift(lam, 2).reshape(-1)])

    def _solve_impl(self, init_state, step_idx, x_warm):
        n = self.ocfg.horizon
        ref_win = jax.lax.dynamic_slice_in_dim(self.refs, step_idx, n, axis=1)
        if self.use_staged:
            ssol = solve_staged(self._staged_nlp, self._to_staged(x_warm),
                                self._stage_params(init_state, ref_win),
                                self.scfg)
            xs, us, lam = self._from_staged(ssol.w, init_state)
            x_flat = jnp.concatenate([xs.reshape(-1), us.reshape(-1),
                                      lam.reshape(-1)])
            sol = NLPSolution(x=x_flat, y=jnp.zeros((0,), self.dtype),
                              z=jnp.zeros((0,), self.dtype),
                              s=jnp.zeros((0,), self.dtype),
                              kkt_error=ssol.kkt_error,
                              iterations=ssol.iterations,
                              converged=ssol.converged)
            return xs, us, lam, sol
        p = dict(init_state=init_state, ref_win=ref_win)
        sol = solve_nlp(self._nlp, x_warm, p, self.scfg)
        xs, us, lam = self._split(sol.x)
        return xs, us, lam, sol

    def solve_at(self, init_state, step_idx: int):
        """One joint solve with the reference warm start (the unit the MPC
        loop repeats; also the convenient single-solve test surface)."""
        n = self.ocfg.horizon
        ref_win = jax.lax.dynamic_slice_in_dim(
            self.refs, jnp.asarray(step_idx, jnp.int32), n, axis=1)
        return self._solve(jnp.asarray(init_state, self.dtype),
                           jnp.asarray(step_idx, jnp.int32),
                           self._warm_start(ref_win))

    def run_scan(self, n_steps: Optional[int] = None):
        """Whole MPC run as ONE jitted ``lax.scan`` over steps (VERDICT r3
        next #10): the (state, warm-start) carry stays on device, killing
        the per-step host dispatch of :meth:`run`. Identical trajectories
        to :meth:`run`; returns ``(states [n+1, V, 5], ctrls [n, V, 2],
        kkts [n], iters [n], convs [n])`` as host arrays.
        """
        ocfg = self.ocfg
        total = int(self.vcfg.T / self.vcfg.dt - ocfg.horizon)
        n_steps = total if n_steps is None else n_steps
        init_state = jnp.asarray(self.refs[:, 0, :], self.dtype)
        x_warm0 = self._warm_start(self.refs[:, :ocfg.horizon, :])

        def step(carry, k):
            st, xw = carry
            xs, us, lam, sol = self._solve_impl(st, k, xw)
            if self.warm_mode == "previous":
                xw_next = self._shift_warm_impl(sol.x)
            else:
                ref_win = jax.lax.dynamic_slice_in_dim(
                    self.refs, k + 1, ocfg.horizon, axis=1)
                xw_next = self._warm_start(ref_win)
            st_next = xs[:, 1, :]
            return (st_next, xw_next), (st_next, us[:, 0, :], sol.kkt_error,
                                        sol.iterations, sol.converged)

        if not hasattr(self, "_run_scan_jit"):
            self._run_scan_jit = jax.jit(
                lambda c0, ks: jax.lax.scan(step, c0, ks))
        _, (sts, cts, kkts, its, cvs) = self._run_scan_jit(
            (init_state, x_warm0), jnp.arange(n_steps, dtype=jnp.int32))
        states = np.concatenate([np.asarray(init_state)[None],
                                 np.asarray(sts)])
        return (states, np.asarray(cts), np.asarray(kkts), np.asarray(its),
                np.asarray(cvs))

    def run(self, n_steps: Optional[int] = None):
        """MPC loop (ref ``centralized_overtaking.py:21-56``): apply the
        optimizer's own next state as the plant update."""
        ocfg = self.ocfg
        total = int(self.vcfg.T / self.vcfg.dt - ocfg.horizon)
        n_steps = total if n_steps is None else n_steps
        init_state = np.asarray(self.refs[:, 0, :])
        ref0 = self.refs[:, :ocfg.horizon, :]
        x_warm = self._warm_start(ref0)
        states, controls, infos = [init_state], [], []
        for t in range(n_steps):
            xs, us, lam, sol = self._solve(jnp.asarray(init_state, self.dtype),
                                           jnp.asarray(t, jnp.int32), x_warm)
            if self.warm_mode == "previous":
                x_warm = self._shift_warm(sol.x)
            else:
                ref_win = self.refs[:, t + 1:t + 1 + ocfg.horizon, :]
                x_warm = self._warm_start(ref_win)
            init_state = np.asarray(xs[:, 1, :])
            states.append(init_state)
            controls.append(np.asarray(us[:, 0, :]))
            infos.append(dict(kkt=float(sol.kkt_error),
                              iters=int(sol.iterations),
                              converged=bool(sol.converged)))
        return np.stack(states), np.stack(controls), infos


# %% consensus-ADMM planner (C7, the flagship) --------------------------------


class BarState(NamedTuple):
    """The vehicle<->RSU exchange state (ref ``mid_state``
    ``decentralized/optimizer.py:351-373``). All tensors have leading
    vehicle axis; under a sharded mesh this is the all-gather payload.

    ``F = 5 + 4 (V-1)`` is the per-vehicle consensus width: 5 states plus a
    4-dual block per neighbour slot (slot k of vehicle i holds its OBCA duals
    against neighbour ``nbr[i, k]``). For the reference's V = 2 this is the
    9-wide Z of ``optimizer.py:250-257``.
    """

    z_bar: jnp.ndarray      # [V, N-1, F] edge consensus (states + lambda)
    a_mat: jnp.ndarray      # [V, N-1, 4, 2] broadcast halfspace normals
    b: jnp.ndarray          # [V, N-1, 4]
    lamb_bar: jnp.ndarray   # [V, N-1, F] ADMM duals
    lamb_ij: jnp.ndarray    # [V, V-1, N-1, 4] collision duals per nbr slot
    local_x: jnp.ndarray    # [V, N-1, 5] latest local states


# warm-start table for lamb_ij (ref optimizer.py:357-371 hard-codes this for
# the 2-vehicle overtaking scenario, N_horz = 8)
_LAMB_IJ_TABLE = np.array(
    [[[1.49, 0.566, 0.566, 1.49], [1.438, 0.514, 0.514, 1.438],
      [1.387, 0.462, 0.462, 1.387], [1.336, 0.411, 0.411, 1.336],
      [1.287, 0.361, 0.361, 1.287], [1.238, 0.312, 0.312, 1.238],
      [1.191, 0.263, 0.263, 1.191]],
     [[1.436] * 4, [1.325] * 4, [1.213] * 4, [1.1] * 4,
      [0.986] * 4, [0.871] * 4, [0.755] * 4]])


class ConsensusObcaPlanner:
    """Consensus-ADMM OBCA planner (the flagship), generalized to N vehicles.

    Ref ``decentralized/optimizer.py`` + ``decentralized_overtaking_ADMM.py``
    implement the 2-vehicle case; this class generalizes the decomposition to
    N vehicles with a **neighbour-slot layout**: vehicle i's local NLP carries
    a 4-wide OBCA dual block per neighbour slot k (neighbour ``nbr[i, k]``),
    its elastic separation slacks, and the per-vehicle consensus row
    S_i = (X_i, all dual blocks) coupled to the edge Z through the augmented
    Lagrangian. The edge/RSU solves one consensus NLP over Z = [V, N-1, F]
    (F = 5 + 4(V-1)) subject to the coupled pairing/separation constraints
    (6a-c) of every unordered pair. For ``num_veh == 2`` this is exactly the
    reference problem (slot 0 = the other vehicle, F = 9).

    One ADMM iteration = vmapped local NLPs -> bar-state broadcast -> edge
    consensus NLP -> dual ascent, all inside a single jitted
    ``lax.while_loop`` step (caps/thresholds from the reference:
    50 iterations, 0.01 residuals). Under a sharded vehicle mesh axis the
    local solves are embarrassingly parallel and the bar-state update is the
    all-gather payload (SURVEY.md §2.3).

    ``lamb_ij_mode``: ``'frozen'`` reproduces the reference exactly (the
    neighbour-dual update at ``optimizer.py:220`` is commented out, so the
    hard-coded warm-start table is used all run); ``'track_local'`` enables
    that commented-out update (neighbour duals follow the local solutions);
    ``'track_edge'`` (default) lets neighbours plan against the consensus
    certificates (see ``_mpc_step_impl``).

    ``gate_pairs``: collision-pair gating (the ``edge_mat`` idea of
    ``casadi/main.py:108-116`` applied to the OBCA line): pairs whose latest
    local trajectories never come within ``gate_thres`` get their coupled
    rows masked out of both the locals and the edge — constraints on far
    pairs are trivially satisfiable, so masking changes nothing at the
    optimum but removes their curvature from the Newton systems.
    """

    N_STATES, N_LAM = 5, 4

    def __init__(self, ocfg: ObcaConfig = ObcaConfig(),
                 vcfg: VehicleConfig = VehicleConfig(),
                 scfg: SolverConfig = SolverConfig(),
                 refs: Optional[np.ndarray] = None,
                 lamb_ij_mode: str = "track_edge",
                 dual_cfg: Optional["DualUpdateConfig"] = None,
                 local_warm_mode: str = "previous",
                 gate_pairs: bool = False, gate_thres: float = 10.0,
                 use_staged: bool = True, edge_mode: str = "staged",
                 lamb_bar_decay: float = 0.5,
                 lamb_ij_relax: float = 0.3,
                 lamb_ij_hysteresis: bool = False,
                 edge_prox: float = 0.0,
                 branch_commit: bool = False, commit_after: int = 6,
                 commit_w: float = 1000.0, local_prox: float = 0.0,
                 prox_after: int = 0, prox_growth: float = 1.0,
                 prox_adaptive: bool = False, prox_tau_max: float = 3.0e10,
                 dtype=jnp.float64):
        from .. import scenarios
        from ..config import DualStrategy, DualUpdateConfig, WindupMode
        from ..ops.pairs import pair_indices
        assert lamb_ij_mode in ("frozen", "track_local", "track_edge")
        self.ocfg, self.vcfg, self.scfg = ocfg, vcfg, scfg
        self.lamb_ij_mode = lamb_ij_mode
        # 'reference' re-warms locals from the ref trajectory every ADMM
        # iteration (the reference's behavior); 'previous' (default)
        # warm-starts from the previous iterate — measured 2.8x faster on
        # the 30-step overtaking run with identical safety metrics
        assert local_warm_mode in ("reference", "previous")
        self.local_warm_mode = local_warm_mode
        # dual update on lamb_bar: the reference uses plain ascent
        # (lambda_update optimizer.py:330-335); we default to plain ascent
        # PLUS saturation (the paper's anti-windup idea applied to the OBCA
        # consensus duals) — unbounded lamb_bar growth otherwise feeds back
        # through the edge objective and destabilizes late MPC steps
        self.dual_cfg = dual_cfg if dual_cfg is not None else DualUpdateConfig(
            strategy=DualStrategy.PLAIN, windup=WindupMode.SAT,
            windup_sat=20.0, adaptive_rho=False)
        self.dtype = dtype
        self.gate_pairs, self.gate_thres = gate_pairs, gate_thres
        if refs is None:
            refs = scenarios.ref_traj_overtake(vcfg, ocfg.num_veh)
        self.refs = jnp.asarray(refs, dtype)
        v, n = ocfg.num_veh, ocfg.horizon
        self.num_veh = v
        self.K = v - 1                                   # neighbour slots
        self.N_FULL = 5 + 4 * self.K                     # consensus width F
        # static index maps (numpy: metadata for gathers, not device data)
        self._nbr = np.array([[j for j in range(v) if j != i]
                              for i in range(v)])        # [V, K]
        # rev[i, k] = slot of vehicle i in the list of its k-th neighbour
        self._rev = np.array([[i if i < j else i - 1 for j in self._nbr[i]]
                              for i in range(v)])        # [V, K]
        self.idx_i, self.idx_j = pair_indices(v)          # P unordered pairs
        self._slot_i = self.idx_j - 1   # slot of j in i's list (i < j)
        self._slot_j = self.idx_i       # slot of i in j's list
        # pair id of (i, nbr[i, k]) for gathering pair masks to vehicle slots
        pid = np.zeros((v, v), dtype=np.int64)
        for p_, (a, bb) in enumerate(zip(self.idx_i, self.idx_j)):
            pid[a, bb] = pid[bb, a] = p_
        self._pair_id = pid[np.arange(v)[:, None], self._nbr]   # [V, K]
        # Elastic (l1 exact penalty) slack on the LOCAL separation rows (5a):
        # with stale neighbour data the hard constraint can be transiently
        # infeasible (penetration in the predicted horizon) — the reference
        # leans on IPOPT silently returning least-infeasible points
        # (optimizer.py:116-124); we relax explicitly with a weight that
        # dominates the tracking objective (q_state = 1e5), so above the
        # optimal multipliers the penalty is exact and reproduces the
        # hard-constraint solution. The pairing equalities (5b) stay HARD:
        # relaxing them breaks (5a)'s meaning (a pairing error eps turns into
        # a value error eps * |position|). They are feasible because in
        # track_edge mode lambda_ij carries ||A^T lambda|| <= 1 certificates
        # (see _edge_ci adding (4c), which the reference's edge omits).
        self.elastic_w = 1.0e7
        # strict-interior margin on the (4c) dual-norm bound the edge adds
        # (the reference's edge omits (4c) entirely, optimizer.py:259-283);
        # < 1.0 keeps exchanged certificates usable in the locals' hard
        # rows. Swept in tests/test_sensitivity.py.
        self.cert_norm_bound = 0.95
        self._loc_sizes = dict(x=5 * n, u=2 * (n - 1),
                               lam=self.K * 4 * (n - 1),
                               e=self.K * (n - 1))
        self._local_nlp = NLP(self._local_obj, self._local_ce, self._local_ci)
        self._edge_nlp = NLP(self._edge_obj, self._edge_ce, self._edge_ci)
        # structured variants (SURVEY §7.4): the local NLP's KKT is
        # block-tridiagonal under a time-major permutation; the edge NLP has
        # NO temporal coupling at all (objective and constraints are
        # per-step), so it splits into N-1 independent small NLPs — the
        # reference nevertheless hands IPOPT one joint edge problem
        # (optimizer.py:309-317); the split is exact, not an approximation.
        self.use_staged = use_staged
        # lamb_bar carry factor across MPC steps: 1.0 keeps the ADMM duals
        # (the reference's iterate_next_state shifts lamb_bar unchanged,
        # optimizer.py:341), 0.0 resets them each step, in between decays.
        # Default 0.5 (documented deviation, tuned round 3): a stale
        # saturated dual from a past conflict otherwise keeps forcing
        # consensus gaps long after the vehicles separated — measured on the
        # 42-step overtaking run: res_ok 30/42 (carry) vs 37/42 (0.5)
        self.lamb_bar_decay = float(lamb_bar_decay)
        # track_edge certificate relaxation: lamb_ij <- relax * edge_lam +
        # (1 - relax) * lamb_ij_prev. 1.0 adopts the consensus certificates
        # outright; < 1 damps the pass-left/pass-right branch flipping that
        # makes the hardest conflict-window steps oscillate (ADMM on this
        # nonconvex coupling has no convergence guarantee; damping the
        # exchanged certificates is the standard stabilizer)
        self.lamb_ij_relax = float(lamb_ij_relax)
        # freeze the track_edge certificate exchange on iterations where the
        # primal residual rose (limit-cycle breaker for the conflict window;
        # see _mpc_step_impl). Off by default pending A/B evidence.
        self.lamb_ij_hysteresis = bool(lamb_ij_hysteresis)
        # proximal regularization of the edge consensus NLP about the
        # previous iterate: + edge_prox/2 ||z - z_prev||^2 in the edge
        # objective. Damps the pass-side branch oscillation in the conflict
        # window (VERDICT r3 weak #6 candidate); 0 = reference semantics,
        # and the term vanishes at any fixed point (z = z_prev), so the
        # converged solution set is unchanged.
        self.edge_prox = float(edge_prox)
        # Branch commitment (the conflict-window limit-cycle breaker, round
        # 4): the pass-left/pass-right decision is the orientation of the
        # pair's relative displacement d_{p,t} = pos_i(z) - pos_j(z) — the
        # limit-cycle anatomy (tools/exp_limit_cycle.py) shows the lateral
        # ordering flipping 17-28 times in 50 capped iterations (while the
        # OBCA certificate direction stays pinned at the (4c) bound, so
        # committing THAT is a no-op — measured, tools/exp_branch_commit).
        # After ``commit_after`` ADMM iterations the current
        # (unit-normalized, non-degenerate) displacement directions are
        # FROZEN as d_bar and the edge objective gains
        # ``commit_w * relu(-<d(z), d_bar>)^2`` per (pair, t): a CONVEX
        # piecewise-quadratic in z, exactly zero on the committed branch
        # (the converged solution set there is unchanged), quadratically
        # repelling a flip to the opposite halfspace. The reference has no
        # such mechanism and caps on these steps
        # (decentralized_overtaking_ADMM.py:86-90); this is the "fix the
        # pass side once chosen" tie-break, scenario-agnostic (commits a
        # direction, not a lateral order).
        self.branch_commit = bool(branch_commit)
        self.commit_after = int(commit_after)
        self.commit_w = float(commit_w)
        # proximal damping of the LOCAL solves about their previous iterate
        # (+ local_prox/2 ||x - x_prev||^2): the locals are the
        # alternating-best-response overshooter in the conflict-window
        # limit cycle (their y output flips in lockstep with the railed
        # lamb_bar); 0 = reference semantics, and the term vanishes at any
        # fixed point, so the converged solution set is unchanged.
        # ``prox_after`` delays it: iterations < prox_after run undamped
        # (tau enters the solves as a runtime parameter, so the delayed
        # schedule costs no extra compilation), keeping fast steps fast
        # while the conflict-window steps get the damping that converges
        # them (measured on the step-27 limit cycle: tau=1000 takes the
        # 50-cap primal residual from 62 to 0.03).
        self.local_prox = float(local_prox)
        self.prox_after = int(prox_after)
        # anneal the prox weight UP within a step: tau_k = local_prox *
        # prox_growth^(k - prox_after). With growth > 1 the iteration is a
        # proximal-point scheme with increasing regularization — iterate
        # changes are forced to zero, so the primal residual crosses any
        # threshold in bounded iterations, and it lands on a point whose
        # consensus gap (the dual residual) the un-annealed phase already
        # closed. Measured on the step-27 limit cycle: tau=1000 alone
        # floors at primal ~0.02-0.1 (inner-solver jitter); growth breaks
        # the floor.
        self.prox_growth = float(prox_growth)
        # clamp for BOTH tau schedules (scheduled anneal and adaptive
        # ratchet): unclamped, the scheduled path reaches ~9e11 at the
        # 50-iteration cap, and the prox term then swamps the q_state=1e5
        # objective scale and destroys KKT conditioning (ADVICE r4; in f32
        # it breaks the solves outright). Default 3e10 sits ABOVE the
        # measured f64 converged profile's max tau (1.7e10 at iteration 42,
        # tools/exp_conflict_window.py) so nominal dynamics are untouched
        # while the pathological tail is cut; f32 runs pass 1e9 (measured:
        # larger tau breaks the f32 staged solves outright, while 1e9 keeps
        # the equilibrated block-Thomas solves accurate).
        self.prox_tau_max = float(prox_tau_max)
        # adaptive ratchet variant: instead of growing tau with the
        # iteration count, HOLD tau at local_prox while the primal residual
        # falls (converging steps feel only the mild base damping) and
        # multiply it by prox_growth whenever the residual RISES (the
        # limit-cycle signature). Oscillating steps ratchet themselves into
        # the contraction regime; smooth steps never pay for it.
        self.prox_adaptive = bool(prox_adaptive)
        assert edge_mode in ("joint", "per_step", "staged")
        self.edge_mode = edge_mode
        self._local_staged = StagedNLP(self._loc_stage_f,
                                       self._loc_stage_ce_link,
                                       self._loc_stage_ce,
                                       self._loc_stage_ci)
        self._edge_nlp_t = NLP(self._edge_obj_t, self._edge_ce_t,
                               self._edge_ci_t)
        self._edge_staged = StagedNLP(self._edge_stage_f,
                                      self._edge_stage_ce_link,
                                      self._edge_stage_ce,
                                      self._edge_stage_ci)
        self._mpc_step = jax.jit(self._mpc_step_impl)

    # -- local problem (ref optimizer.py:40-201) -------------------------

    def _loc_split(self, x):
        n = self.ocfg.horizon
        s = self._loc_sizes
        o1 = s["x"]
        o2 = o1 + s["u"]
        o3 = o2 + s["lam"]
        xs = x[:o1].reshape(n, 5)
        us = x[o1:o2].reshape(n - 1, 2)
        lam = x[o2:o3].reshape(self.K, n - 1, 4)
        e = x[o3:].reshape(self.K, n - 1)
        return xs, us, lam, e

    def _s_full(self, xs, lam):
        """Consensus row S = (X_t, lambda blocks) per step: [N-1, F]."""
        n = self.ocfg.horizon
        lam_flat = jnp.moveaxis(lam, 0, 1).reshape(n - 1, 4 * self.K)
        return jnp.concatenate([xs[1:], lam_flat], axis=-1)

    def _local_obj(self, x, p):
        """Tracking + effort + AL (ref ``local_generate_object``
        ``optimizer.py:150-168``): obj += lamb_bar^T S + rho/2 ||S - Z||^2
        with S = (X_t, lambda_t)."""
        xs, us, lam, e = self._loc_split(x)
        err = xs[1:] - p["ref_win"][1:]
        obj = (self.ocfg.r_ctrl * jnp.sum(us ** 2)
               + self.ocfg.q_state * jnp.sum(err ** 2))
        s_full = self._s_full(xs, lam)                         # [N-1, F]
        obj += jnp.sum(p["lamb_bar"] * s_full)
        obj += p["rho"] / 2 * jnp.sum((s_full - p["z_bar"]) ** 2)
        obj += self.elastic_w * jnp.sum(e)
        if self.local_prox:
            obj += p["prox_tau"] / 2 * jnp.sum((x - p["x_prev"]) ** 2)
        return obj

    def _local_ce(self, x, p):
        """Init + dynamics + (5b) pairing equalities per neighbour slot
        (ref ``local_generate_constrain`` ``optimizer.py:84-124``)."""
        xs, us, lam, _ = self._loc_split(x)
        dyn = _dyn_residual(xs, us, p["init_state"], self.vcfg)
        a_self, _ = halfspaces(xs[1:], self.vcfg,
                               self.ocfg.use_delay_tightening)
        at_l = jnp.einsum('tij,kti->ktj', a_self, lam)          # [K, N-1, 2]
        other = jnp.einsum('ktij,kti->ktj', p["other_a"], p["other_lij"])
        pairing = p["mask"][:, None, None] * (at_l + other)
        return jnp.concatenate([dyn, pairing.reshape(-1)])

    def _local_ci(self, x, p):
        """(5a) separation (elastic) per slot, (4c) dual norm, lambda >= 0,
        e >= 0, boxes. Masked-out slots get trivially-satisfied rows."""
        xs, us, lam, e = self._loc_split(x)
        a_self, b_self = halfspaces(xs[1:], self.vcfg,
                                    self.ocfg.use_delay_tightening)
        sep = (-jnp.einsum('ti,kti->kt', b_self, lam)
               - jnp.einsum('kti,kti->kt', p["other_b"], p["other_lij"])
               - self.ocfg.min_dis + e)
        sep = p["mask"][:, None] * sep + (1.0 - p["mask"][:, None])
        at_l = jnp.einsum('tij,kti->ktj', a_self, lam)
        nrm = 1.0 - jnp.sum(at_l ** 2, axis=-1)                 # [K, N-1]
        boxes = _box_residuals(xs, us, self.ocfg, self.vcfg)
        return jnp.concatenate([sep.reshape(-1), nrm.reshape(-1),
                                lam.reshape(-1), e.reshape(-1), boxes])

    # -- staged (block-tridiagonal) local form (SURVEY §7.4) ---------------
    # Stage k = 0..N-2 holds w_k = [x_{k+1} (5) | u_k (2) | lam[:, k, :]
    # (4K) | e[:, k] (K)]; dynamics are the only stage-coupling rows.

    def _loc_stage_split(self, w):
        k = self.K
        xs = w[:5]
        us = w[5:7]
        lam = w[7:7 + 4 * k].reshape(k, 4)
        e = w[7 + 4 * k:]
        return xs, us, lam, e

    def _loc_to_staged(self, x):
        xs, us, lam, e = self._loc_split(x)
        t = self.ocfg.horizon - 1
        return jnp.concatenate([
            xs[1:], us, jnp.moveaxis(lam, 1, 0).reshape(t, 4 * self.K),
            jnp.moveaxis(e, 1, 0)], axis=1)

    def _loc_from_staged(self, w, init_state):
        t = self.ocfg.horizon - 1
        k = self.K
        xs = jnp.concatenate([init_state[None], w[:, :5]], axis=0)
        us = w[:, 5:7]
        lam = jnp.moveaxis(w[:, 7:7 + 4 * k].reshape(t, k, 4), 0, 1)
        e = jnp.moveaxis(w[:, 7 + 4 * k:], 1, 0)
        return jnp.concatenate([xs.reshape(-1), us.reshape(-1),
                                lam.reshape(-1), e.reshape(-1)])

    def _loc_stage_f(self, w, pk):
        xs, us, lam, e = self._loc_stage_split(w)
        obj = (self.ocfg.r_ctrl * jnp.sum(us ** 2)
               + self.ocfg.q_state * jnp.sum((xs - pk["ref"]) ** 2))
        s_full = jnp.concatenate([xs, lam.reshape(-1)])
        obj += pk["lamb_bar"] @ s_full
        obj += pk["rho"] / 2 * jnp.sum((s_full - pk["z_bar"]) ** 2)
        obj += self.elastic_w * jnp.sum(e)
        if self.local_prox:
            obj += pk["prox_tau"] / 2 * jnp.sum((w - pk["w_prev"]) ** 2)
        return obj

    def _loc_stage_ce_link(self, w_prev, w, pk):
        xs, us, _, _ = self._loc_stage_split(w)
        xp = jnp.where(pk["first"] > 0, pk["init"],
                       self._loc_stage_split(w_prev)[0])
        return xs - (xp + self.vcfg.dt * bicycle_rhs(xp, us, self.vcfg))

    def _loc_stage_ce(self, w, pk):
        xs, _, lam, _ = self._loc_stage_split(w)
        a_self, _ = halfspaces(xs, self.vcfg,
                               self.ocfg.use_delay_tightening)
        at_l = jnp.einsum('ij,ki->kj', a_self, lam)             # [K, 2]
        other = jnp.einsum('kij,ki->kj', pk["other_a"], pk["other_lij"])
        return (pk["mask"][:, None] * (at_l + other)).reshape(-1)

    def _loc_stage_ci(self, w, pk):
        xs, us, lam, e = self._loc_stage_split(w)
        a_self, b_self = halfspaces(xs, self.vcfg,
                                    self.ocfg.use_delay_tightening)
        sep = (-jnp.einsum('i,ki->k', b_self, lam)
               - jnp.einsum('ki,ki->k', pk["other_b"], pk["other_lij"])
               - self.ocfg.min_dis + e)
        sep = pk["mask"] * sep + (1.0 - pk["mask"])
        at_l = jnp.einsum('ij,ki->kj', a_self, lam)
        nrm = 1.0 - jnp.sum(at_l ** 2, axis=-1)
        boxes = _box_residuals(xs, us, self.ocfg, self.vcfg)
        return jnp.concatenate([sep, nrm, lam.reshape(-1), e, boxes])

    def _local_staged_params(self, bs: BarState, init_state, ref_win, rho,
                             mask_veh):
        """Per-(vehicle, stage) parameter pytree for the staged local solves
        (same payload as :meth:`_local_params`, time-major per stage)."""
        v, n = self.num_veh, self.ocfg.horizon
        t = n - 1
        first = jnp.zeros((t,), self.dtype).at[0].set(1.0)
        return dict(
            first=jnp.broadcast_to(first, (v, t)),
            init=jnp.broadcast_to(init_state[:, None, :], (v, t, 5)),
            ref=ref_win[:, 1:, :],                              # [V, T, 5]
            z_bar=bs.z_bar,
            lamb_bar=bs.lamb_bar,
            other_a=jnp.moveaxis(bs.a_mat[self._nbr], 2, 1),    # [V, T, K, 4, 2]
            other_b=jnp.moveaxis(bs.b[self._nbr], 2, 1),
            other_lij=jnp.moveaxis(bs.lamb_ij[self._nbr, self._rev], 2, 1),
            mask=jnp.broadcast_to(mask_veh[:, None, :], (v, t, self.K)),
            rho=jnp.broadcast_to(rho, (v, t)))

    # -- edge problem (ref optimizer.py:239-328) -------------------------

    def _edge_split(self, x):
        n = self.ocfg.horizon
        return x.reshape(self.num_veh, n - 1, self.N_FULL)

    def _edge_lam(self, z):
        """Per-vehicle per-slot duals from the consensus row: [V, K, N-1, 4]."""
        n = self.ocfg.horizon
        lam = z[:, :, 5:].reshape(self.num_veh, n - 1, self.K, 4)
        return jnp.moveaxis(lam, 1, 2)

    def _edge_obj(self, x, p):
        """obj = -sum_i Z_i lamb_bar_i + rho/2 sum_i ||local_fullx_i - Z_i||^2
        (ref ``edge_generate_object`` ``optimizer.py:297-307``).

        NO elastic slack here: the edge owns its states, so (6c) is always
        satisfiable by moving z apart — and an elastic slack would create a
        spurious degenerate KKT attractor (lambda = 0, e = min_dis) that the
        barrier walks into from any warm start."""
        z = self._edge_split(x)
        obj = -jnp.sum(z * p["lamb_bar"])
        obj += p["rho"] / 2 * jnp.sum((p["local_fullx"] - z) ** 2)
        if self.edge_prox:
            obj += self.edge_prox / 2 * jnp.sum((z - p["z_prev"]) ** 2)
        if self.branch_commit:
            d = z[self.idx_i, :, :2] - z[self.idx_j, :, :2]  # [P, N-1, 2]
            dot = jnp.sum(d * p["d_bar"], axis=-1)
            obj += self.commit_w * jnp.sum(jax.nn.relu(-dot) ** 2)
        return obj

    def _edge_halfspaces(self, z):
        return halfspaces(z[:, :, :5], self.vcfg,
                          self.ocfg.use_delay_tightening)

    def _edge_ce(self, x, p):
        """(6b): A(z_i)^T l_i^(j) + A(z_j)^T l_j^(i) = 0 per unordered pair
        (ref ``edge_generate_constrain`` ``optimizer.py:259-279``)."""
        z = self._edge_split(x)
        a_mat, _ = self._edge_halfspaces(z)
        lam = self._edge_lam(z)                                # [V, K, N-1, 4]
        at_l = jnp.einsum('vtij,vkti->vktj', a_mat, lam)       # [V, K, N-1, 2]
        rows = (at_l[self.idx_i, self._slot_i]
                + at_l[self.idx_j, self._slot_j])              # [P, N-1, 2]
        rows = p["pair_mask"][:, None, None] * rows
        return rows.reshape(-1)

    def _edge_ci(self, x, p):
        """(6c) separation >= min_dis per pair (hard); (4c) dual-norm bound;
        z-state box; lambda >= 0.

        The reference's edge omits the (4c) norm bound (``optimizer.py:
        259-283``), letting z-lambda scale arbitrarily; we add it (at 0.95,
        not 1.0) so the exchanged certificates are strictly-interior usable
        in the locals' hard (5b) + (4c) constraints (track_edge mode)."""
        z = self._edge_split(x)
        a_mat, b = self._edge_halfspaces(z)
        lam = self._edge_lam(z)
        bl = jnp.einsum('vti,vkti->vkt', b, lam)               # [V, K, N-1]
        sep = (-bl[self.idx_i, self._slot_i]
               - bl[self.idx_j, self._slot_j] - self.ocfg.min_dis)
        sep = p["pair_mask"][:, None] * sep + (1.0 - p["pair_mask"][:, None])
        at_l = jnp.einsum('vtij,vkti->vktj', a_mat, lam)
        nrm = self.cert_norm_bound ** 2 - jnp.sum(at_l ** 2, axis=-1)  # [V, K, N-1]
        zs = z[:, :, :5]
        box = jnp.concatenate([(zs + 1000.0).reshape(-1),
                               (1000.0 - zs).reshape(-1)])
        return jnp.concatenate([sep.reshape(-1), nrm.reshape(-1),
                                z[:, :, 5:].reshape(-1), box])

    # -- per-step edge form (exact split: no temporal coupling) ------------

    def _edge_lam_t(self, z):
        """[V, F] one-step consensus row -> [V, K, 4] duals."""
        return z[:, 5:].reshape(self.num_veh, self.K, 4)

    # staged edge: stage = horizon step, NO link rows (the edge problem is
    # temporally separable) — block-DIAGONAL KKT solved exactly per block,
    # but ONE shared line search / barrier across all steps. Independent
    # per-step solves (edge_mode='per_step') can pick inconsistent branches
    # of this nonconvex problem on adjacent steps (jagged certificates that
    # make the locals' hard (5b) rows infeasible); the shared globalization
    # keeps the step coherent like the reference's joint IPOPT solve.
    def _edge_stage_f(self, w, pk):
        return self._edge_obj_t(w, pk)

    def _edge_stage_ce_link(self, w_prev, w, pk):
        return jnp.zeros((0,), w.dtype)

    def _edge_stage_ce(self, w, pk):
        return self._edge_ce_t(w, pk)

    def _edge_stage_ci(self, w, pk):
        return self._edge_ci_t(w, pk)

    def _edge_obj_t(self, x, p):
        z = x.reshape(self.num_veh, self.N_FULL)
        obj = (-jnp.sum(z * p["lamb_bar"])
               + p["rho"] / 2 * jnp.sum((p["local_fullx"] - z) ** 2))
        if self.edge_prox:
            obj += self.edge_prox / 2 * jnp.sum((z - p["z_prev"]) ** 2)
        if self.branch_commit:
            d = z[self.idx_i, :2] - z[self.idx_j, :2]      # [P, 2]
            dot = jnp.sum(d * p["d_bar"], axis=-1)
            obj += self.commit_w * jnp.sum(jax.nn.relu(-dot) ** 2)
        return obj

    def _edge_ce_t(self, x, p):
        z = x.reshape(self.num_veh, self.N_FULL)
        a_mat, _ = halfspaces(z[:, :5], self.vcfg,
                              self.ocfg.use_delay_tightening)
        at_l = jnp.einsum('vij,vki->vkj', a_mat, self._edge_lam_t(z))
        rows = (at_l[self.idx_i, self._slot_i]
                + at_l[self.idx_j, self._slot_j])               # [P, 2]
        return (p["pair_mask"][:, None] * rows).reshape(-1)

    def _edge_ci_t(self, x, p):
        z = x.reshape(self.num_veh, self.N_FULL)
        a_mat, b = halfspaces(z[:, :5], self.vcfg,
                              self.ocfg.use_delay_tightening)
        lam = self._edge_lam_t(z)
        bl = jnp.einsum('vi,vki->vk', b, lam)
        sep = (-bl[self.idx_i, self._slot_i]
               - bl[self.idx_j, self._slot_j] - self.ocfg.min_dis)
        sep = p["pair_mask"] * sep + (1.0 - p["pair_mask"])
        at_l = jnp.einsum('vij,vki->vkj', a_mat, lam)
        nrm = self.cert_norm_bound ** 2 - jnp.sum(at_l ** 2, axis=-1)
        zs = z[:, :5]
        box = jnp.concatenate([(zs + 1000.0).reshape(-1),
                               (1000.0 - zs).reshape(-1)])
        return jnp.concatenate([sep, nrm.reshape(-1), z[:, 5:].reshape(-1),
                                box])

    # -- bar-state plumbing ----------------------------------------------

    def _facing_certificates(self, ref0):
        """Unit-weight facing-face separating duals per (vehicle, slot):
        [V, K, N-1, 4], scaled to norm 0.95 (see ``create_bar_state``)."""
        d = self.dtype
        a0, _ = halfspaces(ref0, self.vcfg, self.ocfg.use_delay_tightening)
        pos = ref0[:, :, :2]                                   # [V, N-1, 2]
        c_dir = pos[self._nbr] - pos[:, None]                  # [V, K, N-1, 2]
        c_dir = c_dir / jnp.maximum(
            jnp.linalg.norm(c_dir, axis=-1, keepdims=True), 1e-9)
        align = jnp.einsum('vtij,vktj->vkti', a0, c_dir)       # [V, K, N-1, 4]
        return self.cert_norm_bound * jax.nn.one_hot(jnp.argmax(align, -1), 4,
                                              dtype=d)

    def _zip_z(self, local_x, lamb_ij):
        """Pack (states [V, N-1, 5], duals [V, K, N-1, 4]) into Z [V, N-1, F]."""
        n = self.ocfg.horizon
        lam_flat = jnp.moveaxis(lamb_ij, 1, 2).reshape(
            self.num_veh, n - 1, 4 * self.K)
        return jnp.concatenate([local_x, lam_flat], axis=-1)

    def create_bar_state(self) -> BarState:
        """Initial exchange state.

        The reference zero-initializes A/b (``mid_state`` ``optimizer.py:
        353-355``), which makes the very first local NLP *infeasible*
        (-b^T lambda >= d_min with A^T lambda = 0 has no solution when
        b = 0); IPOPT silently returns a least-infeasible point and the loop
        recovers. We instead seed A/b/local_x from the reference-trajectory
        window — the state every vehicle already knows — so iteration 1 is
        well-posed (documented deviation; converged behavior is unchanged).
        """
        v, n = self.num_veh, self.ocfg.horizon
        d = self.dtype
        ref0 = self.refs[:, 1:n, :]                      # [V, N-1, 5]
        a0, b0 = halfspaces(ref0, self.vcfg, self.ocfg.use_delay_tightening)
        if self.lamb_ij_mode == "track_edge":
            # proper facing-face certificates from the initial geometry: unit
            # weight on each vehicle's face whose outward normal aligns with
            # the centre-to-centre direction — an exact separating dual pair
            # for the aligned reference states. (The reference instead ships
            # a hard-coded table, optimizer.py:357-371, whose degenerate
            # second column makes the first local solves infeasible.)
            # Scaled to norm 0.95: certificates at the (4c) boundary
            # ||A^T lam|| = 1 would leave the local problem with an empty
            # strict interior (5b forces the norm exactly), which an
            # interior-point method cannot handle.
            lamb_ij = self._facing_certificates(ref0)
        elif v == 2 and n == 8:
            lamb_ij = jnp.asarray(_LAMB_IJ_TABLE, d)[:, None]
        else:
            lamb_ij = 1e-3 * jnp.ones((v, self.K, n - 1, 4), d)
        return BarState(
            z_bar=self._zip_z(ref0, lamb_ij),
            a_mat=a0,
            b=b0,
            lamb_bar=1e-3 * jnp.ones((v, n - 1, self.N_FULL), d),
            lamb_ij=lamb_ij,
            local_x=ref0)

    def shift_bar_state(self, bs: BarState, batch_dims: int = 0) -> BarState:
        """Horizon warm-start shift (ref ``iterate_next_state``
        ``optimizer.py:337-344``): drop step 0, duplicate the tail.
        ``batch_dims`` extra leading axes (e.g. scenario) offset the shift
        axis — used by the SPMD step whose leaves carry a scenario block."""
        def shift(a, axis):
            axis += batch_dims
            sl = [slice(None)] * a.ndim
            sl[axis] = slice(1, None)
            tail = [slice(None)] * a.ndim
            tail[axis] = slice(-1, None)
            return jnp.concatenate([a[tuple(sl)], a[tuple(tail)]], axis=axis)
        return BarState(
            z_bar=shift(bs.z_bar, 1), a_mat=shift(bs.a_mat, 1),
            b=shift(bs.b, 1), lamb_bar=shift(bs.lamb_bar, 1),
            lamb_ij=shift(bs.lamb_ij, 2), local_x=shift(bs.local_x, 1))

    def _pair_proximity_mask(self, local_x):
        """[P] activity mask: pair within ``gate_thres`` anywhere in horizon."""
        pos = local_x[:, :, :2]
        di = pos[self.idx_i] - pos[self.idx_j]                 # [P, N-1, 2]
        d2 = jnp.sum(di ** 2, axis=-1)
        if not self.gate_pairs:
            return jnp.ones((len(self.idx_i),), self.dtype)
        return jnp.any(d2 < self.gate_thres ** 2, axis=-1).astype(self.dtype)

    def check_converge(self, bs: BarState, thres: float = 0.1):
        """Coupled-constraint satisfaction on the exchanged solution
        (ref ``check_converge`` ``optimizer.py:225-235``), all pairs."""
        at_l = jnp.einsum('vtij,vkti->vktj', bs.a_mat, bs.lamb_ij)
        eq = (at_l[self.idx_i, self._slot_i]
              + at_l[self.idx_j, self._slot_j])                # [P, N-1, 2]
        bl = jnp.einsum('vti,vkti->vkt', bs.b, bs.lamb_ij)
        sep = (-bl[self.idx_i, self._slot_i]
               - bl[self.idx_j, self._slot_j])                 # [P, N-1]
        return jnp.logical_and(jnp.all(jnp.abs(eq) <= thres),
                               jnp.all(sep >= self.ocfg.min_dis))

    # -- one MPC step -----------------------------------------------------

    def _local_warm_one(self, ref_i, p_i):
        """One vehicle's reference warm start (states = ref window, u = 0,
        lambda = 1 as in ``local_initialize`` ``optimizer.py:50-55``) plus
        elastic slacks set to the actual separation violation so the start
        point is feasible — a feasible interior start is what keeps the
        fixed-budget IP fast."""
        s = self._loc_sizes
        x0 = jnp.concatenate([
            ref_i.reshape(-1),
            jnp.zeros((s["u"],), self.dtype),
            jnp.ones((s["lam"],), self.dtype),
            jnp.zeros((s["e"],), self.dtype)])
        sep = self._local_ci(x0, p_i)[:s["e"]]
        e = jnp.maximum(-sep, 0.0) + 0.01
        return x0.at[-s["e"]:].set(e)

    def _local_warm(self, ref_win, p):
        """All-vehicle reference warm start (vmapped :meth:`_local_warm_one`)."""
        return jax.vmap(self._local_warm_one)(ref_win, p)

    def _local_params(self, bs: BarState, init_state, ref_win, rho, mask_veh):
        """Per-vehicle parameter pytree for the vmapped local solves.

        The neighbour gathers (``a_mat[nbr]``, ``lamb_ij[nbr, rev]``) are the
        TPU form of the reference's bar-state reads (``optimizer.py:107-118``):
        under a sharded vehicle axis they lower to the all-gather of the
        broadcast payload."""
        v = self.num_veh
        return dict(init_state=init_state,
                    ref_win=ref_win,
                    other_a=bs.a_mat[self._nbr],               # [V, K, ...]
                    other_b=bs.b[self._nbr],
                    other_lij=bs.lamb_ij[self._nbr, self._rev],
                    z_bar=bs.z_bar,
                    lamb_bar=bs.lamb_bar,
                    mask=mask_veh,
                    rho=jnp.broadcast_to(rho, (v,)))

    def _mpc_step_impl(self, init_state, bar_state_prev: BarState, step_idx):
        body, cond, c0 = self._admm_parts(init_state, bar_state_prev,
                                          step_idx)
        out = jax.lax.while_loop(cond, body, c0)
        return self._finish_mpc_step(out)

    def _mpc_step_fixed_impl(self, init_state, bar_state_prev: BarState,
                             step_idx):
        """The same MPC step as a FIXED-length ``lax.scan`` with
        freeze-on-done masking instead of a ``lax.while_loop``.

        Identical results to :meth:`_mpc_step_impl` (a done lane's carry is
        frozen exactly at its while-exit state); always executes
        ``max_admm_iters`` body evaluations. Exists for the scenario-batched
        TPU path: the v5e toolchain compiles a vmapped while_loop of this
        body pathologically slowly (>20 min for S=16, sometimes crashing
        the worker), while the scan form compiles fine; on a batch the
        while_loop executes max-over-lanes trips anyway, so the scan's
        fixed cost is close to the batched-while cost in the conflict
        window.
        """
        body, _, c0 = self._admm_parts(init_state, bar_state_prev, step_idx)

        def scan_body(c, _):
            c2 = body(c)
            stop = jnp.logical_or(c["done"],
                                  c["it"] >= self.ocfg.max_admm_iters)
            return jax.tree.map(
                lambda old, new: jnp.where(stop, old, new), c, c2), None

        out, _ = jax.lax.scan(scan_body, c0, None,
                              length=self.ocfg.max_admm_iters)
        return self._finish_mpc_step(out)

    def mpc_step_trace(self, init_state, bar_state_prev: BarState, step_idx,
                       n_iters: int):
        """Debug/observability surface: run EXACTLY ``n_iters`` ADMM
        iterations of one MPC step (no early exit) and return the
        per-iteration history ``dict(primal, dual, nlp_ok, zy_gap)`` plus
        the final carry — the tool for watching the conflict-window limit
        cycle (SURVEY §5 tracing; tools/exp_limit_cycle.py)."""
        body, _, c0 = self._admm_parts(init_state, bar_state_prev, step_idx)

        def scan_body(c, _):
            c2 = body(c)
            zy = c2["bs"].z_bar[:, :, 1]          # [V, N-1] consensus y
            a_e, _ = self._edge_halfspaces(c2["bs"].z_bar)
            at_le = jnp.einsum('vtij,vkti->vktj', a_e,
                               self._edge_lam(c2["bs"].z_bar))
            d_now = at_le[self.idx_i, self._slot_i]
            rec = dict(primal=c2["primal"], dual=c2["dual"], gap=c2["gap"],
                       nlp_ok=c2["nlp_ok"], nlp_kkt=c2["nlp_kkt"],
                       zy_gap=jnp.mean(zy[0] - zy[1]) if self.num_veh == 2
                       else jnp.asarray(0.0, self.dtype),
                       d_nrm=jnp.mean(jnp.linalg.norm(d_now, axis=-1)))
            return c2, rec
        out, hist = jax.lax.scan(scan_body, c0, None, length=n_iters)
        return out, hist

    def _finish_mpc_step(self, out):
        """MPC advance from the converged/capped ADMM carry
        (driver :99-102)."""
        next_state = out["xs"][:, 1, :]
        converged_flag = self.check_converge(out["bs"])
        if self.lamb_bar_decay != 1.0:
            out["bs"] = out["bs"]._replace(
                lamb_bar=self.lamb_bar_decay * out["bs"].lamb_bar)
        return (next_state, self.shift_bar_state(out["bs"]), out["it"],
                out["primal"], out["dual"], converged_flag,
                out["nlp_ok"], out["nlp_kkt"], out["gap"])

    def _admm_parts(self, init_state, bar_state_prev: BarState, step_idx):
        """Build (body, cond, c0) of one MPC step's ADMM loop; shared by
        :meth:`_mpc_step_impl` (while_loop) and :meth:`mpc_step_trace`
        (fixed-length scan)."""
        ocfg = self.ocfg
        v, n = self.num_veh, ocfg.horizon
        ref_win = jax.lax.dynamic_slice_in_dim(
            self.refs, step_idx, n, axis=1)               # [V, N, 5]
        rho = jnp.asarray(ocfg.rho, self.dtype)

        def masks_from(bs):
            pair_mask = self._pair_proximity_mask(bs.local_x)
            mask_veh = pair_mask[self._pair_id]            # [V, K]
            return pair_mask, mask_veh

        def local_solve(bs: BarState, x_prev, mask_veh, prox_tau):
            p = self._local_params(bs, init_state, ref_win, rho, mask_veh)
            if self.local_prox:
                p["x_prev"] = x_prev
                p["prox_tau"] = jnp.broadcast_to(prox_tau, (v,))
            if self.local_warm_mode == "previous":
                x0 = x_prev
            else:
                # reference semantics: re-initialize from the reference
                # trajectory every iteration (local_initialize :50-55)
                x0 = self._local_warm(ref_win, p)
            if self.use_staged:
                sp = self._local_staged_params(bs, init_state, ref_win, rho,
                                               mask_veh)
                if self.local_prox:
                    sp["w_prev"] = jax.vmap(self._loc_to_staged)(x_prev)
                    t_ = self.ocfg.horizon - 1
                    sp["prox_tau"] = jnp.broadcast_to(prox_tau, (v, t_))
                lsol = jax.vmap(lambda ww, pp: solve_staged(
                    self._local_staged, ww, pp, self.scfg))(
                        jax.vmap(self._loc_to_staged)(x0), sp)
                x_out = jax.vmap(self._loc_from_staged)(lsol.w, init_state)
            else:
                lsol = jax.vmap(lambda xx, pp: solve_nlp(
                    self._local_nlp, xx, pp, self.scfg))(x0, p)
                x_out = lsol.x
            xs, us, lam, _ = jax.vmap(self._loc_split)(x_out)
            health = (jnp.mean(lsol.converged.astype(self.dtype)),
                      jnp.max(lsol.kkt_error))
            return xs, us, lam, x_out, health

        def body(c):
            bs = c["bs"]
            pair_mask, mask_veh = masks_from(bs)
            if self.prox_adaptive:
                prox_tau = c["prox_tau"]
            else:
                k_eff = jnp.maximum(c["it"] - self.prox_after, 0)
                prox_tau = jnp.where(
                    c["it"] >= self.prox_after,
                    jnp.minimum(
                        self.local_prox
                        * self.prox_growth ** k_eff.astype(self.dtype),
                        self.prox_tau_max),
                    0.0).astype(self.dtype)
            xs, us, lam, loc_x, loc_health = local_solve(bs, c["loc_x"],
                                             mask_veh, prox_tau)
            # bar_state_update (ref optimizer.py:205-222): broadcast
            # recomputed halfspaces + local states; lamb_ij per mode
            a_new, b_new = halfspaces(xs[:, 1:, :], self.vcfg,
                                      ocfg.use_delay_tightening)
            lamb_ij = lam if self.lamb_ij_mode == "track_local" else bs.lamb_ij
            bs = bs._replace(a_mat=a_new, b=b_new, local_x=xs[:, 1:, :],
                             lamb_ij=lamb_ij)

            # edge solve (ref optimizer.py:309-328). The reference inits the
            # edge NLP at zeros (edge_initialize :250) and relies on IPOPT's
            # robustness; we warm-start z at the previous consensus iterate
            # (smooth path), far better conditioned for the fixed-budget
            # solver — same optimum.
            local_fullx = self._zip_z(bs.local_x, bs.lamb_ij)
            t_ax = n - 1
            pe_t = dict(
                lamb_bar=jnp.moveaxis(bs.lamb_bar, 1, 0),
                local_fullx=jnp.moveaxis(local_fullx, 1, 0),
                rho=jnp.broadcast_to(rho, (t_ax,)),
                pair_mask=jnp.broadcast_to(pair_mask,
                                           (t_ax,) + pair_mask.shape))
            z0_t = jnp.moveaxis(bs.z_bar, 1, 0).reshape(t_ax, -1)
            if self.edge_prox:
                pe_t["z_prev"] = jnp.moveaxis(bs.z_bar, 1, 0)
            if self.branch_commit:
                pe_t["d_bar"] = jnp.moveaxis(c["d_bar"], 1, 0)  # [t, P, 2]
            if self.edge_mode == "staged":
                # block-diagonal staged solve: per-block exact factorization
                # + one shared globalization across steps (see _edge_stage_f)
                esol = solve_staged(self._edge_staged, z0_t, pe_t, self.scfg)
                z_bar = jnp.moveaxis(
                    esol.w.reshape(t_ax, v, self.N_FULL), 0, 1)
            elif self.edge_mode == "per_step":
                # fully independent tiny NLPs, vmapped (exact split, but can
                # lose branch coherence across steps — see _edge_stage_f)
                esol = jax.vmap(lambda zz, pp: solve_nlp(
                    self._edge_nlp_t, zz, pp, self.scfg))(z0_t, pe_t)
                z_bar = jnp.moveaxis(
                    esol.x.reshape(t_ax, v, self.N_FULL), 0, 1)
            else:
                pe = dict(lamb_bar=bs.lamb_bar, local_fullx=local_fullx,
                          rho=rho, pair_mask=pair_mask)
                if self.edge_prox:
                    pe["z_prev"] = bs.z_bar
                if self.branch_commit:
                    pe["d_bar"] = c["d_bar"]
                esol = solve_nlp(self._edge_nlp, bs.z_bar.reshape(-1), pe,
                                 self.scfg)
                z_bar = self._edge_split(esol.x)
            bs = bs._replace(z_bar=z_bar)
            d_bar = c["d_bar"]
            if self.branch_commit:
                # Freeze the pass SIDE on the commit iteration. The branch
                # variable is the sign of the pair's LATERAL gap — measured
                # at the capped steps (tools/exp_limit_cycle.py + the z
                # geometry probe): the consensus keeps the pair
                # longitudinally jammed at min_dis (x-gap -3.6 m constant,
                # certificate pinned down-lane at the (4c) bound) while the
                # y-gap flips sign nearly every iteration (+-0.3). So:
                # lateral axis = perpendicular of the lower-index vehicle's
                # heading (stable, never degenerate — unlike the pair mean
                # heading, which cancels head-on); ONE side per pair from
                # the horizon-sum of lateral gaps (per-t signs can disagree
                # mid-flip); exact tie breaks deterministically to +1
                # ("pass left" — the road-rules tie-break).
                th_i = z_bar[self.idx_i, :, 3]              # [P, N-1]
                lat = jnp.stack([-jnp.sin(th_i), jnp.cos(th_i)], axis=-1)
                d_now = (z_bar[self.idx_i, :, :2]
                         - z_bar[self.idx_j, :, :2])        # [P, N-1, 2]
                side_t = jnp.sum(d_now * lat, axis=-1)      # [P, N-1]
                s = jnp.where(jnp.sum(side_t, axis=-1, keepdims=True) >= 0.0,
                              1.0, -1.0)[..., None]         # [P, 1, 1]
                take = c["it"] + 1 == self.commit_after
                d_bar = jnp.where(take, s * lat, d_bar)
            if self.lamb_ij_mode == "track_edge":
                # neighbours plan against the CONSENSUS certificates: the
                # edge's z-lambda is forced non-degenerate by (6c) (value >=
                # d_min requires a genuine separating dual pair), whereas
                # local lambdas can collapse into the degenerate cone
                # (A^T lam = 0 rays give state-independent values and hence
                # zero avoidance force). Default mode; 'frozen'/'track_local'
                # reproduce the reference's exchanges.
                lam_e = self._edge_lam(z_bar)
                th = jnp.asarray(self.lamb_ij_relax, self.dtype)
                if self.lamb_ij_hysteresis:
                    # freeze the certificate exchange while the primal
                    # residual is rising: the conflict-window limit cycle is
                    # certificate-flip -> locals react -> residual jumps ->
                    # flip back; holding lamb_ij through the rise breaks the
                    # feedback (converged iterations are unaffected — there
                    # the residual is falling)
                    rising = c["primal"] > c["primal_prev"]
                    th = jnp.where(rising, 0.0, th)
                bs = bs._replace(
                    lamb_ij=th * lam_e + (1.0 - th) * bs.lamb_ij)

            # dual update on lamb_bar (ref lambda_update optimizer.py:330-335
            # is plain ascent, rho = 1; strategy/windup configurable — see
            # constructor): consensus error r = local_fullx - z_bar
            pos = bs.local_x[:, :, :2]
            d_min = jnp.min(jnp.linalg.norm(
                pos[self.idx_i] - pos[self.idx_j], axis=-1))
            cons_err = local_fullx - z_bar
            dual_new = update_dual(
                DualState(dual=bs.lamb_bar, sum_err=c["sum_err"],
                          diff_val=c["diff_val"],
                          rho=jnp.asarray(
                              ocfg.rho if ocfg.dual_rho is None
                              else ocfg.dual_rho, self.dtype)),
                cons_err, d_min, self.dual_cfg)
            bs = bs._replace(lamb_bar=dual_new.dual)
            # ACTUAL consensus gap ||local - z||_1 (ADVICE r4): the primal/
            # dual residuals below are CHANGE-based (matching the reference's
            # definitions, driver :82-90) and can read ~0 at a frozen
            # (annealed-prox) or dual-railed point that is NOT at consensus;
            # this is the un-fakeable companion metric, reported per step and
            # gated in tests/bench alongside them.
            gap = jnp.sum(jnp.abs(cons_err))

            # residuals (ref driver decentralized_overtaking_ADMM.py:82-90):
            # l1-ish norms of the control / lamb_bar deltas. The dual delta
            # is normalized by the dual step size so it measures the actual
            # consensus gap ||local - z||_1 independent of rho — at the
            # reference's rho = 1 the two definitions coincide, at rho >> 1
            # the unnormalized delta would demand a gap 1/rho times smaller
            primal = jnp.sum(jnp.abs(us - c["us_prev"]))
            dual = (jnp.sum(jnp.abs(bs.lamb_bar - c["lamb_prev"]))
                    / jnp.maximum(dual_new.rho, 1.0))
            # threshold scaling for V > 2 (config.thres_per_veh): the
            # 0.01 values gate V-vehicle SUMS tuned at V=2
            t_scale = (self.num_veh / 2.0) if ocfg.thres_per_veh else 1.0
            done = jnp.logical_and(primal <= ocfg.primal_thres * t_scale,
                                   dual <= ocfg.dual_thres * t_scale)
            # solver health of THIS iteration (observability: fraction of
            # local/edge NLPs converged + worst KKT error — SURVEY §5 asks
            # for runtime self-checks; these expose fixed-budget solve
            # failures the reference's IPOPT prints would have shown)
            edge_conv = jnp.mean(esol.converged.astype(self.dtype))
            edge_kkt = jnp.max(esol.kkt_error)
            nlp_ok = jnp.stack([loc_health[0], edge_conv])
            nlp_kkt = jnp.stack([loc_health[1], edge_kkt])
            tau_next = prox_tau
            if self.prox_adaptive:
                tau_next = jnp.minimum(
                    jnp.where(primal > c["primal"],
                              prox_tau * self.prox_growth, prox_tau),
                    self.prox_tau_max).astype(self.dtype)
            return dict(bs=bs, us_prev=us, lamb_prev=bs.lamb_bar, xs=xs,
                        loc_x=loc_x, nlp_ok=nlp_ok, nlp_kkt=nlp_kkt,
                        sum_err=dual_new.sum_err, diff_val=dual_new.diff_val,
                        it=c["it"] + 1, done=done, primal=primal, dual=dual,
                        gap=gap, primal_prev=c["primal"], d_bar=d_bar,
                        prox_tau=tau_next)

        def cond(c):
            return jnp.logical_and(jnp.logical_not(c["done"]),
                                   c["it"] < ocfg.max_admm_iters)

        zeros_f = jnp.zeros((v, n - 1, self.N_FULL), self.dtype)
        _, mask_veh0 = masks_from(bar_state_prev)
        p_init = self._local_params(bar_state_prev, init_state, ref_win, rho,
                                    mask_veh0)
        c0 = dict(bs=bar_state_prev,
                  us_prev=jnp.zeros((v, n - 1, 2), self.dtype),
                  lamb_prev=bar_state_prev.lamb_bar,
                  xs=jnp.broadcast_to(ref_win, (v, n, 5)),
                  loc_x=self._local_warm(ref_win, p_init),
                  sum_err=zeros_f, diff_val=zeros_f,
                  it=jnp.asarray(0, jnp.int32), done=jnp.asarray(False),
                  nlp_ok=jnp.ones((2,), self.dtype),
                  nlp_kkt=jnp.zeros((2,), self.dtype),
                  primal=jnp.asarray(jnp.inf, self.dtype),
                  primal_prev=jnp.asarray(jnp.inf, self.dtype),
                  dual=jnp.asarray(jnp.inf, self.dtype),
                  gap=jnp.asarray(jnp.inf, self.dtype),
                  d_bar=jnp.zeros((len(self.idx_i), n - 1, 2), self.dtype),
                  prox_tau=jnp.asarray(self.local_prox, self.dtype))
        return body, cond, c0

    def run_scan(self, n_steps: Optional[int] = None,
                 return_health: bool = False):
        """Whole MPC run as ONE jitted ``lax.scan`` over steps (no per-step
        host dispatch; the (state, BarState) carry stays on device).
        Identical trajectories to :meth:`run`; returns
        ``(states [n+1, V, 5], iters [n], primal [n], dual [n], conv [n])``,
        plus ``(nlp_ok [n, 2], nlp_kkt [n, 2], gap [n])`` — the last ADMM
        iteration's local/edge solver health and the actual consensus gap
        ``||local - z||_1`` (ADVICE r4: the change-based residuals can be
        satisfied at a frozen non-consensus point; the gap cannot) — when
        ``return_health``.
        """
        ocfg, vcfg = self.ocfg, self.vcfg
        total = int(vcfg.T / vcfg.dt - ocfg.horizon)
        n_steps = total if n_steps is None else n_steps
        init_state = jnp.asarray(self.refs[:, 0, :], self.dtype)
        bs = self.create_bar_state()

        def step(carry, k):
            st, bs_c = carry
            st, bs_c, it, pr, du, cv, ok, kkt, gap = self._mpc_step_impl(
                st, bs_c, k)
            return (st, bs_c), (st, it, pr, du, cv, ok, kkt, gap)

        if not hasattr(self, "_run_scan_jit"):
            self._run_scan_jit = jax.jit(
                lambda c0, ks: jax.lax.scan(step, c0, ks))
        (_, _), (sts, its, prs, dus, cvs, oks, kkts, gaps) = \
            self._run_scan_jit(
                (init_state, bs), jnp.arange(n_steps, dtype=jnp.int32))
        states = np.concatenate([np.asarray(init_state)[None],
                                 np.asarray(sts)])
        out = (states, np.asarray(its), np.asarray(prs), np.asarray(dus),
               np.asarray(cvs))
        if return_health:
            out += (np.asarray(oks), np.asarray(kkts), np.asarray(gaps))
        return out

    def run_scan_batch(self, init_states, n_steps: Optional[int] = None):
        """Scenario-batched whole-run driver: ``init_states [S, V, 5]`` are
        per-scenario perturbed initial states; the full MPC run executes as
        one jitted ``lax.scan`` over steps with the per-step ADMM
        ``while_loop`` vmapped over scenarios (a lane that converges idles
        masked until the batch's slowest lane exits — the per-step analogue
        of the PI-ADMM fused driver's lane masking).

        This is the OBCA-line scale surface (VERDICT r4 missing #2): the
        reference's scenario batching is one Python process per scenario
        (``centralized_overtaking_stochastic.py:21-79`` reruns the same
        driver); here a scenario batch is a leading axis on one compiled
        program. Returns ``(states [n+1, S, V, 5], iters [S, n],
        primal [S, n], dual [S, n], conv [S, n], gaps [S, n])``.
        """
        ocfg, vcfg = self.ocfg, self.vcfg
        total = int(vcfg.T / vcfg.dt - ocfg.horizon)
        n_steps = total if n_steps is None else n_steps
        init_states = jnp.asarray(init_states, self.dtype)
        s = init_states.shape[0]
        bs = self.create_bar_state()
        bs_b = jax.tree.map(lambda a: jnp.broadcast_to(a, (s,) + a.shape),
                            bs)

        def step(carry, k):
            st, bs_c = carry
            st, bs_c, it, pr, du, cv, _ok, _kkt, gap = jax.vmap(
                self._mpc_step_impl, in_axes=(0, 0, None))(st, bs_c, k)
            return (st, bs_c), (st, it, pr, du, cv, gap)

        if not hasattr(self, "_run_scan_batch_jit"):
            self._run_scan_batch_jit = jax.jit(
                lambda c0, ks: jax.lax.scan(step, c0, ks))
        (_, _), (sts, its, prs, dus, cvs, gaps) = self._run_scan_batch_jit(
            (init_states, bs_b), jnp.arange(n_steps, dtype=jnp.int32))
        states = np.concatenate([np.asarray(init_states)[None],
                                 np.asarray(sts)])
        return (states, np.asarray(its).T, np.asarray(prs).T,
                np.asarray(dus).T, np.asarray(cvs).T, np.asarray(gaps).T)

    def run_batch_steps(self, init_states, n_steps: Optional[int] = None):
        """Scenario-batched MPC run with a HOST step loop over one jitted
        ``vmap(_mpc_step_impl)`` program (the same unit the sharded batched
        step jits). Same outputs as :meth:`run_scan_batch`.

        Exists because wrapping the batched step in a whole-run ``lax.scan``
        (:meth:`run_scan_batch`) compiles in seconds on CPU but hangs/
        crashes the v5e's compiler — scan(42) x vmapped while_loop x nested
        IP scans is past what that toolchain handles; one step per dispatch
        compiles in ~6 min and runs fine (measured round 5).
        """
        ocfg, vcfg = self.ocfg, self.vcfg
        total = int(vcfg.T / vcfg.dt - ocfg.horizon)
        n_steps = total if n_steps is None else n_steps
        init_states = jnp.asarray(init_states, self.dtype)
        s = init_states.shape[0]
        bs = self.create_bar_state()
        bs_b = jax.tree.map(lambda a: jnp.broadcast_to(a, (s,) + a.shape),
                            bs)
        if not hasattr(self, "_batch_step_jit"):
            self._batch_step_jit = jax.jit(jax.vmap(
                self._mpc_step_fixed_impl, in_axes=(0, 0, None)))
        st = init_states
        sts, rows = [np.asarray(st)], []
        for k in range(n_steps):
            st, bs_b, it, pr, du, cv, _ok, _kkt, gap = self._batch_step_jit(
                st, bs_b, jnp.asarray(k, jnp.int32))
            sts.append(np.asarray(st))
            rows.append((np.asarray(it), np.asarray(pr), np.asarray(du),
                         np.asarray(cv), np.asarray(gap)))
        its, prs, dus, cvs, gaps = (np.stack([r[i] for r in rows], axis=1)
                                    for i in range(5))
        return np.stack(sts), its, prs, dus, cvs, gaps

    def run(self, n_steps: Optional[int] = None,
            checkpoint_path: Optional[str] = None, resume: bool = False):
        """MPC loop; ``checkpoint_path`` persists the (init_state, bar_state)
        carry after every step, ``resume=True`` continues a saved run from
        its last completed step (records of completed steps are not
        replayed — SURVEY.md §5: the bar_state pytree is the carry unit)."""
        import os
        ocfg, vcfg = self.ocfg, self.vcfg
        total = int(vcfg.T / vcfg.dt - ocfg.horizon)
        n_steps = total if n_steps is None else n_steps
        init_state = jnp.asarray(self.refs[:, 0, :], self.dtype)
        bs = self.create_bar_state()
        start = 0
        if checkpoint_path is not None and resume \
                and os.path.exists(checkpoint_path):
            from ..utils.checkpoint import load_carry
            (init_state, bs), start = load_carry(checkpoint_path,
                                                 (init_state, bs))
        states, iters, residuals, flags = [np.asarray(init_state)], [], [], []
        for t in range(start, n_steps):
            (init_state, bs, it, pr, du, cv, nlp_ok,
             nlp_kkt, _gap) = self._mpc_step(
                init_state, bs, jnp.asarray(t, jnp.int32))
            states.append(np.asarray(init_state))
            iters.append(int(it))
            # residual row: (primal, dual, loc_conv_frac, edge_conv_frac,
            # loc_kkt_max, edge_kkt_max) — the last four are solver health
            ok, kk = np.asarray(nlp_ok), np.asarray(nlp_kkt)
            residuals.append((float(pr), float(du), float(ok[0]),
                              float(ok[1]), float(kk[0]), float(kk[1])))
            flags.append(bool(cv))
            if checkpoint_path is not None:
                from ..utils.checkpoint import save_carry
                save_carry(checkpoint_path, (init_state, bs), t + 1)
        return np.stack(states), np.array(iters), residuals, flags
