"""SPMD consensus-ADMM: the flagship's vehicle axis genuinely partitioned.

The reference's vehicle<->RSU message exchange
(``Distributed_planner/decentralized/optimizer.py:205-222`` ``bar_state_update``
= the vehicles->RSU broadcast; ``:322-328`` = the RSU->vehicles return) is
in-process array copying; SURVEY.md §2.3 maps it to collectives over a device
mesh. This module implements that mapping with ``shard_map`` over a
``(scenario, vehicle)`` mesh:

* **local NLP solves** — each vehicle shard solves only its own block of
  vehicles (vmapped staged/dense interior point), partitioned over the
  ``vehicle`` mesh axis;
* **bar-state broadcast** — ``lax.all_gather`` of the exchange payload
  (A, b, lambda_ij, local_x, lamb_bar, z_bar) over the ``vehicle`` axis:
  the vehicles->RSU message;
* **edge/RSU consensus solve** — runs on the gathered state, replicated per
  vehicle shard (each shard acts as its own RSU replica; deterministic, so
  all replicas agree and the RSU->vehicles return is a block slice of the
  replicated solution — zero return traffic);
* **residual/stopping reductions** — ``lax.psum`` over the vehicle axis.

Equality with the single-device step is by CONSTRUCTION, not by parallel
maintenance: every per-iteration parameter pytree is built on the gathered
full-vehicle view with the planner's OWN builders (``_local_params``,
``_local_staged_params``, ``_zip_z``, ``_edge_lam``) and then sliced to the
shard's vehicle block — parameter assembly is trivially cheap next to the
NLP solves, which are what gets partitioned. All of the flagship's modes
are honored: staged/dense local solves, the three edge modes, ``track_*``
lambda_ij exchange with ``lamb_ij_relax`` damping, configurable dual update
with ``dual_rho`` and the rho-normalized dual residual, and the cross-step
``lamb_bar_decay``. Numerics match
``jax.vmap(ConsensusObcaPlanner._mpc_step_impl)`` to float tolerance; the
only reordering is the psum residual reduction (see
``tests/test_consensus_spmd.py``).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..coordination.dual_update import DualState, update_dual
from ..models.obca import BarState
from ..ops.geometry import halfspaces
from ..solvers.ip import solve_nlp
from ..solvers.ip_staged import solve_staged


def run_scenario_batch(planner, init_states, n_steps: int):
    """Scenario-batched flagship MPC run through the SPMD step on a 1x1
    mesh (single device) — the compilable batched form on the v5e (see
    module docstring). ``init_states [S, V, 5]``; returns
    ``(states [n+1, S, V, 5], iters, primal, dual, conv, gap)`` with
    ``[S, n]`` trailing leaves. Works identically on CPU (used by the
    bench's no-TPU fallback and the f64 control runs).
    """
    import numpy as np
    mesh = Mesh(np.array(jax.devices()[:1]).reshape(1, 1),
                ("scenario", "vehicle"))
    step = make_consensus_spmd_step(planner, mesh)
    s = init_states.shape[0]
    bs = planner.create_bar_state()
    bs_b = jax.tree.map(lambda a: jnp.broadcast_to(a, (s,) + a.shape), bs)
    st = jnp.asarray(init_states, planner.dtype)
    sts, rows = [np.asarray(st)], []
    for k in range(n_steps):
        st, bs_b, it, pr, du, cv, gap = step(st, bs_b,
                                             jnp.asarray(k, jnp.int32))
        sts.append(np.asarray(st))
        rows.append(tuple(np.asarray(x) for x in (it, pr, du, cv, gap)))
    outs = tuple(np.stack([r[i] for r in rows], axis=1) for i in range(5))
    return (np.stack(sts),) + outs


def make_consensus_spmd_step(planner, mesh: Mesh):
    """Build the sharded MPC step of a :class:`ConsensusObcaPlanner`.

    Returns ``step(init_states [S, V, 5], bar_state, step_idx)`` with
    ``bar_state`` leaves carrying a leading scenario axis ``[S, V, ...]``;
    outputs ``(next_state [S, V, 5], bar_state, iters [S], primal [S],
    dual [S], converged [S], gap [S])``. ``S`` must divide by the scenario
    mesh dimension and ``V = planner.num_veh`` by the vehicle mesh
    dimension.

    This is also the scenario-batched TPU driver for a 1x1 mesh: the ADMM
    loop is ONE ``lax.while_loop`` whose carry is lane-batched with
    hand-rolled freeze masking — the v5e toolchain compiles this fine,
    while ``vmap`` of the per-scenario step's while_loop (or its fixed-scan
    variant) hangs its compiler for 20+ min and can crash the worker
    (round-5 measurements; see ``ConsensusObcaPlanner.run_batch_steps``).
    """
    ocfg = planner.ocfg
    v, n = planner.num_veh, ocfg.horizon
    f_width = planner.N_FULL
    dtype = planner.dtype
    ax_v = mesh.shape["vehicle"]
    assert v % ax_v == 0, f"num_veh {v} must divide vehicle axis {ax_v}"
    vb = v // ax_v
    pid_all = jnp.asarray(planner._pair_id)
    idx_i, idx_j = planner.idx_i, planner.idx_j

    def gather_v(x):
        """Block [S_blk, vb, ...] -> full [S_blk, V, ...] (vehicles->RSU)."""
        return jax.lax.all_gather(x, "vehicle", axis=1, tiled=True)

    def step_blk(init_blk, bs_blk: BarState, step_idx):
        s_blk = init_blk.shape[0]
        blk = jax.lax.axis_index("vehicle")
        gids = blk * vb + jnp.arange(vb)
        init_full = gather_v(init_blk)                       # [S, V, 5]
        ref_win = jax.lax.dynamic_slice_in_dim(
            jnp.asarray(planner.refs, dtype), step_idx, n, axis=1)  # [V,N,5]
        ref_blk_b = jnp.broadcast_to(jnp.take(ref_win, gids, axis=0),
                                     (s_blk, vb, n, 5))
        rho = jnp.asarray(ocfg.rho, dtype)
        rho_dual = jnp.asarray(
            ocfg.rho if ocfg.dual_rho is None else ocfg.dual_rho, dtype)

        def full_bs(bs):
            """Gather every exchange leaf -> the RSU's full-vehicle view."""
            return BarState(*(gather_v(leaf) for leaf in bs))

        def slice_blk(tree):
            """Full-view pytree [S, V, ...] -> own block [S, vb, ...]."""
            return jax.tree.map(lambda a: jnp.take(a, gids, axis=1), tree)

        def masks_from_full(bsf):
            pair_mask = jax.vmap(planner._pair_proximity_mask)(bsf.local_x)
            return pair_mask, pair_mask[:, pid_all]          # [S,P], [S,V,K]

        def local_params_full(bsf, mask_veh_full):
            return jax.vmap(
                lambda b_, i_, m_: planner._local_params(
                    b_, i_, ref_win, rho, m_))(bsf, init_full, mask_veh_full)

        def local_solve(bsf, x_prev_blk, mask_veh_full, prox_tau):
            """``prox_tau [S_blk]``: per-lane annealed-prox weight (the
            flagship's limit-cycle breaker, honored here since round 5 so
            the scenario-batched TPU path runs the SAME tuned profile)."""
            if planner.local_warm_mode == "previous":
                x0 = x_prev_blk
            else:
                p_blk = slice_blk(local_params_full(bsf, mask_veh_full))
                x0 = jax.vmap(jax.vmap(planner._local_warm_one))(
                    ref_blk_b, p_blk)
            if planner.use_staged:
                sp_blk = slice_blk(jax.vmap(
                    lambda b_, i_, m_: planner._local_staged_params(
                        b_, i_, ref_win, rho, m_))(
                            bsf, init_full, mask_veh_full))
                w0 = jax.vmap(jax.vmap(planner._loc_to_staged))(x0)
                if planner.local_prox:
                    t_ = n - 1
                    sp_blk["w_prev"] = jax.vmap(jax.vmap(
                        planner._loc_to_staged))(x_prev_blk)
                    sp_blk["prox_tau"] = jnp.broadcast_to(
                        prox_tau[:, None, None], (s_blk, vb, t_))
                lsol = jax.vmap(jax.vmap(
                    lambda ww, pp: solve_staged(
                        planner._local_staged, ww, pp, planner.scfg)))(
                            w0, sp_blk)
                x_out = jax.vmap(jax.vmap(planner._loc_from_staged))(
                    lsol.w, init_blk)
            else:
                p_blk = slice_blk(local_params_full(bsf, mask_veh_full))
                if planner.local_prox:
                    p_blk["x_prev"] = x_prev_blk
                    p_blk["prox_tau"] = jnp.broadcast_to(
                        prox_tau[:, None], (s_blk, vb))
                lsol = jax.vmap(jax.vmap(
                    lambda xx, pp: solve_nlp(
                        planner._local_nlp, xx, pp, planner.scfg)))(x0, p_blk)
                x_out = lsol.x
            xs, us, lam, _ = jax.vmap(jax.vmap(planner._loc_split))(x_out)
            return xs, us, lam, x_out

        def edge_one(zb, lb, lfx, pm):
            """One scenario lane's RSU solve on the full view (replicated
            per shard; mirrors the flagship's edge_mode branches)."""
            t_ax = n - 1
            if planner.edge_mode == "joint":
                pe = dict(lamb_bar=lb, local_fullx=lfx, rho=rho,
                          pair_mask=pm)
                esol = solve_nlp(planner._edge_nlp, zb.reshape(-1), pe,
                                 planner.scfg)
                return planner._edge_split(esol.x)
            pe_t = dict(
                lamb_bar=jnp.moveaxis(lb, 1, 0),
                local_fullx=jnp.moveaxis(lfx, 1, 0),
                rho=jnp.broadcast_to(rho, (t_ax,)),
                pair_mask=jnp.broadcast_to(pm, (t_ax,) + pm.shape))
            z0_t = jnp.moveaxis(zb, 1, 0).reshape(t_ax, -1)
            if planner.edge_mode == "staged":
                esol = solve_staged(planner._edge_staged, z0_t, pe_t,
                                    planner.scfg)
                z_t = esol.w
            else:                                            # per_step
                esol = jax.vmap(lambda zz, pp: solve_nlp(
                    planner._edge_nlp_t, zz, pp, planner.scfg))(z0_t, pe_t)
                z_t = esol.x
            return jnp.moveaxis(z_t.reshape(t_ax, v, f_width), 0, 1)

        def body(c):
            bs = c["bs"]
            active = jnp.logical_and(jnp.logical_not(c["done"]),
                                     c["it"] < ocfg.max_admm_iters)  # [S_blk]

            bsf = full_bs(bs)
            pair_mask, mask_veh_full = masks_from_full(bsf)
            # per-lane annealed prox weight (flagship schedule, obca.py)
            if planner.prox_adaptive:
                prox_tau = c["prox_tau"]
            else:
                k_eff = jnp.maximum(c["it"] - planner.prox_after, 0)
                prox_tau = jnp.where(
                    c["it"] >= planner.prox_after,
                    jnp.minimum(
                        planner.local_prox
                        * planner.prox_growth ** k_eff.astype(dtype),
                        planner.prox_tau_max),
                    0.0).astype(dtype)
            xs, us, lam, loc_x = local_solve(bsf, c["loc_x"], mask_veh_full,
                                             prox_tau)

            # bar_state_update (ref optimizer.py:205-222): fresh halfspaces +
            # local states on the own block; the broadcast happens via the
            # next all_gather
            a_new, b_new = halfspaces(xs[:, :, 1:, :], planner.vcfg,
                                      ocfg.use_delay_tightening)
            lamb_ij = lam if planner.lamb_ij_mode == "track_local" \
                else bs.lamb_ij
            bs = bs._replace(a_mat=a_new, b=b_new, local_x=xs[:, :, 1:, :],
                             lamb_ij=lamb_ij)

            # vehicles -> RSU: gather the fresh payload for the edge solve
            lij_full = gather_v(bs.lamb_ij)
            locx_full = gather_v(bs.local_x)
            local_fullx_full = jax.vmap(planner._zip_z)(locx_full, lij_full)
            lambbar_full = gather_v(bs.lamb_bar)
            zbar_full = gather_v(bs.z_bar)
            z_full = jax.vmap(edge_one)(zbar_full, lambbar_full,
                                        local_fullx_full, pair_mask)
            # RSU -> vehicles return (ref :322-328): own block slice
            bs = bs._replace(z_bar=jnp.take(z_full, gids, axis=1))
            if planner.lamb_ij_mode == "track_edge":
                lam_e_blk = jnp.take(jax.vmap(planner._edge_lam)(z_full),
                                     gids, axis=1)
                th = jnp.asarray(planner.lamb_ij_relax, dtype)
                if planner.lamb_ij_hysteresis:
                    # per-lane freeze while the primal residual rises
                    # (mirrors the flagship's limit-cycle breaker)
                    rising = c["primal"] > c["primal_prev"]
                    th = jnp.where(rising, 0.0, th)[:, None, None, None, None]
                bs = bs._replace(
                    lamb_ij=th * lam_e_blk + (1.0 - th) * bs.lamb_ij)

            # dual ascent on the own block rows; d_min over the full view
            local_fullx_blk = jnp.take(local_fullx_full, gids, axis=1)
            pos = locx_full[..., :2]
            d_min = jnp.min(jnp.linalg.norm(
                pos[:, idx_i] - pos[:, idx_j], axis=-1), axis=(1, 2))  # [S]
            dual_new = jax.vmap(
                lambda st, r, d: update_dual(st, r, d, planner.dual_cfg))(
                DualState(dual=bs.lamb_bar, sum_err=c["sum_err"],
                          diff_val=c["diff_val"],
                          rho=jnp.broadcast_to(rho_dual, (s_blk,))),
                local_fullx_blk - bs.z_bar, d_min)
            bs = bs._replace(lamb_bar=dual_new.dual)

            # residuals (ref driver :82-90): block sums + psum over vehicles;
            # the dual delta is normalized by the dual step size (matches the
            # flagship's rho-independent consensus-gap measure)
            primal = jax.lax.psum(
                jnp.sum(jnp.abs(us - c["us_prev"]), axis=(1, 2, 3)), "vehicle")
            dual_r = jax.lax.psum(
                jnp.sum(jnp.abs(bs.lamb_bar - c["lamb_prev"]), axis=(1, 2, 3)),
                "vehicle") / jnp.maximum(rho_dual, 1.0)
            # actual consensus gap ||local - z||_1 per lane (ADVICE r4 —
            # the un-fakeable companion to the change-based residuals)
            gap = jax.lax.psum(
                jnp.sum(jnp.abs(local_fullx_blk - bs.z_bar), axis=(1, 2, 3)),
                "vehicle")
            t_scale = (v / 2.0) if ocfg.thres_per_veh else 1.0
            lane_done = jnp.logical_and(
                primal <= ocfg.primal_thres * t_scale,
                dual_r <= ocfg.dual_thres * t_scale)

            tau_next = prox_tau
            if planner.prox_adaptive:
                tau_next = jnp.minimum(
                    jnp.where(primal > c["primal"],
                              prox_tau * planner.prox_growth, prox_tau),
                    planner.prox_tau_max).astype(dtype)
            new = dict(bs=bs, us_prev=us, lamb_prev=bs.lamb_bar, xs=xs,
                       loc_x=loc_x, sum_err=dual_new.sum_err,
                       diff_val=dual_new.diff_val, it=c["it"] + 1,
                       done=jnp.logical_or(c["done"], lane_done),
                       primal=primal, dual=dual_r, gap=gap,
                       primal_prev=c["primal"], prox_tau=tau_next)
            # freeze lanes that were not active this iteration (matches the
            # per-lane select of a vmapped while_loop on one device)
            def sel(new_leaf, old_leaf):
                act = active.reshape((s_blk,) + (1,) * (new_leaf.ndim - 1))
                return jnp.where(act, new_leaf, old_leaf)
            return jax.tree.map(sel, new, c)

        def cond(c):
            return jnp.any(jnp.logical_and(
                jnp.logical_not(c["done"]), c["it"] < ocfg.max_admm_iters))

        bsf0 = full_bs(bs_blk)
        _, mask_veh0 = masks_from_full(bsf0)
        p0_blk = slice_blk(local_params_full(bsf0, mask_veh0))
        zeros_f = jnp.zeros((s_blk, vb, n - 1, f_width), dtype)
        c0 = dict(bs=bs_blk,
                  us_prev=jnp.zeros((s_blk, vb, n - 1, 2), dtype),
                  lamb_prev=bs_blk.lamb_bar,
                  xs=jnp.broadcast_to(jnp.take(ref_win, gids, axis=0),
                                      (s_blk, vb, n, 5)),
                  loc_x=jax.vmap(jax.vmap(planner._local_warm_one))(
                      ref_blk_b, p0_blk),
                  sum_err=zeros_f, diff_val=zeros_f,
                  it=jnp.zeros((s_blk,), jnp.int32),
                  done=jnp.zeros((s_blk,), bool),
                  primal=jnp.full((s_blk,), jnp.inf, dtype),
                  primal_prev=jnp.full((s_blk,), jnp.inf, dtype),
                  dual=jnp.full((s_blk,), jnp.inf, dtype),
                  gap=jnp.full((s_blk,), jnp.inf, dtype),
                  prox_tau=jnp.full((s_blk,), planner.local_prox, dtype))
        out = jax.lax.while_loop(cond, body, c0)

        next_blk = out["xs"][:, :, 1, :]
        bs_out = out["bs"]
        # convergence check on the final gathered exchange state (full view,
        # replicated — identical on every shard), BEFORE the dual decay
        conv = jax.vmap(planner.check_converge)(full_bs(bs_out))
        if planner.lamb_bar_decay != 1.0:
            bs_out = bs_out._replace(
                lamb_bar=planner.lamb_bar_decay * bs_out.lamb_bar)
        return (next_blk, planner.shift_bar_state(bs_out, batch_dims=1),
                out["it"], out["primal"], out["dual"], conv, out["gap"])

    sv = P("scenario", "vehicle")
    s_only = P("scenario")
    bs_spec = BarState(z_bar=sv, a_mat=sv, b=sv, lamb_bar=sv, lamb_ij=sv,
                       local_x=sv)
    step = jax.shard_map(step_blk, mesh=mesh,
                         in_specs=(sv, bs_spec, P()),
                         out_specs=(sv, bs_spec, s_only, s_only, s_only,
                                    s_only, s_only),
                         check_vma=False)
    return jax.jit(step)
