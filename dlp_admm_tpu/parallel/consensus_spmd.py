"""SPMD consensus-ADMM: the flagship's vehicle axis genuinely partitioned.

The reference's vehicle<->RSU message exchange
(``Distributed_planner/decentralized/optimizer.py:205-222`` ``bar_state_update``
= the vehicles->RSU broadcast; ``:322-328`` = the RSU->vehicles return) is
in-process array copying; SURVEY.md §2.3 maps it to collectives over a device
mesh. This module implements that mapping with ``shard_map`` over a
``(scenario, vehicle)`` mesh:

* **local NLP solves** — each vehicle shard solves only its own block of
  vehicles (vmapped batched interior point), partitioned over the ``vehicle``
  mesh axis;
* **bar-state broadcast** — ``lax.all_gather`` of (A, b, lambda_ij, local_x)
  over the ``vehicle`` axis: the vehicles->RSU message;
* **edge/RSU consensus solve** — runs on the gathered state, replicated per
  vehicle shard (each shard acts as its own RSU replica; deterministic, so
  all replicas agree and the RSU->vehicles return is a block slice of the
  replicated solution — zero return traffic);
* **residual/stopping reductions** — ``lax.psum`` over the vehicle axis.

Scenario lanes ride the ``scenario`` mesh axis as pure data parallelism
(DCN-safe); the vehicle-axis collectives stay inside a scenario row (ICI).

Numerics match ``jax.vmap(ConsensusObcaPlanner._mpc_step_impl)`` to float
tolerance: the math per lane is identical, the only reordering is the psum
residual reduction (see ``tests/test_consensus_spmd.py``).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..coordination.dual_update import DualState, update_dual
from ..models.obca import BarState
from ..ops.geometry import halfspaces
from ..solvers.ip import solve_nlp


def make_consensus_spmd_step(planner, mesh: Mesh):
    """Build the sharded MPC step of a :class:`ConsensusObcaPlanner`.

    Returns ``step(init_states [S, V, 5], bar_state, step_idx)`` with
    ``bar_state`` leaves carrying a leading scenario axis ``[S, V, ...]``;
    outputs ``(next_state [S, V, 5], bar_state, iters [S], primal [S],
    dual [S], converged [S])``. ``S`` must divide by the scenario mesh
    dimension and ``V = planner.num_veh`` by the vehicle mesh dimension.
    """
    ocfg = planner.ocfg
    v, n = planner.num_veh, ocfg.horizon
    k, f_width = planner.K, planner.N_FULL
    dtype = planner.dtype
    ax_v = mesh.shape["vehicle"]
    assert v % ax_v == 0, f"num_veh {v} must divide vehicle axis {ax_v}"
    vb = v // ax_v
    nbr_all = jnp.asarray(planner._nbr)
    rev_all = jnp.asarray(planner._rev)
    pid_all = jnp.asarray(planner._pair_id)
    idx_i, idx_j = planner.idx_i, planner.idx_j
    n_pairs = len(idx_i)

    def gather_v(x):
        """Block [S_blk, vb, ...] -> full [S_blk, V, ...] (vehicles->RSU)."""
        return jax.lax.all_gather(x, "vehicle", axis=1, tiled=True)

    def zip_z(local_x, lamb_ij):
        """Batched ``ConsensusObcaPlanner._zip_z``: [..., N-1, 5] +
        [..., K, N-1, 4] -> [..., N-1, F]."""
        lam_flat = jnp.moveaxis(lamb_ij, -3, -2).reshape(
            local_x.shape[:-1] + (4 * k,))
        return jnp.concatenate([local_x, lam_flat], axis=-1)

    def step_blk(init_blk, bs_blk: BarState, step_idx):
        s_blk = init_blk.shape[0]
        blk = jax.lax.axis_index("vehicle")
        gids = blk * vb + jnp.arange(vb)
        nbr_blk = jnp.take(nbr_all, gids, axis=0)            # [vb, K]
        rev_blk = jnp.take(rev_all, gids, axis=0)
        pid_blk = jnp.take(pid_all, gids, axis=0)            # [vb, K]
        ref_full = jax.lax.dynamic_slice_in_dim(
            jnp.asarray(planner.refs, dtype), step_idx, n, axis=1)
        ref_blk = jnp.take(ref_full, gids, axis=0)           # [vb, N, 5]
        ref_blk_b = jnp.broadcast_to(ref_blk, (s_blk,) + ref_blk.shape)
        rho = jnp.asarray(ocfg.rho, dtype)

        def pair_mask_from(locx_full):
            pos = locx_full[..., :2]                         # [S, V, N-1, 2]
            d2 = jnp.sum((pos[:, idx_i] - pos[:, idx_j]) ** 2, axis=-1)
            if not planner.gate_pairs:
                return jnp.ones((s_blk, n_pairs), dtype)
            return jnp.any(d2 < planner.gate_thres ** 2, axis=-1).astype(dtype)

        def local_params(bs, a_full, b_full, lij_full, mask_veh):
            """Block analogue of ``_local_params``: the neighbour reads come
            from the gathered broadcast payload (the RSU message)."""
            return dict(init_state=init_blk,
                        ref_win=ref_blk_b,
                        other_a=a_full[:, nbr_blk],          # [S, vb, K, ...]
                        other_b=b_full[:, nbr_blk],
                        other_lij=lij_full[:, nbr_blk, rev_blk],
                        z_bar=bs.z_bar,
                        lamb_bar=bs.lamb_bar,
                        mask=mask_veh,
                        rho=jnp.broadcast_to(rho, (s_blk, vb)))

        solve_local = jax.vmap(jax.vmap(
            lambda xx, pp: solve_nlp(planner._local_nlp, xx, pp, planner.scfg)))
        warm_local = jax.vmap(jax.vmap(planner._local_warm_one))
        split_local = jax.vmap(jax.vmap(planner._loc_split))
        solve_edge = jax.vmap(
            lambda zz, pp: solve_nlp(planner._edge_nlp, zz, pp, planner.scfg))

        def body(c):
            bs = c["bs"]
            active = jnp.logical_and(jnp.logical_not(c["done"]),
                                     c["it"] < ocfg.max_admm_iters)  # [S_blk]

            a_full, b_full = gather_v(bs.a_mat), gather_v(bs.b)
            lij_full, locx_full = gather_v(bs.lamb_ij), gather_v(bs.local_x)
            pair_mask = pair_mask_from(locx_full)            # [S_blk, P]
            mask_veh = pair_mask[:, pid_blk]                 # [S_blk, vb, K]

            p = local_params(bs, a_full, b_full, lij_full, mask_veh)
            if planner.local_warm_mode == "previous":
                x0 = c["loc_x"]
            else:
                x0 = warm_local(ref_blk_b, p)
            sol = solve_local(x0, p)
            xs, us, lam, _ = split_local(sol.x)              # [S, vb, ...]

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
            local_fullx_full = zip_z(locx_full, lij_full)    # [S, V, N-1, F]
            lambbar_full = gather_v(bs.lamb_bar)
            zbar_full = gather_v(bs.z_bar)
            pe = dict(lamb_bar=lambbar_full, local_fullx=local_fullx_full,
                      rho=jnp.broadcast_to(rho, (s_blk,)),
                      pair_mask=pair_mask)
            esol = solve_edge(zbar_full.reshape(s_blk, -1), pe)
            z_full = esol.x.reshape(s_blk, v, n - 1, f_width)
            # RSU -> vehicles return (ref :322-328): own block slice
            bs = bs._replace(z_bar=jnp.take(z_full, gids, axis=1))
            if planner.lamb_ij_mode == "track_edge":
                elam_full = jax.vmap(planner._edge_lam)(z_full)
                bs = bs._replace(lamb_ij=jnp.take(elam_full, gids, axis=1))

            # dual ascent on the own block rows; the consensus error uses the
            # PRE-edge lambda_ij (matching the single-device body's ordering)
            local_fullx_blk = jnp.take(local_fullx_full, gids, axis=1)
            pos = locx_full[..., :2]
            d_min = jnp.min(jnp.linalg.norm(
                pos[:, idx_i] - pos[:, idx_j], axis=-1), axis=(1, 2))  # [S]
            dual_new = jax.vmap(
                lambda st, r, d: update_dual(st, r, d, planner.dual_cfg))(
                DualState(dual=bs.lamb_bar, sum_err=c["sum_err"],
                          diff_val=c["diff_val"],
                          rho=jnp.broadcast_to(rho, (s_blk,))),
                local_fullx_blk - bs.z_bar, d_min)
            bs = bs._replace(lamb_bar=dual_new.dual)

            # residuals (ref driver :82-90): block sums + psum over vehicles
            primal = jax.lax.psum(
                jnp.sum(jnp.abs(us - c["us_prev"]), axis=(1, 2, 3)), "vehicle")
            dual_r = jax.lax.psum(
                jnp.sum(jnp.abs(bs.lamb_bar - c["lamb_prev"]), axis=(1, 2, 3)),
                "vehicle")
            lane_done = jnp.logical_and(primal <= ocfg.primal_thres,
                                        dual_r <= ocfg.dual_thres)

            new = dict(bs=bs, us_prev=us, lamb_prev=bs.lamb_bar, xs=xs,
                       loc_x=sol.x, sum_err=dual_new.sum_err,
                       diff_val=dual_new.diff_val, it=c["it"] + 1,
                       done=jnp.logical_or(c["done"], lane_done),
                       primal=primal, dual=dual_r)
            # freeze lanes that were not active this iteration (matches the
            # per-lane select of a vmapped while_loop on one device)
            def sel(new_leaf, old_leaf):
                act = active.reshape((s_blk,) + (1,) * (new_leaf.ndim - 1))
                return jnp.where(act, new_leaf, old_leaf)
            return jax.tree.map(sel, new, c)

        def cond(c):
            return jnp.any(jnp.logical_and(
                jnp.logical_not(c["done"]), c["it"] < ocfg.max_admm_iters))

        a_full0, b_full0 = gather_v(bs_blk.a_mat), gather_v(bs_blk.b)
        lij_full0, locx_full0 = gather_v(bs_blk.lamb_ij), gather_v(bs_blk.local_x)
        mask_veh0 = pair_mask_from(locx_full0)[:, pid_blk]
        p0 = local_params(bs_blk, a_full0, b_full0, lij_full0, mask_veh0)
        zeros_f = jnp.zeros((s_blk, vb, n - 1, f_width), dtype)
        c0 = dict(bs=bs_blk,
                  us_prev=jnp.zeros((s_blk, vb, n - 1, 2), dtype),
                  lamb_prev=bs_blk.lamb_bar,
                  xs=jnp.broadcast_to(ref_blk, (s_blk, vb, n, 5)),
                  loc_x=warm_local(ref_blk_b, p0),
                  sum_err=zeros_f, diff_val=zeros_f,
                  it=jnp.zeros((s_blk,), jnp.int32),
                  done=jnp.zeros((s_blk,), bool),
                  primal=jnp.full((s_blk,), jnp.inf, dtype),
                  dual=jnp.full((s_blk,), jnp.inf, dtype))
        out = jax.lax.while_loop(cond, body, c0)

        next_blk = out["xs"][:, :, 1, :]
        bs_out = out["bs"]
        # convergence check on the final gathered exchange state (full view,
        # replicated — identical on every shard)
        bs_full = BarState(
            z_bar=gather_v(bs_out.z_bar), a_mat=gather_v(bs_out.a_mat),
            b=gather_v(bs_out.b), lamb_bar=gather_v(bs_out.lamb_bar),
            lamb_ij=gather_v(bs_out.lamb_ij), local_x=gather_v(bs_out.local_x))
        conv = jax.vmap(planner.check_converge)(bs_full)
        return (next_blk, planner.shift_bar_state(bs_out, batch_dims=1),
                out["it"], out["primal"], out["dual"], conv)

    sv = P("scenario", "vehicle")
    s_only = P("scenario")
    bs_spec = BarState(z_bar=sv, a_mat=sv, b=sv, lamb_bar=sv, lamb_ij=sv,
                       local_x=sv)
    step = jax.shard_map(step_blk, mesh=mesh,
                         in_specs=(sv, bs_spec, P()),
                         out_specs=(sv, bs_spec, s_only, s_only, s_only,
                                    s_only),
                         check_vma=False)
    return jax.jit(step)
