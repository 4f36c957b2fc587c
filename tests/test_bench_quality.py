"""Committed quality twin of the bench workload (VERDICT r1 weak #1).

``bench.py`` reports throughput at tuned (cut-down) QP budgets; this test
pins the *solution quality* of exactly that solver configuration on a
CPU-sized slice of the same 16-vehicle overtaking workload, so a budget cut
that silently breaks the physics fails CI rather than inflating the bench.
"""
import jax
import jax.numpy as jnp
import numpy as np

from dlp_admm_tpu.config import DualUpdateConfig, PiAdmmConfig, SolverConfig
from dlp_admm_tpu.models.pi_admm import PiAdmmEngine
from dlp_admm_tpu.scenarios import pi_admm_overtake_refs


def run_bench_slice(num_veh=8, horizon=16, n_scen=2, n_steps=6, seed=0,
                    perturb=0.5, start_at_pass=True):
    """The bench workload at reduced scale: same engine settings, same
    tuned solver budget (qp_iters=16/1 segment/ns10 — bench.py).

    ``start_at_pass`` moves each fast vehicle to 2 m behind its lane partner
    so the overtaking conflict is inside the first horizon (the bench's
    perturbed starts engage the same machinery at 16 vehicles)."""
    speeds = tuple(8.0 if i % 2 == 0 else 4.0 for i in range(num_veh))
    cfg = PiAdmmConfig(num_veh=num_veh, horizon=horizon, speeds=speeds,
                       dis_thres=2.0, iter_num=30, eps_pri=1.0, eps_dual=1.0,
                       stop_needs_clearance=False, eps_per_edge=True)
    refs, xt0 = pi_admm_overtake_refs(cfg)
    if start_at_pass:
        xt0 = xt0.copy()
        xt0[0::2, 0] = xt0[1::2, 0] - 2.0
    eng = PiAdmmEngine(cfg, DualUpdateConfig(windup_sat=200.0),
                       SolverConfig(qp_iters=16, qp_tol=1e-4, qp_segments=1,
                                    qp_ns_iters=10, qp_unroll=16),
                       layout="pairwise", refs=refs, n_sqp=1, pair_budget=24,
                       carry_admm_state=True, dtype=jnp.float32)
    step = jax.jit(jax.vmap(eng._mpc_step_carry_impl,
                            in_axes=(0, 0, 0, None)))
    admm = jax.tree.map(
        lambda a: jnp.broadcast_to(a, (n_scen,) + a.shape),
        eng.init_admm_carry())
    rng = np.random.default_rng(seed)
    xt = jnp.asarray(
        xt0[None] + np.concatenate([
            perturb * rng.normal(size=(n_scen,) + xt0[:, :2].shape),
            np.zeros((n_scen, num_veh, 1))], axis=-1), jnp.float32)
    u = jnp.zeros((n_scen, num_veh, horizon), jnp.float32)
    states, total_iters, capped = [np.asarray(xt)], 0, 0
    for k in range(n_steps):
        u = jnp.concatenate([u[:, :, 1:], u[:, :, -1:]], axis=2)
        xt, u, admm, rec = step(xt, u, admm, jnp.asarray(k, jnp.int32))
        iters_k = np.asarray(rec.iterations)
        total_iters += int(iters_k.sum())
        capped += int(np.sum(iters_k >= cfg.iter_num))
        states.append(np.asarray(xt))
    h = np.stack(states)
    p = h[..., :2]
    d = np.linalg.norm(p[:, :, :, None, :] - p[:, :, None, :, :], axis=-1)
    d += 1e9 * np.eye(num_veh)
    conv_frac = 1.0 - capped / (n_steps * n_scen)
    return h, float(d.min()), conv_frac, total_iters


class TestBenchQuality:
    def test_tuned_budget_quality(self):
        """Pinned floors for the tuned bench solver budget on an adversarial
        cold start (fast vehicle 2 m behind its partner, in-lane, reference
        telling it to drive straight through). Measured at pin time (CPU,
        f32): min_dist = 0.928, conv_frac = 0.75, 113 effective iterations.
        Without coordination the fast vehicle blows through its partner
        (min_dist -> ~0), so the distance floor detects a broken solve."""
        h, min_dist, conv_frac, total_iters = run_bench_slice()
        assert np.all(np.isfinite(h))
        assert min_dist > 0.7, f"min pairwise distance regressed: {min_dist}"
        assert conv_frac >= 0.6, f"converged fraction regressed: {conv_frac}"
        assert total_iters > 50, f"coordination never engaged: {total_iters}"
