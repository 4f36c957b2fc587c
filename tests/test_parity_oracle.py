"""Cross-formulation parity oracle (VERDICT r3 next #4).

The reference solves the SAME joint planning problem two ways — one joint
NLP (`/root/reference/Distributed_planner/centralized/optimizer.py:78-102`)
and a consensus-ADMM decomposition
(`decentralized/optimizer.py:170-201`) — and validates both against the
same visual oracle. These tests make that cross-check executable on
identical configs.

Exact trajectory parity is only well-defined where the problem is convex
in effect (no active collision coupling): there both formulations must
reproduce the reference tracking to tight tolerance (regime 1). In the
conflict window the joint problem is nonconvex (bilinear OBCA duals,
pass-left/pass-right branches); the two formulations legitimately settle
in different local basins — measured on the 2-vehicle overtake (CPU f64,
tools/exp_parity.py): the centralized swerves laterally at full speed
(min center distance 1.80 m), the consensus brakes and swerves later
(3.65 m), tracking-cost ratio 4.4x. What IS invariant across basins — and
what regime 2 pins — is the shared constraint system: rectangle
footprints separated by at least the OBCA margin at every visited state,
and the overtake completing, for BOTH formulations.
"""
import numpy as np

from dlp_admm_tpu.config import ObcaConfig, SolverConfig, VehicleConfig
from dlp_admm_tpu.models.obca import (CentralizedObcaPlanner,
                                      ConsensusObcaPlanner)
from dlp_admm_tpu.ops.geometry import vehicle_vertices

SCFG = SolverConfig(ip_iters=40, ip_tol=1e-6)


def rect_distance(state_i, state_j, vcfg):
    """Euclidean set distance between two vehicles' rectangle footprints
    (0 if they intersect) — the quantity the OBCA constraint (4a) bounds.
    Convex-polygon distance via vertex-to-edge projections both ways plus
    a separating-axis intersection test."""
    pi = np.asarray(vehicle_vertices(state_i, vcfg))     # [4, 2]
    pj = np.asarray(vehicle_vertices(state_j, vcfg))

    def poly_gap(a, b):
        """min over vertices of a of distance to polygon b's boundary."""
        best = np.inf
        for k in range(len(b)):
            p0, p1 = b[k], b[(k + 1) % len(b)]
            e = p1 - p0
            t = np.clip(((a - p0) @ e) / (e @ e), 0.0, 1.0)
            proj = p0[None] + t[:, None] * e[None]
            best = min(best, float(np.linalg.norm(a - proj, axis=1).min()))
        return best

    def separated(a, b):
        """Separating-axis test for convex polygons."""
        for poly in (a, b):
            for k in range(len(poly)):
                p0, p1 = poly[k], poly[(k + 1) % len(poly)]
                axis = np.array([p0[1] - p1[1], p1[0] - p0[0]])
                if (a @ axis).max() < (b @ axis).min() or \
                   (b @ axis).max() < (a @ axis).min():
                    return True
        return False

    if not separated(pi, pj):
        return 0.0
    return min(poly_gap(pi, pj), poly_gap(pj, pi))


def min_rect_distance(states, vcfg):
    return min(rect_distance(states[k, 0], states[k, 1], vcfg)
               for k in range(states.shape[0]))


class TestParityOracle:
    def test_conflict_free_regime_exact_parity(self):
        """Separate lanes (reference y-offset 6 m): no collision coupling is
        ever active, so centralized and consensus must both track the
        references and agree with each other to tight tolerance."""
        from dlp_admm_tpu import scenarios
        vcfg = VehicleConfig()
        refs = np.asarray(scenarios.ref_traj_overtake(vcfg, 2)).copy()
        refs[1, :, 1] += 6.0                       # move veh1 one lane over
        ocfg = ObcaConfig(horizon=8, min_dis=0.1, rho=100.0,
                          max_admm_iters=50)
        cen = CentralizedObcaPlanner(ocfg, vcfg, SCFG, refs=refs,
                                     warm_mode="previous")
        c_states, _, _, _, c_convs = cen.run_scan(n_steps=10)
        con = ConsensusObcaPlanner(ocfg, vcfg, SCFG, refs=refs)
        s_states, its, _, _, _ = con.run_scan(n_steps=10)

        assert np.all(c_convs), "centralized must converge without conflict"
        assert its.max() <= 3, f"consensus should exit fast: {its.tolist()}"
        dev = np.linalg.norm(c_states[:, :, :2] - s_states[:, :, :2],
                             axis=-1)
        assert dev.max() < 0.02, f"formulations diverged: {dev.max():.4f} m"
        ref_dev = np.abs(
            c_states[:, :, :2]
            - np.moveaxis(refs, 1, 0)[:11, :, :2])
        assert ref_dev.max() < 0.02, f"tracking broke: {ref_dev.max():.4f}"

    def test_conflict_regime_shared_constraint_system(self):
        """The 2-vehicle overtaking conflict at the reference's centralized
        operating point (horizon 15; min_dis 0.5 — a real safety margin):
        each formulation picks its own local basin, but both must satisfy
        the joint problem's collision constraint as geometry — rectangle
        footprints separated by (nearly) the full min_dis margin at every
        visited state — and complete the overtake.

        Measured at pin time (CPU f64): centralized min footprint distance
        0.500 m (the margin held exactly), consensus 0.526 m; overtake gain
        25.0 m vs 16.0 m over 30 steps.
        """
        vcfg = VehicleConfig()
        ocfg = ObcaConfig(horizon=15, min_dis=0.5, rho=100.0,
                          max_admm_iters=50)
        cen = CentralizedObcaPlanner(ocfg, vcfg, SCFG, warm_mode="previous")
        c_states, _, _, _, c_cv = cen.run_scan(n_steps=30)
        con = ConsensusObcaPlanner(ocfg, vcfg, SCFG)
        s_states, its, prs, dus, _ = con.run_scan(n_steps=30)

        for name, st in (("centralized", c_states), ("consensus", s_states)):
            assert np.all(np.isfinite(st)), name
            d = min_rect_distance(st, vcfg)
            # footprint separation with most of the min_dis margin (the MPC
            # applies step 1 of plans whose constraints bind at steps >= 1,
            # so the visited-state margin can sit slightly inside min_dis)
            assert d >= 0.8 * ocfg.min_dis, \
                f"{name} violated the OBCA margin: {d:.3f} m"
        assert int(c_cv.sum()) >= 24, f"centralized conv {int(c_cv.sum())}/30"
        # both made overtaking progress: veh0 (20 m/s) gains on veh1 (10 m/s)
        gain_c = ((c_states[-1, 0, 0] - c_states[-1, 1, 0])
                  - (c_states[0, 0, 0] - c_states[0, 1, 0]))
        gain_s = ((s_states[-1, 0, 0] - s_states[-1, 1, 0])
                  - (s_states[0, 0, 0] - s_states[0, 1, 0]))
        assert gain_c > 15.0, f"centralized overtake stalled: {gain_c:.1f} m"
        assert gain_s > 8.0, f"consensus overtake stalled: {gain_s:.1f} m"
        # cost comparability: the decomposition tracks worse than the joint
        # solve in the conflict basin, but boundedly so
        ref_pos = np.moveaxis(np.asarray(cen.refs), 1, 0)[:31, :, :2]
        cost_c = float(np.sum((c_states[:, :, :2] - ref_pos) ** 2))
        cost_s = float(np.sum((s_states[:, :, :2] - ref_pos) ** 2))
        assert cost_c <= cost_s <= 8.0 * cost_c, (cost_c, cost_s)
