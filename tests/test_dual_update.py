"""Dual-update strategy tests vs hand-computed oracles (SURVEY.md C11)."""
import dataclasses

import jax.numpy as jnp
import numpy as np

from dlp_admm_tpu.config import DualStrategy, DualUpdateConfig, WindupMode
from dlp_admm_tpu.coordination.dual_update import (DualState, init_dual_state,
                                                   update_dual)


def mk_state(dual, sum_err, diff, rho=1.0):
    return DualState(jnp.asarray(dual, jnp.float64),
                     jnp.asarray(sum_err, jnp.float64),
                     jnp.asarray(diff, jnp.float64),
                     jnp.asarray(rho, jnp.float64))


class TestPlain:
    def test_dual_ascent(self):
        cfg = DualUpdateConfig(strategy=DualStrategy.PLAIN,
                               windup=WindupMode.NONE, adaptive_rho=False)
        st = mk_state([1.0, -2.0], [0.0, 0.0], [0.0, 0.0], rho=2.0)
        r = jnp.array([0.5, 1.0])
        out = update_dual(st, r, jnp.asarray(10.0), cfg)
        # lam += rho*r (+ diff_val which is 0)
        np.testing.assert_allclose(np.asarray(out.dual), [2.0, 0.0])
        np.testing.assert_allclose(float(out.rho), 2.0)

    def test_plain_with_saturation_and_backcalc(self):
        """ref casadi_old_PI_ADMM/main.py:139,144-151 (trad==1 path)."""
        cfg = DualUpdateConfig(strategy=DualStrategy.PLAIN,
                               windup=WindupMode.SAT_BACKCALC,
                               windup_sat=3.0, adaptive_rho=False)
        st = mk_state([2.0], [0.0], [0.0], rho=2.0)
        out = update_dual(st, jnp.array([1.0]), jnp.asarray(10.0), cfg)
        # raw = 2 + 2*1 = 4 -> clipped to 3, diff = -1
        np.testing.assert_allclose(np.asarray(out.dual), [3.0])
        np.testing.assert_allclose(np.asarray(out.diff_val), [-1.0])
        # next update: raw = 3 + 2*0 + (-1) = 2, no clip, diff resets
        out2 = update_dual(out, jnp.array([0.0]), jnp.asarray(10.0), cfg)
        np.testing.assert_allclose(np.asarray(out2.dual), [2.0])
        np.testing.assert_allclose(np.asarray(out2.diff_val), [0.0])


class TestPiReciprocal:
    CFG = DualUpdateConfig(strategy=DualStrategy.PI_RECIPROCAL,
                           windup=WindupMode.SAT_BACKCALC, windup_sat=20.0,
                           kp_num=5.0, kp_cap=2.5, ki=3.0, backcalc_gain=2.0,
                           adaptive_rho=True, rho_num=4.0, rho_lo=1.0,
                           rho_hi=5.0)

    def test_gains_and_integrator_ordering(self):
        """Oracle: ref casadi_old_PI_ADMM/main.py:135-151 —
        lam = sum_err + K_P r (OLD sum_err); sum_err += K_I r + 2 diff."""
        st = mk_state([0.0], [1.0], [0.5], rho=1.0)
        r = jnp.array([2.0])
        d = jnp.asarray(4.0)  # K_P = min(5/4, 2.5) = 1.25; rho = 1
        out = update_dual(st, r, d, self.CFG)
        np.testing.assert_allclose(np.asarray(out.dual), [1.0 + 1.25 * 2.0])
        np.testing.assert_allclose(np.asarray(out.sum_err),
                                   [1.0 + 3.0 * 2.0 + 2.0 * 0.5])
        np.testing.assert_allclose(float(out.rho), 1.0)

    def test_kp_cap_and_adaptive_rho(self):
        st = init_dual_state((1,), 1.0, jnp.float64)
        out = update_dual(st, jnp.array([1.0]), jnp.asarray(0.5), self.CFG)
        # d = 0.5: K_P = min(10, 2.5) = 2.5; rho = clip(8, 1, 5) = 5
        np.testing.assert_allclose(np.asarray(out.dual), [2.5])
        np.testing.assert_allclose(float(out.rho), 5.0)
        # far apart: rho floors at 1
        out2 = update_dual(st, jnp.array([1.0]), jnp.asarray(100.0), self.CFG)
        np.testing.assert_allclose(float(out2.rho), 1.0)

    def test_saturation_elementwise_backcalc(self):
        st = mk_state([0.0, 0.0], [30.0, 1.0], [0.0, 0.0])
        out = update_dual(st, jnp.array([0.0, 0.0]), jnp.asarray(10.0),
                          self.CFG)
        np.testing.assert_allclose(np.asarray(out.dual), [20.0, 1.0])
        np.testing.assert_allclose(np.asarray(out.diff_val), [-10.0, 0.0])

    def test_adaptive_ki_schedule(self):
        """Oracle: the MATLAB adp sub-variant
        (ADMM_CVX_two_veh_intesection_adp_PI_antiwindup1.m:116-148) also
        schedules the integrator gain: K_I = 3/d_min (its K_P cap is 3).
        VERDICT r4 missing #4."""
        cfg = dataclasses.replace(self.CFG, ki_adaptive=True, ki_num=3.0,
                                  kp_cap=3.0)
        st = mk_state([0.0], [1.0], [0.5], rho=1.0)
        r = jnp.array([2.0])
        d = jnp.asarray(1.5)   # K_P = min(5/1.5, 3) = 3; K_I = 3/1.5 = 2
        out = update_dual(st, r, d, cfg)
        np.testing.assert_allclose(np.asarray(out.dual), [1.0 + 3.0 * 2.0])
        np.testing.assert_allclose(np.asarray(out.sum_err),
                                   [1.0 + 2.0 * 2.0 + 2.0 * 0.5])
        # ki_adaptive=False keeps the Python port's fixed K_I = 3
        out2 = update_dual(st, r, d, dataclasses.replace(cfg,
                                                         ki_adaptive=False))
        np.testing.assert_allclose(np.asarray(out2.sum_err),
                                   [1.0 + 3.0 * 2.0 + 2.0 * 0.5])

    def test_per_pair_dmin_scalar_rho(self):
        """Per-pair d_min: K_P elementwise, rho governed by the global min."""
        st = init_dual_state((2, 3), 1.0, jnp.float64)
        r = jnp.ones((2, 3))
        d = jnp.array([[10.0], [1.0]])  # broadcast per row
        out = update_dual(st, r, d, self.CFG)
        np.testing.assert_allclose(np.asarray(out.dual[0]), 0.5)   # 5/10
        np.testing.assert_allclose(np.asarray(out.dual[1]), 2.5)   # cap
        np.testing.assert_allclose(float(out.rho), 4.0)            # 4/1


class TestPiSigmoid:
    CFG = DualUpdateConfig(strategy=DualStrategy.PI_SIGMOID,
                           windup=WindupMode.SAT_BACKCALC, windup_sat=30.0,
                           sigmoid_th1=5.0, sigmoid_th2=3.0, ki=3.0,
                           adaptive_rho=False)

    def test_integrator_first_ordering(self):
        """Oracle: ref ADMM_CVX_..._PI_antiwindup.m:160-167 —
        sum_err += kI r + diff (gain 1); lam = NEW sum_err + kP r."""
        st = mk_state([0.0], [1.0], [0.5], rho=3.0)
        r = jnp.array([2.0])
        d = jnp.asarray(0.0)  # kP = 5 - 3/(1+1) = 3.5
        out = update_dual(st, r, d, self.CFG)
        expect_sum = 1.0 + 3.0 * 2.0 + 0.5
        np.testing.assert_allclose(np.asarray(out.sum_err), [expect_sum])
        np.testing.assert_allclose(np.asarray(out.dual),
                                   [expect_sum + 3.5 * 2.0])

    def test_kp_schedule_limits(self):
        cfg = self.CFG
        st = init_dual_state((1,), 3.0, jnp.float64)
        # far apart: kP -> th1 - th2 = 2 (1/(1+exp(-d)) -> 1); the schedule
        # raises the gain as vehicles close in (kP -> th1 - th2/2 = 3.5 at 0)
        far = update_dual(st, jnp.array([1.0]), jnp.asarray(50.0), cfg)
        # sum_err = 0 + ki*1 = 3; dual = 3 + 2*1 = 5
        np.testing.assert_allclose(np.asarray(far.dual), [5.0], rtol=1e-6)
        near = update_dual(st, jnp.array([1.0]), jnp.asarray(0.0), cfg)
        np.testing.assert_allclose(np.asarray(near.dual), [6.5], rtol=1e-6)

    def test_ki_from_rho_coupling(self):
        """ref ...PI_antiwindup.m:21 sets param.kI = param.rho: with
        ki_from_rho=True (default) the integrator gain follows rho even when
        cfg.ki says otherwise."""
        cfg = DualUpdateConfig(strategy=DualStrategy.PI_SIGMOID,
                               windup=WindupMode.NONE, sigmoid_th1=5.0,
                               sigmoid_th2=3.0, ki=999.0, adaptive_rho=False,
                               ki_from_rho=True)
        st = mk_state([0.0], [0.0], [0.0], rho=3.5)
        out = update_dual(st, jnp.array([1.0]), jnp.asarray(50.0), cfg)
        # sum_err = 3.5 * 1; kP -> 2; dual = 3.5 + 2
        np.testing.assert_allclose(np.asarray(out.sum_err), [3.5])
        np.testing.assert_allclose(np.asarray(out.dual), [5.5], rtol=1e-6)
        # ki_from_rho=False restores the fixed gain
        cfg2 = dataclasses.replace(cfg, ki=1.0, ki_from_rho=False)
        out2 = update_dual(st, jnp.array([1.0]), jnp.asarray(50.0), cfg2)
        np.testing.assert_allclose(np.asarray(out2.sum_err), [1.0])

    def test_windup_sat_only_mode(self):
        cfg = DualUpdateConfig(strategy=DualStrategy.PI_SIGMOID,
                               windup=WindupMode.SAT, windup_sat=2.0,
                               sigmoid_th1=5.0, sigmoid_th2=3.0, ki=3.0,
                               adaptive_rho=False)
        st = init_dual_state((1,), 3.0, jnp.float64)
        out = update_dual(st, jnp.array([10.0]), jnp.asarray(50.0), cfg)
        np.testing.assert_allclose(np.asarray(out.dual), [2.0])
        # SAT mode: no back-calculation feed
        np.testing.assert_allclose(np.asarray(out.diff_val), [0.0])
