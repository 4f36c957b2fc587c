"""Dual-update strategies for the (PI-)ADMM engines — the paper's core.

One module with the three strategies x three anti-windup modes of the
reference (SURVEY.md C11), as pure functions of
``(r, sum_err, diff_val, d_min)``:

* PLAIN          — dual ascent ``lam += rho * r``
  (ref ``matlab_old_files/ADMM_CVX_two_veh_intesection_PI_antiwindup.m:157-158``,
  ``casadi/main.py:161-162``)
* PI_SIGMOID     — ``kP = th1 - th2/(1+exp(-d_min))``, ``kI`` fixed; the
  integrator is advanced *before* the dual is formed and back-calculation is
  fed with gain 1 (ref ``...PI_antiwindup.m:160-167``)
* PI_RECIPROCAL  — ``K_P = min(kp_num/d_min, kp_cap)``, ``K_I`` fixed, optional
  adaptive ``rho = clip(rho_num/d_min, lo, hi)``; the dual is formed from the
  *previous* integrator state and back-calculation is fed with gain 2
  (ref ``casadi_old_PI_ADMM/main.py:135-151``)

Windup modes (ref ``...PI_antiwindup.m:169-188``, ``main.py:144-151``):
NONE (no clip), SAT (clip only), SAT_BACKCALC (clip + feed ``lam_sat -
lam_raw`` to the integrator next iteration). The reference zeroes the whole
``diff_val`` array when nothing clipped, which equals the elementwise
``lam_sat - lam_raw`` everywhere — we use the elementwise form.

All functions broadcast over arbitrary leading axes (vehicle / pair /
scenario), so one call updates every dual in the system.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..config import DualStrategy, DualUpdateConfig, WindupMode


class DualState(NamedTuple):
    """Carry of the dual controller between ADMM iterations."""

    dual: jnp.ndarray      # lambda (same shape as the consensus residual)
    sum_err: jnp.ndarray   # PI integrator state
    diff_val: jnp.ndarray  # anti-windup back-calculation feed
    rho: jnp.ndarray       # scalar penalty (may be adapted per iteration)


def init_dual_state(shape, rho: float, dtype=jnp.float32) -> DualState:
    z = jnp.zeros(shape, dtype)
    return DualState(dual=z, sum_err=z, diff_val=z,
                     rho=jnp.asarray(rho, dtype))


def _apply_windup(raw: jnp.ndarray, cfg: DualUpdateConfig):
    """Returns (saturated dual, back-calculation term)."""
    if cfg.windup is WindupMode.NONE:
        return raw, jnp.zeros_like(raw)
    sat = jnp.clip(raw, -cfg.windup_sat, cfg.windup_sat)
    if cfg.windup is WindupMode.SAT:
        return sat, jnp.zeros_like(raw)
    return sat, sat - raw


def update_dual(state: DualState, r: jnp.ndarray, d_min: jnp.ndarray,
                cfg: DualUpdateConfig) -> DualState:
    """One dual update; ``r`` is the consensus error ``pos - hat_pos`` and
    ``d_min`` the minimum predicted inter-vehicle distance (scalar or
    broadcastable per-pair)."""
    rho = state.rho
    if cfg.strategy is DualStrategy.PI_RECIPROCAL and cfg.adaptive_rho:
        # ref casadi_old_PI_ADMM/main.py:137: rho = max(lo, min(hi, num/d));
        # rho stays a scalar — with per-pair d_min the global minimum governs
        rho = jnp.clip(cfg.rho_num / jnp.min(d_min), cfg.rho_lo, cfg.rho_hi)
        rho = jnp.asarray(rho, state.dual.dtype)

    if cfg.strategy is DualStrategy.PLAIN:
        # ref main.py:139 (trad==1): lam += rho*r + diff_val
        raw = state.dual + rho * r + state.diff_val
        sum_err = state.sum_err
    elif cfg.strategy is DualStrategy.PI_RECIPROCAL:
        # ref main.py:135-142: K_P from previous integrator state,
        # integrator advanced after with backcalc gain 2. The MATLAB adp
        # sub-variant also schedules the integrator gain, K_I = ki_num/d
        # (ADMM_CVX_two_veh_intesection_adp_PI_antiwindup1.m:116-148) —
        # enabled by ki_adaptive (VERDICT r4 missing #4)
        k_p = jnp.minimum(cfg.kp_num / d_min, cfg.kp_cap)
        k_i = cfg.ki_num / d_min if cfg.ki_adaptive else cfg.ki
        raw = state.sum_err + k_p * r
        sum_err = state.sum_err + k_i * r + cfg.backcalc_gain * state.diff_val
    elif cfg.strategy is DualStrategy.PI_SIGMOID:
        # ref ...PI_antiwindup.m:160-167: integrator first (kI = backcalc
        # gain 1), dual formed from the advanced integrator. kP is formed
        # per-edge from that pair's min distance (kP_mat(veh1,veh2), :160) —
        # callers pass d_min broadcastable per pair; kI = rho per the
        # reference's param.kI = param.rho (:21) unless ki_from_rho=False.
        k_i = rho if cfg.ki_from_rho else cfg.ki
        k_p = cfg.sigmoid_th1 - cfg.sigmoid_th2 / (1.0 + jnp.exp(-d_min))
        sum_err = state.sum_err + k_i * r + state.diff_val
        raw = sum_err + k_p * r
    else:  # pragma: no cover
        raise ValueError(f"unknown strategy {cfg.strategy}")

    dual, diff_val = _apply_windup(raw, cfg)
    return DualState(dual=dual, sum_err=sum_err, diff_val=diff_val, rho=rho)
