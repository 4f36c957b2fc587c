"""ADMM residuals and stopping rules (SURVEY.md C13).

* classic (stacked) form — ref ``casadi_old_PI_ADMM/main.py:153-161``:
  ``r_k = ||pos - hat||_F``, ``s_k = ||rho (hat_prev - hat)||_F`` over the
  whole stacked state; stop when ``r <= eps_pri`` and ``s <= eps_dual`` (and
  optionally min distance > dis_thres).
* per-edge form — ref ``casadi/main.py:164-178`` and MATLAB ``:193-203``:
  sums of ``2 * ||.||_F`` per *active* pair.
"""
from __future__ import annotations

import jax.numpy as jnp


def stacked_residuals(pos, hat_pos, last_hat, rho):
    """Frobenius residuals over the stacked [V, 2, H+1] tensors."""
    r = jnp.sqrt(jnp.sum((pos - hat_pos) ** 2))
    s = jnp.sqrt(jnp.sum((rho * (last_hat - hat_pos)) ** 2))
    return r, s


def per_edge_residuals(pos_i, hat_i, last_hat_i, rho, active):
    """Masked per-pair residual sums.

    ``pos_i/hat_i/last_hat_i``: ``[P, 2, H+1]`` i-side tensors per pair;
    ``active``: ``[P]`` mask. Ref ``casadi/main.py:165-173`` counts each
    active pair with weight 2 (both ordered directions).
    """
    r_p = 2.0 * jnp.sqrt(jnp.sum((pos_i - hat_i) ** 2, axis=(-2, -1)))
    s_p = 2.0 * jnp.sqrt(jnp.sum((rho * (last_hat_i - hat_i)) ** 2,
                                 axis=(-2, -1)))
    w = active.astype(pos_i.dtype)
    return jnp.sum(w * r_p), jnp.sum(w * s_p)


def min_pair_distance(x, y, num_veh):
    """Minimum over time and pairs of inter-vehicle distance.

    ``x, y``: ``[V, H+1]`` predicted positions.
    Ref ``casadi_old_PI_ADMM/main.py:129-134`` (2-vehicle case generalized).
    """
    from ..ops.pairs import pair_gather
    xi, xj = pair_gather(x, num_veh)
    yi, yj = pair_gather(y, num_veh)
    d = jnp.sqrt((xi - xj) ** 2 + (yi - yj) ** 2)
    return jnp.min(d)
