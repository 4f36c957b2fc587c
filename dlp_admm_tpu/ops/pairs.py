"""Collision-pair indexing and masked pairwise reductions.

The reference stores per-ordered-pair duals/consensus cells in object arrays
and enumerates active pairs with ``np.where(edge_mat == 1)``
(``casadi/main.py:108-162``). On TPU that data-dependent gather is replaced by
dense ``[P, ...]`` tensors over *all* unordered pairs plus a boolean activity
mask — compute everything, zero the inactive lanes (SURVEY.md §7 hard part 2/5).

At 16 vehicles this is P=120 unordered / 240 ordered pair slots, laid out as
dense tensors with precomputed index maps; per-vehicle aggregation of pair
quantities is a segment-sum expressed as one-hot matmuls (MXU-friendly).
"""
from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def pair_indices(num_veh: int):
    """Static (i, j) index arrays of the P = n(n-1)/2 unordered pairs, i < j.

    Returned as **numpy** arrays: they are static metadata used to build
    gathers inside jitted code — caching device arrays here would leak tracers
    through the lru_cache.
    """
    return np.triu_indices(num_veh, k=1)


def num_pairs(num_veh: int) -> int:
    return num_veh * (num_veh - 1) // 2


def pair_gather(per_vehicle: jnp.ndarray, num_veh: int):
    """Gather per-vehicle tensors to per-pair (left, right) tensors.

    ``per_vehicle`` has leading vehicle axis ``[V, ...]``; returns two
    ``[P, ...]`` tensors for the i- and j- side of each pair. This is the
    TPU-native form of reading ``pos_old[2*veh1:2*(veh1+1)]`` etc. per active
    edge (``casadi/main.py:130``).
    """
    idx_i, idx_j = pair_indices(num_veh)
    return per_vehicle[idx_i], per_vehicle[idx_j]


@functools.lru_cache(maxsize=None)
def _scatter_matrices(num_veh: int):
    """One-hot [P, V] matrices mapping pair slots to their member vehicles."""
    idx_i, idx_j = np.triu_indices(num_veh, k=1)
    p = len(idx_i)
    m_i = np.zeros((p, num_veh), dtype=np.float32)
    m_j = np.zeros((p, num_veh), dtype=np.float32)
    m_i[np.arange(p), idx_i] = 1.0
    m_j[np.arange(p), idx_j] = 1.0
    return jnp.asarray(m_i), jnp.asarray(m_j)


def pair_scatter_sum(per_pair_i: jnp.ndarray, per_pair_j: jnp.ndarray,
                     num_veh: int) -> jnp.ndarray:
    """Sum per-pair contributions back onto vehicles (segment-sum).

    ``per_pair_i[p]`` is the contribution of pair p to its i-side vehicle and
    ``per_pair_j[p]`` to its j-side vehicle; returns ``[V, ...]`` totals.
    Expressed as one-hot matmuls so XLA maps it onto the MXU and, under a
    sharded vehicle axis, a reduce-scatter (SURVEY.md §2.3 axis 2).
    """
    m_i, m_j = _scatter_matrices(num_veh)
    flat_i = per_pair_i.reshape(per_pair_i.shape[0], -1)
    flat_j = per_pair_j.reshape(per_pair_j.shape[0], -1)
    out = m_i.T @ flat_i + m_j.T @ flat_j
    return out.reshape((num_veh,) + per_pair_i.shape[1:])


def proximity_mask(x: jnp.ndarray, y: jnp.ndarray, dis_thres: float,
                   num_veh: int) -> jnp.ndarray:
    """Active-pair mask: pair (i, j) is active iff the predicted trajectories
    come within ``dis_thres`` anywhere in the horizon.

    Port of the ``edge_mat`` build (``casadi/main.py:110-116``): the reference
    compares *squared* distance against the (unsquared) threshold; we keep that
    exact semantic for parity.

    Args:
        x, y: ``[V, H+1]`` predicted positions per vehicle.

    Returns:
        ``[P]`` boolean mask over unordered pairs.
    """
    xi, xj = pair_gather(x, num_veh)
    yi, yj = pair_gather(y, num_veh)
    d2 = (xi - xj) ** 2 + (yi - yj) ** 2
    return jnp.any(d2 < dis_thres, axis=-1)
