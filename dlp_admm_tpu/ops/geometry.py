"""Polytope geometry kernels: vehicle footprints and halfspace representations.

TPU-native re-implementation of ``Distributed_planner/decentralized/util.py``:

* :func:`vehicle_vertices`        — ref ``util.py:12-46``  (``generate_vehicle_vertices``)
* :func:`halfspaces_from_vertices`— ref ``util.py:48-68``  (``compute_square_halfspaces_ca``)
* :func:`halfspaces_rot`          — ref ``util.py:103-127``(``..._ca_rot``)
* :func:`halfspaces_prob`         — ref ``util.py:70-101`` (``..._ca_prob`` — the
  chance-constrained communication-delay tightening, Cantelli-style)

The reference builds these per-edge with 4-iteration Python loops inside CasADi
graphs; here they are closed-form vectorized ops over an arbitrary batch
prefix, so they vmap over (scenario, vehicle, horizon) axes and fuse into the
surrounding solver kernels under XLA.

Halfspace convention (matching the reference): the rectangle is
``{p : A @ p <= b}`` with 4 rows, each row an outward unit normal.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..config import VehicleConfig


def normalize_angle(angle: jnp.ndarray) -> jnp.ndarray:
    """Wrap angles to (-pi, pi] (ref ``util.py:6-10``)."""
    two_pi = 2.0 * jnp.pi
    a = jnp.mod(jnp.mod(angle, two_pi) + two_pi, two_pi)
    return jnp.where(a > jnp.pi, a - two_pi, a)


def vehicle_vertices(state: jnp.ndarray, cfg: VehicleConfig = VehicleConfig(),
                     base_link: bool = False) -> jnp.ndarray:
    """Rectangle corner points of a vehicle at ``state``.

    ``state[..., 0]``/``[..., 1]`` are the position and ``state[..., 3]`` the
    heading, exactly as in ``util.py:12-19`` (velocity/steer are ignored).
    Returns ``[..., 4, 2]`` corners in the reference's order
    (front-left, front-right, rear-right, rear-left w.r.t. travel direction).
    """
    x, y, heading = state[..., 0], state[..., 1], state[..., 3]
    c, s = jnp.cos(heading), jnp.sin(heading)
    if base_link:
        fwd, back = cfg.baselink_to_front, cfg.baselink_to_rear
    else:
        fwd = back = cfg.length / 2
    half_w = cfg.width / 2
    # corners in body frame: (+fwd, +w), (+fwd, -w), (-back, -w), (-back, +w)
    # match the reference's sign pattern (util.py:34-42)
    vx = jnp.stack([x + fwd * c - half_w * s,
                    x + fwd * c + half_w * s,
                    x - back * c + half_w * s,
                    x - back * c - half_w * s], axis=-1)
    vy = jnp.stack([y + fwd * s + half_w * c,
                    y + fwd * s - half_w * c,
                    y - back * s - half_w * c,
                    y - back * s + half_w * c], axis=-1)
    return jnp.stack([vx, vy], axis=-1)


def halfspaces_from_vertices(points: jnp.ndarray):
    """Halfspace form (A, b) of a convex quadrilateral given its 4 corners.

    Vectorized port of ``util.py:48-68``: for each edge (p1 -> p2),
    ``A_row = [p1y - p2y, p2x - p1x] / n`` and ``b = (p2x*p1y - p2y*p1x) / n``
    with ``n = ||p2 - p1||``. The 4-iteration loop becomes one rolled tensor op.

    Args:
        points: ``[..., 4, 2]`` corners in cyclic order.

    Returns:
        ``(A, b)`` with shapes ``[..., 4, 2]`` and ``[..., 4]`` s.t. the
        rectangle is ``{p : A @ p <= b}``.
    """
    p1 = points
    p2 = jnp.roll(points, -1, axis=-2)
    nx = p1[..., 1] - p2[..., 1]
    ny = p2[..., 0] - p1[..., 0]
    norm = jnp.sqrt(nx * nx + ny * ny)
    a_rows = jnp.stack([nx, ny], axis=-1) / norm[..., None]
    b = (p2[..., 0] * p1[..., 1] - p2[..., 1] * p1[..., 0]) / norm
    return a_rows, b


def _rot_form(state: jnp.ndarray, cfg: VehicleConfig, base_link: bool,
              shift: jnp.ndarray | float):
    """Shared body of the rotation-matrix halfspace forms (ref util.py:91-99)."""
    x, y, heading = state[..., 0], state[..., 1], state[..., 3]
    c, s = jnp.cos(heading), jnp.sin(heading)
    # A = [R^T; -R^T], rows are unit normals of the axis-aligned body box
    a_mat = jnp.stack([
        jnp.stack([c, s], axis=-1),
        jnp.stack([-s, c], axis=-1),
        jnp.stack([-c, -s], axis=-1),
        jnp.stack([s, -c], axis=-1),
    ], axis=-2)  # [..., 4, 2]
    if base_link:
        b0 = jnp.array([cfg.baselink_to_front, cfg.width / 2,
                        cfg.baselink_to_rear, cfg.width / 2])
    else:
        b0 = jnp.array([cfg.length / 2, cfg.width / 2,
                        cfg.length / 2, cfg.width / 2])
    pos = jnp.stack([x, y], axis=-1) + shift
    b = b0 + jnp.einsum('...ij,...j->...i', a_mat, pos)
    return a_mat, b


def halfspaces_rot(state: jnp.ndarray, cfg: VehicleConfig = VehicleConfig(),
                   base_link: bool = False):
    """Rotation-matrix halfspace form ``A = [R^T; -R^T]``, ``b = b0 + A @ pos``.

    Port of ``util.py:103-127`` (``compute_square_halfspaces_ca_rot``).
    Row order differs from :func:`halfspaces_from_vertices` but describes the
    same set.
    """
    return _rot_form(state, cfg, base_link, 0.0)


def halfspaces_prob(state: jnp.ndarray, cfg: VehicleConfig = VehicleConfig(),
                    base_link: bool = False):
    """Chance-constrained halfspaces under stochastic communication delay.

    Port of ``util.py:70-101`` (``compute_square_halfspaces_ca_prob``): the
    position is shifted by the mean delay displacement ``delay_avg * v * dir``
    plus a Cantelli-style term ``sqrt(prob/(1-prob)) * (var_delay * v * dir)^2``
    before forming the rotation halfspaces, inflating the obstacle set so the
    collision constraint holds with probability >= ``cfg.prob`` despite stale
    neighbour states.
    """
    v, heading = state[..., 2], state[..., 3]
    c, s = jnp.cos(heading), jnp.sin(heading)
    delta_avg = jnp.stack([cfg.avg_delay * v * c, cfg.avg_delay * v * s], axis=-1)
    delta_var = jnp.stack([(cfg.var_delay * v * c) ** 2,
                           (cfg.var_delay * v * s) ** 2], axis=-1)
    shift = delta_avg + jnp.sqrt(cfg.prob / (1.0 - cfg.prob)) * delta_var
    return _rot_form(state, cfg, base_link, shift)


def halfspaces(state: jnp.ndarray, cfg: VehicleConfig = VehicleConfig(),
               use_delay_tightening: bool = False):
    """Dispatch used by the OBCA planners (ref optimizer.py:109-113).

    ``use_delay_tightening=False`` reproduces the vertex-based construction,
    ``True`` the chance-tightened rotation form. Both return ``A [..., 4, 2]``,
    ``b [..., 4]``.
    """
    if use_delay_tightening:
        return halfspaces_prob(state, cfg)
    return halfspaces_from_vertices(vehicle_vertices(state, cfg))
