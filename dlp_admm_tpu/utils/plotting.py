"""Trajectory + footprint plots — the reference's de-facto test oracle.

Every reference driver ends with a matplotlib scatter of both vehicles'
paths and (in the OBCA line) their rectangle footprints via pypoman
(``decentralized_overtaking_ADMM.py:104-123``, ``casadi/main.py:205-220``).
matplotlib is optional (``pip extra [viz]``); all functions no-op gracefully
without it.
"""
from __future__ import annotations

import numpy as np

from ..config import VehicleConfig
from ..ops.geometry import vehicle_vertices

_COLORS = ["tab:blue", "tab:red", "tab:green", "tab:orange", "tab:purple",
           "tab:brown", "tab:pink", "tab:gray"]


def _plt():
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        return plt
    except ImportError:  # pragma: no cover
        return None


def plot_trajectories(states: np.ndarray, path: str,
                      cfg: VehicleConfig = VehicleConfig(),
                      footprints: bool = True, title: str = ""):
    """``states [T, V, >=2]`` (x, y, ...) -> PNG at ``path``.

    Draws per-vehicle paths and (optionally) the rectangle footprint at each
    recorded state — the visual non-overlap oracle of SURVEY.md §4.
    """
    plt = _plt()
    if plt is None:
        return None
    states = np.asarray(states)
    t, v = states.shape[:2]
    fig, ax = plt.subplots(figsize=(10, 6))
    for i in range(v):
        c = _COLORS[i % len(_COLORS)]
        ax.plot(states[:, i, 0], states[:, i, 1], "o-", ms=2.5, lw=0.8,
                color=c, label=f"vehicle {i}")
        if footprints and states.shape[-1] >= 4:
            for k in range(0, t, max(t // 20, 1)):
                verts = np.asarray(vehicle_vertices(states[k, i], cfg))
                poly = np.vstack([verts, verts[:1]])
                ax.plot(poly[:, 0], poly[:, 1], color=c, lw=0.5, alpha=0.5)
    ax.set_xlabel("x [m]")
    ax.set_ylabel("y [m]")
    ax.set_title(title)
    ax.legend()
    ax.set_aspect("equal", adjustable="datalim")
    fig.savefig(path, dpi=120, bbox_inches="tight")
    plt.close(fig)
    return path


def plot_iteration_history(iter_history, path: str, title: str = ""):
    """ADMM iterations per MPC step (`iter_his` plot)."""
    plt = _plt()
    if plt is None:
        return None
    fig, ax = plt.subplots(figsize=(8, 3))
    ax.bar(np.arange(len(iter_history)), iter_history, color="tab:blue")
    ax.set_xlabel("MPC step")
    ax.set_ylabel("ADMM iterations")
    ax.set_title(title)
    fig.savefig(path, dpi=120, bbox_inches="tight")
    plt.close(fig)
    return path
