"""Coordination layer: dual-update strategies, residuals, stopping rules."""
from .dual_update import DualState, init_dual_state, update_dual  # noqa: F401
from .residuals import (  # noqa: F401
    min_pair_distance,
    per_edge_residuals,
    stacked_residuals,
)
