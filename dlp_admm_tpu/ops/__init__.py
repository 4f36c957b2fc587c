"""Compute kernels: geometry, dynamics, pair indexing (pure JAX, vmap-ready)."""
from . import dynamics, geometry, pairs  # noqa: F401
