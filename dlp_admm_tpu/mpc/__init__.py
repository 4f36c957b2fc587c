"""Receding-horizon drivers."""
from .driver import RunResult, run_obca, run_pi_admm  # noqa: F401
