"""dlp_admm_tpu: TPU-native distributed local motion planning with PI-ADMM.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the reference
``KaigeTan/Distributed-Local-Planner-PI-ADMM`` (see SURVEY.md): consensus-ADMM
and PI-ADMM trajectory optimization for connected autonomous vehicles with
OBCA polytope collision avoidance, plus centralized / bilevel / tightening /
ALADIN formulations — redesigned TPU-first:

* batched interior-point and OSQP-style QP solvers replace IPOPT/OSQP
* vehicles / collision pairs / scenarios are mesh axes (vmap / shard_map)
* fixed-iteration loops with convergence masks keep all shapes static
"""
from . import config, scenarios  # noqa: F401
from .config import (  # noqa: F401
    DualStrategy,
    DualUpdateConfig,
    Formulation,
    ObcaConfig,
    PiAdmmConfig,
    SolverConfig,
    VehicleConfig,
    WindupMode,
)

__version__ = "0.1.0"
