"""dlp_admm_tpu: TPU-native distributed local motion planning with PI-ADMM.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the reference
``KaigeTan/Distributed-Local-Planner-PI-ADMM`` (see SURVEY.md): consensus-ADMM
and PI-ADMM trajectory optimization for connected autonomous vehicles with
OBCA polytope collision avoidance, plus centralized / bilevel / tightening /
ALADIN formulations — redesigned TPU-first:

* batched interior-point and OSQP-style QP solvers replace IPOPT/OSQP
* vehicles / collision pairs / scenarios are mesh axes (vmap / shard_map)
* fixed-iteration loops with convergence masks keep all shapes static

Importing the package sets JAX's default matmul precision to full float32
(overridable with ``DLP_ADMM_TPU_MATMUL_PRECISION``): on TPU the MXU default
is bf16 passes with ~1e-2 relative error, which is fine for neural nets but
corrupts the solvers' near-singular KKT systems (NaN Cholesky factors,
residuals that never reach tolerance). The planner's matmuls are tiny — the
accuracy is free; hot kernels opt back in to bf16 explicitly where safe.
"""
import os as _os

import jax as _jax

if not _os.environ.get("DLP_ADMM_TPU_MATMUL_PRECISION_KEEP"):
    _jax.config.update(
        "jax_default_matmul_precision",
        _os.environ.get("DLP_ADMM_TPU_MATMUL_PRECISION", "float32"))

from . import config, scenarios  # noqa: F401,E402
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
