"""Dense linear solves that work in every (backend, dtype) combination.

TPU XLA implements LuDecomposition only for f32/c64 — a plain
``jnp.linalg.solve`` on f64 operands fails to compile there (the OBCA IP
solvers need f64: the elastic/tracking weight spread of ~1e7 puts KKT
condition numbers beyond f32, measured as nlp_ok=0 / kkt_max~5e2 on the
42-step flagship run in f32). :func:`dense_solve` routes that one case
through a mixed-precision scheme — Jacobi equilibration, f32 LU
factorization of the well-scaled matrix, then f64 iterative refinement —
and is a byte-for-byte ``jnp.linalg.solve`` everywhere else (CPU f64 paths
and all f32 paths are untouched).

Accuracy: after equilibration the factored matrix carries the *structure*
condition only (the 1e7 weight spread moves into the diagonal scaling),
so two refinement passes in f64 recover ~f64-level residuals for the
planner KKT systems. Verified against CPU f64 in
``tests/test_ip_staged.py``.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_REFINE_STEPS = 3


def _tpu_f64_solve(a, b):
    vec = b.ndim == a.ndim - 1
    if vec:
        b = b[..., None]
    d = jnp.sqrt(jnp.clip(jnp.abs(jnp.diagonal(a, axis1=-2, axis2=-1)),
                          1e-30, None))
    dinv = 1.0 / d
    a_s = a * dinv[..., :, None] * dinv[..., None, :]
    a32 = a_s.astype(jnp.float32)
    c = b * dinv[..., :, None]

    def f32_solve(rhs):
        return jnp.linalg.solve(a32, rhs.astype(jnp.float32)).astype(b.dtype)

    y = f32_solve(c)
    for _ in range(_REFINE_STEPS):
        r = c - a_s @ y
        y = y + f32_solve(r)
    x = y * dinv[..., :, None]
    return x[..., 0] if vec else x


def dense_solve(a, b):
    """``jnp.linalg.solve(a, b)`` on every backend/dtype, including TPU f64
    (mixed-precision equilibrated refinement — see module docstring)."""
    if a.dtype == jnp.float64 and jax.default_backend() == "tpu":
        return _tpu_f64_solve(a, b)
    return jnp.linalg.solve(a, b)
