"""Dense linear solves that work in every (backend, dtype) combination.

TPU XLA implements LuDecomposition only for f32/c64 — a plain
``jnp.linalg.solve`` on f64 operands fails to compile there.
:func:`dense_solve` routes that one case through a mixed-precision scheme
— Jacobi equilibration, f32 LU factorization of the well-scaled matrix,
then f64 iterative refinement — and is a byte-for-byte
``jnp.linalg.solve`` everywhere else (CPU f64 paths and all f32 paths are
untouched). Accuracy: after equilibration the factored matrix carries the
*structure* condition only, so the refinement passes recover ~f64-level
residuals for the planner KKT systems; verified against CPU f64 in
``tests/test_ip_staged.py``. (Running the WHOLE flagship program under
TPU f64 emulation crashes the v5e worker — round-4 commit e6b69b5 — so
since round 5 the flagship runs f32-on-TPU instead, enabled by
:func:`equil_solve` below; see PARITY.md "Flagship TPU residency".)
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


def gj_solve(a, b):
    """Batched dense solve by in-XLA Gauss-Jordan elimination, NO custom
    call (A/B candidate for the TPU hot path — VERDICT r4 next #8).

    XLA:TPU lowers ``jnp.linalg.solve`` to a LuDecomposition custom call
    that serializes tiny batched systems; this is the same no-pivoting
    elimination the block-Thomas f32 path effectively relies on (stability
    comes from Ruiz equilibration + refinement in :func:`equil_solve` /
    the staged solver, not from pivoting), expressed as n fused
    rank-1-update steps that vectorize over the batch on the VPU.
    ``b`` may be a vector or matrix of right-hand sides.
    """
    vec = b.ndim == a.ndim - 1
    if vec:
        b = b[..., None]
    n = a.shape[-1]
    aug = jnp.concatenate([a, b], axis=-1)            # [..., n, n+k]

    def body(j, aug):
        piv = jax.lax.dynamic_index_in_dim(aug, j, axis=-2,
                                           keepdims=False)   # [..., n+k]
        pjj = jax.lax.dynamic_index_in_dim(piv, j, axis=-1,
                                           keepdims=True)
        pjj = jnp.where(jnp.abs(pjj) > 1e-30, pjj,
                        jnp.where(pjj >= 0, 1e-30, -1e-30))
        piv = piv / pjj
        factors = jax.lax.dynamic_index_in_dim(aug, j, axis=-1,
                                               keepdims=False)  # [..., n]
        upd = aug - factors[..., :, None] * piv[..., None, :]
        row_mask = (jnp.arange(n) == j)[:, None]      # keep pivot row
        return jnp.where(row_mask, piv[..., None, :], upd)

    aug = jax.lax.fori_loop(0, n, body, aug)
    x = aug[..., :, n:]
    return x[..., 0] if vec else x


def equil_solve(a, b):
    """Ruiz-equilibrated ``dense_solve`` + one refinement pass.

    The f32 robustness primitive (VERDICT r4 next #1a): planner KKT blocks
    mix O(1e6)-scaled prox/penalty curvature rows with O(1) constraint rows
    and near-zero regularized multiplier diagonals — raw f32 LU loses the
    small-block solution entirely. One symmetric max-abs (Ruiz) pass brings
    every row/col to O(1) before factorization: solve (DAD) y = D b,
    x = D y. A single f32 refinement step on the *equilibrated* system
    recovers ~1e-6 relative residuals on the staged planner blocks
    (measured; tests/test_ip_staged.py pins f32 parity).

    ``b`` may be a vector or a matrix of right-hand sides.
    """
    vec = b.ndim == a.ndim - 1
    if vec:
        b = b[..., None]
    r = jnp.max(jnp.abs(a), axis=-1)
    d = 1.0 / jnp.sqrt(jnp.clip(r, 1e-30, None))
    a_s = a * d[..., :, None] * d[..., None, :]
    c = b * d[..., :, None]
    y = dense_solve(a_s, c)
    y = y + dense_solve(a_s, c - a_s @ y)
    x = y * d[..., :, None]
    return x[..., 0] if vec else x
