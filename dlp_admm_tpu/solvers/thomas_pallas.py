"""Pallas fused block-Thomas kernel — the SURVEY §7.4 A/B (VERDICT r4 #8).

One kernel per 128-lane batch tile executes the ENTIRE forward-eliminate /
back-substitute recursion of the symmetric block-tridiagonal solve that
:func:`..solvers.ip_staged.block_thomas_solve` expresses as a ``lax.scan``
of LU custom calls. Layout puts the batch in the LAST (lane) dimension —
``diag [T, B, B, G]`` — so every elimination step is a [B, *, G] VPU
elementwise op vectorized across the full lane width, and the per-stage
[B, B] "matmuls" are B-term static unrolls of broadcast multiply-adds
(B ~ 19-43 is far below the 128x128 MXU tile, so the MXU is useless here
either way; the contest is XLA's scan+LuDecomposition-custom-call against
one fused VPU kernel).

Stability matches the production f32 path's assumptions: NO pivoting —
callers equilibrate + iteratively refine (``equil_solve`` does both for
the XLA path; the harness ``tools/exp_thomas_ab.py`` measures both raw
and refined variants).

Measured on the v5e (tools/exp_thomas_ab.py, round 5; equil = the
production XLA scan path, gj = scan + in-XLA Gauss-Jordan, pl = this
kernel; ms per solve, 20-rep mean):

    S=  2 T=7 B=19:  equil 0.033   gj 0.043   pallas 0.038
    S= 32 T=7 B=19:  equil 2.741   gj 2.627   pallas 2.007
    S=256 T=7 B=19:  equil 11.229  gj 1.756   pallas 2.016
    S= 32 T=7 B=43:  equil 4.632   gj 3.061   pallas 1.581

Verdict: at the single-scenario flagship shape (S = V = 2) the three are
a ~0.04 ms latency-bound tie and the block solve is ~15% of an ADMM
iteration — so the production staged IP keeps the XLA path (simpler, and
`vmap`-ing a pallas_call inside the sharded while_loop is exactly the
kind of program the v5e toolchain has kernel-faulted on this round). At
fleet batch (S >= 32) this kernel wins up to 2.9x and the LU custom call
falls off a cliff (6x at S = 256) — the measured record for when the
batched OBCA path becomes solve-bound.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

G_TILE = 128


def _thomas_kernel(t: int, b: int, diag_ref, up_ref, rhs_ref, out_ref,
                   xs_ref, ys_ref):
    """One batch tile: diag [T,B,B,G], up [T,B,B,G] (entry T-1 unused),
    rhs [T,B,G] -> out [T,B,G]. xs/ys are VMEM scratch carrying the
    eliminated blocks for the backward pass."""
    g = diag_ref.shape[-1]
    dtype = diag_ref.dtype

    def matTvec_stage(u, x):
        """u^T @ x per lane: u, x [B, B, G] -> [B, B, G] (sum over rows)."""
        acc = jnp.zeros((b, b, g), dtype)
        for a in range(b):
            acc = acc + u[a][:, None, :] * x[a][None, :, :]
        return acc

    def matTvec_vec(u, y):
        """u^T @ y per lane: u [B, B, G], y [B, G] -> [B, G]."""
        acc = jnp.zeros((b, g), dtype)
        for a in range(b):
            acc = acc + u[a] * y[a][None, :]
        return acc

    # forward elimination
    x_prev = jnp.zeros((b, b, g), dtype)
    y_prev = jnp.zeros((b, g), dtype)
    for k in range(t):
        d_k = diag_ref[k]
        r_k = rhs_ref[k]
        if k == 0:
            c_k = d_k
            g_k = r_k
        else:
            u_km1 = up_ref[k - 1]
            c_k = d_k - matTvec_stage(u_km1, x_prev)
            g_k = r_k - matTvec_vec(u_km1, y_prev)
        u_k = up_ref[k] if k < t - 1 else jnp.zeros((b, b, g), dtype)
        # aug = [C | U | g] -> Gauss-Jordan, no pivoting (see module doc)
        aug = jnp.concatenate([c_k, u_k, g_k[:, None, :]], axis=1)
        for j in range(b):
            piv = aug[j]                                   # [2B+1, G]
            pjj = piv[j]
            pjj = jnp.where(jnp.abs(pjj) > 1e-30, pjj,
                            jnp.where(pjj >= 0, 1e-30, -1e-30))
            piv = piv / pjj[None, :]
            factors = aug[:, j, :]                         # [B, G]
            upd = aug - factors[:, None, :] * piv[None, :, :]
            row = (jax.lax.broadcasted_iota(jnp.int32, (b, 1, 1), 0) == j)
            aug = jnp.where(row, piv[None, :, :], upd)
        x_prev = aug[:, b:2 * b, :]                        # C^-1 U
        y_prev = aug[:, 2 * b, :]                          # C^-1 g
        xs_ref[k] = x_prev
        ys_ref[k] = y_prev

    # back substitution
    z_next = jnp.zeros((b, g), dtype)
    for k in range(t - 1, -1, -1):
        x_k = xs_ref[k]
        y_k = ys_ref[k]
        acc = jnp.zeros((b, g), dtype)
        for a in range(b):
            acc = acc + x_k[:, a, :] * z_next[a][None, :]
        z_k = y_k - acc
        out_ref[k] = z_k
        z_next = z_k


@functools.partial(jax.jit, static_argnames=())
def block_thomas_solve_pallas(diag, upper, rhs):
    """Batched block-tridiagonal solve, Pallas-fused.

    ``diag [S, T, B, B]``, ``upper [S, T-1 or T, B, B]``, ``rhs [S, T, B]``
    -> ``[S, T, B]``. Semantics match vmapped
    :func:`..solvers.ip_staged.block_thomas_solve` without pivoting.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    s, t, b = rhs.shape
    if upper.shape[1] < t:
        upper = jnp.concatenate(
            [upper, jnp.zeros((s, 1, b, b), rhs.dtype)], axis=1)
    g = min(G_TILE, s) if s % min(G_TILE, s) == 0 else G_TILE
    pad = (-s) % g
    if pad:
        eye = jnp.broadcast_to(jnp.eye(b, dtype=rhs.dtype),
                               (pad, t, b, b))
        diag = jnp.concatenate([diag, eye], axis=0)
        upper = jnp.concatenate(
            [upper, jnp.zeros((pad, t, b, b), rhs.dtype)], axis=0)
        rhs = jnp.concatenate([rhs, jnp.zeros((pad, t, b), rhs.dtype)],
                              axis=0)
    s_pad = s + pad
    # lanes-last layout
    diag_t = jnp.moveaxis(diag, 0, -1)                     # [T, B, B, S]
    up_t = jnp.moveaxis(upper, 0, -1)
    rhs_t = jnp.moveaxis(rhs, 0, -1)                       # [T, B, S]

    kern = functools.partial(_thomas_kernel, t, b)
    out = pl.pallas_call(
        kern,
        interpret=jax.default_backend() == "cpu",
        grid=(s_pad // g,),
        in_specs=[
            pl.BlockSpec((t, b, b, g), lambda i: (0, 0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t, b, b, g), lambda i: (0, 0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t, b, g), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((t, b, g), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t, b, s_pad), rhs.dtype),
        scratch_shapes=[
            pltpu.VMEM((t, b, b, g), rhs.dtype),
            pltpu.VMEM((t, b, g), rhs.dtype),
        ],
    )(diag_t, up_t, rhs_t)
    return jnp.moveaxis(out, -1, 0)[:s]
