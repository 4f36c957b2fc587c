"""Pallas TPU kernel: fused OSQP iteration loop.

The profiled bottleneck of the planner bench is the QP splitting iteration —
dozens of tiny matvecs per solve, each a separate XLA op on [B, n] data
(latency-bound; see bench history in the repo memory). This kernel fuses one
whole iteration segment into a single Pallas program per QP: the condensed
inverse, constraint matrix, bounds and iterates are staged in VMEM once and
``seg_len`` iterations run inside the kernel with MXU matvecs.

Used by :func:`dlp_admm_tpu.solvers.qp.solve_qp` when
``SolverConfig.qp_use_pallas`` is set (TPU only); the numerical semantics
match the XLA path modulo convergence freezing (the fused loop always runs
``seg_len`` iterations — a converged iterate is a fixed point, so results
agree to solver tolerance).

Shapes are padded to TPU tiles (n -> multiples of 128 lanes) on the host:
padded x-dims carry an identity block in the inverse and zero q; padded
constraint rows have zero A rows and infinite bounds, so the pads are exact
no-ops.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _iterate_kernel(scal_ref, kinv_ref, a_ref, at_ref, q_ref, lo_ref, hi_ref,
                    x0_ref, z0_ref, y0_ref, xo_ref, zo_ref, yo_ref, *,
                    seg_len: int):
    rho = scal_ref[0, 0]
    sigma = scal_ref[0, 1]
    alpha = scal_ref[0, 2]
    kinv = kinv_ref[:]
    a_mat = a_ref[:]
    at_mat = at_ref[:]
    q = q_ref[:]
    lo = lo_ref[:]
    hi = hi_ref[:]

    def body(_, carry):
        x, z, y = carry
        rhs = sigma * x - q + jnp.dot(at_mat, rho * z - y,
                                      preferred_element_type=jnp.float32)
        x_t = jnp.dot(kinv, rhs, preferred_element_type=jnp.float32)
        z_t = jnp.dot(a_mat, x_t, preferred_element_type=jnp.float32)
        x_new = alpha * x_t + (1.0 - alpha) * x
        z_relax = alpha * z_t + (1.0 - alpha) * z
        z_new = jnp.clip(z_relax + y / rho, lo, hi)
        y_new = y + rho * (z_relax - z_new)
        return x_new, z_new, y_new

    x, z, y = jax.lax.fori_loop(
        0, seg_len, body, (x0_ref[:], z0_ref[:], y0_ref[:]))
    xo_ref[:] = x
    zo_ref[:] = z
    yo_ref[:] = y


@functools.partial(jax.jit, static_argnames=("seg_len", "interpret"))
def osqp_iterate_fused(kkt_inv, a_mat, q, lo, hi, x, z, y, rho, sigma, alpha,
                       seg_len: int, interpret: bool = False):
    """Run ``seg_len`` OSQP iterations fused in one Pallas kernel.

    Single-QP operands (vmap for batches): ``kkt_inv [n,n]``, ``a_mat [m,n]``,
    ``q [n]``, ``lo/hi [m]``, iterates ``x [n]``, ``z/y [m]``; scalars may be
    traced. Returns updated ``(x, z, y)``.
    """
    n = q.shape[0]
    m = lo.shape[0]
    n_p = _round_up(n, 128)
    m_p = _round_up(m, 128)
    f32 = jnp.float32

    kinv_p = jnp.zeros((n_p, n_p), f32).at[:n, :n].set(kkt_inv.astype(f32))
    # identity on padded x-dims keeps them at zero through the iteration
    kinv_p = kinv_p.at[jnp.arange(n, n_p), jnp.arange(n, n_p)].set(1.0)
    a_p = jnp.zeros((m_p, n_p), f32).at[:m, :n].set(a_mat.astype(f32))
    q_p = jnp.zeros((n_p, 1), f32).at[:n, 0].set(q.astype(f32))
    big = jnp.asarray(3.0e38, f32)
    lo_p = jnp.full((m_p, 1), -big).at[:m, 0].set(
        jnp.maximum(lo.astype(f32), -big))
    hi_p = jnp.full((m_p, 1), big).at[:m, 0].set(
        jnp.minimum(hi.astype(f32), big))
    x_p = jnp.zeros((n_p, 1), f32).at[:n, 0].set(x.astype(f32))
    z_p = jnp.zeros((m_p, 1), f32).at[:m, 0].set(z.astype(f32))
    y_p = jnp.zeros((m_p, 1), f32).at[:m, 0].set(y.astype(f32))
    scal = jnp.stack([rho, sigma, alpha]).astype(f32).reshape(1, 3)

    kernel = functools.partial(_iterate_kernel, seg_len=seg_len)

    def vmem():
        return pl.BlockSpec(memory_space=pltpu.VMEM)

    xo, zo, yo = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((n_p, 1), f32),
                   jax.ShapeDtypeStruct((m_p, 1), f32),
                   jax.ShapeDtypeStruct((m_p, 1), f32)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + [vmem()] * 9,
        out_specs=(vmem(), vmem(), vmem()),
        interpret=interpret,
    )(scal, kinv_p, a_p, a_p.T, q_p, lo_p, hi_p, x_p, z_p, y_p)
    return (xo[:n, 0].astype(q.dtype), zo[:m, 0].astype(q.dtype),
            yo[:m, 0].astype(q.dtype))
