"""Fused Pallas CG kernel for the ALS local solve — the production hot loop.

One ALS microstep solves the dense masked local system ``K v = rhs`` with
``K (M, M)``, ``M = R * n * R`` (reference local solve:
/root/reference/src/solvers/als.jl:58-70). On the device path the solver is
fixed-iteration CG (``solver='cg'``); as plain XLA that is ~6 HLO ops per
iteration, each a tiny tensor that round-trips HBM, so the whole solve is
latency-bound. This kernel keeps ``K`` and every CG iterate resident in VMEM
and runs ALL iterations inside one kernel.

Mosaic constraints shape the design (measured on the remote v5e toolchain,
round 1):

* scalar reductions of a vector inside a kernel crashed the remote compile
  service — so every CG scalar (``r.r``, ``p.Kp``) is computed as a
  ``(1,1)``-shaped MXU ``dot_general``, never a VPU reduction;
* no transposes: ``K`` is symmetric, so ``K @ p`` is expressed as
  ``dot_general(p, K)`` contracting the *second* axis of each operand.

At the flagship shape (rank 16, n=2 -> M=512) ``K`` is 1 MB f32; the
dispatch gate (:func:`fits_vmem`) keeps the kernel to ``M <= 1024`` (4 MB).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["cg_solve_fused", "bicgstab_solve_fused", "fits_vmem"]


def fits_vmem(M: int) -> bool:
    """Gate: K (M, M) f32 plus four (1, M) iterates must fit VMEM with room
    to spare (M=1024 -> 4 MB of the ~16 MB/core)."""
    return M <= 1024


def _rowdot(a, b, acc_dtype):
    """(1, M) x (1, M) -> (1, 1) inner product as an MXU contraction.
    precision=HIGHEST: TPU f32 matmuls default to single-pass bf16 inputs
    (~4e-3 relative), which caps CG at ~1e-3 — measured on the v5e probe;
    the 3-pass f32 form restores ~1e-6 class accuracy."""
    return jax.lax.dot_general(
        a, b, (((1,), (1,)), ((), ())), preferred_element_type=acc_dtype,
        precision=jax.lax.Precision.HIGHEST)


def _cg_kernel(K_ref, b_ref, x0_ref, out_ref, *, iters: int, warm: bool):
    K = K_ref[:]                    # (M, M), symmetric positive definite
    b = b_ref[:]                    # (1, M)
    dt = b.dtype
    if warm:
        # warm start from the transported current iterate (round 5): one
        # extra matvec buys ~2x the iteration count's accuracy
        x = x0_ref[:]
        r = b - jax.lax.dot_general(
            x, K, (((1,), (1,)), ((), ())), preferred_element_type=dt,
            precision=jax.lax.Precision.HIGHEST)
    else:
        x = jnp.zeros_like(b)
        r = b
    p = r
    rs = _rowdot(r, r, dt)          # (1, 1)

    def body(_, state):
        x, r, p, rs = state
        # K symmetric: contracting axis 1 of both operands gives K @ p
        # without materializing K^T
        ap = jax.lax.dot_general(
            p, K, (((1,), (1,)), ((), ())), preferred_element_type=dt,
            precision=jax.lax.Precision.HIGHEST)
        denom = _rowdot(p, ap, dt)
        alpha = jnp.where(jnp.abs(denom) > 0, rs / denom, jnp.zeros_like(rs))
        x = x + alpha * p
        r = r - alpha * ap
        rs_new = _rowdot(r, r, dt)
        beta = jnp.where(jnp.abs(rs) > 0, rs_new / rs, jnp.zeros_like(rs))
        p = r + beta * p
        return (x, r, p, rs_new)

    x, _, _, _ = jax.lax.fori_loop(0, iters, body, (x, r, p, rs))
    out_ref[:] = x


def _matvec_rowform(p, K, dt):
    """(1, M) x (M, M) -> (1, M): ``out[i] = sum_j p_j K[i, j]`` — i.e.
    ``K @ p`` for ANY K, with no transpose materialized (the contraction
    runs over the second axis of both operands)."""
    return jax.lax.dot_general(
        p, K, (((1,), (1,)), ((), ())), preferred_element_type=dt,
        precision=jax.lax.Precision.HIGHEST)


def _bicgstab_kernel(Kt_ref, b_ref, out_ref, *, iters: int):
    """Unpreconditioned BiCGStab, all iterates VMEM-resident. Scalars are
    (1,1) MXU dot_generals (no vector reductions — see module docstring).
    Handles non-symmetric local operators (convection, OU drift) that CG
    cannot."""
    Kt = Kt_ref[:]
    b = b_ref[:]                     # (1, M)
    dt = b.dtype
    x = jnp.zeros_like(b)
    r = b
    rhat = b
    rho = _rowdot(rhat, r, dt)
    p = r
    v = jnp.zeros_like(b)

    def safe_div(a, c):
        return jnp.where(jnp.abs(c) > 0, a / jnp.where(jnp.abs(c) > 0, c,
                                                       jnp.ones_like(c)),
                         jnp.zeros_like(a))

    def body(_, state):
        x, r, p, v, rho = state
        v = _matvec_rowform(p, Kt, dt)
        alpha = safe_div(rho, _rowdot(rhat, v, dt))
        s = r - alpha * v
        t = _matvec_rowform(s, Kt, dt)
        omega = safe_div(_rowdot(t, s, dt), _rowdot(t, t, dt))
        x = x + alpha * p + omega * s
        r = s - omega * t
        rho_new = _rowdot(rhat, r, dt)
        beta = safe_div(rho_new, rho) * safe_div(alpha, omega)
        p = r + beta * (p - omega * v)
        return (x, r, p, v, rho_new)

    x, _, _, _, _ = jax.lax.fori_loop(0, iters, body, (x, r, p, v, rho))
    out_ref[:] = x


@functools.partial(jax.jit, static_argnames=("iters", "interpret"))
def bicgstab_solve_fused(K, rhs, iters: int = 32, interpret: bool = False):
    """Solve ``K x = rhs`` for a general (possibly non-symmetric) ``K`` by
    ``iters`` BiCGStab steps fused into one Pallas kernel (2 matvecs per
    iteration); every matvec is the transpose-free row form."""
    M = K.shape[0]
    b2 = rhs.reshape(1, M)
    out = pl.pallas_call(
        functools.partial(_bicgstab_kernel, iters=iters),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY if interpret else pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY if interpret else pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY if interpret
                               else pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, M), rhs.dtype),
        interpret=interpret,
    )(K, b2)
    return out.reshape(M)


@functools.partial(jax.jit, static_argnames=("iters", "interpret"))
def cg_solve_fused(K, rhs, x0=None, iters: int = 48,
                   interpret: bool = False):
    """Solve ``K x = rhs`` (SPD ``K (M, M)``, ``rhs (M,)``) by ``iters``
    conjugate-gradient steps fused into one Pallas kernel, optionally
    warm-started at ``x0``."""
    M = K.shape[0]
    b2 = rhs.reshape(1, M)
    warm = x0 is not None
    x02 = b2 if x0 is None else x0.reshape(1, M)
    out = pl.pallas_call(
        functools.partial(_cg_kernel, iters=iters, warm=warm),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY if interpret else pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY if interpret else pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY if interpret else pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY if interpret
                               else pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, M), rhs.dtype),
        interpret=interpret,
    )(K, b2, x02)
    return out.reshape(M)
