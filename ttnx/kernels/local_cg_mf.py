"""Fused MATRIX-FREE CG for the rank>=32 ALS local solve.

The dense-K kernel (:mod:`ttnx.kernels.local_cg`) is VMEM-gated to
``M = R*n*R <= 1024`` — at the BASELINE metric's rank 64 the local system
is M=8192 and K would be 268 MB. But the *matrix-free* operator needs only
the two environment tensors (``L``/``Renv``, 64 KB each at R=64) and the
tiny MPO core, so the WHOLE fixed-iteration CG fits VMEM: per iteration,
16 ``(R,R)@(R,R)`` MXU dots (the small physical/operator indices i,J,w,W
are unrolled in Python — contracting them as matmul-K runs at 2-6% MXU
occupancy, measured round 4) plus rowdot scalar reductions. As XLA the
same loop is ~6 small HLOs per iteration with scheduling overhead between;
fused it is one dispatch per site-solve. Measured on the v5e
(2026-08-21): single-problem d=12 CN step at rank 64 drops 11.1 -> 7.6 ms
(1.16 TF/s executed) and the explicitly-batched form reaches 483 solves/s
at B=256 (3.3 TF/s) vs 243-292 for the best XLA path in the same session.

Mosaic constraints honored (see CLAUDE.md): no transposes (all dots
contract chosen axes of both operands), no scatter, static unrolled small
loops, C-order reshapes only, precision=HIGHEST everywhere, the MPO core
passed as a 2-D SMEM array read by static scalar indices, explicit
``i*0``-typed index maps for grid-shared inputs (a Python 0 lowers to i64
and Mosaic rejects the mixed-type index_map return).

Local operator (same contraction as als_scan._local_solve_padded):
``K v[a,i,c] = sum L[a,W,b] Ac[W,i,J,w] Renv[c,w,d] v[b,J,d]`` with the
identity on masked-out (padded) directions.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["cg_matfree_fused", "cg_matfree_fused_batched",
           "fits_vmem_mf"]


def fits_vmem_mf(dtype, R: int, RA: int, n: int) -> bool:
    """Gate: real dtype; envs + ~6 (R, n, R) iterates comfortably in VMEM
    (R=64, RA=4, n=2 -> ~0.4 MB; cap 6 MB), and shapes MXU-worthy."""
    if jnp.issubdtype(jnp.dtype(dtype), jnp.complexfloating):
        return False
    itemsize = jnp.dtype(dtype).itemsize
    vmem = (2 * R * RA * R + 8 * R * n * R) * itemsize
    return R >= 32 and vmem <= 6 * 1024 * 1024


def _dot(a, b, dims):
    return jax.lax.dot_general(a, b, (dims, ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.HIGHEST)


def _kernel(L_ref, Renv_ref, Ac_ref, rhs_ref, mask_ref, x0_ref, out_ref, *,
            iters: int, R: int, RA: int, n: int, warm: bool):
    mask = mask_ref[:]                      # (R, n, R)
    rhs = rhs_ref[:] * mask

    def apply_k(p):
        # s[J][w][b, c] = sum_d p[b, J, d] Renv[c, w, d]
        pm = p * mask
        s = [[_dot(pm[:, J, :], Renv_ref[:, w, :], ((1,), (1,)))
              for w in range(RA)] for J in range(n)]
        outs = []
        for i in range(n):
            acc_i = None
            for W in range(RA):
                m = None
                for J in range(n):
                    for w in range(RA):
                        term = Ac_ref[W * n + i, J * RA + w] * s[J][w]
                        m = term if m is None else m + term
                # sum_b L[a, W, b] m[b, c]
                t = _dot(L_ref[:, W, :], m, ((1,), (0,)))
                acc_i = t if acc_i is None else acc_i + t
            outs.append(acc_i)
        out = jnp.stack(outs, axis=1)       # (R, n, R)
        return out * mask + (1.0 - mask) * p

    def pdot(a, b):
        # Mosaic rejects the (R,n,R)->(1,M) shape cast a rowdot would
        # need; sequential keepdims reductions stay reshape-free
        s = a * b
        s = jnp.sum(s, axis=2, keepdims=True)
        s = jnp.sum(s, axis=1, keepdims=True)
        return jnp.sum(s, axis=0, keepdims=True)      # (1, 1, 1)

    if warm:
        x = x0_ref[:] * mask
        r = rhs - apply_k(x)
    else:
        x = jnp.zeros_like(rhs)
        r = rhs
    p = r
    rs = pdot(r, r)

    def body(_, state):
        x, r, p, rs = state
        ap = apply_k(p)
        denom = pdot(p, ap)
        ok = jnp.abs(denom) > 0.0
        alpha = jnp.where(ok, rs / jnp.where(ok, denom, 1.0), 0.0)
        x = x + alpha * p
        r = r - alpha * ap
        rs_new = pdot(r, r)
        okb = jnp.abs(rs) > 0.0
        beta = jnp.where(okb, rs_new / jnp.where(okb, rs, 1.0), 0.0)
        p = r + beta * p
        return (x, r, p, rs_new)

    x, _, _, _ = jax.lax.fori_loop(0, iters, body, (x, r, p, rs))
    out_ref[:] = x * mask


def _kernel_batched(L_ref, Renv_ref, Ac_ref, rhs_ref, mask_ref, x0_ref,
                    out_ref, *, iters: int, R: int, RA: int, n: int,
                    warm: bool):
    """Batched twin: every ref carries a leading block-batch dim ``bt``;
    all dots are batched dot_generals (batch dim 0), CG scalars are
    per-problem ``(bt, 1, 1)`` rowdots. ``warm``: start from the
    transported current iterate in ``x0_ref`` (one extra operator apply
    buys ~2x the iteration count's accuracy — same finding as
    als_sweep_fused; cold starts needed cg_iters=32 where warm reaches
    the same residual at 16)."""
    mask = mask_ref[:]                      # (R, n, R), shared
    rhs = rhs_ref[:] * mask[None]

    def bdot(a, b, dims):
        return jax.lax.dot_general(a, b, (dims, ((0,), (0,))),
                                   preferred_element_type=jnp.float32,
                                   precision=jax.lax.Precision.HIGHEST)

    def apply_k(p):
        pm = p * mask[None]
        s = [[bdot(pm[:, :, J, :], Renv_ref[:, :, w, :], ((2,), (2,)))
              for w in range(RA)] for J in range(n)]
        outs = []
        for i in range(n):
            acc_i = None
            for W in range(RA):
                m = None
                for J in range(n):
                    for w in range(RA):
                        term = Ac_ref[W * n + i, J * RA + w] * s[J][w]
                        m = term if m is None else m + term
                t = bdot(L_ref[:, :, W, :], m, ((2,), (1,)))
                acc_i = t if acc_i is None else acc_i + t
            outs.append(acc_i)
        out = jnp.stack(outs, axis=2)       # (bt, R, n, R)
        return out * mask[None] + (1.0 - mask[None]) * p

    def pdot(a, b):
        # reshape-free per-problem scalars (Mosaic rejects the flattening
        # shape cast): sequential keepdims reductions over non-batch axes
        s = a * b
        s = jnp.sum(s, axis=3, keepdims=True)
        s = jnp.sum(s, axis=2, keepdims=True)
        return jnp.sum(s, axis=1, keepdims=True)      # (bt, 1, 1, 1)

    if warm:
        x = x0_ref[:] * mask[None]
        r = rhs - apply_k(x)
    else:
        x = jnp.zeros_like(rhs)
        r = rhs
    p = r
    rs = pdot(r, r)

    def body(_, state):
        x, r, p, rs = state
        ap = apply_k(p)
        denom = pdot(p, ap)
        ok = jnp.abs(denom) > 0.0
        alpha = jnp.where(ok, rs / jnp.where(ok, denom, 1.0), 0.0)
        x = x + alpha * p
        r = r - alpha * ap
        rs_new = pdot(r, r)
        okb = jnp.abs(rs) > 0.0
        beta = jnp.where(okb, rs_new / jnp.where(okb, rs, 1.0), 0.0)
        p = r + beta * p
        return (x, r, p, rs_new)

    x, _, _, _ = jax.lax.fori_loop(0, iters, body, (x, r, p, rs))
    out_ref[:] = x * mask[None]


@functools.partial(jax.jit,
                   static_argnames=("iters", "block_b", "interpret"))
def cg_matfree_fused_batched(L, Ac, Renv, rhs, mask, x0=None,
                             iters: int = 32,
                             block_b: int = 4, interpret: bool = False):
    """Explicitly-batched fused matrix-free CG: grid over the problem
    batch (NOT ``jax.vmap`` of the single-problem kernel — the explicit
    grid is the form this toolchain compiles reliably). ``L/Renv
    (B, R, RA, R)``, ``rhs (B, R, n, R)``, shared ``Ac (RA, n, n, RA)``
    and ``mask (R, n, R)``. block_b=4: the scoped-VMEM allocator
    double-buffers the four (bt, R, *, R) blocks plus the 8 unrolled
    (bt, R, R) intermediates — bt=8 measured 23.07M vs the 16M scoped
    limit at R=64."""
    B, R, RA, _ = L.shape
    n = rhs.shape[2]
    if B % block_b != 0:
        block_b = 1
    warm = x0 is not None
    if x0 is None:
        x0 = rhs  # placeholder operand (unread when warm=False)
    Ac2 = Ac.reshape(RA * n, n * RA)
    kernel = functools.partial(_kernel_batched, iters=iters, R=R, RA=RA,
                               n=n, warm=warm)
    space = pl.ANY if interpret else pltpu.VMEM
    sspace = pl.ANY if interpret else pltpu.SMEM
    grid = (pl.cdiv(B, block_b),)
    # every index map returns i*0-typed zeros: a Python 0 lowers to i64
    # under this toolchain and Mosaic rejects the mixed-type func.return
    # (same workaround as ttnx.kernels.contraction)
    bspec = lambda *shape: pl.BlockSpec(
        (block_b,) + shape, lambda i: (i,) + tuple(i * 0 for _ in shape),
        memory_space=space)
    shared = lambda *shape, ms: pl.BlockSpec(
        shape, lambda i: tuple(i * 0 for _ in shape), memory_space=ms)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            bspec(R, RA, R),                              # L
            bspec(R, RA, R),                              # Renv
            shared(RA * n, n * RA, ms=sspace),            # Ac scalars
            bspec(R, n, R),                               # rhs
            shared(R, n, R, ms=space),                    # mask
            bspec(R, n, R),                               # warm start
        ],
        out_specs=bspec(R, n, R),
        out_shape=jax.ShapeDtypeStruct((B, R, n, R), rhs.dtype),
        interpret=interpret,
    )(L, Renv, Ac2, rhs, mask, x0)


@functools.partial(jax.jit, static_argnames=("iters", "interpret"))
def cg_matfree_fused(L, Ac, Renv, rhs, mask, x0=None, iters: int = 32,
                     interpret: bool = False):
    """Solve the masked local system with matrix-free CG entirely in one
    Pallas kernel, optionally warm-started at ``x0``. ``L/Renv
    (R, RA, R)``, ``Ac (RA, n, n, RA)``, ``rhs/mask (R, n, R)``; returns
    ``x (R, n, R)``."""
    R, RA, _ = L.shape
    n = rhs.shape[1]
    warm = x0 is not None
    if x0 is None:
        x0 = rhs
    # Ac is [W, i, J, w]; C-order reshape gives rows (W, i), cols (J, w)
    Ac2 = Ac.reshape(RA * n, n * RA)
    kernel = functools.partial(_kernel, iters=iters, R=R, RA=RA, n=n,
                               warm=warm)
    space = pl.ANY if interpret else pltpu.VMEM
    sspace = pl.ANY if interpret else pltpu.SMEM
    return pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=space),    # L
            pl.BlockSpec(memory_space=space),    # Renv
            pl.BlockSpec(memory_space=sspace),   # Ac (scalars)
            pl.BlockSpec(memory_space=space),    # rhs
            pl.BlockSpec(memory_space=space),    # mask
            pl.BlockSpec(memory_space=space),    # warm start
        ],
        out_specs=pl.BlockSpec(memory_space=space),
        out_shape=jax.ShapeDtypeStruct((R, n, R), rhs.dtype),
        interpret=interpret,
    )(L, Renv, Ac2, rhs, mask, x0)
