"""Pallas TPU kernels for the TT hot loops.

The framework's FLOPs live in batched small-K matmuls (two-site merges, MPO
applications, environment updates at rank r with n=2 physical dims). XLA
emits one HBM round trip per contraction; these kernels fuse contraction
chains in VMEM so intermediate ``(r*n, n*r)`` blocks never touch HBM.

Kernels run in interpret mode on CPU (tests) and compile with Mosaic on TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["two_site_merge", "merge_resplit_chain", "matmul_chain"]


def _merge_kernel(a_ref, b_ref, out_ref):
    # a: (Bt, rl*n, rm), b: (Bt, rm, n*rr) -> out: (Bt, rl*n, n*rr)
    out_ref[:] = jax.lax.dot_general(
        a_ref[:], b_ref[:], (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("block_b", "interpret"))
def two_site_merge(a, b, block_b: int = 32, interpret: bool = False):
    """Batched two-site merge ``C[B, rl*n, n*rr] = A[B, rl*n, rm] @
    B[B, rm, n*rr]`` as a Pallas kernel with the batch tiled over the grid.

    The merge is the common first step of two-site solves, TDVP2 sweeps, and
    TT rounding (reference hot spots: /root/reference/src/tt_operations.jl:101,
    /root/reference/src/solvers/mals.jl:148).
    """
    B, m, k = a.shape
    _, _, n = b.shape
    grid = (pl.cdiv(B, block_b),)
    # index maps use ``i * 0`` instead of the literal 0: under x64 a Python 0
    # lowers to i64 while the grid index is i32, and Mosaic rejects the
    # mixed-type index_map return (failed to legalize 'func.return')
    return pl.pallas_call(
        _merge_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_b, m, k), lambda i: (i, i * 0, i * 0),
                         memory_space=pl.ANY if interpret else pltpu.VMEM),
            pl.BlockSpec((block_b, k, n), lambda i: (i, i * 0, i * 0),
                         memory_space=pl.ANY if interpret else pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_b, m, n), lambda i: (i, i * 0, i * 0),
                               memory_space=pl.ANY if interpret
                               else pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, m, n), jnp.float32),
        interpret=interpret,
    )(a, b)


def _chain_kernel(a_ref, b_ref, w_ref, out_ref, *, iters: int, unroll: int):
    # acc: (Bt, rn, r); b: (Bt, r, nr); w: (Bt, nr, r)
    # Chain merge + re-split entirely in VMEM/registers. The chain is
    # normalization-free: callers pass orthonormal b/w factors so the iterate
    # stays bounded (a scalar-reduction rescale here breaks the Mosaic
    # remote compile and would waste VPU cycles anyway). Accumulation must
    # stay f32: Mosaic rejects bf16 matmul accumulators ("Expected matmul
    # acc to be 32-bit"), so the per-iteration f32->bf16 converts are the
    # hardware-mandated floor.
    b_val = b_ref[:]  # load the loop-invariant factors from VMEM once
    w_val = w_ref[:]

    def step(acc):
        c = jax.lax.dot_general(
            acc, b_val, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        nxt = jax.lax.dot_general(
            c.astype(b_val.dtype), w_val, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        return nxt.astype(a_ref.dtype)

    def body(_, acc):
        for _k in range(unroll):  # static unroll hides fori_loop latency
            acc = step(acc)
        return acc

    out_ref[:] = jax.lax.fori_loop(0, iters // unroll, body, a_ref[:])


def _matmul_chain_kernel(x_ref, w_ref, out_ref, *, iters: int, unroll: int):
    # x: (Bt, m, k); w: (Bt, k, k) orthonormal -> x @ w^iters stays bounded
    w_val = w_ref[:]

    def step(acc):
        return jax.lax.dot_general(
            acc, w_val, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).astype(x_ref.dtype)

    def body(_, acc):
        for _k in range(unroll):
            acc = step(acc)
        return acc

    out_ref[:] = jax.lax.fori_loop(0, iters // unroll, body, x_ref[:])


@functools.partial(jax.jit,
                   static_argnames=("iters", "block_b", "interpret",
                                    "unroll"))
def matmul_chain(x, w, iters: int = 8, block_b: int = 32,
                 interpret: bool = False, unroll: int = 4):
    """Dependent chain of plain batched matmuls ``x <- x @ w`` fused in VMEM —
    the MEASURED shape-bound ceiling for the K=64 contraction benchmark: the
    same (B, m, k)x(B, k, k) matmul the analytic peak/2 argument bounds, run
    under identical VMEM-residency conditions as
    :func:`merge_resplit_chain`. ``w`` should be orthonormal so the
    normalization-free chain stays bounded."""
    if iters % unroll != 0:
        raise ValueError(f"unroll={unroll} must divide iters={iters}")
    B, m, k = x.shape
    grid = (pl.cdiv(B, block_b),)
    kernel = functools.partial(_matmul_chain_kernel, iters=iters,
                               unroll=unroll)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_b, m, k), lambda i: (i, i * 0, i * 0),
                         memory_space=pl.ANY if interpret else pltpu.VMEM),
            pl.BlockSpec((block_b, k, k), lambda i: (i, i * 0, i * 0),
                         memory_space=pl.ANY if interpret else pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_b, m, k), lambda i: (i, i * 0, i * 0),
                               memory_space=pl.ANY if interpret
                               else pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, m, k), x.dtype),
        interpret=interpret,
    )(x, w)


@functools.partial(jax.jit,
                   static_argnames=("iters", "block_b", "interpret",
                                    "unroll"))
def merge_resplit_chain(a, b, w, iters: int = 8, block_b: int = 32,
                        interpret: bool = False, unroll: int = 1):
    """``iters`` rounds of (merge, re-split, rescale) with all intermediates
    resident in VMEM — the fused version of bench.py's chained contraction.
    ``a: (B, r*n, r)``, ``b: (B, r, n*r)``, ``w: (B, n*r, r)``.

    ``unroll`` statically unrolls the in-kernel loop by that factor (must
    divide ``iters``). Measured on v5e (2026-08-19,
    scripts/probe_pallas_unroll.py): unroll=4 reaches 42.0 TFLOP/s vs 33.8
    at unroll=1 — the fori_loop trip overhead is ~20% at this block size.
    """
    if iters % unroll != 0:
        raise ValueError(f"unroll={unroll} must divide iters={iters}")
    B, rn, r = a.shape
    _, _, nr = b.shape
    grid = (pl.cdiv(B, block_b),)
    kernel = functools.partial(_chain_kernel, iters=iters, unroll=unroll)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_b, rn, r), lambda i: (i, i * 0, i * 0),
                         memory_space=pl.ANY if interpret else pltpu.VMEM),
            pl.BlockSpec((block_b, r, nr), lambda i: (i, i * 0, i * 0),
                         memory_space=pl.ANY if interpret else pltpu.VMEM),
            pl.BlockSpec((block_b, nr, r), lambda i: (i, i * 0, i * 0),
                         memory_space=pl.ANY if interpret else pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_b, rn, r), lambda i: (i, i * 0, i * 0),
                               memory_space=pl.ANY if interpret
                               else pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, rn, r), a.dtype),
        interpret=interpret,
    )(a, b, w)
