"""Fused Pallas Lanczos kernel — the DMRG local eigensolve hot loop.

``dmrg_scan._lanczos_eigmin`` (reference comparator: KrylovKit
``eigsolve(:SR)`` in /root/reference/src/solvers/dmrg.jl:235-259) runs
fixed-iteration Lanczos with full reorthogonalization. As XLA inside the
site scan that is ~10 tiny HLOs per iteration, each round-tripping HBM —
the same latency pathology the fused CG kernel (:mod:`local_cg`) removed
from the ALS solve. This kernel keeps the dense masked two-site operator
``K`` and the whole Krylov basis VMEM-resident and runs ALL iterations in
one kernel, emitting ``(Q, alphas, betas)``; the tiny tridiagonal eigh and
the Ritz recombination stay in XLA.

Mosaic discipline (same as local_cg/gram):
* no vector->scalar reductions — every inner product is a (1, 1) MXU
  ``dot_general`` at ``precision=HIGHEST``;
* no transposes — ``K @ v`` and the reorthogonalization products contract
  matching axes in row form;
* the iteration loop is UNROLLED in Python (static ``iters``): dynamic
  store indices under x64 trip Mosaic's i64/i32 convert lowering
  (see kernels/gram.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["lanczos_fused", "can_fuse_lanczos"]


def can_fuse_lanczos(dtype, M: int) -> bool:
    """Real dtypes with VMEM-resident K (M=1024 -> 4 MB) only."""
    return (not jnp.issubdtype(jnp.dtype(dtype), jnp.complexfloating)
            and M <= 1024)


def _rowdot(a, b, dt):
    return jax.lax.dot_general(
        a, b, (((1,), (1,)), ((), ())), preferred_element_type=dt,
        precision=jax.lax.Precision.HIGHEST)


def _matvec_rowform(v, K, dt):
    """(1, M) x (M, M) -> (1, M) = (K @ v)^T for symmetric K."""
    return jax.lax.dot_general(
        v, K, (((1,), (1,)), ((), ())), preferred_element_type=dt,
        precision=jax.lax.Precision.HIGHEST)


def _lanczos_kernel(K_ref, v0_ref, q_ref, a_ref, b_ref, *, iters: int):
    # Neither .at[].set (scatter) nor jax.lax.dynamic_update_slice on VALUES
    # lowers in this Mosaic version — but static-index STORES TO REFS do
    # (same pattern as kernels/gram.py), so the basis accumulates directly
    # in the output ref and is read back whole for the reorthogonalization
    # products (rows not yet written are zero -> no-op contributions).
    v = v0_ref[:]                # (1, M), unit norm, masked
    dt = v.dtype
    tiny = jnp.asarray(1e-12, dt)
    q_ref[:] = jnp.zeros_like(q_ref)
    a_ref[:] = jnp.zeros_like(a_ref)
    b_ref[:] = jnp.zeros_like(b_ref)

    for j in range(iters):
        q_ref[pl.dslice(j, 1)] = v
        # K stays in its input buffer: binding `K = K_ref[:]` once doubles
        # the VMEM footprint (input buffer + value copy -> scoped-vmem OOM
        # at M=1024, measured 2026-08-21); per-use loads let Mosaic reuse
        # the buffer
        w = _matvec_rowform(v, K_ref[:], dt)
        a_ref[pl.dslice(j, 1)] = _rowdot(v, w, dt)        # (1, 1)
        Q = q_ref[:]
        # two-pass full reorthogonalization against the stored basis
        for _ in range(2):
            coeffs = jax.lax.dot_general(
                Q, w, (((1,), (1,)), ((), ())), preferred_element_type=dt,
                precision=jax.lax.Precision.HIGHEST)      # (iters, 1)
            w = w - jax.lax.dot_general(
                coeffs, Q, (((0,), (0,)), ((), ())),
                preferred_element_type=dt,
                precision=jax.lax.Precision.HIGHEST)      # (1, M)
        b2 = _rowdot(w, w, dt)                      # (1, 1)
        b = jnp.sqrt(jnp.maximum(b2, 0.0))
        ok = b > tiny
        if j + 1 < iters:
            b_ref[pl.dslice(j, 1)] = jnp.where(ok, b, jnp.zeros_like(b))
            v = jnp.where(ok, w / jnp.maximum(b, tiny), jnp.zeros_like(w))


@functools.partial(jax.jit, static_argnames=("iters", "interpret"))
def lanczos_fused(K, v0, iters: int = 16, interpret: bool = False):
    """``iters`` Lanczos steps on symmetric ``K (M, M)`` from unit vector
    ``v0 (M,)``, fully fused. Returns ``(Q (iters, M), alphas (iters,),
    betas (iters,))`` with ``betas[j] = 0`` marking breakdown (subsequent
    basis rows are zero)."""
    M = K.shape[0]
    v2 = v0.reshape(1, M)
    mem = pl.ANY if interpret else pltpu.VMEM
    Q, alphas, betas = pl.pallas_call(
        functools.partial(_lanczos_kernel, iters=iters),
        in_specs=[pl.BlockSpec(memory_space=mem),
                  pl.BlockSpec(memory_space=mem)],
        out_specs=[pl.BlockSpec(memory_space=mem),
                   pl.BlockSpec(memory_space=mem),
                   pl.BlockSpec(memory_space=mem)],
        out_shape=[
            jax.ShapeDtypeStruct((iters, M), K.dtype),
            jax.ShapeDtypeStruct((iters, 1), K.dtype),
            jax.ShapeDtypeStruct((iters, 1), K.dtype),
        ],
        interpret=interpret,
    )(K, v2)
    return Q, alphas[:, 0], betas[:, 0]
