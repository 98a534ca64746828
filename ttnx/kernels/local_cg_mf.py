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
fused it is one dispatch per site-solve.

Mosaic constraints honored (see CLAUDE.md): no transposes (all dots
contract chosen axes of both operands), no scatter, static unrolled small
loops, C-order reshapes only, precision=HIGHEST everywhere, the MPO core
passed as a 2-D SMEM array read by static scalar indices.

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

__all__ = ["cg_matfree_fused", "fits_vmem_mf"]


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


def _rowdot(a, b):
    """(1, M) x (1, M) -> scalar via an MXU contraction (proven pattern
    from ttnx.kernels.local_cg)."""
    return jax.lax.dot_general(
        a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)[0, 0]


def _kernel(L_ref, Renv_ref, Ac_ref, rhs_ref, mask_ref, out_ref, *,
            iters: int, R: int, RA: int, n: int):
    M = R * n * R
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

    def flat(v):
        return v.reshape(1, M)

    x = jnp.zeros_like(rhs)
    r = rhs
    p = r
    rs = _rowdot(flat(r), flat(r))

    def body(_, state):
        x, r, p, rs = state
        ap = apply_k(p)
        denom = _rowdot(flat(p), flat(ap))
        ok = jnp.abs(denom) > 0.0
        alpha = jnp.where(ok, rs / jnp.where(ok, denom, 1.0), 0.0)
        x = x + alpha * p
        r = r - alpha * ap
        rs_new = _rowdot(flat(r), flat(r))
        okb = jnp.abs(rs) > 0.0
        beta = jnp.where(okb, rs_new / jnp.where(okb, rs, 1.0), 0.0)
        p = r + beta * p
        return (x, r, p, rs_new)

    x, _, _, _ = jax.lax.fori_loop(0, iters, body, (x, r, p, rs))
    out_ref[:] = x


@functools.partial(jax.jit, static_argnames=("iters", "interpret"))
def cg_matfree_fused(L, Ac, Renv, rhs, mask, iters: int = 32,
                     interpret: bool = False):
    """Solve the masked local system with matrix-free CG entirely in one
    Pallas kernel. ``L/Renv (R, RA, R)``, ``Ac (RA, n, n, RA)``,
    ``rhs/mask (R, n, R)``; returns ``x (R, n, R)``."""
    R, RA, _ = L.shape
    n = rhs.shape[1]
    # Ac is [W, i, J, w]; C-order reshape gives rows (W, i), cols (J, w)
    Ac2 = Ac.reshape(RA * n, n * RA)
    kernel = functools.partial(_kernel, iters=iters, R=R, RA=RA, n=n)
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
        ],
        out_specs=pl.BlockSpec(memory_space=space),
        out_shape=jax.ShapeDtypeStruct((R, n, R), rhs.dtype),
        interpret=interpret,
    )(L, Renv, Ac2, rhs, mask)
