"""Fused Pallas kernel for the right-Gram chain of TT rounding.

Gram-based rounding (the TPU form of the reference's orthogonalize-then-
truncate, /root/reference/src/tt_tools.jl:743-789) needs the right Gram
matrices of the applied chain::

    G_d = e_0 e_0^T                      (right boundary bond, true rank 1)
    G_k = sum_i  y_k[:, i, :] @ G_{k+1} @ y_k[:, i, :]^H     k = d-1 .. 1

This backward sweep is pure matmuls — no QR/SVD/eigh — so the WHOLE chain
fuses into one VMEM-resident kernel: ``d`` sites of ``2n`` ``(R, R)``
matmuls with the carried Gram never touching HBM. As plain XLA this is a
``lax.scan`` of tiny HLOs (one dispatch each, HBM round trips between);
fused it is one dispatch. The subsequent left-to-right truncation sweep
(one small eigh per bond) stays in XLA — see
:func:`ttnx.solvers.round_scan.tt_round_gram`.

Mosaic constraints (same playbook as :mod:`ttnx.kernels.local_cg`):
no transposes — the second matmul of each Gram update contracts the
*second* axes of both operands (``(t @ y^T)`` in row form); all dots are
``precision=HIGHEST`` (the f32 single-pass default costs ~4e-3 relative,
measured round 2); dynamic site indexing only on the leading (untiled)
axis of the ``(d, n, R, R)`` input.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["gram_chain_fused", "can_fuse_gram_chain"]


def can_fuse_gram_chain(dtype, d: int, R: int, n: int = 2) -> bool:
    """VMEM gate: the y stack (d * n * R^2 f32) plus two (R, R) carries must
    fit comfortably (d=12, n=2, R=64 -> ~0.4 MB; cap at 8 MB), and the
    kernel is real-f32 only (complex stays on the XLA scan)."""
    if jnp.issubdtype(jnp.dtype(dtype), jnp.complexfloating):
        return False
    itemsize = jnp.dtype(dtype).itemsize
    return d * n * R * R * itemsize <= 8 * 1024 * 1024 and R >= 8


def _gram_chain_kernel(y_ref, g0_ref, out_ref, *, d: int, n: int):
    """y: (d, n, R, R); g0: (R, R) boundary Gram; out: (d, R, R) with
    ``out[k] = G_{k+1}`` (the Gram over sites k+1..d-1).

    The site loop is UNROLLED in Python (d is static and small): a
    ``fori_loop`` with dynamic site indices makes Mosaic's lowering of the
    x64 i64<->i32 index converts recurse infinitely (measured on the remote
    toolchain, 2026-08-21), and static indices also let Mosaic pipeline the
    per-site matmul pairs freely."""
    G = g0_ref[:]
    out_ref[d - 1] = G  # G_d (boundary)
    for k in range(d - 1, 0, -1):
        Gn = jnp.zeros_like(G)
        for i in range(n):
            yk = y_ref[k, i]
            t = jax.lax.dot_general(
                yk, G, (((1,), (0,)), ((), ())),
                preferred_element_type=G.dtype,
                precision=jax.lax.Precision.HIGHEST)
            # t @ yk^T without materializing the transpose: contract the
            # second axis of both operands
            Gn = Gn + jax.lax.dot_general(
                t, yk, (((1,), (1,)), ((), ())),
                preferred_element_type=G.dtype,
                precision=jax.lax.Precision.HIGHEST)
        out_ref[k - 1] = Gn
        G = Gn


@functools.partial(jax.jit, static_argnames=("interpret",))
def gram_chain_fused(y, interpret: bool = False):
    """Right-Gram stack of a padded chain ``y (d, R, n, R)`` in ONE Pallas
    kernel. Returns ``Gs (d, R, R)`` with ``Gs[k] = G_{k+1}``; padded
    regions of ``y`` are exactly zero (chain invariant), so the Grams carry
    zeros there with no masking needed."""
    d, R, n, _ = y.shape
    yt = jnp.transpose(y, (0, 2, 1, 3))  # (d, n, R, R): site/phys leading
    g0 = jnp.zeros((R, R), y.dtype).at[0, 0].set(1.0)
    kernel = functools.partial(_gram_chain_kernel, d=d, n=n)
    return pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY if interpret else pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY if interpret else pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY if interpret
                               else pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((d, R, R), y.dtype),
        interpret=interpret,
    )(yt, g0)
