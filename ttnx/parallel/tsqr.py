"""Distributed tall-skinny QR (TSQR) over a device mesh.

The panel factorization behind distributed TT orthogonalization/rounding
(SURVEY §2.9 / north star: "overlap ICI collectives for distributed SVD/QR
panel factorization"). The unfolded TT core ``(r*n, r')`` is row-sharded over
the mesh; each device QRs its block, the small ``R`` factors are all-gathered
over ICI and reduced by one more QR, and the final thin-Q factors multiply
back locally — the only communication is the ``p * r'^2`` R-factor gather.

Sign convention: R's diagonal is made non-negative so the factorization is
unique and device-count independent.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

__all__ = ["tsqr", "distributed_orthogonalize_core"]


def _signfix(q, r):
    s = jnp.sign(jnp.diagonal(r))
    s = jnp.where(s == 0, 1.0, s)
    return q * s[None, :], r * s[:, None]


def tsqr(a, mesh: Mesh, axis: str = "dp"):
    """QR of a row-sharded tall matrix ``a: (m, k)`` with ``m`` sharded over
    ``mesh[axis]``. Returns ``(q, r)`` with ``q`` sharded the same way and
    ``r`` replicated.
    """
    m, k = a.shape
    p = mesh.shape[axis]
    if m % p != 0 or m // p < k:
        raise ValueError(
            f"TSQR needs each local block tall: m={m} over {p} devices gives "
            f"{m // p} rows per block < k={k}")

    def kernel(a_blk):
        q1, r1 = jnp.linalg.qr(a_blk)      # local block QR
        q1, r1 = _signfix(q1, r1)
        # gather every device's small R over ICI: (p*k, k)
        r_all = jax.lax.all_gather(r1, axis, tiled=True)
        q2, r2 = jnp.linalg.qr(r_all)      # reduce on every device (replicated)
        q2, r2 = _signfix(q2, r2)
        idx = jax.lax.axis_index(axis)
        q2_blk = jax.lax.dynamic_slice_in_dim(q2, idx * k, k, axis=0)
        return q1 @ q2_blk, r2

    spec_in = P(axis, None)
    # r2 is bitwise identical on every device (same all-gathered input), but
    # shard_map cannot prove that statically -> check_rep=False
    fn = shard_map(kernel, mesh=mesh, in_specs=(spec_in,),
                   out_specs=(spec_in, P(None, None)), check_rep=False)
    return fn(a)


def distributed_orthogonalize_core(core, mesh: Mesh, axis: str = "dp"):
    """Left-orthogonalize one padded TT core ``(R, n, R')`` with the
    ``(R*n, R')`` unfolding row-sharded over the mesh. Returns
    ``(q_core, transfer)`` — the orthogonal core (same sharding) and the
    triangular transfer matrix to absorb into the next core (replicated)."""
    Rl, n, Rr = core.shape
    mat = core.reshape(Rl * n, Rr)
    q, r = tsqr(mat, mesh, axis)
    return q.reshape(Rl, n, Rr), r
