"""Distributed TSQR tests on the virtual 8-device mesh."""

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ttnx.parallel.batch import make_mesh
from ttnx.parallel.tsqr import distributed_orthogonalize_core, tsqr


def _signfix_np(q, r):
    s = np.sign(np.diagonal(r))
    s[s == 0] = 1.0
    return q * s[None, :], r * s[:, None]


def test_tsqr_matches_dense(rng):
    mesh = make_mesh(dp=8, tp=1)
    m, k = 8 * 16, 8
    a = rng.standard_normal((m, k))
    a_sh = jax.device_put(jnp.asarray(a), NamedSharding(mesh, P("dp", None)))
    q, r = tsqr(a_sh, mesh)
    q, r = np.asarray(q), np.asarray(r)
    # factorization reproduces A and Q is orthonormal
    assert np.allclose(q @ r, a, atol=1e-10)
    assert np.allclose(q.T @ q, np.eye(k), atol=1e-10)
    # matches dense QR up to the positive-diagonal convention
    qd, rd = np.linalg.qr(a)
    qd, rd = _signfix_np(qd, rd)
    assert np.allclose(r, rd, atol=1e-10)
    assert np.allclose(q, qd, atol=1e-10)


def test_tsqr_under_jit(rng):
    mesh = make_mesh(dp=4, tp=2)
    m, k = 4 * 8, 4
    a = rng.standard_normal((m, k))
    a_sh = jax.device_put(jnp.asarray(a), NamedSharding(mesh, P("dp", None)))
    fn = jax.jit(lambda x: tsqr(x, mesh))
    q, r = fn(a_sh)
    assert np.allclose(np.asarray(q) @ np.asarray(r), a, atol=1e-10)


def test_distributed_orthogonalize_core(rng):
    mesh = make_mesh(dp=8, tp=1)
    Rl, n, Rr = 64, 2, 8  # Rl*n = 128 rows -> 16 per device >= Rr
    core = rng.standard_normal((Rl, n, Rr))
    core_sh = jax.device_put(
        jnp.asarray(core.reshape(Rl * n, Rr)),
        NamedSharding(mesh, P("dp", None))).reshape(Rl, n, Rr)
    q_core, transfer = distributed_orthogonalize_core(core_sh, mesh)
    # Q @ transfer reconstructs the unfolded core
    rec = np.asarray(q_core).reshape(Rl * n, Rr) @ np.asarray(transfer)
    assert np.allclose(rec, core.reshape(Rl * n, Rr), atol=1e-10)
    qm = np.asarray(q_core).reshape(Rl * n, Rr)
    assert np.allclose(qm.T @ qm, np.eye(Rr), atol=1e-10)
