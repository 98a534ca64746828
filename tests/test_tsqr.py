"""Distributed TSQR tests on the virtual 8-device mesh."""

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ttnx.parallel.batch import make_mesh
from ttnx.parallel.tsqr import (
    cholesky_qr2,
    distributed_orthogonalize_core,
    distributed_truncate_bond,
    tsqr,
    tsvd,
)


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


def test_cholesky_qr2_short_blocks(rng):
    # local blocks are NOT tall (128/8 = 16 rows < k=64): TSQR would refuse,
    # CholeskyQR2 is the panel that covers the (r*n, r) n=2 unfolding
    mesh = make_mesh(dp=8, tp=1)
    m, k = 128, 64
    a = rng.standard_normal((m, k))
    a_sh = jax.device_put(jnp.asarray(a), NamedSharding(mesh, P("dp", None)))
    q, r = cholesky_qr2(a_sh, mesh)
    q, r = np.asarray(q), np.asarray(r)
    assert np.allclose(q @ r, a, atol=1e-9)
    assert np.allclose(q.T @ q, np.eye(k), atol=1e-12)
    assert np.all(np.diagonal(r) >= 0)
    # matches dense QR up to the sign convention
    qd, rd = _signfix_np(*np.linalg.qr(a))
    assert np.allclose(r, rd, atol=1e-8)


def test_tsvd_short_blocks_via_cholesky(rng):
    mesh = make_mesh(dp=8, tp=1)
    m, k = 128, 64  # dispatches to cholesky_qr2 internally
    a = rng.standard_normal((m, k))
    a_sh = jax.device_put(jnp.asarray(a), NamedSharding(mesh, P("dp", None)))
    u, s, vt = tsvd(a_sh, mesh)
    u, s, vt = np.asarray(u), np.asarray(s), np.asarray(vt)
    assert np.allclose((u * s[None, :]) @ vt, a, atol=1e-9)
    assert np.allclose(s, np.linalg.svd(a, compute_uv=False), atol=1e-9)


def test_tsvd_matches_dense(rng):
    mesh = make_mesh(dp=8, tp=1)
    m, k = 128, 8
    a = rng.standard_normal((m, k))
    a_sh = jax.device_put(jnp.asarray(a), NamedSharding(mesh, P("dp", None)))
    u, s, vt = tsvd(a_sh, mesh)
    u, s, vt = np.asarray(u), np.asarray(s), np.asarray(vt)
    assert np.allclose((u * s[None, :]) @ vt, a, atol=1e-10)
    assert np.allclose(u.T @ u, np.eye(k), atol=1e-10)
    assert np.allclose(s, np.linalg.svd(a, compute_uv=False), atol=1e-10)


def test_distributed_truncate_bond(rng):
    mesh = make_mesh(dp=8, tp=1)
    m, k, r_true = 128, 8, 3
    a = (rng.standard_normal((m, r_true)) @ rng.standard_normal((r_true, k))
         + 1e-9 * rng.standard_normal((m, k)))
    a_sh = jax.device_put(jnp.asarray(a), NamedSharding(mesh, P("dp", None)))
    left, right, keep = distributed_truncate_bond(a_sh, mesh, rel_tol=1e-6)
    # rank detected, shapes static, masked reconstruction within rel_tol
    assert np.asarray(keep).sum() == r_true
    assert left.shape == (m, k) and right.shape == (k, k)
    assert np.linalg.norm(np.asarray(left) @ np.asarray(right) - a) < 1e-6
    # max_bond cap wins over the tail rule
    l2, r2, k2 = distributed_truncate_bond(a_sh, mesh, rel_tol=0.0,
                                           max_bond=2)
    assert np.asarray(k2).sum() == 2
    # jits without retracing shape changes
    fn = jax.jit(lambda x: distributed_truncate_bond(x, mesh, rel_tol=1e-6))
    l3, _, _ = fn(a_sh)
    assert np.allclose(np.asarray(l3), np.asarray(left), atol=1e-12)


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
