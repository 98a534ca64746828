"""Pallas kernel tests (interpret mode on CPU)."""

import numpy as np

import jax.numpy as jnp

from ttnx.kernels.contraction import merge_resplit_chain, two_site_merge


def test_two_site_merge_matches_einsum(rng):
    B, m, k, n = 8, 16, 8, 16
    a = jnp.asarray(rng.standard_normal((B, m, k)), dtype=jnp.float32)
    b = jnp.asarray(rng.standard_normal((B, k, n)), dtype=jnp.float32)
    out = two_site_merge(a, b, block_b=4, interpret=True)
    expect = np.einsum("bmk,bkn->bmn", np.asarray(a), np.asarray(b))
    assert np.allclose(np.asarray(out), expect, atol=1e-5)


def test_two_site_merge_tt_shapes(rng):
    # the real TT shape class: (rl*n, rm) x (rm, n*rr)
    B, r, n = 4, 8, 2
    a = jnp.asarray(rng.standard_normal((B, r * n, r)), dtype=jnp.float32)
    b = jnp.asarray(rng.standard_normal((B, r, n * r)), dtype=jnp.float32)
    out = two_site_merge(a, b, block_b=2, interpret=True)
    expect = np.einsum("bmk,bkn->bmn", np.asarray(a), np.asarray(b))
    assert np.allclose(np.asarray(out), expect, atol=1e-5)


def test_merge_resplit_chain_matches_reference_loop(rng):
    B, r, n = 4, 8, 2
    a = jnp.asarray(0.1 * rng.standard_normal((B, r * n, r)), dtype=jnp.float32)
    # orthonormal factors keep the normalization-free chain bounded
    b = jnp.asarray(np.swapaxes(
        np.linalg.qr(rng.standard_normal((B, n * r, r)))[0], 1, 2),
        dtype=jnp.float32)
    w = jnp.asarray(np.linalg.qr(rng.standard_normal((B, n * r, r)))[0],
                    dtype=jnp.float32)
    iters = 3
    out = merge_resplit_chain(a, b, w, iters=iters, block_b=4, interpret=True)

    acc = np.asarray(a)
    bn, wn = np.asarray(b), np.asarray(w)
    for _ in range(iters):
        c = np.einsum("bmk,bkn->bmn", acc, bn)
        acc = np.einsum("bmn,bnk->bmk", c, wn).astype(np.float32)
    assert np.allclose(np.asarray(out), acc, atol=1e-4)
