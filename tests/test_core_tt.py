"""Core container tests — oracle comparisons vs dense numpy, mirroring the
reference's test strategy (/root/reference/test/test_tt_tools.jl)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import ttnx
from ttnx import (
    TTVector,
    concatenate,
    entanglement_entropy,
    id_tto,
    increase_ranks,
    ones_tt,
    orthogonalize,
    r_and_d_to_rks,
    rand_tt,
    tt_compress,
    tt_round,
    tto_decomp,
    tto_to_tensor,
    tto_to_ttv,
    ttv_decomp,
    ttv_to_tensor,
    ttv_to_tto,
    zeros_tt,
)


def dense(tt):
    return np.asarray(ttv_to_tensor(tt))


def dense_mat(op):
    t = np.asarray(tto_to_tensor(op))
    d = op.N
    return t.reshape(int(np.prod(op.out_dims)), int(np.prod(op.in_dims)))


def rel_err(a, b):
    return np.linalg.norm(np.asarray(a) - np.asarray(b)) / np.linalg.norm(np.asarray(b))


class TestDecomp:
    def test_round_trip_2222(self, rng):
        # README headline: 2x2x2x2 tensor, tol=1e-12, rel err ~1e-16
        a = rng.standard_normal((2, 2, 2, 2))
        tt = ttv_decomp(a, tol=1e-12)
        assert rel_err(dense(tt), a) < 1e-12

    def test_round_trip_mixed_dims(self, rng):
        a = rng.standard_normal((3, 4, 2, 5))
        tt = ttv_decomp(a)
        assert rel_err(dense(tt), a) < 1e-12
        assert tt.dims == (3, 4, 2, 5)
        assert tt.ranks[0] == 1 and tt.ranks[-1] == 1

    def test_root_index(self, rng):
        a = rng.standard_normal((2, 3, 2, 3))
        for idx in range(4):
            tt = ttv_decomp(a, index=idx)
            assert rel_err(dense(tt), a) < 1e-12
            assert tt.ot[idx] == 0

    def test_truncation_low_rank(self, rng):
        # A rank-1 tensor decomposes with all ranks 1 at any tolerance
        v = rng.standard_normal(2)
        a = np.einsum("i,j,k->ijk", v, v, v)
        tt = ttv_decomp(a, tol=1e-10)
        assert tt.ranks == (1, 1, 1, 1)

    def test_complex_round_trip(self, rng):
        a = rng.standard_normal((2, 2, 2)) + 1j * rng.standard_normal((2, 2, 2))
        tt = ttv_decomp(a)
        assert rel_err(dense(tt), a) < 1e-12

    def test_tto_round_trip(self, rng):
        m = rng.standard_normal((2, 2, 2, 2, 2, 2))  # T[x1,x2,x3,y1,y2,y3]
        op = tto_decomp(m)
        assert rel_err(np.asarray(tto_to_tensor(op)), m) < 1e-12

    def test_ttv_tto_conversions(self, rng):
        m = rng.standard_normal((2, 2, 2, 2))
        op = tto_decomp(m)
        v = tto_to_ttv(op)
        assert v.dims == (4, 4)
        op2 = ttv_to_tto(v)
        assert rel_err(np.asarray(tto_to_tensor(op2)), m) < 1e-13


class TestFactories:
    def test_zeros_ones(self):
        z = zeros_tt((2, 2, 2), (1, 2, 2, 1))
        assert dense(z).max() == 0
        o = ones_tt((2, 3, 2))
        assert np.allclose(dense(o), 1.0)

    def test_rand_shapes(self, key):
        x = rand_tt(key, (2, 2, 2, 2), rmax=3)
        assert x.ranks == (1, 2, 3, 2, 1)

    def test_rand_orthogonal(self, key):
        x = rand_tt(key, (2,) * 5, rmax=3, normalise=True, orthogonal=True)
        for k in range(4):
            rl, n, rr = x.cores[k].shape
            q = np.asarray(x.cores[k]).reshape(rl * n, rr)
            assert np.allclose(q.T @ q, np.eye(rr), atol=1e-12)

    def test_r_and_d_to_rks(self):
        assert r_and_d_to_rks([1, 10, 10, 10, 1], (2, 2, 2, 2)) == (1, 2, 4, 2, 1)
        assert r_and_d_to_rks([1, 10, 10, 10, 1], (2, 2, 2, 2), rmax=3) == (1, 2, 3, 2, 1)

    def test_id_tto(self):
        eye = id_tto(3)
        assert np.allclose(dense_mat(eye), np.eye(8))


class TestOrthogonalize:
    @pytest.mark.parametrize("center", [0, 2, 4])
    def test_value_preserved_and_canonical(self, key, center):
        x = rand_tt(key, (2,) * 5, rmax=4)
        ref = dense(x)
        y = orthogonalize(x, center)
        assert rel_err(dense(y), ref) < 1e-12
        for j in range(center):
            rl, n, rr = y.cores[j].shape
            q = np.asarray(y.cores[j]).reshape(rl * n, rr)
            assert np.allclose(q.T @ q, np.eye(rr), atol=1e-12)
        for j in range(center + 1, 5):
            rl, n, rr = y.cores[j].shape
            q = np.asarray(y.cores[j]).reshape(rl, n * rr)
            assert np.allclose(q @ q.T, np.eye(rl), atol=1e-12)
        assert y.ot == tuple([1] * center + [0] + [-1] * (4 - center))

    def test_norm_in_center(self, key):
        x = rand_tt(key, (2,) * 4, rmax=3)
        y = orthogonalize(x, 1)
        nrm = np.linalg.norm(np.asarray(y.cores[1]))
        assert np.isclose(nrm, np.linalg.norm(dense(x)), rtol=1e-12)


class TestEntropy:
    def test_product_state_zero(self):
        psi = ones_tt((2, 2, 2, 2))
        s = entanglement_entropy(psi)
        assert np.allclose(s, 0.0, atol=1e-12)

    def test_bell_state(self):
        # (|00> + |11>)/sqrt(2) has entropy log(2)
        a = np.zeros((2, 2))
        a[0, 0] = a[1, 1] = 1 / np.sqrt(2)
        tt = ttv_decomp(a)
        s = entanglement_entropy(tt)
        assert np.isclose(s[0], np.log(2), atol=1e-12)
        s2 = entanglement_entropy(tt, base=2)
        assert np.isclose(s2[0], 1.0, atol=1e-12)


class TestCompression:
    def test_compress_duplicate_sum(self, key):
        x = rand_tt(key, (2,) * 6, rmax=3)
        two_x = x + x
        assert max(two_x.ranks) == 6
        c = tt_compress(two_x, max_bond=3, truncerr=1e-12)
        assert max(c.ranks) <= 3
        assert rel_err(dense(c), 2 * dense(x)) < 1e-10

    def test_round_duplicate_sum(self, key):
        x = rand_tt(key, (2,) * 6, rmax=3)
        two_x = x + x
        c = tt_round(two_x, rel_tol=1e-12)
        assert max(c.ranks) <= 3
        assert rel_err(dense(c), 2 * dense(x)) < 1e-12

    def test_round_max_bond(self, key):
        x = rand_tt(key, (2,) * 6, rmax=8)
        c = tt_round(x, max_bond=4)
        assert max(c.ranks) <= 4

    def test_increase_ranks_exact(self, key):
        x = rand_tt(key, (2,) * 5, rmax=2)
        y = increase_ranks(x, 4)
        assert max(y.ranks) == 4
        assert rel_err(dense(y), dense(x)) < 1e-14

    def test_increase_ranks_noise(self, key):
        k1, k2 = jax.random.split(key)
        x = rand_tt(k1, (2,) * 5, rmax=2)
        y = increase_ranks(x, 4, noise=1e-8, key=k2)
        assert rel_err(dense(y), dense(x)) < 1e-6


class TestStructure:
    def test_concatenate(self, key):
        k1, k2 = jax.random.split(key)
        a = rand_tt(k1, (2, 2), rmax=2)
        b = rand_tt(k2, (2, 2, 2), rmax=2)
        c = concatenate(a, b)
        assert c.N == 5
        # concatenation with boundary rank 1 = Kronecker product
        ref = np.einsum("i,j->ij", dense(a).reshape(-1), dense(b).reshape(-1))
        assert rel_err(dense(c).reshape(4, 8), ref) < 1e-12

    def test_concatenate_rank_mismatch(self, key):
        a = rand_tt(key, (2, 2), rmax=2)
        bad = TTVector([jnp.ones((2, 2, 1))])
        with pytest.raises(ValueError):
            concatenate(a, bad)

    def test_astype_complex(self, key):
        x = rand_tt(key, (2, 2, 2), rmax=2)
        xc = x.astype(jnp.complex128)
        assert xc.is_complex
        assert rel_err(dense(xc), dense(x)) < 1e-15
