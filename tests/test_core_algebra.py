"""TT algebra oracle tests vs dense numpy
(mirrors /root/reference/test/test_tt_operations.jl)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ttnx import (
    dot,
    euclidean_distance,
    euclidean_distance_normalized,
    hadamard,
    hadamard_ttm,
    id_tto,
    inner_core_product,
    kron_tt,
    kron_tto,
    linear_combination,
    norm,
    ones_tt,
    outer_product,
    rand_tt,
    rand_tto,
    tto_to_tensor,
    ttv_to_diag_tto,
    ttv_to_tensor,
)


def dense(tt):
    return np.asarray(ttv_to_tensor(tt))


def dense_mat(op):
    t = np.asarray(tto_to_tensor(op))
    return t.reshape(int(np.prod(op.out_dims)), int(np.prod(op.in_dims)))


def vec(tt):
    return dense(tt).reshape(-1)


def keys(key, n):
    return jax.random.split(key, n)


class TestAddScale:
    def test_add(self, key):
        k1, k2 = keys(key, 2)
        x = rand_tt(k1, (2, 3, 2), rmax=3)
        y = rand_tt(k2, (2, 3, 2), rmax=2)
        z = x + y
        assert np.allclose(dense(z), dense(x) + dense(y))
        assert z.ranks == tuple(
            min(a + b, 1 if k in (0, 3) else 10**9)
            for k, (a, b) in enumerate(zip(x.ranks, y.ranks)))

    def test_add_single_site(self, key):
        k1, k2 = keys(key, 2)
        x = rand_tt(k1, (4,), rmax=1)
        y = rand_tt(k2, (4,), rmax=1)
        assert np.allclose(dense(x + y), dense(x) + dense(y))

    def test_sub_scale_div(self, key):
        k1, k2 = keys(key, 2)
        x = rand_tt(k1, (2, 2, 2), rmax=2)
        y = rand_tt(k2, (2, 2, 2), rmax=2)
        assert np.allclose(dense(x - y), dense(x) - dense(y))
        assert np.allclose(dense(2.5 * x), 2.5 * dense(x))
        assert np.allclose(dense(x / 2.0), dense(x) / 2.0)
        assert np.allclose(dense(-x), -dense(x))

    def test_scale_zero(self, key):
        x = rand_tt(key, (2, 2, 2), rmax=2)
        z = 0 * x
        assert np.allclose(dense(z), 0.0)
        assert z.ranks == x.ranks

    def test_scale_complex_promotes(self, key):
        x = rand_tt(key, (2, 2), rmax=2)
        z = 1j * x
        assert z.is_complex
        assert np.allclose(dense(z), 1j * dense(x))

    def test_linear_combination(self, key):
        ks = keys(key, 3)
        tts = [rand_tt(k, (2, 2, 2), rmax=2) for k in ks]
        coeffs = [0.5, -1.0, 2.0]
        z = linear_combination(tts, coeffs)
        ref = sum(c * dense(t) for c, t in zip(coeffs, tts))
        assert np.allclose(dense(z), ref)


class TestContractions:
    def test_matvec(self, key):
        k1, k2 = keys(key, 2)
        A = rand_tto(k1, (2, 2, 2), rmax=3)
        x = rand_tt(k2, (2, 2, 2), rmax=2)
        y = A @ x
        assert np.allclose(vec(y), dense_mat(A) @ vec(x))
        assert y.ranks == tuple(a * b for a, b in zip(A.ranks, x.ranks))

    def test_matvec_call_sugar(self, key):
        k1, k2 = keys(key, 2)
        A = rand_tto(k1, (2, 2), rmax=2)
        x = rand_tt(k2, (2, 2), rmax=2)
        assert np.allclose(vec(A(x)), vec(A @ x))
        assert np.allclose(vec(A * x), vec(A @ x))

    def test_matmul(self, key):
        k1, k2 = keys(key, 2)
        A = rand_tto(k1, (2, 2, 2), rmax=2)
        B = rand_tto(k2, (2, 2, 2), rmax=2)
        C = A @ B
        assert np.allclose(dense_mat(C), dense_mat(A) @ dense_mat(B))

    def test_op_add_sub_scale(self, key):
        k1, k2 = keys(key, 2)
        A = rand_tto(k1, (2, 2, 2), rmax=2)
        B = rand_tto(k2, (2, 2, 2), rmax=2)
        assert np.allclose(dense_mat(A + B), dense_mat(A) + dense_mat(B))
        assert np.allclose(dense_mat(A - B), dense_mat(A) - dense_mat(B))
        assert np.allclose(dense_mat(3.0 * A), 3.0 * dense_mat(A))

    def test_identity_matvec(self, key):
        x = rand_tt(key, (2, 2, 2, 2), rmax=2)
        y = id_tto(4) @ x
        assert np.allclose(vec(y), vec(x))

    def test_inner_core_product(self, key):
        k1, k2 = keys(key, 2)
        A = rand_tto(k1, (2, 2), rmax=2)
        B = rand_tto(k2, (2, 2), rmax=2)
        C = inner_core_product(A, B)
        assert C.dims == (4, 4)
        # sitewise Kronecker: dense(C) = P (kron of matrices per site with
        # A-major merged indices). Verify against per-site np.kron contraction.
        a1 = np.asarray(A.cores[0])[0]  # (2,2,rA)
        # build dense by brute force: C matrix = sum over bond products
        Cm = dense_mat(C)
        # oracle: operator on product space, entry ((iA iB),(jA jB))
        dA = dense_mat(A).reshape(2, 2, 2, 2)  # [i1,i2,j1,j2]
        dB = dense_mat(B).reshape(2, 2, 2, 2)
        ref = np.einsum("abcd,efgh->aebfcgdh", dA, dB).reshape(16, 16)
        assert np.allclose(Cm, ref)

    def test_outer_product(self, key):
        k1, k2 = keys(key, 2)
        x = rand_tt(k1, (2, 2, 2), rmax=2)
        y = rand_tt(k2, (2, 2, 2), rmax=2)
        P = outer_product(x, y)
        assert np.allclose(dense_mat(P), np.outer(vec(x), vec(y).conj()))

    def test_diag_tto(self, key):
        x = rand_tt(key, (2, 3, 2), rmax=2)
        D = ttv_to_diag_tto(x)
        assert np.allclose(dense_mat(D), np.diag(vec(x)))


class TestDotNorm:
    def test_dot(self, key):
        k1, k2 = keys(key, 2)
        a = rand_tt(k1, (2, 2, 2, 2), rmax=3)
        b = rand_tt(k2, (2, 2, 2, 2), rmax=2)
        assert np.isclose(float(dot(a, b)), vec(a) @ vec(b))

    def test_dot_complex_conjugates_first(self, key):
        k1, k2 = keys(key, 2)
        a = rand_tt(k1, (2, 2), rmax=2, dtype=jnp.complex128)
        b = rand_tt(k2, (2, 2), rmax=2, dtype=jnp.complex128)
        assert np.isclose(complex(dot(a, b)), np.vdot(vec(a), vec(b)))

    def test_norm(self, key):
        a = rand_tt(key, (2, 2, 2), rmax=2)
        assert np.isclose(float(norm(a)), np.linalg.norm(vec(a)))

    def test_distances(self, key):
        k1, k2 = keys(key, 2)
        a = rand_tt(k1, (2, 2, 2), rmax=2)
        b = rand_tt(k2, (2, 2, 2), rmax=2)
        assert np.isclose(
            float(euclidean_distance(a, b)), np.linalg.norm(vec(a) - vec(b)))
        ref = np.linalg.norm(vec(a) - vec(b)) / np.linalg.norm(vec(b))
        assert np.isclose(float(euclidean_distance_normalized(a, b)), ref)


class TestHadamardKron:
    def test_hadamard(self, key):
        k1, k2 = keys(key, 2)
        x = rand_tt(k1, (2, 3, 2), rmax=2)
        y = rand_tt(k2, (2, 3, 2), rmax=2)
        z = hadamard(x, y)
        assert np.allclose(dense(z), dense(x) * dense(y))
        assert z.ranks == tuple(a * b for a, b in zip(x.ranks, y.ranks))

    def test_hadamard_ttm(self, key):
        k1, k2 = keys(key, 2)
        x = rand_tt(k1, (2,) * 5, rmax=3)
        y = rand_tt(k2, (2,) * 5, rmax=2)
        z = hadamard_ttm(x, y)
        assert np.allclose(dense(z), dense(x) * dense(y))
        # ranks must be at most the product ranks, typically much less
        prod_ranks = tuple(a * b for a, b in zip(x.ranks, y.ranks))
        assert all(r <= p for r, p in zip(z.ranks, prod_ranks))

    def test_hadamard_ttm_rank_cap(self, key):
        k1, k2 = keys(key, 2)
        x = rand_tt(k1, (2,) * 5, rmax=3)
        y = rand_tt(k2, (2,) * 5, rmax=3)
        z = hadamard_ttm(x, y, rmax=4)
        assert max(z.ranks) <= 4

    def test_kron_tt(self, key):
        k1, k2 = keys(key, 2)
        a = rand_tt(k1, (2, 2), rmax=2)
        b = rand_tt(k2, (2, 2, 2), rmax=2)
        c = kron_tt(a, b)
        assert np.allclose(vec(c), np.kron(vec(a), vec(b)))

    def test_kron_tto(self, key):
        k1, k2 = keys(key, 2)
        A = rand_tto(k1, (2, 2), rmax=2)
        B = rand_tto(k2, (2,), rmax=1)
        C = kron_tto(A, B)
        assert np.allclose(dense_mat(C), np.kron(dense_mat(A), dense_mat(B)))

    def test_ones_hadamard_identity(self, key):
        x = rand_tt(key, (2, 2, 2), rmax=2)
        o = ones_tt((2, 2, 2))
        assert np.allclose(dense(hadamard(x, o)), dense(x))
