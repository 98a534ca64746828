"""QTT tooling tests: encodings, splitting, multi-dim wrappers, reorder
(mirrors /root/reference/test/test_qtt_tools.jl and test_qtt_multidim.jl)."""

import numpy as np
import pytest

import jax

from ttnx import (
    QTTOperator,
    QTTVector,
    check_compat,
    function_to_qtt,
    function_to_qtt_uniform,
    function_to_qttv,
    gauss_chebyshev_lobatto,
    index_to_point,
    laplacian,
    qtt_basis_vector,
    qtt_chebyshev,
    qtt_cos,
    qtt_exp,
    qtt_polynom,
    qtt_sin,
    qtt_to_vector,
    qtt_trapezoidal,
    qttv_to_array,
    rand_tt,
    reorder,
    tensor_to_grid,
    to_qtt,
    to_ttv,
    ttv_decomp,
    ttv_to_tensor,
    tuple_to_index,
)


def grid(d):
    n = 2 ** d
    return np.arange(n) / (n - 1)


class TestGrids:
    def test_index_maps(self):
        assert index_to_point([0, 0, 0]) == 0.0
        assert index_to_point([1, 1, 1]) == 1.0
        assert np.isclose(index_to_point([1, 0, 0]), 4 / 7)
        assert tuple_to_index([1, 0, 1]) == 5

    def test_gauss_chebyshev_lobatto(self):
        x, w = gauss_chebyshev_lobatto(5, shifted=True)
        assert np.isclose(x[0], 1.0) and np.isclose(x[-1], 0.0)
        assert np.all((0 <= x) & (x <= 1))
        # weights integrate constants exactly under the Chebyshev measure
        assert w[0] == w[-1]

    def test_tensor_to_grid_is_reshape(self):
        t = np.arange(8).reshape(2, 2, 2)
        assert np.array_equal(np.asarray(tensor_to_grid(t)), np.arange(8))


class TestEncodings:
    @pytest.mark.parametrize("d", [2, 3, 6])
    def test_qtt_sin(self, d):
        v = np.asarray(qtt_to_vector(qtt_sin(d, lam=2.0)))
        assert np.allclose(v, np.sin(2.0 * np.pi * grid(d)), atol=1e-12)

    def test_qtt_sin_interval(self):
        d = 5
        a, b = -1.0, 2.0
        xs = a + (b - a) * grid(d)
        v = np.asarray(qtt_to_vector(qtt_sin(d, a=a, b=b, lam=0.7)))
        assert np.allclose(v, np.sin(0.7 * np.pi * xs), atol=1e-12)

    @pytest.mark.parametrize("d", [2, 3, 6])
    def test_qtt_cos(self, d):
        v = np.asarray(qtt_to_vector(qtt_cos(d, lam=3.0)))
        assert np.allclose(v, np.cos(3.0 * np.pi * grid(d)), atol=1e-12)

    def test_qtt_exp(self):
        d = 6
        v = np.asarray(qtt_to_vector(qtt_exp(d, alpha=1.3, beta=-0.2)))
        assert np.allclose(v, np.exp(1.3 * grid(d) - 0.2), atol=1e-12)

    def test_qtt_polynom(self):
        d = 6
        coef = [1.0, -2.0, 0.5, 3.0]  # 1 - 2x + 0.5x^2 + 3x^3
        v = np.asarray(qtt_to_vector(qtt_polynom(coef, d)))
        x = grid(d)
        ref = coef[0] + coef[1] * x + coef[2] * x ** 2 + coef[3] * x ** 3
        assert np.allclose(v, ref, atol=1e-12)

    def test_qtt_polynom_interval(self):
        d = 5
        coef = [0.0, 1.0, 1.0]
        a, b = 1.0, 3.0
        x = a + (b - a) * grid(d)
        v = np.asarray(qtt_to_vector(qtt_polynom(coef, d, a=a, b=b)))
        assert np.allclose(v, x + x ** 2, atol=1e-11)

    def test_qtt_chebyshev(self):
        d, n = 6, 4
        v = np.asarray(qtt_to_vector(qtt_chebyshev(n, d)))
        x_nodes, _ = gauss_chebyshev_lobatto(2 ** d, shifted=True)
        theta = np.arccos(np.clip(2 * x_nodes - 1, -1, 1))
        assert np.allclose(v, np.cos(n * theta), atol=1e-12)

    def test_qtt_basis_vector(self):
        d = 4
        for pos in [0, 5, 15]:
            v = np.asarray(qtt_to_vector(qtt_basis_vector(d, pos, val=2.5)))
            e = np.zeros(16)
            e[pos] = 2.5
            assert np.allclose(v, e)

    def test_qtt_trapezoidal(self):
        d = 4
        h = 1.0 / (2 ** d - 1)
        v = np.asarray(qtt_to_vector(qtt_trapezoidal(d)))
        assert np.allclose(v, h * np.ones(16))

    def test_function_to_qtt(self):
        d = 6
        f = lambda x: np.sin(np.pi * x) * np.exp(x)
        v = np.asarray(qtt_to_vector(function_to_qtt(f, d)))
        assert np.allclose(v, f(grid(d)), atol=1e-12)

    def test_function_to_qtt_uniform(self):
        # little-endian encoding (see fourier bit-order contract): the
        # big-endian readout returns the grid values bit-reversed
        d = 5
        f = lambda x: x ** 2
        v = np.asarray(qtt_to_vector(function_to_qtt_uniform(f, d)))
        xs = np.arange(2 ** d) / 2 ** d
        perm = [int(f"{i:05b}"[::-1], 2) for i in range(2 ** d)]
        assert np.allclose(v, (xs ** 2)[perm], atol=1e-12)


class TestSplitting:
    def test_to_qtt_round_trip(self, rng):
        # a TT with dims (4, 8) split into bits and merged back
        a = rng.standard_normal((4, 8))
        tt = ttv_decomp(a)
        qtt = to_qtt(tt, [[2, 2], [2, 2, 2]])
        assert qtt.dims == (2, 2, 2, 2, 2)
        merged = to_ttv(qtt, [2, 3])
        assert np.allclose(np.asarray(ttv_to_tensor(merged)), a)
        # big-endian: the flattened values agree with the original C-order
        assert np.allclose(
            np.asarray(ttv_to_tensor(qtt)).reshape(-1), a.reshape(-1))

    def test_to_qtt_threshold(self, key):
        x = rand_tt(key, (4, 4, 4), rmax=2)
        q = to_qtt(x, [[2, 2]] * 3, threshold=1e-13)
        back = to_ttv(q, [2, 2, 2])
        ref = np.asarray(ttv_to_tensor(x))
        assert np.allclose(np.asarray(ttv_to_tensor(back)), ref)

    def test_to_qtt_validates(self, key):
        x = rand_tt(key, (4, 4), rmax=2)
        with pytest.raises(ValueError):
            to_qtt(x, [[2, 2]])
        with pytest.raises(ValueError):
            to_qtt(x, [[2, 3], [2, 2]])
        with pytest.raises(ValueError):
            to_ttv(x, [3])


class TestMultiDim:
    def test_wrapper_validation(self, key):
        x = rand_tt(key, (2,) * 6, rmax=2)
        q = QTTVector(x, 2, 3, "serial")
        assert q.n_dims == 2 and q.bits_per_dim == 3
        with pytest.raises(ValueError):
            QTTVector(x, 2, 2, "serial")
        with pytest.raises(ValueError):
            QTTVector(x, 2, 3, "weird")
        bad = rand_tt(key, (4, 4), rmax=2)
        with pytest.raises(ValueError):
            QTTVector(bad, 1, 2, "serial")

    def test_check_compat(self, key):
        x = rand_tt(key, (2,) * 6, rmax=2)
        a = QTTVector(x, 2, 3, "serial")
        b = QTTVector(x, 3, 2, "serial")
        with pytest.raises(ValueError):
            check_compat(a, b)
        c = QTTVector(x, 2, 3, "interleaved")
        with pytest.raises(ValueError):
            check_compat(a, c)
        check_compat(a, a)

    def test_arithmetic_keeps_metadata(self, key):
        k1, k2 = jax.random.split(key)
        a = QTTVector(rand_tt(k1, (2,) * 4, rmax=2), 2, 2, "serial")
        b = QTTVector(rand_tt(k2, (2,) * 4, rmax=2), 2, 2, "serial")
        c = a + 2.0 * b
        assert isinstance(c, QTTVector)
        assert c.ordering == "serial"
        ref = np.asarray(ttv_to_tensor(a.tt())) + 2 * np.asarray(ttv_to_tensor(b.tt()))
        assert np.allclose(np.asarray(ttv_to_tensor(c.tt())), ref)

    def test_function_to_qttv_serial(self):
        f = lambda c: np.sin(np.pi * c[..., 0]) * np.cos(np.pi * c[..., 1])
        q = function_to_qttv(f, 2, 4, ordering="serial")
        arr = np.asarray(qttv_to_array(q))
        xs = grid(4)
        ref = np.sin(np.pi * xs)[:, None] * np.cos(np.pi * xs)[None, :]
        assert np.allclose(arr, ref, atol=1e-10)

    def test_function_to_qttv_interleaved_round_trip(self):
        f = lambda c: np.exp(-((c[..., 0] - 0.5) ** 2 + (c[..., 1] - 0.3) ** 2))
        qs = function_to_qttv(f, 2, 3, ordering="serial")
        qi = function_to_qttv(f, 2, 3, ordering="interleaved")
        # same function, two orderings -> arrays agree
        assert np.allclose(
            np.asarray(qttv_to_array(qs)), np.asarray(qttv_to_array(qi)), atol=1e-10)

    def test_reorder_round_trip(self):
        f = lambda c: 1.0 / (1.0 + c[..., 0] + 2 * c[..., 1])
        q = function_to_qttv(f, 2, 4, ordering="serial")
        qi = reorder(q, "interleaved")
        assert qi.ordering == "interleaved"
        # values preserved under reorder
        assert np.allclose(
            np.asarray(qttv_to_array(qi)), np.asarray(qttv_to_array(q)), atol=1e-10)
        back = reorder(qi, "serial")
        assert np.allclose(
            np.asarray(ttv_to_tensor(back.tt())),
            np.asarray(ttv_to_tensor(q.tt())), atol=1e-10)

    def test_reorder_same_ordering_is_copy(self):
        f = lambda c: c[..., 0] + c[..., 1]
        q = function_to_qttv(f, 2, 3, ordering="serial")
        q2 = reorder(q, "serial")
        assert q2.ordering == "serial"
        assert np.allclose(
            np.asarray(ttv_to_tensor(q2.tt())), np.asarray(ttv_to_tensor(q.tt())))

    def test_interleaved_separable_rank(self):
        # separable function: serial ordering gives rank 1 across the
        # dimension boundary
        f = lambda c: np.sin(np.pi * c[..., 0]) * np.sin(np.pi * c[..., 1])
        qs = function_to_qttv(f, 2, 4, ordering="serial", tol=1e-10)
        assert qs.ranks[4] == 1  # bond between the two dimensions

    def test_operator_wrapper_matvec(self, key):
        d = 3
        lap = laplacian(2 * d)
        A = QTTOperator(lap, 2, d, "serial")
        x = QTTVector(rand_tt(key, (2,) * (2 * d), rmax=2), 2, d, "serial")
        y = A @ x
        assert isinstance(y, QTTVector)
        ref = np.asarray(qtt_to_vector(lap @ x.tt()))
        assert np.allclose(np.asarray(qtt_to_vector(y.tt())), ref)


class TestMultiDimContracts:
    """Ports of /root/reference/test/test_qtt_multidim.jl:448-631 — the
    multi-dim behavioral contract (ordering-independent algebra, reorder
    round-trips, hadamard, metadata-preserving compression/rank growth)."""

    def test_dot_norm_arithmetic_ordering_independent(self):
        # test_qtt_multidim.jl:448-487
        from ttnx import dot, norm

        f1 = lambda c: np.exp(-c[..., 0]) * (1.0 + c[..., 1])
        f2 = lambda c: np.cos(np.pi * c[..., 0]) * (1.0 + 2.0 * c[..., 1])
        bits = 4
        q1_il = function_to_qttv(f1, 2, bits, ordering="interleaved")
        q2_il = function_to_qttv(f2, 2, bits, ordering="interleaved")
        q1_sr = function_to_qttv(f1, 2, bits, ordering="serial")
        q2_sr = function_to_qttv(f2, 2, bits, ordering="serial")

        arr1 = np.asarray(qttv_to_array(q1_il))
        arr2 = np.asarray(qttv_to_array(q2_il))
        dot_ref = float(np.sum(arr1 * arr2))
        norm_ref = float(np.sqrt(np.sum(arr1 ** 2)))

        assert np.isclose(float(dot(q1_il.tt(), q2_il.tt())), dot_ref,
                          rtol=1e-10)
        assert np.isclose(float(dot(q1_sr.tt(), q2_sr.tt())), dot_ref,
                          rtol=1e-10)
        assert np.isclose(float(norm(q1_il.tt())), norm_ref, rtol=1e-10)
        assert np.isclose(float(norm(q1_sr.tt())), norm_ref, rtol=1e-10)
        assert np.isclose(float(norm(q1_il.tt())) ** 2,
                          float(dot(q1_il.tt(), q1_il.tt())), rtol=1e-10)

        assert np.allclose(np.asarray(qttv_to_array(q1_il + q2_il)),
                           arr1 + arr2, atol=1e-12)
        assert np.allclose(np.asarray(qttv_to_array(q1_sr + q2_sr)),
                           arr1 + arr2, atol=1e-12)
        assert np.allclose(np.asarray(qttv_to_array(q1_il - q2_il)),
                           arr1 - arr2, atol=1e-12)
        assert np.allclose(np.asarray(qttv_to_array(3.5 * q1_il)),
                           3.5 * arr1, atol=1e-12)
        assert np.allclose(np.asarray(qttv_to_array(q1_sr * 3.5)),
                           3.5 * arr1, atol=1e-12)
        assert np.allclose(np.asarray(qttv_to_array(q1_il / 2.0)),
                           arr1 / 2.0, atol=1e-12)

    def test_reorder_3d_round_trip_and_cross_validation(self):
        # test_qtt_multidim.jl:489-520
        from ttnx import norm, reorder

        f = lambda c: (np.cos(np.pi * c[..., 0]) * np.sin(2 * np.pi * c[..., 1])
                       * np.exp(-c[..., 2]))
        bits = 3
        q_sr = function_to_qttv(f, 3, bits, ordering="serial")
        q_il = function_to_qttv(f, 3, bits, ordering="interleaved")
        arr_sr = np.asarray(qttv_to_array(q_sr))
        arr_il = np.asarray(qttv_to_array(q_il))
        assert np.allclose(arr_sr, arr_il, atol=1e-12)

        q_il_r = reorder(q_sr, "interleaved")
        assert q_il_r.ordering == "interleaved"
        assert q_il_r.n_dims == 3 and q_il_r.bits_per_dim == bits
        assert np.allclose(np.asarray(qttv_to_array(q_il_r)), arr_il,
                           atol=1e-10)

        q_il_t = reorder(q_sr, "interleaved", threshold=1e-14)
        assert np.allclose(np.asarray(qttv_to_array(q_il_t)), arr_il,
                           atol=1e-10)

        q_sr_r = reorder(q_il, "serial")
        assert q_sr_r.ordering == "serial"
        assert np.allclose(np.asarray(qttv_to_array(q_sr_r)), arr_sr,
                           atol=1e-10)

        q_rt = reorder(reorder(q_sr, "interleaved"), "serial")
        assert np.allclose(np.asarray(qttv_to_array(q_rt)), arr_sr, atol=1e-10)
        assert np.isclose(float(norm(q_il_r.tt())), float(norm(q_sr.tt())),
                          rtol=1e-10)

    @pytest.mark.parametrize("ordering", ["serial", "interleaved"])
    def test_hadamard_2d_and_identity(self, ordering):
        # test_qtt_multidim.jl:522-556 (incl. sin^2+cos^2 = 1 identity)
        bits = 4
        f1 = lambda c: np.sin(np.pi * c[..., 0]) * np.sin(np.pi * c[..., 1])
        f2 = lambda c: np.cos(np.pi * c[..., 0]) * np.cos(np.pi * c[..., 1])
        q1 = function_to_qttv(f1, 2, bits, ordering=ordering)
        q2 = function_to_qttv(f2, 2, bits, ordering=ordering)
        h12 = q1.hadamard(q2)
        assert isinstance(h12, QTTVector)
        assert h12.ordering == ordering
        assert h12.n_dims == 2 and h12.bits_per_dim == bits
        arr1 = np.asarray(qttv_to_array(q1))
        arr2 = np.asarray(qttv_to_array(q2))
        assert np.allclose(np.asarray(qttv_to_array(h12)), arr1 * arr2,
                           atol=1e-12)

        qss = q1.hadamard(q1)
        qcc = q2.hadamard(q2)
        arr_sum = np.asarray(qttv_to_array(qss + qcc))
        xs = grid(bits)
        ref = (np.sin(np.pi * xs[:, None]) ** 2 * np.sin(np.pi * xs[None, :]) ** 2
               + np.cos(np.pi * xs[:, None]) ** 2 * np.cos(np.pi * xs[None, :]) ** 2)
        assert np.allclose(arr_sum, ref, atol=1e-12)

    @pytest.mark.parametrize("ordering", ["serial", "interleaved"])
    def test_hadamard_3d(self, ordering):
        # test_qtt_multidim.jl:558-577
        bits = 3
        f1 = lambda c: (np.sin(np.pi * c[..., 0]) * np.sin(np.pi * c[..., 1])
                        * np.sin(np.pi * c[..., 2]))
        f2 = lambda c: np.exp(-c[..., 0] - c[..., 1] - c[..., 2])
        q1 = function_to_qttv(f1, 3, bits, ordering=ordering)
        q2 = function_to_qttv(f2, 3, bits, ordering=ordering)
        h12 = q1.hadamard(q2)
        assert isinstance(h12, QTTVector)
        assert h12.ordering == ordering and h12.n_dims == 3
        arr1 = np.asarray(qttv_to_array(q1))
        arr2 = np.asarray(qttv_to_array(q2))
        assert np.allclose(np.asarray(qttv_to_array(h12)), arr1 * arr2,
                           atol=1e-12)

    def test_separable_serial_rank1_after_compress(self):
        # test_qtt_multidim.jl:579-599
        bits = 6
        f = lambda c: np.exp(-c[..., 0]) * np.exp(-c[..., 1])
        q = q0 = function_to_qttv(f, 2, bits, ordering="serial")
        q_c = q.compress(10, truncerr=1e-12)
        assert q_c.ranks[bits] == 1  # cross-dimension bond
        assert max(q_c.ranks) == 1  # exp is rank-1 in QTT
        xs = grid(bits)
        ref = np.exp(-xs[:, None]) * np.exp(-xs[None, :])
        assert np.allclose(np.asarray(qttv_to_array(q_c)), ref, atol=1e-10)

    def test_compress_preserves_metadata(self):
        # test_qtt_multidim.jl:601-617
        bits = 5
        f = lambda c: np.sin(2 * np.pi * c[..., 0]) * np.sin(2 * np.pi * c[..., 1])
        q = function_to_qttv(f, 2, bits, ordering="interleaved")
        arr_ref = np.asarray(qttv_to_array(q))
        q_c = q.compress(8, truncerr=1e-12)
        assert isinstance(q_c, QTTVector)
        assert q_c.ordering == "interleaved"
        assert q_c.n_dims == 2 and q_c.bits_per_dim == bits
        assert max(q_c.ranks) <= 8
        assert np.allclose(np.asarray(qttv_to_array(q_c)), arr_ref, atol=1e-8)

    def test_increase_ranks_preserves_metadata_and_values(self):
        # test_qtt_multidim.jl:619-631
        bits = 4
        f = lambda c: np.exp(-c[..., 0]) * np.exp(-c[..., 1])
        q = function_to_qttv(f, 2, bits, ordering="serial")
        arr_ref = np.asarray(qttv_to_array(q))
        q_up = q.increase_ranks(4, noise=0.0)
        assert isinstance(q_up, QTTVector)
        assert q_up.ordering == q.ordering
        assert q_up.n_dims == q.n_dims and q_up.bits_per_dim == q.bits_per_dim
        assert max(q_up.ranks) <= 4
        assert max(q_up.ranks) > max(q.ranks)
        assert np.allclose(np.asarray(qttv_to_array(q_up)), arr_ref,
                           atol=1e-12)
