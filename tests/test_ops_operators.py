"""Operator constructor oracle tests vs dense matrices
(mirrors /root/reference/test/test_tt_operators.jl)."""

import numpy as np
import pytest

from ttnx import (
    gradient,
    heisenberg_xyz_tto,
    id_tto,
    inv_laplacian_DN,
    ising_tto,
    laplacian,
    laplacian_DN,
    laplacian_ND,
    laplacian_NN,
    laplacian_P,
    pauli_matrix,
    pauli_pair_sum_tto,
    pauli_sum_tto,
    qtt_basis_vector,
    qtt_laplacian,
    qtt_to_vector,
    qtto_constant_prolongation,
    qtto_linear_prolongation,
    qtto_prolongation,
    qtto_to_matrix,
    shift,
    toeplitz_to_qtto,
    xxx_tto,
    xxz_tto,
    xy_tto,
)


def mat(op):
    return np.asarray(qtto_to_matrix(op))


def tridiag(n, alpha, beta, gamma):
    """alpha*I + beta*superdiag + gamma*subdiag."""
    m = alpha * np.eye(n)
    m += beta * np.diag(np.ones(n - 1), 1)
    m += gamma * np.diag(np.ones(n - 1), -1)
    return m


class TestToeplitz:
    @pytest.mark.parametrize("d", [2, 3, 5])
    def test_general(self, d):
        a, b, g = 2.0, -1.0, 0.5
        assert np.allclose(mat(toeplitz_to_qtto(a, b, g, d)), tridiag(2 ** d, a, b, g))

    def test_ranks(self):
        op = toeplitz_to_qtto(1, 2, 3, 4)
        assert op.ranks == (1, 3, 3, 3, 1)

    def test_shift(self):
        assert np.allclose(mat(shift(3)), tridiag(8, 0, 1, 0))

    def test_gradient(self):
        assert np.allclose(mat(gradient(3)), tridiag(8, 1, 0, -1))

    def test_laplacian_dd(self):
        d = 6
        assert np.allclose(mat(laplacian(d)), tridiag(2 ** d, 2, -1, -1))


def _bc_matrix(n, first, last):
    m = tridiag(n, 2, -1, -1)
    m[0, 0] = first
    m[-1, -1] = last
    return m


class TestLaplacianBCs:
    def test_dn(self):
        d = 6
        assert np.allclose(mat(laplacian_DN(d)), _bc_matrix(2 ** d, 2, 1))

    def test_nd(self):
        d = 6
        assert np.allclose(mat(laplacian_ND(d)), _bc_matrix(2 ** d, 1, 2))

    def test_nn(self):
        d = 6
        assert np.allclose(mat(laplacian_NN(d)), _bc_matrix(2 ** d, 1, 1))

    def test_periodic(self):
        d = 5
        n = 2 ** d
        m = tridiag(n, 2, -1, -1)
        m[0, -1] = -1
        m[-1, 0] = -1
        assert np.allclose(mat(laplacian_P(d)), m)

    def test_inverse_dn(self):
        d = 5
        a = mat(laplacian_DN(d))
        ainv = mat(inv_laplacian_DN(d))
        assert np.allclose(a @ ainv, np.eye(2 ** d))

    def test_min_dim_guard(self):
        with pytest.raises(ValueError):
            laplacian_DN(3)


class TestProlongations:
    def test_square_prolongation_entries(self):
        # reference only pins a few entries vs its half-width oracle
        # (/root/reference/test/test_tt_operators.jl:404-434)
        d = 3
        p = mat(qtto_prolongation(d))
        n = 2 ** (d - 1)
        oracle = np.zeros((2 * n, n))
        oracle[0, 0] = 0.5
        for k in range(n):
            oracle[2 * k + 1, k] = 1.0
        for k in range(n - 1):
            oracle[2 * k + 2, k] += 0.5
            oracle[2 * k + 2, k + 1] += 0.5
        assert p[0, 0] == oracle[0, 0]
        assert p[0, 2] == oracle[0, 2]
        assert p[0, 3] == oracle[0, 3]
        assert p[1, 0] == oracle[1, 0]

    def test_constant_prolongation(self):
        d = 3
        P = qtto_constant_prolongation(d)
        assert P.N == d + 1
        u = np.random.default_rng(0).standard_normal(2 ** d)
        # drive through the rectangular matvec on each basis vector
        for col in range(2 ** d):
            y = P @ qtt_basis_vector(d, col)
            out = np.asarray(qtt_to_vector(y))
            expect = np.zeros(2 ** (d + 1))
            expect[2 * col] = 1.0
            expect[2 * col + 1] = 1.0
            assert np.allclose(out, expect)

    def test_linear_prolongation(self):
        # oracle from /root/reference/examples/qtt_linear_prolongation.jl:4-15
        d = 4
        rng = np.random.default_rng(3)
        from ttnx import ttv_decomp

        u = rng.standard_normal(2 ** d)
        u_tt = ttv_decomp(u.reshape((2,) * d))
        P = qtto_linear_prolongation(d)
        fine = np.asarray(qtt_to_vector(P @ u_tt))
        n = u.size
        expect = np.zeros(2 * n)
        for al in range(n):
            expect[2 * al] = u[al]
            expect[2 * al + 1] += 0.5 * u[al]
            if al + 1 < n:
                expect[2 * al + 1] += 0.5 * u[al + 1]
        assert np.allclose(fine, expect)


def _kron_chain(mats):
    out = mats[0]
    for m in mats[1:]:
        out = np.kron(out, m)
    return out


def _dense_pair_sum(P1, P2, d):
    n = 2 ** d
    H = np.zeros((n, n), dtype=np.result_type(P1.dtype, P2.dtype))
    eye = np.eye(2)
    for i in range(d - 1):
        mats = [eye] * d
        mats[i] = P1
        mats[i + 1] = P2
        H = H + _kron_chain(mats)
    return H


def _dense_field_sum(P, d):
    n = 2 ** d
    H = np.zeros((n, n), dtype=P.dtype)
    eye = np.eye(2)
    for i in range(d):
        mats = [eye] * d
        mats[i] = P
        H = H + _kron_chain(mats)
    return H


class TestSpinChains:
    def test_pauli_matrices(self):
        x, y, z = pauli_matrix("x"), pauli_matrix("y"), pauli_matrix("z")
        assert np.allclose(x @ x, np.eye(2))
        assert np.allclose(y @ y, np.eye(2))
        assert np.allclose(x @ y - y @ x, 2j * z)

    @pytest.mark.parametrize("mu", ["x", "y", "z"])
    def test_pauli_sum(self, mu):
        d = 5
        H = mat(pauli_sum_tto(mu, d))
        assert np.allclose(H, _dense_field_sum(pauli_matrix(mu), d))

    def test_pauli_sum_single_site(self):
        assert np.allclose(mat(pauli_sum_tto("z", 1)), pauli_matrix("z"))

    @pytest.mark.parametrize("pair", [("x", "x"), ("z", "z"), ("x", "z"), ("y", "y")])
    def test_pauli_pair_sum(self, pair):
        d = 4
        H = mat(pauli_pair_sum_tto(*pair, d))
        P1, P2 = pauli_matrix(pair[0]), pauli_matrix(pair[1])
        assert np.allclose(H, _dense_pair_sum(P1, P2, d))

    def test_yy_real_trick(self):
        # the rank-3 YY MPO must be real despite sigma_y being complex
        op = pauli_pair_sum_tto("y", "y", 4)
        assert not op.is_complex

    def test_heisenberg_xyz(self):
        d = 5
        jx, jy, jz, lam = 0.7, -0.3, 1.1, 0.25
        H = mat(heisenberg_xyz_tto(d, jx=jx, jy=jy, jz=jz, lam=lam, field="x"))
        ref = (
            jx * _dense_pair_sum(pauli_matrix("x"), pauli_matrix("x"), d)
            + jy * _dense_pair_sum(pauli_matrix("y"), pauli_matrix("y"), d)
            + jz * _dense_pair_sum(pauli_matrix("z"), pauli_matrix("z"), d)
            + lam * _dense_field_sum(pauli_matrix("x"), d)
        )
        assert np.allclose(H, ref)
        assert heisenberg_xyz_tto(d).ranks == (1, 5, 5, 5, 5, 1)

    def test_derived_models(self):
        d = 4
        X, Z = pauli_matrix("x"), pauli_matrix("z")
        Hi = mat(ising_tto(d, J=1.0, h=0.5))
        assert np.allclose(
            Hi, _dense_pair_sum(Z, Z, d) + 0.5 * _dense_field_sum(X, d))
        Hxxz = mat(xxz_tto(d, J=1.0, delta=0.5))
        Y = pauli_matrix("y")
        assert np.allclose(
            Hxxz,
            _dense_pair_sum(X, X, d) + _dense_pair_sum(Y, Y, d)
            + 0.5 * _dense_pair_sum(Z, Z, d))
        assert np.allclose(
            mat(xxx_tto(d)),
            _dense_pair_sum(X, X, d) + _dense_pair_sum(Y, Y, d)
            + _dense_pair_sum(Z, Z, d))
        assert np.allclose(
            mat(xy_tto(d, jx=0.3, jy=0.9)),
            0.3 * _dense_pair_sum(X, X, d) + 0.9 * _dense_pair_sum(Y, Y, d))


class TestQttLaplacian:
    def test_1d(self):
        bits = 5
        q = qtt_laplacian(1, bits, bc="DD")
        h = 1.0 / (2 ** bits - 1)
        assert np.allclose(mat(q), tridiag(2 ** bits, 2, -1, -1) / h ** 2)

    def test_2d_serial(self):
        bits = 3
        q = qtt_laplacian(2, bits, ordering="serial", bc="DD")
        n = 2 ** bits
        h = 1.0 / (n - 1)
        lap1 = tridiag(n, 2, -1, -1) / h ** 2
        ref = np.kron(lap1, np.eye(n)) + np.kron(np.eye(n), lap1)
        assert np.allclose(mat(q), ref)
        assert q.ordering == "serial"
        assert q.n_dims == 2 and q.bits_per_dim == bits

    def test_2d_interleaved_matches_serial(self):
        bits = 4
        qs = qtt_laplacian(2, bits, ordering="serial", bc="DN")
        qi = qtt_laplacian(2, bits, ordering="interleaved", bc="DN")
        from ttnx.ops.qtt import reorder_op

        back = reorder_op(qi, "serial")
        assert np.allclose(mat(back), mat(qs), atol=1e-8)

    def test_nn_multidim_supported(self):
        # improvement over the reference: rank-1 NN boundaries allow n_dims > 1
        q = qtt_laplacian(2, 4, ordering="serial", bc="NN")
        n = 2 ** 4
        h = 1.0 / (n - 1)
        lap1 = _bc_matrix(n, 1, 1) / h ** 2
        ref = np.kron(lap1, np.eye(n)) + np.kron(np.eye(n), lap1)
        assert np.allclose(mat(q), ref)
