"""Extra behavioral-contract coverage mirroring reference test corners
(test_tt_tools.jl, test_qtt_multidim.jl, complex cross)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import ttnx
from ttnx import (
    DMRGCross,
    MaxVol,
    QTTVector,
    als_linsolve,
    function_to_qttv,
    id_tto,
    laplacian,
    mals_linsolve,
    qtt_laplacian,
    qtt_sin,
    qtto_to_matrix,
    rand_tt,
    tt_cross,
    ttv_to_tensor,
    tto_decomp,
    tto_to_tensor,
)


def vec(tt):
    return np.asarray(ttv_to_tensor(tt)).reshape(-1)


class TestSolversAcceptQTT:
    # /root/reference/test/test_qtt_multidim.jl:368 — solvers take QTT inputs
    def test_als_accepts_qtt(self, key):
        d = 4
        A = id_tto(2 * d)
        q = function_to_qttv(lambda c: 1 + c[..., 0] + c[..., 1], 2, d,
                             ordering="serial")
        x0 = rand_tt(key, (2,) * (2 * d), rmax=4, normalise=True)
        x = als_linsolve(A, q, x0, sweep_count=4)
        assert np.allclose(vec(x), vec(q.tt()), atol=1e-10)

    def test_mals_accepts_qtt_guess(self, key):
        d = 3
        A = id_tto(2 * d)
        q = function_to_qttv(lambda c: np.exp(c[..., 0] - c[..., 1]), 2, d,
                             ordering="interleaved")
        x = mals_linsolve(A, q, q, tol=1e-12)
        assert np.allclose(vec(x), vec(q.tt()), atol=1e-9)


class TestNonUniformDims:
    def test_tto_decomp_non_uniform(self, rng):
        # /root/reference/test/test_tt_tools.jl:360 — non-uniform dimensions
        m = rng.standard_normal((2, 3, 4, 2, 3, 4))  # T[x1,x2,x3,y1,y2,y3]
        op = tto_decomp(m)
        assert op.out_dims == (2, 3, 4)
        assert np.allclose(np.asarray(tto_to_tensor(op)), m, atol=1e-12)

    def test_non_symmetric_matvec(self, rng):
        # reference: reproduces dense non-symmetric matvec
        m = rng.standard_normal((2, 2, 2, 2))
        op = tto_decomp(m)
        x = rand_tt(jax.random.PRNGKey(7), (2, 2), rmax=2)
        y = op @ x
        dense_m = m.reshape(4, 4)
        assert np.allclose(vec(y), dense_m @ vec(x), atol=1e-12)


class TestQttLaplacian3D:
    def test_3d_kron_sum_matrix(self):
        # /root/reference/test/test_qtt_multidim.jl:633
        bits = 2
        q = qtt_laplacian(3, bits, ordering="serial", bc="DD")
        n = 2 ** bits
        h = 1.0 / (n - 1)
        lap1 = (np.diag(2 * np.ones(n)) - np.diag(np.ones(n - 1), 1)
                - np.diag(np.ones(n - 1), -1)) / h ** 2
        eye = np.eye(n)
        ref = (np.kron(np.kron(lap1, eye), eye)
               + np.kron(np.kron(eye, lap1), eye)
               + np.kron(np.kron(eye, eye), lap1))
        assert np.allclose(np.asarray(qtto_to_matrix(q)), ref)
        assert q.n_dims == 3


class TestComplexCross:
    # complex-valued cross (reference test_tt_cross_interpolation.jl:214-480)
    def test_maxvol_complex(self):
        g = np.linspace(0, 1, 8)

        def f(X):
            return np.exp(2j * np.pi * X[:, 0]) * np.cos(np.pi * X[:, 1])

        tt = tt_cross(f, [g, g], MaxVol(tol=1e-10, verbose=False), ranks=2)
        xs = np.stack(np.meshgrid(g, g, indexing="ij"), axis=-1)
        expect = np.exp(2j * np.pi * xs[..., 0]) * np.cos(np.pi * xs[..., 1])
        assert tt.is_complex
        full = np.asarray(ttv_to_tensor(tt))
        assert np.linalg.norm(full - expect) / np.linalg.norm(expect) < 1e-8

    def test_dmrg_cross_complex(self):
        g = np.linspace(0, 1, 8)

        def f(X):
            return np.exp(1j * np.pi * (X[:, 0] + 0.5 * X[:, 1] + X[:, 2]))

        tt = tt_cross(f, [g] * 3, DMRGCross(tol=1e-10, verbose=False), ranks=2)
        xs = np.stack(np.meshgrid(g, g, g, indexing="ij"), axis=-1)
        expect = np.exp(1j * np.pi * (xs[..., 0] + 0.5 * xs[..., 1] + xs[..., 2]))
        full = np.asarray(ttv_to_tensor(tt))
        assert np.linalg.norm(full - expect) / np.linalg.norm(expect) < 1e-7


class TestCompressBehaviors:
    def test_compress_noop_for_large_max_bond(self, key):
        # reference tt_compress! no-op case
        x = rand_tt(key, (2,) * 5, rmax=3)
        from ttnx import tt_compress

        y = tt_compress(x, max_bond=100)
        assert np.allclose(vec(y), vec(x), atol=1e-12)

    def test_compress_sweeps_validation(self, key):
        from ttnx import tt_compress

        x = rand_tt(key, (2,) * 4, rmax=2)
        with pytest.raises(ValueError):
            tt_compress(x, 2, sweeps=0)

    def test_exact_rank1_truncates_to_rank1(self):
        # reference: exact rank-1 reconstruction leads to new rank 1
        from ttnx import ones_tt, tt_compress

        x = ones_tt((2, 2, 2, 2))
        two = x + x  # rank 2 buffers, true rank 1
        y = tt_compress(two, max_bond=4, truncerr=1e-12)
        assert max(y.ranks) == 1


class TestEntropyQTT:
    def test_qtt_wrapper_entropy(self):
        q = function_to_qttv(
            lambda c: np.sin(np.pi * c[..., 0]) * np.sin(np.pi * c[..., 1]),
            2, 3, ordering="serial")
        s = q.entanglement_entropy()
        # separable function: zero entropy at the dimension boundary (bond 3)
        assert abs(s[2]) < 1e-10


class TestMatricizePartial:
    # /root/reference/src/tt_tools.jl:694-705 — matricize(qtt, core)
    def test_full_chain_matches_dense(self, key):
        from ttnx import matricize

        x = rand_tt(key, (2,) * 5, rmax=3)
        assert np.allclose(np.asarray(matricize(x)), vec(x), atol=1e-12)

    def test_partial_chain_reads_trailing_bit0(self, key):
        from ttnx import matricize

        x = rand_tt(key, (2,) * 6, rmax=3)
        dense = np.asarray(ttv_to_tensor(x))
        for core in (1, 3, 5):
            got = np.asarray(matricize(x, core))
            expect = dense[(slice(None),) * core + (0,) * (6 - core)].reshape(-1)
            assert got.shape == (2 ** core,)
            assert np.allclose(got, expect, atol=1e-12)

    def test_core_out_of_range(self, key):
        from ttnx import matricize

        x = rand_tt(key, (2,) * 4, rmax=2)
        with pytest.raises(ValueError):
            matricize(x, 0)
        with pytest.raises(ValueError):
            matricize(x, 5)


class TestOtDescription:
    # /root/reference/src/tt_tools.jl:589-629 — show prints canonical status
    def test_repr_reports_canonical_form(self, key):
        from ttnx.core.canonical import orthogonalize

        x = rand_tt(key, (2,) * 4, rmax=2)
        assert "none" in repr(x)
        y = orthogonalize(x, 3)
        assert "center @ site 3" in repr(y) or "left-canonical" in repr(y)
        z = orthogonalize(x, 0)
        assert "center @ site 0" in repr(z)

    def test_operator_repr_has_ot(self):
        A = id_tto(3)
        assert "ot=" in repr(A)


class TestComplexIterativeEigmin:
    # /root/reference/src/solvers/als.jl:72-88 — LOBPCG path handles complex
    def test_complex_lobpcg_matches_dense(self, key):
        from ttnx.solvers.als import _local_eigmin, local_matrix

        rng = np.random.default_rng(3)
        rl, n, rr, rA = 4, 2, 4, 3
        L = jnp.asarray(rng.standard_normal((rl, rA, rl))
                        + 1j * rng.standard_normal((rl, rA, rl)))
        R = jnp.asarray(rng.standard_normal((rr, rA, rr))
                        + 1j * rng.standard_normal((rr, rA, rr)))
        Ac = jnp.asarray(rng.standard_normal((rA, n, n, rA))
                         + 1j * rng.standard_normal((rA, n, n, rA)))
        v0 = jnp.asarray(rng.standard_normal((rl, n, rr))
                         + 1j * rng.standard_normal((rl, n, rr)))
        K = local_matrix(L, Ac, R)
        K = 0.5 * (K + K.conj().T)
        w_ref = np.linalg.eigvalsh(np.asarray(K))[0]
        lam, x = _local_eigmin(L, Ac, R, v0, it_solver=True, itslv_thresh=1,
                               maxiter=300, tol=1e-10)
        assert x.dtype == v0.dtype
        assert abs(float(lam) - w_ref) < 1e-6 * max(1.0, abs(w_ref))
        # Rayleigh quotient confirms the eigenvector too
        xv = np.asarray(x).reshape(-1)
        rq = (xv.conj() @ np.asarray(K) @ xv).real / (xv.conj() @ xv).real
        assert abs(rq - w_ref) < 1e-6 * max(1.0, abs(w_ref))
