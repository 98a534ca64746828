"""TDVP tests (mirror /root/reference/test/test_tdvp.jl)."""

import numpy as np

import jax.numpy as jnp

from ttnx import (
    QTTOperator,
    QTTVector,
    dot,
    id_tto,
    kron_tt,
    kron_tto,
    norm,
    orthogonalize,
    qtt_sin,
    qtto_to_matrix,
    qttv_to_array,
    sub,
    toeplitz_to_qtto,
    ttv_to_tensor,
)
from ttnx.solvers.tdvp import tdvp, tdvp2


def vec(tt):
    return np.asarray(ttv_to_tensor(tt)).reshape(-1)


class TestIdentityEvolution:
    def test_zero_hamiltonian_is_identity(self):
        d = 4
        psi0 = orthogonalize(qtt_sin(d, lam=np.pi), 0).astype(jnp.complex128)
        H0 = 0.0 * id_tto(d, dtype=jnp.complex128)
        psi = tdvp(H0, psi0, [0.1], normalize=False, carry_env=False)
        rel = np.linalg.norm(vec(psi) - vec(psi0)) / np.linalg.norm(vec(psi0))
        assert rel < 1e-10

    def test_tdvp2_imaginary_time_runs(self):
        d = 4
        psi0 = orthogonalize(qtt_sin(d, lam=np.pi), 0).astype(jnp.complex128)
        H0 = 0.0 * id_tto(d, dtype=jnp.complex128)
        psi = tdvp2(H0, psi0, [0.02, 0.02], normalize=False, sweeps=2,
                    imaginary_time=True)
        rel = np.linalg.norm(vec(psi) - vec(psi0)) / np.linalg.norm(vec(psi0))
        assert rel < 1e-10

    def test_scalar_hamiltonian_phase(self):
        # H = c*I evolves exactly by a global phase e^{-i c t}
        d = 4
        c = 0.5
        H = c * id_tto(d)
        u0 = qtt_sin(d, lam=np.pi)
        t = 0.05
        psi = tdvp(H, u0, [t], normalize=False)
        expect = np.exp(-1j * c * t) * vec(u0)
        assert np.linalg.norm(vec(psi) - expect) / np.linalg.norm(expect) < 1e-10


class TestHeatEigenmode:
    def _setup(self):
        # /root/reference/test/test_tdvp.jl:329-356
        d = 4
        N = 2 ** d
        h = 1.0 / (N + 1)
        kappa = 0.1
        lap1d = toeplitz_to_qtto(-2.0, 1.0, 1.0, d)
        A_raw = (kappa / h ** 2) * (
            kron_tto(lap1d, id_tto(d)) + kron_tto(id_tto(d), lap1d))
        A = QTTOperator(A_raw, 2, d, "serial")
        u0_raw = kron_tt(qtt_sin(d, a=h, b=1 - h), qtt_sin(d, a=h, b=1 - h))
        u0 = QTTVector(u0_raw, 2, d, "serial")
        lam = float(np.real(
            dot(u0_raw, A_raw @ u0_raw) / dot(u0_raw, u0_raw)))
        return A, u0, lam

    def test_tdvp1(self):
        A, u0, lam = self._setup()
        steps = [1e-3] * 5
        target = np.exp(lam * sum(steps)) * np.asarray(qttv_to_array(u0))
        sol = tdvp(A.tt(), u0.tt(), steps, imaginary_time=True,
                   normalize=False)
        out = np.asarray(qttv_to_array(
            QTTVector(sol, 2, 4, "serial")))
        err = np.linalg.norm(out - target) / np.linalg.norm(target)
        assert err < 1e-8

    def test_tdvp2(self):
        A, u0, lam = self._setup()
        steps = [1e-3] * 5
        target = np.exp(lam * sum(steps)) * np.asarray(qttv_to_array(u0))
        sol = tdvp2(A.tt(), u0.tt(), steps, imaginary_time=True,
                    normalize=False, max_bond=8, truncerr=1e-12)
        out = np.asarray(qttv_to_array(QTTVector(sol, 2, 4, "serial")))
        err = np.linalg.norm(out - target) / np.linalg.norm(target)
        assert err < 1e-8


class TestReturnError:
    def test_residual_small_for_eigenstate(self):
        # /root/reference/test/test_tdvp.jl:358-375 regression (aliasing/sign)
        d = 4
        A = 0.5 * id_tto(d)
        u0 = qtt_sin(d, lam=np.pi)
        steps = [1e-3] * 5
        for it in (False, True):
            _, e1 = tdvp(A, u0, steps, imaginary_time=it, return_error=True,
                         normalize=False)
            assert e1 < 1e-3
            _, e2 = tdvp2(A, u0, steps, imaginary_time=it, return_error=True,
                          normalize=False, max_bond=8, truncerr=1e-12)
            assert e2 < 1e-3


class TestRankControl:
    def test_tdvp2_max_bond(self):
        d = 6
        lap = toeplitz_to_qtto(-2.0, 1.0, 1.0, d)
        u0 = qtt_sin(d)
        sol = tdvp2(lap, u0, [1e-3] * 3, imaginary_time=True, normalize=False,
                    max_bond=3)
        assert max(sol.ranks) <= 3

    def test_carry_env_consistency(self):
        d = 5
        lap = toeplitz_to_qtto(-2.0, 1.0, 1.0, d)
        u0 = qtt_sin(d).astype(jnp.complex128)
        a = tdvp(lap.astype(jnp.complex128), u0, [0.1, 0.1], normalize=False,
                 sweeps=2, carry_env=True)
        b = tdvp(lap.astype(jnp.complex128), u0, [0.1, 0.1], normalize=False,
                 sweeps=2, carry_env=False)
        rel = float(norm(sub(a, b)) / norm(b))
        assert rel < 1e-9

    def test_dense_oracle_small(self):
        # real-time evolution vs dense expm on a small Hermitian operator.
        # 1-site TDVP keeps the rank-2 manifold (projection error dominates);
        # 2-site TDVP at full rank tracks the exact evolution closely.
        import scipy.linalg

        d = 4
        H = toeplitz_to_qtto(2.0, -1.0, -1.0, d)
        u0 = qtt_sin(d)
        t = 0.01
        n_steps = 5
        Hd = np.asarray(qtto_to_matrix(H))
        expect = scipy.linalg.expm(-1j * Hd * t * n_steps) @ vec(u0)

        sol1 = tdvp(H, u0, [t] * n_steps, normalize=False)
        err1 = np.linalg.norm(vec(sol1) - expect) / np.linalg.norm(expect)
        assert err1 < 2e-2

        sol2 = tdvp2(H, u0, [t] * n_steps, normalize=False, max_bond=16)
        err2 = np.linalg.norm(vec(sol2) - expect) / np.linalg.norm(expect)
        assert err2 < 1e-5
        assert err2 < err1
