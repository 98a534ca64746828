"""MALS and DMRG solver tests
(mirror /root/reference/test/test_mals.jl and test_dmrg.jl)."""

import numpy as np
import pytest

import jax

from ttnx import (
    function_to_qtt,
    heisenberg_xyz_tto,
    id_tto,
    laplacian,
    qtt_sin,
    qtto_to_matrix,
    rand_tt,
    ttv_decomp,
    ttv_to_tensor,
)
from ttnx.solvers.dmrg import cut_off_index, dmrg_eigsolve, dmrg_linsolve
from ttnx.solvers.mals import mals_eigsolve, mals_linsolve, sv_trunc_count


def vec(tt):
    return np.asarray(ttv_to_tensor(tt)).reshape(-1)


def mat(op):
    return np.asarray(qtto_to_matrix(op))


class TestTruncationRules:
    def test_sv_trunc_keeps_all_at_zero_tol(self):
        s = np.array([3.0, 2.0, 1.0, 0.1])
        assert sv_trunc_count(s, 0.0) == 4

    def test_sv_trunc_discarded_weight(self):
        s = np.array([3.0, 2.0, 1.0])
        # tol*|s|^2 = 2: discard tail [1] (weight 1 < 2), keep 2
        assert sv_trunc_count(s, 2.0 / 14.0) == 2

    def test_cut_off_index_degeneracy(self):
        # refuses to split near-degenerate singular values
        # (/root/reference/test/test_dmrg.jl:20-27 regression)
        s = np.array([1.0, 0.5, 0.5 - 1e-12, 1e-8])
        k = cut_off_index(s, 1e-4)
        assert k == 3  # keeps both degenerate values

    def test_cut_off_index_basic(self):
        s = np.array([1.0, 0.1, 1e-14])
        assert cut_off_index(s, 1e-10) == 2


class TestMalsLinsolve:
    def test_identity_system(self, key):
        d = 6
        A = id_tto(d)
        b = qtt_sin(d)
        x0 = rand_tt(key, (2,) * d, rmax=2, normalise=True)
        x = mals_linsolve(A, b, x0, tol=1e-12)
        rel = np.linalg.norm(vec(x) - vec(b)) / np.linalg.norm(vec(b))
        assert rel < 1e-10

    def test_poisson_1d(self, key):
        # 1-D Poisson d=8 via mals_linsolve (docs example class, ~1e-9)
        d = 8
        n = 2 ** d
        h = 1.0 / (n - 1)
        A = (1.0 / h ** 2) * laplacian(d)
        u_true = function_to_qtt(lambda x: np.sin(np.pi * x), d)
        b_dense = mat(A) @ vec(u_true)
        b = ttv_decomp(b_dense.reshape((2,) * d), tol=1e-14)
        x0 = rand_tt(key, (2,) * d, rmax=4, normalise=True)
        x = mals_linsolve(A, b, x0, tol=1e-12, rmax=16)
        x = mals_linsolve(A, b, x, tol=1e-12, rmax=16)
        rel = np.linalg.norm(vec(x) - vec(u_true)) / np.linalg.norm(vec(u_true))
        assert rel < 1e-7

    def test_rank_adaptation_respects_rmax(self, key):
        d = 6
        A = laplacian(d)
        b = qtt_sin(d)
        x0 = rand_tt(key, (2,) * d, rmax=2, normalise=True)
        x = mals_linsolve(A, b, x0, tol=1e-14, rmax=3)
        assert max(x.ranks) <= 3

    def test_return_info(self, key):
        d = 5
        A = id_tto(d)
        b = qtt_sin(d)
        x0 = rand_tt(key, (2,) * d, rmax=2, normalise=True)
        x, info = mals_linsolve(A, b, x0, return_info=True)
        assert info["residual"] < 1e-10


class TestMalsEigsolve:
    def test_laplacian_ground_state(self, key):
        d = 6
        A = laplacian(d)
        x0 = rand_tt(key, (2,) * d, rmax=2, normalise=True, orthogonal=True)
        E, x, r_hist = mals_eigsolve(A, x0, tol=1e-12, sweep_schedule=[4],
                                     rmax_schedule=[10])
        w = np.linalg.eigvalsh(mat(A))
        assert abs(E[-1] - w[0]) < 1e-8
        assert len(r_hist) == len(E)
        assert max(r_hist) <= 10

    def test_heisenberg(self, key):
        d = 6
        H = heisenberg_xyz_tto(d)
        x0 = rand_tt(key, (2,) * d, rmax=2, normalise=True, orthogonal=True)
        E, x, _ = mals_eigsolve(H, x0, tol=1e-12, sweep_schedule=[5],
                                rmax_schedule=[12])
        w = np.linalg.eigvalsh(mat(H))
        assert abs(E[-1] - w[0]) < 1e-7


class TestDmrgLinsolve:
    def test_identity_system(self, key):
        d = 6
        A = id_tto(d)
        b = qtt_sin(d)
        x0 = rand_tt(key, (2,) * d, rmax=2, normalise=True)
        x = dmrg_linsolve(A, b, x0, sweep_schedule=[2], it_solver=False)
        rel = np.linalg.norm(vec(x) - vec(b)) / np.linalg.norm(vec(b))
        assert rel < 1e-10

    def test_laplacian_system_iterative(self, key):
        d = 6
        A = laplacian(d)
        u_true = function_to_qtt(lambda x: np.sin(np.pi * x) * (1 - x), d)
        b_dense = mat(A) @ vec(u_true)
        b = ttv_decomp(b_dense.reshape((2,) * d), tol=1e-14)
        x0 = rand_tt(key, (2,) * d, rmax=3, normalise=True)
        x, info = dmrg_linsolve(A, b, x0, sweep_schedule=[4], it_solver=True,
                                itslv_thresh=64, return_info=True)
        assert info["residual"] < 1e-6

    def test_single_site(self, key):
        d = 5
        A = id_tto(d)
        b = qtt_sin(d)
        x0 = rand_tt(key, (2,) * d, rmax=2, normalise=True)
        x = dmrg_linsolve(A, b, x0, n_sites=1, sweep_schedule=[3],
                          rmax_schedule=[4], it_solver=False)
        rel = np.linalg.norm(vec(x) - vec(b)) / np.linalg.norm(vec(b))
        assert rel < 1e-9


class TestDmrgEigsolve:
    def test_laplacian_ground_state(self, key):
        d = 6
        A = laplacian(d)
        x0 = rand_tt(key, (2,) * d, rmax=2, normalise=True, orthogonal=True)
        E, x, r_hist = dmrg_eigsolve(A, x0, sweep_schedule=[4],
                                     rmax_schedule=[10])
        w = np.linalg.eigvalsh(mat(A))
        assert abs(E[-1] - w[0]) < 1e-8

    def test_heisenberg_vs_dense(self, key):
        # examples/heisenberg_xyz_dmrg.jl pattern with exact diag cross-check
        d = 8
        H = heisenberg_xyz_tto(d, jx=1.0, jy=0.5, jz=0.25, lam=0.1, field="z")
        x0 = rand_tt(key, (2,) * d, rmax=2, normalise=True, orthogonal=True)
        E, x, _ = dmrg_eigsolve(H, x0, sweep_schedule=[2, 5],
                                rmax_schedule=[8, 16], tol=1e-12)
        w = np.linalg.eigvalsh(mat(H))
        assert abs(E[-1] - w[0]) < 1e-7

    def test_eigval_history_monotone(self, key):
        d = 6
        A = laplacian(d)
        x0 = rand_tt(key, (2,) * d, rmax=3, normalise=True, orthogonal=True)
        E, _, _ = dmrg_eigsolve(A, x0, sweep_schedule=[3], rmax_schedule=[8])
        assert E[-1] <= E[0] + 1e-12

    def test_schedule_validation(self, key):
        A = laplacian(4)
        x0 = rand_tt(key, (2,) * 4, rmax=2)
        with pytest.raises(ValueError):
            dmrg_eigsolve(A, x0, sweep_schedule=[2, 3], rmax_schedule=[2])
