"""Jitted rank-adaptive MALS tests (dynamic rank masks as data)."""

import numpy as np

import jax
import jax.numpy as jnp

from ttnx import (
    function_to_qtt,
    id_tto,
    laplacian,
    qtt_sin,
    qtto_to_matrix,
    rand_tt,
    ttv_decomp,
    ttv_to_tensor,
)
from ttnx.solvers.mals import mals_linsolve
from ttnx.solvers.mals_scan import mals_linsolve_scan, mals_sweep


def vec(tt):
    return np.asarray(ttv_to_tensor(tt)).reshape(-1)


def _system(key, d=6):
    A = laplacian(d)
    u_true = function_to_qtt(lambda x: np.sin(np.pi * x), d)
    bd = np.asarray(qtto_to_matrix(A)) @ vec(u_true)
    b = ttv_decomp(bd.reshape((2,) * d), tol=1e-14)
    x0 = rand_tt(key, (2,) * d, rmax=4, normalise=True)
    return A, b, u_true, x0


def test_matches_eager_mals(key):
    A, b, u_true, x0 = _system(key)
    xs = mals_linsolve_scan(A, b, x0, tol=1e-12, rmax=16, n_sweeps=2)
    rel = np.linalg.norm(vec(xs) - vec(u_true)) / np.linalg.norm(vec(u_true))
    assert rel < 1e-10
    xe = mals_linsolve(A, b, x0, tol=1e-12, rmax=16)
    assert xs.ranks == xe.ranks  # identical adapted ranks


def test_identity_system(key):
    d = 6
    A = id_tto(d)
    b = qtt_sin(d)
    x0 = rand_tt(key, (2,) * d, rmax=4, normalise=True)
    x = mals_linsolve_scan(A, b, x0, tol=1e-12, rmax=8)
    rel = np.linalg.norm(vec(x) - vec(b)) / np.linalg.norm(vec(b))
    assert rel < 1e-10
    assert x.ranks == b.ranks  # adapts down to the rhs rank


def test_single_compiled_program(key):
    # two sweeps with different realized ranks reuse one compiled program
    A, b, _, x0 = _system(key)
    n0 = mals_sweep._cache_size()
    mals_linsolve_scan(A, b, x0, tol=1e-12, rmax=16, n_sweeps=3)
    n1 = mals_sweep._cache_size()
    # at most one new trace despite rank changes across the three sweeps
    assert n1 <= n0 + 1


def test_eigsolve_heisenberg(key):
    from ttnx import heisenberg_xyz_tto
    from ttnx.solvers.mals_scan import mals_eigsolve_scan

    d = 6
    H = heisenberg_xyz_tto(d)
    x0 = rand_tt(key, (2,) * d, rmax=2, normalise=True, orthogonal=True)
    E, x = mals_eigsolve_scan(H, x0, tol=1e-12, rmax=12, n_sweeps=4)
    w = np.linalg.eigvalsh(np.asarray(qtto_to_matrix(H)))
    assert abs(E[-1] - w[0]) < 1e-10
    # ranks adapted beyond the rank-2 start
    assert max(x.ranks) > 2
    # variational bound holds for the whole history
    assert all(e >= w[0] - 1e-9 for e in E)


def test_tol_is_runtime_data(key):
    # changing tol must NOT retrace (it's a traced scalar)
    A, b, _, x0 = _system(key)
    mals_linsolve_scan(A, b, x0, tol=1e-12, rmax=16)
    n1 = mals_sweep._cache_size()
    mals_linsolve_scan(A, b, x0, tol=1e-6, rmax=16)
    assert mals_sweep._cache_size() == n1
