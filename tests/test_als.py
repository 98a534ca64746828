"""ALS solver tests (mirrors /root/reference/test/test_als.jl and the README
quick-start #3 parity target)."""

import numpy as np
import pytest

import jax

from ttnx import (
    als_eigsolve,
    als_gen_eigsolv,
    als_linsolve,
    heisenberg_xyz_tto,
    id_tto,
    laplacian,
    qtt_sin,
    qtt_to_vector,
    qtto_to_matrix,
    rand_tt,
    rand_tto,
    ttv_to_tensor,
)
from ttnx.solvers.als import (
    init_right_envs,
    local_matrix,
    update_right_env,
)


def vec(tt):
    return np.asarray(ttv_to_tensor(tt)).reshape(-1)


def mat(op):
    return np.asarray(qtto_to_matrix(op))


class TestEnvs:
    def test_right_env_shapes(self, key):
        k1, k2 = jax.random.split(key)
        A = rand_tto(k1, (2,) * 4, rmax=3)
        x = rand_tt(k2, (2,) * 4, rmax=2)
        R = init_right_envs(x, A)
        for i in range(1, 4):
            assert R[i].shape == (x.ranks[i], A.ranks[i], x.ranks[i])

    def test_local_matrix_symmetric_for_symmetric_A(self, key):
        # with a symmetric operator and any state, the local K is symmetric
        d = 4
        A = laplacian(d)
        x = rand_tt(key, (2,) * d, rmax=2)
        from ttnx import orthogonalize

        x = orthogonalize(x, 0)
        R = init_right_envs(x, A)
        L0 = np.ones((1, 1, 1))
        K = np.asarray(local_matrix(L0, A.cores[0], R[1]))
        assert np.allclose(K, K.T, atol=1e-12)


class TestLinsolve:
    def test_readme_quickstart(self, key):
        # README quick-start #3: d=6, A=I, b=qtt_sin, 4 sweeps, rel err 1e-12
        d = 6
        A = id_tto(d)
        b = qtt_sin(d)
        x0 = rand_tt(key, (2,) * d, rmax=4, normalise=True)
        x = als_linsolve(A, b, x0, sweep_count=4)
        rel = np.linalg.norm(vec(x) - vec(b)) / np.linalg.norm(vec(b))
        assert rel < 1e-12

    def test_laplacian_system(self, key):
        d = 5
        A = laplacian(d)
        xs = np.arange(2 ** d) / (2 ** d - 1)
        from ttnx import function_to_qtt

        u_true = function_to_qtt(lambda x: np.sin(np.pi * x), d)
        b_vec = mat(A) @ vec(u_true)
        from ttnx import ttv_decomp

        b = ttv_decomp(np.asarray(b_vec).reshape((2,) * d), tol=1e-14)
        x0 = rand_tt(key, (2,) * d, rmax=6, normalise=True)
        x, info = als_linsolve(A, b, x0, sweep_count=6, return_info=True)
        assert info["residual"] < 1e-9
        rel = np.linalg.norm(vec(x) - vec(u_true)) / np.linalg.norm(vec(u_true))
        assert rel < 1e-8

    def test_residual_decreases_with_sweeps(self, key):
        d = 5
        k1, k2 = jax.random.split(key)
        A = laplacian(d)
        b = qtt_sin(d)
        x0 = rand_tt(k1, (2,) * d, rmax=5, normalise=True)
        _, info1 = als_linsolve(A, b, x0, sweep_count=1, return_info=True)
        _, info4 = als_linsolve(A, b, x0, sweep_count=6, return_info=True)
        assert info4["residual"] <= info1["residual"]

    def test_complex_rhs(self, key):
        import jax.numpy as jnp

        d = 4
        A = id_tto(d)
        b = rand_tt(key, (2,) * d, rmax=2, dtype=jnp.complex128)
        x0 = rand_tt(jax.random.split(key)[0], (2,) * d, rmax=4, normalise=True)
        x = als_linsolve(A, b.astype(jnp.complex128), x0.astype(jnp.complex128),
                         sweep_count=4)
        assert np.allclose(vec(x), vec(b), atol=1e-10)


class TestEigsolve:
    def test_laplacian_ground_state(self, key):
        d = 6
        A = laplacian(d)
        x0 = rand_tt(key, (2,) * d, rmax=6, normalise=True, orthogonal=True)
        E, x = als_eigsolve(A, x0, sweep_schedule=[4])
        w = np.linalg.eigvalsh(mat(A))
        assert abs(E[-1] - w[0]) < 1e-10
        # eigenvalue history is monotonically non-increasing (variational)
        assert all(E[i + 1] <= E[i] + 1e-10 for i in range(len(E) - 1))

    def test_heisenberg_ground_state(self, key):
        d = 6
        H = heisenberg_xyz_tto(d, jx=1.0, jy=1.0, jz=1.0)
        x0 = rand_tt(key, (2,) * d, rmax=8, normalise=True, orthogonal=True)
        E, x = als_eigsolve(H, x0, sweep_schedule=[6])
        w = np.linalg.eigvalsh(mat(H))
        assert abs(E[-1] - w[0]) < 1e-8

    def test_rank_schedule(self, key):
        d = 6
        A = laplacian(d)
        x0 = rand_tt(key, (2,) * d, rmax=2, normalise=True, orthogonal=True)
        E, x = als_eigsolve(A, x0, sweep_schedule=[2, 4],
                            rmax_schedule=[2, 6],
                            noise_schedule=[0.0, 1e-6],
                            key=jax.random.split(key)[1])
        assert max(x.ranks) <= 6
        w = np.linalg.eigvalsh(mat(A))
        assert abs(E[-1] - w[0]) < 1e-8

    def test_schedule_validation(self, key):
        A = laplacian(4)
        x0 = rand_tt(key, (2,) * 4, rmax=2)
        with pytest.raises(ValueError):
            als_eigsolve(A, x0, sweep_schedule=[2, 3], rmax_schedule=[2])


class TestGenEigsolve:
    def test_identity_metric_reduces_to_eigsolve(self, key):
        d = 5
        A = laplacian(d)
        S = id_tto(d)
        x0 = rand_tt(key, (2,) * d, rmax=4, normalise=True, orthogonal=True)
        E, x = als_gen_eigsolv(A, S, x0, sweep_schedule=[4])
        w = np.linalg.eigvalsh(mat(A))
        assert abs(E[-1] - w[0]) < 1e-8

    def test_scaled_metric(self, key):
        d = 4
        A = laplacian(d)
        S = 2.0 * id_tto(d)
        x0 = rand_tt(key, (2,) * d, rmax=4, normalise=True, orthogonal=True)
        E, x = als_gen_eigsolv(A, S, x0, sweep_schedule=[4])
        w = np.linalg.eigvalsh(mat(A))
        assert abs(E[-1] - w[0] / 2.0) < 1e-8


def test_warm_started_cg_halves_iterations(key):
    """Round-5 regression lock: every scan-ALS local CG starts from the
    transported current iterate, so cg_iters=12 must match the direct 'lu'
    solve as closely as the old cold cg_iters=32 did."""
    import ttnx
    from ttnx.core.algebra import add_op, scale_op
    from ttnx.core.decomp import ttv_to_tensor
    from ttnx.core.tt import id_tto, r_and_d_to_rks
    from ttnx.solvers.als_scan import (als_sweeps, pack_op, pack_tt,
                                       rank_masks, unpack_tt)

    d, rmax = 6, 8
    hg = 1.0 / (2 ** d + 1)
    A = (-1.0 / hg ** 2) * ttnx.toeplitz_to_qtto(2.0, -1.0, -1.0, d)
    lhs = add_op(id_tto(d), scale_op(-5e-7, A))
    lhs_stack = pack_op(lhs, max(lhs.ranks))
    u_rks = r_and_d_to_rks((1,) + (rmax,) * (d - 1) + (1,), (2,) * d,
                           rmax=rmax)
    masks = rank_masks(u_rks, rmax)
    b = pack_tt(ttnx.qtt_sin(d, a=hg, b=1 - hg), rmax)

    def dense(stack):
        return np.asarray(ttv_to_tensor(unpack_tt(np.asarray(stack),
                                                  u_rks))).reshape(-1)

    ref = dense(als_sweeps(lhs_stack, b, b, masks, 2, solver="lu"))
    warm12 = dense(als_sweeps(lhs_stack, b, b, masks, 2, solver="cg",
                              cg_iters=12))
    rel = np.linalg.norm(warm12 - ref) / np.linalg.norm(ref)
    assert rel < 1e-9, rel
