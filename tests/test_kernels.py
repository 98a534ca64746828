"""Pallas kernel tests (interpret mode on CPU)."""

import numpy as np

import jax
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


def test_cg_fused_kernel_matches_dense_solve(rng):
    """cg_solve_fused on an SPD system reproduces the dense solution."""
    from ttnx.kernels.local_cg import cg_solve_fused

    M = 24
    A = rng.standard_normal((M, M))
    K = jnp.asarray(A @ A.T + M * np.eye(M))
    b = jnp.asarray(rng.standard_normal(M))
    x = cg_solve_fused(K, b, iters=64, interpret=True)
    expect = np.linalg.solve(np.asarray(K), np.asarray(b))
    assert np.allclose(np.asarray(x), expect, atol=1e-10)


def test_local_solve_cg_fused_matches_lu(rng):
    """The solver='cg_fused' local solve agrees with the dense 'lu' path on
    an SPD masked local system (production dispatch parity). SPD by
    construction: identity MPO core with PSD left/right environments, so
    K = L (x) I_n (x) Renv is a Kronecker product of PSD factors."""
    from ttnx.solvers.als_scan import _local_solve_padded

    R, n, Rb = 5, 2, 3
    C = rng.standard_normal((R, R))
    D = rng.standard_normal((R, R))
    L = jnp.asarray((C @ C.T + np.eye(R))[:, None, :])       # (R, 1, R)
    Renv = jnp.asarray((D @ D.T + np.eye(R))[:, None, :])
    Ac = jnp.asarray(np.eye(n)[None, :, :, None])            # (1, n, n, 1)
    Lb = jnp.asarray(rng.standard_normal((R, Rb)))
    bc = jnp.asarray(rng.standard_normal((Rb, n, Rb)))
    Rb_env = jnp.asarray(rng.standard_normal((R, Rb)))
    m_l = jnp.ones((R,))
    m_r = jnp.ones((R,)).at[R - 1].set(0.0)  # one padded direction
    args = (L, Ac, Renv, Lb, bc, Rb_env, m_l, m_r)
    x_lu = _local_solve_padded(*args, solver="lu")
    x_fused = _local_solve_padded(*args, solver="cg_fused", cg_iters=128)
    assert np.allclose(np.asarray(x_fused), np.asarray(x_lu), atol=1e-9)
    # padded direction stays exactly zero
    assert np.all(np.asarray(x_fused)[:, :, R - 1] == 0.0)


def test_als_sweeps_cg_fused_end_to_end():
    """Full scan-ALS with solver='cg_fused' solves the README quick-start
    system to the same accuracy as 'lu' (solver -> Pallas kernel chain)."""
    import jax
    import ttnx
    from ttnx.core.algebra import matvec, sub, norm
    from ttnx.core.canonical import orthogonalize
    from ttnx.solvers.als_scan import (als_sweeps, pack_op, pack_tt,
                                       rank_masks, unpack_tt)

    d = 6
    A = ttnx.id_tto(d)
    b = ttnx.qtt_sin(d)
    key = jax.random.PRNGKey(0)
    x0 = orthogonalize(ttnx.rand_tt(key, (2,) * d, rmax=4, normalise=True), 0)
    rks = x0.ranks
    rmax = 4
    A_stack = pack_op(A, max(A.ranks))
    b_stack = pack_tt(b, max(b.ranks))
    x_stack = pack_tt(x0, rmax)
    masks = rank_masks(rks, rmax)
    out = als_sweeps(A_stack, b_stack, x_stack, masks, 4, solver="cg_fused")
    x = unpack_tt(out, rks)
    rel = float(norm(sub(matvec(A, x), b)) / norm(b))
    assert rel < 1e-10


def test_als_sweeps_cg_fused_complex_falls_back():
    """Complex dtype takes the matrix-free CG fallback and still solves."""
    import jax
    import ttnx
    from ttnx.core.algebra import matvec, sub, norm
    from ttnx.core.canonical import orthogonalize
    from ttnx.solvers.als_scan import (als_sweeps, pack_op, pack_tt,
                                       rank_masks, unpack_tt)

    d = 4
    A = ttnx.id_tto(d).astype(jnp.complex128)
    b = ttnx.qtt_sin(d).astype(jnp.complex128)
    key = jax.random.PRNGKey(0)
    x0 = orthogonalize(
        ttnx.rand_tt(key, (2,) * d, rmax=3, normalise=True), 0
    ).astype(jnp.complex128)
    rks = x0.ranks
    A_stack = pack_op(A, max(A.ranks))
    b_stack = pack_tt(b, max(b.ranks))
    x_stack = pack_tt(x0, 3)
    masks = rank_masks(rks, 3)
    out = als_sweeps(A_stack, b_stack, x_stack, masks, 4, solver="cg_fused")
    x = unpack_tt(out, rks)
    rel = float(norm(sub(matvec(A, x), b)) / norm(b))
    assert rel < 1e-8


def test_bicgstab_fused_kernel_nonsymmetric(rng):
    """bicgstab_solve_fused solves a general non-symmetric system."""
    from ttnx.kernels.local_cg import bicgstab_solve_fused

    M = 24
    A = rng.standard_normal((M, M))
    K = jnp.asarray(A / np.sqrt(M) + 2.0 * np.eye(M))   # diag-dominant
    b = jnp.asarray(rng.standard_normal(M))
    x = bicgstab_solve_fused(K, b, iters=64, interpret=True)
    expect = np.linalg.solve(np.asarray(K), np.asarray(b))
    assert np.allclose(np.asarray(x), expect, atol=1e-9)


def test_cn_step_bicgstab_fused_convection_diffusion():
    """End-to-end CN step on a NON-symmetric convection-diffusion generator:
    solver='bicgstab_fused' matches 'lu' on the represented solution."""
    import jax
    import ttnx
    from ttnx.core.decomp import ttv_to_tensor
    from ttnx.solvers.round_scan import make_cn_step

    d, rmax = 6, 8
    n_grid = 2 ** d
    h_grid = 1.0 / (n_grid + 1)
    from ttnx.core.algebra import add_op, scale_op

    # kappa * Laplacian + c * central first derivative (non-symmetric)
    A = add_op(
        scale_op(-0.1 / h_grid ** 2,
                 ttnx.toeplitz_to_qtto(2.0, -1.0, -1.0, d)),
        scale_op(2.0 / (2 * h_grid),
                 ttnx.toeplitz_to_qtto(0.0, 1.0, -1.0, d)))
    u0 = ttnx.qtt_sin(d, a=h_grid, b=1 - h_grid)
    kwargs = dict(dims=(2,) * d, u_rks=(1,) + (rmax,) * (d - 1) + (1,),
                  dtype=jnp.float64, sweep_count=2)
    outs = {}
    for solver in ("lu", "bicgstab_fused"):
        step_fn, pack, unpack = make_cn_step(A, 1e-5, rmax, solver=solver,
                                             cg_iters=96, **kwargs)
        outs[solver] = np.asarray(
            ttv_to_tensor(unpack(step_fn(pack(u0))))).reshape(-1)
    rel = (np.linalg.norm(outs["bicgstab_fused"] - outs["lu"])
           / np.linalg.norm(outs["lu"]))
    assert rel < 1e-9, rel


def _dense_cn_reference(A, u0, h):
    """Exact dense CN step on the 2^d grid."""
    from ttnx.core.decomp import ttv_to_tensor
    from ttnx.ops.qtt import qtto_to_matrix

    Ad = np.asarray(qtto_to_matrix(A))
    ud = np.asarray(ttv_to_tensor(u0)).reshape(-1)
    eye = np.eye(Ad.shape[0])
    return np.linalg.solve(eye - h / 2 * Ad, (eye + h / 2 * Ad) @ ud)


def test_cn_step_bicgstab_fused_oversized_M_falls_back_matrix_free():
    """Buffer rank large enough that M = R*n*R exceeds the VMEM gate (1024):
    'bicgstab_fused' must fall back to the matrix-free einsum BiCGStab (NOT
    dense LU) and still produce the exact CN step (d=4 is full-rank
    representable)."""
    import jax
    import ttnx
    from ttnx.core.algebra import add_op, scale_op
    from ttnx.core.decomp import ttv_to_tensor
    from ttnx.kernels.dispatch import can_fuse_local_cg
    from ttnx.solvers.round_scan import make_cn_step

    d, rmax = 4, 24                      # M = 24*2*24 = 1152 > 1024
    assert not can_fuse_local_cg(jnp.float64, rmax * 2 * rmax)
    n_grid = 2 ** d
    h_grid = 1.0 / (n_grid + 1)
    A = add_op(
        scale_op(-0.05 / h_grid ** 2,
                 ttnx.toeplitz_to_qtto(2.0, -1.0, -1.0, d)),
        scale_op(1.0 / (2 * h_grid),
                 ttnx.toeplitz_to_qtto(0.0, 1.0, -1.0, d)))
    u0 = ttnx.qtt_sin(d, a=h_grid, b=1 - h_grid)
    h = 1e-4
    step_fn, pack, unpack = make_cn_step(
        A, h, rmax, dims=(2,) * d, u_rks=(1,) + (rmax,) * (d - 1) + (1,),
        dtype=jnp.float64, sweep_count=4, solver="bicgstab_fused",
        cg_iters=128)
    out = np.asarray(ttv_to_tensor(unpack(step_fn(pack(u0))))).reshape(-1)
    expect = _dense_cn_reference(A, u0, h)
    rel = np.linalg.norm(out - expect) / np.linalg.norm(expect)
    assert rel < 1e-9, rel


def test_cn_step_bicgstab_fused_complex_falls_back_matrix_free():
    """Complex dtype cannot enter the Pallas kernel: 'bicgstab_fused' falls
    back to matrix-free complex BiCGStab and matches the dense CN step of a
    Schrodinger-type (anti-Hermitian) generator."""
    import ttnx
    from ttnx.core.algebra import scale_op
    from ttnx.core.decomp import ttv_to_tensor
    from ttnx.solvers.round_scan import make_cn_step

    d, rmax = 4, 6
    n_grid = 2 ** d
    h_grid = 1.0 / (n_grid + 1)
    A = scale_op(-0.05j / h_grid ** 2,
                 ttnx.toeplitz_to_qtto(2.0, -1.0, -1.0, d))
    u0 = ttnx.qtt_sin(d, a=h_grid, b=1 - h_grid).astype(jnp.complex128)
    h = 1e-4
    step_fn, pack, unpack = make_cn_step(
        A, h, rmax, dims=(2,) * d, u_rks=(1,) + (rmax,) * (d - 1) + (1,),
        dtype=jnp.complex128, sweep_count=4, solver="bicgstab_fused",
        cg_iters=128)
    out = np.asarray(ttv_to_tensor(unpack(step_fn(pack(u0))))).reshape(-1)
    expect = _dense_cn_reference(A, u0, h)
    rel = np.linalg.norm(out - expect) / np.linalg.norm(expect)
    assert rel < 1e-9, rel


def test_matmul_chain_matches_reference_loop(rng):
    from ttnx.kernels.contraction import matmul_chain

    B, m, k = 4, 16, 8
    x = jnp.asarray(0.1 * rng.standard_normal((B, m, k)), dtype=jnp.float32)
    w = jnp.asarray(np.linalg.qr(rng.standard_normal((B, k, k)))[0],
                    dtype=jnp.float32)
    out = matmul_chain(x, w, iters=4, block_b=2, interpret=True, unroll=2)
    acc = np.asarray(x)
    wn = np.asarray(w)
    for _ in range(4):
        acc = np.einsum("bmk,bkn->bmn", acc, wn).astype(np.float32)
    assert np.allclose(np.asarray(out), acc, atol=1e-4)


def test_lanczos_fused_matches_matrix_free(rng):
    """lanczos_fused vs the matrix-free _lanczos_eigmin: same smallest Ritz
    value and (up to sign) vector on a masked SPD two-site operator."""
    import jax
    from ttnx.solvers.dmrg_scan import (_lanczos_eigmin,
                                        _lanczos_eigmin_fused, _window_mask)

    R, n, RA = 4, 2, 3
    C = rng.standard_normal((R, RA, R))
    L = jnp.asarray(np.einsum("aWb,cWd->aWbcd", C, C).mean(-1))  # junk PSD-ish
    # build symmetric L/Renv envs the way the sweep does: via random cores
    L = jnp.asarray(rng.standard_normal((R, RA, R)))
    L = 0.5 * (L + jnp.swapaxes(L, 0, 2))
    Renv = jnp.asarray(rng.standard_normal((R, RA, R)))
    Renv = 0.5 * (Renv + jnp.swapaxes(Renv, 0, 2))
    A = rng.standard_normal((RA, n, n, RA))
    A = 0.5 * (A + np.swapaxes(A, 1, 2))  # Hermitian physical block
    Ai = jnp.asarray(A)
    m_l = jnp.ones((R,)).at[R - 1].set(0.0)
    m_r = jnp.ones((R,))
    mask4 = _window_mask(m_l, m_r, n)
    v0 = jnp.asarray(rng.standard_normal((R, n, n, R))) * mask4
    lam_a, va = _lanczos_eigmin(L, Ai, Ai, Renv, v0, mask4, 24)
    lam_b, vb = _lanczos_eigmin_fused(L, Ai, Ai, Renv, v0, mask4, 24)
    assert np.isclose(float(lam_a), float(lam_b), atol=1e-8)
    ova = np.abs(np.vdot(np.asarray(va), np.asarray(vb)))
    assert ova > 1 - 1e-8, ova


def test_dmrg_eigsolve_scan_fused_heisenberg():
    """dmrg_eigsolve_scan(eig_solver='lanczos_fused') reaches the dense
    ground-state energy on the Heisenberg chain (config 3 workload)."""
    import jax
    import ttnx
    from ttnx.solvers.dmrg_scan import dmrg_eigsolve_scan

    d = 6
    H = ttnx.heisenberg_xyz_tto(d, jx=1.0, jy=1.0, jz=1.0)
    x0 = ttnx.rand_tt(jax.random.PRNGKey(3), (2,) * d, rmax=6,
                      normalise=True, orthogonal=True)
    E, psi = dmrg_eigsolve_scan(H, x0, tol=1e-10, rmax=12, n_sweeps=3,
                                eig_solver="lanczos_fused")
    w = np.linalg.eigvalsh(np.asarray(ttnx.qtto_to_matrix(H)))
    assert abs(float(E[-1]) - w[0]) < 1e-7, (float(E[-1]), w[0])


def test_merge_resplit_chain_autotuned_config(rng):
    """The autotuned production config (block_b=8, unroll=64 — the bench
    headline) stays numerically correct in interpret mode."""
    from ttnx.kernels.contraction import merge_resplit_chain

    B, r, n = 8, 8, 2
    a = jnp.asarray(0.1 * rng.standard_normal((B, r * n, r)),
                    dtype=jnp.float32)
    b = jnp.asarray(np.swapaxes(
        np.linalg.qr(rng.standard_normal((B, n * r, r)))[0], 1, 2),
        dtype=jnp.float32)
    w = jnp.asarray(np.linalg.qr(rng.standard_normal((B, n * r, r)))[0],
                    dtype=jnp.float32)
    out = merge_resplit_chain(a, b, w, iters=64, block_b=8, interpret=True,
                              unroll=64)
    acc = np.asarray(a)
    bn, wn = np.asarray(b), np.asarray(w)
    for _ in range(64):
        c = np.einsum("bmk,bkn->bmn", acc, bn)
        acc = np.einsum("bmn,bnk->bmk", c, wn).astype(np.float32)
    assert np.allclose(np.asarray(out), acc, atol=1e-3)


class TestMatrixFreeCG:
    """local_cg_mf: the rank>=32 fused matrix-free CG (K is VMEM-infeasible
    above M=1024; the envs-only matrix-free form fits easily)."""

    def _als_setup(self, rmax):
        import ttnx
        from ttnx.core.algebra import add_op, scale_op
        from ttnx.core.canonical import tt_round
        from ttnx.core.tt import id_tto, r_and_d_to_rks
        from ttnx.solvers.als_scan import pack_op, pack_tt, rank_masks

        d = 6
        hg = 1.0 / (2 ** d + 1)
        A = ((-1.0 / hg ** 2) * ttnx.toeplitz_to_qtto(2.0, -1.0, -1.0, d)
             ).astype(jnp.float32)
        lhs = add_op(id_tto(d, dtype=jnp.float32), scale_op(-5e-7, A))
        lhs_stack = pack_op(lhs, max(lhs.ranks))
        u_rks = r_and_d_to_rks((1,) + (rmax,) * (d - 1) + (1,), (2,) * d,
                               rmax=rmax)
        masks = rank_masks(u_rks, rmax, dtype=jnp.float32)
        u0 = ttnx.qtt_sin(d, a=hg, b=1 - hg)
        us = pack_tt(tt_round(u0, max_bond=rmax).astype(jnp.float32), rmax)
        return lhs_stack, us, masks, u_rks

    def test_gate(self):
        from ttnx.kernels.local_cg_mf import fits_vmem_mf

        assert fits_vmem_mf(jnp.float32, 64, 4, 2)
        assert fits_vmem_mf(jnp.float32, 32, 4, 2)
        assert not fits_vmem_mf(jnp.float32, 16, 4, 2)   # dense kernel's turf
        assert not fits_vmem_mf(jnp.complex64, 64, 4, 2)

    def test_als_kernel_path_matches_cg(self):
        """solver='cg_fused' at rmax=32 dispatches to the matrix-free kernel
        (interpret mode on CPU) and must represent the same solution as the
        XLA matrix-free 'cg' path."""
        from ttnx.core.decomp import ttv_to_tensor
        from ttnx.solvers.als_scan import als_sweeps, unpack_tt

        lhs_stack, us, masks, u_rks = self._als_setup(32)
        out_k = als_sweeps(lhs_stack, us, us, masks, 2, solver="cg_fused",
                           cg_iters=24)
        out_c = als_sweeps(lhs_stack, us, us, masks, 2, solver="cg",
                           cg_iters=24)
        vk = np.asarray(ttv_to_tensor(unpack_tt(out_k, u_rks))).reshape(-1)
        vc = np.asarray(ttv_to_tensor(unpack_tt(out_c, u_rks))).reshape(-1)
        rel = np.linalg.norm(vk - vc) / np.linalg.norm(vc)
        assert rel < 1e-5, rel


class TestEnvChainKernels:
    """env_chain: whole right/left ALS environment builds as single fused
    kernels (XLA scan-with-outputs copies the output buffer per iteration;
    einsum paths contract tiny dims as matmul-K — round-4 measurements)."""

    def _setup(self, d=8, rmax=32):
        import ttnx
        from ttnx.core.algebra import add_op, scale_op
        from ttnx.core.canonical import tt_round
        from ttnx.core.tt import id_tto, r_and_d_to_rks
        from ttnx.solvers.als_scan import pack_op, pack_tt, rank_masks

        hg = 1.0 / (2 ** d + 1)
        A = ((-1.0 / hg ** 2) * ttnx.toeplitz_to_qtto(2.0, -1.0, -1.0, d)
             ).astype(jnp.float32)
        lhs = add_op(id_tto(d, dtype=jnp.float32), scale_op(-5e-7, A))
        lhs_stack = pack_op(lhs, max(lhs.ranks))
        u_rks = r_and_d_to_rks((1,) + (rmax,) * (d - 1) + (1,), (2,) * d,
                               rmax=rmax)
        masks = rank_masks(u_rks, rmax, dtype=jnp.float32)
        u0 = ttnx.qtt_sin(d, a=hg, b=1 - hg)
        us = pack_tt(tt_round(u0, max_bond=rmax).astype(jnp.float32), rmax)
        return lhs_stack, us, masks

    def test_right_env_chain_matches_scan(self):
        from ttnx.kernels.env_chain import right_env_chain_fused
        from ttnx.solvers.als_scan import _right_env_stack

        lhs_stack, us, masks = self._setup()
        ref, refb = _right_env_stack(us, lhs_stack, us, masks[1:])
        xm = us * masks[1:][:, None, None, :]
        got, gotb = right_env_chain_fused(xm, lhs_stack, us, interpret=True)
        assert np.allclose(np.asarray(got), np.asarray(ref), atol=1e-4)
        assert np.allclose(np.asarray(gotb), np.asarray(refb), atol=1e-4)

    def test_left_env_chain_matches_scan(self):
        from ttnx.kernels.env_chain import left_env_chain_fused
        from ttnx.solvers.als_scan import _left_env_stack

        lhs_stack, us, masks = self._setup()
        ref, refb = _left_env_stack(us, lhs_stack, us, masks[1:])
        xm = us * masks[1:][:, None, None, :]
        got, gotb = left_env_chain_fused(xm, lhs_stack, us, interpret=True)
        assert np.allclose(np.asarray(got), np.asarray(ref), atol=1e-4)
        assert np.allclose(np.asarray(gotb), np.asarray(refb), atol=1e-4)

    def test_gate(self):
        from ttnx.kernels.env_chain import can_fuse_env_chain

        assert can_fuse_env_chain(jnp.float32, 12, 64, 4, 2)
        assert not can_fuse_env_chain(jnp.float64, 12, 64, 4, 2)
        assert not can_fuse_env_chain(jnp.complex64, 12, 64, 4, 2)

    def test_batchable_vmap_routes_to_xla_scan(self):
        """ADVICE r4 (medium): `jax.vmap` over the fused env chains must not
        reach the Pallas kernel (the remote toolchain rejects it) — the
        custom_vmap rule reroutes to the XLA scan builds. Verify the rule's
        outputs match a per-problem loop of the fused form."""
        from ttnx.kernels.env_chain import (env_chain_A_batchable,
                                            env_chain_batchable)

        lhs_stack, us, masks = self._setup(d=6, rmax=16)
        xm = us * masks[1:][:, None, None, :]
        B = 2
        keys = jax.random.split(jax.random.PRNGKey(7), B)
        xb = jnp.stack([xm + 1e-3 * jax.random.normal(k, xm.shape,
                                                      dtype=xm.dtype)
                        * masks[1:][:, None, None, :] for k in keys])
        for left in (False, True):
            got, gotb = jax.vmap(
                lambda x_: env_chain_batchable(x_, lhs_stack, us, left=left)
            )(xb)
            gotA = jax.vmap(
                lambda x_: env_chain_A_batchable(x_, lhs_stack, left=left)
            )(xb)
            for i in range(B):
                ref, refb = env_chain_batchable(xb[i], lhs_stack, us,
                                                left=left)
                refA = env_chain_A_batchable(xb[i], lhs_stack, left=left)
                assert np.allclose(np.asarray(got[i]), np.asarray(ref),
                                   atol=1e-4)
                assert np.allclose(np.asarray(gotb[i]), np.asarray(refb),
                                   atol=1e-4)
                assert np.allclose(np.asarray(gotA[i]), np.asarray(refA),
                                   atol=1e-4)

    def test_batched_dmrg_f32_r16_smoke(self, key):
        """The batched DMRG wrapper at f32 rank>=16 — the exact configuration
        ADVICE r4 flagged as uncovered (fused env gate ON under vmap)."""
        import ttnx
        from ttnx.parallel.batch import batched_dmrg_eig_sweeps
        from ttnx.solvers.als_scan import pack_op, pack_tt, rank_masks
        from ttnx.solvers.dmrg_scan import dmrg_eig_sweep

        d, rmax = 5, 16
        H = ttnx.heisenberg_xyz_tto(d, jx=1.0, jy=1.0, jz=1.0
                                    ).astype(jnp.float32)
        A_stack = pack_op(H, max(H.ranks))
        keys = jax.random.split(key, 2)
        xs, ms = [], []
        for k in keys:
            x = ttnx.rand_tt(k, (2,) * d, rmax=4, normalise=True,
                             orthogonal=True).astype(jnp.float32)
            xs.append(pack_tt(x, rmax))
            ms.append(rank_masks(x.ranks, rmax, dtype=jnp.float32))
        x_batch, m_batch = jnp.stack(xs), jnp.stack(ms)
        tol = jnp.float32(1e-7)
        xb, mb, Eb = batched_dmrg_eig_sweeps(A_stack, x_batch, m_batch,
                                             tol, tol, n_sweeps=4)
        from ttnx.core.decomp import tto_to_tensor

        Hd = np.asarray(tto_to_tensor(H.astype(jnp.float64))
                        ).reshape(2 ** d, 2 ** d)
        E0 = np.linalg.eigvalsh(Hd)[0]
        for i in range(2):
            # converged batched energy vs dense oracle (f32 class)
            assert abs(float(Eb[i][-1]) - E0) < 1e-3, (i, Eb[i][-1], E0)
            # and parity with the per-problem loop at convergence
            x, m = x_batch[i], m_batch[i]
            for _ in range(4):
                x, m, E = dmrg_eig_sweep(A_stack, x, m, tol, tol)
            assert abs(float(Eb[i][-1]) - float(E[-1])) < 1e-3


class TestAlsHalfSweepFused:
    """Whole-half-sweep fused ALS (round 5): parity vs the XLA batched ALS
    up to the orthogonalization gauge, residual quality, padded invariant."""

    def _problem(self, d=8, rmax=32):
        import ttnx
        from ttnx.core.algebra import add_op, scale_op
        from ttnx.core.canonical import tt_round
        from ttnx.core.tt import id_tto, r_and_d_to_rks
        from ttnx.solvers.als_scan import pack_op, pack_tt, rank_masks

        hg = 1.0 / (2 ** d + 1)
        A = ((-1.0 / hg ** 2) * ttnx.toeplitz_to_qtto(2.0, -1.0, -1.0, d)
             ).astype(jnp.float32)
        lhs = add_op(id_tto(d, dtype=jnp.float32), scale_op(-5e-7, A))
        lhs_stack = pack_op(lhs, max(lhs.ranks))
        u_rks = r_and_d_to_rks((1,) + (rmax,) * (d - 1) + (1,), (2,) * d,
                               rmax=rmax)
        masks = rank_masks(u_rks, rmax, dtype=jnp.float32)
        u0 = (ttnx.qtt_sin(d, a=hg, b=1 - hg, lam=1.0)
              + 0.5 * ttnx.qtt_sin(d, a=hg, b=1 - hg, lam=3.0))
        us = pack_tt(tt_round(u0, max_bond=rmax).astype(jnp.float32), rmax)
        return lhs_stack, us, masks, u_rks, u0, hg

    def test_parity_and_residual(self):
        from ttnx.core.decomp import ttv_to_tensor
        from ttnx.kernels.als_sweep_fused import als_fwd_bwd_fused_batched
        from ttnx.solvers.als_scan import unpack_tt
        from ttnx.solvers.als_scan_batched import als_sweeps_b

        lhs_stack, us, masks, u_rks, u0, hg = self._problem(d=6, rmax=32)
        B = 2
        bb = jnp.broadcast_to(us, (B,) + us.shape)
        ref = als_sweeps_b(lhs_stack, bb, bb, masks, 2, cg_iters=32,
                           solver="cg")
        got = als_fwd_bwd_fused_batched(lhs_stack, bb, bb, masks,
                                        cg_iters=16, interpret=True)

        def dense(stack):
            return np.asarray(
                ttv_to_tensor(unpack_tt(np.asarray(stack), u_rks))
            ).reshape(-1).astype(np.float64)

        u0d = np.asarray(ttv_to_tensor(u0)).reshape(-1)
        c = 5e-7 / hg ** 2
        x0 = dense(got[0])
        lhs_x = x0 + c * (2 * x0 - np.pad(x0[1:], (0, 1))
                          - np.pad(x0[:-1], (1, 0)))
        res = np.linalg.norm(lhs_x - u0d) / np.linalg.norm(u0d)
        assert res < 1e-5, res
        pv = (np.linalg.norm(dense(got[1]) - dense(ref[1]))
              / np.linalg.norm(dense(ref[1])))
        assert pv < 1e-4, pv

    def test_padded_invariant(self):
        from ttnx.kernels.als_sweep_fused import als_fwd_bwd_fused_batched

        lhs_stack, us, masks, u_rks, u0, hg = self._problem(d=6, rmax=16)
        bb = us[None]
        got = np.asarray(als_fwd_bwd_fused_batched(
            lhs_stack, bb, bb, masks, cg_iters=8, ns_iters=(10, 4),
            interpret=True))
        m = np.asarray(masks)
        assert np.abs(got * (1 - m[1:])[None, :, None, None, :]).max() == 0
        assert np.abs(got * (1 - m[:-1])[None, :, :, None, None]).max() == 0

    def test_gate(self):
        from ttnx.kernels.als_sweep_fused import can_fuse_half_sweep

        assert can_fuse_half_sweep(jnp.float32, 12, 64, 4, 2, block_b=2)
        assert not can_fuse_half_sweep(jnp.float64, 12, 64, 4, 2)
        assert not can_fuse_half_sweep(jnp.float32, 12, 16, 4, 2)
        assert not can_fuse_half_sweep(jnp.complex64, 12, 64, 4, 2)
