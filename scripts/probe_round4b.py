"""Probe 2 (round 4): batched-QR serialization diagnosis + polar-orth
batched ALS, gated DMRG/TDVP sections with precision fixes, and the device
cross compile test on the real chip."""

import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def _sync(x):
    leaves = jax.tree_util.tree_leaves(x)
    return float(np.asarray(leaves[0]).reshape(-1)[0])


def emit(name, **kv):
    print(json.dumps({"section": name, **kv}), flush=True)


def time_chain(fn, *args, n=3, reps=3):
    out = fn(*args)
    _sync(out)
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
            _sync(out)
        best = min(best or 9e9, (time.perf_counter() - t0) / n)
    return best, out


def probe_qr_vs_polar():
    """Is batched QR the serialization? Time B QRs of (128, 64) vs the
    matmul-only polar orthogonalization on identical data."""
    from ttnx.solvers.als_scan import polar_orth

    rng = np.random.default_rng(0)
    for B in (64, 512):
        x = jnp.asarray(rng.standard_normal((B, 128, 64)) * 0.3, jnp.float32)

        @jax.jit
        def bqr(x):
            return jnp.linalg.qr(x)[0]

        @jax.jit
        def bpolar(x):
            with jax.default_matmul_precision("highest"):
                return jax.vmap(lambda m: polar_orth(m)[0])(x)

        try:
            dt, _ = time_chain(bqr, x)
            emit(f"bqr{B}", ms=round(dt * 1e3, 2))
        except Exception as e:
            emit(f"bqr{B}", error=str(e)[:200])
        try:
            dt, q = time_chain(bpolar, x)
            # orthogonality quality
            qh = np.asarray(q[0], np.float64)
            dev = np.linalg.norm(qh.T @ qh - np.eye(64))
            emit(f"bpolar{B}", ms=round(dt * 1e3, 2), orth_dev=f"{dev:.1e}")
        except Exception as e:
            emit(f"bpolar{B}", error=str(e)[:200])


def probe_bals_polar():
    import ttnx
    from ttnx.core.algebra import add_op, scale_op
    from ttnx.core.canonical import tt_round
    from ttnx.core.decomp import ttv_to_tensor
    from ttnx.core.tt import id_tto, r_and_d_to_rks
    from ttnx.solvers.als_scan import (als_sweeps, pack_op, pack_tt,
                                       rank_masks, unpack_tt)
    from ttnx.utils.flops import als_sweeps_flops

    d, rmax = 12, 64
    hg = 1.0 / (2 ** d + 1)
    h_step = 1e-6
    A = ((-1.0 / hg ** 2) * ttnx.toeplitz_to_qtto(2.0, -1.0, -1.0, d)
         ).astype(jnp.float32)
    lhs = add_op(id_tto(d, dtype=jnp.float32), scale_op(-h_step / 2, A))
    lhs_stack = pack_op(lhs, max(lhs.ranks))
    u_rks = r_and_d_to_rks((1,) + (rmax,) * (d - 1) + (1,), (2,) * d,
                           rmax=rmax)
    masks = rank_masks(u_rks, rmax, dtype=jnp.float32)
    u0 = (ttnx.qtt_sin(d, a=hg, b=1 - hg, lam=1.0)
          + 0.5 * ttnx.qtt_sin(d, a=hg, b=1 - hg, lam=3.0)
          + 0.25 * ttnx.qtt_sin(d, a=hg, b=1 - hg, lam=9.0))
    us = pack_tt(tt_round(u0, max_bond=rmax).astype(jnp.float32), rmax)
    fa = als_sweeps_flops(d, rmax, 4, rmax, cg_iters=32)
    u0d = np.asarray(ttv_to_tensor(u0)).reshape(-1)
    c = h_step / (2 * hg ** 2)

    for orth, B in (("polar", 64), ("polar", 256), ("qr", 64)):
        try:
            bb = jnp.broadcast_to(us, (B,) + us.shape)

            @jax.jit
            def bfn(bb, xb):
                with jax.default_matmul_precision("highest"):
                    return jax.vmap(
                        lambda b, x: als_sweeps(lhs_stack, b, x, masks, 2,
                                                solver="cg_fused", orth=orth,
                                                cg_iters=32))(bb, xb)

            best, out = time_chain(bfn, bb, bb)
            x0 = np.asarray(ttv_to_tensor(unpack_tt(np.asarray(out[0]),
                                                    u_rks))
                            ).reshape(-1).astype(np.float64)
            lhs_x = x0 + c * (2 * x0 - np.pad(x0[1:], (0, 1))
                              - np.pad(x0[:-1], (1, 0)))
            res = np.linalg.norm(lhs_x - u0d) / np.linalg.norm(u0d)
            emit(f"bals_{orth}{B}", ms=round(best * 1e3, 2),
                 solves_per_s=round(B / best, 1),
                 gflops=round(B * fa / best / 1e9, 1),
                 residual=f"{res:.2e}")
        except Exception as e:
            emit(f"bals_{orth}{B}", error=str(e)[:300])


def probe_dmrg_highest():
    import ttnx
    from ttnx.solvers.als_scan import pack_op, pack_tt, rank_masks
    from ttnx.solvers.dmrg_scan import dmrg_eig_sweep

    d, rmax = 10, 16
    H = ttnx.heisenberg_xyz_tto(d, jx=1.0, jy=1.0, jz=1.0).astype(jnp.float32)
    x0 = ttnx.rand_tt(jax.random.PRNGKey(3), (2,) * d, rmax=4,
                      normalise=True, orthogonal=True).astype(jnp.float32)
    A_stack = pack_op(H, max(H.ranks))
    x_stack = pack_tt(x0, rmax)
    masks = rank_masks(x0.ranks, rmax, dtype=jnp.float32)
    tol = jnp.float32(1e-8)

    def sweep(xs, ms):
        with jax.default_matmul_precision("highest"):
            return dmrg_eig_sweep(A_stack, xs, ms, tol, tol,
                                  lanczos_iters=24, split="gram")

    xs, ms, lam = sweep(x_stack, masks)
    _sync(lam)
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        xs, ms = x_stack, masks
        for _ in range(8):
            xs, ms, lam = sweep(xs, ms)
        _sync(lam)
        best = min(best or 9e9, time.perf_counter() - t0)
    E = float(np.asarray(lam)[-1])
    emit("dmrg_highest", ms_per_sweep=round(best / 8 * 1e3, 2), E=E,
         err_vs_dense=f"{abs(E + 17.032140829):.2e}")


def probe_tdvp_orth():
    import ttnx
    from ttnx.core.canonical import orthogonalize
    from ttnx.core.decomp import ttv_to_tensor
    from ttnx.solvers.als_scan import pack_op, pack_tt, unpack_tt
    from ttnx.solvers.tdvp_scan import tdvp1_step, tdvp2_step

    d, rmax = 10, 8
    hg = 1.0 / (2 ** d + 1)
    h_step = 1e-5
    A = ((0.1 / hg ** 2) * ttnx.toeplitz_to_qtto(-2.0, 1.0, 1.0, d)
         ).astype(jnp.float32)
    u0 = ttnx.qtt_sin(d, a=hg, b=1 - hg)
    A_stack = pack_op(A, max(A.ranks))
    x_stack = pack_tt(orthogonalize(u0.astype(jnp.float32), 0), rmax)
    mask_np = np.zeros((d + 1, rmax), np.float32)
    for i, r in enumerate(u0.ranks):
        mask_np[i, :r] = 1.0
    masks = jnp.asarray(mask_np)
    h = jnp.float32(h_step)
    lam1 = 0.1 * (2 - 2 * np.cos(np.pi * hg)) / hg ** 2
    u0d = np.asarray(ttv_to_tensor(u0)).reshape(-1)
    rks = tuple(int(v) for v in mask_np.sum(axis=1))

    def step1(xs):
        with jax.default_matmul_precision("highest"):
            return tdvp1_step(A_stack, xs, masks, h, imag_real=True)

    try:
        best, v = time_chain(lambda x: x, x_stack, n=1, reps=1)  # warm sync
        v = step1(x_stack)
        _sync(v)
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            v = x_stack
            for _ in range(16):
                v = step1(v)
            _sync(v)
            best = min(best or 9e9, (time.perf_counter() - t0) / 16)
        got = np.asarray(ttv_to_tensor(unpack_tt(np.asarray(v), rks))
                         ).reshape(-1)
        expect = u0d * np.exp(-lam1 * 16 * h_step)
        rel = np.linalg.norm(got - expect) / np.linalg.norm(expect)
        emit("tdvp1_orth", ms=round(best * 1e3, 3), rel=f"{rel:.2e}")
    except Exception as e:
        emit("tdvp1_orth", error=str(e)[:200])

    te = jnp.float32(0.0)
    mk = jnp.int32(rmax)

    def step2(xs, ms):
        with jax.default_matmul_precision("highest"):
            return tdvp2_step(A_stack, xs, ms, h, te, mk, imag_real=True,
                              split="gram")

    try:
        xs, ms = step2(x_stack, masks)
        _sync(xs)
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            xs, ms = x_stack, masks
            for _ in range(8):
                xs, ms = step2(xs, ms)
            _sync(xs)
            best = min(best or 9e9, (time.perf_counter() - t0) / 8)
        rks2 = tuple(int(v) for v in np.asarray(ms).sum(axis=1))
        got = np.asarray(ttv_to_tensor(unpack_tt(np.asarray(xs), rks2))
                         ).reshape(-1)
        expect = u0d * np.exp(-lam1 * 8 * h_step)
        rel = np.linalg.norm(got - expect) / np.linalg.norm(expect)
        emit("tdvp2_orth", ms=round(best * 1e3, 3), rel=f"{rel:.2e}")
    except Exception as e:
        emit("tdvp2_orth", error=str(e)[:200])


def probe_cross_device():
    from ttnx.cross.device import maxvol_cross_device

    d = 5
    nu = d + 2
    p = nu / 2
    Sigma = np.array([
        [1.0, 0.3, 0.2, 0.1, 0.18],
        [0.3, 1.2, 0.25, 0.15, 0.22],
        [0.2, 0.25, 0.9, 0.2, 0.28],
        [0.1, 0.15, 0.2, 1.1, 0.19],
        [0.18, 0.22, 0.28, 0.19, 1.05],
    ])
    sigma = jnp.asarray(2 * Sigma, jnp.float32)
    grid = jnp.linspace(0.0, 2.0, 8).astype(jnp.float32)

    def f_idx(theta, indices):
        coords = jnp.take(grid, indices)
        M = (jnp.eye(d, dtype=jnp.float32)[None]
             + theta * sigma[None] * coords[:, None, :])
        return jnp.linalg.det(M) ** (-p)

    try:
        B = 16
        thetas = jnp.linspace(0.5, 1.5, B).astype(jnp.float32)
        keys = jax.random.split(jax.random.PRNGKey(2), B)

        def run_one(theta, key):
            fn = maxvol_cross_device(partial(f_idx, theta), [8] * d, rank=8,
                                     n_iters=3, dtype=jnp.float32, n_val=500)
            return fn(key)

        bfn = jax.jit(jax.vmap(run_one))
        t0 = time.perf_counter()
        cores, eps = bfn(thetas, keys)
        _sync(eps)
        compile_s = time.perf_counter() - t0
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            cores, eps = bfn(thetas, keys)
            _sync(eps)
            best = min(best or 9e9, time.perf_counter() - t0)
        emit("cross_dev16", ms=round(best * 1e3, 2),
             crosses_per_s=round(B / best, 1),
             compile_s=round(compile_s, 1),
             max_val_eps=f"{float(jnp.max(eps)):.2e}")
    except Exception as e:
        emit("cross_dev16", error=str(e)[:300])


def main():
    emit("start", backend=jax.default_backend())
    for fn in (probe_qr_vs_polar, probe_bals_polar, probe_dmrg_highest,
               probe_tdvp_orth, probe_cross_device):
        try:
            fn()
        except Exception as e:
            emit(fn.__name__, error=str(e)[:300])
    emit("done")


if __name__ == "__main__":
    main()
