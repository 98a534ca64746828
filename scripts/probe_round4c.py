"""Probe 4 (round 4): remote-safe device cross (eigh/Gram inverses, eigh-det
Wishart integrand) + TDVP sections with host-f64 orthogonalization —
validates the new bench sections before the full bench run."""

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
        # det(I + theta * sigma .* x) via the symmetric similarity
        # I + theta * sqrt(D) sigma sqrt(D): eigh-based (no LU det — the
        # remote toolchain SIGABRTs on LU)
        coords = jnp.take(grid, indices)                     # (m, d)
        s = jnp.sqrt(jnp.maximum(coords, 0.0))
        Msym = (jnp.eye(d, dtype=jnp.float32)[None]
                + theta * s[:, :, None] * sigma[None] * s[:, None, :])
        w = jnp.linalg.eigvalsh(Msym)
        return jnp.prod(w, axis=1) ** (-p)

    for B in (16,):
        try:
            thetas = jnp.linspace(0.5, 1.5, B).astype(jnp.float32)
            keys = jax.random.split(jax.random.PRNGKey(2), B)

            def run_one(theta, key):
                fn = maxvol_cross_device(partial(f_idx, theta), [8] * d,
                                         rank=8, n_iters=3,
                                         dtype=jnp.float32, n_val=500)
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
            emit(f"cross_dev{B}", ms=round(best * 1e3, 2),
                 crosses_per_s=round(B / best, 1),
                 compile_s=round(compile_s, 1),
                 max_val_eps=f"{float(jnp.max(eps[:, -1])):.2e}")
        except Exception as e:
            emit(f"cross_dev{B}", error=str(e)[:300])


def probe_bals_explicit():
    """als_sweeps_b (explicit batch axis) vs the 695 ms vmap form at r64."""
    import ttnx
    from ttnx.core.algebra import add_op, scale_op
    from ttnx.core.canonical import tt_round
    from ttnx.core.decomp import ttv_to_tensor
    from ttnx.core.tt import id_tto, r_and_d_to_rks
    from ttnx.solvers.als_scan import pack_op, pack_tt, rank_masks, unpack_tt
    from ttnx.solvers.als_scan_batched import als_sweeps_b
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
    for B in (64, 256):
        try:
            bb = jnp.broadcast_to(us, (B,) + us.shape)

            @jax.jit
            def bfn(bb, xb):
                with jax.default_matmul_precision("highest"):
                    return als_sweeps_b(lhs_stack, bb, xb, masks, 2,
                                        cg_iters=32)

            t0 = time.perf_counter()
            out = bfn(bb, bb)
            _sync(out)
            compile_s = time.perf_counter() - t0
            best = None
            for _ in range(3):
                t0 = time.perf_counter()
                for _ in range(3):
                    out = bfn(bb, bb)
                    _sync(out)
                best = min(best or 9e9, (time.perf_counter() - t0) / 3)
            x0 = np.asarray(ttv_to_tensor(unpack_tt(np.asarray(out[0]),
                                                    u_rks))
                            ).reshape(-1).astype(np.float64)
            lhs_x = x0 + c * (2 * x0 - np.pad(x0[1:], (0, 1))
                              - np.pad(x0[:-1], (1, 0)))
            res = np.linalg.norm(lhs_x - u0d) / np.linalg.norm(u0d)
            emit(f"balsb{B}", ms=round(best * 1e3, 2),
                 compile_s=round(compile_s, 1),
                 solves_per_s=round(B / best, 1),
                 gflops=round(B * fa / best / 1e9, 1),
                 residual=f"{res:.2e}")
        except Exception as e:
            emit(f"balsb{B}", error=str(e)[:300])


def probe_tdvp_sections():
    import bench

    try:
        ms = bench.bench_tdvp_step()
        emit("bench_tdvp1", ms=round(ms, 3))
    except Exception as e:
        emit("bench_tdvp1", error=str(e)[:300])
    try:
        ms = bench.bench_tdvp2_step()
        emit("bench_tdvp2", ms=round(ms, 3))
    except Exception as e:
        emit("bench_tdvp2", error=str(e)[:300])


def main():
    emit("start", backend=jax.default_backend())
    probe_bals_explicit()
    probe_cross_device()
    probe_tdvp_sections()
    emit("done")


if __name__ == "__main__":
    main()
