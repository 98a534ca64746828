"""Probe 3 (round 4): where do the 695 ms of the batched rank-64 ALS go?

Times, chained with one sync each:
  1. the raw production CG-apply contraction as a dependent chain at
     B=64/256, f32 highest vs default precision -> XLA's attainable rate
     on exactly the hot einsum;
  2. batched QR inside a lax.scan over sites (the in-context QR cost);
  3. batched eigh the same way (rounding-path analog);
  4. the full batched ALS at cg_iters in {2, 8, 32} -> the CG slope vs
     fixed overhead split.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def _sync(x):
    leaves = jax.tree_util.tree_leaves(x)
    return float(np.asarray(leaves[0]).reshape(-1)[0])


def emit(name, **kv):
    print(json.dumps({"section": name, **kv}), flush=True)


R, n, RA, d = 64, 2, 4, 12


def probe_apply_chain():
    rng = np.random.default_rng(0)
    for B, prec in ((64, "highest"), (64, "default"), (256, "highest")):
        L = jnp.asarray(rng.standard_normal((B, R, RA, R)) * 0.05,
                        jnp.float32)
        Ac = jnp.asarray(rng.standard_normal((RA, n, n, RA)) * 0.3,
                         jnp.float32)
        Renv = jnp.asarray(rng.standard_normal((B, R, RA, R)) * 0.05,
                           jnp.float32)
        v = jnp.asarray(rng.standard_normal((B, R, n, R)) * 0.1, jnp.float32)
        iters = 100

        @jax.jit
        def chain(L, Renv, v):
            ctx = (jax.default_matmul_precision("highest")
                   if prec == "highest" else jax.default_matmul_precision(
                       "default"))
            with ctx:
                def body(_, acc):
                    out = jnp.einsum("BaWb,WiJw,Bcwd,BbJd->Baic", L, Ac,
                                     Renv, acc, optimize=True)
                    # keep bounded without a data-dependent rescale
                    return out * 0.05
                return lax.fori_loop(0, iters, body, v)

        try:
            out = chain(L, Renv, v)
            _sync(out)
            best = None
            for _ in range(3):
                t0 = time.perf_counter()
                out = chain(L, Renv, v)
                _sync(out)
                best = min(best or 9e9, time.perf_counter() - t0)
            from ttnx.utils.flops import einsum_flops

            f1 = einsum_flops("aWb,WiJw,cwd,bJd->aic", (R, RA, R),
                              (RA, n, n, RA), (R, RA, R), (R, n, R))
            g = B * f1 * iters / best / 1e9
            emit(f"apply{B}_{prec}", ms=round(best * 1e3, 2),
                 gflops=round(g, 1))
        except Exception as e:
            emit(f"apply{B}_{prec}", error=str(e)[:200])


def probe_qr_in_scan():
    rng = np.random.default_rng(1)
    for B in (1, 64):
        x = jnp.asarray(rng.standard_normal((24, B, 2 * R, R)) * 0.3,
                        jnp.float32)

        @jax.jit
        def qr_scan(x):
            def step(acc, xi):
                q = jnp.linalg.qr(xi)[0]
                return acc + jnp.sum(q * q), q
            s, qs = lax.scan(step, jnp.float32(0.0), x)
            return s

        try:
            out = qr_scan(x)
            _sync(out)
            best = None
            for _ in range(3):
                t0 = time.perf_counter()
                out = qr_scan(x)
                _sync(out)
                best = min(best or 9e9, time.perf_counter() - t0)
            emit(f"qr_scan_B{B}", ms=round(best * 1e3, 2),
                 ms_per_site=round(best / 24 * 1e3, 3))
        except Exception as e:
            emit(f"qr_scan_B{B}", error=str(e)[:200])


def probe_eigh_in_scan():
    rng = np.random.default_rng(2)
    for B, m in ((1, 128), (64, 128)):
        a = jnp.asarray(rng.standard_normal((12, B, m, m)) * 0.3, jnp.float32)

        @jax.jit
        def eigh_scan(a):
            def step(acc, ai):
                s = ai + jnp.swapaxes(ai, -1, -2)
                w, V = jnp.linalg.eigh(s)
                return acc + jnp.sum(w), w
            s, _ = lax.scan(step, jnp.float32(0.0), a)
            return s

        try:
            out = eigh_scan(a)
            _sync(out)
            best = None
            for _ in range(3):
                t0 = time.perf_counter()
                out = eigh_scan(a)
                _sync(out)
                best = min(best or 9e9, time.perf_counter() - t0)
            emit(f"eigh_scan_B{B}_m{m}", ms=round(best * 1e3, 2),
                 ms_per_site=round(best / 12 * 1e3, 3))
        except Exception as e:
            emit(f"eigh_scan_B{B}_m{m}", error=str(e)[:200])


def probe_bals_cg_slope():
    import ttnx
    from ttnx.core.algebra import add_op, scale_op
    from ttnx.core.canonical import tt_round
    from ttnx.core.tt import id_tto, r_and_d_to_rks
    from ttnx.solvers.als_scan import (als_sweeps, pack_op, pack_tt,
                                       rank_masks)

    hg = 1.0 / (2 ** d + 1)
    h_step = 1e-6
    A = ((-1.0 / hg ** 2) * ttnx.toeplitz_to_qtto(2.0, -1.0, -1.0, d)
         ).astype(jnp.float32)
    lhs = add_op(id_tto(d, dtype=jnp.float32), scale_op(-h_step / 2, A))
    lhs_stack = pack_op(lhs, max(lhs.ranks))
    u_rks = r_and_d_to_rks((1,) + (R,) * (d - 1) + (1,), (2,) * d, rmax=R)
    masks = rank_masks(u_rks, R, dtype=jnp.float32)
    u0 = ttnx.qtt_sin(d, a=hg, b=1 - hg)
    us = pack_tt(tt_round(u0, max_bond=R).astype(jnp.float32), R)
    B = 64
    bb = jnp.broadcast_to(us, (B,) + us.shape)
    for ci in (2, 8, 32):
        try:
            @jax.jit
            def bfn(bb, xb, ci=ci):
                with jax.default_matmul_precision("highest"):
                    return jax.vmap(
                        lambda b, x: als_sweeps(lhs_stack, b, x, masks, 2,
                                                solver="cg_fused",
                                                cg_iters=ci))(bb, xb)

            out = bfn(bb, bb)
            _sync(out)
            best = None
            for _ in range(3):
                t0 = time.perf_counter()
                out = bfn(bb, bb)
                _sync(out)
                best = min(best or 9e9, time.perf_counter() - t0)
            emit(f"bals64_cg{ci}", ms=round(best * 1e3, 2))
        except Exception as e:
            emit(f"bals64_cg{ci}", error=str(e)[:300])


def main():
    emit("start", backend=jax.default_backend())
    for fn in (probe_apply_chain, probe_qr_in_scan, probe_eigh_in_scan,
               probe_bals_cg_slope):
        try:
            fn()
        except Exception as e:
            emit(fn.__name__, error=str(e)[:300])
    emit("done")


if __name__ == "__main__":
    main()
