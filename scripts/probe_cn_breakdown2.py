"""Round-3 CN-step breakdown on the real chip: where do the 4.4 ms go?

Variants of the d=12 flagship (chained 16 async dispatches, one sync):
  full          — gram_chain + cg_fused + highest (flagship)
  round_only    — matvec + gram_chain rounding, no ALS
  als_only      — ALS sweeps only (pre-rounded rhs)
  cg32 / cg24   — flagship with fewer fused-CG iterations (+ residual)
  rmax32        — flagship at rmax=32 (R = 128 chain, 8x the FLOPs)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def _sync(out):
    return float(jnp.sum(jnp.abs(np.asarray(out).reshape(-1)[:4])))


def chain_time(fn, u, n=16, trials=3):
    out = fn(u)
    _sync(out)  # compile + warm
    best = None
    for _ in range(trials):
        t0 = time.perf_counter()
        v = u
        for _ in range(n):
            v = fn(v)
        _sync(v)
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best / n * 1e3


def cn_residual(unpack, out_stack, u0, lam1, h):
    from ttnx.core.decomp import ttv_to_tensor

    got = np.asarray(ttv_to_tensor(unpack(np.asarray(out_stack)))).reshape(-1)
    expect = (np.asarray(ttv_to_tensor(u0)).reshape(-1) * np.exp(-lam1 * h))
    return np.linalg.norm(got - expect) / np.linalg.norm(expect)


def main():
    import ttnx
    from ttnx.solvers.round_scan import make_cn_step, cn_step

    res = {}
    d = 12
    h_grid = 1.0 / (2 ** d + 1)
    lam1 = (2 - 2 * np.cos(np.pi / (2 ** d + 1))) / h_grid ** 2
    Aop = (-1.0 / h_grid ** 2) * ttnx.toeplitz_to_qtto(2.0, -1.0, -1.0, d)
    u0 = ttnx.qtt_sin(d, a=h_grid, b=1 - h_grid)
    base = dict(dims=(2,) * d, dtype=jnp.float32, sweep_count=2,
                solver="cg_fused", round_method="gram_chain",
                precision="highest")

    # flagship + cg-iteration sweep
    for name, iters in (("full_cg48", 48), ("cg32", 32), ("cg24", 24)):
        sf, pack, unpack = make_cn_step(
            Aop, 1e-9, 16, u_rks=(1,) + (16,) * (d - 1) + (1,),
            cg_iters=iters, **base)
        u = pack(u0)
        res[f"{name}_ms"] = round(chain_time(sf, u), 3)
        res[f"{name}_rel"] = "%.2e" % cn_residual(unpack, sf(u), u0, lam1,
                                                  1e-9)
        print(json.dumps(res), flush=True)

    # pieces: rounding-only and als-only (reusing the flagship's packed data)
    from ttnx.solvers.als_scan import als_sweeps
    from ttnx.solvers.round_scan import matvec_padded, tt_round_gram
    sf, pack, unpack = make_cn_step(
        Aop, 1e-9, 16, u_rks=(1,) + (16,) * (d - 1) + (1,), **base)
    u = pack(u0)
    # rebuild the step's internals for the piece timings
    from ttnx.core.algebra import add_op, scale_op
    from ttnx.core.tt import id_tto, r_and_d_to_rks
    from ttnx.solvers.als_scan import pack_op, rank_masks
    A32 = Aop.astype(jnp.float32)
    eye = id_tto(d, dtype=jnp.float32)
    lhs = pack_op(add_op(eye, scale_op(-0.5e-9, A32)), 4)
    rhs = pack_op(add_op(eye, scale_op(0.5e-9, A32)), 4)
    u_rks = r_and_d_to_rks((1,) + (16,) * (d - 1) + (1,), (2,) * d, rmax=16)
    masks_u = rank_masks(u_rks, 16, dtype=jnp.float32)

    @jax.jit
    def round_only(us):
        with jax.default_matmul_precision("highest"):
            big = matvec_padded(rhs, us)
            return tt_round_gram(big, 16, masks_u)

    @jax.jit
    def als_only(us):
        with jax.default_matmul_precision("highest"):
            return als_sweeps(lhs, us, us, masks_u, 2, solver="cg_fused")

    res["round_only_ms"] = round(chain_time(round_only, u), 3)
    res["als_only_ms"] = round(chain_time(als_only, u), 3)
    print(json.dumps(res), flush=True)

    # rmax=32 data point (R = 128 applied chain)
    sf32, pack32, unpack32 = make_cn_step(
        Aop, 1e-9, 32, u_rks=(1,) + (32,) * (d - 1) + (1,), **base)
    u32 = pack32(u0)
    res["rmax32_ms"] = round(chain_time(sf32, u32), 3)
    res["rmax32_rel"] = "%.2e" % cn_residual(unpack32, sf32(u32), u0, lam1,
                                             1e-9)
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
