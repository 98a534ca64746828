"""Round-5 probe: whole-half-sweep fused ALS on the real chip.

Times als_fwd_bwd_fused_batched (3 kernel dispatches per batched solve)
against the round-4 best (als_sweeps_b with cg_fused, ~500 dispatches) in
the SAME session, with the residual gate and an adjacent f32h ceiling.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def _sync(x):
    leaves = jax.tree_util.tree_leaves(x)
    return float(np.asarray(leaves[0]).reshape(-1)[0])


def emit(name, **kv):
    print(json.dumps({"section": name, **kv}), flush=True)


def main():
    emit("start", backend=jax.default_backend())
    import ttnx
    from ttnx.core.algebra import add_op, scale_op
    from ttnx.core.canonical import tt_round
    from ttnx.core.decomp import ttv_to_tensor
    from ttnx.core.tt import id_tto, r_and_d_to_rks
    from ttnx.solvers.als_scan import pack_op, pack_tt, rank_masks, unpack_tt
    from ttnx.solvers.als_scan_batched import als_sweeps_b
    from ttnx.kernels.als_sweep_fused import als_fwd_bwd_fused_batched
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

    def gate(out):
        x0 = np.asarray(ttv_to_tensor(unpack_tt(np.asarray(out[0]), u_rks))
                        ).reshape(-1).astype(np.float64)
        lhs_x = x0 + c * (2 * x0 - np.pad(x0[1:], (0, 1))
                          - np.pad(x0[:-1], (1, 0)))
        return float(np.linalg.norm(lhs_x - u0d) / np.linalg.norm(u0d))

    for B, bt, ns in ((256, 2, (24, 8)), (256, 1, (24, 8)),
                      (256, 2, (14, 6)), (1024, 2, (24, 8)),
                      (64, 2, (24, 8))):
        bb = jnp.broadcast_to(us, (B,) + us.shape)
        try:
            fn = jax.jit(lambda b_, x_, bt=bt, ns=ns:
                         als_fwd_bwd_fused_batched(
                             lhs_stack, b_, x_, masks, cg_iters=32,
                             ns_iters=ns, block_b=bt))
            t0 = time.perf_counter()
            with jax.default_matmul_precision("highest"):
                out = fn(bb, bb)
                _sync(out)
            compile_s = time.perf_counter() - t0
            best = None
            for _ in range(3):
                t0 = time.perf_counter()
                for _ in range(3):
                    with jax.default_matmul_precision("highest"):
                        out = fn(bb, bb)
                    _sync(out)
                best = min(best or 9e9, (time.perf_counter() - t0) / 3)
            emit(f"fused_B{B}_bt{bt}_ns{ns[0]}", ms=round(best * 1e3, 2),
                 compile_s=round(compile_s, 1),
                 solves_per_s=round(B / best, 1),
                 gflops=round(B * fa / best / 1e9, 1),
                 residual=f"{gate(out):.2e}")
        except Exception as e:
            emit(f"fused_B{B}_bt{bt}_ns{ns[0]}", error_tail=str(e)[-1200:])

    # round-4 best path, same session, for an honest in-session ratio
    for B in (256,):
        bb = jnp.broadcast_to(us, (B,) + us.shape)
        try:
            fn = jax.jit(lambda b_, x_: als_sweeps_b(
                lhs_stack, b_, x_, masks, 2, cg_iters=32,
                solver="cg_fused"))
            with jax.default_matmul_precision("highest"):
                out = fn(bb, bb)
                _sync(out)
            best = None
            for _ in range(3):
                t0 = time.perf_counter()
                for _ in range(3):
                    with jax.default_matmul_precision("highest"):
                        out = fn(bb, bb)
                    _sync(out)
                best = min(best or 9e9, (time.perf_counter() - t0) / 3)
            emit(f"r4_best_B{B}", ms=round(best * 1e3, 2),
                 solves_per_s=round(B / best, 1),
                 gflops=round(B * fa / best / 1e9, 1),
                 residual=f"{gate(out):.2e}")
        except Exception as e:
            emit(f"r4_best_B{B}", error=str(e)[:300])

    # adjacent f32h ceiling
    rng = np.random.default_rng(5)
    n_h = 1024
    xh = jnp.asarray(rng.standard_normal((n_h, n_h)) * 0.02, jnp.float32)
    wh = jnp.asarray(np.linalg.qr(rng.standard_normal((n_h, n_h)))[0],
                     jnp.float32)

    @jax.jit
    def chain_f32h(x, w):
        with jax.default_matmul_precision("highest"):
            def body(_, acc):
                return acc @ w
            return jax.lax.fori_loop(0, 512, body, x)

    _sync(chain_f32h(xh, wh))
    for k in range(3):
        t0 = time.perf_counter()
        _sync(chain_f32h(xh, wh))
        dt = time.perf_counter() - t0
        emit(f"f32h_{k}", gflops=round(2.0 * n_h ** 3 * 512 / dt / 1e9, 1))
    emit("done")


if __name__ == "__main__":
    main()
