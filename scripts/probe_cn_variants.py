"""Probe CN-step variants on the real TPU to find one that dodges the
remote-compiler SIGABRT (transpose-folding pass bug; flags are NOT forwarded
— both XLA_FLAGS and AOT compiler_options were measured ineffective
2026-08-20).

Variants:
  v_batch1    — vmap the full cn_step over a singleton batch axis
  v_matmul    — round_rhs=False + orth='polar' (matmul-only program)
  v_d10       — same program at d=10
  v_round16   — tt_round_scan alone at the CN shapes
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp


def sync(out):
    leaves = jax.tree_util.tree_leaves(out)
    acc = 0.0
    for leaf in leaves:
        acc += float(jnp.sum(jnp.abs(leaf[(0,) * (leaf.ndim - 1)][:1])))
    return acc


def stage(name, fn, *args, iters=3):
    t0 = time.perf_counter()
    try:
        out = fn(*args)
        sync(out)
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
            sync(out)
        run_ms = (time.perf_counter() - t0) / iters * 1e3
        print(json.dumps({"stage": name, "ok": True,
                          "compile_s": round(compile_s, 1),
                          "run_ms": round(run_ms, 3)}), flush=True)
        return True
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"stage": name, "ok": False,
                          "s": round(time.perf_counter() - t0, 1),
                          "error": str(e)[:200]}), flush=True)
        return False


def make_step(d, **kw):
    import ttnx
    from ttnx.solvers.round_scan import make_cn_step

    dtype = jnp.float32
    rmax = 16
    n_grid = 2 ** d
    h_grid = 1.0 / (n_grid + 1)
    A = (1.0 / h_grid ** 2) * ttnx.toeplitz_to_qtto(2.0, -1.0, -1.0, d)
    defaults = dict(sweep_count=2, solver="cg")
    defaults.update(kw)
    step_fn, pack, _ = make_cn_step(
        A, 1e-9, rmax=rmax, dims=(2,) * d,
        u_rks=(1,) + (rmax,) * (d - 1) + (1,), dtype=dtype, **defaults)
    u0 = ttnx.qtt_sin(d, a=h_grid, b=1 - h_grid)
    return step_fn, pack(u0)


def main():
    step12, u12 = make_step(12)

    # 1. singleton-batch vmap of the full program
    vstep = jax.jit(jax.vmap(step12))
    stage("v_batch1", vstep, u12[None])

    # 2. matmul-only variant (no QR/SVD/LU anywhere)
    stepm, um = make_step(12, round_rhs=False, orth="polar")
    stage("v_matmul", jax.jit(stepm), um)

    # 3. d=10
    step10, u10 = make_step(10)
    stage("v_d10", jax.jit(step10), u10)

    # 4. rounding alone at CN shapes
    import ttnx
    from ttnx.solvers.round_scan import (matvec_padded, tt_round_scan,
                                         round_masks)
    from ttnx.solvers.als_scan import pack_op, pack_tt, rank_masks
    from ttnx.core.algebra import add_op, scale_op
    from ttnx.core.tt import id_tto, r_and_d_to_rks
    import numpy as np

    d, rmax, dtype = 12, 16, jnp.float32
    n_grid = 2 ** d
    h_grid = 1.0 / (n_grid + 1)
    A = ((1.0 / h_grid ** 2) * ttnx.toeplitz_to_qtto(2.0, -1.0, -1.0, d)
         ).astype(dtype)
    rhs = add_op(id_tto(d, dtype=dtype), scale_op(0.5e-9, A))
    RA = max(rhs.ranks)
    rhs_stack = pack_op(rhs, RA)
    dims = (2,) * d
    u_rks = r_and_d_to_rks((1,) + (rmax,) * (d - 1) + (1,), dims, rmax=rmax)
    u = pack_tt(ttnx.qtt_sin(d, a=h_grid, b=1 - h_grid).astype(dtype), rmax)
    masks_A = np.zeros((d + 1, RA))
    for i, r in enumerate(rhs.ranks):
        masks_A[i, :r] = 1.0
    masks_u_np = np.asarray(rank_masks(u_rks, rmax, dtype=jnp.float32))
    masks_big = jnp.asarray(np.stack(
        [np.outer(masks_A[i], masks_u_np[i]).reshape(-1)
         for i in range(d + 1)]), dtype=jnp.float32)
    big_rks = [min(a * b, RA * rmax) for a, b in zip(rhs.ranks, u_rks)]
    out_rks = round_masks(big_rks, rmax, dims)
    masks_out = rank_masks(out_rks, rmax, dtype=jnp.float32)

    rfn = jax.jit(lambda uu: tt_round_scan(
        matvec_padded(rhs_stack, uu), masks_big, rmax, masks_out))
    stage("v_round16", rfn, u)

    # 5. vmapped round
    stage("v_round16_batch1", jax.jit(jax.vmap(
        lambda uu: tt_round_scan(matvec_padded(rhs_stack, uu), masks_big,
                                 rmax, masks_out))), u[None])


if __name__ == "__main__":
    main()
