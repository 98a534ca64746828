"""Probe: where do the d=12 CN-step milliseconds go, and what does matmul
precision cost/buy on the real TPU?

Times (a) the ALS sweeps alone, (b) matvec+rounding alone, (c) the full CN
step for solver in {cg, cg_fused} x precision in {default, highest}, and
reports the CN residual ||lhs u' - rhs u|| / ||rhs u|| computed in f64 on
host as the accuracy figure for each configuration."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def _sync(out):
    leaves = jax.tree_util.tree_leaves(out)
    acc = 0.0
    for leaf in leaves:
        acc += float(jnp.sum(jnp.abs(leaf[(0,) * (leaf.ndim - 1)][:1])))
    return acc


def _time_fn(fn, *args, warmup=1, iters=5):
    out = None
    for _ in range(warmup):
        out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        _sync(out)
    return (time.perf_counter() - t0) / iters


def main():
    import ttnx
    from ttnx.core.algebra import add_op, scale_op
    from ttnx.core.tt import id_tto
    from ttnx.solvers.als_scan import unpack_tt
    from ttnx.solvers.round_scan import make_cn_step

    res = {}
    d, rmax = 12, 16
    h_grid = 1.0 / (2 ** d + 1)
    h = 1e-9
    Aop = (-1.0 / h_grid ** 2) * ttnx.toeplitz_to_qtto(2.0, -1.0, -1.0, d)
    u0 = ttnx.qtt_sin(d, a=h_grid, b=1 - h_grid)

    # dense f64 reference operators on host for the residual
    lhs_ref = add_op(id_tto(d), scale_op(-h / 2, Aop))
    rhs_ref = add_op(id_tto(d), scale_op(h / 2, Aop))

    u_rks = (1,) + (rmax,) * (d - 1) + (1,)

    def residual(u_next_stack, pack_ref_u):
        from ttnx.core.algebra import matvec, norm, sub

        u_next = unpack_tt(np.asarray(u_next_stack), u_rks).astype(
            jnp.float64)
        target = matvec(rhs_ref, pack_ref_u)
        r = sub(matvec(lhs_ref, u_next), target)
        return float(norm(r) / norm(target))

    for solver in ("cg", "cg_fused"):
        for precision in (None, "highest"):
            tag = f"{solver}_{precision or 'default'}"
            try:
                t0 = time.perf_counter()
                step_fn, pack, _ = make_cn_step(
                    Aop, h, rmax=rmax, dims=(2,) * d, u_rks=u_rks,
                    dtype=jnp.float32, sweep_count=2, solver=solver,
                    round_method="gram", precision=precision)
                u_stack = pack(u0)
                out = step_fn(u_stack)
                _sync(out)
                res[f"{tag}_compile_s"] = round(time.perf_counter() - t0, 1)
                res[f"{tag}_ms"] = round(
                    _time_fn(step_fn, u_stack, warmup=1, iters=5) * 1e3, 2)
                res[f"{tag}_resid"] = residual(out, u0)
            except Exception as e:  # noqa: BLE001
                res[f"{tag}_error"] = str(e)[:250]
            print(json.dumps(res), flush=True)

    # component timings (solver=cg, default precision)
    from ttnx.solvers.als_scan import als_sweeps, pack_op, pack_tt, rank_masks
    from ttnx.solvers.round_scan import (cn_step, matvec_padded, round_masks,
                                         tt_round_scan, rank_masks as _rm)

    import __graft_entry__

    A_stack, b_stack, x_stack, masks = __graft_entry__._heat_problem(
        d=d, rmax=rmax, dtype=jnp.float32)
    fn_als = jax.jit(lambda b, x: als_sweeps(
        A_stack, b, x, masks, 2, solver="cg"))
    res["als_only_ms"] = round(
        _time_fn(fn_als, b_stack, x_stack, warmup=1, iters=5) * 1e3, 2)

    # matvec + rounding alone at the CN shapes
    lhs32 = lhs_ref.astype(jnp.float32)
    rhs32 = rhs_ref.astype(jnp.float32)
    RA = max(rhs32.ranks)
    rhs_stack = pack_op(rhs32, RA)
    from ttnx.core.tt import r_and_d_to_rks

    u_rks_c = r_and_d_to_rks(list(u_rks), (2,) * d, rmax=rmax)
    masks_u = rank_masks(u_rks_c, rmax, dtype=jnp.float32)
    masks_A = np.zeros((d + 1, RA))
    for i, r in enumerate(rhs32.ranks):
        masks_A[i, :r] = 1.0
    masks_u_np = np.asarray(masks_u)
    masks_big = jnp.asarray(np.stack(
        [np.outer(masks_A[i], masks_u_np[i]).reshape(-1)
         for i in range(d + 1)]), dtype=jnp.float32)
    big_rks = [min(a * b, RA * rmax) for a, b in zip(rhs32.ranks, u_rks_c)]
    out_rks = round_masks(big_rks, rmax, (2,) * d)
    masks_out = rank_masks(out_rks, rmax, dtype=jnp.float32)

    @jax.jit
    def mv_round(u):
        big = matvec_padded(rhs_stack, u)
        return tt_round_scan(big, masks_big, rmax, masks_out, method="gram")

    res["matvec_round_ms"] = round(
        _time_fn(mv_round, x_stack, warmup=1, iters=5) * 1e3, 2)
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
