"""Probe: chained (async-dispatch, single-sync) timing breakdown of the
d=12 CN step, plus cg_iters sensitivity. All programs in one process so the
session's compile-service warmup is paid once."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def _sync(out):
    return float(jnp.sum(jnp.abs(out[(0,) * (out.ndim - 1)][:1])))


def chained_ms(fn, u, n=16, trials=3):
    out = fn(u)
    _sync(out)
    ts = []
    for _ in range(trials):
        t0 = time.perf_counter()
        v = u
        for _ in range(n):
            v = fn(v)
        _sync(v)
        ts.append(time.perf_counter() - t0)
    return round(min(ts) / n * 1e3, 3)


def main():
    import ttnx
    from ttnx.core.algebra import add_op, scale_op
    from ttnx.core.tt import id_tto, r_and_d_to_rks
    from ttnx.solvers.als_scan import als_sweeps, pack_op, rank_masks
    from ttnx.solvers.round_scan import (make_cn_step, matvec_padded,
                                         round_masks, tt_round_scan)

    res = {}
    d, rmax = 12, 16
    h_grid = 1.0 / (2 ** d + 1)
    h = 1e-9
    Aop = (-1.0 / h_grid ** 2) * ttnx.toeplitz_to_qtto(2.0, -1.0, -1.0, d)
    u0 = ttnx.qtt_sin(d, a=h_grid, b=1 - h_grid)
    base = dict(dims=(2,) * d, u_rks=(1,) + (rmax,) * (d - 1) + (1,),
                dtype=jnp.float32, sweep_count=2, solver="cg_fused",
                round_method="gram", precision="highest")

    t0 = time.perf_counter()
    step48, pack, _ = make_cn_step(Aop, h, rmax, **base)
    u = pack(u0)
    res["full48_ms"] = chained_ms(step48, u)
    res["first_compile_s"] = round(time.perf_counter() - t0, 1)
    print(json.dumps(res), flush=True)

    for iters in (32, 24):
        stepk, _, _ = make_cn_step(Aop, h, rmax, cg_iters=iters, **base)
        res[f"full{iters}_ms"] = chained_ms(stepk, u)
        print(json.dumps(res), flush=True)

    # component: matvec + rounding only, chained (output shape == input)
    import __graft_entry__

    lhs32 = add_op(id_tto(d, dtype=jnp.float32),
                   scale_op(-h / 2, Aop.astype(jnp.float32)))
    rhs32 = add_op(id_tto(d, dtype=jnp.float32),
                   scale_op(h / 2, Aop.astype(jnp.float32)))
    RA = max(rhs32.ranks)
    rhs_stack = pack_op(rhs32, RA)
    u_rks = r_and_d_to_rks([1] + [rmax] * (d - 1) + [1], (2,) * d, rmax=rmax)
    masks_u = rank_masks(u_rks, rmax, dtype=jnp.float32)
    masks_A = np.zeros((d + 1, RA))
    for i, r in enumerate(rhs32.ranks):
        masks_A[i, :r] = 1.0
    mu = np.asarray(masks_u)
    masks_big = jnp.asarray(np.stack(
        [np.outer(masks_A[i], mu[i]).reshape(-1) for i in range(d + 1)]),
        dtype=jnp.float32)
    big_rks = [min(a * b, RA * rmax) for a, b in zip(rhs32.ranks, u_rks)]
    masks_out = rank_masks(round_masks(big_rks, rmax, (2,) * d), rmax,
                           dtype=jnp.float32)

    @jax.jit
    def mv_round(us):
        with jax.default_matmul_precision("highest"):
            big = matvec_padded(rhs_stack, us)
            return tt_round_scan(big, masks_big, rmax, masks_out,
                                 method="gram")

    res["mv_round_ms"] = chained_ms(mv_round, u)
    print(json.dumps(res), flush=True)

    # component: 2 ALS half-sweeps only (cg_fused, highest)
    A_stack, b_stack, x_stack, masks = __graft_entry__._heat_problem(
        d=d, rmax=rmax, dtype=jnp.float32)

    @jax.jit
    def als_only(xs):
        with jax.default_matmul_precision("highest"):
            return als_sweeps(A_stack, b_stack, xs, masks, 2,
                              solver="cg_fused")

    res["als_only_ms"] = chained_ms(als_only, x_stack)
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
