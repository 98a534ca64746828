"""Probe: tdvp2 device form (real f32 imaginary time + eigh split) on the
real chip — d=10 heat generator, rmax=8, chained 8 steps, one sync, with an
f64 host accuracy check against the analytic eigenmode decay."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def _sync(x):
    return float(np.asarray(jax.tree_util.tree_leaves(x)[0]).reshape(-1)[0])


def main():
    import ttnx
    from ttnx.solvers.als_scan import pack_op, pack_tt, rank_masks
    from ttnx.solvers.tdvp_scan import tdvp2_step

    res = {}
    d, rmax = 10, 8
    hg = 1.0 / (2 ** d + 1)
    lam1 = 0.1 * (2 - 2 * np.cos(np.pi / (2 ** d + 1))) / hg ** 2
    A = ((0.1 / hg ** 2) * ttnx.toeplitz_to_qtto(-2.0, 1.0, 1.0, d)
         ).astype(jnp.float32)
    u0 = ttnx.qtt_sin(d, a=hg, b=1 - hg)
    A_stack = pack_op(A, max(A.ranks))
    x_stack = pack_tt(u0.astype(jnp.float32), rmax)
    mask_np = np.zeros((d + 1, rmax), np.float32)
    for i, r in enumerate(u0.ranks):
        mask_np[i, :r] = 1.0
    masks = jnp.asarray(mask_np)
    h = jnp.float32(1e-5)
    te = jnp.float32(0.0)
    mk = jnp.int32(rmax)

    def step(xs, ms):
        with jax.default_matmul_precision("highest"):
            return tdvp2_step(A_stack, xs, ms, h, te, mk, imag_real=True,
                              split="gram")

    t0 = time.perf_counter()
    xs, ms = step(x_stack, masks)
    _sync(xs)
    res["compile_s"] = round(time.perf_counter() - t0, 1)
    n = 8
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        xs, ms = x_stack, masks
        for _ in range(n):
            xs, ms = step(xs, ms)
        _sync(xs)
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    res["tdvp2_step_ms"] = round(best / n * 1e3, 3)
    # accuracy of the 8-step evolution (f64 on host)
    from ttnx.core.decomp import ttv_to_tensor
    from ttnx.solvers.als_scan import unpack_tt

    rks = tuple(int(v) for v in np.asarray(ms).sum(axis=1))
    got = np.asarray(ttv_to_tensor(unpack_tt(np.asarray(xs), rks))
                     ).reshape(-1)
    expect = np.asarray(ttv_to_tensor(u0)).reshape(-1) * np.exp(
        -lam1 * 8e-5)
    res["rel_err_8steps"] = "%.2e" % (
        np.linalg.norm(got - expect) / np.linalg.norm(expect))
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
