"""Probe: fused Pallas CG local solve on the real TPU.

1. Standalone cg_solve_fused compile + parity check at the flagship shape.
2. d=12 CN step timing with solver='cg' (XLA CG loop) vs 'cg_fused'.

Run with nohup (first compiles take minutes over the tunnel)."""

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
    res = {}
    # 1. standalone kernel at the flagship shape M=512
    from ttnx.kernels.local_cg import cg_solve_fused

    M = 512
    rng = np.random.default_rng(0)
    A = rng.standard_normal((M, M)).astype(np.float32)
    K = jnp.asarray(A @ A.T / M + np.eye(M, dtype=np.float32))
    b = jnp.asarray(rng.standard_normal(M).astype(np.float32))
    t0 = time.perf_counter()
    try:
        x = cg_solve_fused(K, b, iters=48)
        xn = np.asarray(x)
        res["kernel_compile_s"] = round(time.perf_counter() - t0, 1)
        expect = np.linalg.solve(np.asarray(K), np.asarray(b))
        res["kernel_rel_err"] = float(
            np.linalg.norm(xn - expect) / np.linalg.norm(expect))
        res["kernel_us"] = round(_time_fn(
            lambda K, b: cg_solve_fused(K, b, iters=48), K, b,
            warmup=2, iters=20) * 1e6, 1)
    except Exception as e:  # noqa: BLE001
        res["kernel_error"] = str(e)[:300]
        print(json.dumps(res))
        return

    # 2. CN step before/after
    import ttnx
    from ttnx.solvers.round_scan import make_cn_step

    d, rmax = 12, 16
    h_grid = 1.0 / (2 ** d + 1)
    Aop = (-1.0 / h_grid ** 2) * ttnx.toeplitz_to_qtto(2.0, -1.0, -1.0, d)
    u0 = ttnx.qtt_sin(d, a=h_grid, b=1 - h_grid)
    for solver in ("cg", "cg_fused"):
        try:
            t0 = time.perf_counter()
            step_fn, pack, _ = make_cn_step(
                Aop, 1e-9, rmax=rmax, dims=(2,) * d,
                u_rks=(1,) + (rmax,) * (d - 1) + (1,), dtype=jnp.float32,
                sweep_count=2, solver=solver, round_method="gram")
            u_stack = pack(u0)
            out = step_fn(u_stack)
            _sync(out)
            res[f"cn_{solver}_compile_s"] = round(time.perf_counter() - t0, 1)
            res[f"cn_{solver}_ms"] = round(
                _time_fn(step_fn, u_stack, warmup=1, iters=5) * 1e3, 2)
            res[f"cn_{solver}_out0"] = float(np.asarray(out[0, 0, 0, :2])[0])
        except Exception as e:  # noqa: BLE001
            res[f"cn_{solver}_error"] = str(e)[:300]
    print(json.dumps(res))


if __name__ == "__main__":
    main()
