"""Probe Mosaic support for in-kernel reductions (needed for fused CG/
Lanczos local solves). Round-1 note says a rank-reducing scalar reduction
caused HTTP 500s; test keepdims forms and a CG-iteration skeleton.

  r1_keepdims_sum   — y = sum(x*x, axis=(1,2), keepdims=True) * x
  r2_cg_skeleton    — 8 CG-style iterations with keepdims alpha/beta
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def probe(name, fn, *args):
    t0 = time.perf_counter()
    try:
        out = jax.jit(fn)(*args)
        val = float(jnp.sum(jnp.abs(out)))
        print(json.dumps({"stage": name, "ok": True, "sum": round(val, 3),
                          "s": round(time.perf_counter() - t0, 1)}),
              flush=True)
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"stage": name, "ok": False,
                          "s": round(time.perf_counter() - t0, 1),
                          "error": str(e)[:200]}), flush=True)


def k_reduce(x_ref, o_ref):
    x = x_ref[:]
    s = jnp.sum(x * x, axis=(1, 2), keepdims=True)  # (Bt, 1, 1)
    o_ref[:] = s * x


def k_cg(k_ref, b_ref, o_ref):
    # batched dense-K CG: K (Bt, m, m), b (Bt, m, 1); 8 iterations
    K = k_ref[:]
    b = b_ref[:]
    x = jnp.zeros_like(b)
    r = b
    p = r
    rs = jnp.sum(r * r, axis=1, keepdims=True)          # (Bt, 1, 1)

    def body(_, st):
        x, r, p, rs = st
        Kp = jax.lax.dot_general(K, p, (((2,), (1,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32)
        alpha = rs / (jnp.sum(p * Kp, axis=1, keepdims=True) + 1e-30)
        x = x + alpha * p
        r = r - alpha * Kp
        rs_new = jnp.sum(r * r, axis=1, keepdims=True)
        p = r + (rs_new / (rs + 1e-30)) * p
        return x, r, p, rs_new

    x, r, p, rs = jax.lax.fori_loop(0, 8, body, (x, r, p, rs))
    o_ref[:] = x


def main():
    rng = np.random.default_rng(0)
    B, m = 256, 128
    x = jnp.asarray(rng.standard_normal((B, 128, 64)) * 0.1, jnp.float32)

    fn1 = pl.pallas_call(
        k_reduce, grid=(B // 32,),
        in_specs=[pl.BlockSpec((32, 128, 64), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((32, 128, 64), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 128, 64), jnp.float32))
    probe("r1_keepdims_sum", fn1, x)

    Kd = rng.standard_normal((B, m, m)) * 0.1
    Kd = Kd @ np.swapaxes(Kd, 1, 2) + 3 * np.eye(m)
    Kj = jnp.asarray(Kd, jnp.float32)
    bj = jnp.asarray(rng.standard_normal((B, m, 1)), jnp.float32)
    fn2 = pl.pallas_call(
        k_cg, grid=(B // 8,),
        in_specs=[pl.BlockSpec((8, m, m), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((8, m, 1), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8, m, 1), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, m, 1), jnp.float32))
    probe("r2_cg_skeleton", fn2, Kj, bj)
    # CPU-interpret parity for r2
    ref = np.stack([np.linalg.solve(Kd[i], np.asarray(bj)[i]) for i in range(4)])
    got = np.asarray(jax.jit(fn2)(Kj, bj))[:4]
    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    print(json.dumps({"stage": "r2_accuracy_vs_lu", "rel": float(rel)}),
          flush=True)


if __name__ == "__main__":
    main()
