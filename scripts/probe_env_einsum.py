"""Probe 6 (round 4): why do the batched env-update einsums run at
~10-30 GF/s when the CG apply einsum reaches 2.3 TF/s in the same program?

Sections (B=64, R=64, RA=4, n=2, f32 highest, chained one sync):
  env_fori      — the 4-term env einsum iterated in a fori_loop
  env_scan_out  — in a lax.scan emitting stacked outputs (production form)
  env_scan_carry— same scan, carry only (isolates output stacking)
  env_manual_*  — hand-decomposed dot_general chain instead of einsum
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


def timeit(fn, *args, reps=3):
    out = fn(*args)
    _sync(out)
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        _sync(out)
        best = min(best or 9e9, time.perf_counter() - t0)
    return best


B, R, RA, n, d = 64, 64, 4, 2, 12
FLOPS_ENV = None


def env_einsum(xc, Ac, Renv):
    return jnp.einsum("Baip,Wijw,Bbjq,Bpwq->BaWb", jnp.conj(xc), Ac, xc,
                      Renv, optimize=True)


def env_manual(xc, Ac, Renv):
    # t1[B,b,j,p,w] = sum_q x[B,b,j,q] Renv[B,p,w,q]
    t1 = lax.dot_general(xc, Renv, (((3,), (3,)), ((0,), (0,))))
    # t2[B,b,p,W,i] = sum_{j,w} t1[B,b,j,p,w] Ac[W,i,j,w]
    t2 = lax.dot_general(t1, Ac, (((2, 4), (2, 3)), ((), ())))
    # out[B,b,W,a] = sum_{i,p} t2[B,b,p,W,i] conj(x)[B,a,i,p]
    out = lax.dot_general(t2, jnp.conj(xc), (((2, 4), (3, 2)), ((0,), (0,))))
    return jnp.transpose(out, (0, 3, 2, 1))  # (B,a,W,b)


def main():
    global FLOPS_ENV
    from ttnx.utils.flops import einsum_flops

    FLOPS_ENV = einsum_flops("aip,Wijw,bjq,pwq->aWb", (R, n, R),
                             (RA, n, n, RA), (R, n, R), (R, RA, R)) * B
    emit("start", backend=jax.default_backend(),
         gflop_per_env=round(FLOPS_ENV / 1e9, 3))
    rng = np.random.default_rng(0)
    xc = jnp.asarray(rng.standard_normal((B, R, n, R)) * 0.1, jnp.float32)
    Ac = jnp.asarray(rng.standard_normal((RA, n, n, RA)) * 0.3, jnp.float32)
    Renv = jnp.asarray(rng.standard_normal((B, R, RA, R)) * 0.05,
                       jnp.float32)
    xs = jnp.asarray(rng.standard_normal((d, B, R, n, R)) * 0.1, jnp.float32)

    # parity first
    ref = env_einsum(xc, Ac, Renv)
    man = env_manual(xc, Ac, Renv)
    emit("parity", max_diff=float(jnp.max(jnp.abs(ref - man))))

    iters = 50
    for name, fn in (("einsum", env_einsum), ("manual", env_manual)):
        @jax.jit
        def fori(xc, Renv, fn=fn):
            with jax.default_matmul_precision("highest"):
                def body(_, acc):
                    return fn(xc, Ac, acc) * 0.1
                return lax.fori_loop(0, iters, body, Renv)

        try:
            dt = timeit(fori, xc, Renv)
            emit(f"env_fori_{name}", ms=round(dt * 1e3, 2),
                 gflops=round(FLOPS_ENV * iters / dt / 1e9, 1))
        except Exception as e:
            emit(f"env_fori_{name}", error=str(e)[:200])

        @jax.jit
        def scan_out(xs, Renv, fn=fn):
            with jax.default_matmul_precision("highest"):
                def step(acc, xi):
                    new = fn(xi, Ac, acc) * 0.1
                    return new, new
                _, outs = lax.scan(step, Renv, xs, reverse=True)
                return outs

        try:
            dt = timeit(scan_out, xs, Renv)
            emit(f"env_scan_out_{name}", ms=round(dt * 1e3, 2),
                 gflops=round(FLOPS_ENV * d / dt / 1e9, 1))
        except Exception as e:
            emit(f"env_scan_out_{name}", error=str(e)[:200])

        @jax.jit
        def scan_carry(xs, Renv, fn=fn):
            with jax.default_matmul_precision("highest"):
                def step(acc, xi):
                    return fn(xi, Ac, acc) * 0.1, None
                out, _ = lax.scan(step, Renv, xs, reverse=True)
                return out

        try:
            dt = timeit(scan_carry, xs, Renv)
            emit(f"env_scan_carry_{name}", ms=round(dt * 1e3, 2),
                 gflops=round(FLOPS_ENV * d / dt / 1e9, 1))
        except Exception as e:
            emit(f"env_scan_carry_{name}", error=str(e)[:200])
    emit("done")


if __name__ == "__main__":
    main()
