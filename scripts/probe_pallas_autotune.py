"""Autotune sweep for the headline merge_resplit_chain: block_b x unroll.

Round-2 found block_b=32/unroll=4 best (81 TF/s) and block_b=64 VMEM-
rejected. Round-3 re-sweep including unroll=8/16 and block_b=16/48 to
claw at the remaining ~4% vs the measured K=64 ceiling."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def _sync(x):
    # pull a FEW elements only: np.asarray(full) ships the 33 MB output
    # over the RPC tunnel and dominates the timing (the first run of this
    # probe measured transfer, not compute — logged 9-15 TF for configs
    # bench measures at 81 TF). Also: block_b=48 SIGABRTs the remote
    # Mosaic compile like block_b=64 (VMEM).
    return float(jnp.sum(jnp.abs(x[0, 0, :2])))


def main():
    from ttnx.kernels.contraction import merge_resplit_chain

    r, n, batch, iters = 64, 2, 4096, 2048
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((batch, r * n, r)) * 0.1,
                    dtype=jnp.bfloat16)
    b_host = np.linalg.qr(rng.standard_normal((batch, n * r, r)))[0]
    b = jnp.asarray(np.swapaxes(b_host, 1, 2), dtype=jnp.bfloat16)
    w = jnp.asarray(np.linalg.qr(rng.standard_normal((batch, n * r, r)))[0],
                    dtype=jnp.bfloat16)
    flops = 2 * (2.0 * batch * (r * n) * r * (n * r)) * iters
    res = {}
    for block_b in (4, 8):
        for unroll in (64, 128, 256):
            key = f"b{block_b}_u{unroll}"
            try:
                fn = lambda: merge_resplit_chain(a, b, w, iters=iters,
                                                 block_b=block_b,
                                                 unroll=unroll)
                _sync(fn())
                best = None
                for _ in range(2):
                    t0 = time.perf_counter()
                    _sync(fn())
                    dt = time.perf_counter() - t0
                    best = dt if best is None else min(best, dt)
                res[key] = round(flops / best / 1e9, 1)
            except Exception as e:
                res[key] = f"err: {str(e)[:80]}"
            print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
