"""Probe one Pallas chain-kernel config on the real TPU.

Usage: python scripts/probe_pallas_one.py BLOCK_B ITERS [BATCH]
Prints one JSON line {"block_b":..,"iters":..,"batch":..,"gflops":..} or
{"error": ...}. Run under `timeout` — remote compiles can take minutes.
"""

import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def _sync(out):
    return float(jnp.sum(jnp.abs(out[0, :1, :1])))


def main():
    block_b = int(sys.argv[1])
    iters = int(sys.argv[2])
    batch = int(sys.argv[3]) if len(sys.argv) > 3 else 4096

    from ttnx.kernels.contraction import merge_resplit_chain

    r, n = 64, 2
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((batch, r * n, r)) * 0.1,
                    dtype=jnp.bfloat16)
    b_host = np.linalg.qr(rng.standard_normal((batch, n * r, r)))[0]
    b = jnp.asarray(np.swapaxes(b_host, 1, 2), dtype=jnp.bfloat16)
    w = jnp.asarray(np.linalg.qr(rng.standard_normal((batch, n * r, r)))[0],
                    dtype=jnp.bfloat16)

    try:
        out = merge_resplit_chain(a, b, w, iters=iters, block_b=block_b)
        _sync(out)
        # timed runs
        t0 = time.perf_counter()
        reps = 4
        for _ in range(reps):
            out = merge_resplit_chain(a, b, w, iters=iters, block_b=block_b)
            _sync(out)
        dt = (time.perf_counter() - t0) / reps
        flops = 2 * (2.0 * batch * (r * n) * r * (n * r)) * iters
        print(json.dumps({"block_b": block_b, "iters": iters, "batch": batch,
                          "gflops": round(flops / dt / 1e9, 1),
                          "dt_ms": round(dt * 1e3, 3)}))
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"block_b": block_b, "iters": iters, "batch": batch,
                          "error": str(e)[:300]}))


if __name__ == "__main__":
    main()
