"""Probe the unrolled Pallas chain kernel on the real TPU.

Mosaic rejects bf16 matmul accumulators ("Expected matmul acc to be 32-bit"),
so there is no bf16-accumulate axis to sweep — only block size and unroll.

One process = one remote-compile session. Each config wrapped in try/except
so a Mosaic rejection doesn't kill the sweep. Prints one JSON line per config.
"""

import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")


def _sync(out):
    return float(jnp.sum(jnp.abs(out[0, :1, :1])))


def main():
    from ttnx.kernels.contraction import merge_resplit_chain

    r, n, batch = 64, 2, 4096
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((batch, r * n, r)) * 0.1,
                    dtype=jnp.bfloat16)
    b_host = np.linalg.qr(rng.standard_normal((batch, n * r, r)))[0]
    b = jnp.asarray(np.swapaxes(b_host, 1, 2), dtype=jnp.bfloat16)
    w = jnp.asarray(np.linalg.qr(rng.standard_normal((batch, n * r, r)))[0],
                    dtype=jnp.bfloat16)

    iters = 128
    # (block_b, unroll)
    configs = [
        (32, 1),   # baseline (35.4 TFLOP/s measured previously)
        (32, 4),
        (32, 8),
        (16, 8),
        (32, 16),
    ]
    for block_b, unroll in configs:
        t_start = time.perf_counter()
        try:
            fn = lambda: merge_resplit_chain(
                a, b, w, iters=iters, block_b=block_b, unroll=unroll)
            _sync(fn())
            compile_s = time.perf_counter() - t_start
            reps = 4
            t0 = time.perf_counter()
            for _ in range(reps):
                _sync(fn())
            dt = (time.perf_counter() - t0) / reps
            flops = 2 * (2.0 * batch * (r * n) * r * (n * r)) * iters
            print(json.dumps({
                "block_b": block_b, "unroll": unroll,
                "gflops": round(flops / dt / 1e9, 1),
                "dt_ms": round(dt * 1e3, 3),
                "compile_s": round(compile_s, 1)}), flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"block_b": block_b, "unroll": unroll,
                              "error": str(e)[:300]}), flush=True)


if __name__ == "__main__":
    main()
