"""Probe which (block_b, iters) configs of merge_resplit_chain the remote
Mosaic compiler accepts, and time the ones that compile.

Each config runs in a fresh subprocess: a compile-service HTTP 500 or SIGABRT
must not poison the remaining configs. Results stream as JSON lines to
stdout (redirect to a log and poll).

Usage: nohup python scripts/probe_pallas.py > /tmp/probe_pallas.log 2>&1 &
"""

import json
import subprocess
import sys
import time

CHILD = r"""
import json, sys, time
block_b, iters = int(sys.argv[1]), int(sys.argv[2])
import numpy as np
import jax, jax.numpy as jnp
from ttnx.kernels.contraction import merge_resplit_chain

r, n, batch = 64, 2, 4096
rng = np.random.default_rng(0)
a = jnp.asarray(rng.standard_normal((batch, r * n, r)) * 0.1, dtype=jnp.bfloat16)
b_host = np.linalg.qr(rng.standard_normal((batch, n * r, r)))[0]
b = jnp.asarray(np.swapaxes(b_host, 1, 2), dtype=jnp.bfloat16)
w = jnp.asarray(np.linalg.qr(rng.standard_normal((batch, n * r, r)))[0],
                dtype=jnp.bfloat16)

def sync(x):
    return float(jnp.sum(jnp.abs(x[0][:1])))

t0 = time.perf_counter()
out = merge_resplit_chain(a, b, w, iters=iters, block_b=block_b)
sync(out)
compile_s = time.perf_counter() - t0
# timed reruns
best = 1e9
for _ in range(3):
    t0 = time.perf_counter()
    out = merge_resplit_chain(a, b, w, iters=iters, block_b=block_b)
    sync(out)
    best = min(best, time.perf_counter() - t0)
flops = 2 * (2.0 * batch * (r * n) * r * (n * r)) * iters
print(json.dumps({"block_b": block_b, "iters": iters, "ok": True,
                  "compile_s": round(compile_s, 1),
                  "gflops": round(flops / best / 1e9, 1),
                  "time_s": round(best, 4)}))
"""

CONFIGS = [(32, 8), (32, 32), (8, 128), (32, 128), (64, 128), (128, 128)]


def main():
    for block_b, iters in CONFIGS:
        t0 = time.time()
        try:
            proc = subprocess.run(
                [sys.executable, "-c", CHILD, str(block_b), str(iters)],
                capture_output=True, text=True, timeout=1500)
            if proc.returncode == 0 and proc.stdout.strip():
                print(proc.stdout.strip(), flush=True)
            else:
                print(json.dumps({
                    "block_b": block_b, "iters": iters, "ok": False,
                    "rc": proc.returncode,
                    "err": (proc.stderr or "")[-400:]}), flush=True)
        except subprocess.TimeoutExpired:
            print(json.dumps({"block_b": block_b, "iters": iters,
                              "ok": False, "err": "timeout 1500s"}),
                  flush=True)
        print(json.dumps({"elapsed_s": round(time.time() - t0, 1)}),
              flush=True)
    print(json.dumps({"done": True}), flush=True)


if __name__ == "__main__":
    main()
