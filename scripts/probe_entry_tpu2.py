"""Probe 2: forward --xla_disable_hlo_passes to the remote TPU compiler via
the AOT compiler_options proto (env XLA_FLAGS is client-local and does NOT
reach the compile service — measured 2026-08-20, probe_entry_tpu.py).

Run: nohup python scripts/probe_entry_tpu2.py > /tmp/probe_entry2.log 2>&1 &
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp


def sync(out):
    leaves = jax.tree_util.tree_leaves(out)
    acc = 0.0
    for leaf in leaves:
        acc += float(jnp.sum(jnp.abs(leaf[(0,) * (leaf.ndim - 1)][:1])))
    return acc


def main():
    import __graft_entry__

    fn, args = __graft_entry__.entry()
    for passes in ("transpose-folding",
                   "transpose-folding,algsimp"):
        t0 = time.perf_counter()
        try:
            compiled = jax.jit(fn).lower(*args).compile(
                compiler_options={"xla_disable_hlo_passes": passes})
            out = compiled(*args)
            sync(out)
            compile_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            iters = 5
            for _ in range(iters):
                out = compiled(*args)
                sync(out)
            run_ms = (time.perf_counter() - t0) / iters * 1e3
            print(json.dumps({"passes": passes, "ok": True,
                              "compile_s": round(compile_s, 1),
                              "run_ms": round(run_ms, 3)}), flush=True)
            break
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"passes": passes, "ok": False,
                              "s": round(time.perf_counter() - t0, 1),
                              "error": str(e)[:300]}), flush=True)


if __name__ == "__main__":
    main()
