"""Probe: compile + time the flagship d=12 CN step (__graft_entry__.entry)
on the real TPU, with the transpose-folding workaround active via XLA_FLAGS.

Run:  XLA_FLAGS=--xla_disable_hlo_passes=transpose-folding \
        nohup python scripts/probe_entry_tpu.py > /tmp/probe_entry.log 2>&1 &

Prints one JSON line per stage.
"""

import json
import os
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


def stage(name, fn, *args, iters=5):
    t0 = time.perf_counter()
    try:
        out = fn(*args)
        sync(out)
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
            sync(out)
        run_ms = (time.perf_counter() - t0) / iters * 1e3
        print(json.dumps({"stage": name, "ok": True,
                          "compile_s": round(compile_s, 1),
                          "run_ms": round(run_ms, 3)}), flush=True)
        return out
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"stage": name, "ok": False,
                          "s": round(time.perf_counter() - t0, 1),
                          "error": str(e)[:300]}), flush=True)
        return None


def main():
    print(json.dumps({"xla_flags": os.environ.get("XLA_FLAGS", ""),
                      "devices": str(jax.devices())}), flush=True)
    import __graft_entry__

    fn, args = __graft_entry__.entry()
    out = stage("cn_step_d12", jax.jit(fn), *args, iters=5)
    if out is not None:
        # multi-step stability: run 20 steps, check finiteness
        u = args[0]
        jfn = jax.jit(fn)
        for _ in range(20):
            u = jfn(u)
        print(json.dumps({"stage": "cn_20steps",
                          "finite": bool(jnp.all(jnp.isfinite(u))),
                          "norm": float(jnp.linalg.norm(u))}), flush=True)

    # batched-solve throughput (BASELINE scaling proxy on one chip)
    from ttnx.parallel.batch import batched_als_sweeps

    A_stack, b_stack, x_stack, masks = __graft_entry__._heat_problem(
        d=10, rmax=8, dtype=jnp.float32)
    for batch in (64, 256):
        b_batch = jnp.broadcast_to(b_stack, (batch,) + b_stack.shape)
        x_batch = jnp.broadcast_to(x_stack, (batch,) + x_stack.shape)
        jf = jax.jit(lambda bb, xb: batched_als_sweeps(
            A_stack, bb, xb, masks, 2))
        t0 = time.perf_counter()
        try:
            out = jf(b_batch, x_batch)
            sync(out)
            compile_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            iters = 3
            for _ in range(iters):
                out = jf(b_batch, x_batch)
                sync(out)
            dt = (time.perf_counter() - t0) / iters
            print(json.dumps({"stage": f"batched_solves_b{batch}", "ok": True,
                              "compile_s": round(compile_s, 1),
                              "solves_per_s": round(batch / dt, 2)}),
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"stage": f"batched_solves_b{batch}",
                              "ok": False, "error": str(e)[:300]}),
                  flush=True)


if __name__ == "__main__":
    main()
