"""dp-scaling measurement on the virtual 8-device CPU mesh.

Measures batched scan-ALS throughput (solves/s) with the batch axis sharded
over dp = 1, 2, 4, 8 devices, correctness-checked against the dp=1 result,
and reports the scaling efficiency solves/s(dp)/ (dp * solves/s(1)).

This is the measurable proxy for BASELINE's >=0.8 multi-host target: only
one physical TPU chip is reachable, so true multi-chip numbers don't exist;
the virtual mesh exercises the real sharded program (XLA inserts the same
collectives) but all 8 virtual devices share 2 host cores, so the CPU
efficiency figure is a lower bound on mechanism, not an ICI measurement.
bench.py complements this with batch-size throughput scaling on the real
chip (perfectly batched work = the dp-parallel workload on one device).

Prints ONE JSON line; run standalone or via bench.py's subprocess hook.
"""

import json
import os
import time

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def main():
    import __graft_entry__
    from ttnx.parallel.batch import batched_als_sweeps, make_mesh
    from jax.sharding import NamedSharding, PartitionSpec as P

    A_stack, b_stack, x_stack, masks = __graft_entry__._heat_problem(
        d=8, rmax=6, dtype=jnp.float32)
    batch = 32
    b_batch = jnp.broadcast_to(b_stack, (batch,) + b_stack.shape)
    x_batch = jnp.broadcast_to(x_stack, (batch,) + x_stack.shape)

    res = {"batch": batch}
    ref = None
    base = None
    for dp in (1, 2, 4, 8):
        mesh = make_mesh(dp=dp, tp=1, devices=jax.devices()[:dp])
        bs = jax.device_put(b_batch, NamedSharding(mesh, P("dp")))
        xs = jax.device_put(x_batch, NamedSharding(mesh, P("dp")))
        fn = jax.jit(lambda bb, xb: batched_als_sweeps(
            A_stack, bb, xb, masks, 2))
        with mesh:
            out = fn(bs, xs)
            out.block_until_ready()
            t0 = time.perf_counter()
            iters = 3
            for _ in range(iters):
                fn(bs, xs).block_until_ready()
            dt = (time.perf_counter() - t0) / iters
        solves_per_s = batch / dt
        res[f"dp{dp}_solves_per_s"] = round(solves_per_s, 2)
        out_np = np.asarray(out)
        if ref is None:
            ref = out_np
            base = solves_per_s
        else:
            err = float(np.max(np.abs(out_np - ref)))
            res[f"dp{dp}_max_dev_vs_dp1"] = err
            if err > 1e-5:
                res[f"dp{dp}_correct"] = False
            res[f"dp{dp}_efficiency"] = round(solves_per_s / (dp * base), 3)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
