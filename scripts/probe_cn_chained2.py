"""Probe 2: amortize the RPC sync floor without a giant fused program.

(a) async-dispatch chain: u <- step(u) 16x with ONE host sync at the end —
    if the tunnel pipelines dispatches, per-step cost collapses;
(b) small fused trajectory (n_steps=4) — the 32-step compile appeared to
    hang the remote service for >60 min."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def _sync(out):
    return float(jnp.sum(jnp.abs(out[0, 0, 0, :2])))


def main():
    import ttnx
    from ttnx.solvers.round_scan import make_cn_evolve, make_cn_step

    res = {}
    d, rmax = 12, 16
    h_grid = 1.0 / (2 ** d + 1)
    Aop = (-1.0 / h_grid ** 2) * ttnx.toeplitz_to_qtto(2.0, -1.0, -1.0, d)
    u0 = ttnx.qtt_sin(d, a=h_grid, b=1 - h_grid)
    kwargs = dict(dims=(2,) * d, u_rks=(1,) + (rmax,) * (d - 1) + (1,),
                  dtype=jnp.float32, sweep_count=2, solver="cg_fused",
                  round_method="gram", precision="highest")

    # (a) async chain of single-step programs
    t0 = time.perf_counter()
    step_fn, pack, _ = make_cn_step(Aop, 1e-9, rmax, **kwargs)
    u = pack(u0)
    out = step_fn(u)
    _sync(out)
    res["step_compile_s"] = round(time.perf_counter() - t0, 1)
    n = 16
    for trial in range(3):
        t0 = time.perf_counter()
        v = u
        for _ in range(n):
            v = step_fn(v)
        _sync(v)
        dt = time.perf_counter() - t0
        res[f"chain{n}_trial{trial}_total_ms"] = round(dt * 1e3, 1)
    res[f"chain{n}_per_step_ms"] = round(
        min(res[f"chain{n}_trial{t}_total_ms"] for t in range(3)) / n, 3)
    print(json.dumps(res), flush=True)

    # (b) small fused trajectory
    try:
        t0 = time.perf_counter()
        evolve, pack2, _ = make_cn_evolve(Aop, 1e-9, rmax, n_steps=4,
                                          **kwargs)
        out = evolve(pack2(u0))
        _sync(out)
        res["evolve4_compile_s"] = round(time.perf_counter() - t0, 1)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = evolve(pack2(u0))
            _sync(out)
            ts.append(time.perf_counter() - t0)
        res["evolve4_per_step_ms"] = round(min(ts) / 4 * 1e3, 3)
    except Exception as e:  # noqa: BLE001
        res["evolve4_error"] = str(e)[:250]
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
