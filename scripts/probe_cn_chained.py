"""Probe: true per-step CN time via the fused-trajectory program.

Single-step timing on the axon tunnel sits on the ~25 ms RPC-sync floor;
make_cn_evolve runs n_steps inside one lax.fori_loop, so (t_total / n)
measures the device, not the tunnel. Also records the result accuracy vs
the f64 host reference after the full trajectory."""

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
    from ttnx.solvers.round_scan import make_cn_evolve

    res = {}
    d, rmax = 12, 16
    h_grid = 1.0 / (2 ** d + 1)
    Aop = (-1.0 / h_grid ** 2) * ttnx.toeplitz_to_qtto(2.0, -1.0, -1.0, d)
    u0 = ttnx.qtt_sin(d, a=h_grid, b=1 - h_grid)

    n_steps = 32
    for solver in ("cg_fused", "cg"):
        tag = f"evolve32_{solver}"
        try:
            t0 = time.perf_counter()
            evolve, pack, _ = make_cn_evolve(
                Aop, 1e-9, rmax=rmax, dims=(2,) * d,
                u_rks=(1,) + (rmax,) * (d - 1) + (1,), n_steps=n_steps,
                dtype=jnp.float32, sweep_count=2, solver=solver,
                round_method="gram", precision="highest")
            u = pack(u0)
            out = evolve(u)
            _sync(out)
            res[f"{tag}_compile_s"] = round(time.perf_counter() - t0, 1)
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                out = evolve(u)
                _sync(out)
                ts.append(time.perf_counter() - t0)
            dt = min(ts)
            res[f"{tag}_total_ms"] = round(dt * 1e3, 1)
            res[f"{tag}_per_step_ms"] = round(dt / n_steps * 1e3, 3)
        except Exception as e:  # noqa: BLE001
            res[f"{tag}_error"] = str(e)[:250]
        print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
