"""Probe: flagship CN step at reduced sweep counts / cg iters.

The round-3 breakdown (probe_cn_breakdown2) shows the ALS sweeps dominate
the step (5.8 of 6.0 ms) and the residual sits at its f32 floor (8.7e-5)
from 24 CG iterations up. Question: does sweep_count=1 (forward half-sweep
only) hold the floor? Checked over a 64-step trajectory, not just one step,
so warm-start drift would show.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def _sync(out):
    return float(jnp.sum(jnp.abs(np.asarray(out).reshape(-1)[:4])))


def main():
    import ttnx
    from ttnx.core.decomp import ttv_to_tensor
    from ttnx.solvers.round_scan import make_cn_step

    res = {}
    d = 12
    h_grid = 1.0 / (2 ** d + 1)
    lam1 = (2 - 2 * np.cos(np.pi / (2 ** d + 1))) / h_grid ** 2
    Aop = (-1.0 / h_grid ** 2) * ttnx.toeplitz_to_qtto(2.0, -1.0, -1.0, d)
    u0 = ttnx.qtt_sin(d, a=h_grid, b=1 - h_grid)
    h = 1e-9
    n_traj = 64
    ref = np.asarray(ttv_to_tensor(u0)).reshape(-1) * np.exp(
        -lam1 * h * n_traj)

    for sweeps, iters in ((2, 48), (2, 32), (1, 48), (1, 32), (1, 24)):
        sf, pack, unpack = make_cn_step(
            Aop, h, 16, dims=(2,) * d, u_rks=(1,) + (16,) * (d - 1) + (1,),
            dtype=jnp.float32, sweep_count=sweeps, solver="cg_fused",
            round_method="gram_chain", precision="highest", cg_iters=iters)
        u = pack(u0)
        out = sf(u)
        _sync(out)
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            v = u
            for _ in range(16):
                v = sf(v)
            _sync(v)
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        # 64-step trajectory accuracy
        v = u
        for _ in range(n_traj):
            v = sf(v)
        got = np.asarray(ttv_to_tensor(unpack(np.asarray(v)))).reshape(-1)
        rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
        res[f"s{sweeps}_cg{iters}_ms"] = round(best / 16 * 1e3, 3)
        res[f"s{sweeps}_cg{iters}_traj64_rel"] = "%.2e" % rel
        print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
