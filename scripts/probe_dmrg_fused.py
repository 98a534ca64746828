"""Probe: fused Pallas Lanczos in the DMRG eigsweep on the real chip.

Heisenberg XXX d=10 (BASELINE config 3 class), f32, rmax=16 -> M = 1024
local problems. Times one jitted dmrg_eig_sweep with eig_solver='lanczos'
(matrix-free XLA) vs 'lanczos_fused' (VMEM kernel), chained 8 sweeps, one
sync; checks the energies agree.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def _sync(x):
    return float(np.asarray(x).reshape(-1)[:2].sum())


def main():
    import ttnx
    from ttnx.solvers.als_scan import pack_op, pack_tt, rank_masks
    from ttnx.solvers.dmrg_scan import dmrg_eig_sweep

    res = {}
    d, rmax = 10, 16
    H = ttnx.heisenberg_xyz_tto(d, jx=1.0, jy=1.0, jz=1.0).astype(jnp.float32)
    x0 = ttnx.rand_tt(jax.random.PRNGKey(3), (2,) * d, rmax=4,
                      normalise=True, orthogonal=True).astype(jnp.float32)
    A_stack = pack_op(H, max(H.ranks))
    x_stack = pack_tt(x0, rmax)
    masks = rank_masks(x0.ranks, rmax, dtype=jnp.float32)
    tol = jnp.float32(1e-8)
    dtol = jnp.float32(1e-8)

    for solver in ("lanczos", "lanczos_fused"):
        t0 = time.perf_counter()
        x, m, lam = dmrg_eig_sweep(A_stack, x_stack, masks, tol, dtol,
                                   lanczos_iters=24, eig_solver=solver,
                                   split="gram")
        _sync(lam)
        res[f"{solver}_compile_s"] = round(time.perf_counter() - t0, 1)
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            xs, ms = x_stack, masks
            for _ in range(8):
                xs, ms, lam = dmrg_eig_sweep(A_stack, xs, ms, tol, dtol,
                                             lanczos_iters=24,
                                             eig_solver=solver,
                                             split="gram")
            _sync(lam)
            dtm = time.perf_counter() - t0
            best = dtm if best is None else min(best, dtm)
        res[f"{solver}_sweep_ms"] = round(best / 8 * 1e3, 2)
        res[f"{solver}_E"] = round(float(np.asarray(lam)[-1]), 6)
        print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
