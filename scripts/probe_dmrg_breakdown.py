"""Round-5 probe: where does the 10.4 ms DMRG sweep go?

Times the d=10 rmax=16 jitted eigsweep at lanczos_iters 2/8/24 (the
iters-linear part is the Lanczos matvecs+reorth; the intercept is envs +
tridiag eighs + gram splits + scheduling), plus the dense-K fused-Lanczos
variant for reference.
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
    leaves = jax.tree_util.tree_leaves(x)
    return float(np.asarray(leaves[0]).reshape(-1)[0])


def emit(name, **kv):
    print(json.dumps({"section": name, **kv}), flush=True)


def main():
    emit("start", backend=jax.default_backend())
    import ttnx
    from ttnx.solvers.als_scan import pack_op, pack_tt, rank_masks
    from ttnx.solvers.dmrg_scan import dmrg_eig_sweep

    d, rmax = 10, 16
    H = ttnx.heisenberg_xyz_tto(d, jx=1.0, jy=1.0, jz=1.0
                                ).astype(jnp.float32)
    x0 = ttnx.rand_tt(jax.random.PRNGKey(3), (2,) * d, rmax=4,
                      normalise=True, orthogonal=True).astype(jnp.float32)
    A_stack = pack_op(H, max(H.ranks))
    x_stack = pack_tt(x0, rmax)
    masks = rank_masks(x0.ranks, rmax, dtype=jnp.float32)
    tol = jnp.float32(1e-8)

    for li, solver in ((24, "lanczos"), (8, "lanczos"), (2, "lanczos"),
                       (24, "lanczos_fused")):
        try:
            def sweep(xs, ms, li=li, solver=solver):
                with jax.default_matmul_precision("highest"):
                    return dmrg_eig_sweep(A_stack, xs, ms, tol, tol,
                                          lanczos_iters=li,
                                          eig_solver=solver, split="gram")

            t0 = time.perf_counter()
            xs, ms, lam = sweep(x_stack, masks)
            _sync(lam)
            compile_s = time.perf_counter() - t0
            best = None
            for _ in range(3):
                t0 = time.perf_counter()
                xs, ms = x_stack, masks
                for _ in range(8):
                    xs, ms, lam = sweep(xs, ms)
                _sync(lam)
                best = min(best or 9e9, time.perf_counter() - t0)
            emit(f"sweep_li{li}_{solver}", ms=round(best / 8 * 1e3, 2),
                 compile_s=round(compile_s, 1),
                 E=round(float(np.asarray(lam)[-1]), 6))
        except Exception as e:
            emit(f"sweep_li{li}_{solver}", error=str(e)[:400])
    emit("done")


if __name__ == "__main__":
    main()
