"""Round-5 probe: TDVP step cost structure on the chip.

tdvp1_step at krylov_dim 4/10/20 — the iters-linear share is the Lanczos
matvecs+reorth, the intercept is QRs + small eighs + env updates +
scheduling. Also times a 16-step lax.scan-fused trajectory (one dispatch)
vs the 16-dispatch chain, since host-sensitivity of the chained form is a
VERDICT weak item (r4 #5).
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
    import bench as bench_mod
    import ttnx
    from ttnx.solvers.als_scan import pack_op, pack_tt, rank_masks
    from ttnx.solvers.tdvp_scan import tdvp1_step

    d, rmax = 10, 8
    hg = 1.0 / (2 ** d + 1)
    A = ((0.1 / hg ** 2) * ttnx.toeplitz_to_qtto(-2.0, 1.0, 1.0, d)
         ).astype(jnp.float32)
    u0 = ttnx.qtt_sin(d, a=hg, b=1 - hg)
    A_stack = pack_op(A, max(A.ranks))
    x_stack = pack_tt(bench_mod._host_orth0(u0), rmax)
    masks = rank_masks(ttnx.core.tt.r_and_d_to_rks(
        u0.ranks, (2,) * d, rmax=rmax), rmax, dtype=jnp.float32)
    h = jnp.float32(1e-5)

    for kd in (20, 10, 4):
        def step(xs, kd=kd):
            with jax.default_matmul_precision("highest"):
                return tdvp1_step(A_stack, xs, masks, h, krylov_dim=kd,
                                  imag_real=True)

        t0 = time.perf_counter()
        out = step(x_stack)
        _sync(out)
        compile_s = time.perf_counter() - t0
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            v = x_stack
            for _ in range(16):
                v = step(v)
            _sync(v)
            best = min(best or 9e9, time.perf_counter() - t0)
        emit(f"tdvp1_kd{kd}", ms=round(best / 16 * 1e3, 3),
             compile_s=round(compile_s, 1))

    # one-dispatch 16-step trajectory (scan-fused)
    @jax.jit
    def traj(xs):
        with jax.default_matmul_precision("highest"):
            def body(x, _):
                return tdvp1_step(A_stack, x, masks, h, krylov_dim=20,
                                  imag_real=True), 0.0
            out, _ = jax.lax.scan(body, xs, None, length=16)
            return out

    t0 = time.perf_counter()
    out = traj(x_stack)
    _sync(out)
    compile_s = time.perf_counter() - t0
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        _sync(traj(x_stack))
        best = min(best or 9e9, time.perf_counter() - t0)
    emit("tdvp1_scan16", ms=round(best / 16 * 1e3, 3),
         compile_s=round(compile_s, 1))
    emit("done")


if __name__ == "__main__":
    main()
