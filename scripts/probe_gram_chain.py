"""Probe: gram_chain rounding on the real TPU.

(a) compile + parity of the gram_chain_fused Pallas kernel on the flagship
    applied-chain shape (d=12, R=64) vs the XLA scan;
(b) flagship CN step with round_method='gram_chain' vs 'gram' — chained
    16-step timing (one sync) + f64 host residual check.
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
    from ttnx.kernels.gram import gram_chain_fused
    from ttnx.solvers.als_scan import pack_op, pack_tt
    from ttnx.solvers.round_scan import (_gram_chain_xla, make_cn_step,
                                         matvec_padded)

    res = {"backend": jax.default_backend()}

    # (a) kernel compile + parity on the flagship shape
    d, rmax = 12, 16
    h_grid = 1.0 / (2 ** d + 1)
    Aop = (-1.0 / h_grid ** 2) * ttnx.toeplitz_to_qtto(2.0, -1.0, -1.0, d)
    from ttnx.core.algebra import add_op, scale_op
    from ttnx.core.tt import id_tto
    rhs = add_op(id_tto(d), scale_op(0.5e-9, Aop)).astype(jnp.float32)
    u0 = ttnx.qtt_sin(d, a=h_grid, b=1 - h_grid)
    big = matvec_padded(pack_op(rhs, max(rhs.ranks)),
                        pack_tt(u0.astype(jnp.float32), rmax))
    print("big chain shape:", big.shape, flush=True)
    t0 = time.perf_counter()
    Gk = gram_chain_fused(big)
    _sync(Gk)
    res["kernel_compile_s"] = round(time.perf_counter() - t0, 1)
    Gx = jax.jit(_gram_chain_xla)(big)
    err = float(jnp.max(jnp.abs(Gk - Gx)) / (jnp.max(jnp.abs(Gx)) + 1e-30))
    res["kernel_vs_xla_relmax"] = f"{err:.3e}"
    print(json.dumps(res), flush=True)

    # (b) flagship CN step: gram vs gram_chain
    u64 = None
    for method in ("gram", "gram_chain"):
        kwargs = dict(dims=(2,) * d, u_rks=(1,) + (rmax,) * (d - 1) + (1,),
                      dtype=jnp.float32, sweep_count=2, solver="cg_fused",
                      round_method=method, precision="highest")
        t0 = time.perf_counter()
        step_fn, pack, unpack = make_cn_step(Aop, 1e-9, rmax, **kwargs)
        u = pack(u0)
        out = step_fn(u)
        _sync(out)
        res[f"{method}_compile_s"] = round(time.perf_counter() - t0, 1)
        n = 16
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            v = u
            for _ in range(n):
                v = step_fn(v)
            _sync(v)
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        res[f"{method}_per_step_ms"] = round(best / n * 1e3, 3)
        # accuracy: one step vs analytic eigenmode decay (f64 on host)
        lam1 = (2 - 2 * np.cos(np.pi / (2 ** d + 1))) / h_grid ** 2
        from ttnx.core.decomp import ttv_to_tensor
        got = np.asarray(ttv_to_tensor(unpack(np.asarray(out)))).reshape(-1)
        expect = (np.asarray(ttv_to_tensor(u0)).reshape(-1)
                  * np.exp(-lam1 * 1e-9))
        res[f"{method}_step_rel_err"] = "%.3e" % (
            np.linalg.norm(got - expect) / np.linalg.norm(expect))
        print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
