"""Bisect which stage of the d=12 CN program crashes the remote TPU compiler.

Stages (all f32, rmax=16, d=12 — same shapes as __graft_entry__.entry):
  1. matvec_padded (MPO apply)             — pure einsums
  2. matvec + tt_round_scan                — adds QR/SVD scans
  3. als_sweeps solver='cg'                — adds the local-solve scan
  4. full cn_step                          — the flagship program
Each is jitted separately; the remote SIGABRT surfaces as a catchable
JaxRuntimeError (HTTP 500), so one process covers all stages.
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp


def probe(name, fn, *args):
    t0 = time.perf_counter()
    try:
        out = jax.jit(fn)(*args)
        val = float(jnp.sum(jnp.abs(out)))
        print(json.dumps({"stage": name, "ok": True, "sum": val,
                          "s": round(time.perf_counter() - t0, 1)}),
              flush=True)
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"stage": name, "ok": False,
                          "s": round(time.perf_counter() - t0, 1),
                          "error": str(e)[:200]}), flush=True)


def main():
    import ttnx
    from ttnx.solvers.round_scan import (
        cn_step, make_cn_step, matvec_padded, tt_round_scan)

    dtype = jnp.float32
    d, rmax = 12, 16
    n_grid = 2 ** d
    h_grid = 1.0 / (n_grid + 1)
    A = (1.0 / h_grid ** 2) * ttnx.toeplitz_to_qtto(2.0, -1.0, -1.0, d)
    step_fn, pack, _ = make_cn_step(
        A, 1e-9, rmax=rmax, dims=(2,) * d,
        u_rks=(1,) + (rmax,) * (d - 1) + (1,), dtype=dtype, sweep_count=2,
        solver="cg")
    u0 = ttnx.qtt_sin(d, a=h_grid, b=1 - h_grid)
    u = pack(u0)

    # rebuild the internal stacks/masks exactly as make_cn_step does
    from ttnx.core.algebra import add_op, scale_op
    from ttnx.core.tt import id_tto
    from ttnx.solvers.als_scan import als_sweeps, pack_op, rank_masks
    from ttnx.core.tt import r_and_d_to_rks
    import numpy as np

    h = 1e-9
    Ac = A.astype(dtype)
    eye = id_tto(d, dtype=dtype)
    lhs = add_op(eye, scale_op(-h / 2, Ac))
    rhs = add_op(eye, scale_op(h / 2, Ac))
    RA = max(rhs.ranks)
    lhs_stack = pack_op(lhs, max(lhs.ranks))
    rhs_stack = pack_op(rhs, RA)
    dims = (2,) * d
    u_rks = r_and_d_to_rks((1,) + (rmax,) * (d - 1) + (1,), dims, rmax=rmax)
    real_dt = jnp.zeros((), dtype).real.dtype
    masks_u = rank_masks(u_rks, rmax, dtype=real_dt)
    masks_A = np.zeros((d + 1, RA))
    for i, r in enumerate(rhs.ranks):
        masks_A[i, :r] = 1.0
    masks_u_np = np.asarray(masks_u)
    masks_big = jnp.asarray(np.stack(
        [np.outer(masks_A[i], masks_u_np[i]).reshape(-1)
         for i in range(d + 1)]), dtype=real_dt)
    from ttnx.solvers.round_scan import round_masks
    big_rks = [min(a * b, RA * rmax) for a, b in zip(rhs.ranks, u_rks)]
    out_rks = round_masks(big_rks, rmax, dims)
    masks_out = rank_masks(out_rks, rmax, dtype=real_dt)

    probe("1_matvec", lambda uu: matvec_padded(rhs_stack, uu), u)
    probe("2_matvec_round",
          lambda uu: tt_round_scan(matvec_padded(rhs_stack, uu), masks_big,
                                   rmax, masks_out), u)
    probe("3_als_cg",
          lambda uu: als_sweeps(lhs_stack, uu, uu, masks_u, 2, solver="cg"),
          u)
    probe("4_full_cn", step_fn, u)


if __name__ == "__main__":
    main()
