"""tp-sharded rounding: benefit bound + measured overhead (VERDICT r2 item 4).

Two halves:

1. ANALYTIC per-device FLOP balance of the tp-sharded gram rounding
   (ttnx.parallel.round_dist) — the matmul work shards 1/p but the per-site
   eigh of the (R, R) Gram is replicated, so Amdahl caps the speedup. The
   printed table gives, per rmax: matmul FLOPs, eigh FLOP-equivalents, the
   replicated fraction, and the ideal tp=p speedup bound.

2. MEASURED wall-clock of the tp-sharded CN step vs the replicated one on
   the virtual CPU mesh (8 devices on 2 host cores). Because every virtual
   device shares the same 2 cores, sharding CANNOT reduce wall-clock here —
   total FLOPs are fixed — so this measures pure collective/partition
   OVERHEAD; the benefit side is the analytic bound above.

Usage: XLA_FLAGS=--xla_force_host_platform_device_count=8 python
scripts/bench_tp_crossover.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp


EIGH_FLOP_EQUIV = 20.0  # effective flops-per-R^3 of a dense eigh vs matmul
                        # (tridiag reduction + implicit QL; conservative)


def flop_balance(d, RA, rmax, p):
    """Per-CN-step FLOP balance of the gram rounding at padded rank
    R = RA*rmax, n=2, tp=p (round_dist._round_kernel shapes)."""
    R = RA * rmax
    n = 2
    # right-orth sweep per site: transfer apply + Gram + basis apply
    mm_orth = (2 * R * R * n * R        # c = core @ T
               + 2 * R * n * R * R      # Gram cm cm^H
               + 2 * 2 * R * R * n * R)  # (V^T cm), (V s) @ proj
    eigh_orth = EIGH_FLOP_EQUIV * R ** 3
    # truncation sweep per site (R_out = rmax)
    k = rmax
    mm_tr = (2 * k * R * n * R          # c = T2 @ core
             + 2 * (k * n) ** 2 * R     # Gram
             + 2 * k * (k * n) * R)     # t = u^H cm
    eigh_tr = EIGH_FLOP_EQUIV * (k * n) ** 3
    mm = d * (mm_orth + mm_tr)
    eig = d * (eigh_orth + eigh_tr)
    total_rep = mm + eig                 # replicated execution
    per_dev_tp = mm / p + eig            # sharded matmuls, replicated eighs
    return {
        "R": R,
        "matmul_gflop": mm / 1e9,
        "eigh_gflop_equiv": eig / 1e9,
        "replicated_frac": eig / total_rep,
        f"ideal_speedup_tp{p}": total_rep / per_dev_tp,
    }


def flop_balance_gram_chain(d, RA, rmax, p):
    """Same accounting for the GRAM-CHAIN rounding
    (ttnx.parallel.round_dist.gram_chain_round_dist): the backward Gram
    sweep and the truncation half-products are pure sharded matmuls; the
    only replicated factorization is the (R_out*n)^2 eigh per site."""
    R = RA * rmax
    n = 2
    mm_gram = 2 * 2 * R * R * n * R          # t = Y G (per i) + G update
    k = rmax
    mm_tr = (2 * k * R * n * R               # c = T2 y
             + 2 * (k * n) * R * R           # cm G
             + 2 * (k * n) ** 2 * R          # B
             + 2 * k * (k * n) * R)          # t2 = u^H cm
    eig = EIGH_FLOP_EQUIV * (k * n) ** 3
    mm = d * (mm_gram + mm_tr)
    eig_t = d * eig
    total = mm + eig_t
    per_dev = mm / p + eig_t
    return {"replicated_frac": eig_t / total,
            f"ideal_speedup_tp{p}": total / per_dev}


def main():
    from ttnx.parallel.batch import make_mesh
    from ttnx.parallel.round_dist import make_cn_step_dist
    from ttnx.solvers.round_scan import make_cn_step
    import ttnx

    n_dev = len(jax.devices())
    out = {"n_devices": n_dev}

    print("== analytic per-device FLOP balance (gram rounding, RA=4) ==")
    for rmax in (8, 16, 32, 64):
        for p in (2, 4):
            b = flop_balance(12, 4, rmax, p)
            print(f" rmax={rmax:3d} R={b['R']:4d} tp={p}: matmul "
                  f"{b['matmul_gflop']:8.3f} GF, eigh-equiv "
                  f"{b['eigh_gflop_equiv']:8.3f} GF, replicated frac "
                  f"{b['replicated_frac']:.2f}, ideal speedup "
                  f"{b[f'ideal_speedup_tp{p}']:.2f}x")
            out[f"ideal_speedup_rmax{rmax}_tp{p}"] = round(
                b[f"ideal_speedup_tp{p}"], 3)
            out[f"replicated_frac_rmax{rmax}"] = round(
                b["replicated_frac"], 3)
    print("== analytic balance, GRAM-CHAIN rounding (Amdahl-free) ==")
    for rmax in (8, 16, 32, 64):
        for p in (2, 4):
            b = flop_balance_gram_chain(12, 4, rmax, p)
            print(f" rmax={rmax:3d} tp={p}: replicated frac "
                  f"{b['replicated_frac']:.3f}, ideal speedup "
                  f"{b[f'ideal_speedup_tp{p}']:.2f}x")
            out[f"gc_ideal_speedup_rmax{rmax}_tp{p}"] = round(
                b[f"ideal_speedup_tp{p}"], 3)

    print("== measured wall-clock (virtual mesh: OVERHEAD only) ==")
    d = 8
    hg = 1.0 / (2 ** d + 1)
    A = (-1.0 / hg ** 2) * ttnx.toeplitz_to_qtto(2.0, -1.0, -1.0, d)

    def time_fn(step, u, reps=5):
        o = jax.block_until_ready(step(u))
        t0 = time.perf_counter()
        for _ in range(reps):
            o = jax.block_until_ready(step(o))
        return (time.perf_counter() - t0) / reps

    for rmax in (8, 16, 32):
        u_rks = (1,) + (rmax,) * (d - 1) + (1,)
        sf, pack, _ = make_cn_step(
            A, 1e-7, rmax=rmax, dims=(2,) * d, u_rks=u_rks, sweep_count=2,
            round_method="gram")
        u = pack(ttnx.qtt_sin(d, a=hg, b=1 - hg))
        t_rep = time_fn(sf, u)
        row = {"replicated_ms": round(t_rep * 1e3, 1)}
        for p in (2, 4):
            if n_dev < p:
                continue
            mesh = make_mesh(dp=n_dev // p, tp=p)
            with mesh:
                sfd, packd, _ = make_cn_step_dist(
                    A, 1e-7, rmax, (2,) * d, u_rks, mesh, sweep_count=2,
                    force_tp=True)
                ud = packd(ttnx.qtt_sin(d, a=hg, b=1 - hg))
                t_tp = time_fn(sfd, ud)
            row[f"tp{p}_ms"] = round(t_tp * 1e3, 1)
            row[f"tp{p}_overhead_x"] = round(t_tp / t_rep, 2)
        print(f" rmax={rmax:3d}: {row}")
        out[f"wall_rmax{rmax}"] = row

    print(json.dumps(out))


if __name__ == "__main__":
    main()
