"""Probe: production-path rank-32/64 numbers on the real chip (VERDICT r3 #1).

Measures, each as its own JSON line (flushed — partial runs stay usable):
  1. cn64 / cn32 — the flagship make_cn_step pipeline at d=12 rmax=64/32,
     chained 8 steps one sync, accuracy-gated against the analytic CN
     evolution of a 3-mode Dirichlet eigenstate + implicit-solve residual.
  2. als64 / round64 — breakdown: the ALS-sweeps-only and apply+round-only
     programs at rmax=64.
  3. bals{16,64,256} — batched (vmap) ALS at rmax=64: the production
     continuous-batching pipeline at the BASELINE metric's rank.
  4. ceiling_f32h — measured square-matmul chain at f32 precision=HIGHEST
     (the precision class the production pipeline runs for accuracy), to
     report an honest precision-matched ceiling next to the bf16 one.
  5. bcn16 — vmapped full CN step (Pallas gram kernel under vmap) — may
     fail on this toolchain; wrapped.
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


D = 12
HG = 1.0 / (2 ** D + 1)
H_STEP = 1e-6
N_CHAIN = 8


def build_u0():
    import ttnx

    u = (ttnx.qtt_sin(D, a=HG, b=1 - HG, lam=1.0)
         + 0.5 * ttnx.qtt_sin(D, a=HG, b=1 - HG, lam=3.0)
         + 0.25 * ttnx.qtt_sin(D, a=HG, b=1 - HG, lam=9.0))
    return u


def analytic_after(u0_dense, steps):
    """Exact CN evolution of the 3-mode state under A = -(1/hg^2) T."""
    j = np.arange(1, 2 ** D + 1)
    out = np.zeros_like(u0_dense)
    for k, amp in ((1, 1.0), (3, 0.5), (9, 0.25)):
        mu = (2 - 2 * np.cos(k * np.pi * HG)) / HG ** 2
        rho = (1 - H_STEP / 2 * mu) / (1 + H_STEP / 2 * mu)
        out += amp * rho ** steps * np.sin(k * np.pi * j * HG)
    return out


def residual(u_next, u_prev):
    """||L u_next - R u_prev|| / ||R u_prev|| with the exact tridiagonal
    lhs/rhs operators (f64 numpy)."""
    c = H_STEP / (2 * HG ** 2)

    def T(v):
        out = 2 * v
        out[:-1] -= v[1:]
        out[1:] -= v[:-1]
        return out

    lhs = u_next + c * T(u_next.copy())
    rhs = u_prev - c * T(u_prev.copy())
    return float(np.linalg.norm(lhs - rhs) / np.linalg.norm(rhs))


def dense_of(stack, rks):
    from ttnx.core.decomp import ttv_to_tensor
    from ttnx.solvers.als_scan import unpack_tt

    return np.asarray(ttv_to_tensor(unpack_tt(np.asarray(stack), rks))
                      ).reshape(-1).astype(np.float64)


def probe_cn(rmax):
    import ttnx
    from ttnx.solvers.round_scan import make_cn_step
    from ttnx.utils.flops import cn_step_flops

    A = (-1.0 / HG ** 2) * ttnx.toeplitz_to_qtto(2.0, -1.0, -1.0, D)
    u_rks = (1,) + (rmax,) * (D - 1) + (1,)
    step_fn, pack, _ = make_cn_step(
        A, H_STEP, rmax=rmax, dims=(2,) * D, u_rks=u_rks, dtype=jnp.float32,
        sweep_count=2, solver="cg_fused", round_method="gram_chain",
        precision="highest", cg_iters=32)
    u0 = build_u0()
    us = pack(u0)
    t0 = time.perf_counter()
    v = step_fn(us)
    _sync(v)
    compile_s = time.perf_counter() - t0
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        v = us
        for _ in range(N_CHAIN):
            v = step_fn(v)
        _sync(v)
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    ms = best / N_CHAIN * 1e3
    # accuracy: trajectory vs analytic + last-step residual
    from ttnx.core.tt import r_and_d_to_rks

    rks = r_and_d_to_rks(u_rks, (2,) * D, rmax=rmax)
    v7 = us
    for _ in range(N_CHAIN - 1):
        v7 = step_fn(v7)
    v8 = step_fn(v7)
    d7, d8 = dense_of(v7, rks), dense_of(v8, rks)
    j = np.arange(1, 2 ** D + 1)
    exact = analytic_after(d8 * 0 + 0.0, N_CHAIN)
    rel = np.linalg.norm(d8 - exact) / np.linalg.norm(exact)
    res = residual(d8, d7)
    flops = cn_step_flops(D, rmax, 4, 4, cg_iters=32)
    emit(f"cn{rmax}", ms=round(ms, 3), compile_s=round(compile_s, 1),
         gflop_per_step=round(flops / 1e9, 2),
         gflops=round(flops / (ms / 1e3) / 1e9, 1),
         rel_vs_analytic=f"{rel:.2e}", residual=f"{res:.2e}")
    return step_fn, pack, us


def probe_breakdown_r64():
    import ttnx
    from ttnx.solvers.als_scan import als_sweeps, pack_op, pack_tt, rank_masks
    from ttnx.solvers.round_scan import (matvec_padded, round_masks,
                                         tt_round_gram)
    from ttnx.core.tt import r_and_d_to_rks
    from ttnx.core.algebra import add_op, scale_op
    from ttnx.core.tt import id_tto
    from ttnx.utils.flops import als_sweeps_flops, round_gram_flops

    rmax = 64
    A = ((-1.0 / HG ** 2) * ttnx.toeplitz_to_qtto(2.0, -1.0, -1.0, D)
         ).astype(jnp.float32)
    eye = id_tto(D, dtype=jnp.float32)
    lhs = add_op(eye, scale_op(-H_STEP / 2, A))
    rhs = add_op(eye, scale_op(H_STEP / 2, A))
    lhs_stack = pack_op(lhs, max(lhs.ranks))
    rhs_stack = pack_op(rhs, max(rhs.ranks))
    u_rks = r_and_d_to_rks((1,) + (rmax,) * (D - 1) + (1,), (2,) * D,
                           rmax=rmax)
    masks = rank_masks(u_rks, rmax, dtype=jnp.float32)
    big_rks = [min(a * b, 4 * rmax) for a, b in zip(rhs.ranks, u_rks)]
    out_rks = round_masks(big_rks, rmax, (2,) * D)
    masks_out = rank_masks(out_rks, rmax, dtype=jnp.float32)
    u0 = build_u0()
    from ttnx.core.canonical import tt_round

    us = pack_tt(tt_round(u0, max_bond=rmax).astype(jnp.float32), rmax)
    b_stack = us

    # (a) ALS sweeps only
    @jax.jit
    def als_only(b, x):
        with jax.default_matmul_precision("highest"):
            return als_sweeps(lhs_stack, b, x, masks, 2, solver="cg_fused",
                              cg_iters=32)

    t0 = time.perf_counter()
    out = als_only(b_stack, us)
    _sync(out)
    c_als = time.perf_counter() - t0
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        v = us
        for _ in range(N_CHAIN):
            v = als_only(b_stack, v)
        _sync(v)
        best = min(best or 9e9, time.perf_counter() - t0)
    ms_als = best / N_CHAIN * 1e3
    fa = als_sweeps_flops(D, rmax, 4, rmax, cg_iters=32)
    emit("als64", ms=round(ms_als, 3), compile_s=round(c_als, 1),
         gflops=round(fa / (ms_als / 1e3) / 1e9, 1),
         gflop_per_call=round(fa / 1e9, 2))

    # (b) apply + round only
    @jax.jit
    def round_only(x):
        with jax.default_matmul_precision("highest"):
            big = matvec_padded(rhs_stack, x)
            return tt_round_gram(big, rmax, masks_out)

    t0 = time.perf_counter()
    out = round_only(us)
    _sync(out)
    c_r = time.perf_counter() - t0
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        v = us
        for _ in range(N_CHAIN):
            v = round_only(v)
        _sync(v)
        best = min(best or 9e9, time.perf_counter() - t0)
    ms_r = best / N_CHAIN * 1e3
    fr = round_gram_flops(D, 4 * rmax, rmax)
    emit("round64", ms=round(ms_r, 3), compile_s=round(c_r, 1),
         gflops=round(fr / (ms_r / 1e3) / 1e9, 1),
         gflop_per_call=round(fr / 1e9, 2))
    return lhs_stack, b_stack, us, masks


def probe_batched(lhs_stack, b_stack, us, masks, batches=(64, 256, 16)):
    from ttnx.solvers.als_scan import als_sweeps
    from ttnx.utils.flops import als_sweeps_flops

    rmax = us.shape[1]
    fa = als_sweeps_flops(D, rmax, 4, rmax, cg_iters=32)
    for B in batches:
        try:
            bb = jnp.broadcast_to(b_stack, (B,) + b_stack.shape)
            xb = jnp.broadcast_to(us, (B,) + us.shape)

            @jax.jit
            def bfn(bb, xb):
                with jax.default_matmul_precision("highest"):
                    return jax.vmap(
                        lambda b, x: als_sweeps(lhs_stack, b, x, masks, 2,
                                                solver="cg_fused",
                                                cg_iters=32))(bb, xb)

            t0 = time.perf_counter()
            out = bfn(bb, xb)
            _sync(out)
            c = time.perf_counter() - t0
            best = None
            iters = 3
            for _ in range(3):
                t0 = time.perf_counter()
                for _ in range(iters):
                    out = bfn(bb, xb)
                    _sync(out)
                best = min(best or 9e9, (time.perf_counter() - t0) / iters)
            emit(f"bals{B}", ms=round(best * 1e3, 2), compile_s=round(c, 1),
                 solves_per_s=round(B / best, 1),
                 gflops=round(B * fa / best / 1e9, 1),
                 gflop_per_call=round(B * fa / 1e9, 1))
        except Exception as e:
            emit(f"bals{B}", error=str(e)[:300])


def probe_ceiling_f32h():
    n = 2048
    iters = 256
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((n, n)) * 0.02, jnp.float32)
    w = jnp.asarray(np.linalg.qr(rng.standard_normal((n, n)))[0], jnp.float32)

    @jax.jit
    def chain(x, w):
        with jax.default_matmul_precision("highest"):
            def body(_, acc):
                return acc @ w
            return jax.lax.fori_loop(0, iters, body, x)

    t0 = time.perf_counter()
    out = chain(x, w)
    _sync(out)
    c = time.perf_counter() - t0
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        out = chain(x, w)
        _sync(out)
        best = min(best or 9e9, time.perf_counter() - t0)
    g = 2.0 * n ** 3 * iters / best / 1e9
    emit("ceiling_f32h", gflops=round(g, 1), compile_s=round(c, 1))


def probe_bcn(step_fn, us, B=16):
    try:
        xb = jnp.broadcast_to(us, (B,) + us.shape)
        bfn = jax.jit(jax.vmap(step_fn))
        t0 = time.perf_counter()
        out = bfn(xb)
        _sync(out)
        c = time.perf_counter() - t0
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            v = xb
            for _ in range(4):
                v = bfn(v)
            _sync(v)
            best = min(best or 9e9, (time.perf_counter() - t0) / 4)
        emit(f"bcn{B}", ms=round(best * 1e3, 2), compile_s=round(c, 1),
             steps_per_s=round(B / best, 1))
    except Exception as e:
        emit(f"bcn{B}", error=str(e)[:300])


def main():
    emit("start", backend=jax.default_backend(),
         device=str(jax.devices()[0]))
    step64 = None
    try:
        step64, pack64, us64 = probe_cn(64)
    except Exception as e:
        emit("cn64", error=str(e)[:300])
    try:
        probe_cn(32)
    except Exception as e:
        emit("cn32", error=str(e)[:300])
    lhs = None
    try:
        lhs, b_stack, us, masks = probe_breakdown_r64()
    except Exception as e:
        emit("breakdown", error=str(e)[:300])
    try:
        probe_ceiling_f32h()
    except Exception as e:
        emit("ceiling_f32h", error=str(e)[:300])
    if lhs is not None:
        probe_batched(lhs, b_stack, us, masks)
    if step64 is not None:
        probe_bcn(step64, us64)
    emit("done")


if __name__ == "__main__":
    main()
