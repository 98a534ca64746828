"""Probe 5 (round 4): surgical ablation of the batched rank-64 ALS fixed
cost (~600 ms at B=64 that is not CG FLOPs, not standalone-QR, not einsum
rates). Each section jits one piece of als_sweeps_b's program at B=64,
r=64, d=12 and times it chained with one sync."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def _sync(x):
    leaves = jax.tree_util.tree_leaves(x)
    return float(np.asarray(leaves[0]).reshape(-1)[0])


def emit(name, **kv):
    print(json.dumps({"section": name, **kv}), flush=True)


def timeit(fn, *args, reps=3):
    out = fn(*args)
    _sync(out)
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        _sync(out)
        best = min(best or 9e9, time.perf_counter() - t0)
    return best


def setup():
    import ttnx
    from ttnx.core.algebra import add_op, scale_op
    from ttnx.core.canonical import tt_round
    from ttnx.core.tt import id_tto, r_and_d_to_rks
    from ttnx.solvers.als_scan import pack_op, pack_tt, rank_masks

    d, rmax = 12, 64
    hg = 1.0 / (2 ** d + 1)
    h_step = 1e-6
    A = ((-1.0 / hg ** 2) * ttnx.toeplitz_to_qtto(2.0, -1.0, -1.0, d)
         ).astype(jnp.float32)
    lhs = add_op(id_tto(d, dtype=jnp.float32), scale_op(-h_step / 2, A))
    lhs_stack = pack_op(lhs, max(lhs.ranks))
    u_rks = r_and_d_to_rks((1,) + (rmax,) * (d - 1) + (1,), (2,) * d,
                           rmax=rmax)
    masks = rank_masks(u_rks, rmax, dtype=jnp.float32)
    u0 = ttnx.qtt_sin(d, a=hg, b=1 - hg)
    us = pack_tt(tt_round(u0, max_bond=rmax).astype(jnp.float32), rmax)
    B = 64
    bb = jnp.broadcast_to(us, (B,) + us.shape)
    return lhs_stack, bb, masks


def main():
    emit("start", backend=jax.default_backend())
    lhs_stack, bb, masks = setup()
    Bb, d, R, n, _ = bb.shape
    RA = lhs_stack.shape[1]
    dt = bb.dtype

    from ttnx.solvers.als_scan_batched import (_b_boundary_env,
                                               _b_boundary_env_b,
                                               _b_local_cg, als_sweeps_b)

    # 1. full solve at cg_iters=0 (isolates everything-but-CG)
    for ci in (0,):
        try:
            @jax.jit
            def f0(bb, xb):
                with jax.default_matmul_precision("highest"):
                    return als_sweeps_b(lhs_stack, bb, xb, masks, 2,
                                        cg_iters=ci)
            emit(f"balsb64_cg{ci}", ms=round(timeit(f0, bb, bb) * 1e3, 1))
        except Exception as e:
            emit(f"balsb64_cg{ci}", error=str(e)[:200])

    # 2. env scans only (right + left)
    try:
        @jax.jit
        def envs_only(x):
            with jax.default_matmul_precision("highest"):
                init = (_b_boundary_env(Bb, R, RA, dt),
                        _b_boundary_env_b(Bb, R, R, dt))
                xs = jnp.moveaxis(x, 1, 0)

                def stepR(carry, inp):
                    Renv, Rb_env = carry
                    xc, Ac, bc, mr = inp
                    xc = xc * mr[None, None, None, :]
                    new = jnp.einsum("Baip,Wijw,Bbjq,Bpwq->BaWb",
                                     jnp.conj(xc), Ac, xc, Renv,
                                     optimize=True)
                    new_b = jnp.einsum("Baip,Buiv,Bpv->Bau", jnp.conj(xc),
                                       bc, Rb_env, optimize=True)
                    return (new, new_b), (new, new_b)

                (_, _), (envs, envs_b) = lax.scan(
                    stepR, init, (xs, lhs_stack, xs, masks[1:]),
                    reverse=True)
                return envs
        emit("envs_right", ms=round(timeit(envs_only, bb) * 1e3, 1))
    except Exception as e:
        emit("envs_right", error=str(e)[:200])

    # 3. half-sweep with identity "orth" (no QR): q = V (WRONG numerics,
    #    right shape/cost) — isolates the QR contribution in context
    def make_half(orth_qr: bool):
        @jax.jit
        def half(x, Renvs, Rb_envs):
            with jax.default_matmul_precision("highest"):
                L0 = _b_boundary_env(Bb, R, RA, dt)
                Lb0 = _b_boundary_env_b(Bb, R, R, dt)
                T0 = jnp.zeros((Bb, R, R), dtype=dt).at[:, 0, 0].set(1.0)
                bs = jnp.moveaxis(bb, 1, 0)

                def step(carry, inp):
                    L, Lb, _T = carry
                    Ac, bc, Renv, Rb_env, m_l, m_r = inp
                    V = _b_local_cg(L, Ac, Renv, Lb, bc, Rb_env, m_l, m_r,
                                    32)
                    if orth_qr:
                        q, r = jnp.linalg.qr(V.reshape(Bb, R * n, R))
                        q = q * m_r[None, None, :]
                        r = r * m_r[None, :, None]
                    else:
                        q = V.reshape(Bb, R * n, R) * m_r[None, None, :]
                        r = T0
                    core = q.reshape(Bb, R, n, R)
                    L_new = jnp.einsum("Baic,BaWb,Wijw,Bbjd->Bcwd",
                                       jnp.conj(core), L, Ac, core,
                                       optimize=True)
                    Lb_new = jnp.einsum("Baip,Bau,Buiv->Bpv",
                                        jnp.conj(core), Lb, bc,
                                        optimize=True)
                    return (L_new, Lb_new, r), core

                inputs = (lhs_stack[:-1], bs[:-1], Renvs[1:d],
                          Rb_envs[1:d], masks[:-2], masks[1:-1])
                (_, _, T), new_cores = lax.scan(step, (L0, Lb0, T0), inputs)
                return new_cores
        return half

    # build env stacks once (outside timing)
    @jax.jit
    def build_envs(x):
        with jax.default_matmul_precision("highest"):
            init = (_b_boundary_env(Bb, R, RA, dt),
                    _b_boundary_env_b(Bb, R, R, dt))
            xs = jnp.moveaxis(x, 1, 0)

            def stepR(carry, inp):
                Renv, Rb_env = carry
                xc, Ac, bc, mr = inp
                xc = xc * mr[None, None, None, :]
                new = jnp.einsum("Baip,Wijw,Bbjq,Bpwq->BaWb", jnp.conj(xc),
                                 Ac, xc, Renv, optimize=True)
                new_b = jnp.einsum("Baip,Buiv,Bpv->Bau", jnp.conj(xc), bc,
                                   Rb_env, optimize=True)
                return (new, new_b), (new, new_b)

            (_, _), (envs, envs_b) = lax.scan(
                stepR, init, (xs, lhs_stack, xs, masks[1:]), reverse=True)
            envs = jnp.concatenate([envs, init[0][None]], axis=0)
            envs_b = jnp.concatenate([envs_b, init[1][None]], axis=0)
            return envs, envs_b

    try:
        Renvs, Rb_envs = build_envs(bb)
        _sync(Renvs)
        for name, oq in (("half_qr", True), ("half_noqr", False)):
            emit(name, ms=round(
                timeit(make_half(oq), bb, Renvs, Rb_envs) * 1e3, 1))
    except Exception as e:
        emit("half_sweeps", error=str(e)[:300])

    # 4. CG-only chain: 11 sequential site solves without QR/env updates
    try:
        @jax.jit
        def cg_only(x, Renvs, Rb_envs):
            with jax.default_matmul_precision("highest"):
                L0 = _b_boundary_env(Bb, R, RA, dt)
                Lb0 = _b_boundary_env_b(Bb, R, R, dt)
                bs = jnp.moveaxis(bb, 1, 0)

                def step(carry, inp):
                    acc = carry
                    Ac, bc, Renv, Rb_env, m_l, m_r = inp
                    V = _b_local_cg(L0, Ac, Renv, Lb0, bc, Rb_env, m_l,
                                    m_r, 32)
                    return acc + jnp.sum(V), V
                inputs = (lhs_stack[:-1], bs[:-1], Renvs[1:d],
                          Rb_envs[1:d], masks[:-2], masks[1:-1])
                s, _ = lax.scan(step, jnp.float32(0.0), inputs)
                return s
        emit("cg_only", ms=round(timeit(cg_only, bb, Renvs, Rb_envs)
                                 * 1e3, 1))
    except Exception as e:
        emit("cg_only", error=str(e)[:300])
    emit("done")


if __name__ == "__main__":
    main()
