"""Probe 7 (round 4): unrolled batched ALS — replace every lax.scan that
emits stacked outputs with a static Python loop over the d=12 sites
(probe 6 measured scan-with-outputs at 4.9 GF/s: XLA copies the whole
output buffer every iteration; the same einsum in a fori_loop runs at
112-225 GF/s and the CG apply at 2.3 TF/s)."""

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


def als_sweeps_b_unrolled(A_stack, b_batch, x_batch, masks, sweep_count=2,
                          cg_iters=32):
    """Unrolled twin of als_sweeps_b (Python loops over the static site
    count; no scan output stacking)."""
    from ttnx.solvers.als_scan_batched import (_b_boundary_env,
                                               _b_boundary_env_b,
                                               _b_local_cg)

    Bb, d, R, n, _ = x_batch.shape
    dt = x_batch.dtype
    RA = A_stack.shape[1]
    Rb = b_batch.shape[2]

    def right_envs(x):
        Renv = _b_boundary_env(Bb, R, RA, dt)
        Rb_env = _b_boundary_env_b(Bb, R, Rb, dt)
        envs = [Renv]
        envs_b = [Rb_env]
        for k in range(d - 1, -1, -1):
            xc = x[:, k] * masks[k + 1][None, None, None, :]
            Renv = jnp.einsum("Baip,Wijw,Bbjq,Bpwq->BaWb", jnp.conj(xc),
                              A_stack[k], xc, Renv, optimize=True)
            Rb_env = jnp.einsum("Baip,Buiv,Bpv->Bau", jnp.conj(xc),
                                b_batch[:, k], Rb_env, optimize=True)
            envs.append(Renv)
            envs_b.append(Rb_env)
        return envs[::-1], envs_b[::-1]  # envs[i] covers sites i..d-1

    def left_envs(x):
        L = _b_boundary_env(Bb, R, RA, dt)
        Lb = _b_boundary_env_b(Bb, R, Rb, dt)
        envs = [L]
        envs_b = [Lb]
        for k in range(d):
            xc = x[:, k] * masks[k + 1][None, None, None, :]
            L = jnp.einsum("Baic,BaWb,Wijw,Bbjd->Bcwd", jnp.conj(xc), L,
                           A_stack[k], xc, optimize=True)
            Lb = jnp.einsum("Baip,Bau,Buiv->Bpv", jnp.conj(xc), Lb,
                            b_batch[:, k], optimize=True)
            envs.append(L)
            envs_b.append(Lb)
        return envs, envs_b

    def forward(x, Renvs, Rb_envs):
        L = _b_boundary_env(Bb, R, RA, dt)
        Lb = _b_boundary_env_b(Bb, R, Rb, dt)
        T = None
        cores = []
        for i in range(d - 1):
            V = _b_local_cg(L, A_stack[i], Renvs[i + 1], Lb, b_batch[:, i],
                            Rb_envs[i + 1], masks[i], masks[i + 1],
                            cg_iters)
            q, r = jnp.linalg.qr(V.reshape(Bb, R * n, R))
            q = q * masks[i + 1][None, None, :]
            T = r * masks[i + 1][None, :, None]
            core = q.reshape(Bb, R, n, R)
            L = jnp.einsum("Baic,BaWb,Wijw,Bbjd->Bcwd", jnp.conj(core), L,
                           A_stack[i], core, optimize=True)
            Lb = jnp.einsum("Baip,Bau,Buiv->Bpv", jnp.conj(core), Lb,
                            b_batch[:, i], optimize=True)
            cores.append(core)
        last = jnp.einsum("Bab,Bbnc->Banc", T, x[:, d - 1])
        cores.append(last)
        return jnp.stack(cores, axis=1)

    def backward(x, Lenvs, Lb_envs):
        Renv = _b_boundary_env(Bb, R, RA, dt)
        Rb_env = _b_boundary_env_b(Bb, R, Rb, dt)
        T = None
        cores = []
        for i in range(d - 1, 0, -1):
            V = _b_local_cg(Lenvs[i], A_stack[i], Renv, Lb_envs[i],
                            b_batch[:, i], Rb_env, masks[i], masks[i + 1],
                            cg_iters)
            qt, rt = jnp.linalg.qr(jnp.swapaxes(V.reshape(Bb, R, n * R),
                                                1, 2))
            q = jnp.swapaxes(qt, 1, 2).reshape(Bb, R, n, R) \
                * masks[i][None, :, None, None]
            T = jnp.swapaxes(rt, 1, 2) * masks[i][None, None, :]
            Renv = jnp.einsum("Baip,Wijw,Bbjq,Bpwq->BaWb", jnp.conj(q),
                              A_stack[i], q, Renv, optimize=True)
            Rb_env = jnp.einsum("Baip,Buiv,Bpv->Bau", jnp.conj(q),
                                b_batch[:, i], Rb_env, optimize=True)
            cores.append(q)
        first = jnp.einsum("Banb,Bbc->Banc", x[:, 0], T)
        cores.append(first)
        return jnp.stack(cores[::-1], axis=1)

    x = x_batch
    half = 0
    while half < sweep_count:
        Renvs, Rb_envs = right_envs(x)
        x = forward(x, Renvs, Rb_envs)
        half += 1
        if half >= sweep_count:
            break
        Lenvs, Lb_envs = left_envs(x)
        x = backward(x, Lenvs, Lb_envs)
        half += 1
    return x


def main():
    emit("start", backend=jax.default_backend())
    import ttnx
    from ttnx.core.algebra import add_op, scale_op
    from ttnx.core.canonical import tt_round
    from ttnx.core.decomp import ttv_to_tensor
    from ttnx.core.tt import id_tto, r_and_d_to_rks
    from ttnx.solvers.als_scan import pack_op, pack_tt, rank_masks, unpack_tt
    from ttnx.utils.flops import als_sweeps_flops

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
    u0 = (ttnx.qtt_sin(d, a=hg, b=1 - hg, lam=1.0)
          + 0.5 * ttnx.qtt_sin(d, a=hg, b=1 - hg, lam=3.0)
          + 0.25 * ttnx.qtt_sin(d, a=hg, b=1 - hg, lam=9.0))
    us = pack_tt(tt_round(u0, max_bond=rmax).astype(jnp.float32), rmax)
    fa = als_sweeps_flops(12, rmax, 4, rmax, cg_iters=32)
    u0d = np.asarray(ttv_to_tensor(u0)).reshape(-1)
    c = h_step / (2 * hg ** 2)
    for B in (64, 256):
        try:
            bb = jnp.broadcast_to(us, (B,) + us.shape)

            @jax.jit
            def bfn(bb, xb):
                with jax.default_matmul_precision("highest"):
                    return als_sweeps_b_unrolled(lhs_stack, bb, xb, masks,
                                                 2, cg_iters=32)

            t0 = time.perf_counter()
            out = bfn(bb, bb)
            _sync(out)
            compile_s = time.perf_counter() - t0
            best = None
            for _ in range(3):
                t0 = time.perf_counter()
                for _ in range(3):
                    out = bfn(bb, bb)
                    _sync(out)
                best = min(best or 9e9, (time.perf_counter() - t0) / 3)
            x0 = np.asarray(ttv_to_tensor(unpack_tt(np.asarray(out[0]),
                                                    u_rks))
                            ).reshape(-1).astype(np.float64)
            lhs_x = x0 + c * (2 * x0 - np.pad(x0[1:], (0, 1))
                              - np.pad(x0[:-1], (1, 0)))
            res = np.linalg.norm(lhs_x - u0d) / np.linalg.norm(u0d)
            emit(f"balsu{B}", ms=round(best * 1e3, 2),
                 compile_s=round(compile_s, 1),
                 solves_per_s=round(B / best, 1),
                 gflops=round(B * fa / best / 1e9, 1),
                 residual=f"{res:.2e}")
        except Exception as e:
            emit(f"balsu{B}", error=str(e)[:300])
    emit("done")


if __name__ == "__main__":
    main()
