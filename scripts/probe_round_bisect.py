"""Second-level bisect of the tt_round_scan remote-compiler SIGABRT (d=12).

Variants probed (same shapes as the CN step: R=64 input, R_out=16, n=2):
  a_orth_only     — _right_orth_scan alone (QR-of-transpose in a scan)
  b_svd_only      — the SVD truncation scan alone (no orth)
  c_orth_barrier  — orth scan with optimization_barrier before the QR
  d_round_barrier — full round with barriers before QR and SVD
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax import lax


def probe(name, fn, *args):
    t0 = time.perf_counter()
    try:
        out = jax.jit(fn)(*args)
        val = float(jnp.sum(jnp.abs(out)))
        print(json.dumps({"stage": name, "ok": True, "sum": round(val, 3),
                          "s": round(time.perf_counter() - t0, 1)}),
              flush=True)
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"stage": name, "ok": False,
                          "s": round(time.perf_counter() - t0, 1),
                          "error": str(e)[:160]}), flush=True)


def orth_scan(y, masks_r, barrier: bool):
    d, R, n, _ = y.shape

    def step(carry, inp):
        T, = carry
        core, m_l = inp
        c = jnp.einsum("anb,bc->anc", core, T)
        ct = c.reshape(R, n * R).T
        if barrier:
            ct = lax.optimization_barrier(ct)
        qt, rt = jnp.linalg.qr(ct)
        q = qt.T.reshape(R, n, R) * m_l[:, None, None]
        t = rt.T * m_l[None, :]
        return (t,), q

    T0 = jnp.zeros((R, R), dtype=y.dtype).at[0, 0].set(1.0)
    (T,), cores = lax.scan(step, (T0,), (y[1:], masks_r[:-1][1:d]),
                           reverse=True)
    first = jnp.einsum("anb,bc->anc", y[0], T)
    return jnp.concatenate([first[None], cores], axis=0)


def svd_scan(y, R_out, masks_out, barrier: bool):
    d, R, n, _ = y.shape

    def step(carry, inp):
        T, = carry
        core, m_r_out = inp
        c = jnp.einsum("ab,bnc->anc", T, core)
        cm = c.reshape(R_out * n, R)
        if barrier:
            cm = lax.optimization_barrier(cm)
        u, s, vt = jnp.linalg.svd(cm, full_matrices=False)
        k = min(R_out, R)
        u_k = u[:, :k] * m_r_out[None, :k]
        pad = jnp.zeros((R_out * n, R_out - k), dtype=u.dtype)
        new_core = jnp.concatenate([u_k, pad], axis=1).reshape(R_out, n, R_out)
        t_k = (s[:k, None] * vt[:k, :]) * m_r_out[:k, None]
        T_new = jnp.concatenate(
            [t_k, jnp.zeros((R_out - k, R), dtype=u.dtype)], axis=0)
        return (T_new,), new_core

    T0 = jnp.zeros((R_out, R), dtype=y.dtype).at[0, 0].set(1.0)
    (T,), cores = lax.scan(step, (T0,), (y[:-1], masks_out[1:d]))
    last = jnp.einsum("ab,bnc->anc", T, y[d - 1])[:, :, :1]
    last = jnp.pad(last, ((0, 0), (0, 0), (0, R_out - 1)))
    return jnp.concatenate([cores, last[None]], axis=0)


def main():
    import numpy as np
    import ttnx
    from ttnx.solvers.round_scan import matvec_padded, round_masks
    from ttnx.solvers.als_scan import pack_op, pack_tt, rank_masks
    from ttnx.core.tt import r_and_d_to_rks

    dtype = jnp.float32
    d, rmax = 12, 16
    n_grid = 2 ** d
    h_grid = 1.0 / (n_grid + 1)
    A = ((1.0 / h_grid ** 2) * ttnx.toeplitz_to_qtto(2.0, -1.0, -1.0, d)
         ).astype(dtype)
    from ttnx.core.algebra import add_op, scale_op
    from ttnx.core.tt import id_tto
    rhs = add_op(id_tto(d, dtype=dtype), scale_op(0.5e-9, A))
    RA = max(rhs.ranks)
    rhs_stack = pack_op(rhs, RA)
    dims = (2,) * d
    u_rks = r_and_d_to_rks((1,) + (rmax,) * (d - 1) + (1,), dims, rmax=rmax)
    u = pack_tt(ttnx.qtt_sin(d, a=h_grid, b=1 - h_grid).astype(dtype), rmax)
    real_dt = jnp.float32
    masks_A = np.zeros((d + 1, RA))
    for i, r in enumerate(rhs.ranks):
        masks_A[i, :r] = 1.0
    masks_u_np = np.asarray(rank_masks(u_rks, rmax, dtype=real_dt))
    masks_big = jnp.asarray(np.stack(
        [np.outer(masks_A[i], masks_u_np[i]).reshape(-1)
         for i in range(d + 1)]), dtype=real_dt)
    big_rks = [min(a * b, RA * rmax) for a, b in zip(rhs.ranks, u_rks)]
    out_rks = round_masks(big_rks, rmax, dims)
    masks_out = rank_masks(out_rks, rmax, dtype=real_dt)

    big = jax.jit(lambda uu: matvec_padded(rhs_stack, uu))(u)
    big = jax.block_until_ready(big)

    probe("a_orth_only", lambda yy: orth_scan(yy, masks_big, False), big)
    probe("b_svd_only",
          lambda yy: svd_scan(yy, rmax, masks_out, False), big)
    probe("c_orth_barrier", lambda yy: orth_scan(yy, masks_big, True), big)
    probe("d_round_barrier",
          lambda yy: svd_scan(orth_scan(yy, masks_big, True), rmax,
                              masks_out, True), big)


if __name__ == "__main__":
    main()
