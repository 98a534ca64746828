"""Fourth-level bisect: tall-SVD scan alone compiles (probe_svd_variants),
but matvec+tt_round_scan still SIGABRTs. Which composition piece kills it?

  h_orth_then_tallsvd — _right_orth_scan -> bare tall-SVD scan (no masks)
  i_tallsvd_masked    — tall-SVD scan with output masks, fresh input
  j_matvec_tallsvd    — matvec_padded -> bare tall-SVD scan (no orth)
  k_round_fresh       — library tt_round_scan on a FRESH random input
  l_matvec_round      — matvec_padded -> tt_round_scan (stage 2 again)
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


def tall_svd_scan(y, R_out, masks_out=None):
    d, R, n, _ = y.shape

    def step(carry, inp):
        (T,) = carry
        core, m_r_out = inp
        c = jnp.einsum("ab,bnc->anc", T, core)
        cm = c.reshape(R_out * n, R)
        k = min(R_out, R)
        ut, s, vt2 = jnp.linalg.svd(cm.T, full_matrices=False)
        u = vt2.T
        u_k = u[:, :k]
        t_k = s[:k, None] * ut[:, :k].T
        if m_r_out is not None:
            u_k = u_k * m_r_out[None, :k]
            t_k = t_k * m_r_out[:k, None]
        pad = jnp.zeros((R_out * n, R_out - k), dtype=u.dtype)
        new_core = jnp.concatenate([u_k, pad], axis=1).reshape(R_out, n, R_out)
        T_new = jnp.concatenate(
            [t_k, jnp.zeros((R_out - k, R), dtype=u.dtype)], axis=0)
        return (T_new,), new_core

    T0 = jnp.zeros((R_out, R), dtype=y.dtype).at[0, 0].set(1.0)
    xs = (y[:-1], masks_out) if masks_out is not None else (y[:-1], None)
    if masks_out is None:
        (T,), cores = lax.scan(lambda c, core: step(c, (core, None)),
                               (T0,), y[:-1])
    else:
        (T,), cores = lax.scan(step, (T0,), (y[:-1], masks_out))
    last = jnp.einsum("ab,bnc->anc", T, y[-1])[:, :, :1]
    last = jnp.pad(last, ((0, 0), (0, 0), (0, R_out - 1)))
    return jnp.concatenate([cores, last[None]], axis=0)


def main():
    import numpy as np
    import ttnx
    from ttnx.solvers.round_scan import (
        _right_orth_scan, matvec_padded, round_masks, tt_round_scan)
    from ttnx.solvers.als_scan import pack_op, pack_tt, rank_masks
    from ttnx.core.tt import r_and_d_to_rks, id_tto
    from ttnx.core.algebra import add_op, scale_op

    dtype = jnp.float32
    d, rmax = 12, 16
    n_grid = 2 ** d
    h_grid = 1.0 / (n_grid + 1)
    A = ((1.0 / h_grid ** 2) * ttnx.toeplitz_to_qtto(2.0, -1.0, -1.0, d)
         ).astype(dtype)
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

    R = RA * rmax
    rng = np.random.default_rng(0)
    y_fresh = jnp.asarray(rng.standard_normal((d, R, 2, R)) * 0.05,
                          dtype=dtype)

    probe("h_orth_then_tallsvd",
          lambda yy: tall_svd_scan(_right_orth_scan(yy, masks_big), rmax),
          y_fresh)
    probe("i_tallsvd_masked",
          lambda yy: tall_svd_scan(yy, rmax, masks_out[1:d]), y_fresh)
    probe("k_round_fresh",
          lambda yy: tt_round_scan(yy, masks_big, rmax, masks_out), y_fresh)
    probe("l_matvec_round",
          lambda uu: tt_round_scan(matvec_padded(rhs_stack, uu), masks_big,
                                   rmax, masks_out), u)


if __name__ == "__main__":
    main()
