"""Fifth-level bisect. Facts so far (d=12 shapes, f32):
  masked orth scan alone: OK | bare tall-SVD scan alone: OK
  tall-SVD scan + masks: CRASH | orth -> bare tall-SVD: CRASH

Variants:
  m1_twoxs_nomul   — tall-SVD scan scanning (core, mask) xs but NOT using mask
  m2_constmask     — tall-SVD scan, one xs, multiply by a CLOSED-OVER vector
  m3_mask_u_only   — multiply only u_k
  m4_mask_t_only   — multiply only t_k
  m5_unrolled      — full masked round (orth+svd), python-unrolled, no scan
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


def svd_scan_variant(y, R_out, masks, mode):
    d, R, n, _ = y.shape
    k = min(R_out, R)

    def body(T, core, m):
        c = jnp.einsum("ab,bnc->anc", T, core)
        cm = c.reshape(R_out * n, R)
        ut, s, vt2 = jnp.linalg.svd(cm.T, full_matrices=False)
        u_k = vt2.T[:, :k]
        t_k = s[:k, None] * ut[:, :k].T
        if mode in ("mask_both", "mask_u", "constmask"):
            u_k = u_k * m[None, :k]
        if mode in ("mask_both", "mask_t"):
            t_k = t_k * m[:k, None]
        pad = jnp.zeros((R_out * n, R_out - k), dtype=y.dtype)
        new_core = jnp.concatenate([u_k, pad], axis=1).reshape(R_out, n, R_out)
        T_new = jnp.concatenate(
            [t_k, jnp.zeros((R_out - k, R), dtype=y.dtype)], axis=0)
        return T_new, new_core

    T0 = jnp.zeros((R_out, R), dtype=y.dtype).at[0, 0].set(1.0)
    if mode == "constmask":
        mconst = masks[1]
        (T), cores = lax.scan(lambda t, c: body(t, c, mconst), T0, y[:-1])
    elif mode == "twoxs_nomul":
        (T), cores = lax.scan(lambda t, inp: body(t, inp[0], None),
                              T0, (y[:-1], masks[1:y.shape[0]]))
    else:
        (T), cores = lax.scan(lambda t, inp: body(t, *inp),
                              T0, (y[:-1], masks[1:y.shape[0]]))
    last = jnp.einsum("ab,bnc->anc", T, y[-1])[:, :, :1]
    last = jnp.pad(last, ((0, 0), (0, 0), (0, R_out - 1)))
    return jnp.concatenate([cores, last[None]], axis=0)


def unrolled_round(y, masks_y, R_out, masks_out):
    d, R, n, _ = y.shape
    # right-orth, unrolled
    T = jnp.zeros((R, R), dtype=y.dtype).at[0, 0].set(1.0)
    cores = [None] * d
    for i in range(d - 1, 0, -1):
        c = jnp.einsum("anb,bc->anc", y[i], T)
        qt, rt = jnp.linalg.qr(c.reshape(R, n * R).T)
        m_l = masks_y[i]
        cores[i] = qt.T.reshape(R, n, R) * m_l[:, None, None]
        T = rt.T * m_l[None, :]
    cores[0] = jnp.einsum("anb,bc->anc", y[0], T)
    # svd truncation, unrolled
    out = [None] * d
    k = min(R_out, R)
    T2 = jnp.zeros((R_out, R), dtype=y.dtype).at[0, 0].set(1.0)
    for i in range(d - 1):
        c = jnp.einsum("ab,bnc->anc", T2, cores[i])
        cm = c.reshape(R_out * n, R)
        ut, s, vt2 = jnp.linalg.svd(cm.T, full_matrices=False)
        m = masks_out[i + 1]
        u_k = vt2.T[:, :k] * m[None, :k]
        t_k = (s[:k, None] * ut[:, :k].T) * m[:k, None]
        pad = jnp.zeros((R_out * n, R_out - k), dtype=y.dtype)
        out[i] = jnp.concatenate([u_k, pad], axis=1).reshape(R_out, n, R_out)
        T2 = jnp.concatenate(
            [t_k, jnp.zeros((R_out - k, R), dtype=y.dtype)], axis=0)
    last = jnp.einsum("ab,bnc->anc", T2, cores[d - 1])[:, :, :1]
    out[d - 1] = jnp.pad(last, ((0, 0), (0, 0), (0, R_out - 1)))
    return jnp.stack(out)


def main():
    import numpy as np
    import ttnx
    from ttnx.solvers.round_scan import round_masks
    from ttnx.solvers.als_scan import rank_masks
    from ttnx.core.tt import r_and_d_to_rks

    dtype = jnp.float32
    d, rmax, RA = 12, 16, 16
    R = RA * rmax
    dims = (2,) * d
    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.standard_normal((d, R, 2, R)) * 0.05, dtype=dtype)
    big_rks = r_and_d_to_rks((1,) + (R,) * (d - 1) + (1,), dims, rmax=R)
    masks_big = rank_masks(big_rks, R, dtype=jnp.float32)
    out_rks = round_masks(big_rks, rmax, dims)
    masks_out = rank_masks(out_rks, rmax, dtype=jnp.float32)

    probe("m1_twoxs_nomul",
          lambda yy: svd_scan_variant(yy, rmax, masks_out, "twoxs_nomul"), y)
    probe("m2_constmask",
          lambda yy: svd_scan_variant(yy, rmax, masks_out, "constmask"), y)
    probe("m3_mask_u_only",
          lambda yy: svd_scan_variant(yy, rmax, masks_out, "mask_u"), y)
    probe("m4_mask_t_only",
          lambda yy: svd_scan_variant(yy, rmax, masks_out, "mask_t"), y)
    probe("m5_unrolled",
          lambda yy: unrolled_round(yy, masks_big, rmax, masks_out), y)


if __name__ == "__main__":
    main()
