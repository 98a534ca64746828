"""Third-level bisect of the tt_round_scan SIGABRT: the crash lives in the
wide-matrix SVD inside the truncation lax.scan (probe_round_bisect stage b).

Variants (same (R_out*n, R) = (32, 256) shapes as the d=12 CN step):
  e_svd_wide_noscan — single wide SVD, no scan (control)
  f_svd_tall_scan   — svd(cm.T) inside the scan (tall 256x32)
  g_gram_eigh_scan  — eigh of the 32x32 Gram matrix inside the scan
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


def svd_scan(y, R_out, mode: str):
    d, R, n, _ = y.shape

    def step(carry, core):
        (T,) = carry
        c = jnp.einsum("ab,bnc->anc", T, core)
        cm = c.reshape(R_out * n, R)
        k = min(R_out, R)
        if mode == "tall":
            ut, s, vt2 = jnp.linalg.svd(cm.T, full_matrices=False)
            u = vt2.T          # (R_out*n, R_out*n)
            t_k = s[:k, None] * ut[:, :k].T
        else:  # gram
            g = cm @ cm.T      # (R_out*n, R_out*n)
            w, V = jnp.linalg.eigh(g)
            u = V[:, ::-1]
            t_k = u[:, :k].T @ cm
        u_k = u[:, :k]
        pad = jnp.zeros((R_out * n, R_out - k), dtype=u.dtype)
        new_core = jnp.concatenate([u_k, pad], axis=1).reshape(R_out, n, R_out)
        T_new = jnp.concatenate(
            [t_k, jnp.zeros((R_out - k, R), dtype=u.dtype)], axis=0)
        return (T_new,), new_core

    T0 = jnp.zeros((R_out, R), dtype=y.dtype).at[0, 0].set(1.0)
    (T,), cores = lax.scan(step, (T0,), y[:-1])
    last = jnp.einsum("ab,bnc->anc", T, y[d - 1])[:, :, :1]
    last = jnp.pad(last, ((0, 0), (0, 0), (0, R_out - 1)))
    return jnp.concatenate([cores, last[None]], axis=0)


def main():
    import numpy as np

    d, R, n, R_out = 12, 256, 2, 16
    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.standard_normal((d, R, n, R)) * 0.05,
                    dtype=jnp.float32)

    def wide_noscan(cm):
        u, s, vt = jnp.linalg.svd(cm, full_matrices=False)
        return u * s[None, :]

    cm0 = jnp.asarray(rng.standard_normal((R_out * n, R)), dtype=jnp.float32)
    probe("e_svd_wide_noscan", wide_noscan, cm0)
    probe("f_svd_tall_scan", lambda yy: svd_scan(yy, R_out, "tall"), y)
    probe("g_gram_eigh_scan", lambda yy: svd_scan(yy, R_out, "gram"), y)


if __name__ == "__main__":
    main()
