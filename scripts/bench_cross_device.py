"""Wall-clock before/after for TT-cross: host path (NumPy maxvol sweeps) vs
the device path (whole fixed-rank MaxVol cross as one jitted program) on the
5-D Wishart Laplace transform (VERDICT r2 item 3 'Done' measurement).

Run with TTNX_CPU=1 for the CPU comparison (both paths on the 2 host cores —
measures the jit/fusion win) or on the TPU platform (device path on chip).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("TTNX_CPU"):
    jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp


def main():
    from ttnx.cross.cross import MaxVol, tt_cross, _evaluate_tt
    from ttnx.cross.device import evaluate_tt_indices, tt_cross_device

    d = 5
    nu = d + 2
    p = nu / 2
    Sigma = np.array([
        [1.0, 0.3, 0.2, 0.1, 0.18],
        [0.3, 1.2, 0.25, 0.15, 0.22],
        [0.2, 0.25, 0.9, 0.2, 0.28],
        [0.1, 0.15, 0.2, 1.1, 0.19],
        [0.18, 0.22, 0.28, 0.19, 1.05],
    ])
    sigma_np = 2 * Sigma
    sigma = jnp.asarray(sigma_np)
    domain = [np.linspace(0.0, 2.0, 8)] * d

    def f_np(X):
        out = np.empty(X.shape[0])
        eye = np.eye(d)
        for i in range(X.shape[0]):
            out[i] = np.linalg.det(eye + sigma_np * X[i][None, :]) ** (-p)
        return out

    def f_jax(X):
        M = jnp.eye(d)[None] + sigma[None] * X[:, None, :]
        return jnp.linalg.det(M) ** (-p)

    rng = np.random.default_rng(2027)
    idx = np.stack([rng.integers(0, 8, 400) for _ in range(d)], axis=1)
    coords = np.stack([domain[k][idx[:, k]] for k in range(d)], axis=1)
    ys = np.asarray(f_jax(jnp.asarray(coords)))

    # --- host path (reference-parity, NumPy) ---
    t0 = time.perf_counter()
    tt_h = tt_cross(f_np, domain,
                    MaxVol(tol=1e-6, maxiter=25, rmax=60, kickrank=2),
                    ranks=2, val_size=1500, seed=2026)
    t_host = time.perf_counter() - t0
    yh = _evaluate_tt([np.asarray(c) for c in tt_h.cores], idx)
    rel_h = np.linalg.norm(ys - yh) / np.linalg.norm(ys)

    # --- device path (jitted fixed-rank; build once, time compile and
    #     execution separately) ---
    from ttnx.cross.device import index_evaluator, maxvol_cross_device

    f_idx = index_evaluator(f_jax, domain)
    run = jax.jit(maxvol_cross_device(f_idx, [8] * d, rank=8, n_iters=4,
                                      n_val=1500))
    key = jax.random.PRNGKey(2026)
    t0 = time.perf_counter()
    cores, eps = jax.block_until_ready(run(key))
    t_dev_cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    n_rep = 10
    for _ in range(n_rep):
        cores, eps = jax.block_until_ready(run(key))
    t_dev_warm = (time.perf_counter() - t0) / n_rep
    yd = np.asarray(evaluate_tt_indices(list(cores), jnp.asarray(idx)))
    rel_d = np.linalg.norm(ys - yd) / np.linalg.norm(ys)

    print(f"host  path: {t_host:8.3f} s   rel_l2 {rel_h:.2e} "
          f"ranks {tt_h.ranks}")
    print(f"device path: compile+run {t_dev_cold:7.3f} s / "
          f"warm run {t_dev_warm * 1e3:7.1f} ms   rel_l2 {rel_d:.2e}")
    print(f"speedup (warm, vs host): {t_host / t_dev_warm:.1f}x")

    # --- batched parameter sweep (BASELINE config 5): vmap over a scale
    #     parameter of the integrand ---
    thetas = jnp.linspace(0.5, 2.0, 64)

    def f_idx_theta(theta, indices):
        grids = jnp.asarray(domain[0])
        coords = jnp.take(grids, indices)
        M = jnp.eye(d)[None] + theta * sigma[None] * coords[:, None, :]
        return jnp.linalg.det(M) ** (-p)

    def run_one(theta, k2):
        from functools import partial
        fn = maxvol_cross_device(partial(f_idx_theta, theta), [8] * d,
                                 rank=8, n_iters=3, n_val=200)
        return fn(k2)

    batched = jax.jit(jax.vmap(run_one, in_axes=(0, None)))
    t0 = time.perf_counter()
    cores_b, eps_b = jax.block_until_ready(batched(thetas, key))
    t_b_cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    cores_b, eps_b = jax.block_until_ready(batched(thetas, key))
    t_b_warm = time.perf_counter() - t0
    print(f"batched sweep (64 thetas): compile+run {t_b_cold:.2f} s, warm "
          f"{t_b_warm:.3f} s = {64 / t_b_warm:.1f} crosses/s; "
          f"max val-eps {float(jnp.max(eps_b[:, -1])):.2e}")


if __name__ == "__main__":
    main()
