"""Batched TT-cross parameter sweep on the device (BASELINE config 5).

The device cross (ttnx.cross.device) runs the ENTIRE fixed-rank MaxVol
sweep as one jitted program, so `jax.vmap` over an integrand parameter
batches independent crosses into a single XLA program — the continuous-
batching workload the multi-host scaling target shards over `dp`. No
reference counterpart (the reference cross is single-problem host code,
/root/reference/src/tt_cross_interpolation.jl:189-317); accuracy contract
mirrored from the 5-D Wishart test
(/root/reference/test/test_tt_cross_interpolation.jl:147-186).
"""

import os
import sys
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

if os.environ.get("TTNX_CPU"):
    jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

from ttnx.cross.device import (
    evaluate_tt_indices,
    maxvol_cross_device,
)

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
sigma = jnp.asarray(2 * Sigma)
grid = jnp.linspace(0.0, 2.0, 8)

# Wishart Laplace-transform integrand with a scale parameter theta:
# f_theta(x) = det(I + theta * sigma .* x)^(-p)


def f_idx(theta, indices):
    coords = jnp.take(grid, indices)              # (m, d)
    M = jnp.eye(d)[None] + theta * sigma[None] * coords[:, None, :]
    return jnp.linalg.det(M) ** (-p)


def run_one(theta, key):
    fn = maxvol_cross_device(partial(f_idx, theta), [8] * d, rank=8,
                             n_iters=3, n_val=500)
    return fn(key)


thetas = jnp.linspace(0.5, 2.0, 16)
key = jax.random.PRNGKey(0)
batched = jax.jit(jax.vmap(run_one, in_axes=(0, None)))
cores_b, eps_b = batched(thetas, key)
print(f"batched cross over {len(thetas)} thetas: "
      f"final val-eps max {float(jnp.max(eps_b[:, -1])):.2e}")

# spot-check each theta against direct integrand evaluation
rng = np.random.default_rng(7)
idx = jnp.asarray(np.stack([rng.integers(0, 8, 300) for _ in range(d)],
                           axis=1))
worst = 0.0
for k in range(len(thetas)):
    cores_k = [c[k] for c in cores_b]
    yhat = np.asarray(evaluate_tt_indices(cores_k, idx))
    ys = np.asarray(f_idx(thetas[k], idx))
    rel = np.linalg.norm(ys - yhat) / np.linalg.norm(ys)
    worst = max(worst, rel)
    if k % 4 == 0:
        print(f"  theta={float(thetas[k]):.2f}  rel_l2={rel:.2e}")
print(f"worst rel_l2 over the sweep: {worst:.2e}")
assert worst < 1e-4, worst
