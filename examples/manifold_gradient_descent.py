"""Riemannian-style gradient descent on the TT manifold (mirrors
/root/reference/examples/manopt_ttvector_gradient_descent.jl, which drives
Manopt.jl; here the manifold utilities are native ttnx.utils.manifold).

Minimize the quadratic cost 0.5 ||x - target||^2 by retraction steps
x <- retract(x, -grad) and check convergence to the target, plus the same
descent through optax on the core pytree (the JAX-native optimizer path).
"""

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

if os.environ.get("TTNX_CPU"):
    jax.config.update("jax_platforms", "cpu")

import numpy as np

from ttnx import qtt_sin, zeros_tt
from ttnx.core.algebra import scale, sub
from ttnx.utils.manifold import (distance, manifold_norm, retract,
                                 ttvector_manifold)

d = 6
target = qtt_sin(d)
M = ttvector_manifold(target)
x = zeros_tt((2,) * d, target.ranks)

# gradient of 0.5||x - target||^2 is (x - target); constant step 1.0 solves
# the quadratic in one retraction, further steps polish
for it in range(5):
    g = sub(x, target)
    gn = float(manifold_norm(x, g))
    x = retract(x, scale(-1.0, g))
    if gn < 1e-5:
        break
rel = float(distance(x, target)) / float(manifold_norm(target, target))
print(f"manifold descent: {it + 1} iters, rel err (TT metric) {rel:.3e}")
# the TT-metric distance of a tiny difference saturates at ~sqrt(eps)*||t||
# by cancellation; the densified comparison shows the true accuracy
from ttnx import ttv_to_tensor

vx = np.asarray(ttv_to_tensor(x)).reshape(-1)
vt = np.asarray(ttv_to_tensor(target)).reshape(-1)
dense_rel = np.linalg.norm(vx - vt) / np.linalg.norm(vt)
print(f"manifold descent: dense rel err {dense_rel:.3e}")
assert rel < 1e-6 and dense_rel < 1e-12

# optax path: the TT is a pytree, so any JAX optimizer applies per-core.
# Gradients live in CORE space (multilinear parametrization) — per-core
# updates, never TT-vector addition of the gradient.
import optax
from ttnx import TTVector, dot
from ttnx.core.algebra import norm


def cost(cores):
    y = TTVector(list(cores))
    diff = sub(y, target)
    return 0.5 * jax.numpy.real(dot(diff, diff))


cores = tuple(c for c in qtt_sin(d, lam=2 * np.pi).cores)  # off-target start
opt = optax.adam(0.1)
state = opt.init(cores)
val_grad = jax.jit(jax.value_and_grad(cost))
best_v, best_cores = np.inf, cores
for it in range(500):
    v, g = val_grad(cores)
    if float(v) < best_v:
        best_v, best_cores = float(v), cores
    updates, state = opt.update(g, state, cores)
    cores = optax.apply_updates(cores, updates)
final = float(norm(sub(TTVector(list(best_cores)), target)))
rel_final = final / float(norm(target))
print(f"optax adam on cores: 500 iters, best rel ||x - target|| = "
      f"{rel_final:.3e}")
assert rel_final < 1e-4
print("manifold_gradient_descent OK")
