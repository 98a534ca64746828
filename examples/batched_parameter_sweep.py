"""Continuous batching of independent QTT solves over a device mesh — the
north-star multi-host workload: a PDE parameter sweep where every device
solves its share of (I - dt*kappa*Laplacian) u = u0 systems in one jitted,
sharded program.

Run with virtual devices:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 TTNX_CPU=1 \
      python examples/batched_parameter_sweep.py
"""

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

if os.environ.get("TTNX_CPU"):
    jax.config.update("jax_platforms", "cpu")

import numpy as np

import ttnx
from ttnx.parallel.batch import batched_als_linsolve, make_mesh

d = 8
n = 2 ** d
h_grid = 1.0 / (n + 1)
dt = 1e-6
kappas = np.linspace(0.5, 4.0, 8)  # one diffusion coefficient per problem

u0 = ttnx.qtt_sin(d, a=h_grid, b=1 - h_grid)
lap = ttnx.toeplitz_to_qtto(2.0, -1.0, -1.0, d)

# all problems share the operator structure; fold kappa into the rhs scale
# by solving (I + dt*kappa/h^2 * lap) u = u0 for each kappa — here we batch
# over rhs/guess and loop operators (rank-1 differences), or simply run the
# shared-operator batch per kappa group. For the demo: one operator, many
# right-hand sides (different initial modes).
A = ttnx.id_tto(d) + (dt * float(kappas[0]) / h_grid ** 2) * lap

keys = jax.random.split(jax.random.PRNGKey(0), 8)
bs = [ttnx.qtt_sin(d, a=h_grid, b=1 - h_grid, lam=k + 1) for k in range(8)]
x0s = [ttnx.rand_tt(keys[k], (2,) * d, rmax=6, normalise=True)
       for k in range(8)]

n_dev = len(jax.devices())
mesh = make_mesh(dp=n_dev, tp=1)
print(f"mesh: {mesh.shape} ({n_dev} devices)")

outs = batched_als_linsolve(mesh, A, bs, x0s, sweep_count=4)

worst = 0.0
for k, out in enumerate(outs):
    res = float(ttnx.norm(ttnx.sub(ttnx.matvec(A, out), bs[k]))
                / ttnx.norm(bs[k]))
    worst = max(worst, res)
    print(f"problem {k} (mode {k + 1}): residual {res:.2e} "
          f"ranks {out.ranks}")
assert worst < 1e-6, worst
