"""DMRG quick-start: linear solve + staged-schedule eigensolve on small
random/spin systems (mirrors /root/reference/examples/dmrg_example.jl, with
dense cross-checks added so the script asserts its answers).
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
from ttnx import dmrg_eigsolve, dmrg_linsolve, rand_tt, xxz_tto
from ttnx.core.algebra import add_op, matmul, matvec, norm, sub

d = 3
key = jax.random.PRNGKey(0)

# --- linear solve with an SPD operator A = B^T B + I -----------------------
B = ttnx.rand_tto(jax.random.PRNGKey(1), (2,) * d, rmax=2)
A = add_op(matmul(B.transpose(), B), ttnx.id_tto(d))
b = rand_tt(jax.random.PRNGKey(2), (2,) * d, rmax=2)
x0 = rand_tt(jax.random.PRNGKey(3), (2,) * d, rmax=2)
x = dmrg_linsolve(A, b, x0, n_sites=2, tol=1e-12)
res = float(norm(sub(matvec(A, x), b)) / norm(b))
print(f"DMRG linsolve residual: {res:.3e}")
assert res < 1e-10

# --- staged eigensolve: sweep_schedule + rmax_schedule ----------------------
d = 6
H = xxz_tto(d, delta=0.7, h=0.3)
x0 = rand_tt(key, (2,) * d, rmax=2, normalise=True)
E, gs, r_hist = dmrg_eigsolve(H, x0, n_sites=2, tol=1e-12,
                              sweep_schedule=[2, 4], rmax_schedule=[4, 10])
dense = np.asarray(ttnx.tto_to_tensor(H)).reshape(2 ** d, 2 ** d)
e_exact = np.linalg.eigvalsh(0.5 * (dense + dense.T)).min()
print(f"XXZ d={d}: DMRG E0={E[-1]:.10f}  dense E0={e_exact:.10f}  "
      f"rank history {r_hist}")
assert abs(E[-1] - e_exact) < 1e-8
# the staged schedule grows ranks: history ends at the widest stage
assert max(r_hist) == 10 or max(r_hist) >= 8
print("dmrg_quickstart OK")
