"""README quick-start: solve A x = b with ALS at fixed ranks
(mirrors /root/reference/README.md:82-103).

Run: python examples/als_quickstart.py  (add TTNX_CPU=1 to force CPU)
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

d = 6
A = ttnx.id_tto(d)
b = ttnx.qtt_sin(d)
x0 = ttnx.rand_tt(jax.random.PRNGKey(0), (2,) * d, rmax=4, normalise=True)

x = ttnx.als_linsolve(A, b, x0, sweep_count=4)

sol = np.asarray(ttnx.qtt_to_vector(x))
ref = np.asarray(ttnx.qtt_to_vector(b))
rel = np.linalg.norm(sol - ref) / np.linalg.norm(ref)
print(f"relative error: {rel:.3e}")           # ~1e-16
assert rel < 1e-12

# the same solve through the jitted scan path (one XLA program)
from ttnx.solvers.als_scan import als_linsolve_scan

x2 = als_linsolve_scan(A, b, x0, sweep_count=4)
rel2 = np.linalg.norm(np.asarray(ttnx.qtt_to_vector(x2)) - ref) / np.linalg.norm(ref)
print(f"scan-path relative error: {rel2:.3e}")
assert rel2 < 1e-12
