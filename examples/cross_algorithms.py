"""TT-cross algorithm comparison on sin(x1+...+x6) (mirrors the
tt_cross half of /root/reference/examples/cross.jl): approximate the same
6-D function with MaxVol, DMRG-cross, and Greedy, densify, and check all
three against the exact tensor. sin of a sum has exact TT rank 2, so every
algorithm should nail it at tiny rank.
"""

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

if os.environ.get("TTNX_CPU"):
    jax.config.update("jax_platforms", "cpu")

import numpy as np

from ttnx import DMRG, Greedy, MaxVol, tt_cross, ttv_to_tensor

n, d = 8, 6
domain = [np.linspace(0.0, np.pi, n) for _ in range(d)]
f = lambda X: np.sin(np.sum(X, axis=1))

exact = np.zeros((n,) * d)
grids = np.meshgrid(*domain, indexing="ij")
exact = np.sin(sum(grids))

algs = {
    "MaxVol": (MaxVol(tol=1e-12), dict(ranks=4)),
    "DMRG": (DMRG(tol=1e-8, maxiter=25), dict(ranks=4)),
    "Greedy": (Greedy(tol=1e-12, maxiter=100), {}),
}
for name, (alg, kw) in algs.items():
    tt = tt_cross(f, domain, alg, **kw)
    approx = np.asarray(ttv_to_tensor(tt))
    rel = np.linalg.norm(approx - exact) / np.linalg.norm(exact)
    print(f"{name:7s} ranks {tt.ranks}  rel err {rel:.3e}")
    assert rel < 1e-10, (name, rel)
    assert max(tt.ranks) <= 4

# spot checks at random indices
rng = np.random.default_rng(0)
tt = tt_cross(f, domain, MaxVol(tol=1e-12), ranks=4)
approx = np.asarray(ttv_to_tensor(tt))
for _ in range(5):
    idx = tuple(rng.integers(0, n, d))
    coords = [domain[k][idx[k]] for k in range(d)]
    assert abs(approx[idx] - np.sin(sum(coords))) < 1e-10
print("cross_algorithms OK")
