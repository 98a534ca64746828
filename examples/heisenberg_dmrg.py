"""Heisenberg XYZ ground state via DMRG with adaptive rank truncation,
cross-checked against dense diagonalization
(mirrors /root/reference/examples/heisenberg_xyz_dmrg.jl)."""

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

if os.environ.get("TTNX_CPU"):
    jax.config.update("jax_platforms", "cpu")

import numpy as np

import ttnx

d = 10
H = ttnx.heisenberg_xyz_tto(d, jx=1.0, jy=1.0, jz=1.0)
x0 = ttnx.rand_tt(jax.random.PRNGKey(0), (2,) * d, rmax=2, normalise=True,
                  orthogonal=True)

E, psi, r_hist = ttnx.dmrg_eigsolve(H, x0, sweep_schedule=[2, 5],
                                    rmax_schedule=[8, 24], tol=1e-12)
print(f"DMRG ground-state energy: {E[-1]:.12f}  (max rank {max(psi.ranks)})")

w = np.linalg.eigvalsh(np.asarray(ttnx.qtto_to_matrix(H)))
print(f"dense diagonalization:    {w[0]:.12f}")
print(f"energy error:             {abs(E[-1] - w[0]):.3e}")
assert abs(E[-1] - w[0]) < 1e-8, "DMRG energy must match dense diagonalization"

entropy = ttnx.entanglement_entropy(psi)
print("entanglement entropy per bond:", np.round(entropy, 4))
