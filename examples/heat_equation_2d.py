"""2-D heat equation by TDVP on a QTT grid
(mirrors /root/reference/examples/heat_equation.jl and the tdvp heat
eigenmode test): an eigenmode initial state decays as exp(lambda t)."""

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

if os.environ.get("TTNX_CPU"):
    jax.config.update("jax_platforms", "cpu")

import numpy as np

import ttnx
from ttnx import (
    QTTOperator,
    QTTVector,
    dot,
    id_tto,
    kron_tt,
    kron_tto,
    qtt_sin,
    qttv_to_array,
    toeplitz_to_qtto,
)
from ttnx.solvers.tdvp import tdvp2

d = 5
N = 2 ** d
h = 1.0 / (N + 1)
kappa = 0.1

lap1d = toeplitz_to_qtto(-2.0, 1.0, 1.0, d)
A_raw = (kappa / h ** 2) * (
    kron_tto(lap1d, id_tto(d)) + kron_tto(id_tto(d), lap1d))
A = QTTOperator(A_raw, 2, d, "serial")

u0_raw = kron_tt(qtt_sin(d, a=h, b=1 - h), qtt_sin(d, a=h, b=1 - h))
u0 = QTTVector(u0_raw, 2, d, "serial")
lam = float(np.real(dot(u0_raw, A_raw @ u0_raw) / dot(u0_raw, u0_raw)))
print(f"eigenmode rate lambda = {lam:.4f}")

steps = [1e-3] * 10
sol = tdvp2(A.tt(), u0.tt(), steps, imaginary_time=True, normalize=False,
            max_bond=8, truncerr=1e-12)
out = np.asarray(qttv_to_array(QTTVector(sol, 2, d, "serial")))
target = np.exp(lam * sum(steps)) * np.asarray(qttv_to_array(u0))
rel = np.linalg.norm(out - target) / np.linalg.norm(target)
print(f"relative error vs analytic decay: {rel:.3e}")
assert rel < 1e-6
