"""1-site vs 2-site TDVP on an imaginary-time Toeplitz evolution (mirrors
/root/reference/examples/tdvp_example.jl): evolve qtt_sin under
h^2 * toeplitz(-3, 5, 9) in imaginary time with both integrators and check
they agree with each other and with the dense matrix exponential.
"""

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

if os.environ.get("TTNX_CPU"):
    jax.config.update("jax_platforms", "cpu")

import numpy as np
import scipy.linalg

from ttnx import qtt_sin, qtt_to_vector, qtto_to_matrix, tdvp, tdvp2, \
    toeplitz_to_qtto

d = 6
N = 2 ** d
h = 1.0 / (N - 1)
A = (h ** 2) * toeplitz_to_qtto(-3.0, 5.0, 9.0, d)

u0 = qtt_sin(d, lam=np.pi)
dt = 1e-2
nsteps = 40
steps = [dt] * nsteps

sol1 = tdvp(A, u0, steps, imaginary_time=True, sweeps=2, normalize=True)
sol2 = tdvp2(A, u0, steps, imaginary_time=True, sweeps=1, normalize=True,
             max_bond=10)

v1 = np.asarray(qtt_to_vector(sol1))
v2 = np.asarray(qtt_to_vector(sol2))

# dense reference: normalized exp(T A) u0
M = np.asarray(qtto_to_matrix(A))
ref = scipy.linalg.expm(nsteps * dt * M) @ np.asarray(qtt_to_vector(u0))
ref /= np.linalg.norm(ref)


def aligned_err(v, ref):
    v = v / np.linalg.norm(v)
    sign = np.sign(v @ ref)
    return float(np.linalg.norm(sign * v - ref))


e1, e2 = aligned_err(v1, ref), aligned_err(v2, ref)
print(f"tdvp  (1-site, fixed rank) vs dense expm: {e1:.3e}")
print(f"tdvp2 (2-site, adaptive)   vs dense expm: {e2:.3e}")
# The gap is structural, not a tolerance: the exact flow leaves the rank-2
# manifold of u0, and 1-site TDVP cannot grow ranks through the
# near-zero singular directions (the classic TDVP rank-growth limitation —
# the error is independent of dt and of zero-padded rank headroom), while
# the 2-site integrator adapts ranks and tracks expm to machine precision.
assert e2 < 1e-10, e2
assert e1 < 1e-3, e1
assert e2 < e1 / 100
print(f"tdvp2 adapted ranks: {sol2.ranks}")
print("tdvp_comparison OK")
