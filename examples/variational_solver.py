"""Three ways to solve kappa*Delta u = f on a QTT grid: variational gradient
descent, MALS, and a TT-valued Krylov solve (mirrors
/root/reference/examples/variational_solver.jl).

Run: python examples/variational_solver.py
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
from ttnx import dot, matvec, norm, sub

d = 6
kappa = 0.1
A = kappa * ttnx.toeplitz_to_qtto(2.0, -1.0, -1.0, d)
f = ttnx.qtt_sin(d, lam=np.pi)
x0 = ttnx.rand_tt(jax.random.PRNGKey(0), f.dims, rks=f.ranks, normalise=True)


def energy(u):
    # 0.5 <u, A u> - <f, u>; gradient = A u - f (A SPD)
    return (0.5 * jax.numpy.real(dot(u, matvec(A, u)))
            - jax.numpy.real(dot(f, u)))


x_gd, hist = ttnx.manifold_gradient_descent(energy, x0, steps=300, lr=0.4,
                                            max_bond=8)
res_gd = float(norm(sub(matvec(A, x_gd), f)) / norm(f))
print(f"gradient descent:   relative residual = {res_gd:.2e}")

x_mals = ttnx.mals_linsolve(A, f, x0, tol=1e-12, rmax=16)
res_mals = float(norm(sub(matvec(A, x_mals), f)) / norm(f))
print(f"mals_linsolve:      relative residual = {res_mals:.2e}")
assert res_mals < 1e-10, res_mals

x_kry = ttnx.krylov_linsolve(A, f, x0, krylov_solver="cg", maxiter=120,
                             krylovdim=10, rtol=1e-10, issymmetric=True,
                             isposdef=True)
res_kry = float(norm(sub(matvec(A, x_kry), f)) / norm(f))
print(f"krylov_linsolve:    relative residual = {res_kry:.2e}")
assert res_kry < 1e-5, res_kry

# unpreconditioned gradient descent on kappa*Delta stalls at the
# conditioning limit (cond ~ (2/pi h)^2 ~ 1.7e3); the reference's OptimKit
# GradientDescent behaves the same and its example asserts nothing — we
# assert monotone descent only and report the energies
e_exact = float(energy(x_mals))
print(f"energies: gd {hist[-1]:.1f} vs exact {e_exact:.1f} "
      f"(steepest descent stalls on cond~2e3 — see comment)")
assert hist[-1] <= hist[0]
print("variational_solver OK")
