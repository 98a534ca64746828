"""TT quadrature and black-box cross approximation showcase
(mirrors /root/reference/examples/cross.jl): Gauss-Legendre TT integration
of 1-D/2-D/6-D/high-dimensional integrands with known closed forms.
"""

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

if os.environ.get("TTNX_CPU"):
    jax.config.update("jax_platforms", "cpu")

import numpy as np

from ttnx.cross import MaxVol, tt_integrate

print("1. int_0^1 x^2 dx = 1/3")
r1 = float(tt_integrate(lambda x: x[:, 0] ** 2, 1))
print(f"   result {r1:.12f}  exact {1 / 3:.12f}")
assert abs(r1 - 1 / 3) < 1e-10

print("2. int_0^1 int_0^1 x y dx dy = 1/4")
r2 = float(tt_integrate(lambda x: x[:, 0] * x[:, 1], 2))
print(f"   result {r2:.12f}  exact 0.25")
assert abs(r2 - 0.25) < 1e-10

print("3. int_[0,1]^6 sin(sum x) dx  (rank-2 integrand)")
r3 = float(tt_integrate(lambda x: np.sin(np.sum(x, axis=1)), 6,
                        alg=MaxVol(tol=1e-8)))
exact3 = float(np.imag((np.exp(1j) - 1) ** 6 / 1j ** 6))
print(f"   result {r3:.10f}  exact {exact3:.10f}")
assert abs(r3 - exact3) < 1e-8

print("4. int_[-5,5]^d exp(-||x||^2) dx = pi^(d/2)")
for d in [10, 20]:
    f = lambda x: np.exp(-np.sum(x ** 2, axis=1))
    r = float(tt_integrate(f, lower=[-5.0] * d, upper=[5.0] * d,
                           alg=MaxVol(tol=1e-8)))
    exact = np.pi ** (d / 2)
    rel = abs(r - exact) / exact
    print(f"   d={d:2d}  rel err {rel:.3e}")
    assert rel < 1e-8

print("all quadratures match their closed forms")
