"""2-D Laplace equation with Dirichlet data in QTT format
(mirrors /root/reference/examples/Laplace_pde.jl): solve Delta u = 0 on the
unit square with u(x,0) = sin(pi x), other boundaries zero, via MALS (one
sweep) and DMRG, and compare with the separable exact solution
u(x,y) = sin(pi x) sinh(pi(1-y)) / sinh(pi).
"""

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

if os.environ.get("TTNX_CPU"):
    jax.config.update("jax_platforms", "cpu")

import numpy as np

from ttnx import (
    QTTVector,
    dmrg_linsolve,
    id_tto,
    kron_tt,
    kron_tto,
    mals_linsolve,
    qtt_basis_vector,
    qtt_sin,
    qttv_to_array,
    rand_tt,
    toeplitz_to_qtto,
)
from ttnx.core.algebra import add_op, scale, scale_op

d = 7                       # 2^d interior points per dimension
N = 2 ** d
h = 1.0 / (N + 1)           # interior spacing, zero Dirichlet ghost points
xes = h * np.arange(1, N + 1)

# interior-only 2-D Laplacian: the u=0 ghost values drop out of the stencil
lap1d = toeplitz_to_qtto(-2.0, 1.0, 1.0, d)
A = scale_op(1.0 / h ** 2,
             add_op(kron_tto(lap1d, id_tto(d)), kron_tto(id_tto(d), lap1d)))

# bottom boundary u(x, 0) = sin(pi x) contributes -sin(pi x_i)/h^2 at y = h
b = scale(-1.0 / h ** 2,
          kron_tt(qtt_sin(d, a=h, b=1 - h, lam=1.0), qtt_basis_vector(d, 0)))

key = jax.random.PRNGKey(0)
x0 = rand_tt(key, b.dims, rks=b.ranks)

x_mals = mals_linsolve(A, b, x0)
x_dmrg = dmrg_linsolve(A, b, x0, sweep_schedule=[10], rmax_schedule=[40],
                       tol=1e-12)

u_exact = (np.sin(np.pi * xes)[:, None]
           * np.sinh(np.pi * (1 - xes))[None, :] / np.sinh(np.pi))

for name, sol in [("MALS (1 sweep)", x_mals), ("DMRG", x_dmrg)]:
    grid = np.asarray(qttv_to_array(QTTVector(sol.cores, 2, d, "serial")))
    err = float(np.max(np.abs(grid - u_exact)))
    print(f"{name:15s} max rank {max(sol.ranks):3d}  "
          f"Linf err vs exact: {err:.3e}")
    # second-order 5-point stencil: discretization floor ~ h^2
    assert err < 20 * h ** 2, f"{name} did not solve the Laplace system"

print("done; both solvers reproduce sin(pi x) sinh(pi (1-y)) / sinh(pi)")
