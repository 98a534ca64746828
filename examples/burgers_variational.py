"""Variational implicit time stepping for viscous Burgers in QTT
(mirrors /root/reference/examples/Burgers_variational.jl).

Each implicit-Euler step minimizes the squared residual

    J(u) = 0.5 * dx * dt * || (u - v)/dt + 0.5*Dx(u*u) + nu*Dxx u ||^2

over the TT cores of u. Where the reference hand-derives an *approximate*
gradient and feeds it to OptimKit, here the cost is a pure function of the
core pytree and `jax.value_and_grad` delivers the exact gradient through the
Hadamard square, the MPO applications, and the TT inner product — gradients
live in core space (multilinear parametrization), and the whole optimizer
step is one jitted program.

Validation: dense Newton on the identical discretization (operator matrices
taken from the same QTT stencils via qtto_to_matrix).
"""

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

if os.environ.get("TTNX_CPU"):
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
import optax

import ttnx

d = 6
L, T_final, nu = 1.0, 0.2, 0.05
n_steps = 10
N = 2 ** d
dx = L / N
dt = T_final / n_steps

Dx = (1.0 / dx) * ttnx.gradient(d)          # forward difference
Dxx = (1.0 / dx ** 2) * ttnx.laplacian_DN(d)  # -d^2/dx^2 (Dirichlet-Neumann)

u0 = ttnx.qtt_sin(d, lam=0.5)               # sin(pi x / 2) on [0, 1]
max_bond = 8                                 # full feasible rank at d=6


def residual_tt(u: ttnx.TTVector, v: ttnx.TTVector) -> ttnx.TTVector:
    nl = 0.5 * (Dx @ ttnx.hadamard(u, u))
    return (1.0 / dt) * (u - v) + nl + nu * (Dxx @ u)


def cost(u: ttnx.TTVector, v: ttnx.TTVector):
    r = residual_tt(u, v)
    return 0.5 * dx * dt * jnp.real(ttnx.dot(r, r))


opt = optax.adam(2e-3)


@jax.jit
def opt_step(u, v, state):
    val, g = jax.value_and_grad(cost)(u, v)
    updates, state = opt.update(g, state, u)
    return optax.apply_updates(u, updates), state, val


# dense Newton reference on the same discretization
Dx_m = np.asarray(ttnx.qtto_to_matrix(Dx))
Dxx_m = np.asarray(ttnx.qtto_to_matrix(Dxx))


def dense_step(v: np.ndarray) -> np.ndarray:
    u = v.copy()
    for _ in range(30):
        F = (u - v) / dt + 0.5 * Dx_m @ (u * u) + nu * Dxx_m @ u
        Jm = np.eye(N) / dt + Dx_m * u[None, :] + nu * Dxx_m
        du = np.linalg.solve(Jm, -F)
        u = u + du
        if np.linalg.norm(du) < 1e-13:
            break
    return u


v = ttnx.increase_ranks(u0, max_bond, noise=1e-6, key=jax.random.PRNGKey(0))
v_dense = np.asarray(ttnx.qtt_to_function(u0))

for k in range(n_steps):
    u, state = v, opt.init(v)
    for _ in range(600):
        u, state, val = opt_step(u, v, state)
    v = ttnx.tt_round(u, max_bond=max_bond)
    v_dense = dense_step(v_dense)
    rel = (np.linalg.norm(np.asarray(ttnx.qtt_to_function(v)) - v_dense)
           / np.linalg.norm(v_dense))
    print(f"t={dt * (k + 1):5.3f}  J={float(val):.3e}  "
          f"rel err vs dense Newton {rel:.3e}")

assert rel < 2e-3, "variational QTT solution must track dense Newton"
# viscosity + outflow keep the solution bounded by the initial profile
assert np.max(np.abs(v_dense)) <= 1.0 + 1e-8
print("OK")
