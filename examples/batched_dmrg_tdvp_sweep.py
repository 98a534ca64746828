"""Batched DMRG + TDVP parameter sweeps (BASELINE configs 3-4 as dp
workloads).

One `jax.vmap`-batched program solves a whole field sweep of Heisenberg XXZ
ground states (reference workload run one-at-a-time:
/root/reference/examples/heisenberg_xyz_dmrg.jl) and evolves a batch of
heat states with per-problem step sizes
(/root/reference/examples/tdvp_example.jl). Physics asserted across the
whole sweep axis: DMRG energies vs dense diagonalization, TDVP decay vs the
analytic eigenmode solution.
"""

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

if os.environ.get("TTNX_CPU"):
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
import jax.numpy as jnp

import ttnx
from ttnx.core.decomp import ttv_to_tensor, tto_to_tensor
from ttnx.parallel.batch import batched_dmrg_eig_sweeps, batched_tdvp1_steps
from ttnx.solvers.als_scan import pack_op, pack_tt, rank_masks, unpack_tt

d = 8
rmax = 16

# --- DMRG field sweep: H(lam) = XXZ + lam * Sz ------------------------------
lams = np.linspace(0.0, 1.5, 6)
ops = [ttnx.heisenberg_xyz_tto(d, jx=1.0, jy=1.0, jz=0.7, lam=lam, field="z")
       for lam in lams]
A_batch = jnp.stack([pack_op(H, max(H.ranks)) for H in ops])

key = jax.random.PRNGKey(0)
xs, ms = [], []
for k in jax.random.split(key, len(lams)):
    x = ttnx.rand_tt(k, (2,) * d, rmax=4, normalise=True, orthogonal=True)
    xs.append(pack_tt(x, rmax))
    ms.append(rank_masks(x.ranks, rmax))
x_batch, m_batch = jnp.stack(xs), jnp.stack(ms)

tol = jnp.float64(1e-10)
xb, mb, Eb = batched_dmrg_eig_sweeps(A_batch, x_batch, m_batch, tol, tol,
                                     n_sweeps=5)
E_sweep = np.asarray(Eb[:, -1])
E_exact = np.array([
    np.linalg.eigvalsh(np.asarray(tto_to_tensor(H)).reshape(2 ** d, 2 ** d)
                       )[0] for H in ops])
err = np.abs(E_sweep - E_exact)
print("lam       E_dmrg        E_exact       |err|")
for lam, Ed, Ee, e in zip(lams, E_sweep, E_exact, err):
    print(f"{lam:4.2f}  {Ed:12.8f}  {Ee:12.8f}  {e:.2e}")
assert np.all(err < 1e-7), err
# the field term must actually move the physics across the sweep
assert E_exact[0] > E_exact[-1] + 1.0

# --- TDVP sweep: one heat generator, a batch of step sizes ------------------
hg = 1.0 / (2 ** d + 1)
A = (-1.0 / hg ** 2) * ttnx.toeplitz_to_qtto(2.0, -1.0, -1.0, d)
u0 = ttnx.qtt_sin(d, a=hg, b=1 - hg)
A_stack = pack_op(A, max(A.ranks))
rks = ttnx.core.tt.r_and_d_to_rks(u0.ranks, (2,) * d, rmax=8)
# TDVP step contract: state packed in site-0 canonical form
x = pack_tt(ttnx.core.canonical.orthogonalize(u0, 0), 8)
m = rank_masks(rks, 8)
hs = jnp.asarray([1e-5, 2e-5, 4e-5, 8e-5])
n_steps = 4
out = batched_tdvp1_steps(A_stack, jnp.broadcast_to(x, (4,) + x.shape),
                          jnp.broadcast_to(m, (4,) + m.shape), hs,
                          n_steps=n_steps, imag_real=True)
mu1 = (2 - 2 * np.cos(np.pi * hg)) / hg ** 2
u0_dense = np.asarray(ttv_to_tensor(u0)).reshape(-1)
rels = []
for i, h in enumerate(np.asarray(hs)):
    got = np.asarray(ttv_to_tensor(unpack_tt(out[i], rks))).reshape(-1)
    expect = u0_dense * np.exp(-mu1 * n_steps * h)
    rels.append(np.linalg.norm(got - expect) / np.linalg.norm(expect))
print("tdvp batch rel errs:", ["%.1e" % r for r in rels])
assert max(rels) < 1e-8, rels
print("OK")
