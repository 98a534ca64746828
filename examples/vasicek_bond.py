"""Vasicek zero-coupon bond pricing as a Feynman-Kac (discounted backward)
equation in QTT (mirrors /root/reference/examples/Vasicek_bond.jl).

Short rate follows the OU process dr = theta*(mu - r) dt + sigma dW. The bond
price P(r, tau) = E[exp(-int_0^tau r_s ds) | r_0 = r] solves

    dP/dtau = L_FK P,   P(r, 0) = 1,
    L_FK = -theta * diag(r - mu) d_r + (sigma^2/2) d_rr - diag(r),

i.e. the Kolmogorov backward generator plus a *potential* (diagonal discount)
term. Vasicek has the affine closed form P = exp(A(tau) - B(tau) r), so the
whole pipeline — non-symmetric generator assembly from QTT stencils +
diagonal-lift MPOs, rank-enriched constant payoff, Crank-Nicolson + ALS —
validates against an exact formula.
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

theta, mu, sigma = 0.5, 0.05, 0.03
D = sigma ** 2 / 2

d = 8
N = 2 ** d
a, b = -0.1, 0.25  # rate grid (allows mildly negative rates)
h = (b - a) / (N - 1)
rs = np.linspace(a, b, N)

# discounted backward generator  L_FK = -theta*M*d_r + D*d_rr - X
d_r = (1.0 / (2 * h)) * (ttnx.shift(d) - (ttnx.id_tto(d) - ttnx.gradient(d)))
d_rr = (-1.0 / h ** 2) * ttnx.laplacian(d)
M = ttnx.ttv_to_diag_tto(ttnx.qtt_polynom([-mu, 1.0], d, a=a, b=b))
X = ttnx.ttv_to_diag_tto(ttnx.qtt_polynom([0.0, 1.0], d, a=a, b=b))
L_FK = (-theta) * (M @ d_r) + D * d_rr - X

# terminal payoff P(r, 0) = 1, rank-enriched so ALS can grow the profile
u0 = ttnx.increase_ranks(ttnx.function_to_qtt(lambda t: 1.0, d), 6,
                         noise=1e-3, key=jax.random.PRNGKey(42))


def B(tau):
    return (1 - np.exp(-theta * tau)) / theta


def A(tau):
    return ((B(tau) - tau) * (theta ** 2 * mu - sigma ** 2 / 2) / theta ** 2
            - sigma ** 2 * B(tau) ** 2 / (4 * theta))


def p_analytic(r, tau):
    return np.exp(A(tau) - B(tau) * r)


tau_step, record_dt, T = 0.05, 0.5, 2.0
blk = round(record_dt / tau_step)
nblk = round(T / record_dt)
interior = (rs >= -0.02) & (rs <= 0.18)

psi = u0
rel_errs = []
for k in range(1, nblk + 1):
    psi = ttnx.crank_nicholson_method(L_FK, psi, psi, [tau_step] * blk,
                                      normalize=False, tt_solver="als")
    tau = k * record_dt
    P = np.asarray(ttnx.qtt_to_function(psi))
    exact = p_analytic(rs[interior], tau)
    rel = float(np.max(np.abs(P[interior] - exact) / exact))
    rel_errs.append(rel)
    i_mu = int(np.argmin(np.abs(rs - mu)))
    print(f"tau={tau:4.1f}y  P(mu)={P[i_mu]:.6f} "
          f"(analytic {p_analytic(mu, tau):.6f})  max interior rel err "
          f"{rel:.3e}  max rank {max(psi.ranks)}")

assert max(rel_errs) < 5e-3, "QTT bond prices must track the closed form"
# bond price must be decreasing in the short rate at every maturity
Pfin = np.asarray(ttnx.qtt_to_function(psi))[interior]
assert np.all(np.diff(Pfin) < 0)
print("OK")
