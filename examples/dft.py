"""Quantics DFT: recover the spectrum of a band-limited signal from its QTT
(mirrors /root/reference/examples/dft.jl, including the 1e-8 / 1e-10
assertions)."""

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
N = 2 ** d
K = 50
rng = np.random.default_rng(1234)
r = 12
coeffs = rng.standard_normal(r) + 1j * rng.standard_normal(r)


def f(x):
    ks = np.arange(r)
    x = np.atleast_1d(x)
    return (coeffs[None, :] * np.exp(2j * np.pi * ks[None, :] * x[:, None])).sum(1)


F = ttnx.fourier_qtto(d, K=K, sign=-1.0, normalize=True)
x_qtt = ttnx.function_to_qtt_uniform(f, d)
y_qtt = ttnx.tt_compress(F @ x_qtt, 100)

spec = np.asarray(ttnx.qtt_to_vector(y_qtt))
scale = np.sqrt(N)

in_band = np.linalg.norm(spec[:r] - scale * coeffs) / (scale * np.linalg.norm(coeffs))
out_band = np.linalg.norm(spec[r:]) / np.linalg.norm(spec)
print(f"in-band recovery error:  {in_band:.3e}")
print(f"out-of-band energy:      {out_band:.3e}")
assert in_band < 1e-8
assert out_band < 1e-10
print("recovered coefficients:", np.round(spec[:r] / scale, 6))
