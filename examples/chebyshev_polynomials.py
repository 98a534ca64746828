"""Exact QTT encodings of Chebyshev polynomials T0..T4 on [0,1]
(mirrors /root/reference/examples/chebyshev_polynomials.jl — the plot is
replaced by asserted value parity on the Chebyshev-Lobatto grid).

Run: python examples/chebyshev_polynomials.py
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

d = 8
# qtt_chebyshev(n, d) encodes T_n sampled on the shifted Chebyshev-Lobatto
# grid on [0,1] (reference src/qtt_tools.jl:196-222)
nodes, _ = ttnx.gauss_chebyshev_lobatto(2 ** d, shifted=True)
theta = np.arccos(np.clip(2 * np.asarray(nodes) - 1, -1, 1))
for n in range(5):
    q = ttnx.qtt_chebyshev(n, d)
    got = np.asarray(ttnx.matricize(q, d))
    ref = np.cos(n * theta)
    err = np.max(np.abs(got - ref))
    print(f"T_{n}: rank={max(q.ranks)} max err={err:.2e}")
    assert err < 1e-10, (n, err)

print("chebyshev_polynomials OK")
