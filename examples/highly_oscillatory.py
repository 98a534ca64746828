"""Interpolative QTT of a highly oscillatory multiscale function
(mirrors /root/reference/examples/highly_oscillatory.jl, which drives the
external InterpolativeQTT.jl package; here the interpolative construction
is native — ttnx.interpolating_qtt / lagrange_rank_revealing).

Run: python examples/highly_oscillatory.py
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

f = lambda x: np.cos(1.0 / (x ** 3 + 0.01)) + np.sin(np.pi * x)
num_cores = 10
N = 150

qtt = ttnx.interpolating_qtt(f, num_cores, N)
qtt_rr = ttnx.lagrange_rank_revealing(f, num_cores, N, rel_tol=1e-10)

xs = np.arange(2 ** num_cores) / 2 ** num_cores
ref = f(xs)
err_full = np.linalg.norm(np.asarray(ttnx.matricize(qtt, num_cores)) - ref) \
    / np.linalg.norm(ref)
err_rr = np.linalg.norm(np.asarray(ttnx.matricize(qtt_rr, num_cores)) - ref) \
    / np.linalg.norm(ref)
print(f"interpolating_qtt:       rank {max(qtt.ranks)}, rel err {err_full:.2e}")
print(f"lagrange_rank_revealing: ranks {tuple(qtt_rr.ranks)}, rel err {err_rr:.2e}")
assert err_full < 1e-6 and err_rr < 1e-6
assert max(qtt_rr.ranks) < max(qtt.ranks) / 3  # rank revealing compresses

# compression path of the reference example: cap at max_bond=10
Q = ttnx.tt_compress(qtt_rr, max_bond=10, truncerr=1e-8)
err_q = np.linalg.norm(np.asarray(ttnx.matricize(Q, num_cores)) - ref) \
    / np.linalg.norm(ref)
print(f"compressed (max_bond=10): ranks {tuple(Q.ranks)}, rel err {err_q:.2e}")
assert max(Q.ranks) <= 10

print("highly_oscillatory OK")
