"""QTT-DFT tests (mirrors /root/reference/test/test_tt_transformations.jl and
examples/dft.jl assertions).

Bit-order contract: the quantics DFT MPO equals ``W @ P_bitrev`` (input bits
least-significant-first), pairing with the little-endian
``function_to_qtt_uniform`` encoder so spectra read out plainly big-endian.
"""

import numpy as np

from ttnx import (
    fourier_qtto,
    function_to_qtt_uniform,
    qtt_to_vector,
    qtto_to_matrix,
    reverse_qtt_bits,
    tt_compress,
    ttv_decomp,
)


def bitrev_perm(d):
    return [int(f"{i:0{d}b}"[::-1], 2) for i in range(2 ** d)]


def test_dft_matrix_small():
    # F = W @ P_bitrev with W = (1/sqrt(N)) exp(-2i pi k n / N)
    d = 4
    N = 2 ** d
    F = np.asarray(qtto_to_matrix(fourier_qtto(d, K=25)))
    k = np.arange(N)
    W = np.exp(-2j * np.pi * np.outer(k, k) / N) / np.sqrt(N)
    perm = bitrev_perm(d)
    assert np.linalg.norm(F[:, perm] - W) / np.linalg.norm(W) < 1e-10


def test_dft_unitary_and_conjugate_sign():
    d = 5
    N = 2 ** d
    Fm = np.asarray(qtto_to_matrix(fourier_qtto(d, sign=-1.0)))
    Fp = np.asarray(qtto_to_matrix(fourier_qtto(d, sign=1.0)))
    assert np.linalg.norm(Fm.conj().T @ Fm - np.eye(N)) < 1e-8
    assert np.linalg.norm(Fp - Fm.conj()) < 1e-10


def test_dft_spectral_recovery():
    # /root/reference/examples/dft.jl:1-24 with d=10, K=50: feed the
    # little-endian uniform encoding, read the spectrum plainly.
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

    x_qtt = function_to_qtt_uniform(f, d)
    F = fourier_qtto(d, K=K, sign=-1.0, normalize=True)
    y_qtt = tt_compress(F @ x_qtt, 100)
    spec = np.asarray(qtt_to_vector(y_qtt))
    scale = np.sqrt(N)
    assert np.linalg.norm(spec[:r] - scale * coeffs) / (
        scale * np.linalg.norm(coeffs)) < 1e-8
    assert np.linalg.norm(spec[r:]) / np.linalg.norm(spec) < 1e-10


def test_dft_rank():
    K = 12
    F = fourier_qtto(6, K=K)
    assert max(F.ranks) == K + 1


def test_reverse_qtt_bits():
    d = 4
    N = 2 ** d
    rng = np.random.default_rng(0)
    u = rng.standard_normal(N)
    tt = ttv_decomp(u.reshape((2,) * d))
    rev = reverse_qtt_bits(tt)
    v = np.asarray(qtt_to_vector(rev))
    # site reversal = bit-reversal permutation of the grid index
    assert np.allclose(v, u[bitrev_perm(d)])


def test_uniform_sampler_is_little_endian():
    d = 3
    f = lambda x: x  # u[n] = n / 8
    tt = function_to_qtt_uniform(f, d)
    v = np.asarray(qtt_to_vector(tt))  # big-endian readout of LE encoding
    expect = (np.arange(8) / 8)[bitrev_perm(d)]
    assert np.allclose(v, expect)


def test_single_frequency_spike():
    d = 6
    f = lambda x: np.exp(2j * np.pi * 3 * x)
    u_tt = function_to_qtt_uniform(f, d)
    F = fourier_qtto(d, K=25)
    spec = np.asarray(qtt_to_vector(F @ u_tt))
    expect = np.zeros(2 ** d, dtype=complex)
    expect[3] = np.sqrt(2.0 ** d)
    assert np.linalg.norm(spec - expect) < 1e-8
