"""Quantics discrete Fourier transform as a low-rank MPO (arXiv:2404.03182).

Reference: /root/reference/src/tt_transformations.jl. Core entries are
``l_alpha(0.5*(sigma + c_beta)) * exp(i*pi*sign*(sigma + c_beta)*tau)`` with
barycentric Lagrange interpolation on the Chebyshev–Lobatto grid; everything is
assembled as one vectorized numpy expression instead of entry loops.

Bit-order contract (verified against the reference numerically): the MPO equals
``W · P_bitrev`` where ``W = (1/sqrt(N)) exp(-2i*pi*k*n/N)`` — its INPUT bits
are read least-significant-first. Feed it states encoded little-endian (e.g.
:func:`ttnx.ops.qtt.function_to_qtt_uniform`) and the big-endian read-out of
the result is the plain spectrum, exactly as in the reference's
``examples/dft.jl``.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ttnx.core.tt import TTOperator, TTVector

__all__ = ["fourier_qtto", "reverse_qtt_bits", "cheb_lobatto_lagrange"]


def cheb_lobatto_lagrange(K: int):
    """Chebyshev–Lobatto nodes on [0,1] plus barycentric weights
    (/root/reference/src/tt_transformations.jl:6-11)."""
    j = np.arange(K + 1)
    grid = 0.5 * (1 - np.cos(np.pi * j / K))
    w = np.where((j == 0) | (j == K), 0.5, 1.0) * ((-1.0) ** j)
    return grid, w


def _lagrange_eval_matrix(grid: np.ndarray, w: np.ndarray, xs: np.ndarray):
    """``L[alpha, m] = l_alpha(xs[m])`` by the barycentric formula
    (/root/reference/src/tt_transformations.jl:13-24), vectorized with exact
    handling of node coincidences."""
    diff = xs[None, :] - grid[:, None]  # (K+1, m)
    hit = np.isclose(diff, 0.0, atol=1e-14, rtol=0.0)
    safe = np.where(hit, 1.0, diff)
    terms = w[:, None] / safe
    terms = np.where(hit, 0.0, terms)
    denom = terms.sum(axis=0)  # (m,)
    L = terms / np.where(denom == 0, 1.0, denom)
    # at coincident nodes: l_alpha(x_beta) = delta
    any_hit = hit.any(axis=0)
    L = np.where(any_hit[None, :], hit.astype(float), L)
    return L


def fourier_qtto(d: int, sign: float = -1.0, K: int = 25,
                 normalize: bool = True) -> TTOperator:
    """Rank-(K+1) complex MPO of the quantics DFT; boundary cores by summing /
    slicing the bulk core; 1/sqrt(2^d) normalization
    (/root/reference/src/tt_transformations.jl:38-77)."""
    if d < 1:
        raise ValueError("d must be >= 1")
    grid, w = cheb_lobatto_lagrange(K)
    r = K + 1

    sigma = np.array([0, 1])
    tau = np.array([0, 1])
    # xs[(sigma, beta)] = 0.5 * (sigma + c_beta)
    xs = 0.5 * (sigma[:, None] + grid[None, :])  # (2, r)
    L = _lagrange_eval_matrix(grid, w, xs.reshape(-1)).reshape(r, 2, r)
    # phase[(sigma, beta), tau] = exp(i*pi*sign*(sigma + c_beta)*tau)
    phase = np.exp(1j * np.pi * sign
                   * (sigma[:, None, None] + grid[None, :, None])
                   * tau[None, None, :])  # (2, r, 2)
    # bulk core A[alpha, sigma, tau, beta] = L[alpha, sigma, beta] * phase[sigma, beta, tau]
    # in our (r_left, n_out, n_in, r_right) layout
    A = np.einsum("asb,sbt->astb", L, phase)

    AL = A.sum(axis=0, keepdims=True)          # (1, 2, 2, r)
    AR = A[:, :, :, 0:1]                        # (r, 2, 2, 1)

    if d == 1:
        cores = [AL[:, :, :, 0:1]]
        # single site: sum over alpha of column beta=0
    else:
        cores = [AL] + [A] * (d - 2) + [AR]
    if normalize:
        cores = [cores[0] / np.sqrt(2.0 ** d)] + list(cores[1:])
    return TTOperator([jnp.asarray(c, dtype=jnp.complex128) for c in cores])


def reverse_qtt_bits(x: TTVector) -> TTVector:
    """Reverse site order (bit reversal companion of the quantics DFT):
    reversed cores with transposed bond axes
    (/root/reference/src/tt_transformations.jl:79-86)."""
    cores = [jnp.swapaxes(c, 0, 2) for c in reversed(x.cores)]
    return TTVector(cores, tuple(reversed(x.ot)))
