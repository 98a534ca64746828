"""Interpolative-QTT tests (mirrors /root/reference/test/test_interpolations.jl,
which drives the external InterpolativeQTT/TCI packages; ttnx's construction
is native — ttnx/ops/interpolation.py)."""

import numpy as np
import pytest

import ttnx
from ttnx import interpolating_qtt, lagrange_rank_revealing, matricize


class TestStructural:
    def test_1d_structure(self):
        numbits, N = 8, 5
        tt = interpolating_qtt(lambda x: np.sin(2 * np.pi * x), numbits, N)
        assert tt.N == numbits
        assert tt.ranks[0] == 1 and tt.ranks[-1] == 1
        assert all(d == 2 for d in tt.dims)
        assert max(tt.ranks) == N
        for k, c in enumerate(tt.cores):
            assert c.shape == (tt.ranks[k], 2, tt.ranks[k + 1])

    def test_validation(self):
        with pytest.raises(ValueError):
            interpolating_qtt(np.sin, 1, 4)
        with pytest.raises(ValueError):
            interpolating_qtt(np.sin, 4, 1)


class TestValues:
    def test_1d_value_correctness(self):
        numbits, N = 8, 16
        f = lambda x: np.sin(2 * np.pi * x)
        tt = interpolating_qtt(f, numbits, N)
        xs = np.arange(2 ** numbits) / 2 ** numbits
        vals = np.asarray(matricize(tt, numbits))
        assert np.max(np.abs(vals - f(xs))) < 1e-10

    def test_interval_scaling(self):
        numbits, N = 7, 14
        a, b = -2.0, 3.0
        f = lambda x: np.exp(-x) + x ** 2
        tt = interpolating_qtt(f, numbits, N, a=a, b=b)
        xs = a + (b - a) * np.arange(2 ** numbits) / 2 ** numbits
        vals = np.asarray(matricize(tt, numbits))
        assert np.max(np.abs(vals - f(xs))) < 1e-9

    def test_rank_revealing_compresses_polynomial(self):
        """A degree-3 polynomial has exact QTT rank 4; the full-rank N=12
        cascade must round down to it with no accuracy loss."""
        numbits = 8
        f = lambda x: 1.0 + x - 2 * x ** 2 + 0.5 * x ** 3
        tt = lagrange_rank_revealing(f, numbits, 12, rel_tol=1e-12)
        assert max(tt.ranks) <= 4
        xs = np.arange(2 ** numbits) / 2 ** numbits
        vals = np.asarray(matricize(tt, numbits))
        assert np.max(np.abs(vals - f(xs))) < 1e-10

    def test_max_bond_cap(self):
        tt = lagrange_rank_revealing(
            lambda x: np.cos(20 * x), 8, 14, rel_tol=0.0, max_bond=3)
        assert max(tt.ranks) <= 3
