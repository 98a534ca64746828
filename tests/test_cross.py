"""TT-cross interpolation tests
(mirror /root/reference/test/test_tt_cross_interpolation.jl)."""

import numpy as np
import pytest

from ttnx.core.decomp import ttv_to_tensor
from ttnx.cross.cross import (
    DMRGCross,
    Greedy,
    MaxVol,
    _cap_ranks,
    _evaluate_tt,
    gauss_legendre,
    tt_cross,
    tt_integrate,
)
from ttnx.cross.maxvol import maxvol


def dense(tt):
    return np.asarray(ttv_to_tensor(tt))


class TestHelpers:
    def test_cap_ranks(self):
        Rs = _cap_ranks([1, 10, 10, 10, 1], [2, 2, 2, 2], 500)
        assert Rs == [1, 2, 4, 2, 1]
        Rs = _cap_ranks([1, 10, 10, 1], [4, 4, 4], 3)
        assert Rs == [1, 3, 3, 1]

    def test_evaluate_tt(self, rng):
        from ttnx import rand_tt
        import jax

        x = rand_tt(jax.random.PRNGKey(0), (3, 4, 2), rmax=2)
        full = dense(x)
        idx = np.stack([rng.integers(0, 3, 7), rng.integers(0, 4, 7),
                        rng.integers(0, 2, 7)], axis=1)
        vals = _evaluate_tt([np.asarray(c) for c in x.cores], idx)
        expect = np.array([full[tuple(row)] for row in idx])
        assert np.allclose(vals, expect)

    def test_maxvol_dominance(self, rng):
        a = rng.standard_normal((40, 5))
        rows = maxvol(a, tol=1.05, maxiter=200)
        assert len(set(rows.tolist())) == 5
        b = a @ np.linalg.inv(a[rows])
        assert np.max(np.abs(b)) <= 1.05 + 1e-8

    def test_gauss_legendre(self):
        x, w = gauss_legendre(10, 0.0, 1.0)
        # integrates polynomials up to degree 19 exactly
        for k in [0, 3, 10, 19]:
            assert np.isclose((w * x ** k).sum(), 1.0 / (k + 1), atol=1e-12)


class TestMaxVolCross:
    def test_readme_gaussian_4d(self):
        # README quick-start: 4-D Gaussian, ranks=2, tol=1e-8
        def f(X):
            return np.exp(-np.sum(X ** 2, axis=1))

        domain = [np.linspace(-1, 1, 10)] * 4
        tt = tt_cross(f, domain, MaxVol(tol=1e-8, verbose=False), ranks=2)
        full = dense(tt)
        xs = np.stack(np.meshgrid(*domain, indexing="ij"), axis=-1)
        expect = np.exp(-np.sum(xs ** 2, axis=-1))
        rel = np.linalg.norm(full - expect) / np.linalg.norm(expect)
        assert rel < 1e-8

    def test_dims_tuple_entry(self):
        f = lambda X: np.sum(X, axis=1)
        tt = tt_cross(f, (5, 5, 5), MaxVol(tol=1e-10, verbose=False), ranks=2)
        assert tt.dims == (5, 5, 5)
        full = dense(tt)
        g = np.arange(1.0, 6.0)
        expect = g[:, None, None] + g[None, :, None] + g[None, None, :]
        assert np.linalg.norm(full - expect) / np.linalg.norm(expect) < 1e-8

    def test_default_algorithm(self):
        f = lambda X: np.sum(X, axis=1)
        tt = tt_cross(f, (4, 4, 4))
        assert tt.N == 3

    def test_rank_growth_via_kickrank(self):
        # rank-4 function needs kickrank growth from ranks=1
        g = np.linspace(0, 1, 8)

        def f(X):
            return np.cos(4 * np.pi * X[:, 0]) * np.cos(3 * np.pi * X[:, 1]) \
                + X[:, 0] * X[:, 1] + np.sin(X[:, 2])

        tt = tt_cross(f, [g, g, g], MaxVol(tol=1e-10, kickrank=3,
                                           verbose=False), ranks=1)
        xs = np.stack(np.meshgrid(g, g, g, indexing="ij"), axis=-1)
        expect = (np.cos(4 * np.pi * xs[..., 0]) * np.cos(3 * np.pi * xs[..., 1])
                  + xs[..., 0] * xs[..., 1] + np.sin(xs[..., 2]))
        rel = np.linalg.norm(dense(tt) - expect) / np.linalg.norm(expect)
        assert rel < 1e-8

    def test_wishart_5d(self):
        # /root/reference/test/test_tt_cross_interpolation.jl:147-186
        d = 5
        nu = d + 2
        p = nu / 2
        Sigma = np.array([
            [1.0, 0.3, 0.2, 0.1, 0.18],
            [0.3, 1.2, 0.25, 0.15, 0.22],
            [0.2, 0.25, 0.9, 0.2, 0.28],
            [0.1, 0.15, 0.2, 1.1, 0.19],
            [0.18, 0.22, 0.28, 0.19, 1.05],
        ])
        sigma = 2 * Sigma

        def f(X):
            out = np.empty(X.shape[0])
            eye = np.eye(d)
            for i in range(X.shape[0]):
                out[i] = np.linalg.det(eye + sigma * X[i][None, :]) ** (-p)
            return out

        domain = [np.linspace(0.0, 2.0, 8)] * d
        tt = tt_cross(f, domain,
                      MaxVol(tol=1e-6, maxiter=25, rmax=60, kickrank=2,
                             verbose=False), ranks=2, val_size=1500, seed=2026)
        rng = np.random.default_rng(2027)
        ncheck = 200
        idx = np.stack([rng.integers(0, 8, ncheck) for _ in range(d)], axis=1)
        coords = np.stack([domain[k][idx[:, k]] for k in range(d)], axis=1)
        ys = f(coords)
        yhat = _evaluate_tt([np.asarray(c) for c in tt.cores], idx)
        rel_l2 = np.linalg.norm(ys - yhat) / max(np.linalg.norm(ys), 1e-300)
        assert rel_l2 < 1e-4


class TestDMRGCross:
    def test_separable(self):
        g = np.linspace(-1, 1, 12)

        def f(X):
            return np.exp(-np.sum(X ** 2, axis=1))

        tt = tt_cross(f, [g] * 4, DMRGCross(tol=1e-10, verbose=False), ranks=3)
        xs = np.stack(np.meshgrid(*[g] * 4, indexing="ij"), axis=-1)
        expect = np.exp(-np.sum(xs ** 2, axis=-1))
        assert np.linalg.norm(dense(tt) - expect) / np.linalg.norm(expect) < 1e-8

    def test_one_dimensional(self):
        g = np.linspace(0, 1, 16)
        f = lambda X: np.sin(np.pi * X[:, 0])
        tt = tt_cross(f, [g], DMRGCross(verbose=False))
        assert tt.N == 1
        assert np.allclose(dense(tt).reshape(-1), np.sin(np.pi * g))

    def test_rank_adaptive(self):
        g = np.linspace(0, 1, 10)

        def f(X):
            return 1.0 / (1.0 + X[:, 0] + 2 * X[:, 1] + 3 * X[:, 2])

        tt = tt_cross(f, [g] * 3, DMRGCross(tol=1e-10, rmax=10, verbose=False),
                      ranks=2)
        xs = np.stack(np.meshgrid(g, g, g, indexing="ij"), axis=-1)
        expect = 1.0 / (1.0 + xs[..., 0] + 2 * xs[..., 1] + 3 * xs[..., 2])
        assert np.linalg.norm(dense(tt) - expect) / np.linalg.norm(expect) < 1e-8
        assert max(tt.ranks) <= 10


class TestGreedyCross:
    def test_smooth_function(self):
        g = np.linspace(0.1, 1, 8)

        def f(X):
            return np.exp(np.sum(X, axis=1))

        tt = tt_cross(f, [g] * 3, Greedy(tol=1e-9, verbose=False))
        xs = np.stack(np.meshgrid(g, g, g, indexing="ij"), axis=-1)
        expect = np.exp(np.sum(xs, axis=-1))
        assert np.linalg.norm(dense(tt) - expect) / np.linalg.norm(expect) < 1e-7

    def test_zero_lock_regression(self):
        # function vanishing at the domain-|max| corner must not lock the
        # greedy pivots (reference regression test_tt_cross_interpolation.jl:96-137)
        g = np.linspace(0, 1, 9)

        def f(X):
            return np.prod(np.sin(np.pi * X), axis=1)

        tt = tt_cross(f, [g] * 3, Greedy(tol=1e-8, verbose=False))
        xs = np.stack(np.meshgrid(g, g, g, indexing="ij"), axis=-1)
        expect = np.prod(np.sin(np.pi * xs), axis=-1)
        assert np.linalg.norm(dense(tt) - expect) / np.linalg.norm(expect) < 1e-6

    def test_high_rank_bordered_inverse_updates(self):
        # 1/(1 + sum x) needs rank >> 1, so every bond takes several greedy
        # pivots — exercising the O(r^2) bordered cross-inverse updates
        # repeatedly; accuracy vs dense validates each update against the
        # fresh-pinv math it replaces
        g = np.linspace(0.0, 1.0, 12)

        def f(X):
            return 1.0 / (1.0 + np.sum(X, axis=1))

        tt = tt_cross(f, [g] * 3, Greedy(tol=1e-9, rmax=12, verbose=False))
        assert max(tt.ranks) >= 4  # the update path actually ran
        xs = np.stack(np.meshgrid(g, g, g, indexing="ij"), axis=-1)
        expect = 1.0 / (1.0 + np.sum(xs, axis=-1))
        assert np.linalg.norm(dense(tt) - expect) / np.linalg.norm(expect) < 1e-5


class TestIntegrate:
    def test_separable_exponential(self):
        # int over [0,1]^2 of e^{x+y} = (e-1)^2
        def f(X):
            return np.exp(np.sum(X, axis=1))

        val = tt_integrate(f, np.zeros(2), np.ones(2),
                           alg=MaxVol(tol=1e-10, verbose=False), nquad=20)
        assert np.isclose(val, (np.e - 1) ** 2, atol=1e-10)

    def test_dims_shorthand(self):
        def f(X):
            return np.prod(X, axis=1)

        # int over [0,1]^3 of xyz = 1/8
        val = tt_integrate(f, 3, alg=MaxVol(tol=1e-10, verbose=False))
        assert np.isclose(val, 0.125, atol=1e-10)

    def test_bounds_mismatch(self):
        with pytest.raises(ValueError):
            tt_integrate(lambda X: X[:, 0], np.zeros(2), np.ones(3))

    def test_gaussian_3d(self):
        # int over [-1,1]^3 of exp(-|x|^2) = (int_{-1}^{1} e^{-t^2})^3
        from scipy.special import erf

        def f(X):
            return np.exp(-np.sum(X ** 2, axis=1))

        one_d = np.sqrt(np.pi) * erf(1.0)
        val = tt_integrate(f, -np.ones(3), np.ones(3),
                           alg=MaxVol(tol=1e-10, verbose=False), nquad=30)
        assert np.isclose(val, one_d ** 3, atol=1e-9)
