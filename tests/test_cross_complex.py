"""Complex-valued TT-cross contract suite — ports of
/root/reference/test/test_tt_cross_interpolation.jl:214-480 (complex domains,
complex-valued functions, rank caps) plus the forced Greedy->DMRG stall
fallback (jl:512-518)."""

import numpy as np
import pytest

from ttnx import DMRGCross, Greedy, MaxVol, RandomPivot, tt_cross, ttv_to_tensor


def dense_eval(f, domain):
    mesh = np.meshgrid(*domain, indexing="ij")
    X = np.stack([m.reshape(-1) for m in mesh], axis=1)
    return np.asarray(f(X)).reshape([len(d) for d in domain])


def relerr(tt, exact):
    full = np.asarray(ttv_to_tensor(tt))
    return np.linalg.norm(full - exact) / max(np.linalg.norm(exact),
                                              np.finfo(float).eps)


ALGS = {
    "maxvol": lambda **kw: MaxVol(verbose=False, **kw),
    "greedy": lambda **kw: Greedy(verbose=False, nsamples=500,
                                  pivot=RandomPivot(seed=42),
                                  **{k: v for k, v in kw.items()
                                     if k != "kickrank"}),
    "dmrg": lambda **kw: DMRGCross(verbose=False, **kw),
}


@pytest.mark.parametrize("alg_name", list(ALGS))
class TestComplexCrossSuite:
    # jl:214-241 — complex coordinate grids
    def test_complex_domain(self, alg_name):
        g = np.linspace(0.0, 1.0, 5) + 1j * np.linspace(0.0, 0.4, 5)
        domain = [g] * 3

        def f(X):
            return np.exp(X[:, 0] + 0.7 * X[:, 1] - 0.3 * X[:, 2])

        tt = tt_cross(f, domain, ALGS[alg_name](tol=1e-8, maxiter=20,
                                                rmax=30), ranks=2)
        exact = dense_eval(f, domain)
        assert tt.is_complex
        assert relerr(tt, exact) < 1e-6

    # jl:435-446 — f = prod exp(i x_k), rank-1 complex on a real grid
    def test_rank1_separable_complex(self, alg_name):
        domain = [np.linspace(0.0, 1.0, 5)] * 3

        def f(X):
            return np.prod(np.exp(1j * X), axis=1)

        tt = tt_cross(f, domain, ALGS[alg_name](tol=1e-10, maxiter=30),
                      ranks=2)
        assert relerr(tt, dense_eval(f, domain)) < 1e-8

    # jl:347-371 — x1*x2*x3 on a complex grid
    def test_separable_complex_grid(self, alg_name):
        g = np.linspace(0.0, 1.0, 5) * (1.0 + 0.5j) + (1.0 + 0.5j)
        domain = [g] * 3

        def f(X):
            return np.prod(X, axis=1)

        tt = tt_cross(f, domain, ALGS[alg_name](tol=1e-10, maxiter=30),
                      ranks=2)
        assert relerr(tt, dense_eval(f, domain)) < 1e-8

    # jl:373-397 — exp(i sum x^2), smooth complex-valued
    def test_smooth_complex_valued(self, alg_name):
        domain = [np.linspace(0.0, 1.0, 6)] * 3

        def f(X):
            return np.exp(1j * np.sum(X ** 2, axis=1))

        tt = tt_cross(f, domain, ALGS[alg_name](tol=1e-6, maxiter=50,
                                                rmax=20), ranks=2)
        assert relerr(tt, dense_eval(f, domain)) < 1e-4

    # jl:399-428 — rank-2 complex separable with rank cap
    def test_rank2_complex_separable(self, alg_name):
        domain = [np.linspace(0.0, np.pi, 7)] * 3

        def f(X):
            return (np.prod(np.sin(X), axis=1)
                    + 1j * np.prod(np.cos(X), axis=1))

        kw = {"tol": 1e-10, "maxiter": 30}
        if alg_name != "greedy":
            kw["rmax"] = 4
        tt = tt_cross(f, domain, ALGS[alg_name](**kw), ranks=2)
        assert relerr(tt, dense_eval(f, domain)) < 1e-8
        if alg_name != "greedy":
            assert max(tt.ranks) <= 4

    # jl:430-455 — Lorentzian resolvent 1/(i eta + sum x^2)
    def test_lorentzian_resolvent(self, alg_name):
        domain = [np.linspace(-1.0, 1.0, 8)] * 3

        def f(X):
            return 1.0 / (0.3j + np.sum(X ** 2, axis=1))

        tt = tt_cross(f, domain, ALGS[alg_name](tol=1e-6, maxiter=40,
                                                rmax=20), ranks=2)
        assert relerr(tt, dense_eval(f, domain)) < 1e-4

    # jl:457-480 — 4-D rank-1 complex separable
    def test_4d_separable_complex(self, alg_name):
        domain = [np.linspace(0.0, 1.0, 6)] * 4

        def f(X):
            return np.prod(1.0 + 1j * X, axis=1)

        tt = tt_cross(f, domain, ALGS[alg_name](tol=1e-10, maxiter=20),
                      ranks=2)
        assert relerr(tt, dense_eval(f, domain)) < 1e-8


class TestRealAccuracyTriples:
    """jl:243-330 — the real accuracy triples not yet in the suite."""

    @pytest.mark.parametrize("alg_name", list(ALGS))
    def test_low_rank_polynomial(self, alg_name):
        domain = [np.linspace(0.0, 1.0, 8)] * 3

        def f(X):
            return np.sum(X, axis=1) ** 2

        kw = {"tol": 1e-8, "maxiter": 30}
        if alg_name != "greedy":
            kw["rmax"] = 10
        tt = tt_cross(f, domain, ALGS[alg_name](**kw), ranks=2)
        assert relerr(tt, dense_eval(f, domain)) < 1e-6

    @pytest.mark.parametrize("alg_name", list(ALGS))
    def test_smooth_gaussian_4d(self, alg_name):
        domain = [np.linspace(-1.0, 1.0, 8)] * 4

        def f(X):
            return np.exp(-np.sum(X ** 2, axis=1))

        tt = tt_cross(f, domain, ALGS[alg_name](tol=1e-6, maxiter=50,
                                                rmax=20), ranks=2)
        assert relerr(tt, dense_eval(f, domain)) < 1e-4


class TestGreedyStallFallback:
    def test_stall_falls_back_to_dmrg(self, capsys):
        """Force a Greedy stall (1 sweep, tiny budget, tight tol on a
        non-trivial function) and assert the DMRG fallback both fires and
        rescues the approximation (reference jl:512-518)."""
        domain = [np.linspace(-1.0, 1.0, 8)] * 3

        def f(X):
            return np.exp(-np.sum(X ** 2, axis=1)) + 0.1 * np.cos(
                3.0 * np.sum(X, axis=1))

        alg = Greedy(tol=1e-10, maxiter=1, nsamples=4, verbose=True,
                     pivot=RandomPivot(seed=7))
        tt = tt_cross(f, domain, alg, ranks=1)
        out = capsys.readouterr().out
        assert "stalled" in out and "DMRG" in out
        # the fallback result is a genuine approximation, not the stalled one
        assert relerr(tt, dense_eval(f, domain)) < 1e-4
