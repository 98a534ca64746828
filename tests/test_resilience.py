"""Failure detection / retry tests (SURVEY §5 subsystem)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ttnx import TTVector, als_linsolve, id_tto, qtt_sin, rand_tt
from ttnx.core.algebra import scale
from ttnx.utils.resilience import (
    SolveFailure,
    check_solution,
    resilient_linsolve,
    with_retry,
)


class TestCheckSolution:
    def test_good_solution_passes(self, key):
        d = 5
        A = id_tto(d)
        b = qtt_sin(d)
        res = check_solution(A, b, b)
        assert res < 1e-12

    def test_nan_detected(self, key):
        d = 4
        A = id_tto(d)
        b = qtt_sin(d)
        bad = scale(float("nan"), b)
        with pytest.raises(SolveFailure, match="non-finite"):
            check_solution(A, b, bad)

    def test_large_residual_detected(self, key):
        d = 4
        A = id_tto(d)
        b = qtt_sin(d)
        wrong = scale(100.0, b)
        with pytest.raises(SolveFailure, match="residual"):
            check_solution(A, b, wrong, max_residual=1.0)


class TestRetry:
    def test_succeeds_after_failures(self):
        calls = []

        def solve(attempt):
            calls.append(attempt)
            if attempt < 2:
                raise SolveFailure("synthetic")
            return "ok"

        out = with_retry(solve, lambda r: None, retries=3)
        assert out == "ok"
        assert calls == [0, 1, 2]

    def test_exhausted_raises(self):
        def solve(attempt):
            raise SolveFailure("always")

        with pytest.raises(SolveFailure):
            with_retry(solve, lambda r: None, retries=1)

    def test_resilient_linsolve_happy_path(self, key):
        d = 5
        A = id_tto(d)
        b = qtt_sin(d)
        x0 = rand_tt(key, (2,) * d, rmax=4, normalise=True)
        x = resilient_linsolve(A, b, x0, als_linsolve, max_residual=1e-8,
                               sweep_count=4)
        assert check_solution(A, b, x) < 1e-10

    def test_resilient_linsolve_retries_bad_solver(self, key):
        d = 4
        A = id_tto(d)
        b = qtt_sin(d)
        x0 = rand_tt(key, (2,) * d, rmax=4, normalise=True)
        attempts = []

        def flaky_solver(A, b, guess, **kw):
            attempts.append(1)
            if len(attempts) < 3:
                return scale(float("nan"), guess)  # diverged
            return als_linsolve(A, b, guess, sweep_count=4)

        x = resilient_linsolve(A, b, x0, flaky_solver, max_residual=1e-8,
                               retries=3, key=key)
        assert len(attempts) == 3
        assert check_solution(A, b, x) < 1e-8
