"""Shape/dtype assertion layer and numerical guards (SURVEY §5: the
reference's only static checking is JET.jl; this is the runtime analog plus
NaN debugging hooks)."""

from __future__ import annotations

from contextlib import contextmanager

import numpy as np
import jax
import jax.numpy as jnp

from ttnx.core.tt import TTOperator, TTVector

__all__ = ["assert_valid_tt", "assert_valid_tto", "assert_finite",
           "debug_nans"]


def assert_valid_tt(x: TTVector) -> None:
    """Check the bond-chain consistency invariants of a TT vector."""
    if x.N == 0:
        raise ValueError("empty TT")
    if x.cores[0].shape[0] != 1:
        raise ValueError(f"left boundary rank must be 1, got {x.cores[0].shape[0]}")
    if x.cores[-1].shape[2] != 1:
        raise ValueError(
            f"right boundary rank must be 1, got {x.cores[-1].shape[2]}")
    for k in range(x.N - 1):
        if x.cores[k].shape[2] != x.cores[k + 1].shape[0]:
            raise ValueError(
                f"bond mismatch at {k}: {x.cores[k].shape[2]} != "
                f"{x.cores[k + 1].shape[0]}")
    if len(x.ot) != x.N:
        raise ValueError("orthogonality flags length mismatch")


def assert_valid_tto(A: TTOperator) -> None:
    if A.N == 0:
        raise ValueError("empty TT operator")
    if A.cores[0].shape[0] != 1 or A.cores[-1].shape[3] != 1:
        raise ValueError("boundary ranks must be 1")
    for k in range(A.N - 1):
        if A.cores[k].shape[3] != A.cores[k + 1].shape[0]:
            raise ValueError(
                f"bond mismatch at {k}: {A.cores[k].shape[3]} != "
                f"{A.cores[k + 1].shape[0]}")


def assert_finite(tt, name: str = "TT") -> None:
    """Host-side finiteness check of all cores."""
    for k, c in enumerate(tt.cores):
        if not bool(jnp.all(jnp.isfinite(c))):
            raise FloatingPointError(f"{name} core {k} contains non-finite values")


@contextmanager
def debug_nans(enable: bool = True):
    """Scoped ``jax_debug_nans`` toggle for hunting NaNs inside jitted code."""
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", enable)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)
