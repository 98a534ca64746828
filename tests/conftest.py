"""Test configuration: run on a virtual 8-device CPU mesh with x64 enabled.

The container's sitecustomize imports jax and registers the remote-TPU ("axon")
PJRT plugin at interpreter startup, so env vars are too late; instead we flip
the platform via jax.config *before the backend initializes* (it is lazy).
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


@pytest.fixture
def key():
    return jax.random.PRNGKey(1234)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Free compiled-executable state between modules: a clean full-suite
    run segfaulted the XLA CPU compiler (twice, deterministically, at the
    same late jit-of-shard_map compile in test_tsqr) while every half of
    the suite passes in isolation — cumulative in-process compiler state,
    not memory (128 GB free) and not any single test. Clearing the jit
    caches per module keeps the accumulation bounded; cross-module cache
    reuse is minimal (modules compile distinct shapes)."""
    yield
    jax.clear_caches()
