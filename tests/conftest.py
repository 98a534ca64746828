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
