"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

The container's sitecustomize registers the `axon` TPU-tunnel backend and
programmatically sets `jax_platforms="axon,cpu"` (overriding any env var), so
we must re-select CPU via `jax.config` after import. XLA_FLAGS must be set
before the CPU backend initializes to get 8 virtual devices.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
