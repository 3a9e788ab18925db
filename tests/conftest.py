"""Test configuration: force an 8-device virtual CPU mesh before jax is used.

Multi-chip TPU hardware is not available in CI; sharding/pjit tests run on
8 virtual CPU devices instead (`xla_force_host_platform_device_count`), which
exercises the same SPMD partitioner and collectives as a real slice.

Note: the environment's axon sitecustomize force-registers the TPU backend at
interpreter start and overrides JAX_PLATFORMS, so the platform must be pinned
via jax.config *after* import, before any computation.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"  # tests never touch the real TPU tunnel
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert jax.default_backend() == "cpu", "tests must run on the CPU backend"


@pytest.fixture
def rng():
    return np.random.default_rng(0)
