# coding=utf-8
"""Test configuration: run everything on a simulated 8-device CPU mesh so the
multi-chip sharding paths are exercised without TPU hardware.

Note: this image pins JAX_PLATFORMS=axon (the TPU tunnel) in the ambient
environment and the plugin re-asserts it, so the env-var route is not enough —
the config must be updated programmatically after importing jax.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)
