"""Test configuration: force CPU backend with 8 virtual devices.

The sandbox pins JAX_PLATFORMS=axon via sitecustomize, so env vars alone don't
work — we must use jax.config before any backend touch. Sharding tests then
see 8 CpuDevices, standing in for a TPU mesh (SURVEY.md §4 test strategy).
"""
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
