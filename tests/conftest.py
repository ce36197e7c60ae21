"""Test configuration: force CPU backend with 8 virtual devices.

The sandbox pins JAX_PLATFORMS=axon via sitecustomize, so env vars alone don't
work — we must use jax.config before any backend touch. Sharding tests then
see 8 CpuDevices, standing in for a TPU mesh (SURVEY.md §4 test strategy).
"""
import pathlib

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
# Persistent compile cache: the slow suite is dominated by XLA:CPU compiles
# of interpret-mode Pallas + shard_map graphs (a 100 s test spends ~95 s
# compiling); cached reruns cut the full -m slow wall several-fold.
jax.config.update(
    "jax_compilation_cache_dir",
    str(pathlib.Path(__file__).resolve().parent.parent / ".jax_cache_cpu"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
