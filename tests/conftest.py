"""Test harness configuration.

Tests run on CPU with 8 virtual devices so sharding/multi-chip code paths are exercised without
TPU hardware (mirrors the reference test strategy of CPU-able smoke workloads + kernel-vs-
reference unit tests, see SURVEY.md §4). Env vars must be set before jax is imported.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force CPU even when axon TPU env is set
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# Belt and braces: if a plugin imported jax before this conftest ran, the env var alone won't
# stick — update the live config too (valid until the backend is first used).
try:
    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
