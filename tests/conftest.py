"""Test harness configuration.

Tests run on CPU with 8 virtual devices so sharding/multi-chip code paths are exercised without
TPU hardware (mirrors the reference test strategy of CPU-able smoke workloads + kernel-vs-
reference unit tests, see SURVEY.md §4). Env vars must be set before jax is imported.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
