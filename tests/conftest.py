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


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "smoke: fast gate (<3 min total) — quick unit tests")
    config.addinivalue_line(
        "markers", "kernel: compile-heavy kernel-equivalence / gradient / sharding tests "
        "(~10 min); run with -m 'smoke or kernel' for the full unit suite")
    config.addinivalue_line(
        "markers", "full: long e2e train-to-PSNR tests (reference CI shards these per "
        "config, ubuntu_test_CI.jenkins:56-149)")


def pytest_collection_modifyitems(config, items):
    """Auto-tier: tests/apps are 'full'; explicitly-marked compile-heavy unit tests are
    'kernel'; everything else is 'smoke'. `pytest -m smoke` gates a round in <3 min;
    `-m "smoke or kernel"` is the full unit suite; `-m full` runs the e2e trainings."""
    for item in items:
        explicit = {m.name for m in item.iter_markers()} & {"smoke", "kernel", "full"}
        if explicit:
            continue
        if "/apps/" in str(item.fspath) or "\\apps\\" in str(item.fspath):
            item.add_marker(pytest.mark.full)
        else:
            item.add_marker(pytest.mark.smoke)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
