"""Test harness: force an 8-device virtual CPU mesh before jax initializes.

Multi-device tests run on CPU devices faked via
``--xla_force_host_platform_device_count`` (see SURVEY.md §4); real-TPU
benchmarks run separately through bench.py.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    import numpy as np
    return np.random.RandomState(0)
