"""Test harness: force a local 8-device virtual CPU mesh.

Multi-device tests run on CPU devices faked via
``--xla_force_host_platform_device_count`` (see SURVEY.md §4); real-TPU
benchmarks run separately through bench.py.

Two environment quirks this file handles:
  * The session env points JAX_PLATFORMS at a remote `axon` TPU whose every
    XLA compile round-trips a tunnel (seconds-to-minutes per graph). Tests
    must run on local CPU instead.
  * pytest plugins (jaxtyping) import jax BEFORE conftest loads, freezing
    env-var-derived config — so we set jax.config directly, which works any
    time before backend initialization.
"""

import os

# XLA_FLAGS is read when the CPU client is created (first backend use), which
# is still ahead of us even though jax may already be imported.
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Parity tests compare against fp32 torch references; force full-precision
# fp32 matmuls regardless of platform defaults.
jax.config.update("jax_default_matmul_precision", "highest")

assert jax.devices()[0].platform == "cpu", (
    "tests must run on local CPU devices; backend was initialized too early: "
    f"{jax.devices()}")
assert jax.device_count() == 8, (
    f"expected 8 virtual CPU devices, got {jax.device_count()} — XLA_FLAGS "
    "was applied too late")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    import numpy as np
    return np.random.RandomState(0)
