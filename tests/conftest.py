"""Test harness config: force CPU jax with 8 fake devices.

Multi-device-without-a-cluster strategy per SURVEY.md §4: all tests run on
CPU with XLA_FLAGS=--xla_force_host_platform_device_count=8 so data-parallel
sharding logic is exercised without TPU hardware. Must run before any jax
import, hence module-level in conftest.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
