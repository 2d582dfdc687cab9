"""Test harness config: force CPU jax with 8 fake devices.

Multi-device-without-a-cluster strategy per SURVEY.md §4: all tests run on
CPU with 8 fake devices so data-parallel sharding logic is exercised
without TPU hardware.

NOTE: this environment's sitecustomize force-registers the `axon` TPU
platform and rewrites JAX_PLATFORMS, so env vars are NOT sufficient — the
config API must be used before first backend use (verified: env-only setup
silently ran the suite on the tunneled TPU).
"""

import numpy as np
import pytest

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)


def pytest_addoption(parser):
    parser.addoption(
        "--runslow",
        action="store_true",
        default=False,
        help="also run tests marked slow (full suite; ~15 min on 1 CPU)",
    )


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: long-running integration/quant tests, skipped unless --runslow",
    )


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow"):
        return
    skip = pytest.mark.skip(reason="slow; use --runslow for the full suite")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
