"""Test harness config: force CPU jax with 8 fake devices.

Multi-device-without-a-cluster strategy per SURVEY.md §4: all tests run on
CPU with 8 fake devices so data-parallel sharding logic is exercised
without TPU hardware.

NOTE: this environment's sitecustomize force-registers the `axon` TPU
platform and rewrites JAX_PLATFORMS, so env vars are NOT sufficient — the
config API must be used before first backend use (verified: env-only setup
silently ran the suite on the tunneled TPU).
"""

import os

import numpy as np
import pytest

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

# Persistent XLA compilation cache (host-local): the default tier is
# compile-bound (the dp8 train-step program alone is ~40 s of XLA:CPU
# compile), and jax 0.9 caches CPU executables too. Cold first run pays
# full compile; warm reruns on the same host load from here. Entries are
# host-feature-checked by XLA at load (mismatches recompile, never SIGILL).
_cache_dir = os.environ.get(
    "ODT_TEST_XLA_CACHE", "/tmp/odt_test_xla_cache"
)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def pytest_addoption(parser):
    parser.addoption(
        "--runslow",
        action="store_true",
        default=False,
        help="also run tests marked slow (tier 2; <15 min on 1 CPU)",
    )
    parser.addoption(
        "--runslowest",
        action="store_true",
        default=False,
        help="also run tests marked slowest (tier 3: subprocess-compile "
        "integration tests — multihost dryruns, real-file CLI; ~11 min)",
    )


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: long-running integration/quant tests, skipped unless --runslow",
    )
    config.addinivalue_line(
        "markers",
        "slowest: heaviest compile-bound integration tests, skipped unless "
        "--runslowest (CI tiers: default | --runslow -m slow | "
        "--runslowest -m slowest)",
    )


def pytest_collection_modifyitems(config, items):
    tiers = (
        ("slow", config.getoption("--runslow"), "--runslow"),
        ("slowest", config.getoption("--runslowest"), "--runslowest"),
    )
    for mark, enabled, flag in tiers:
        if enabled:
            continue
        skip = pytest.mark.skip(reason=f"{mark}; use {flag} to include")
        for item in items:
            if mark in item.keywords:
                item.add_marker(skip)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
