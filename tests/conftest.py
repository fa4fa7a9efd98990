"""Test configuration: force an 8-device virtual CPU mesh before JAX initializes.

The reference has no tests at all (SURVEY.md §4); here multi-device sharding is
exercised on a host-platform virtual mesh so the full pjit/shard_map paths run in CI
without TPU hardware.
"""
import os
import sys

# Must be set before jax is imported anywhere. Force-override: the driver
# environment pins JAX_PLATFORMS to the TPU tunnel, but the suite needs the
# 8-device virtual CPU mesh for sharding tests.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# The driver image imports jax from sitecustomize before this conftest runs, so
# the env-var default may already be captured — update the live config too.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
