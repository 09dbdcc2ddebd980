"""Test configuration: force an 8-device CPU mesh so multi-chip sharding paths
are exercised without TPU hardware (mirrors the driver's dry-run environment)."""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

# The axon sitecustomize registers the TPU backend with higher priority than the
# JAX_PLATFORMS env var; force CPU through jax.config so tests run on the
# 8-device virtual host mesh.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(1234)
