"""Test harness: force the CPU backend with 8 virtual devices.

The axon sitecustomize registers the TPU backend unconditionally, so the
JAX_PLATFORMS env var alone is not enough — jax.config must be updated
before any computation.  Sharding tests then run on a virtual 8-device
mesh, mirroring how the driver dry-runs the multi-chip path.
"""

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
if "--xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] += " --xla_force_host_platform_device_count=8"

import jax

# MVTV_TPU_TESTS=1 leaves the backend alone so the tpu-marked live tests
# (tests/test_tpu_live.py) run against the real chip:
#   MVTV_TPU_TESTS=1 python -m pytest tests/test_tpu_live.py -q
if os.environ.get("MVTV_TPU_TESTS") != "1":
    jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


def pytest_collection_modifyitems(config, items):
    """With MVTV_TPU_TESTS=1 the CPU pin above is removed, so ONLY the
    live-TPU suite may run: the golden/scipy parity tests execute eager
    jnp ops, and each eager primitive on the axon TPU backend costs a
    remote-compile round trip (minutes) — see CLAUDE.md."""
    if os.environ.get("MVTV_TPU_TESTS") == "1":
        skip = pytest.mark.skip(
            reason="MVTV_TPU_TESTS=1 runs only tests/test_tpu_live.py")
        for item in items:
            if "test_tpu_live" not in str(item.fspath):
                item.add_marker(skip)


@pytest.fixture(scope="session")
def rng():
    return np.random.RandomState(117)
