"""Test harness: run everything on a virtual 8-device CPU mesh.

Multi-chip (DP/TP/CP) paths are exercised in CI without TPU hardware via
XLA's host-platform device-count override, per SURVEY.md §4.
"""

import os

# Force CPU regardless of the ambient axon/TPU environment (sitecustomize
# registers the axon PJRT plugin and exports JAX_PLATFORMS=axon; plain
# setdefault would lose). Must happen before the first jax backend init.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# sitecustomize imports jax at interpreter startup (axon PJRT registration),
# so the env vars above are snapshotted too late — override the live config.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running tests (multi-process spawns etc.)")


@pytest.fixture
def rng():
    return np.random.default_rng(123)
