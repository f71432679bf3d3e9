"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip sharding paths are validated on CPU via
xla_force_host_platform_device_count (the reference has no analog — its only
distributed test is a 2-GPU skipif, test_cli.py:115-121).
"""

import os

# Must be set before jax is imported anywhere.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    import jax
    return jax.random.PRNGKey(0)


@pytest.fixture(autouse=True)
def _seed():
    np.random.seed(0)
