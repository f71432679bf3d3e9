"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip sharding paths are validated on CPU via an 8-device virtual CPU
topology (the reference has no analog — its only distributed test is a 2-GPU
skipif, test_cli.py:115-121).

jax may already be imported by the interpreter before pytest loads this file,
so env-var gating (JAX_PLATFORMS / XLA_FLAGS) is too late; jax.config.update
works as long as no backend has been initialized yet.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

try:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)
except Exception:
    pass  # backend already initialized (e.g. re-entrant pytest); env vars apply

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return jax.random.PRNGKey(0)


@pytest.fixture(autouse=True)
def _seed():
    np.random.seed(0)


def pytest_addoption(parser):
    parser.addoption("--slow", action="store_true", default=False,
                     help="run long convergence tests")
