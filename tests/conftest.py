"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Must set the env vars before jax initializes its backends, so this file
stays import-order first (pytest loads conftest before test modules).
"""

import os

# Force the CPU backend: the CI/dev environment may pin JAX_PLATFORMS to a
# hardware plugin (e.g. a tunneled TPU); unit tests must run on a local
# 8-device virtual CPU mesh regardless.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

# A sitecustomize hook may have imported jax already (hardware plugins
# register at interpreter boot), in which case the env var above came too
# late — update the live config as well.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_DATA = "/root/reference/data"


@pytest.fixture(scope="session")
def demo_data_dir():
    if not os.path.isdir(REFERENCE_DATA):
        pytest.skip("bundled demo data not available")
    return REFERENCE_DATA


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)
