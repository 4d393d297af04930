"""Test configuration: force an 8-device virtual CPU platform.

Must run before jax is imported anywhere: tests exercise multi-device
sharding on a virtual CPU mesh (the standard JAX fake-backend trick, cf.
SURVEY.md §4) and must not grab the real TPU.
"""

import os

# Force-override: the session environment pins JAX_PLATFORMS to the TPU
# tunnel platform; tests must run on the virtual multi-device CPU backend.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The machine's sitecustomize registers a remote-TPU PJRT plugin and forces
# jax_platforms to it via jax.config.update (which wins over env vars);
# switch back to the virtual CPU mesh for the test suite.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
