"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Must set env vars before jax initializes — pytest imports conftest first.
Real-TPU tests are marked `tpu` and skipped here; the driver's bench runs on
the real chip.
"""
import os

# The container's sitecustomize pins JAX_PLATFORMS=axon (the tunneled TPU);
# tests must run on a virtual CPU mesh, so override both env and config.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def devices():
    return jax.devices()
