"""Test configuration: run all JAX tests on a virtual 8-device CPU mesh.

This mirrors how the driver validates multi-chip sharding
(``xla_force_host_platform_device_count``) so every sharding test is
runnable without TPU hardware.
"""

import os

# Force CPU: the harness exports JAX_PLATFORMS=axon (remote TPU tunnel)
# globally, which would send every test compile through the tunnel.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
