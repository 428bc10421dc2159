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

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

# The axon PJRT plugin registers itself regardless of JAX_PLATFORMS, and
# jax.devices() then returns the remote TPU — silently routing "CPU" tests
# through the tunnel. The config knob actually enforces the restriction.
jax.config.update("jax_platforms", "cpu")

# Op-by-op dispatch goes through a remote compile service in this harness;
# cache compiled executables on disk so repeat runs are fast, and prefer
# jitted init/apply in tests (see `jit_init` / `jit_apply`).
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
# This platform's default conv/matmul precision is bf16-like (~6e-3 error vs
# torch f32); parity tests need true f32 accumulation. Production code picks
# its own precision (bf16 on the MXU) explicitly.
jax.config.update("jax_default_matmul_precision", "highest")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def jit_init(module, *args, **kwargs):
    return jax.jit(module.init)(*args, **kwargs)


def jit_apply(module, params, *args, **kwargs):
    return jax.jit(module.apply)(params, *args, **kwargs)
