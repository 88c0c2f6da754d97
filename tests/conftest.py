"""Test configuration: run everything on a virtual 8-device CPU mesh with x64
enabled, so numerics tests match the reference's double precision and sharding
tests exercise multi-chip layouts without TPU hardware."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the driver env presets axon (TPU)
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# jax may already have been imported (and its config latched from the driver
# env, which presets JAX_PLATFORMS=axon) by a pytest plugin - override directly
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", True)

from abcsmc_tpu._cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()
