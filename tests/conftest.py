"""Test configuration: run everything on a virtual 8-device CPU mesh with x64
enabled, so numerics tests match the reference's double precision and sharding
tests exercise multi-chip layouts without TPU hardware.

Set ABCSMC_TEST_TPU=1 to instead run on the real accelerator in f32 (only a
subset of tests is meaningful there; CPU-mesh-dependent tests self-skip)."""

import os

ON_TPU = os.environ.get("ABCSMC_TEST_TPU") == "1"

if not ON_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"  # the driver env presets axon (TPU)
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax  # noqa: E402

if not ON_TPU:
    # jax may already have been imported (its config latched from the driver
    # env, which presets JAX_PLATFORMS=axon) by a pytest plugin - override
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)
    jax.config.update("jax_enable_x64", True)

if ON_TPU:
    # persistent compile cache: big win for remote TPU compiles; NOT used for
    # the CPU mesh (XLA:CPU AOT cache entries are machine-feature-pinned and
    # reload with SIGILL-risk warnings)
    from abcsmc_tpu._cache import enable_persistent_cache

    enable_persistent_cache()


def pytest_runtest_setup(item):
    if ON_TPU:
        import pytest

        needs_mesh = {
            "test_sharded", "test_multihost", "test_golden",
            "test_weights", "test_pls", "test_stats",
            "test_scaling_structure",
            # f64-grade parity oracle (rtol 1e-6 vs a numpy NIPALS
            # transcription) - meaningless at f32
            "test_ranking_parity",
        }
        if item.module.__name__ in needs_mesh:
            pytest.skip("requires the 8-device x64 CPU mesh")
