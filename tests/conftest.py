"""Test bootstrap: force an 8-device virtual CPU platform so multi-chip
sharding (pjit/shard_map over the (data, queue) mesh) is exercised without a
real TPU pod — the fake-backend analog mandated by SURVEY.md §4."""

import os

# The sandbox exports JAX_PLATFORMS=axon (remote TPU tunnel) and its
# sitecustomize register() forces jax_platforms back to "axon,cpu", so the env
# var alone is not enough — we must override the config after import too.
# Set VINCE_TEST_TPU=1 to run @tpu tests on the real chip instead.
_USE_TPU = bool(os.environ.get("VINCE_TEST_TPU"))
if not _USE_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

if not _USE_TPU:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)
# Persistent compile cache: ResNet/EfficientNet CPU compiles dominate test time.
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def cpu_devices():
    devs = jax.devices()
    assert len(devs) == 8, devs
    return devs
