"""Test environment: force the CPU backend with 8 virtual devices.

The dev box exposes one real TPU chip through a slow tunnel (the `axon`
PJRT plugin, registered by a sitecustomize hook BEFORE this file runs, and
it ignores the JAX_PLATFORMS env var). Tests must run on CPU: bit-exactness
is backend-independent (the library uses exact integer ops everywhere) and
per-op tunnel round-trips make eager tests ~100x slower. Multi-chip
sharding tests use the 8 virtual CPU devices.

`jax.config.update("jax_platforms", "cpu")` de-prioritizes the axon
backend even after its registration; XLA_FLAGS must be set before the CPU
backend is first initialized (lazily, at the first jax.devices() call).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

assert jax.devices()[0].platform == "cpu", "tests must run on the CPU backend"
assert jax.device_count() == 8, "expected 8 virtual CPU devices for sharding tests"

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def cpu_devices():
    return jax.devices("cpu")
