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
# NOTE: the persistent compilation cache is deliberately NOT enabled here —
# serializing XLA:CPU executables on this machine intermittently segfaults
# in compilation_cache.put_executable_and_time (machine-feature mismatch in
# the CPU AOT path). TPU benches still use the cache (stable there).
os.environ.pop("JAX_COMPILATION_CACHE_DIR", None)

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

assert jax.devices()[0].platform == "cpu", "tests must run on the CPU backend"
assert jax.device_count() == 8, "expected 8 virtual CPU devices for sharding tests"

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def cpu_devices():
    return jax.devices("cpu")
