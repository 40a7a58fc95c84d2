"""Test environment: force the CPU backend with 8 virtual devices.

The dev box exposes one real TPU chip through a slow tunnel; tests run on
CPU (bit-exactness is backend-independent — the library uses exact integer
ops everywhere). Multi-chip sharding tests use the 8 virtual CPU devices.
Must run before jax is imported anywhere.
"""

import os

os.environ.pop("PALLAS_AXON_POOL_IPS", None)  # disable the axon TPU plugin hook
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def cpu_devices():
    return jax.devices("cpu")
