"""Test configuration.

Tests run hermetically on the CPU backend with 8 virtual devices so the
multi-device sharding paths are exercised without TPU hardware (the driver
validates the real-TPU path separately via bench.py / __graft_entry__.py).
Must run before any jax import.
"""

import os

# Force CPU even when the environment pins a hardware backend (e.g. a
# tunneled TPU): unit tests must be hermetic and exercise the virtual
# 8-device mesh. The env var alone is not enough — a sitecustomize-level
# PJRT plugin may override `jax_platforms` via jax.config, so set both.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

# redirect the persistent compile cache away from the git-tracked
# .jax_cache: tests that drive the benchmarks CLI (which enables the
# repo-local cache for real runs) would otherwise write CPU-backend
# entries into the tracked TPU cache on every suite run
import tempfile  # noqa: E402

os.environ["JAX_COMPILATION_CACHE_DIR"] = os.path.join(
    tempfile.gettempdir(), "similaripy_tpu_test_jax_cache"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line("markers", "perf: marks tests as performance tests")
