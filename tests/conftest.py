"""Test configuration.

Tests run hermetically on the CPU backend with 8 virtual devices so the
multi-device sharding paths are exercised without TPU hardware (the driver
validates the real-TPU path separately via bench.py / __graft_entry__.py).
Must run before any jax import.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line("markers", "perf: marks tests as performance tests")
