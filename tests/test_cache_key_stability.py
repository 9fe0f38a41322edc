"""Compile-cache key stability guards.

The serialized Mosaic payload embeds op source locations and is hashed
into XLA's persistent-cache key, so kernel/executor line shifts used to
invalidate every cached Mosaic program (BASELINE.md round 6; the r4
driver capture lost its headline entries to this). Two measures fix it:
kernel bodies are recompiled at canonical filenames (_stable_code), and
enable_persistent_compile_cache drops caller frames from MLIR locations.
These tests pin the wiring; the payload-level byte-identity was verified
against lowered StableHLO on the TPU backend (see _stable_code's
docstring).
"""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import similaripy_tpu.engine.pallas_kernels as pk  # noqa: E402

KERNEL_BODIES = (
    "_epilogue_val",
    "_kernel",
    "_panel_kernel",
    "_sym_kernel",
    "_mxu_scatter_kernel",
)


def test_kernel_bodies_are_position_canonical():
    """Every traced kernel body lives at line 1 of a synthetic file named
    after itself — its embedded locations cannot depend on where the
    function sits in pallas_kernels.py."""
    for name in KERNEL_BODIES:
        fn = getattr(pk, name)
        assert fn.__code__.co_filename == f"<{name}>", name
        assert fn.__code__.co_firstlineno == 1, name


def test_stable_code_preserves_behavior():
    import pytest

    def sample(x, y=2):
        return x * y

    out = pk._stable_code(sample)
    assert out.__code__.co_filename == "<sample>"
    assert out.__code__.co_firstlineno == 1
    assert out(5) == 10 and out(5, y=3) == 15

    # closures are rejected loudly rather than silently losing their cells
    cell = 7

    def closure_fn(x):
        return x * cell

    with pytest.raises(AssertionError):
        pk._stable_code(closure_fn)


def test_persistent_cache_drops_full_traceback_locations(tmp_path, monkeypatch):
    import jax

    from similaripy_tpu.utils.env import enable_persistent_compile_cache

    old = jax.config.jax_include_full_tracebacks_in_locations
    try:
        monkeypatch.setenv("JAX_COMPILATION_CACHE_DIR", str(tmp_path / "jc"))
        jax.config.update("jax_include_full_tracebacks_in_locations", True)
        enable_persistent_compile_cache(str(tmp_path / "jc"))
        assert jax.config.jax_include_full_tracebacks_in_locations is False
        # opt-out keeps the richer locations
        jax.config.update("jax_include_full_tracebacks_in_locations", True)
        monkeypatch.setenv("SIMILARIPY_TPU_KEEP_TRACEBACK_LOCS", "1")
        enable_persistent_compile_cache(str(tmp_path / "jc"))
        assert jax.config.jax_include_full_tracebacks_in_locations is True
    finally:
        jax.config.update("jax_include_full_tracebacks_in_locations", old)
