"""Platform/environment helpers.

Centralizes backend detection so the engine can pick execution strategies
(real Pallas kernels on TPU, interpret-mode / pure-XLA fallbacks on CPU).
"""

from __future__ import annotations

import functools
import os


@functools.lru_cache(maxsize=None)
def default_backend() -> str:
    """The default JAX backend platform string ('tpu', 'cpu', 'gpu')."""
    import jax

    return jax.default_backend()


def on_tpu() -> bool:
    return default_backend() == "tpu"


def pallas_interpret() -> bool:
    """Whether Pallas kernels must run in interpreter mode (non-TPU backends)."""
    if os.environ.get("SIMILARIPY_TPU_FORCE_INTERPRET"):
        return True
    return not on_tpu()


@functools.lru_cache(maxsize=None)
def device_count() -> int:
    import jax

    return jax.device_count()


def enable_persistent_compile_cache(path: str) -> None:
    """Point JAX's persistent compilation cache at `path`.

    Through the tunneled backend a cold compile of a big program costs
    minutes; cached programs deserialize in seconds. Call before the first
    jit dispatch. An existing JAX_COMPILATION_CACHE_DIR env var wins, so
    users can redirect or share the cache.

    Also drops full tracebacks from MLIR locations: the serialized Mosaic
    kernel payload embeds op source locations INCLUDING caller frames, and
    those bytes are part of the cache key (strip-debuginfo cannot reach
    inside the custom_call payload) — with full tracebacks on, an edit
    that merely shifts lines in executor.py silently invalidates every
    cached Mosaic program. Verified on lowered StableHLO: with the flag
    off (False), caller/wrapper line shifts leave the payload
    byte-identical; the kernels' own positions are canonicalized
    separately (pallas_kernels._stable_code).
    SIMILARIPY_TPU_KEEP_TRACEBACK_LOCS=1 opts out (richer debug
    locations, position-fragile cache keys)."""
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", path)
    import jax

    jax.config.update(
        "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"]
    )
    if os.environ.get("SIMILARIPY_TPU_KEEP_TRACEBACK_LOCS") != "1":
        jax.config.update("jax_include_full_tracebacks_in_locations", False)


def hbm_budget_bytes() -> int:
    """Usable HBM budget for tile planning.

    The axon tunnel backend does not expose memory_stats, so allow an env
    override and use a conservative default otherwise.
    """
    env = os.environ.get("SIMILARIPY_TPU_HBM_BYTES")
    if env:
        return int(env)
    try:
        import jax

        stats = jax.local_devices()[0].memory_stats()
        if stats and "bytes_limit" in stats:
            return int(stats["bytes_limit"] * 0.85)
    except Exception:
        pass
    if on_tpu():
        return 12 * 1024**3  # conservative: fits a 16 GB HBM chip
    return 2 * 1024**3  # CPU tests: keep buffers small
