"""Microbenchmark: fused_tile_topk at the ML-32M SCORING tile shape.

The scoring stage (users x items through a float model, f32x3='rhs')
runs 99 panels x 45 tiles of this kernel; at TM=256 each product re-
streams the [hi;lo] D tile 8x from HBM and walks 1760 grid steps, and
the full-scale run sits ~36% over its MXU bound. This probe times ONE
(panel x tile) product as a chained-carry loop (each call's carry feeds
the next — the executor's exact dataflow) for a given TM/KB, read from
the usual env knobs:

  SIMILARIPY_TPU_TM=512 SIMILARIPY_TPU_KB=768 python benchmarks/micro_tile_kernel.py

Prints ms/product and the bf16 matmul bound for the shape. Each config
is a fresh Mosaic program (minutes of remote compile, then cached).
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from similaripy_tpu.utils.env import enable_persistent_compile_cache  # noqa: E402

enable_persistent_compile_cache(os.path.join(REPO, ".jax_cache"))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def main() -> int:
    from similaripy_tpu.engine.pallas_kernels import KB, TM, fused_tile_topk

    trp = int(os.environ.get("MICRO_TRP", 2048))
    u_pad = int(os.environ.get("MICRO_UPAD", 84480))
    tc = int(os.environ.get("MICRO_TC", 2048))
    k_pad = int(os.environ.get("MICRO_KPAD", 16))
    reps = int(os.environ.get("MICRO_REPS", 10))
    assert u_pad % KB == 0, (u_pad, KB)
    print(f"# shape: trp={trp} u_pad={u_pad} tc={tc} k_pad={k_pad} "
          f"TM={TM} KB={KB} backend={jax.default_backend()}", flush=True)

    # device-generated operands (host->device of multi-GB data is minutes
    # through the tunnel): ~17% dense bf16 panel (a user rates ~157 of 84k
    # items; a model column has 100 in-neighbors -> ~17% of xy non-zero),
    # ~0.1% dense model tile, hi half ~1.0-scale, lo half ~2^-9 scale
    @jax.jit
    def make_inputs():
        ai = jax.lax.broadcasted_iota(jnp.int32, (trp, u_pad), 0) * 7919 + \
            jax.lax.broadcasted_iota(jnp.int32, (trp, u_pad), 1) * 104729
        a = jnp.where((ai % 6) == 0, (ai % 9 + 1).astype(jnp.bfloat16), 0)
        di = jax.lax.broadcasted_iota(jnp.int32, (2 * u_pad, tc), 0) * 31337 + \
            jax.lax.broadcasted_iota(jnp.int32, (2 * u_pad, tc), 1) * 6151
        scale = jnp.where(
            jax.lax.broadcasted_iota(jnp.int32, (2 * u_pad, tc), 0) < u_pad,
            1.0, 2.0 ** -9,
        )
        d = jnp.where(
            (di % 845) == 0,
            ((di % 13 + 1).astype(jnp.float32) * scale / 13.0).astype(jnp.bfloat16),
            0,
        )
        ones_r = jnp.ones((trp,), jnp.float32)
        ones_c = jnp.ones((tc,), jnp.float32)
        return a, d, ones_r, ones_c

    a, d, ones_r, ones_c = make_inputs()
    pvec_ext = jnp.zeros((16,), jnp.float32).at[9].set(1.0)
    flags = (False,) * 6  # raw-product epilogue (the scoring call's mode)
    cv = jnp.full((k_pad, trp), float("-inf"), jnp.float32)
    ci = jnp.zeros((k_pad, trp), jnp.int32)

    @jax.jit
    def one(a, d, cv, ci):
        return fused_tile_topk(
            a, d, ones_r, ones_r, ones_r, ones_c, ones_c, ones_c,
            pvec_ext, carry=(cv, ci), flags=flags, k_pad=k_pad,
            int8_mode=False, precision=jax.lax.Precision.DEFAULT,
            split_f32="rhs", interpret=jax.default_backend() != "tpu",
        )

    # MICRO_FRESH=1: feed a COLD carry every rep — the extraction runs at
    # its worst case (n_row = k_pad survivors) instead of the chained
    # steady state where the carry's kth prunes nearly everything. The
    # [chained, fresh] pair brackets the real run's extraction cost.
    fresh = os.environ.get("MICRO_FRESH") == "1"
    cv0, ci0 = cv, ci

    t0 = time.perf_counter()
    cv, ci = one(a, d, cv, ci)
    np.asarray(cv[:1, :1])
    print(f"# compile+first: {time.perf_counter() - t0:.1f}s "
          f"(fresh={fresh})", flush=True)

    for r in range(3):
        t0 = time.perf_counter()
        for _ in range(reps):
            if fresh:
                cv, ci = one(a, d, cv0, ci0)
            else:
                cv, ci = one(a, d, cv, ci)
        np.asarray(cv[:1, :1])
        dt = (time.perf_counter() - t0) / reps
        bound_ms = 2 * 2 * trp * u_pad * tc / 170e12 * 1e3
        print(f"# round {r}: {dt * 1e3:.2f} ms/product "
              f"(bf16 2-phase bound {bound_ms:.2f} ms, "
              f"overhead {dt * 1e3 - bound_ms:+.2f} ms)", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
