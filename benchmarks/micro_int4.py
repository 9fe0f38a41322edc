"""int4 MXU rate probe (VERDICT r4 #3): is s4 matmul faster than int8 on v5e?

Public v5e specs list no int4 acceleration, the engine's int4 mode was
plumbed on a 2x assumption, and the round-2 probe hung in remote
compile — this is the minimal settle-it experiment. Host-side S4 arrays
are unusable through the axon client (RecursionError before Mosaic is
reached), but an IN-KERNEL int8 -> s4 cast compiles and dots exactly
(late round 2), so the probe casts inside the kernel:

  - one tiny Pallas program per mode: grid of `steps` dots of a fixed
    (M, K) x (K, N) block pair, accumulating in VMEM (constant index
    maps -> DMA negligible, compute-bound)
  - modes: int8 (baseline, known ~296 TOP/s sustained) and s4
  - rate = 2*M*K*N*steps / time

Run:  python benchmarks/micro_int4.py            (TPU; ~1 min warm)
Record the numbers in BASELINE.md; if s4 is not materially faster,
delete the engine's int4 branches per VERDICT r4 #3.
"""

from __future__ import annotations

import os
import sys
import time
from functools import partial

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from similaripy_tpu.utils.env import enable_persistent_compile_cache  # noqa: E402

enable_persistent_compile_cache(os.path.join(REPO, ".jax_cache"))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

M, K, N = 512, 2048, 512
STEPS = int(os.environ.get("MICRO_INT4_STEPS", 512))
REPS = int(os.environ.get("MICRO_INT4_REPS", 10))


def _kernel(a_ref, b_ref, o_ref, *, mode: str):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    a = a_ref[...]
    b = b_ref[...]
    if mode == "s4":
        # in-kernel cast: the only s4 route that works through this
        # tunnel (host-side S4 arrays crash the axon client)
        a = a.astype(jnp.int4)
        b = b.astype(jnp.int4)
    o_ref[:] += jnp.dot(a, b, preferred_element_type=jnp.int32)


def probe(mode: str) -> float:
    @jax.jit
    def run(a, b):
        return pl.pallas_call(
            partial(_kernel, mode=mode),
            grid=(STEPS,),
            in_specs=[
                pl.BlockSpec((M, K), lambda i: (0, 0)),
                pl.BlockSpec((K, N), lambda i: (0, 0)),
            ],
            out_specs=pl.BlockSpec((M, N), lambda i: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((M, N), jnp.int32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024,
            ),
            interpret=jax.default_backend() != "tpu",
        )(a, b)

    # values in [-7, 7] so the s4 cast is lossless and both modes compute
    # the identical product
    a = jnp.asarray(np.arange(M * K).reshape(M, K) % 15 - 7, jnp.int8)
    b = jnp.asarray(np.arange(K * N).reshape(K, N) % 15 - 7, jnp.int8)

    t0 = time.perf_counter()
    out = run(a, b)
    ref = np.asarray(out)
    print(f"# {mode}: compile+first {time.perf_counter() - t0:.1f}s",
          flush=True)
    # exactness: the accumulated dot must equal the int32 oracle x STEPS
    oracle = (np.asarray(a, np.int32) @ np.asarray(b, np.int32)) * STEPS
    if not np.array_equal(ref, oracle):
        print(f"# {mode}: WRONG RESULT (max abs diff "
              f"{np.max(np.abs(ref - oracle))})", flush=True)
        return float("nan")

    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(REPS):
            out = run(a, b)
        np.asarray(out[:1, :1])
        best = min(best, (time.perf_counter() - t0) / REPS)
    tops = 2.0 * M * K * N * STEPS / best / 1e12
    print(f"# {mode}: {best * 1e3:.2f} ms/call -> {tops:.0f} TOP/s", flush=True)
    return tops


def main() -> int:
    print(f"# backend={jax.default_backend()} M={M} K={K} N={N} "
          f"steps={STEPS}", flush=True)
    r8 = probe("int8")
    r4 = probe("s4")
    if np.isnan(r4):
        print("# verdict: s4 path broken on this backend", flush=True)
        return 1
    print(f"# verdict: s4 is {r4 / r8:.2f}x int8", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
