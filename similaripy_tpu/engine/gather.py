"""Pallas row-gather: compact arbitrary rows of an HBM-resident table.

XLA's gather on TPU copies the entire table per call (measured ~77 GB/s
effective regardless of rows requested — see CLAUDE.md), which rules it out
for per-panel union compaction. This kernel issues one row-sized DMA per
gathered index, HBM -> HBM, with a depth-D in-flight pipeline, so traffic
is exactly rows_gathered x row_bytes.

This is the TPU replacement for the reference's CSR row slicing
(reference: similaripy/cython_code/s_plus.h:365-394, where Gustavson
walks m2 rows pointed to by the m1 row's indices): here the "pointed-to
rows" of the densified matrix2 are copied into a compact buffer that
feeds the MXU with a union-compacted inner dimension.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_DEPTH = 8  # in-flight DMAs


def _gather_kernel(idx_ref, src_ref, out_ref, sems, *, n: int):
    d = min(_DEPTH, n)

    def _copy(slot, i):
        return pltpu.make_async_copy(
            src_ref.at[idx_ref[i]], out_ref.at[i], sems.at[slot]
        )

    def prologue(i, _):
        _copy(i % _DEPTH, i).start()
        return 0

    jax.lax.fori_loop(0, d, prologue, 0, unroll=True)

    def body(i, _):
        _copy(i % _DEPTH, i).wait()

        @pl.when(i + d < n)
        def _():
            _copy((i + d) % _DEPTH, i + d).start()

        return 0

    jax.lax.fori_loop(0, n, body, 0)


@partial(jax.jit, static_argnames=("interpret",))
def row_gather(src, idx, *, interpret: bool = False):
    """out[i, :] = src[idx[i], :].

    src: (U, C) array resident in HBM; idx: (n,) int32, all in [0, U).
    Off-TPU (interpret mode) falls back to jnp.take — the DMA pipeline is
    a hardware behavior the interpreter cannot exercise meaningfully.
    """
    if interpret:
        return jnp.take(src, idx, axis=0)
    n = int(idx.shape[0])
    return pl.pallas_call(
        partial(_gather_kernel, n=n),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
            scratch_shapes=[pltpu.SemaphoreType.DMA((_DEPTH,))],
        ),
        out_shape=jax.ShapeDtypeStruct((n, src.shape[1]), src.dtype),
    )(idx, src)
