"""Pallas row-gather: compact arbitrary rows of an HBM-resident table.

XLA's gather on TPU copies the entire table per call (measured ~77 GB/s
effective regardless of rows requested — see CLAUDE.md), which rules it
out for per-panel union compaction. This kernel issues one row-sized DMA
per gathered index, HBM -> HBM, with a deep in-flight pipeline, so traffic
is exactly rows_gathered x row_bytes.

Mosaic constraints found on real v5e (interpret mode catches none of
them):
  - a (1, C) slice of a 2-D tiled HBM memref is illegal ("slice shape
    along dimension 0 must be aligned to tiling (8)") — rows cannot be
    DMA'd out of the 2-D array directly;
  - 1-D int8/bf16 flat views are sublane-packed, so logical spans are not
    physically contiguous (a flat int8 gather compiles but copies the
    wrong bytes);
  - 1-D int32 memrefs are linear but tiled (1024): slice offsets/lengths
    must be 1024-word multiples.

Hence rows are gathered between flat **int32-word** views (bitcast of the
byte buffer), which requires row_bytes % 4096 == 0 — guaranteed by the
executor's tile widths (cg is a multiple of 4096/itemsize).

This is the TPU replacement for the reference's CSR row slicing
(reference: similaripy/cython_code/s_plus.h:365-394, where Gustavson walks
the m2 rows pointed to by the m1 row's indices): the pointed-to rows of
the densified matrix2 are copied into a compact buffer that feeds the MXU
with a union-compacted inner dimension.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_DEPTH = 128  # in-flight DMAs (row DMAs are latency-bound; go deep)


def _gather_kernel(idx_ref, src_ref, out_ref, sems, *, n: int, cw: int):
    def _copy(slot, i):
        return pltpu.make_async_copy(
            src_ref.at[pl.ds(idx_ref[i] * cw, cw)],
            out_ref.at[pl.ds(i * cw, cw)],
            sems.at[slot],
        )

    d = min(_DEPTH, n)

    def prologue(i, _):
        _copy(i % _DEPTH, i).start()
        return 0

    jax.lax.fori_loop(0, d, prologue, 0)

    def body(i, _):
        _copy(i % _DEPTH, i).wait()

        @pl.when(i + d < n)
        def _():
            _copy((i + d) % _DEPTH, i + d).start()

        return 0

    jax.lax.fori_loop(0, n, body, 0)


def to_flat_words(d2):
    """(U, cg) any-dtype -> (U*cg*itemsize/4,) int32 flat word view.

    One relayout copy; done once per resident table. The bitcast packs
    sub-word dtypes so the flat view is physically linear.
    """
    b = d2.dtype.itemsize
    assert (d2.shape[1] * b) % 4096 == 0, d2.shape
    if b == 4:
        return jax.lax.bitcast_convert_type(d2, jnp.int32).reshape(-1)
    return jax.lax.bitcast_convert_type(
        d2.reshape(-1, 4 // b), jnp.int32
    ).reshape(-1)


def from_words(words, n: int, cg: int, dtype):
    """(n*cw,) int32 -> (n, cg) dtype (inverse of to_flat_words rows).
    Sub-word dtypes get a trailing unpack dim from the bitcast; the
    reshape folds it back into the row."""
    return jax.lax.bitcast_convert_type(words, dtype).reshape(n, cg)


@partial(jax.jit, static_argnames=("cw",))
def _gather_words_jit(src_words, idx, cw: int):
    n = int(idx.shape[0])
    return pl.pallas_call(
        partial(_gather_kernel, n=n, cw=cw),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
            scratch_shapes=[pltpu.SemaphoreType.DMA((_DEPTH,))],
        ),
        out_shape=jax.ShapeDtypeStruct((n * cw,), jnp.int32),
    )(idx, src_words)


def row_gather_words(src_words, idx, cg: int, dtype, *, interpret: bool = False):
    """out (n, cg) dtype with rows taken from the int32-word flat view.

    src_words: (U*cw,) int32 where cw = cg*itemsize/4 (1024-multiple);
    idx: (n,) int32 in [0, U).
    """
    b = jnp.dtype(dtype).itemsize
    cw = cg * b // 4
    n = int(idx.shape[0])
    if interpret:
        return from_words(
            jnp.take(src_words.reshape(-1, cw), idx, axis=0).reshape(-1),
            n, cg, dtype,
        )
    words = _gather_words_jit(src_words, idx, cw)
    return from_words(words, n, cg, dtype)
