"""Multi-device sharded S-Plus executor.

Scales the single-device tiled executor (executor.py) over a
`jax.sharding.Mesh` with two logical axes (SURVEY §2.5):

  'rows' — data parallelism over target rows: each row-shard owns a
           disjoint slice of the output, the TPU analogue of the
           reference's OpenMP row loop with disjoint output slices
           (reference: s_plus.h:313-338,443-450).
  'cols' — tensor-style parallelism over matrix2 columns: each col-shard
           scans its own column span and produces a partial per-row
           top-K; partials are merged with an `all_gather` over 'cols'
           followed by one `lax.top_k` — the distributed replacement for
           the reference's per-thread TopK heap (s_plus.h:39-64).

Communication pattern: the ONLY collective is the (rows_per_panel × k)
all-gather of top-K partials along 'cols' — O(trp·k·C_sh) floats, riding
ICI, negligible next to the O(trp·C) similarity compute. Matrix data never
moves between devices: m1 panels are replicated along 'cols' (each col
shard needs all target rows) and sharded along 'rows'; m2 tiles are
sharded along 'cols' and replicated along 'rows'.
"""

from __future__ import annotations

import math
import os
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.csr import csc_quantized
from ..utils.env import hbm_budget_bytes
from .executor import (
    NEG_INF,
    _pad_bucket,
    _pad_vec,
    _round_up,
    _stack_m2_tiles,
    _stack_selector_tiles,
    build_pvec,
    compute_cast,
    densify,
    plan_tiles,
    resolve_compute_dtype,
    scatter_mask,
    splus_epilogue,
    topk_merge,
)
from .params import SPlusParams
from .preprocess import Preprocessed


def _pad_csc_cols(sub, n_cols_target: int):
    """Extend a CSC matrix with empty columns up to n_cols_target."""
    import scipy.sparse as sp

    n = sub.shape[1]
    if n >= n_cols_target:
        return sub
    indptr = np.concatenate(
        [sub.indptr, np.full(n_cols_target - n, sub.indptr[-1], dtype=sub.indptr.dtype)]
    )
    return sp.csc_array(
        (sub.data, sub.indices, indptr), shape=(sub.shape[0], n_cols_target)
    )


def _mesh_axis_sizes(mesh: Mesh) -> tuple[int, int]:
    """(rows, cols) axis sizes; either axis may be absent (treated as 1)."""
    names = mesh.axis_names
    if not set(names) <= {"rows", "cols"}:
        raise ValueError(
            f"sharded executor expects mesh axes named 'rows'/'cols', got {names}"
        )
    r = mesh.shape.get("rows", 1)
    c = mesh.shape.get("cols", 1)
    return r, c


@partial(
    jax.jit,
    static_argnames=(
        "mesh",
        "flags",
        "k",
        "trp",
        "u_pad",
        "tc",
        "has_allowed",
        "has_filter",
        "has_target",
        "compute_dtype",
        "precision",
    ),
)
def _run_sharded_panel(
    m1_rows,  # (R_sh, p1) int32 — local row ids within the shard's panel
    m1_cols,  # (R_sh, p1) int32
    m1_vals,  # (R_sh, p1) f32
    x_t,  # (R_sh, trp) f32
    x_c,
    x_d,
    tiles,  # dict; m2/y/offset arrays lead with C_sh, selector arrays with (R_sh, C_sh)
    pvec,  # (9,) f32
    *,
    mesh: Mesh,
    flags: tuple,
    k: int,
    trp: int,
    u_pad: int,
    tc: int,
    has_allowed: bool,
    has_filter: bool,
    has_target: bool,
    compute_dtype: str,
    precision: str,
):
    cdt, acc = compute_cast(compute_dtype)
    prec = {
        "default": jax.lax.Precision.DEFAULT,
        "high": jax.lax.Precision.HIGH,
        "highest": jax.lax.Precision.HIGHEST,
    }[precision]
    has_cols_axis = "cols" in mesh.axis_names

    def block_fn(m1_rows, m1_cols, m1_vals, x_t, x_c, x_d, tiles, pvec):
        # strip the leading shard dims (all size 1 inside the block)
        m1_rows, m1_cols, m1_vals = m1_rows[0], m1_cols[0], m1_vals[0]
        x_t, x_c, x_d = x_t[0], x_c[0], x_d[0]
        tiles = {
            k2: (v[0, 0] if k2.startswith(("fil_", "tgt_")) else v[0])
            for k2, v in tiles.items()
        }

        m1_dense = densify((trp, u_pad), m1_rows, m1_cols, m1_vals, cdt)

        def tile_step(carry, xs):
            topk_vals, topk_idx = carry
            d = densify((u_pad, tc), xs["m2_rows"], xs["m2_cols"], xs["m2_vals"], cdt)
            xy = jnp.dot(m1_dense, d, preferred_element_type=acc, precision=prec)
            if compute_dtype in ("int8", "int4"):
                xy = xy.astype(jnp.float32) * pvec[9]

            candidate = xy != 0.0
            if has_allowed:
                candidate = jnp.logical_and(candidate, xs["allowed"][None, :])
            if has_filter:
                fmask = (
                    jnp.zeros((trp, tc), jnp.bool_)
                    .at[xs["fil_rows"], xs["fil_cols"]]
                    .set(True, mode="drop")
                )
                candidate = jnp.logical_and(candidate, jnp.logical_not(fmask))
            if has_target:
                tmask = (
                    jnp.zeros((trp, tc), jnp.bool_)
                    .at[xs["tgt_rows"], xs["tgt_cols"]]
                    .set(True, mode="drop")
                )
                candidate = jnp.logical_and(candidate, tmask)

            val = splus_epilogue(
                xy, candidate, x_t, x_c, x_d,
                xs["y_t"], xs["y_c"], xs["y_d"], pvec, flags,
            )
            col_ids = xs["col_offset"] + jax.lax.broadcasted_iota(jnp.int32, (1, tc), 1)
            new_vals, new_idx = topk_merge(topk_vals, topk_idx, val, col_ids, k)
            return (new_vals, new_idx), None

        init = (
            jnp.full((trp, k), NEG_INF, jnp.float32),
            jnp.zeros((trp, k), jnp.int32),
        )
        (vals, idx), _ = jax.lax.scan(tile_step, init, tiles)

        if has_cols_axis:
            # Distributed top-K merge: gather each col-shard's k partials and
            # re-select. Deterministic regardless of shard order because ties
            # resolve by (value, gather position) identically on all shards.
            all_vals = jax.lax.all_gather(vals, "cols", axis=1, tiled=True)
            all_idx = jax.lax.all_gather(idx, "cols", axis=1, tiled=True)
            merged, pos = jax.lax.top_k(all_vals, k)
            idx = jnp.take_along_axis(all_idx, pos, axis=1)
            vals = merged
        return vals[None], idx[None]

    sel_spec = P("rows", "cols" if has_cols_axis else None, None, None)
    tile_specs = {
        k2: (sel_spec if k2.startswith(("fil_", "tgt_")) else P("cols" if has_cols_axis else None, None, None))
        for k2 in tiles
    }
    # y/offset/allowed arrays are (C_sh, n_tiles_local, tc)-shaped like m2 tiles
    out = jax.shard_map(
        block_fn,
        mesh=mesh,
        in_specs=(
            P("rows", None),
            P("rows", None),
            P("rows", None),
            P("rows", None),
            P("rows", None),
            P("rows", None),
            tile_specs,
            P(),
        ),
        out_specs=(P("rows", None, None), P("rows", None, None)),
        check_vma=False,
    )(m1_rows, m1_cols, m1_vals, x_t, x_c, x_d, tiles, pvec)
    return out


# ---------------------------------------------------------------------------
# Grouped + fused-kernel sharded path (round 2 unification)
# ---------------------------------------------------------------------------
#
# Mirrors the single-device grouped executor: matrix2 tiles are densified
# ONCE into device-resident (cached) d_stacks sharded over 'cols', panels
# of target rows stream over the resident tiles inside shard_map with the
# fused Pallas kernel, and each col-shard keeps a local top-K that is
# all_gather-merged once at the end. The old scan-over-tiles path below
# remains for MATRIX-mode selectors.


@partial(
    jax.jit,
    static_argnames=(
        "mesh", "flags", "k", "k_pad", "trp", "u_pad", "tc",
        "has_allowed", "has_filter", "has_target",
        "compute_dtype", "precision", "use_pallas", "f32x3",
    ),
    donate_argnums=(9, 10),
)
def _run_sharded_group(
    m1_rows,  # (R_sh, p1) int32, P('rows')
    m1_cols,
    m1_vals,
    x_t,  # (R_sh, trp) f32, P('rows')
    x_c,
    x_d,
    d_stack,  # (L_total, u_pad, tc) cdt, P('cols') on axis 0
    tiles,  # dict of (L_total, ...) arrays, P('cols') on axis 0
    pvec,  # (10,) replicated
    carry_vals,  # (R_sh, C_sh, trp, k) P('rows','cols'), donated
    carry_idx,
    *,
    mesh: Mesh,
    flags: tuple,
    k: int,
    k_pad: int,
    trp: int,
    u_pad: int,
    tc: int,
    has_allowed: bool,
    has_filter: bool,
    has_target: bool,
    compute_dtype: str,
    precision: str,
    use_pallas: bool,
    f32x3: bool = False,
):
    """One panel batch x one resident tile group, all shards at once.

    MATRIX-mode selectors arrive as per-(row-shard, tile) padded COO under
    `fil_*`/`tgt_*` keys (sharded over BOTH mesh axes) and scatter to
    per-tile masks inside the shard — the sharded equivalent of the
    reference's per-row binary-search exclusion (s_plus.h:159-188)."""
    cdt, acc = compute_cast(compute_dtype)
    prec = {
        "default": jax.lax.Precision.DEFAULT,
        "high": jax.lax.Precision.HIGH,
        "highest": jax.lax.Precision.HIGHEST,
    }[precision]
    has_cols_axis = "cols" in mesh.axis_names

    def block_fn(m1_rows, m1_cols, m1_vals, x_t, x_c, x_d,
                 d_stack, tiles, pvec, carry_vals, carry_idx):
        m1_rows, m1_cols, m1_vals = m1_rows[0], m1_cols[0], m1_vals[0]
        x_t, x_c, x_d = x_t[0], x_c[0], x_d[0]
        # selector arrays carry a leading row-shard dim (size 1 in-block)
        tiles = {
            k2: (v[0] if k2.startswith(("fil_", "tgt_")) else v)
            for k2, v in tiles.items()
        }
        cv, ci = carry_vals[0, 0], carry_idx[0, 0]

        m1_dense = densify(
            (trp, u_pad), m1_rows, m1_cols, m1_vals,
            # 'rhs': panel values are bf16-exact — plain bf16, no lo half
            jnp.bfloat16 if f32x3 == "rhs" else cdt,
        )
        if f32x3 in (True, "both", "lhs"):
            from .pallas_kernels import split_bf16x3

            m1_dense = split_bf16x3(m1_dense, axis=1)

        def tile_step(carry, xs):
            topk_vals, topk_idx = carry
            d = xs["d"]
            fmask = tmask = None
            if has_filter:
                fmask = scatter_mask((trp, tc), xs["fil_rows"], xs["fil_cols"])
            if has_target:
                tmask = scatter_mask((trp, tc), xs["tgt_rows"], xs["tgt_cols"])
            if use_pallas:
                from .pallas_kernels import fused_tile_topk

                pvec_ext = jnp.concatenate(
                    [pvec, xs["col_offset"][0].astype(jnp.float32).reshape(1),
                     jnp.zeros(5, jnp.float32)]
                )
                new_v, new_i = fused_tile_topk(
                    m1_dense, d,
                    x_t, x_c, x_d,
                    xs["y_t"], xs["y_c"], xs["y_d"],
                    pvec_ext,
                    allowed=(xs["allowed"].astype(jnp.uint8)
                             if has_allowed else None),
                    fmask=fmask.astype(jnp.uint8) if fmask is not None
                    else None,
                    tmask=tmask.astype(jnp.uint8) if tmask is not None
                    else None,
                    carry=(topk_vals, topk_idx),
                    flags=flags, k_pad=k_pad,
                    int8_mode=compute_dtype in ("int8", "int4"),
                    precision=prec,
                    split_f32=f32x3,
                    interpret=jax.default_backend() != "tpu",
                )
                return (new_v, new_i), None

            xy = jnp.dot(m1_dense, d, preferred_element_type=acc,
                         precision=prec)
            if compute_dtype in ("int8", "int4"):
                xy = xy.astype(jnp.float32) * pvec[9]
            candidate = xy != 0.0
            if has_allowed:
                candidate = jnp.logical_and(candidate, xs["allowed"][None, :])
            if has_filter:
                candidate = jnp.logical_and(candidate, jnp.logical_not(fmask))
            if has_target:
                candidate = jnp.logical_and(candidate, tmask)
            val = splus_epilogue(
                xy, candidate, x_t, x_c, x_d,
                xs["y_t"], xs["y_c"], xs["y_d"], pvec, flags,
            )
            col_ids = xs["col_offset"] + jax.lax.broadcasted_iota(
                jnp.int32, (1, tc), 1
            )
            new_v, new_i = topk_merge(topk_vals, topk_idx, val, col_ids, k)
            return (new_v, new_i), None

        xs = dict(tiles)
        xs["d"] = d_stack
        (vals, idx), _ = jax.lax.scan(tile_step, (cv, ci), xs)
        return vals[None, None], idx[None, None]

    col_ax = "cols" if has_cols_axis else None
    tile_specs = {
        k2: (
            P("rows", col_ax, None)
            if k2.startswith(("fil_", "tgt_"))
            else P(col_ax, *([None] * (v.ndim - 1)))
        )
        for k2, v in tiles.items()
    }
    return jax.shard_map(
        block_fn,
        mesh=mesh,
        in_specs=(
            P("rows", None), P("rows", None), P("rows", None),
            P("rows", None), P("rows", None), P("rows", None),
            P(col_ax, None, None),
            tile_specs,
            P(),
            P("rows", col_ax, None, None),
            P("rows", col_ax, None, None),
        ),
        out_specs=(
            P("rows", col_ax, None, None),
            P("rows", col_ax, None, None),
        ),
        check_vma=False,
    )(m1_rows, m1_cols, m1_vals, x_t, x_c, x_d,
      d_stack, tiles, pvec, carry_vals, carry_idx)


@partial(jax.jit, static_argnames=("mesh", "k", "planes", "replicate"))
def _merge_cols(carry_vals, carry_idx, *, mesh: Mesh, k: int,
                planes: bool = False, replicate: bool = False):
    """Final distributed top-K merge: gather every col-shard's local k and
    re-select (the distributed replacement for the reference's per-thread
    heap drain, s_plus.h:39-64). With `planes` the local carry arrives as
    sorted (k_pad, trp) fused-kernel planes and is sliced to (trp, k)
    first; k here is already min(k, k_pad). With `replicate` the result is
    additionally all-gathered over 'rows' so it is fully replicated —
    required when the mesh spans multiple processes (a host can only
    np.asarray addressable or replicated arrays)."""
    has_cols = "cols" in mesh.axis_names
    has_rows = "rows" in mesh.axis_names

    def block_fn(cv, ci):
        v, i = cv[0, 0], ci[0, 0]
        if planes:
            v = v.T[:, :k]  # sorted desc along k_pad
            i = i.T[:, :k]
        if has_cols:
            av = jax.lax.all_gather(v, "cols", axis=1, tiled=True)
            ai = jax.lax.all_gather(i, "cols", axis=1, tiled=True)
            v, pos = jax.lax.top_k(av, k)
            i = jnp.take_along_axis(ai, pos, axis=1)
        if replicate and has_rows:
            return (
                jax.lax.all_gather(v, "rows", axis=0, tiled=False),
                jax.lax.all_gather(i, "rows", axis=0, tiled=False),
            )
        return v[None], i[None]

    col_ax = "cols" if has_cols else None
    out_row_ax = None if (replicate and has_rows) else "rows"
    return jax.shard_map(
        block_fn,
        mesh=mesh,
        in_specs=(P("rows", col_ax, None, None), P("rows", col_ax, None, None)),
        out_specs=(P(out_row_ax, None, None), P(out_row_ax, None, None)),
        check_vma=False,
    )(carry_vals, carry_idx)


def _execute_sharded_grouped(
    pre: Preprocessed,
    params: SPlusParams,
    *,
    mesh: Mesh,
    compute_dtype: str,
    precision: str,
    budget_bytes: Optional[int],
    progress=None,
):
    """Grouped + fused-kernel sharded execution (no MATRIX selectors)."""
    import math as _math

    from jax.sharding import NamedSharding

    from .executor import (
        _cache_get, _cache_put, _evict_stale, _fingerprint, _pallas_enabled,
        _stack_m2_tiles_balanced, _vec_by_map, balance_columns,
    )
    from .pallas_kernels import DEFAULT_TC, KB, TM

    m1, m2, targets, k = pre.m1, pre.m2, pre.targets, pre.k
    T = targets.shape[0]
    U = m1.shape[1]
    C = pre.n_output_cols
    R_sh, C_sh = _mesh_axis_sizes(mesh)

    compute_dtype, inv_scale = resolve_compute_dtype(compute_dtype, pre)
    use_pallas = _pallas_enabled()
    # f32-HIGH split-bf16x3 mode selection and the exclude-seen filter
    # fold both come from the executor's shared helpers — the
    # exactness-critical logic has exactly one implementation
    from .executor import _exclude_seen_fold, _select_f32x3_mode

    compute_dtype, f32x3 = _select_f32x3_mode(
        pre, m1, m2, compute_dtype, precision, use_pallas
    )
    fold_M = _exclude_seen_fold(pre, m1, m2, params, compute_dtype, C)
    u_pad = max(_round_up(U, KB), KB)
    tc = DEFAULT_TC if compute_dtype != "float32" else DEFAULT_TC // 2
    tc = min(tc, _round_up(C, 128))
    # carry planes accumulate across all tiles -> depth min(k, C) (same
    # reasoning as the executor)
    k_pad = _round_up(min(k, C), 8)
    if k_pad > 1024:
        use_pallas = False  # same documented cutover as the executor
        f32x3 = False

    # tiles: balanced columns, grouped so every shard holds G tiles per
    # group resident; group axis leads so slicing keeps the 'cols' shard
    budget = budget_bytes if budget_bytes is not None else hbm_budget_bytes()
    dense_item = {"bfloat16": 2, "int8": 1, "int4": 1}.get(compute_dtype, 4)
    # 'lhs' tiles are plain bf16 (see executor._d_split)
    tile_bytes = u_pad * tc * (2 if f32x3 == "lhs" else dense_item)
    per_dev_avail = int(budget * 0.8) - (1 << 29)
    g_tiles = max(1, per_dev_avail // max(tile_bytes, 1))
    n_tiles_min = _math.ceil(C / tc)
    # per-shard tile count, then groups of at most g_tiles per shard
    l_shard = _math.ceil(n_tiles_min / C_sh)
    n_groups = max(1, _math.ceil(l_shard / g_tiles))
    L = _math.ceil(l_shard / n_groups)  # tiles per (shard, group)
    n_tiles = C_sh * n_groups * L

    trp = min(
        max(_round_up(_math.ceil(T / R_sh), TM), TM),
        2048,
    )

    m2_key = (
        "sh_m2",
        pre.fp2,
        _fingerprint(pre.Yt, pre.Yc, pre.Yd, pre.col_allowed),
        compute_dtype, tc, n_tiles, u_pad, mesh, fold_M,
    )
    # device layout: (n_groups, C_sh*L, ...) with tiles interleaved so
    # shard c's tiles are [c*n_groups*L ... ) split across groups —
    # i.e. tile (g, c*L + j) = flat tile c*(n_groups*L) + g*L + j
    def to_dev(a):
        a = np.asarray(a)
        a2 = a.reshape(C_sh, n_groups, L, *a.shape[1:])
        a2 = np.moveaxis(a2, 1, 0).reshape(
            n_groups, C_sh * L, *a.shape[1:]
        )
        return a2

    cached = _cache_get(m2_key)
    if cached is None:
        _evict_stale(m2_key[0], pre.fp2, m2_key)
        m2_csc = csc_quantized(
            m2, pre.qscale2 if compute_dtype in ("int8", "int4") else None
        )
        if fold_M is not None:
            from .executor import _apply_fold

            m2_csc = _apply_fold(m2_csc, fold_M, C)
        col_nnz = np.diff(m2_csc.indptr)
        tile_lists, col_map = balance_columns(col_nnz, n_tiles, tc)
        t_rows, t_cols, t_vals = _stack_m2_tiles_balanced(
            m2_csc, tile_lists, tc, u_pad
        )
        yt = _vec_by_map(pre.Yt, col_map, C).reshape(n_tiles, tc)
        yc = _vec_by_map(pre.Yc, col_map, C).reshape(n_tiles, tc)
        yd = _vec_by_map(pre.Yd, col_map, C).reshape(n_tiles, tc)
        col_offsets = (np.arange(n_tiles, dtype=np.int32) * tc).reshape(
            n_tiles, 1
        )

        sharding = NamedSharding(
            mesh,
            P(None, "cols" if "cols" in mesh.axis_names else None,
              *([None] * 1)),
        )
        tiles_np = {
            "m2_rows": to_dev(t_rows),
            "m2_cols": to_dev(t_cols),
            "m2_vals": to_dev(t_vals),
            "y_t": to_dev(yt),
            "y_c": to_dev(yc),
            "y_d": to_dev(yd),
            "col_offset": to_dev(col_offsets),
        }
        if pre.col_allowed is not None:
            allowed = np.zeros(col_map.shape[0], dtype=bool)
            used = col_map < C
            allowed[used] = pre.col_allowed[col_map[used]]
            tiles_np["allowed"] = to_dev(allowed.reshape(n_tiles, tc))
        tiles_dev = {
            k2: jax.device_put(v, sharding) for k2, v in tiles_np.items()
        }
        # flat index of tile (g, s*L+j) in the balanced layout, for
        # un-permuting: col_offset already carries the flat position
        _cache_put(m2_key, (tiles_dev, col_map, tile_lists))
    else:
        tiles_dev, col_map, tile_lists = cached
    has_allowed = "allowed" in tiles_dev

    pvec = jnp.asarray(build_pvec(params, inv_scale))
    xt_full, xc_full, xd_full = pre.Xt, pre.Xc, pre.Xd
    row_sharding = NamedSharding(mesh, P("rows", None))
    col_ax = "cols" if "cols" in mesh.axis_names else None
    carry_sharding = NamedSharding(mesh, P("rows", col_ax, None, None))

    # m1: nnz-balanced panels dealt over (batch, row-shard) slots, staged
    # to device once and cached across calls
    rows_per_call = R_sh * trp
    n_batches = max(_math.ceil(T / rows_per_call), 1)
    m1_key = (
        "sh_m1",
        pre.fp1,
        _fingerprint(targets, xt_full, xc_full, xd_full),
        compute_dtype, trp, mesh,
    )
    cached = _cache_get(m1_key)
    if cached is None:
        _evict_stale("sh_m1", pre.fp1, m1_key)
        m1_t = m1[targets]
        if compute_dtype in ("int8", "int4"):
            m1_t.data = np.rint(m1_t.data * pre.qscale1).astype(np.float32)
        n_slots = n_batches * R_sh
        row_nnz = np.diff(m1_t.indptr)
        order = np.argsort(-row_nnz, kind="stable")
        slot_sel = [order[s::n_slots] for s in range(n_slots)]
        p1 = _pad_bucket(max(int(row_nnz[sel].sum()) for sel in slot_sel))
        batch_args = []
        batch_sels = []
        for b in range(n_batches):
            pr = np.full((R_sh, p1), trp, np.int32)
            pc = np.zeros((R_sh, p1), np.int32)
            pv = np.zeros((R_sh, p1), np.float32)
            sx_t = np.ones((R_sh, trp), np.float32)
            sx_c = np.ones((R_sh, trp), np.float32)
            sx_d = np.ones((R_sh, trp), np.float32)
            sels = []
            for r in range(R_sh):
                sel = slot_sel[b * R_sh + r]
                sels.append(sel)
                panel = m1_t[sel]
                nnz = panel.data.shape[0]
                if nnz:
                    pr[r, :nnz] = np.repeat(
                        np.arange(sel.shape[0], dtype=np.int32),
                        np.diff(panel.indptr),
                    )
                    pc[r, :nnz] = panel.indices
                    pv[r, :nnz] = panel.data
                tgt_ids = targets[sel]
                n_here = sel.shape[0]
                if xt_full is not None:
                    sx_t[r, :n_here] = xt_full[tgt_ids]
                if xc_full is not None:
                    sx_c[r, :n_here] = xc_full[tgt_ids]
                if xd_full is not None:
                    sx_d[r, :n_here] = xd_full[tgt_ids]
            batch_args.append(tuple(
                jax.device_put(a, row_sharding)
                for a in (pr, pc, pv, sx_t, sx_c, sx_d)
            ))
            batch_sels.append(sels)
        _cache_put(m1_key, (batch_args, batch_sels))
    else:
        batch_args, batch_sels = cached

    # MATRIX-mode selectors: per-(batch, row-shard) padded COO tiles under
    # the balanced column layout, sharded over BOTH mesh axes (rebuilt per
    # call — selector matrices change every scoring batch). A folded
    # filter needs no staging at all.
    has_filter = pre.filter_matrix is not None and fold_M is None
    has_target = pre.target_matrix is not None
    sel_batches: list = [dict() for _ in range(n_batches)]
    if has_filter or has_target:
        from .executor import _stack_selector_tiles_balanced

        sel_sharding = NamedSharding(
            mesh, P("rows" if "rows" in mesh.axis_names else None,
                    None, col_ax, None)
        )

        def stage_selector(mat, prefix):
            from .executor import _selector_pf

            sel_t = mat[targets]
            pf = _selector_pf(
                sel_t,
                [sel for b in range(n_batches) for sel in batch_sels[b]],
                col_map, tc, C, n_tiles,
            )
            for b in range(n_batches):
                rows_np = np.full((R_sh, n_groups, C_sh * L, pf), trp,
                                  np.int32)
                cols_np = np.zeros((R_sh, n_groups, C_sh * L, pf), np.int32)
                for r, sel in enumerate(batch_sels[b]):
                    rr, cc = _stack_selector_tiles_balanced(
                        sel_t[sel].tocsc(), tile_lists, tc, trp, pf=pf
                    )
                    rows_np[r] = to_dev(rr)
                    cols_np[r] = to_dev(cc)
                sel_batches[b][prefix + "rows"] = jax.device_put(
                    rows_np, sel_sharding
                )
                sel_batches[b][prefix + "cols"] = jax.device_put(
                    cols_np, sel_sharding
                )

        if has_filter:
            stage_selector(pre.filter_matrix, "fil_")
        if has_target:
            stage_selector(pre.target_matrix, "tgt_")

    # carries per batch, local per (row, col) shard; group-outer loop so
    # only ONE group's dense tile stack is resident at a time. Fused path:
    # (k_pad, trp) planes merged in-kernel per tile.
    carry_shape = (
        (R_sh, C_sh, k_pad, trp) if use_pallas else (R_sh, C_sh, trp, k)
    )
    carries = [
        (
            jax.device_put(
                np.full(carry_shape, NEG_INF, np.float32), carry_sharding
            ),
            jax.device_put(np.zeros(carry_shape, np.int32), carry_sharding),
        )
        for _ in range(n_batches)
    ]

    from .executor import _densify_group

    from .executor import _d_split

    d_split = _d_split(f32x3)
    for g in range(n_groups):
        d_stack = _densify_group(
            tiles_dev["m2_rows"][g],
            tiles_dev["m2_cols"][g],
            tiles_dev["m2_vals"][g],
            u_pad=u_pad, tc=tc, compute_dtype=compute_dtype, split=d_split,
        )
        tiles_g = {
            k2: v[g]
            for k2, v in tiles_dev.items()
            if k2 not in ("m2_rows", "m2_cols", "m2_vals")
        }
        for b in range(n_batches):
            cv, ci = carries[b]
            tiles_gb = dict(tiles_g)
            for name, arr in sel_batches[b].items():
                tiles_gb[name] = arr[:, g]  # (R_sh, C_sh*L, pf)
            carries[b] = _run_sharded_group(
                *batch_args[b], d_stack, tiles_gb, pvec, cv, ci,
                mesh=mesh, flags=params.static_flags(),
                k=k, k_pad=k_pad, trp=trp, u_pad=u_pad, tc=tc,
                has_allowed=has_allowed,
                has_filter=has_filter, has_target=has_target,
                compute_dtype=compute_dtype, precision=precision,
                use_pallas=use_pallas, f32x3=f32x3,
            )
        if n_groups > 1:
            # barrier: don't queue the next group's densify behind all of
            # this group's work (HBM would hold two dense stacks)
            if jax.process_count() > 1:
                # cannot fetch a cross-process array; local completion of
                # this process's shards is the same backpressure
                jax.block_until_ready(carries[0][0])
            else:
                np.asarray(carries[0][0].ravel()[:1])
        del d_stack

    # multi-process meshes need the merged output replicated (each process
    # can only fetch its addressable shards); single-process keeps the
    # cheaper row-sharded readback
    replicate = jax.process_count() > 1
    k_out = min(k, k_pad) if use_pallas else k
    out_vals = np.full((T, k), NEG_INF, np.float32)
    out_idx = np.zeros((T, k), np.int32)
    for b in range(n_batches):
        vals, idx = _merge_cols(*carries[b], mesh=mesh, k=k_out,
                                planes=use_pallas, replicate=replicate)
        vals = np.asarray(vals)
        idx = np.asarray(idx)
        done = 0
        for r, sel in enumerate(batch_sels[b]):
            out_vals[sel, :k_out] = vals[r, : sel.shape[0]]
            out_idx[sel, :k_out] = idx[r, : sel.shape[0]]
            done += sel.shape[0]
        if progress is not None:
            progress.update(done)

    out_idx = col_map[out_idx].astype(np.int32)
    return out_vals, out_idx


def execute_sharded(
    pre: Preprocessed,
    params: SPlusParams,
    *,
    mesh: Mesh,
    block_size_hint: Optional[int] = 0,
    compute_dtype: str = "float32",
    precision: str = "highest",
    budget_bytes: Optional[int] = None,
    progress=None,
):
    """Run the mesh-sharded similarity; returns host (T, k) vals f32 / idx i32."""
    from .symmetric import symmetric_eligible

    if (
        symmetric_eligible(pre, params, block_size_hint)
        and pre.k > 0
        and pre.n_output_cols > 0
        and os.environ.get("SIMILARIPY_TPU_SYM_SHARDED", "1") != "0"
    ):
        from .sym_sharded import execute_symmetric_sharded

        return execute_symmetric_sharded(
            pre, params, mesh=mesh,
            compute_dtype=compute_dtype, precision=precision,
            budget_bytes=budget_bytes, progress=progress,
        )
    if (
        pre.targets.shape[0] > 0
        and pre.k > 0
        and os.environ.get("SIMILARIPY_TPU_SHARDED_GROUPED", "1") != "0"
    ):
        return _execute_sharded_grouped(
            pre, params, mesh=mesh,
            compute_dtype=compute_dtype, precision=precision,
            budget_bytes=budget_bytes, progress=progress,
        )
    return _execute_sharded_legacy(
        pre, params, mesh=mesh, block_size_hint=block_size_hint,
        compute_dtype=compute_dtype, precision=precision,
        budget_bytes=budget_bytes, progress=progress,
    )


def _execute_sharded_legacy(
    pre: Preprocessed,
    params: SPlusParams,
    *,
    mesh: Mesh,
    block_size_hint: Optional[int] = 0,
    compute_dtype: str = "float32",
    precision: str = "highest",
    budget_bytes: Optional[int] = None,
    progress=None,
):
    """Scan-over-tiles sharded path (MATRIX-mode selectors route here)."""
    m1, m2, targets, k = pre.m1, pre.m2, pre.targets, pre.k
    T = targets.shape[0]
    U = m1.shape[1]
    C = pre.n_output_cols
    R_sh, C_sh = _mesh_axis_sizes(mesh)

    if T == 0 or k == 0:
        return (
            np.full((T, max(k, 1)), NEG_INF, np.float32),
            np.zeros((T, max(k, 1)), np.int32),
        )

    # --- plan: per-shard column span, tiled; per-shard row panel ---
    compute_dtype, inv_scale = resolve_compute_dtype(compute_dtype, pre)
    itemsize = {"bfloat16": 2, "int8": 3, "int4": 3}.get(compute_dtype, 4)  # int8 scatters via bf16
    c_span = _round_up(math.ceil(C / C_sh), 128)
    plan = plan_tiles(
        max(math.ceil(T / R_sh), 8), U, c_span, k, itemsize, block_size_hint,
        budget_bytes if budget_bytes is not None else hbm_budget_bytes(),
    )
    trp, u_pad = plan.panel_rows, plan.u_pad
    tc = min(plan.tile_cols, c_span)
    n_tiles_local = math.ceil(c_span / tc)
    c_span = n_tiles_local * tc  # realign span to whole tiles
    c_pad = C_sh * c_span

    m1_t = m1[targets]
    m2_csc = csc_quantized(
        m2, pre.qscale2 if compute_dtype in ("int8", "int4") else None
    )
    if compute_dtype in ("int8", "int4"):
        m1_t.data = np.rint(m1_t.data * pre.qscale1).astype(np.float32)

    # --- per-col-shard m2 tiles, padded to one global nnz bucket ---
    shard_tiles = []
    max_nnz = 1
    for c in range(C_sh):
        c0 = min(c * c_span, C)
        c1 = min((c + 1) * c_span, C)
        sub = m2_csc[:, c0:c1]
        n_sub = c1 - c0
        for j in range(n_tiles_local):
            t0, t1 = j * tc, min((j + 1) * tc, max(n_sub, 0))
            if t0 < n_sub:
                max_nnz = max(max_nnz, int(sub.indptr[t1] - sub.indptr[t0]))
        shard_tiles.append((sub, n_sub, c0))
    p2 = _pad_bucket(max_nnz)

    t_rows = np.full((C_sh, n_tiles_local, p2), u_pad, np.int32)
    t_cols = np.zeros((C_sh, n_tiles_local, p2), np.int32)
    t_vals = np.zeros((C_sh, n_tiles_local, p2), np.float32)
    for c, (sub, n_sub, _c0) in enumerate(shard_tiles):
        if n_sub <= 0:
            continue
        r, cc, v = _stack_m2_tiles(
            _pad_csc_cols(sub, c_span), c_span, tc, n_tiles_local, u_pad
        )
        # _stack_m2_tiles pads per its own bucket; re-pad into the global one
        w = min(r.shape[1], p2)
        t_rows[c, :, :w], t_cols[c, :, :w], t_vals[c, :, :w] = (
            r[:, :w], cc[:, :w], v[:, :w],
        )

    yt = _pad_vec(pre.Yt, c_pad).reshape(C_sh, n_tiles_local, tc)
    yc = _pad_vec(pre.Yc, c_pad).reshape(C_sh, n_tiles_local, tc)
    yd = _pad_vec(pre.Yd, c_pad).reshape(C_sh, n_tiles_local, tc)
    col_offsets = (
        np.arange(C_sh * n_tiles_local, dtype=np.int32) * tc
    ).reshape(C_sh, n_tiles_local, 1)

    tiles_common = {
        "m2_rows": jnp.asarray(t_rows),
        "m2_cols": jnp.asarray(t_cols),
        "m2_vals": jnp.asarray(t_vals),
        "y_t": jnp.asarray(yt),
        "y_c": jnp.asarray(yc),
        "y_d": jnp.asarray(yd),
        "col_offset": jnp.asarray(col_offsets),
    }
    has_allowed = pre.col_allowed is not None
    if has_allowed:
        allowed = np.zeros(c_pad, dtype=bool)
        allowed[:C] = pre.col_allowed
        tiles_common["allowed"] = jnp.asarray(allowed.reshape(C_sh, n_tiles_local, tc))

    has_filter = pre.filter_matrix is not None
    has_target = pre.target_matrix is not None
    fil_t = pre.filter_matrix[targets] if has_filter else None
    tgt_t = pre.target_matrix[targets] if has_target else None

    pvec = jnp.asarray(build_pvec(params, inv_scale))

    out_vals = np.empty((T, k), np.float32)
    out_idx = np.empty((T, k), np.int32)

    xt_full, xc_full, xd_full = pre.Xt, pre.Xc, pre.Xd

    rows_per_call = R_sh * trp
    n_calls = math.ceil(T / rows_per_call)
    for p in range(n_calls):
        base = p * rows_per_call
        # --- per-row-shard m1 panels, one shared nnz bucket ---
        panels = []
        max_p1 = 1
        for r in range(R_sh):
            r0 = min(base + r * trp, T)
            r1 = min(r0 + trp, T)
            panel = m1_t[r0:r1]
            max_p1 = max(max_p1, int(panel.data.shape[0]))
            panels.append((panel, r0, r1))
        p1 = _pad_bucket(max_p1)

        pr = np.full((R_sh, p1), trp, np.int32)
        pc = np.zeros((R_sh, p1), np.int32)
        pv = np.zeros((R_sh, p1), np.float32)
        x_t = np.ones((R_sh, trp), np.float32)
        x_c = np.ones((R_sh, trp), np.float32)
        x_d = np.ones((R_sh, trp), np.float32)
        for r, (panel, r0, r1) in enumerate(panels):
            nnz = panel.data.shape[0]
            if nnz:
                pr[r, :nnz] = np.repeat(
                    np.arange(r1 - r0, dtype=np.int32), np.diff(panel.indptr)
                )
                pc[r, :nnz] = panel.indices
                pv[r, :nnz] = panel.data
            tgt_ids = targets[r0:r1]
            n_here = r1 - r0
            if xt_full is not None:
                x_t[r, :n_here] = xt_full[tgt_ids]
            if xc_full is not None:
                x_c[r, :n_here] = xc_full[tgt_ids]
            if xd_full is not None:
                x_d[r, :n_here] = xd_full[tgt_ids]

        tiles = dict(tiles_common)
        if has_filter:
            tiles["fil_rows"], tiles["fil_cols"] = _stack_sel_grid(
                fil_t, panels, shard_tiles, tc, n_tiles_local, trp, R_sh, C_sh
            )
        if has_target:
            tiles["tgt_rows"], tiles["tgt_cols"] = _stack_sel_grid(
                tgt_t, panels, shard_tiles, tc, n_tiles_local, trp, R_sh, C_sh
            )

        vals, idx = _run_sharded_panel(
            jnp.asarray(pr), jnp.asarray(pc), jnp.asarray(pv),
            jnp.asarray(x_t), jnp.asarray(x_c), jnp.asarray(x_d),
            tiles, pvec,
            mesh=mesh,
            flags=params.static_flags(),
            k=k, trp=trp, u_pad=u_pad, tc=tc,
            has_allowed=has_allowed, has_filter=has_filter, has_target=has_target,
            compute_dtype=compute_dtype, precision=precision,
        )
        vals = np.asarray(vals)
        idx = np.asarray(idx)
        done = 0
        for r, (_panel, r0, r1) in enumerate(panels):
            out_vals[r0:r1] = vals[r, : r1 - r0]
            out_idx[r0:r1] = idx[r, : r1 - r0]
            done += r1 - r0
        if progress is not None:
            progress.update(done)

    return out_vals, out_idx


def _stack_sel_grid(sel_t, panels, shard_tiles, tc, n_tiles_local, trp, R_sh, C_sh):
    """Selector COO tiles over the (row-shard × col-shard) grid.

    Returns (R_sh, C_sh, n_tiles_local, pf) rows/cols arrays; sentinel row trp
    drops padding on scatter (matrix-mode selector semantics,
    reference: s_plus.h:159-188).
    """
    c_span = n_tiles_local * tc
    grids = []
    max_nnz = 1
    for _panel, r0, r1 in panels:
        row = []
        sel_panel = sel_t[r0:r1].tocsc()
        for sub_c in range(C_sh):
            _sub, n_sub, c0 = shard_tiles[sub_c]
            sel_sub = _pad_csc_cols(sel_panel[:, c0 : c0 + n_sub], c_span)
            for j in range(n_tiles_local):
                t0, t1 = j * tc, (j + 1) * tc
                max_nnz = max(max_nnz, int(sel_sub.indptr[t1] - sel_sub.indptr[t0]))
            row.append(sel_sub)
        grids.append(row)
    pf = _pad_bucket(max_nnz, minimum=256)

    rows = np.full((R_sh, C_sh, n_tiles_local, pf), trp, np.int32)
    cols = np.zeros((R_sh, C_sh, n_tiles_local, pf), np.int32)
    for r in range(R_sh):
        for c in range(C_sh):
            rr, cc = _stack_selector_tiles(grids[r][c], c_span, tc, n_tiles_local, trp)
            w = min(rr.shape[1], pf)
            rows[r, c, :, :w], cols[r, c, :, :w] = rr[:, :w], cc[:, :w]
    return jnp.asarray(rows), jnp.asarray(cols)
