"""Union-compaction executor: the single-chip performance path.

The grouped dense-tile executor (executor.py) multiplies every panel against
the full padded inner (user) dimension — at ML-32M density that is ~2 orders
of magnitude more MXU work than the nonzero structure requires. This module
shrinks the inner dimension per panel to

    K_panel = H (hot prefix) + union(cold users touched by the panel)

which empirically cuts matmul flops 5-8x on ML-32M-shaped data:

  - users (the inner axis) are ranked by how many panel rows touch them;
    the top-H "hot" rows of the densified matrix2 are shared by every panel
    and multiplied densely (popular users appear in virtually every panel's
    union, so compacting them would save nothing),
  - each panel's remaining "cold" union rows are copied into a compact
    buffer by a Pallas row-gather (engine/gather.py) — XLA gather copies
    the whole table and cannot be used,
  - the fused Pallas kernel (pallas_kernels.fused_panel_topk) computes
    cold-matmul + hot-bias + S-Plus epilogue + per-row top-k in one pass.

Panels are items dealt round-robin within degree classes so per-panel nnz
and unions stay balanced; panels whose cold union exceeds the largest
bucket run through the same kernel with the full inner dimension (no
gather, no bias) — those are exactly the panels where compaction cannot
help. This is the TPU answer to the reference's CSR Gustavson walk, which
only ever touches stored entries (reference:
similaripy/cython_code/s_plus.h:358-410).

int8 exactness is preserved end-to-end: the hot partial scores stay int32
and are added to the cold int32 accumulator inside the kernel before the
single inverse-scale multiply.

STATUS (measured on real v5e, round 2): the flop reduction is real, but
the per-row DMA gather the cold side depends on runs at ~6 GB/s one-way —
the DMA engine retires ~290k row descriptors/s regardless of pipeline
depth — so the gather costs more than the flops it saves. The path is
therefore OFF by default on TPU hardware (compact_eligible;
SIMILARIPY_TPU_COMPACT=1 forces it) and fully exercised off-TPU via the
XLA take fallback. Measurements and the full analysis: BASELINE.md
"Union compaction" and CLAUDE.md.
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass, field
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.csr import csc_quantized
from ..utils.env import hbm_budget_bytes
from .params import SPlusParams
from .preprocess import Preprocessed

NEG_INF = float("-inf")


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# ---------------------------------------------------------------------------
# Host planning: panel assignment, buckets, unions, compact column remapping
# ---------------------------------------------------------------------------


@dataclass
class BucketPlan:
    """Panels whose cold unions fit one compiled K bucket."""

    B: int  # cold-union bucket width (0 for the dense bucket)
    K: int  # lhs width = H + B, or u_pad for the dense bucket
    panel_rows: list  # per panel: np.ndarray of panel-local target positions
    pr: np.ndarray  # (n_p, p1) int32 stacked lhs COO rows
    pc: np.ndarray  # (n_p, p1) int32 compact cols
    pv: np.ndarray  # (n_p, p1) f32 values
    gather_idx: Optional[np.ndarray]  # (n_p, B) int32 device ranks, pad 0
    sx_t: np.ndarray = None  # (n_p, TM) f32
    sx_c: np.ndarray = None
    sx_d: np.ndarray = None


@dataclass
class CompactPlan:
    H: int
    u_pad: int
    TM: int
    rank_of: np.ndarray  # (U,) int64: user id -> device row
    buckets: list = field(default_factory=list)  # [BucketPlan...]


def plan_compact(
    m1_t,  # target-sliced CSR (T x U), values already quantized if int8
    targets: np.ndarray,
    xt_full,
    xc_full,
    xd_full,
    *,
    u_pad: int,
    TM: int,
    H: int,
    uc_buckets: tuple,
) -> CompactPlan:
    """Partition target rows into TM-row panels with bucketed cold unions.

    Items are degree-sorted and dealt round-robin within each bucket class
    so panel nnz stays balanced without inflating unions (similar-degree
    items have statistically similar user sets). A panel overflowing its
    class after dealing is promoted to the next class.
    """
    T, U = m1_t.shape
    deg = np.diff(m1_t.indptr)

    # rank users by how many panel rows touch them: the most-touched rows
    # are the ones every panel would otherwise gather
    touch = np.bincount(m1_t.indices, minlength=U)
    order = np.argsort(-touch, kind="stable").astype(np.int64)
    rank_of = np.empty(U, dtype=np.int64)
    rank_of[order] = np.arange(U)

    plan = CompactPlan(H=H, u_pad=u_pad, TM=TM, rank_of=rank_of)

    # --- provisional contiguous panels in degree order -> class sizing ---
    item_order = np.argsort(-deg, kind="stable")
    ranked = rank_of[m1_t.indices]  # per-nnz device row

    def panel_cold_union(rows: np.ndarray) -> np.ndarray:
        parts = [ranked[m1_t.indptr[i]: m1_t.indptr[i + 1]] for i in rows]
        r = np.concatenate(parts) if parts else np.empty(0, np.int64)
        return np.unique(r[r >= H])

    classes = list(uc_buckets) + [None]  # None = dense class
    n_prov = math.ceil(T / TM)
    class_items: dict = {c: [] for c in classes}
    for p in range(n_prov):
        rows = item_order[p * TM: (p + 1) * TM]
        uc = panel_cold_union(rows).shape[0]
        for c in uc_buckets:
            if uc <= c:
                class_items[c].append(rows)
                break
        else:
            class_items[None].append(rows)

    # --- deal within class, verify, promote overflows ---
    carry_over: list = []
    for ci, c in enumerate(classes):
        items = class_items[c]
        pool = np.concatenate(items + carry_over) if (items or carry_over) else np.empty(0, np.int64)
        carry_over = []
        if pool.shape[0] == 0:
            continue
        n_p = math.ceil(pool.shape[0] / TM)
        panels = [pool[i::n_p] for i in range(n_p)]
        if c is not None:
            kept = []
            for rows in panels:
                if panel_cold_union(rows).shape[0] > c:
                    carry_over.append(rows)
                else:
                    kept.append(rows)
            panels = kept
        if not panels:
            continue

        B = int(c) if c is not None else 0
        K = H + B if c is not None else u_pad
        n_p = len(panels)

        # stacked lhs COO with compact column remapping + gather indices
        nnzs = [int(deg[rows].sum()) for rows in panels]
        p1 = 1 << max(int(np.ceil(np.log2(max(max(nnzs), 1)))), 8)
        pr = np.full((n_p, p1), TM, dtype=np.int32)  # TM = dropped sentinel
        pc = np.zeros((n_p, p1), dtype=np.int32)
        pv = np.zeros((n_p, p1), dtype=np.float32)
        gi = np.zeros((n_p, B), dtype=np.int32) if c is not None else None
        sx_t = np.ones((n_p, TM), dtype=np.float32)
        sx_c = np.ones((n_p, TM), dtype=np.float32)
        sx_d = np.ones((n_p, TM), dtype=np.float32)
        for pi, rows in enumerate(panels):
            parts = [ranked[m1_t.indptr[i]: m1_t.indptr[i + 1]] for i in rows]
            r_all = np.concatenate(parts) if parts else np.empty(0, np.int64)
            vals = np.concatenate(
                [m1_t.data[m1_t.indptr[i]: m1_t.indptr[i + 1]] for i in rows]
            ) if parts else np.empty(0, np.float32)
            row_ids = np.repeat(
                np.arange(len(rows), dtype=np.int32), deg[rows]
            )
            if c is not None:
                cold = np.unique(r_all[r_all >= H])
                gi[pi, : cold.shape[0]] = cold.astype(np.int32)
                # compact col: rank if hot else H + position in union
                cols = np.where(
                    r_all < H,
                    r_all,
                    H + np.searchsorted(cold, r_all),
                ).astype(np.int32)
            else:
                cols = r_all.astype(np.int32)
            n = cols.shape[0]
            pr[pi, :n] = row_ids
            pc[pi, :n] = cols
            pv[pi, :n] = vals

            tgt_ids = targets[rows]
            if xt_full is not None:
                sx_t[pi, : rows.shape[0]] = xt_full[tgt_ids]
            if xc_full is not None:
                sx_c[pi, : rows.shape[0]] = xc_full[tgt_ids]
            if xd_full is not None:
                sx_d[pi, : rows.shape[0]] = xd_full[tgt_ids]

        plan.buckets.append(
            BucketPlan(
                B=B, K=K, panel_rows=[np.asarray(r) for r in panels],
                pr=pr, pc=pc, pv=pv, gather_idx=gi,
                sx_t=sx_t, sx_c=sx_c, sx_d=sx_d,
            )
        )
    return plan


# ---------------------------------------------------------------------------
# Device-side execution
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("u_pad", "cg", "tc", "compute_dtype"),
         donate_argnums=(0,))
def _build_d_group(d, rows, cols, vals, offs, *, u_pad, cg, tc, compute_dtype):
    """Scatter a group's per-tile COOs into one (u_pad, cg) dense array.

    Tile-by-tile via dynamic_update_slice so the bf16 scatter transient is
    bounded to one (u_pad, tc) stripe; XLA performs the update in place on
    the donated buffer.
    """
    from .executor import compute_cast, densify

    cdt, _ = compute_cast(compute_dtype)

    def step(d, xs):
        tile = densify((u_pad, tc), xs["r"], xs["c"], xs["v"], cdt)
        d = jax.lax.dynamic_update_slice(d, tile, (0, xs["off"]))
        return d, None

    d, _ = jax.lax.scan(step, d, {"r": rows, "c": cols, "v": vals, "off": offs})
    return d


@jax.jit
def _flatten_d(d):
    """Relayout (u_pad, cg) -> flat int32-word view for the row-gather
    kernel (Mosaic forbids single-row slices of 2-D tiled HBM memrefs and
    sub-word 1-D layouts are sublane-packed — see engine/gather.py). One
    linear copy per group."""
    from .gather import to_flat_words

    return to_flat_words(d)


@partial(jax.jit, static_argnames=("TM", "K", "compute_dtype"))
def _scatter_lhs(pr, pc, pv, *, TM, K, compute_dtype):
    """(n_p, p1) COO stacks -> (n_p, TM, K) dense panels (sequential to
    bound the bf16 transient)."""
    from .executor import compute_cast, densify

    cdt, _ = compute_cast(compute_dtype)

    def one(args):
        r, c, v = args
        return densify((TM, K), r, c, v, cdt)

    return jax.lax.map(one, (pr, pc, pv))


@partial(
    jax.jit,
    static_argnames=(
        "flags", "k", "k_pad", "H", "tc", "has_allowed",
        "compute_dtype", "precision", "use_pallas", "dense_bucket",
    ),
    donate_argnums=(9, 10),
)
def _run_bucket_panels(
    lhs_stack,  # (n_p, TM, K) cdt
    gi_stack,  # (n_p, B) int32 or None-shaped (n_p, 0)
    sx_t,  # (n_p, TM) f32
    sx_c,
    sx_d,
    d_group,  # (u_pad, cg) cdt
    d_flat,  # (u_pad*cg,) cdt flat view copy for the row gather, or None
    yvecs,  # dict: y_t/y_c/y_d (cg,) f32 [+ allowed (cg,) u8]
    pvec_ext,  # (16,)
    carry_vals,  # (n_p, TM, k) donated
    carry_idx,
    *,
    flags, k, k_pad, H, tc,
    has_allowed, compute_dtype, precision, use_pallas, dense_bucket,
):
    """Scan over a bucket's panels: gather cold rows, hot-prefix matmul,
    fused epilogue+top-k, merge into the running carry."""
    from .executor import compute_cast, splus_epilogue, topk_merge
    from .gather import row_gather_words

    cdt, acc = compute_cast(compute_dtype)
    prec = {
        "default": jax.lax.Precision.DEFAULT,
        "high": jax.lax.Precision.HIGH,
        "highest": jax.lax.Precision.HIGHEST,
    }[precision]
    interp = jax.default_backend() != "tpu"
    TM = lhs_stack.shape[1]
    cg = d_group.shape[1]
    y_t, y_c, y_d = yvecs["y_t"], yvecs["y_c"], yvecs["y_d"]
    allowed = yvecs.get("allowed")

    def panel_step(_, pxs):
        lhs = pxs["lhs"]
        if dense_bucket:
            d_cold = d_group
            lhs_cold = lhs
            bias = None
        else:
            if d_flat is None:  # off-TPU: XLA take is fine on CPU
                d_cold = jnp.take(d_group, pxs["gi"], axis=0)
            else:
                d_cold = row_gather_words(d_flat, pxs["gi"], cg, cdt)
            lhs_cold = lhs[:, H:]
            bias = jnp.dot(
                lhs[:, :H], d_group[:H],
                preferred_element_type=acc,
                **({} if cdt != jnp.float32 else {"precision": prec}),
            )

        if use_pallas:
            from .pallas_kernels import fused_panel_topk

            vals_t, idx_t = fused_panel_topk(
                lhs_cold, d_cold,
                pxs["xt"], pxs["xc"], pxs["xd"],
                y_t, y_c, y_d,
                pvec_ext,
                bias=bias,
                allowed=allowed,
                flags=flags,
                k_pad=k_pad,
                tc=tc,
                int8_mode=compute_dtype in ("int8", "int4"),
                precision=prec,
                interpret=interp,
            )
            cand_vals = vals_t.transpose(2, 0, 1).reshape(TM, -1)
            cand_idx = idx_t.transpose(2, 0, 1).reshape(TM, -1)
            all_v = jnp.concatenate([pxs["cv"], cand_vals], axis=1)
            all_i = jnp.concatenate([pxs["ci"], cand_idx], axis=1)
            new_v, pos = jax.lax.top_k(all_v, k)
            new_i = jnp.take_along_axis(all_i, pos, axis=1)
        else:
            xy = jnp.dot(
                lhs_cold, d_cold, preferred_element_type=acc,
                **({} if cdt != jnp.float32 else {"precision": prec}),
            )
            if bias is not None:
                xy = xy + bias
            if compute_dtype in ("int8", "int4"):
                xy = xy.astype(jnp.float32) * pvec_ext[9]
            else:
                xy = xy.astype(jnp.float32)
            candidate = xy != 0.0
            if allowed is not None:
                candidate = jnp.logical_and(
                    candidate, allowed.astype(jnp.int32)[None, :] != 0
                )
            val = splus_epilogue(
                xy, candidate,
                pxs["xt"], pxs["xc"], pxs["xd"],
                y_t, y_c, y_d,
                pvec_ext, flags,
            )
            col_ids = (
                pvec_ext[10].astype(jnp.int32)
                + jax.lax.broadcasted_iota(jnp.int32, (1, cg), 1)
            )
            new_v, new_i = topk_merge(pxs["cv"], pxs["ci"], val, col_ids, k)
        return None, (new_v, new_i)

    xs = {
        "lhs": lhs_stack, "gi": gi_stack,
        "xt": sx_t, "xc": sx_c, "xd": sx_d,
        "cv": carry_vals, "ci": carry_idx,
    }
    _, (vals, idx) = jax.lax.scan(panel_step, None, xs)
    return vals, idx


# ---------------------------------------------------------------------------
# Orchestration
# ---------------------------------------------------------------------------


def _hot_height(u_pad: int) -> int:
    """Hot-prefix height: env-tunable, at most a quarter of the inner dim."""
    from .pallas_kernels import KB

    hot = int(os.environ.get("SIMILARIPY_TPU_HOT", 16384))
    h = min(hot, (u_pad // 4 // KB) * KB)
    return max(h, 0)


def compact_eligible(pre: Preprocessed, k: int) -> bool:
    """Whether the union-compaction path applies.

    Requirements: no per-row (MATRIX-mode) selectors, an inner dimension
    large enough for a hot/cold split to pay, and k within the fused
    kernel's extraction cap.

    On real TPU hardware the path is OFF by default
    (`SIMILARIPY_TPU_COMPACT=1` forces it): v5e microbenchmarks measured
    the per-row DMA gather at ~6 GB/s — the DMA engine retires ~290k
    row descriptors/s regardless of pipeline depth — so gathering the
    per-panel cold unions costs far more than the dense matmul flops it
    saves. Off-TPU (and in tests) the path runs via XLA take, where it is
    correct and exercised end-to-end; the measured evidence lives in
    BASELINE.md ("union compaction" section) and CLAUDE.md.
    """
    env = os.environ.get("SIMILARIPY_TPU_COMPACT", "auto")
    if env == "0":
        return False
    if pre.filter_matrix is not None or pre.target_matrix is not None:
        return False
    from ..utils.env import on_tpu
    from .pallas_kernels import KB

    u_pad = _round_up(pre.m1.shape[1], KB)
    if _hot_height(u_pad) < KB:
        return False
    if min(k, pre.n_output_cols) > 1024:
        # compact relies on the fused kernel; its in-kernel extraction is
        # capped at 1024 kept values per tile (see executor.py) — larger k
        # routes to the grouped XLA path, which handles any k exactly
        return False
    if env == "1":
        return True
    if on_tpu():
        return False  # measured: row-gather DMA rate kills the win (above)
    # auto off-TPU: worthwhile once the inner dim clearly exceeds the prefix
    return u_pad >= 4 * _hot_height(u_pad) or u_pad >= 32768


def execute_compact(
    pre: Preprocessed,
    params: SPlusParams,
    *,
    compute_dtype: str = "float32",
    precision: str = "highest",
    budget_bytes: Optional[int] = None,
    progress=None,
):
    """Union-compacted execution; same contract as executor.execute()."""
    import time as _time

    from . import executor as ex
    from .pallas_kernels import DEFAULT_TC, KB, TM

    _t_enter = _time.perf_counter()
    m1, m2, targets, k = pre.m1, pre.m2, pre.targets, pre.k
    T = targets.shape[0]
    U = m1.shape[1]
    C = pre.n_output_cols
    if T == 0 or k == 0:
        return (
            np.full((T, max(k, 1)), NEG_INF, np.float32),
            np.zeros((T, max(k, 1)), np.int32),
        )

    compute_dtype, inv_scale = ex.resolve_compute_dtype(compute_dtype, pre)
    u_pad = max(_round_up(U, KB), KB)
    H = _hot_height(u_pad)
    b_env = os.environ.get("SIMILARIPY_TPU_UC_BUCKETS")
    if b_env:
        uc_buckets = tuple(int(x) for x in b_env.split(",") if x)
    else:
        uc_buckets = (H // 2, 2 * H)
    uc_buckets = tuple(
        _round_up(b, KB) for b in uc_buckets if H + _round_up(b, KB) < u_pad
    )

    use_pallas = ex._pallas_enabled()
    tc = DEFAULT_TC if compute_dtype != "float32" else DEFAULT_TC // 2
    tc = min(tc, _round_up(C, 128))
    k_pad = _round_up(min(k, tc), 8)

    xt_full, xc_full, xd_full = pre.Xt, pre.Xc, pre.Xd

    # ---- m1 side: plan + device lhs stacks (cached across calls) ----
    m1_key = (
        "compact_m1",
        pre.fp1,
        ex._fingerprint(targets, xt_full, xc_full, xd_full),
        compute_dtype, TM, H, uc_buckets,
    )
    cached = ex._cache_get(m1_key)
    if cached is None:
        ex._evict_stale("compact_m1", pre.fp1, m1_key)
        m1_t = m1[targets]
        if compute_dtype in ("int8", "int4"):
            m1_t.data = np.rint(m1_t.data * pre.qscale1).astype(np.float32)
        plan = plan_compact(
            m1_t, targets, xt_full, xc_full, xd_full,
            u_pad=u_pad, TM=TM, H=H, uc_buckets=uc_buckets,
        )
        dev_buckets = []
        for b in plan.buckets:
            lhs = _scatter_lhs(
                jnp.asarray(b.pr), jnp.asarray(b.pc), jnp.asarray(b.pv),
                TM=TM, K=b.K, compute_dtype=compute_dtype,
            )
            gi = jnp.asarray(
                b.gather_idx if b.gather_idx is not None
                else np.zeros((len(b.panel_rows), 0), np.int32)
            )
            dev_buckets.append(
                dict(
                    B=b.B, K=b.K, panel_rows=b.panel_rows,
                    lhs=lhs, gi=gi,
                    sx_t=jnp.asarray(b.sx_t),
                    sx_c=jnp.asarray(b.sx_c),
                    sx_d=jnp.asarray(b.sx_d),
                )
            )
        rank_of = plan.rank_of
        ex._cache_put(m1_key, (dev_buckets, rank_of))
    else:
        dev_buckets, rank_of = cached

    lhs_bytes = sum(int(np.prod(b["lhs"].shape)) for b in dev_buckets)

    # ---- group sizing under the HBM budget ----
    budget = budget_bytes if budget_bytes is not None else hbm_budget_bytes()
    dense_item = {"bfloat16": 2, "int8": 1, "int4": 1}.get(compute_dtype, 4)
    b2 = max((b["B"] for b in dev_buckets), default=0)
    misc = (
        lhs_bytes * dense_item
        + int(m2.nnz * 12 * 1.8)  # staged COO uploads
        + (1 << 30)
    )
    avail = int(budget * 0.88) - misc
    on_tpu = jax.default_backend() == "tpu"
    bytes_per_col = (
        u_pad * dense_item * (2 if on_tpu else 1)  # d_group 2-D + flat copy
        + 2 * b2 * dense_item  # double-buffered gathered cold rows
        + 2 * TM * 4  # bias
    )
    cg_max = max(avail // max(bytes_per_col, 1), tc)
    n_total_tiles = math.ceil(C / tc)
    n_groups = max(1, math.ceil(n_total_tiles / max(cg_max // tc, 1)))
    G = math.ceil(n_total_tiles / n_groups)
    n_tiles = n_groups * G
    cg = G * tc

    # ---- m2 side: balanced columns, ranked rows, per-tile COO (cached) ----
    m2_key = (
        "compact_m2",
        pre.fp2,
        ex._fingerprint(pre.Yt, pre.Yc, pre.Yd, pre.col_allowed, rank_of),
        compute_dtype, tc, n_tiles, u_pad,
    )
    cached = ex._cache_get(m2_key)
    if cached is None:
        ex._evict_stale("compact_m2", pre.fp2, m2_key)
        m2_csc = csc_quantized(
            m2, pre.qscale2 if compute_dtype in ("int8", "int4") else None
        )
        col_nnz = np.diff(m2_csc.indptr)
        tile_lists, col_map = ex.balance_columns(col_nnz, n_tiles, tc)
        t_rows, t_cols, t_vals = ex._stack_m2_tiles_balanced(
            m2_csc, tile_lists, tc, u_pad
        )
        # rank the user axis; padding sentinel rows (u_pad) stay sentinel
        sent = t_rows >= U
        t_rows = np.where(sent, u_pad, rank_of[np.minimum(t_rows, U - 1)]).astype(
            np.int32
        )

        yvecs_np = {
            "y_t": ex._vec_by_map(pre.Yt, col_map, C),
            "y_c": ex._vec_by_map(pre.Yc, col_map, C),
            "y_d": ex._vec_by_map(pre.Yd, col_map, C),
        }
        if pre.col_allowed is not None:
            allowed = np.zeros(col_map.shape[0], dtype=np.uint8)
            used = col_map < C
            allowed[used] = pre.col_allowed[col_map[used]].astype(np.uint8)
            yvecs_np["allowed"] = allowed
        m2_dev = (
            jnp.asarray(t_rows), jnp.asarray(t_cols), jnp.asarray(t_vals),
            {k2: jnp.asarray(v) for k2, v in yvecs_np.items()},
        )
        ex._cache_put(m2_key, (m2_dev, col_map))
    else:
        m2_dev, col_map = cached
    t_rows, t_cols, t_vals, yvecs_all = m2_dev

    pvec = ex.build_pvec(params, inv_scale)
    flags = params.static_flags()

    carries = [
        (
            jnp.full((len(b["panel_rows"]), TM, k), NEG_INF, jnp.float32),
            jnp.zeros((len(b["panel_rows"]), TM, k), jnp.int32),
        )
        for b in dev_buckets
    ]

    timing = os.environ.get("SIMILARIPY_TPU_TIMING") == "1"
    if timing:
        import sys

        print(
            f"# compact plan: TM={TM} H={H} buckets="
            f"{[(b['B'], len(b['panel_rows'])) for b in dev_buckets]} "
            f"tc={tc} cg={cg} n_groups={n_groups} dtype={compute_dtype} "
            f"pallas={use_pallas} prep: {_time.perf_counter() - _t_enter:.2f}s",
            file=sys.stderr, flush=True,
        )
        _t_mark = _time.perf_counter()

        def _lap(label, sync=None):
            nonlocal _t_mark
            if sync is not None:
                np.asarray(jax.tree.leaves(sync)[0].ravel()[:1])
            now = _time.perf_counter()
            print(f"# {label}: {now - _t_mark:.2f}s", file=sys.stderr, flush=True)
            _t_mark = now

    cdt, _ = ex.compute_cast(compute_dtype)
    done_items = 0
    for g in range(n_groups):
        t0, t1 = g * G, (g + 1) * G
        offs = jnp.asarray(np.arange(G, dtype=np.int32) * tc)
        d_group = _build_d_group(
            jnp.zeros((u_pad, cg), cdt),
            t_rows[t0:t1], t_cols[t0:t1], t_vals[t0:t1], offs,
            u_pad=u_pad, cg=cg, tc=tc, compute_dtype=compute_dtype,
        )
        needs_gather = any(b["B"] != 0 for b in dev_buckets)
        d_flat = _flatten_d(d_group) if (on_tpu and needs_gather) else None
        if timing:
            _lap(f"group {g} densify", d_group)
        yvecs = {
            k2: jax.lax.dynamic_slice_in_dim(v, t0 * tc, cg, axis=0)
            for k2, v in yvecs_all.items()
        }
        pvec_ext = jnp.asarray(
            np.concatenate([pvec, [t0 * tc], np.zeros(5)]).astype(np.float32)
        )
        for bi, b in enumerate(dev_buckets):
            cv, ci = carries[bi]
            carries[bi] = _run_bucket_panels(
                b["lhs"], b["gi"], b["sx_t"], b["sx_c"], b["sx_d"],
                d_group, d_flat if b["B"] != 0 else None,
                yvecs, pvec_ext, cv, ci,
                flags=flags, k=k, k_pad=k_pad, H=H, tc=tc,
                has_allowed="allowed" in yvecs_all,
                compute_dtype=compute_dtype, precision=precision,
                use_pallas=use_pallas,
                dense_bucket=b["B"] == 0,
            )
            if timing:
                _lap(f"group {g} bucket B={b['B']} "
                     f"x{len(b['panel_rows'])} panels", carries[bi])
        # barrier between groups (see executor.execute): force a tiny
        # readback so the next group's d_group does not pile up in HBM
        np.asarray(carries[0][0].ravel()[:1])
        if progress is not None:
            step = T - done_items if g == n_groups - 1 else T // n_groups
            done_items += step
            progress.update(step)
        del d_group, d_flat

    out_vals = np.empty((T, k), np.float32)
    out_idx = np.empty((T, k), np.int32)
    for bi, b in enumerate(dev_buckets):
        vals_np = np.asarray(carries[bi][0])
        idx_np = np.asarray(carries[bi][1])
        for pi, rows in enumerate(b["panel_rows"]):
            out_vals[rows] = vals_np[pi, : rows.shape[0]]
            out_idx[rows] = idx_np[pi, : rows.shape[0]]
    if timing:
        _lap("output readback")

    out_idx = col_map[out_idx].astype(np.int32)
    return out_vals, out_idx
