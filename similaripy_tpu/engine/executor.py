"""Single-device tiled S-Plus executor.

TPU-first design (SURVEY §7): instead of translating the reference's
Gustavson CSR×CSR walk with per-thread heaps
(reference: similaripy/cython_code/s_plus.h:265-453), similarity tiles are
computed as dense MXU matmuls over on-the-fly densified sparse tiles, with
the S-Plus normalization fused as an elementwise epilogue and a streaming
per-row top-K merge carried across column tiles — the reference's TopK heap
(s_plus.h:39-64) becomes a (rows × k) value/index carry merged with
`lax.top_k`, and its column-blocked accumulator (s_plus.h:71-240,306-311)
becomes the column-tile grid.

Execution layout:
  - target rows are processed in row panels (data-parallel axis; maps to
    the reference's OpenMP row loop, s_plus.h:337-338)
  - matrix2 columns are processed in column tiles, scanned inside one jit
    (maps to the reference's cache-blocking loop, s_plus.h:358-410)
  - matrix1 panel and matrix2 tiles are densified on device by scatter;
    the similarity tile never materializes beyond (panel × tile) in HBM.

Candidate semantics: an output cell is a candidate iff its accumulated
product xy != 0 — the dense-tile proxy for the reference's structural
non-zero tracking (s_plus.h:112-117). Non-candidates and thresholded or
filtered cells are set to -inf and can never enter the top-K.
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from ..ops.csr import csc_quantized
from ..utils.env import hbm_budget_bytes
from .params import SPlusParams
from .preprocess import Preprocessed

NEG_INF = float("-inf")


# ---------------------------------------------------------------------------
# Fused epilogue + streaming top-K merge (shared with the sharded executor)
# ---------------------------------------------------------------------------


def splus_epilogue(xy, candidate, x_t, x_c, x_d, y_t, y_c, y_d, pvec, flags):
    """The S-Plus normalization epilogue on a dense (rows x cols) xy tile.

    val = xy**a1 / (l1*T + l2*C + l3*D + stab) [* bayes factor], with the
    reference's numeric quirks: Tversky term uses raw xy while the numerator
    is xy**a1; denom==0 -> 0; no denominator terms -> raw un-powered xy
    (reference: s_plus.h:129-156). Non-candidates and sub-threshold cells
    become -inf so they can never enter the top-K.
    """
    use_l1, use_l2, use_l3, use_pow, use_bayes, use_denominator = flags
    a1, l1, l2, l3, t1, t2, stab, bayes, threshold = [pvec[i] for i in range(9)]

    xy_p = jnp.power(xy, a1) if use_pow else xy
    if use_denominator:
        denom = jnp.full_like(xy, stab)
        if use_l1:
            denom = denom + l1 * (
                t1 * (x_t[:, None] - xy) + t2 * (y_t[None, :] - xy) + xy
            )
        if use_l2:
            denom = denom + l2 * (x_c[:, None] * y_c[None, :])
        if use_l3:
            denom = denom + l3 * (x_d[:, None] * y_d[None, :])
        val = jnp.where(denom != 0.0, xy_p / denom, 0.0)
        if use_bayes:
            val = val * (xy_p / (xy_p + bayes))
    else:
        val = xy  # raw product, un-powered (reference: s_plus.h:131,144)

    keep = jnp.logical_and(candidate, val >= threshold)
    return jnp.where(keep, val, NEG_INF)


def topk_merge(topk_vals, topk_idx, val, col_ids, k: int):
    """Merge a new score tile into a running (rows x k) top-K carry.

    Replaces the reference's per-thread TopK heap (s_plus.h:39-64) with an
    exact two-stage hierarchical selection: group columns, take the top-k
    groups by max, then select within the gathered candidates. Exact
    because at most k groups can contain a value >= the k-th largest, so
    the top-k groups by max always cover the true top-k. ~1.5-2x cheaper
    than one flat lax.top_k over the tile on TPU.
    """
    n_rows, tc = val.shape
    gs = 8  # group size: measured sweet spot for (rows x 8192) tiles
    if tc % gs == 0 and tc // gs >= k:
        ng = tc // gs
        vg = val.reshape(n_rows, ng, gs)
        gmax = vg.max(axis=2)
        _, gi = jax.lax.top_k(gmax, k)  # (rows, k) group ids
        cand = jnp.take_along_axis(vg, gi[:, :, None], axis=1).reshape(n_rows, k * gs)
        cand_cols = (
            gi[:, :, None] * gs + jnp.arange(gs, dtype=jnp.int32)[None, None, :]
        ).reshape(n_rows, k * gs) + col_ids[0, 0]
    else:
        cand = val
        cand_cols = jnp.broadcast_to(col_ids, (n_rows, tc))

    all_vals = jnp.concatenate([topk_vals, cand], axis=1)
    all_idx = jnp.concatenate([topk_idx, cand_cols], axis=1)
    new_vals, pos = jax.lax.top_k(all_vals, k)
    new_idx = jnp.take_along_axis(all_idx, pos, axis=1)
    return new_vals, new_idx


# ---------------------------------------------------------------------------
# Tiling plan
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class TilePlan:
    panel_rows: int  # TRP: target rows per panel
    tile_cols: int  # TC: matrix2 columns per tile
    u_pad: int  # padded inner (common) dimension
    n_panels: int
    n_tiles: int


def plan_tiles(
    n_targets: int,
    n_common: int,
    n_cols: int,
    k: int,
    itemsize: int,
    block_size_hint: Optional[int],
    budget_bytes: Optional[int] = None,
) -> TilePlan:
    """Choose panel/tile sizes under the HBM budget.

    `block_size_hint` carries the reference block_size semantics
    (reference: s_plus.pyx:217-225): None = single tile (blocking disabled),
    0/auto = planner's choice, int > 0 = explicit tile width.
    """
    budget = budget_bytes if budget_bytes is not None else hbm_budget_bytes()
    u_pad = max(_round_up(n_common, 128), 128)

    if block_size_hint is None:
        tc = _round_up(n_cols, 128)
    elif block_size_hint and block_size_hint > 0:
        tc = min(_round_up(int(block_size_hint), 8), _round_up(n_cols, 128))
    else:
        # auto: D tile (u_pad x TC) should use at most ~30% of budget
        tc = int((budget * 0.30) // (u_pad * itemsize))
        tc = max(min(_round_up(tc, 128), _round_up(n_cols, 128)), 128)
        tc = min(tc, 8192)

    # panel: M1 dense (TRP x u_pad) + scores (TRP x TC) within ~50% of budget
    per_row = u_pad * itemsize + tc * 4 * 3  # dense row + score tile + topk slack
    trp = int((budget * 0.50) // per_row)
    trp = max(min(_round_up(trp, 8), _round_up(n_targets, 8)), 8)
    trp = min(trp, 32768)

    n_panels = math.ceil(n_targets / trp)
    n_tiles = math.ceil(n_cols / tc)
    return TilePlan(panel_rows=trp, tile_cols=tc, u_pad=u_pad, n_panels=n_panels, n_tiles=n_tiles)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def plan_fused_groups(
    *,
    C: int,
    tc: int,
    u_pad: int,
    trp: int,
    k_pad: int,
    m1_nnz: int,
    m2_nnz: int,
    sel_nnz: int,
    m1_bytes: int,
    tile_item: int,
    budget: int,
    foreign: int,
    n_panels: int,
    f32x3,
    compute_dtype: str,
    search: bool,
    max_tc: int,
    tm: int,
) -> tuple[int, int, int, int]:
    """Choose (tc, n_tiles_padded, g_tiles, n_groups) for the grouped sweep.

    With `search`, the column-tile width is picked by minimizing a modeled
    sweep cost over candidate widths instead of taking the fixed `tc`:
    empty padded tiles cost full MXU products and every extra group
    re-scatters the whole matrix1 panel set, so how C divides into tiles
    matters more than the width itself. At ML-32M scoring geometry the
    search lands on tc=4224 (20 exact tiles, 4 groups, 0.06% column
    padding) instead of the fixed 2048's 44-padded-tile 4-group plan.
    Deterministic host logic — no device probes, so plans (and compiled
    program shapes) are stable for a given geometry + budget."""

    def group_plan(tc_cand: int):
        n_t = math.ceil(C / tc_cand)
        tile_b = u_pad * tc_cand * tile_item
        # reserve: panel working set + cached COO uploads (~12B/nnz +
        # padding) + one group's selector-tile slice + whole-run carry
        # planes + 1 GB slack (see the reserve NOTE at the call site)
        res = (
            m1_bytes
            + trp * tc_cand * 16
            + int((m1_nnz + m2_nnz) * 12 * 1.8)
            + int(sel_nnz * 8 * 1.8)
            + 2 * n_panels * k_pad * trp * 4
            # one tile's densify transient: the split modes scatter the
            # tile at bf16 and THEN build the [hi; lo] stack, so a tile's
            # pre-split buffer is alive next to the full arena (measured:
            # g_tiles=5 at tc=4224 ML-32M scoring ResourceExhausted
            # without this term; 4 fits)
            + u_pad * tc_cand * tile_item
            + (1 << 30)
        )
        g = max(1, int((budget * 0.85 - res - foreign) // tile_b))
        g = min(g, n_t)
        # pad the tile count so every group has exactly g tiles (stable
        # compiled shapes); the extra tiles are empty. Shrink g to the
        # minimum for the chosen group count — the budget-driven value
        # can overshoot by several resident GB.
        ng = math.ceil(n_t / g)
        g = math.ceil(n_t / ng)
        return ng * g, g, ng

    if search:
        phases = {False: 1, "rhs": 2, "lhs": 2, True: 3, "both": 3}[f32x3]
        rate = 30e12 if (compute_dtype == "float32" and not f32x3) else 170e12
        ovh_rowblock = 2.5e-4  # ~0.25 ms/row-block (v5e, micro_tile_kernel)

        def cost(tc_cand: int):
            n_tp, g, ng = group_plan(tc_cand)
            mxu = n_panels * n_tp * (2.0 * trp * u_pad * tc_cand * phases / rate)
            ovh = n_panels * n_tp * (trp / tm) * ovh_rowblock
            scat = ng * (m1_nnz + m2_nnz) / 40e6
            return mxu + ovh + scat

        c_pad = _round_up(C, 128)
        lo = min(2048, c_pad)
        cands = range(lo, min(max_tc, c_pad) + 1, 128)
        if cands:
            tc = min(reversed(cands), key=cost)  # ties -> wider tile
    n_tiles, g_tiles, n_groups = group_plan(tc)
    return tc, n_tiles, g_tiles, n_groups


def _pad_bucket(n: int, minimum: int = 1024) -> int:
    """Round sizes to coarse buckets to bound jit recompilations.

    Eighth-octave buckets (next multiple of 2^(log2(n)-3)): at most 8
    distinct shapes per power of two and <= 12.5% padding — the padding
    is real scatter work, and the old power-of-two buckets averaged ~50%
    waste on the 6 s/call m1 panel scatter.
    """
    n = max(n, minimum)
    step = 1 << max(n.bit_length() - 4, 0)
    return ((n + step - 1) // step) * step


# ---------------------------------------------------------------------------
# Device panel computation
# ---------------------------------------------------------------------------


def compute_cast(compute_dtype: str):
    """(storage dtype, matmul accumulator dtype) for a compute mode.

    'int8' is the exact-quantization path: inputs that are (scaled) small
    integers accumulate exactly in int32 on the MXU — both faster than
    bfloat16 and bit-exact, unlike any float path. The f32 correction by
    `inv_scale` (pvec[9]) recovers the original magnitude.
    """
    if compute_dtype == "bfloat16":
        return jnp.bfloat16, jnp.float32
    if compute_dtype in ("int8", "int4"):
        return jnp.int8, jnp.int32
    if compute_dtype == "int4":
        # 2x the int8 MXU rate; |v| <= 7 (binary/small-count data).
        # TPU-only: the CPU/GPU XLA backends reject sub-byte matmuls.
        return jnp.int4, jnp.int32
    return jnp.float32, jnp.float32


def densify(shape, rows, cols, vals, cdt):
    """Scatter a padded COO into a dense (shape) tile of dtype cdt.

    int8 tiles scatter through a bfloat16 buffer and cast: XLA's TPU
    scatter is pathologically slow at byte granularity (~1000x), while
    bfloat16 represents the |v| <= 127 integers of the int8 path exactly.
    Out-of-range (sentinel-padded) indices are dropped.
    """
    sdt = jnp.bfloat16 if cdt in (jnp.int8, jnp.int4) else cdt
    d = (
        jnp.zeros(shape, sdt)
        .at[rows, cols]
        .set(vals.astype(sdt), mode="drop", unique_indices=True)
    )
    return d.astype(cdt) if sdt != cdt else d


def scatter_mask(shape, rows, cols):
    """Scatter a boolean membership mask through a bfloat16 buffer.

    Byte-granularity TPU scatter (bool/uint8) is ~1000x slower than bf16
    scatter — same reason densify() routes int8 through bf16. Returns bool.
    """
    buf = (
        jnp.zeros(shape, jnp.bfloat16)
        .at[rows, cols]
        .set(jnp.bfloat16(1), mode="drop")
    )
    return buf != 0


_BF16_EXACT_CACHE: dict = {}


def _bf16_exact(fp, data) -> bool:
    """True when every value of `data` is exactly bf16-representable.

    Integer-valued operands qualify (ratings, binary interactions, counts
    below 257): their lo-half in the split_bf16x3 decomposition is all
    zeros, so the fused f32-HIGH path can skip that operand's lo phase —
    one fewer matmul phase on a scoring call where m1=URM is integer and
    only m2=W.T is float (see pallas_kernels._split_maps). Exactness is
    judged against the f32-cast values the engine actually feeds the MXU.
    Memoized by content fingerprint; the check itself is O(nnz) on host.
    """
    hit = _BF16_EXACT_CACHE.get(fp)
    if hit is None:
        import ml_dtypes

        d32 = np.asarray(data, dtype=np.float32)
        hit = bool(
            np.array_equal(d32.astype(ml_dtypes.bfloat16).astype(np.float32), d32)
        )
        if len(_BF16_EXACT_CACHE) > 64:
            _BF16_EXACT_CACHE.pop(next(iter(_BF16_EXACT_CACHE)))
        _BF16_EXACT_CACHE[fp] = hit
    return hit


def _select_f32x3_mode(pre, m1, m2, compute_dtype, precision, use_pallas):
    """(compute_dtype, f32x3) for a general (two-matrix) fused call.

    f32-HIGH runs the fused kernel in split-bf16x3 mode: the phased K
    sweep reproduces XLA HIGH's bf16x3 (~f32 accuracy) at the bf16 MXU
    rate / phases — ~2x Mosaic's forced-HIGHEST — while keeping the
    fusion. When one operand is exactly bf16-representable (integer URM
    ratings on a scoring call's m1, binary interactions, ...), its lo
    half is identically zero: skip that phase ('rhs'/'lhs', 2 phases
    instead of 3 — 1/3 less MXU time and rhs DMA). Both exact: a single
    plain-bf16 phase already IS f32-HIGH (bf16 products are exact in the
    f32 accumulator), so ride the existing bfloat16 mode outright.

    Shared by the single-device and sharded grouped executors so the
    exactness-critical selection can never diverge between them."""
    if not (use_pallas and compute_dtype == "float32" and precision == "high"):
        return compute_dtype, False
    m1_exact = _bf16_exact(pre.fp1, m1.data)
    m2_exact = _bf16_exact(pre.fp2, m2.data)
    if m1_exact and m2_exact:
        return "bfloat16", False
    return compute_dtype, "rhs" if m1_exact else ("lhs" if m2_exact else "both")


def _apply_fold(m2_csc, fold_M: float, C: int):
    """m2 - M*I for the exclude-seen fold (see _exclude_seen_fold)."""
    eye = sp.csc_array(sp.identity(C, dtype=np.float32, format="csc"))
    return (m2_csc - fold_M * eye).tocsc()


def _d_split(f32x3):
    """Tile-side (rhs) f32-HIGH representation for _densify_group: split
    stack for 'both'/'rhs', plain bf16 cast for 'lhs' (that side's values
    are bf16-exact), nothing otherwise."""
    return (
        "split" if f32x3 in ("both", "rhs")
        else "cast" if f32x3 == "lhs" else False
    )


_FOLD_STAT_CACHE: dict = {}


def _exclude_seen_fold(pre, m1, m2, params, compute_dtype, C):
    """Penalty magnitude for the exclude-seen filter fold, or None.

    ``dot_product(urm, W.T, filter_cols=urm)`` — the recommend() idiom
    (reference: README.md:86-94, notebook cell 37) — can drop its per-row
    filter masks entirely by scoring with ``m2' = m2 - M*I``: each seen
    cell picks up an extra ``-M*r(u,j)`` from the contraction (r > 0),
    pushing it below any threshold >= 0, while unseen cells add
    ``0 * (-M) == 0`` — exact even in float. This removes the selector
    stacking, the per-group mask uploads (~0.5 GB/group at ML-32M scale)
    and the fmask scatters (~m1.nnz per tile group at XLA's ~25 Mnnz/s)
    from the scoring stage; the mask becomes MXU algebra.

    Exactness gate (every condition necessary):
      - the filter's sparsity PATTERN is identical to m1's (the idiom) and
        m2 is square, so the diagonal aligns contraction item i with
        output item j;
      - a denominator-free, power-free, bayes-free epilogue (val = raw
        xy — exactly dot_product's configuration): with any of those
        terms a huge negative xy is not guaranteed to stay below the
        threshold (tversky with t1+t2 < 1 flips the denominator's sign;
        denom == 0 maps to val = 0 which a COO-format output would keep;
        fractional powers NaN on negatives), so the fold only arms when
        val IS xy;
      - threshold >= 0 prunes the penalized cells: |xy_folded| >=
        3/4 * M * r > 0 by the bound below, so a penalized cell can
        neither stay positive nor land on exactly 0;
      - m1.data > 0 so the penalty has the right sign;
      - float compute path (the fold would break int8 quantization).

    SIMILARIPY_TPU_FOLD_FILTER=0 disables (the masked path is always
    available and exact). Scope: the single-device grouped executor AND
    the sharded grouped path (engine/sharded.py) — both fold; the
    env-gated legacy sharded path keeps masked selectors.
    """
    fm = pre.filter_matrix
    if (
        fm is None
        or compute_dtype not in ("float32", "bfloat16")
        or params.use_denominator
        or params.use_bayes
        or params.use_pow
        or params.threshold < 0.0
        or m1.nnz == 0
        or m2.shape[0] != m2.shape[1]
        or C != m2.shape[1]
        or fm.shape != m1.shape
        or fm.nnz != m1.nnz
        or os.environ.get("SIMILARIPY_TPU_FOLD_FILTER", "1") == "0"
    ):
        return None
    # pattern identity: memcmp-speed, run every call (a content memo would
    # need its own fingerprint pass and save nothing)
    if not (
        np.array_equal(fm.indptr, m1.indptr)
        and np.array_equal(fm.indices, m1.indices)
    ):
        return None
    key = (pre.fp1, pre.fp2, "fold_M")
    M = _FOLD_STAT_CACHE.get(key)
    if M is None:
        rmin = float(m1.data.min()) if m1.nnz else 0.0
        if rmin <= 0.0:
            M = 0.0
        else:
            max_rowsum = float(np.abs(m1).sum(axis=1).max())
            max_w = float(np.abs(m2.data).max()) if m2.nnz else 0.0
            # 4x the largest possible |score| over the smallest rating,
            # rounded up to a power of two (exactly bf16-representable, so
            # the split/bf16 paths carry the penalty without rounding)
            bound = 4.0 * max_rowsum * max(max_w, 1.0) / rmin
            if not (bound < 2.0 ** 100):  # catches inf/nan too
                # pathological dynamic range (e.g. a ~1e-35 rating
                # artifact): a safe penalty would overflow f32 on the
                # diagonal or in the products (0 * inf = NaN would poison
                # every unseen cell) — use the masked path instead
                M = 0.0
            else:
                M = 2.0 ** math.ceil(math.log2(max(bound, 2.0 ** 20)))
                max_r = float(m1.data.max())
                if not np.isfinite(np.float32(M * max_r * 4.0)):
                    M = 0.0
        if len(_FOLD_STAT_CACHE) > 64:
            _FOLD_STAT_CACHE.pop(next(iter(_FOLD_STAT_CACHE)))
        _FOLD_STAT_CACHE[key] = M
    return M if M > 0.0 else None


def panel_forward(
    m1_rows,
    m1_cols,
    m1_vals,
    x_t,
    x_c,
    x_d,
    tiles,  # dict of stacked per-tile arrays (leading dim n_tiles)
    pvec,  # (10,) f32: a1 l1 l2 l3 t1 t2 stab bayes threshold inv_scale
    *,
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
    """One row panel x all column tiles: densify, matmul, epilogue, top-K."""
    cdt, acc = compute_cast(compute_dtype)
    prec = {
        "default": jax.lax.Precision.DEFAULT,
        "high": jax.lax.Precision.HIGH,
        "highest": jax.lax.Precision.HIGHEST,
    }[precision]
    inv_scale = pvec[9]

    # Densify the matrix1 panel: (TRP x U). Padding entries carry row == TRP
    # (out of bounds -> dropped).
    m1_dense = densify((trp, u_pad), m1_rows, m1_cols, m1_vals, cdt)

    def tile_step(carry, xs):
        topk_vals, topk_idx = carry
        d = densify((u_pad, tc), xs["m2_rows"], xs["m2_cols"], xs["m2_vals"], cdt)
        xy = jnp.dot(m1_dense, d, preferred_element_type=acc, precision=prec)
        if compute_dtype in ("int8", "int4"):
            xy = xy.astype(jnp.float32) * inv_scale

        candidate = xy != 0.0
        if has_allowed:
            candidate = jnp.logical_and(candidate, xs["allowed"][None, :])
        if has_filter:
            fmask = scatter_mask((trp, tc), xs["fil_rows"], xs["fil_cols"])
            candidate = jnp.logical_and(candidate, jnp.logical_not(fmask))
        if has_target:
            tmask = scatter_mask((trp, tc), xs["tgt_rows"], xs["tgt_cols"])
            candidate = jnp.logical_and(candidate, tmask)

        val = splus_epilogue(
            xy, candidate, x_t, x_c, x_d, xs["y_t"], xs["y_c"], xs["y_d"], pvec, flags
        )

        # ---- streaming top-K merge (replaces the TopK heap) ----
        col_ids = xs["col_offset"] + jax.lax.broadcasted_iota(jnp.int32, (1, tc), 1)
        new_vals, new_idx = topk_merge(topk_vals, topk_idx, val, col_ids, k)
        return (new_vals, new_idx), None

    init = (
        jnp.full((trp, k), NEG_INF, jnp.float32),
        jnp.zeros((trp, k), jnp.int32),
    )
    (vals, idx), _ = jax.lax.scan(tile_step, init, tiles)
    return vals, idx


# ---------------------------------------------------------------------------
# Grouped execution: tiles densified once, panels stream over resident tiles
# ---------------------------------------------------------------------------
#
# The scan-over-tiles layout (panel outer, tile inner) re-scatters every
# matrix2 tile for every panel — O(nnz * n_panels) scatter work that
# dominated the ML-32M profile. The grouped layout densifies a group of
# tiles ONCE into HBM (as much as fits), then every panel streams over the
# resident group; total scatter work drops to O(nnz * n_groups) for
# matrix1 and O(nnz) for matrix2.


@partial(
    jax.jit,
    static_argnames=("u_pad", "tc", "compute_dtype", "split"),
    donate_argnums=(0,),
)
def _densify_group_into(arena, rows, cols, vals, *, u_pad: int, tc: int,
                        compute_dtype: str, split: bool = False):
    """_densify_group writing over the retired group's donated stack.

    Donation lets XLA alias the multi-GB buffer, so the host can enqueue
    the next group's densify WITHOUT a device barrier: the single TPU
    stream orders the overwrite after every already-enqueued panel that
    reads the old stack, and peak HBM stays at one group's working set
    (the same trick as the symmetric executor's anchor arenas)."""
    del arena  # buffer reused for the output via donation
    return _densify_group(
        rows, cols, vals, u_pad=u_pad, tc=tc,
        compute_dtype=compute_dtype, split=split,
    )


@partial(jax.jit, static_argnames=("u_pad", "tc", "compute_dtype", "split"))
def _densify_group(rows, cols, vals, *, u_pad: int, tc: int,
                   compute_dtype: str, split=False):
    """(G, p2) COO arrays -> (G, u_pad, tc) dense tiles (sequential map to
    bound the bf16-scatter transient to one tile). `split` selects the
    fused f32-HIGH representation of this (tile) side: True/'split' leaves
    each tile as a split_bf16x3 (2*u_pad, tc) stack for the phased K sweep
    (same bytes as f32); 'cast' leaves a plain bf16 tile (this side's
    values are exactly bf16-representable, so its lo half would be zero —
    the kernel's 'lhs' mode skips it entirely)."""
    cdt, _ = compute_cast(compute_dtype)

    def one(args):
        r, c, v = args
        t = densify((u_pad, tc), r, c, v,
                    jnp.bfloat16 if split == "cast" else cdt)
        if split in (True, "split"):
            from .pallas_kernels import split_bf16x3

            t = split_bf16x3(t, axis=0)
        return t

    return jax.lax.map(one, (rows, cols, vals))


@partial(
    jax.jit,
    static_argnames=(
        "flags", "k", "k_pad", "trp", "u_pad", "tc",
        "has_allowed", "has_filter", "has_target",
        "compute_dtype", "precision", "use_pallas", "f32x3",
        "kern_tm", "kern_kb",
    ),
    donate_argnums=(9, 10),
)
def _run_group_panels(
    m1_rows,  # (P, p1) int32 — stacked panel COOs
    m1_cols,
    m1_vals,
    x_t,  # (P, trp) f32
    x_c,
    x_d,
    d_stack,  # (G, u_pad, tc) dense tiles (shared across panels)
    tiles,  # dict: per-tile arrays lead with G; selector arrays with (P, G)
    pvec,  # (10,)
    carry_vals,  # (P, trp, k) donated
    carry_idx,  # (P, trp, k) donated
    *,
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
    kern_tm: Optional[int] = None,
    kern_kb: Optional[int] = None,
):
    """All panels x all group tiles in one dispatch: scan over panels,
    inner scan over the group's resident tiles."""
    cdt, acc = compute_cast(compute_dtype)
    prec = {
        "default": jax.lax.Precision.DEFAULT,
        "high": jax.lax.Precision.HIGH,
        "highest": jax.lax.Precision.HIGHEST,
    }[precision]

    group_tiles = {
        k2: v for k2, v in tiles.items() if not k2.startswith(("fil_", "tgt_"))
    }
    group_tiles["d"] = d_stack
    sel_xs = {k2: v for k2, v in tiles.items() if k2.startswith(("fil_", "tgt_"))}

    def panel_step(_, pxs):
        m1_dense = densify(
            (trp, u_pad), pxs["pr"], pxs["pc"], pxs["pv"],
            # 'rhs' mode: this (panel) side is exactly bf16-representable —
            # a plain bf16 stack, no lo half (half the panel bytes, and the
            # kernel sweeps only the rhs hi/lo phases)
            jnp.bfloat16 if f32x3 == "rhs" else cdt,
        )
        if f32x3 in (True, "both", "lhs"):
            from .pallas_kernels import split_bf16x3

            m1_dense = split_bf16x3(m1_dense, axis=1)
        x_t, x_c, x_d = pxs["xt"], pxs["xc"], pxs["xd"]
        tiles_p = dict(group_tiles)
        for k2, v in sel_xs.items():
            tiles_p[k2] = pxs[k2]

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
                new_vals, new_idx = fused_tile_topk(
                    m1_dense,
                    d,
                    x_t, x_c, x_d,
                    xs["y_t"], xs["y_c"], xs["y_d"],
                    pvec_ext,
                    allowed=(
                        xs["allowed"].astype(jnp.uint8) if has_allowed else None
                    ),
                    fmask=fmask.astype(jnp.uint8) if fmask is not None else None,
                    tmask=tmask.astype(jnp.uint8) if tmask is not None else None,
                    carry=(topk_vals, topk_idx),
                    flags=flags,
                    k_pad=k_pad,
                    int8_mode=compute_dtype in ("int8", "int4"),
                    precision=prec,
                    split_f32=f32x3,
                    tm=kern_tm,
                    kb=kern_kb,
                    interpret=jax.default_backend() != "tpu",
                )
                return (new_vals, new_idx), None

            xy = jnp.dot(m1_dense, d, preferred_element_type=acc, precision=prec)
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
            new_vals, new_idx = topk_merge(topk_vals, topk_idx, val, col_ids, k)
            return (new_vals, new_idx), None

        (vals_p, idx_p), _ = jax.lax.scan(
            tile_step, (pxs["cv"], pxs["ci"]), tiles_p
        )
        return None, (vals_p, idx_p)

    panel_xs = {
        "pr": m1_rows, "pc": m1_cols, "pv": m1_vals,
        "xt": x_t, "xc": x_c, "xd": x_d,
        "cv": carry_vals, "ci": carry_idx,
    }
    panel_xs.update(sel_xs)
    _, (vals, idx) = jax.lax.scan(panel_step, None, panel_xs)
    return vals, idx


# ---------------------------------------------------------------------------
# Device-resident input cache
# ---------------------------------------------------------------------------
#
# Production candidate retrieval calls the engine repeatedly against the
# same matrices (every scoring batch reuses the item matrix). The reference
# re-walks its CSR arrays from scratch each call; on TPU the equivalent
# waste is re-staging + re-uploading tile COOs over PCIe/tunnel every call.
# Content-fingerprinted caching keeps the device copies alive across calls.

_DEVICE_CACHE: dict = {}
# m1 panels + m2 tiles + selector stacks of a scoring call already take 3
# slots next to a model build's COO entry; 8 keeps a two-model pipeline
# from thrashing. Device-byte pressure is handled by the planners via
# foreign_cache_bytes, not by this count.
_DEVICE_CACHE_CAP = 8


# host-resident entries (the "sel" selector stacks are np arrays, not
# jax.Arrays) are bounded by bytes, not count: a single ML-32M filter
# stack is hundreds of MB and foreign_cache_bytes rightly ignores host
# memory, so nothing else prunes them
_HOST_CACHE_MAX_BYTES = int(
    float(os.environ.get("SIMILARIPY_TPU_HOST_CACHE_MB", "2048")) * (1 << 20)
)

_MISS = object()


def _cache_get(key):
    value = _DEVICE_CACHE.pop(key, _MISS)
    if value is _MISS:
        return None
    _DEVICE_CACHE[key] = value  # reinsert at the end: eviction becomes LRU
    return value


def _host_bytes(value) -> int:
    total = 0
    stack = [value]
    while stack:
        v = stack.pop()
        if isinstance(v, dict):
            stack.extend(v.values())
        elif isinstance(v, (list, tuple)):
            stack.extend(v)
        elif isinstance(v, np.ndarray):
            total += v.nbytes
    return total


def _cache_put(key, value):
    if len(_DEVICE_CACHE) >= _DEVICE_CACHE_CAP:
        _DEVICE_CACHE.pop(next(iter(_DEVICE_CACHE)))
    _DEVICE_CACHE[key] = value
    # enforce the host-byte budget over np-holding entries (oldest first,
    # never the one just inserted)
    host_keys = [
        k for k, v in _DEVICE_CACHE.items() if _host_bytes(v) > 0
    ]
    while len(host_keys) > 1 and sum(
        _host_bytes(_DEVICE_CACHE[k]) for k in host_keys
    ) > _HOST_CACHE_MAX_BYTES:
        _DEVICE_CACHE.pop(host_keys.pop(0), None)


def _evict_stale(tag: str, fp, keep_key) -> None:
    """Drop `tag` entries for the same matrix fingerprint under a different
    key (stale geometry/dtype variants). foreign_cache_bytes excludes every
    same-fingerprint key from the planner's reserve, so a stale variant
    would otherwise hold unbudgeted multi-GB HBM right when the fresh stack
    uploads; evicting here frees the bytes exactly when they are needed."""
    stale = [
        k for k in _DEVICE_CACHE
        if isinstance(k, tuple) and k and k[0] == tag
        and fp in k and k != keep_key
    ]
    for k in stale:
        _DEVICE_CACHE.pop(k, None)


def clear_device_cache():
    _DEVICE_CACHE.clear()


def foreign_cache_bytes(keep_fps: tuple) -> int:
    """Device-resident bytes held by cache entries for OTHER matrices.

    A pipeline that builds an item-item model and then scores with it
    (the reference's notebook flow) leaves the model build's multi-hundred-
    MB device uploads cached when the scoring call plans its tile groups;
    planning as if that HBM were free OOMed a full-ML-32M scoring call.
    Entries whose key mentions any of `keep_fps` (this call's input
    fingerprints) are the ones the call itself will reuse, so they are
    excluded; everything else is counted so the planner leaves room.

    A same-fingerprint entry staged under a DIFFERENT geometry (other
    tc/n_tiles/u_pad/compute_dtype) is also excluded here even though the
    call won't reuse it — that is safe because every cache-miss branch
    calls _evict_stale before uploading its fresh stacks, so the stale
    variant's bytes are released before the planned allocation lands."""
    import jax

    total = 0
    for key, value in _DEVICE_CACHE.items():
        if any(fp in key for fp in keep_fps if fp is not None):
            continue
        for leaf in jax.tree.leaves(value):
            if isinstance(leaf, jax.Array):
                total += leaf.nbytes
    return total


def clear_caches():
    """Drop every engine cache: device-resident tile/panel uploads and the
    host preprocess cache. Safe to call any time; the next call re-stages.

    Both caches key on full-content fingerprints of the input matrices, so
    this is never needed for correctness — only to release HBM/host memory.
    """
    from .preprocess import clear_prep_cache

    _DEVICE_CACHE.clear()
    # the fingerprint-keyed memos (bf16-exactness, fold statistics) are
    # bounded at 64 entries each so they never matter for memory, but the
    # "drops every engine cache" contract includes them for consistency
    _BF16_EXACT_CACHE.clear()
    _FOLD_STAT_CACHE.clear()
    clear_prep_cache()


def cache_info() -> dict:
    """Resident footprint of the engine caches, for production memory
    monitoring (pairs with :func:`clear_caches`; planners already budget
    around these residents via ``foreign_cache_bytes``).

    Returns ``{"entries", "device_bytes", "host_bytes",
    "by_kind": {kind: {"entries", "device_bytes", "host_bytes"}},
    "prep_entries"}`` where ``kind`` is the cache-key tag ("m2" tile
    stacks / "m1" panel uploads / "sel" host-resident selector stacks of
    the grouped executor, "sym_coo" symmetric-executor stackings,
    "compact_*" union-compaction residents, "sh_*" sharded variants) and
    ``prep_entries`` counts the host preprocess cache. Device bytes are
    summed over every addressable shard of each cached jax.Array, so
    mesh-replicated uploads count once per replica — the number reflects
    real HBM residency on this process's devices, not logical array
    size."""
    import jax

    from .preprocess import prep_cache_len

    def _dev_bytes(leaf) -> int:
        try:
            return sum(s.data.nbytes for s in leaf.addressable_shards)
        except Exception:
            return leaf.nbytes

    device_bytes = 0
    host_bytes = 0
    by_kind: dict = {}
    for key, value in _DEVICE_CACHE.items():
        kind = key[0] if isinstance(key, tuple) and key else "?"
        d = sum(
            _dev_bytes(leaf)
            for leaf in jax.tree.leaves(value)
            if isinstance(leaf, jax.Array)
        )
        h = _host_bytes(value)
        device_bytes += d
        host_bytes += h
        e = by_kind.setdefault(
            kind, {"entries": 0, "device_bytes": 0, "host_bytes": 0}
        )
        e["entries"] += 1
        e["device_bytes"] += d
        e["host_bytes"] += h
    return {
        "entries": len(_DEVICE_CACHE),
        "device_bytes": device_bytes,
        "host_bytes": host_bytes,
        "by_kind": by_kind,
        "prep_entries": prep_cache_len(),
    }


def _pallas_enabled() -> bool:
    """Fused Pallas kernel on TPU by default; SIMILARIPY_TPU_USE_PALLAS=1
    forces it elsewhere (interpret mode — for tests), =0 disables."""
    env = os.environ.get("SIMILARIPY_TPU_USE_PALLAS")
    if env is not None:
        return env not in ("0", "false", "")
    from ..utils.env import on_tpu

    return on_tpu()


@jax.jit
def _pack_carries(vals, idx):
    """Interleave f32 vals (bitcast) and i32 idx into one (..., 2) int32
    buffer so the host fetch is a single transfer."""
    return jnp.stack(
        [jax.lax.bitcast_convert_type(vals, jnp.int32), idx], axis=-1
    )


@partial(jax.jit, static_argnames=("k_out",))
def _pack_carry_planes(vals, idx, *, k_out: int):
    """(P, k_pad, trp) fused-path carry planes -> packed (P, trp, k_out, 2)
    int32 (planes are sorted desc along k_pad, so the slice is the top-k)."""
    v = jnp.swapaxes(vals, 1, 2)[:, :, :k_out]
    i = jnp.swapaxes(idx, 1, 2)[:, :, :k_out]
    return jnp.stack(
        [jax.lax.bitcast_convert_type(v, jnp.int32), i], axis=-1
    )


def _fingerprint(*arrays) -> str:
    """Full-content fingerprint of the given arrays.

    Hashes every byte so in-place mutation of a SciPy matrix's .data
    between calls is always detected; the caches can never serve results
    for a stale matrix. sha1 (hardware-accelerated, ~1.5 GB/s here —
    2.1x blake2b) over the raw buffers, no intermediate copy: the hash is
    a cache key, and 160 bits keeps accidental collisions impossible in
    practice.
    """
    import hashlib

    h = hashlib.sha1()
    for a in arrays:
        if a is None:
            h.update(b"\x00none")
            continue
        a = np.asarray(a)
        h.update(str(a.shape).encode())
        h.update(str(a.dtype).encode())
        if a.size:
            h.update(np.ascontiguousarray(a))
    return h.hexdigest()


# ---------------------------------------------------------------------------
# Host orchestration
# ---------------------------------------------------------------------------


def _expand_ranges(starts: np.ndarray, counts: np.ndarray) -> np.ndarray:
    """Concatenate [s, s+c) ranges into one index vector, vectorized."""
    total = int(counts.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64)
    ends = np.cumsum(counts)
    out = np.repeat(starts - np.concatenate([[0], ends[:-1]]), counts)
    return out + np.arange(total, dtype=np.int64)


def _extract_cols_coo(csc, cols_old: np.ndarray):
    """(row_idx, local_col_idx, data_positions) of csc[:, cols_old].

    The positions index csc.data/csc.indices directly, so callers slice
    whatever value array they need. Vectorized O(nnz of selection).
    """
    starts = csc.indptr[cols_old].astype(np.int64)
    counts = (csc.indptr[cols_old + 1] - csc.indptr[cols_old]).astype(np.int64)
    pos = _expand_ranges(starts, counts)
    rows = csc.indices[pos]
    local = np.repeat(np.arange(cols_old.shape[0], dtype=np.int32), counts)
    return rows, local, pos


def balance_columns(col_nnz: np.ndarray, n_tiles: int, tc: int):
    """Round-robin columns over tiles by popularity rank.

    The reference reorders columns so popular ones share a block and stay
    cache-hot (reference: s_plus_utils.pyx:493-618). On TPU the pressure
    is inverted: every tile's COO is padded to the largest tile's nnz
    before the device scatter, so skew = wasted scatter work. Dealing
    columns round-robin by descending nnz makes tile sizes near-equal.

    Returns (tile_lists, col_map) where tile_lists[t] are original column
    ids of tile t and col_map maps device flat id (t*tc + slot) back to
    the original column (sentinel len(col_nnz) for unused slots).
    """
    C = col_nnz.shape[0]
    rank = np.argsort(-col_nnz, kind="stable")
    tile_lists = [rank[t::n_tiles] for t in range(n_tiles)]
    col_map = np.full(n_tiles * tc, C, dtype=np.int64)
    for t, cols in enumerate(tile_lists):
        col_map[t * tc : t * tc + cols.shape[0]] = cols
    return tile_lists, col_map


def _csc_tile_coo(csc, c0: int, c1: int, pad_to: int, row_sentinel: int):
    """COO (rows, local cols, vals) of csc[:, c0:c1], padded for scatter-drop."""
    s, e = int(csc.indptr[c0]), int(csc.indptr[c1])
    nnz = e - s
    rows = np.full(pad_to, row_sentinel, dtype=np.int32)
    cols = np.zeros(pad_to, dtype=np.int32)
    vals = np.zeros(pad_to, dtype=np.float32)
    rows[:nnz] = csc.indices[s:e]
    counts = np.diff(csc.indptr[c0 : c1 + 1])
    cols[:nnz] = np.repeat(np.arange(c1 - c0, dtype=np.int32), counts)
    vals[:nnz] = csc.data[s:e]
    return rows, cols, vals


def _stack_m2_tiles_balanced(m2_csc, tile_lists, tc: int, u_pad: int):
    """Per-tile padded COO of the balanced column layout."""
    n_tiles = len(tile_lists)
    parts = [_extract_cols_coo(m2_csc, cols) for cols in tile_lists]
    p2 = _pad_bucket(max((p[0].shape[0] for p in parts), default=1))
    rows = np.full((n_tiles, p2), u_pad, dtype=np.int32)
    cols = np.zeros((n_tiles, p2), dtype=np.int32)
    vals = np.zeros((n_tiles, p2), dtype=np.float32)
    for t, (r, local, pos) in enumerate(parts):
        n = r.shape[0]
        rows[t, :n] = r
        cols[t, :n] = local
        vals[t, :n] = m2_csc.data[pos]
    return rows, cols, vals


def _stack_selector_tiles_balanced(
    sel_csc, tile_lists, tc: int, trp: int, pf: Optional[int] = None
):
    """Per-tile padded COO (bool mask positions) of a selector's panel rows
    under the balanced column layout. `pf` pins the pad bucket so multiple
    panels share one compiled shape."""
    n_tiles = len(tile_lists)
    parts = [_extract_cols_coo(sel_csc, cols) for cols in tile_lists]
    if pf is None:
        pf = _pad_bucket(max((p[0].shape[0] for p in parts), default=1), minimum=256)
    rows = np.full((n_tiles, pf), trp, dtype=np.int32)
    cols = np.zeros((n_tiles, pf), dtype=np.int32)
    for t, (r, local, _pos) in enumerate(parts):
        n = r.shape[0]
        rows[t, :n] = r
        cols[t, :n] = local
    return rows, cols


def _selector_pf(sel_t, panel_sels, col_map, tc: int, C: int,
                 n_tiles: int) -> int:
    """Shared selector pad bucket: max per-(panel, tile) nnz.

    This is the actual padded row length of the stacked selector tiles —
    the panel TOTAL previously used here over-padded the staged arrays
    (and their h2d uploads) by up to a factor of n_tiles."""
    col_tile = np.zeros(C, np.int32)
    used = col_map < C
    col_tile[col_map[used]] = (np.flatnonzero(used) // tc).astype(np.int32)
    mx = 1
    for sel in panel_sels:
        idx = sel_t[sel].indices
        if idx.shape[0]:
            mx = max(
                mx, int(np.bincount(col_tile[idx], minlength=n_tiles).max())
            )
    return _pad_bucket(mx, minimum=256)


def _vec_by_map(v: Optional[np.ndarray], col_map: np.ndarray, n_cols: int,
                fill: float = 1.0) -> np.ndarray:
    """Reindex a per-column vector into the balanced device layout."""
    out = np.full(col_map.shape[0], fill, dtype=np.float32)
    if v is not None:
        used = col_map < n_cols
        out[used] = np.asarray(v, dtype=np.float32)[col_map[used]]
    return out


def _stack_m2_tiles(m2_csc, n_cols: int, tc: int, n_tiles: int, u_pad: int):
    per_tile_nnz = [
        int(m2_csc.indptr[min((j + 1) * tc, n_cols)] - m2_csc.indptr[j * tc])
        for j in range(n_tiles)
    ]
    p2 = _pad_bucket(max(per_tile_nnz) if per_tile_nnz else 1)
    rows = np.empty((n_tiles, p2), np.int32)
    cols = np.empty((n_tiles, p2), np.int32)
    vals = np.empty((n_tiles, p2), np.float32)
    for j in range(n_tiles):
        c0, c1 = j * tc, min((j + 1) * tc, n_cols)
        rows[j], cols[j], vals[j] = _csc_tile_coo(m2_csc, c0, c1, p2, u_pad)
    return rows, cols, vals


def _stack_selector_tiles(sel_panel_csc, n_cols: int, tc: int, n_tiles: int, trp: int):
    """Per-tile COO of a selector matrix's panel rows (bool masks)."""
    per_tile_nnz = [
        int(sel_panel_csc.indptr[min((j + 1) * tc, n_cols)] - sel_panel_csc.indptr[j * tc])
        for j in range(n_tiles)
    ]
    pf = _pad_bucket(max(per_tile_nnz) if per_tile_nnz else 1, minimum=256)
    rows = np.empty((n_tiles, pf), np.int32)
    cols = np.empty((n_tiles, pf), np.int32)
    for j in range(n_tiles):
        c0, c1 = j * tc, min((j + 1) * tc, n_cols)
        r, c, _ = _csc_tile_coo(sel_panel_csc, c0, c1, pf, trp)
        rows[j], cols[j] = r, c
    return rows, cols


def _pad_vec(v: Optional[np.ndarray], n: int, fill: float = 1.0) -> np.ndarray:
    out = np.full(n, fill, dtype=np.float32)
    if v is not None:
        out[: v.shape[0]] = v
    return out


def resolve_compute_dtype(requested: str, pre: Preprocessed) -> tuple[str, float]:
    """Resolve 'auto' to the exact int8 path when the data allows it.

    Returns (compute_dtype, inv_scale). The int8 path is chosen when both
    matrices hold small integers after a power-of-two scaling (ratings,
    binary/count data) and the worst-case dot product fits int32 — then
    every xy is accumulated exactly on the MXU, which is simultaneously
    faster than bfloat16 and more accurate than float32 HIGHEST.
    """
    s1, s2 = pre.qscale1, pre.qscale2
    if requested == "int8":
        if s1 is None or s2 is None:
            raise ValueError(
                "compute_dtype='int8' requires data integerizable to |v|<=127 "
                "after a power-of-two scaling; use 'auto' to fall back safely"
            )
        return "int8", 1.0 / (s1 * s2)
    if requested == "int4":
        if s1 is None or s2 is None:
            raise ValueError(
                "compute_dtype='int4' requires integerizable data with "
                "|v| <= 7 after scaling (binary/small-count matrices)"
            )
        return "int4", 1.0 / (s1 * s2)
    if requested != "auto":
        return requested, 1.0
    if s1 is None or s2 is None:
        return "float32", 1.0
    m1, m2 = pre.m1, pre.m2
    maxv1 = float(np.abs(m1.data).max()) * s1 if m1.nnz else 0.0
    maxv2 = float(np.abs(m2.data).max()) * s2 if m2.nnz else 0.0
    max_row_nnz1 = int(np.diff(m1.indptr).max()) if m1.nnz else 0
    if m2.nnz == 0:
        max_col_nnz2 = 0
    elif sp.issparse(m2) and m2.format == "csc":
        # lazy-transpose m2: per-column counts are the indptr diffs
        max_col_nnz2 = int(np.diff(m2.indptr).max())
    else:
        max_col_nnz2 = int(np.bincount(m2.indices, minlength=m2.shape[1]).max())
    overlap = min(max_row_nnz1, max_col_nnz2)
    if maxv1 * maxv2 * max(overlap, 1) >= 2.0**30:
        return "float32", 1.0
    # int4 at 2x the int8 MXU rate when values fit a nibble — binary set
    # similarities (jaccard/dice/tversky) and small counts. TPU-only and
    # opt-in (SIMILARIPY_TPU_INT4=1) until validated per-hardware.
    if (
        os.environ.get("SIMILARIPY_TPU_INT4") == "1"
        and maxv1 <= 7.0
        and maxv2 <= 7.0
        and jax.default_backend() == "tpu"
    ):
        return "int4", 1.0 / (s1 * s2)
    return "int8", 1.0 / (s1 * s2)


def build_pvec(params: SPlusParams, inv_scale: float = 1.0) -> np.ndarray:
    return np.array(
        [
            params.a1,
            params.l1,
            params.l2,
            params.l3,
            params.t1,
            params.t2,
            params.stabilized_shrink,
            params.bayesian_shrink,
            params.threshold,
            inv_scale,
        ],
        dtype=np.float32,
    )


def _is_oom(exc: BaseException) -> bool:
    msg = repr(exc)
    return "RESOURCE_EXHAUSTED" in msg or "ResourceExhausted" in msg


def execute(
    pre: Preprocessed,
    params: SPlusParams,
    *,
    block_size_hint: Optional[int] = 0,
    compute_dtype: str = "float32",
    precision: str = "highest",
    budget_bytes: Optional[int] = None,
    progress=None,
):
    """Run the tiled similarity; returns host (T, k) vals f32 and idx int32.

    Device OOM resilience: the planners budget HBM from a model (reserve
    terms + measured ceilings), and a misestimate surfaces as a lazy
    ResourceExhausted somewhere in the group loop (observed once this
    round when a new tile geometry's split transient was unbudgeted).
    Rather than fail the call, retry ONCE from scratch with a 25%
    smaller budget — every planner (grouped/symmetric/compact) takes
    budget_bytes, so the whole call replans to a smaller resident
    working set. The except block releases the failed attempt's frames
    BEFORE retrying (a held traceback pins the dead attempt's device
    buffers and would re-OOM immediately)."""
    retry_budget = None
    try:
        return _execute_impl(
            pre, params,
            block_size_hint=block_size_hint,
            compute_dtype=compute_dtype,
            precision=precision,
            budget_bytes=budget_bytes,
            progress=progress,
        )
    except Exception as e:
        if not _is_oom(e):
            raise
        retry_budget = int(
            (budget_bytes if budget_bytes is not None else hbm_budget_bytes())
            * 0.75
        )
        import sys as _sys

        print(
            f"# similaripy_tpu: device OOM — replanning once with a "
            f"smaller HBM budget ({retry_budget >> 20} MB)",
            file=_sys.stderr, flush=True,
        )
    # out of the except block: the exception's traceback (which pins the
    # failed attempt's device buffers through its frames) is released
    import gc

    clear_device_cache()
    gc.collect()
    if progress is not None and hasattr(progress, "reset"):
        progress.reset()
    return _execute_impl(
        pre, params,
        block_size_hint=block_size_hint,
        compute_dtype=compute_dtype,
        precision=precision,
        budget_bytes=retry_budget,
        progress=progress,
    )


def _execute_impl(
    pre: Preprocessed,
    params: SPlusParams,
    *,
    block_size_hint: Optional[int] = 0,
    compute_dtype: str = "float32",
    precision: str = "highest",
    budget_bytes: Optional[int] = None,
    progress=None,
):
    """Plan and run one attempt of the tiled similarity (see execute)."""
    import time as _time_mod

    _t_enter = _time_mod.perf_counter()
    m1, m2, targets, k = pre.m1, pre.m2, pre.targets, pre.k
    T = targets.shape[0]
    U = m1.shape[1]
    C = pre.n_output_cols

    if T == 0 or k == 0:
        return (
            np.full((T, max(k, 1)), NEG_INF, np.float32),
            np.zeros((T, max(k, 1)), np.int32),
        )

    from .compact import compact_eligible, execute_compact
    from .symmetric import execute_symmetric, symmetric_eligible

    if symmetric_eligible(pre, params, block_size_hint):
        # self-similarity: upper-triangle blocked executor — ~half the MXU
        # work and no separate matrix1 staging (see symmetric.py)
        return execute_symmetric(
            pre, params,
            compute_dtype=compute_dtype,
            precision=precision,
            budget_bytes=budget_bytes,
            progress=progress,
        )

    if compact_eligible(pre, k):
        return execute_compact(
            pre, params,
            compute_dtype=compute_dtype,
            precision=precision,
            budget_bytes=budget_bytes,
            progress=progress,
        )

    compute_dtype, inv_scale = resolve_compute_dtype(compute_dtype, pre)
    itemsize = {"bfloat16": 2, "int8": 3, "int4": 3}.get(compute_dtype, 4)  # int8 scatters via bf16
    plan = plan_tiles(T, U, C, k, itemsize, block_size_hint, budget_bytes)
    trp, tc, u_pad = plan.panel_rows, plan.tile_cols, plan.u_pad
    n_tiles = plan.n_tiles

    # ---- fused-kernel alignment + group sizing ----
    use_pallas = _pallas_enabled()
    compute_dtype, f32x3 = _select_f32x3_mode(
        pre, m1, m2, compute_dtype, precision, use_pallas
    )
    # exclude-seen filter fold: the recommend() idiom's per-row filter
    # becomes MXU algebra (m2 - M*I) — no selector stacks, uploads or
    # mask scatters (see _exclude_seen_fold for the exactness gate)
    fold_M = _exclude_seen_fold(pre, m1, m2, params, compute_dtype, C)

    k_pad = k
    # smaller panels leave more HBM for resident tile groups (each extra
    # group costs a full matrix1 re-scatter), so cap the panel height
    trp = min(trp, 2048)
    kern_tm = kern_kb = None  # fused-kernel block overrides (None = module default)
    if use_pallas:
        from .pallas_kernels import DEFAULT_TC, KB, TM

        if compute_dtype in ("bfloat16", "float32"):
            # float-family products are DMA/step-overhead sensitive: each
            # TM row-block re-streams the D tile from HBM and each grid
            # step carries fixed cost. 512/1536 measured 11.15 -> 9.84
            # ms/product at the ML-32M scoring shape and sits within 2.5%
            # of the MXU bound at wide tiles (micro_tile_kernel.py); int8
            # keeps the hardware-validated 256/768 defaults. An explicit
            # SIMILARIPY_TPU_TM/_KB env knob wins (kernel experiments
            # must measure the configuration they asked for).
            kern_tm = TM if "SIMILARIPY_TPU_TM" in os.environ else 512
            kern_kb = KB if "SIMILARIPY_TPU_KB" in os.environ else 1536
        tm_, kb_ = kern_tm or TM, kern_kb or KB
        if compute_dtype != "float32" or f32x3:
            # bf16-stored operands (int8/bf16/split stacks): the D block
            # (kb x tc) double-buffered plus the (tm x tc) f32 accumulator
            # stay under ~40 MB of the 100 MB scoped VMEM up to tc=4480,
            # and the tc search below exploits widths past 4096 when they
            # divide C with less padding (ML-32M: tc=4224 = 20 exact tiles)
            max_tc = DEFAULT_TC + 384 if kern_tm else DEFAULT_TC
        else:
            max_tc = DEFAULT_TC // 2  # f32-stored D blocks are 2x the bytes
        # carry planes accumulate across ALL tiles, so their depth is k
        # (clamped to the catalog), not one tile's width
        k_pad = _round_up(min(k, C), 8)
        # deep carry planes multiply the in-kernel extraction working set;
        # mirror the symmetric executor's hardware-measured scoped-VMEM
        # cutover (k_pad*tc <= 768*1024, symmetric.py) by narrowing the
        # tile instead of risking a multi-minute remote-compile failure
        # the OOM replan cannot catch (it is a compile error, not an
        # allocation error)
        max_tc = max(128, min(max_tc, ((768 * 1024 // k_pad) // 128) * 128))
        tc = _round_up(min(tc, max_tc, _round_up(C, 128)), 128)
        trp = min(_round_up(trp, tm_), _round_up(T, tm_))
        u_pad = _round_up(u_pad, kb_)
        n_tiles = math.ceil(C / tc)
        if k_pad > 1024:
            # Very large k: the in-kernel iterative extraction costs one
            # max/argmax pass per kept value, so beyond ~1024 the XLA
            # sort-based top_k wins. Both paths are exact for any k (the
            # reference's heap is k-agnostic, s_plus.h:39-64); this is a
            # documented performance cutover, not a capability cliff.
            use_pallas = False
            f32x3 = False
            k_pad = k
            kern_tm = kern_kb = None

    # group size: how many dense (u_pad x tc) tiles fit in HBM next to the
    # panel working set; every group is densified exactly once
    budget = budget_bytes if budget_bytes is not None else hbm_budget_bytes()
    dense_item = {"bfloat16": 2, "int8": 1, "int4": 1}.get(compute_dtype, 4)
    # 'lhs' stores the tile side as plain bf16 (2 B) — half the f32 split
    # stack — so budgeting 4 B/elem would halve g_tiles and double the
    # panel re-scatters for nothing
    tile_item = 2 if f32x3 == "lhs" else dense_item
    if f32x3 == "rhs":
        panel_item = 2  # plain bf16 panel (the split side is matrix2)
    elif f32x3 in (True, "both", "lhs"):
        panel_item = 4  # [hi; lo] split stack, same bytes as f32
    else:
        panel_item = dense_item
    m1_bytes = trp * u_pad * (panel_item + (2 if compute_dtype in ("int8", "int4") else 0))
    # reserve: panel working set + cached COO uploads (~12B/nnz + padding)
    # + one group's selector-tile slice (the (P, g, pf) index pairs stay
    # host-resident and upload per group) + the whole-run carry planes.
    # A full-ML-32M scoring call (m2 explicit, filter_cols=urm) OOMed with
    # the original reserve: 31.5M selector nnz and ~340 MB of carries were
    # unbudgeted next to a 7.6 GB tile stack.
    # NOTE: the filter's nnz stays in the reserve even when the fold drops
    # its masks — the masked plan is the hardware-proven-to-fit geometry
    # (ML-32M scoring sits within ~1 GB of the practical HBM ceiling), and
    # under it the folded call strictly reduces real usage (no sel slices
    # ever upload). Releasing the reserve instead grows g_tiles past the
    # ceiling: measured ResourceExhausted at full ML-32M scale.
    sel_nnz = (
        (pre.filter_matrix.nnz if pre.filter_matrix is not None else 0)
        + (pre.target_matrix.nnz if pre.target_matrix is not None else 0)
    )
    n_panels_est = math.ceil(T / trp)
    foreign = foreign_cache_bytes((pre.fp1, pre.fp2))
    tc, n_tiles, g_tiles, n_groups = plan_fused_groups(
        C=C, tc=tc, u_pad=u_pad, trp=trp, k_pad=k_pad,
        m1_nnz=m1.nnz, m2_nnz=m2.nnz, sel_nnz=sel_nnz,
        m1_bytes=m1_bytes, tile_item=tile_item,
        budget=budget, foreign=foreign, n_panels=n_panels_est,
        f32x3=f32x3, compute_dtype=compute_dtype,
        # tc SEARCH (float-family fused path with planner-chosen width):
        # the padded tile count (empty tiles cost full MXU products) and
        # the group count (each group re-scatters the whole matrix1 panel
        # set) both depend on how C divides into tiles
        search=(
            use_pallas
            and compute_dtype in ("bfloat16", "float32")
            and block_size_hint == 0
        ),
        max_tc=max_tc if use_pallas else tc,
        tm=tm_ if use_pallas else 256,
    )

    # matrix2 tiles: balanced round-robin column layout (see balance_columns).
    # The fingerprint covers the raw CSR + dtype so cache hits skip the
    # tocsc conversion entirely.
    m2_key = (
        "m2",
        pre.fp2,
        _fingerprint(pre.Yt, pre.Yc, pre.Yd, pre.col_allowed),
        compute_dtype, tc, n_tiles, u_pad, fold_M,
    )
    cached = _cache_get(m2_key)
    if cached is None:
        _evict_stale("m2", pre.fp2, m2_key)
        # exact integerization; f32->int8 casts on device are lossless
        m2_csc = csc_quantized(
            m2, pre.qscale2 if compute_dtype in ("int8", "int4") else None
        )
        if fold_M is not None:
            m2_csc = _apply_fold(m2_csc, fold_M, C)
        col_nnz = np.diff(m2_csc.indptr)
        tile_lists, col_map = balance_columns(col_nnz, n_tiles, tc)
        t_rows, t_cols, t_vals = _stack_m2_tiles_balanced(
            m2_csc, tile_lists, tc, u_pad
        )

        yt = _vec_by_map(pre.Yt, col_map, C).reshape(n_tiles, tc)
        yc = _vec_by_map(pre.Yc, col_map, C).reshape(n_tiles, tc)
        yd = _vec_by_map(pre.Yd, col_map, C).reshape(n_tiles, tc)
        col_offsets = (np.arange(n_tiles, dtype=np.int32) * tc).reshape(n_tiles, 1)

        tiles_common = {
            "m2_rows": jnp.asarray(t_rows),
            "m2_cols": jnp.asarray(t_cols),
            "m2_vals": jnp.asarray(t_vals),
            "y_t": jnp.asarray(yt),
            "y_c": jnp.asarray(yc),
            "y_d": jnp.asarray(yd),
            "col_offset": jnp.asarray(col_offsets),
        }
        if pre.col_allowed is not None:
            allowed = np.zeros(col_map.shape[0], dtype=bool)
            used = col_map < C
            allowed[used] = pre.col_allowed[col_map[used]]
            tiles_common["allowed"] = jnp.asarray(allowed.reshape(n_tiles, tc))
        _cache_put(m2_key, (tiles_common, col_map, tile_lists))
    else:
        tiles_common, col_map, tile_lists = cached
    has_allowed = "allowed" in tiles_common

    has_filter = pre.filter_matrix is not None and fold_M is None
    has_target = pre.target_matrix is not None
    pvec = jnp.asarray(build_pvec(params, inv_scale))

    # NEG_INF-padded so a k_out < k fused readback keeps the (T, k) contract
    out_vals = np.full((T, k), NEG_INF, np.float32)
    out_idx = np.zeros((T, k), np.int32)

    xt_full = pre.Xt if pre.Xt is not None else None
    xc_full = pre.Xc if pre.Xc is not None else None
    xd_full = pre.Xd if pre.Xd is not None else None

    n_panels = math.ceil(T / trp)

    m1_key = (
        "m1",
        pre.fp1,
        _fingerprint(targets, xt_full, xc_full, xd_full),
        compute_dtype, trp,
    )
    cached = _cache_get(m1_key)
    if cached is None:
        _evict_stale("m1", pre.fp1, m1_key)
        m1_t = m1[targets]
        if compute_dtype in ("int8", "int4"):
            m1_t.data = np.rint(m1_t.data * pre.qscale1).astype(np.float32)
        # balance panel nnz: deal target rows round-robin by nnz rank so
        # every panel's padded COO bucket sits near the mean instead of
        # the max (the scatter pays for padding too)
        row_nnz = np.diff(m1_t.indptr)
        order = np.argsort(-row_nnz, kind="stable")
        panel_sel = [order[p::n_panels] for p in range(n_panels)]

        # one shared nnz bucket: every panel compiles to the same program
        # (each distinct shape costs minutes through the remote compiler)
        p1 = _pad_bucket(
            max(int(row_nnz[sel].sum()) for sel in panel_sel)
        )
        pr = np.full((n_panels, p1), trp, dtype=np.int32)
        pc = np.zeros((n_panels, p1), dtype=np.int32)
        pv = np.zeros((n_panels, p1), dtype=np.float32)
        sx_t = np.ones((n_panels, trp), dtype=np.float32)
        sx_c = np.ones((n_panels, trp), dtype=np.float32)
        sx_d = np.ones((n_panels, trp), dtype=np.float32)
        for p in range(n_panels):
            sel = panel_sel[p]
            panel = m1_t[sel]
            nnz = panel.data.shape[0]
            pr[p, :nnz] = np.repeat(
                np.arange(sel.shape[0], dtype=np.int32), np.diff(panel.indptr)
            )
            pc[p, :nnz] = panel.indices
            pv[p, :nnz] = panel.data

            tgt_ids = targets[sel]
            sx_t[p] = _pad_vec(xt_full[tgt_ids] if xt_full is not None else None, trp)
            sx_c[p] = _pad_vec(xc_full[tgt_ids] if xc_full is not None else None, trp)
            sx_d[p] = _pad_vec(xd_full[tgt_ids] if xd_full is not None else None, trp)
        panels_dev = tuple(
            jnp.asarray(a) for a in (pr, pc, pv, sx_t, sx_c, sx_d)
        )
        _cache_put(m1_key, (panels_dev, panel_sel))
    else:
        panels_dev, panel_sel = cached

    # per-panel selector tiles (host-prepped once, sliced per group); one
    # shared pad bucket across panels keeps the compiled shapes identical.
    # Cached by full-content fingerprint: production scoring loops reuse
    # the same filter matrix (filter_cols=urm) every call and the O(nnz)
    # restack cost ~2.6 s/call at ML-32M scale
    sel_stacked = {}
    if has_filter or has_target:
        def _mat_fp(m):
            return _fingerprint(m.data, m.indices, m.indptr) if m is not None else None

        sel_cache_key = (
            "sel",
            pre.fp1, pre.fp2, _fingerprint(targets),
            _mat_fp(pre.filter_matrix), _mat_fp(pre.target_matrix),
            # which selectors are materialized matters: the filter fold
            # drops the filter stacks while its matrix fp stays in the key
            has_filter, has_target,
            compute_dtype, trp, tc, n_tiles, u_pad,
        )
        cached_sel = _cache_get(sel_cache_key)
        if cached_sel is None:
            _evict_stale("sel", pre.fp1, sel_cache_key)
            fil_t = pre.filter_matrix[targets] if has_filter else None
            tgt_t = pre.target_matrix[targets] if has_target else None
            sel_tiles = []
            pf_f = pf_t = None
            if has_filter:
                pf_f = _selector_pf(fil_t, panel_sel, col_map, tc, C, n_tiles)
            if has_target:
                pf_t = _selector_pf(tgt_t, panel_sel, col_map, tc, C, n_tiles)
            for p in range(n_panels):
                entry = {}
                if has_filter:
                    fr, fc = _stack_selector_tiles_balanced(
                        fil_t[panel_sel[p]].tocsc(), tile_lists, tc, trp,
                        pf=pf_f,
                    )
                    entry["fil_rows"], entry["fil_cols"] = fr, fc
                if has_target:
                    tr, tcl = _stack_selector_tiles_balanced(
                        tgt_t[panel_sel[p]].tocsc(), tile_lists, tc, trp,
                        pf=pf_t,
                    )
                    entry["tgt_rows"], entry["tgt_cols"] = tr, tcl
                sel_tiles.append(entry)
            # host-resident: each group reads ONLY its own [:, t0:t1]
            # slice, so keeping the full (P, n_tiles, pf) stack on device
            # buys nothing across groups and costs ~0.5-1 GB of HBM on
            # selector-heavy calls (filter_cols=urm at ML-32M scale); the
            # per-group slice uploads below
            sel_stacked = {
                name: np.stack([e[name] for e in sel_tiles])
                for name in sel_tiles[0]
            }  # (P, n_tiles, pf), np
            _cache_put(sel_cache_key, sel_stacked)
        else:
            sel_stacked = cached_sel

    if use_pallas:
        # (k_pad, trp) carry planes, merged in-kernel per tile (the same
        # two-phase pool as the symmetric kernel's row side)
        carry_v = jnp.full((n_panels, k_pad, trp), NEG_INF, jnp.float32)
        carry_i = jnp.zeros((n_panels, k_pad, trp), jnp.int32)
    else:
        carry_v = jnp.full((n_panels, trp, k), NEG_INF, jnp.float32)
        carry_i = jnp.zeros((n_panels, trp, k), jnp.int32)

    timing = os.environ.get("SIMILARIPY_TPU_TIMING") == "1"
    if timing:
        import sys
        import time as _time

        print(
            f"# plan: trp={trp} tc={tc} u_pad={u_pad} n_panels={n_panels} "
            f"g_tiles={g_tiles} n_groups={n_groups} dtype={compute_dtype} "
            f"pallas={use_pallas} k_pad={k_pad} f32x3={f32x3} "
            f"tm={kern_tm} kb={kern_kb} "
            f"fold={fold_M is not None} "
            f"prep: {_time.perf_counter() - _t_enter:.2f}s",
            file=sys.stderr, flush=True,
        )
        _t_mark = _time.perf_counter()

        def _lap(label, sync=None):
            nonlocal _t_mark
            if sync is not None:
                # forced tiny readback: block_until_ready is unreliable
                # through tunneled backends
                arr = jax.tree.leaves(sync)[0]
                np.asarray(arr.ravel()[:1])
            now = _time.perf_counter()
            print(f"# {label}: {now - _t_mark:.2f}s", file=sys.stderr, flush=True)
            _t_mark = now

    d_split = _d_split(f32x3)
    d_stack = None
    for g in range(n_groups):
        t0, t1 = g * g_tiles, (g + 1) * g_tiles
        group_coo = (
            tiles_common["m2_rows"][t0:t1],
            tiles_common["m2_cols"][t0:t1],
            tiles_common["m2_vals"][t0:t1],
        )
        if d_stack is None:
            d_stack = _densify_group(
                *group_coo, u_pad=u_pad, tc=tc,
                compute_dtype=compute_dtype, split=d_split,
            )
        else:
            # retire the previous group's stack into this one's densify —
            # donation replaces the forced-readback barrier (HBM stays at
            # one stack; the stream orders the overwrite after its readers)
            d_stack = _densify_group_into(
                d_stack, *group_coo, u_pad=u_pad, tc=tc,
                compute_dtype=compute_dtype, split=d_split,
            )
        if timing:
            _lap(f"group {g} densify", d_stack)
        group_tiles = {
            name: tiles_common[name][t0:t1]
            for name in ("y_t", "y_c", "y_d", "col_offset")
        }
        if has_allowed:
            group_tiles["allowed"] = tiles_common["allowed"][t0:t1]

        tiles = dict(group_tiles)
        for name, arr in sel_stacked.items():
            # np.ascontiguousarray: the column slice of the host stack is
            # strided; make the h2d transfer one contiguous copy
            tiles[name] = jnp.asarray(np.ascontiguousarray(arr[:, t0:t1]))

        d_pr, d_pc, d_pv, d_xt, d_xc, d_xd = panels_dev
        carry_v, carry_i = _run_group_panels(
            d_pr, d_pc, d_pv, d_xt, d_xc, d_xd,
            d_stack,
            tiles,
            pvec,
            carry_v,
            carry_i,
            flags=params.static_flags(),
            k=k,
            k_pad=k_pad,
            trp=trp,
            u_pad=u_pad,
            tc=tc,
            has_allowed=has_allowed,
            has_filter=has_filter,
            has_target=has_target,
            compute_dtype=compute_dtype,
            precision=precision,
            use_pallas=use_pallas,
            f32x3=f32x3,
            kern_tm=kern_tm,
            kern_kb=kern_kb,
        )
        if timing:
            np.asarray(carry_v[:1, :1, :1])  # sync so laps are honest
            _lap(f"group {g} panels x{n_panels}")
        if progress is not None:
            # tick behind a one-element readback so the bar tracks real
            # device completion; silent (verbose=False) runs skip the
            # barrier and ride the donation chain barrier-free
            if not timing:
                np.asarray(carry_v[:1, :1, :1])
            done = T if g == n_groups - 1 else (T * (g + 1)) // n_groups
            prev = (T * g) // n_groups
            progress.update(done - prev)

    # single batched readback: per-array transfers pay a full tunnel
    # round-trip each, so pack (vals, idx) into one int32 buffer first
    if use_pallas:
        k_out = min(k, k_pad)
        packed = np.asarray(_pack_carry_planes(carry_v, carry_i, k_out=k_out))
    else:
        k_out = k
        packed = np.asarray(_pack_carries(carry_v, carry_i))
    all_vals = packed.view(np.float32)[..., 0]
    all_idx = packed[..., 1]
    for p in range(n_panels):
        sel = panel_sel[p]
        out_vals[sel, :k_out] = all_vals[p, : sel.shape[0]]
        out_idx[sel, :k_out] = all_idx[p, : sel.shape[0]]
    if timing:
        _lap("output readback")

    # device column ids are balanced-layout slots; map back to originals.
    # -inf slots carry arbitrary ids (incl. unused-slot sentinels) and are
    # dropped downstream in assembly, so a blanket map is safe.
    out_idx = col_map[out_idx].astype(np.int32)
    return out_vals, out_idx
