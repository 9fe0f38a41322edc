"""Symmetric (self-similarity) executor: upper-triangle blocked top-K.

The headline similarity workload is self-similarity — ``sim.cosine(m)``
computes the top-K of ``m @ m.T`` (reference: s_plus.pyx:164-166 sets
``matrix2 = matrix1.T``). The score matrix is then symmetric whenever the
S-Plus epilogue treats both sides identically, and the general executor
(executor.py) computes every cell twice AND re-scatters the matrix1 panels
once per resident tile group. This module exploits the symmetry the TPU
way:

  - ONE item permutation (nnz-rank round-robin over column tiles, the
    balance trick of executor.balance_columns) is shared by rows and
    columns, so a tile's COO scatters into EITHER orientation:
    ``(user, slot)`` for a rhs tile, ``(slot, user)`` for a lhs row block.
    The separate matrix1 panel preparation disappears entirely.
  - anchor groups of ``gt`` tiles are densified once and stay
    HBM-resident while the executor sweeps the remaining column tiles
    t >= anchor_start — only the upper block triangle is computed
    (~0.52-0.57x of the full grid at ML-32M geometry instead of 1.0x).
    On the fused-kernel path anchors keep the SAME rhs (user x slot)
    orientation as the inner tiles (the kernel contracts the shared user
    axis via dot_general), so sweep chunks over an anchor's own tiles
    slice the resident stack instead of re-scattering — one full scatter
    of every tile is retired from the schedule.
  - every computed block feeds TWO top-K merges: the anchor rows' carry
    (row side) and, transposed, the inner tile rows' carry (col side).
    Tile-granularity iota masks make the delivery exactly-once:
        row side keeps columns of tile t for rows with tile(row) <= t,
        col side keeps candidates  with tile(candidate)      <  t,
    which for every ordered pair (r, c) delivers c into r's stream exactly
    once — including the diagonal r == c (row side of the diagonal tile).
  - anchors are processed in PAIRS sharing one inner sweep, so each inner
    tile is scattered once for two anchors (the re-materialization
    triangle is the scatter floor; pairing halves it).
  - a finished anchor pair's carry rows are final (later anchors only
    sweep tiles to their right), so their packed readback streams
    host-ward asynchronously UNDER the next pair's compute.

On TPU the per-block work runs through the dual-sided fused kernel
(pallas_kernels.fused_sym_topk): one MXU pass computes the block, applies
the S-Plus epilogue and extracts BOTH directions' top-k_pad without the
scores ever leaving VMEM — what remains here is two cheap (rows, k+k_pad)
merges into the global carry. Off-TPU (or SIMILARIPY_TPU_USE_PALLAS=0)
the XLA chain [dot -> epilogue -> transpose -> hierarchical top_k] runs
instead. Either way the result is identical to the general path: same
epilogue math, same candidate semantics (xy != 0), exact top-K.
Eligibility (symmetric_eligible) requires only VALUE symmetry of the
score matrix — matrix2 is matrix1.T (every ``matrix2=None`` call) — plus
natural row order and no selectors. ASYMMETRIC EPILOGUES are handled:
when t1 != t2 or the X/Y normalization vectors differ (tversky,
asymmetric_cosine, rp3beta-style one-sided depop), the col-side delivery
re-runs the epilogue with the X/Y roles swapped on the same xy block
(epilogue_is_symmetric picks the cheap single-epilogue path otherwise).
p3alpha/rp3beta reach this executor through the value-symmetric
refactoring in similarity.py (A = m^a c^(-a/2), row-side depop r^a).

Reference parity: this replaces the same work as the reference's blocked
Gustavson loop (s_plus.h:358-410) for the ``matrix2=None`` call family —
the reference never exploits symmetry, so this path has no counterpart
there; its correctness oracle is the general executor.
"""

from __future__ import annotations

import math
import os
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
# Eligibility
# ---------------------------------------------------------------------------


def _vec_pair_equal(a: Optional[np.ndarray], b: Optional[np.ndarray]) -> bool:
    if a is None and b is None:
        return True
    if a is None or b is None:
        return False
    return a.shape == b.shape and np.array_equal(a, b)


def symmetric_eligible(pre: Preprocessed, params: SPlusParams,
                       block_size_hint) -> bool:
    """True when the score matrix is provably symmetric and un-subsetted.

    Requires: the call came from ``matrix2=None`` (pre.self_similar), all
    rows targeted in natural order, no column selectors, an epilogue whose
    row- and column-side inputs mirror (t1 == t2 and identical
    normalization vectors), and the planner-managed block size (the
    reference's explicit block_size semantics stay on the general path).
    """
    if os.environ.get("SIMILARIPY_TPU_SYMMETRIC", "1") in ("0", "false"):
        return False
    if os.environ.get("SIMILARIPY_TPU_COMPACT") == "1":
        return False  # explicit compact-path request wins (tests/debug)
    if not pre.self_similar:
        return False
    if block_size_hint != 0:
        return False
    if pre.filter_matrix is not None or pre.target_matrix is not None:
        return False
    if pre.col_allowed is not None:
        return False
    C = pre.n_output_cols
    if pre.n_output_rows != C or pre.m1.shape[0] != C:
        return False
    t = pre.targets
    if t.shape[0] != C or t[0] != 0 or t[-1] != C - 1:
        return False
    if not np.array_equal(t, np.arange(C, dtype=t.dtype)):
        return False
    if pre.qscale1 != pre.qscale2:
        return False
    # NOTE: epilogue asymmetry (t1 != t2, differing X/Y vectors — tversky,
    # asymmetric_cosine, rp3beta-style one-sided depop) is fine: the score
    # matrix xy = m1 @ m1.T is still value-symmetric, and the executor
    # re-runs the epilogue with the X/Y roles swapped for the col-side
    # delivery (epilogue_is_symmetric below picks the cheap path).
    return True


def epilogue_is_symmetric(pre: Preprocessed, params: SPlusParams) -> bool:
    """True when one epilogue value serves both delivery directions."""
    if params.l1 != 0.0 and params.t1 != params.t2:
        return False
    for a, b in ((pre.Xt, pre.Yt), (pre.Xc, pre.Yc), (pre.Xd, pre.Yd)):
        if not _vec_pair_equal(a, b):
            return False
    return True


# ---------------------------------------------------------------------------
# Planning
# ---------------------------------------------------------------------------


# measured v5e sustained rates (BASELINE.md "Environment facts"); only the
# RATIO matters for the planner, so stale absolutes degrade gracefully
_MXU_RATE = {"int8": 296e12, "int4": 296e12, "bfloat16": 170e12,
             "float32": 30e12}
_SCATTER_NNZ_RATE = 30e6  # bf16 XLA scatter, elements/s


def _triangle_counts(n_tiles_dev: int, gt: int, dual: bool,
                     anchor_reuse: bool) -> tuple[int, int]:
    """(kernel block-products, tile scatters) of the host sweep schedule.

    Mirrors execute_symmetric's pair loop exactly: a dual pair sweeps its
    band with one anchor and everything right of it with two; anchors
    themselves are densified once each (the + n_tiles_dev term). On the
    fused-kernel path (anchor_reuse) chunks over an anchor's own tiles
    slice the resident stack instead of re-scattering, which removes one
    band's worth of scatters per sweep.
    """
    n_groups = n_tiles_dev // gt
    products = 0
    scatters = n_tiles_dev  # anchor densifies
    a = 0
    while a < n_groups:
        if dual and a + 1 < n_groups:
            band = gt  # tiles a*gt .. (a+1)*gt, first anchor only
            rest = n_tiles_dev - (a + 1) * gt
            products += band + 2 * rest
            scatters += band + rest
            if anchor_reuse:
                scatters -= 2 * gt  # both anchors' own tiles sliced
            a += 2
        else:
            rest = n_tiles_dev - a * gt
            products += rest
            scatters += rest
            if anchor_reuse:
                scatters -= gt
            a += 1
    return products, scatters


def _plan(C: int, U: int, nnz: int, compute_dtype: str, budget: int,
          use_pallas: bool,
          tc_max: Optional[int] = None) -> tuple[int, int, int, bool]:
    """Choose (tc, gt, u_pad, dual) by modeled wall time under the HBM cap.

    Two O(n_groups) terms trade off: coarser anchors (larger gt) cut the
    inner re-scatter triangle AND the grid padding (n_tiles_dev rounds up
    to a multiple of gt, and padding inflates the matmul quadratically),
    but cost resident HBM (per_pass * gt * tc * u_pad next to the rhs
    scatter transient, the COO uploads and — XLA path only — the
    score-block working set). Rather than greedily filling HBM, every
    feasible gt is costed with the measured MXU/scatter rates and the
    cheapest wins.
    """
    u_pad = max(_round_up(U, 128), 128)
    isize = {"bfloat16": 2, "int8": 1, "int4": 1}.get(compute_dtype, 4)

    tc_env = os.environ.get("SIMILARIPY_TPU_SYM_TC")
    if tc_env:
        tc = _round_up(int(tc_env), 128)
    else:
        tc = 4096 if isize <= 2 else 2048
    if tc_max is not None:
        tc = min(tc, tc_max)
    tc = min(tc, _round_up(C, 128))
    n_tiles = math.ceil(C / tc)

    dual = os.environ.get("SIMILARIPY_TPU_SYM_DUAL", "1") not in ("0", "false")
    per_pass = 2 if dual else 1

    tile_lhs = tc * u_pad * isize
    # XLA-path per-anchor-tile score-block working set: xy + f32 val +
    # masked copy + transpose (~12B per cell of a (tc x tc) block slice);
    # the fused kernel keeps all of that in VMEM
    blk = 0 if use_pallas else tc * tc * 12
    reserve = (
        int(nnz * 12 * 1.8)  # device-resident COO uploads + pad slack
        + u_pad * tc * (2 + isize)  # rhs scatter transient (bf16 + cast)
        + tc * u_pad * 2  # lhs scatter transient (bf16, per tile)
        + (1 << 30)
    )
    avail = int(budget * 0.85) - reserve
    gt_max = max(1, min(int(avail // (per_pass * tile_lhs + blk)), n_tiles))

    gt_env = os.environ.get("SIMILARIPY_TPU_SYM_GT")
    if gt_env:
        return tc, max(1, int(gt_env)), u_pad, dual

    mxu = _MXU_RATE.get(compute_dtype, _MXU_RATE["float32"])
    nnz_tile = nnz / max(n_tiles, 1)
    best_gt, best_t = 1, float("inf")
    for gt in range(1, gt_max + 1):
        n_tiles_dev = math.ceil(n_tiles / gt) * gt
        products, scatters = _triangle_counts(
            n_tiles_dev, gt, dual, use_pallas
        )
        t = (
            products * (gt * tc) * tc * u_pad * 2 / mxu
            + scatters * nnz_tile / _SCATTER_NNZ_RATE
        )
        if t < best_t - 1e-9:
            best_gt, best_t = gt, t
    return tc, best_gt, u_pad, dual


# ---------------------------------------------------------------------------
# Device programs
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("tc", "u_pad", "compute_dtype"))
def _densify_lhs(slots, users, vals, *, tc: int, u_pad: int,
                 compute_dtype: str):
    """Per-tile COO -> (gt, tc, u_pad) lhs-oriented dense stack.

    Same triplets as the rhs tiles, scattered with the index order swapped;
    sequential map bounds the bf16 scatter transient to one tile."""
    from .executor import compute_cast, densify

    cdt, _ = compute_cast(compute_dtype)

    def one(args):
        s, u, v = args
        return densify((tc, u_pad), s, u, v, cdt)

    return jax.lax.map(one, (slots, users, vals))


@partial(
    jax.jit,
    static_argnames=("tc", "u_pad", "compute_dtype"),
    donate_argnums=(0,),
)
def _densify_lhs_into(arena, slots, users, vals, *, tc: int, u_pad: int,
                      compute_dtype: str):
    """_densify_lhs writing over a retired anchor's donated buffer.

    Donation lets XLA alias the multi-GB lhs stack instead of allocating a
    second one, so the host can enqueue the next pair's anchors WITHOUT a
    device barrier: the single TPU stream orders the overwrite after every
    already-enqueued sweep that reads the old anchor, and peak HBM stays at
    one pair's working set."""
    del arena  # buffer reused for the output via donation
    return _densify_lhs(
        slots, users, vals, tc=tc, u_pad=u_pad, compute_dtype=compute_dtype
    )


@partial(jax.jit, static_argnames=("tc", "u_pad", "compute_dtype", "split"))
def _densify_rhs_stack(users, slots, vals, *, tc: int, u_pad: int,
                       compute_dtype: str, split: bool = False):
    """Anchor group as a (gt, u_pad, tc) stack of rhs-oriented tiles.

    Same orientation as the sweep's inner tiles (the kernel contracts the
    shared user axis via dot_general), so chunks whose inner tiles ARE an
    anchor's tiles slice the resident stack instead of re-scattering —
    that retires one full scatter of every tile per pair schedule. With
    `split` each tile leaves as a split_bf16x3 (2*u_pad, tc) stack for the
    kernel's 3-phase f32-HIGH mode."""
    from .executor import compute_cast, densify
    from .pallas_kernels import split_bf16x3

    cdt, _ = compute_cast(compute_dtype)

    def one(args):
        u, s, v = args
        t = densify((u_pad, tc), u, s, v, cdt)
        return split_bf16x3(t, axis=0) if split else t

    return jax.lax.map(one, (users, slots, vals))


@partial(
    jax.jit,
    static_argnames=("tc", "u_pad", "compute_dtype", "split"),
    donate_argnums=(0,),
)
def _densify_rhs_stack_into(arena, users, slots, vals, *, tc: int,
                            u_pad: int, compute_dtype: str,
                            split: bool = False):
    """_densify_rhs_stack over a retired anchor's donated buffer."""
    del arena  # buffer reused for the output via donation
    return _densify_rhs_stack(
        users, slots, vals, tc=tc, u_pad=u_pad,
        compute_dtype=compute_dtype, split=split,
    )


@partial(jax.jit, static_argnames=("tc", "u_pad", "compute_dtype"))
def _densify_anchor_mxu(ps, vv, cnt, *, tc: int, u_pad: int,
                        compute_dtype: str):
    """Anchor group as a (gt, u_pad, tc) stack of MXU-scattered rhs tiles.

    Rhs orientation is the ONLY dense orientation in MXU-scatter mode —
    the sweep kernel contracts the shared user axis via dot_general, so
    anchors reuse the same binned COO and the same scatter kernel as the
    inner tiles."""
    from .executor import compute_cast
    from .pallas_kernels import mxu_scatter

    cdt, _ = compute_cast(compute_dtype)
    interpret = jax.default_backend() != "tpu"

    def one(args):
        p_, v, c = args
        return mxu_scatter(
            p_, v, c, u_pad=u_pad, tc=tc, out_dtype=cdt,
            interpret=interpret,
        )

    return jax.lax.map(one, (ps, vv, cnt))


@partial(
    jax.jit,
    static_argnames=("tc", "u_pad", "compute_dtype"),
    donate_argnums=(0,),
)
def _densify_anchor_mxu_into(arena, ps, vv, cnt, *, tc: int, u_pad: int,
                             compute_dtype: str):
    """_densify_anchor_mxu over a retired anchor's donated buffer."""
    del arena  # buffer reused for the output via donation
    return _densify_anchor_mxu(
        ps, vv, cnt, tc=tc, u_pad=u_pad, compute_dtype=compute_dtype
    )


def _lpt_user_perm(t_users, u_pad: int) -> np.ndarray:
    """Greedy LPT permutation of the user axis for balanced scatter bins.

    Heaviest-degree user goes onto the lightest user block with a free
    row; returns old-row -> new-row. Deterministic for the prep cache."""
    import heapq

    from .pallas_kernels import UBR

    UBn = u_pad // UBR
    deg = np.bincount(t_users.ravel(), minlength=u_pad + 1)[:u_pad]
    rank = np.argsort(-deg, kind="stable")
    heap = [(0, b) for b in range(UBn)]
    row_used = np.zeros(UBn, np.int64)
    perm = np.empty(u_pad, np.int64)
    for u in rank:
        load, b = heapq.heappop(heap)
        perm[u] = b * UBR + row_used[b]
        row_used[b] += 1
        if row_used[b] < UBR:
            heapq.heappush(heap, (load + int(deg[u]), b))
    return perm


def _bin_tiles_mxu(t_users, t_slots, t_vals, u_pad: int, tc: int,
                   int_mode: bool):
    """Bin per-tile COO into (user-block x slot-block) bins for mxu_scatter.

    A single permutation of the user axis packs users onto blocks greedily
    by total degree (longest-processing-time onto the lightest block), so
    every bin's entry count stays near the mean; full-catalog power users
    additionally split across their SB slot bins, and mxu_scatter skips
    chunks past each bin's live count, so one outlier only stretches the
    shared budget L for itself. Both matmul operands use the permuted user
    axis, so scores are unchanged. Returns (ps, vv) as (nt, UB*SB*L, 1)
    bin-local columns — ps packs (user_row << 16) | slot, -1 padded
    (mxu_scatter's sentinel contract) — plus counts (nt, UB*SB)."""
    from .pallas_kernels import LC, SC, UBR

    nt, p2 = t_users.shape
    UBn = u_pad // UBR
    SBn = tc // SC
    nbin = UBn * SBn
    perm = _lpt_user_perm(t_users, u_pad)

    pu = np.where(
        t_users < u_pad, perm[np.minimum(t_users, u_pad - 1)], -1
    )
    bin_of = np.where(
        pu >= 0, (pu // UBR) * SBn + t_slots // SC, -1
    )
    Lmax = 1
    for t in range(nt):
        bt = bin_of[t][bin_of[t] >= 0]
        if bt.size:
            Lmax = max(Lmax, int(np.bincount(bt, minlength=nbin).max()))
    L = max(LC, -(-Lmax // LC) * LC)

    vdt = np.int32 if int_mode else np.float32
    ps = np.full((nt, nbin * L, 1), -1, np.int32)
    vv = np.zeros((nt, nbin * L, 1), vdt)
    cnt = np.zeros((nt, nbin), np.int32)
    for t in range(nt):
        valid = bin_of[t] >= 0
        b = bin_of[t][valid]
        lu = (pu[t][valid] % UBR).astype(np.int32)
        sl = (t_slots[t][valid] % SC).astype(np.int32)
        vl = t_vals[t][valid]
        order = np.argsort(b, kind="stable")
        b, lu, sl, vl = b[order], lu[order], sl[order], vl[order]
        counts = np.bincount(b, minlength=nbin)
        starts = np.zeros(nbin, np.int64)
        np.cumsum(counts[:-1], out=starts[1:])
        dest = b * L + (np.arange(b.shape[0]) - starts[b])
        ps[t, dest, 0] = (lu.astype(np.int32) << 16) | sl
        vv[t, dest, 0] = (
            np.rint(vl).astype(np.int32) if int_mode else vl.astype(np.float32)
        )
        cnt[t] = counts.astype(np.int32)
    return ps, vv, cnt


@partial(
    jax.jit,
    static_argnames=(
        "flags", "k", "gt", "tc", "u_pad", "cs", "n_anchors",
        "compute_dtype", "precision", "use_pallas", "mxu",
        "prefill", "asym", "f32x3",
    ),
    donate_argnums=(2, 3),
)
def _sweep_chunk(
    anchors,  # tuple of dicts: lhs (gt,tc,u_pad), xt/xc/xd (sw,), a0 scalar
    tiles,  # dict of (cs, ...) stacked per-tile arrays: tid, ru, sl, vv, y_*
    carry,  # donated; pallas: (crv, cri, ccv, cci) (k_pad_*, Cdev) planes,
    #         xla: (cv, ci) (Cdev, k)
    parena,  # donated (gt, u_pad, tc) arena when prefilling, else (1,) dummy
    sel,  # i32 scalar: anchor index whose resident stack holds this chunk's
    #      inner tiles (sliced instead of re-scattered), or n_anchors to
    #      densify from COO. Traced so every chunk of a sweep shares ONE
    #      compiled program per n_anchors (remote compiles are minutes;
    #      three static variants cost three of them)
    pvec,
    *,
    flags: tuple,
    k: int,
    gt: int,
    tc: int,
    u_pad: int,
    cs: int,
    n_anchors: int,
    compute_dtype: str,
    precision: str,
    use_pallas: bool,
    mxu: bool = False,
    prefill: bool = False,
    asym: bool = False,
    f32x3: bool = False,
):
    """cs inner tiles x n_anchors resident row blocks, one dispatch.

    Each step scatters one rhs tile and, per anchor, computes the score
    block and merges it into the global carry on both sides (delivery
    masks as per the module docstring). With `use_pallas` the block goes
    through fused_sym_topk — matmul, epilogue, BOTH per-direction
    top-k_pad extractions AND both carry merges in one kernel whose
    scores never leave VMEM — all that remains here is slicing the global
    carry planes around the call. The two sides keep separate planes
    (merged at pack time) so their updates never alias within a product.
    Without `use_pallas`, the XLA chain (dot -> epilogue -> transpose ->
    hierarchical top_k) runs on a single (Cdev, k) carry.
    """
    from .executor import compute_cast, densify, splus_epilogue, topk_merge

    cdt, acc = compute_cast(compute_dtype)
    prec = {
        "default": jax.lax.Precision.DEFAULT,
        "high": jax.lax.Precision.HIGH,
        "highest": jax.lax.Precision.HIGHEST,
    }[precision]
    sw = gt * tc
    int_mode = compute_dtype in ("int8", "int4")
    interpret = jax.default_backend() != "tpu"
    if use_pallas:
        from .pallas_kernels import sym_k_pads

        k_pad_r, k_pad_c = sym_k_pads(k, tc, sw)

    pf_t0 = tiles["tid"][0]  # chunk's first tile (traced)

    def step(state, xs):
        carry, parena = state
        t = xs["tid"]  # global tile index, i32 scalar

        def densify_tile():
            if mxu:
                from .pallas_kernels import mxu_scatter

                return mxu_scatter(
                    xs["ps"], xs["vv"], xs["cnt"], u_pad=u_pad, tc=tc,
                    out_dtype=cdt, interpret=interpret,
                )
            d = densify((u_pad, tc), xs["ru"], xs["sl"], xs["vv"], cdt)
            if f32x3:
                from .pallas_kernels import split_bf16x3

                d = split_bf16x3(d, axis=0)
            return d

        if use_pallas:
            # chunks over an anchor's own tiles slice its resident
            # rhs-oriented stack instead of re-scattering; `sel` picks the
            # branch at runtime so one program serves the whole sweep
            branches = [
                (lambda aa=aa: jax.lax.dynamic_index_in_dim(
                    aa["lhs"], t - aa["a0"], axis=0, keepdims=False
                ))
                for aa in anchors
            ] + [densify_tile]
            d = jax.lax.switch(sel, branches)
        else:
            d = densify_tile()
        if prefill:
            # this chunk's tiles are the NEXT pair's anchors: keep the
            # freshly scattered rhs tile resident, retiring its re-scatter
            # at that pair's start (pf_t0 is traced, so every prefill
            # chunk shares one compiled program)
            parena = jax.lax.dynamic_update_slice(
                parena, d[None], (t - pf_t0, 0, 0)
            )
        base_t = t * tc
        if not use_pallas:
            cv, ci = carry
        for a in anchors:
            lhs = a["lhs"] if use_pallas else a["lhs"].reshape(sw, u_pad)
            base_a = a["a0"] * tc

            if use_pallas:
                from .pallas_kernels import fused_sym_topk

                crv, cri, ccv, cci = carry
                pvec_ext = jnp.concatenate(
                    [
                        pvec,
                        base_t.astype(jnp.float32).reshape(1),
                        base_a.astype(jnp.float32).reshape(1),
                        t.astype(jnp.float32).reshape(1),
                        a["a0"].astype(jnp.float32).reshape(1),
                        jnp.zeros(2, jnp.float32),
                    ]
                )
                crv_blk = jax.lax.dynamic_slice(
                    crv, (0, base_a), (k_pad_r, sw)
                )
                cri_blk = jax.lax.dynamic_slice(
                    cri, (0, base_a), (k_pad_r, sw)
                )
                # per-anchor-row carry kth, rotated to row-major for the
                # kernel's threshold-adaptive extraction
                rkth_blk = crv_blk[k_pad_r - 1].reshape(sw, 1)
                ccv_blk = jax.lax.dynamic_slice(ccv, (0, base_t), (k_pad_c, tc))
                cci_blk = jax.lax.dynamic_slice(cci, (0, base_t), (k_pad_c, tc))
                rvals, ridx, cvals, cidx = fused_sym_topk(
                    lhs, d, a["xt"], a["xc"], a["xd"],
                    xs["y_t"], xs["y_c"], xs["y_d"],
                    crv_blk, cri_blk, rkth_blk, ccv_blk, cci_blk, pvec_ext,
                    flags=flags, k=k, tc=tc,
                    int8_mode=int_mode, precision=prec,
                    x2=(xs["x_t"], xs["x_c"], xs["x_d"]) if asym else None,
                    y2=(a["y2t"], a["y2c"], a["y2d"]) if asym else None,
                    split_f32=f32x3, interpret=interpret,
                )
                crv = jax.lax.dynamic_update_slice(crv, rvals, (0, base_a))
                cri = jax.lax.dynamic_update_slice(cri, ridx, (0, base_a))
                ccv = jax.lax.dynamic_update_slice(ccv, cvals, (0, base_t))
                cci = jax.lax.dynamic_update_slice(cci, cidx, (0, base_t))
                carry = (crv, cri, ccv, cci)
                continue

            xy = jnp.dot(lhs, d, preferred_element_type=acc, precision=prec)
            if int_mode:
                xy = xy.astype(jnp.float32) * pvec[9]
            candidate = xy != 0.0
            val = splus_epilogue(
                xy, candidate, a["xt"], a["xc"], a["xd"],
                xs["y_t"], xs["y_c"], xs["y_d"], pvec, flags,
            )
            row_tile = a["a0"] + jax.lax.broadcasted_iota(
                jnp.int32, (sw, 1), 0
            ) // tc

            # row side: anchor rows gain tile t's columns (tile(row) <= t)
            rv = jnp.where(row_tile <= t, val, NEG_INF)
            cv_a = jax.lax.dynamic_slice(cv, (base_a, 0), (sw, k))
            ci_a = jax.lax.dynamic_slice(ci, (base_a, 0), (sw, k))
            col_ids = base_t + jax.lax.broadcasted_iota(jnp.int32, (1, tc), 1)
            nv, ni = topk_merge(cv_a, ci_a, rv, col_ids, k)
            cv = jax.lax.dynamic_update_slice(cv, nv, (base_a, 0))
            ci = jax.lax.dynamic_update_slice(ci, ni, (base_a, 0))

            # col side: tile t's rows gain anchor candidates
            # (tile(candidate) < t — strict, so the band is not doubled);
            # with an asymmetric epilogue the delivered value re-runs it
            # with the X/Y roles swapped (xy itself is value-symmetric)
            if asym:
                val_c_t = splus_epilogue(
                    xy.T, candidate.T, xs["x_t"], xs["x_c"], xs["x_d"],
                    a["y2t"], a["y2c"], a["y2d"], pvec, flags,
                )
                colv = jnp.where(row_tile.T < t, val_c_t, NEG_INF)  # (tc, sw)
            else:
                colv = jnp.where(row_tile < t, val, NEG_INF).T  # (tc, sw)
            cv_t = jax.lax.dynamic_slice(cv, (base_t, 0), (tc, k))
            ci_t = jax.lax.dynamic_slice(ci, (base_t, 0), (tc, k))
            cand_ids = base_a + jax.lax.broadcasted_iota(jnp.int32, (1, sw), 1)
            nv2, ni2 = topk_merge(cv_t, ci_t, colv, cand_ids, k)
            cv = jax.lax.dynamic_update_slice(cv, nv2, (base_t, 0))
            ci = jax.lax.dynamic_update_slice(ci, ni2, (base_t, 0))
        if not use_pallas:
            carry = (cv, ci)
        return (carry, parena), None

    (carry, parena), _ = jax.lax.scan(step, (carry, parena), tiles)
    return carry, parena


@partial(jax.jit, static_argnames=("size",))
def _pack_rows(carry_v, carry_i, start, *, size: int):
    """Slice + bitcast-pack finished carry rows for one async d2h."""
    v = jax.lax.dynamic_slice(carry_v, (start, 0), (size, carry_v.shape[1]))
    i = jax.lax.dynamic_slice(carry_i, (start, 0), (size, carry_i.shape[1]))
    return jnp.stack([jax.lax.bitcast_convert_type(v, jnp.int32), i], axis=-1)


@partial(jax.jit, static_argnames=("size", "k"))
def _pack_rows_dual(crv, cri, ccv, cci, start, *, size: int, k: int):
    """Merge finished rows' row-/col-side carry planes, pack for one d2h.

    The planes are (k_pad_*, Cdev); a row's two lists are disjoint by the
    delivery masks, so one top_k over their concatenation is the final
    exact merge for that row."""
    kr, kc = crv.shape[0], ccv.shape[0]
    rv = jax.lax.dynamic_slice(crv, (0, start), (kr, size))
    ri = jax.lax.dynamic_slice(cri, (0, start), (kr, size))
    cv = jax.lax.dynamic_slice(ccv, (0, start), (kc, size))
    ci = jax.lax.dynamic_slice(cci, (0, start), (kc, size))
    all_v = jnp.concatenate([rv, cv], axis=0).T  # (size, kr + kc)
    all_i = jnp.concatenate([ri, ci], axis=0).T
    nv, pos = jax.lax.top_k(all_v, k)
    ni = jnp.take_along_axis(all_i, pos, axis=1)
    return jnp.stack([jax.lax.bitcast_convert_type(nv, jnp.int32), ni], axis=-1)


# ---------------------------------------------------------------------------
# Host prep (shared with the sharded symmetric executor)
# ---------------------------------------------------------------------------


def prep_coo_symmetric(pre: Preprocessed, compute_dtype: str, tc: int,
                       n_tiles_dev: int, u_pad: int, mxu: bool):
    """Heavy matrix-dependent prep: permutation + per-tile COO stacks.

    This is the O(nnz) part of the symmetric prep (~15 s at ML-32M scale)
    and depends ONLY on (matrix2, quantization, tile geometry) — NOT on the
    epilogue vectors — so the executors cache it separately and a sweep of
    different similarities over the same matrix re-stacks nothing.

    Returns (coo: dict[str, np.ndarray], item_map). `coo` carries the
    per-tile scatter triplets (`ru`/`sl`/`vv`, or the MXU-binned
    `ps`/`vv`/`cnt`); `item_map` maps device slot -> original item id
    (C = padding)."""
    C = pre.n_output_cols
    Cdev = n_tiles_dev * tc

    from .executor import _stack_m2_tiles_balanced

    m2_csc = csc_quantized(
        pre.m2, pre.qscale2 if compute_dtype in ("int8", "int4") else None
    )
    col_nnz = np.diff(m2_csc.indptr)
    # round-robin by nnz rank over ALL device tiles: the matmul cost is
    # set by Cdev alone, so spreading items into the padding tiles is
    # free and keeps every tile's scatter bucket near the mean
    rank = np.argsort(-col_nnz, kind="stable")
    tile_lists = [rank[t::n_tiles_dev] for t in range(n_tiles_dev)]
    # shuffle slots WITHIN each tile (any bijection is valid): the rank
    # round-robin otherwise clusters the most popular items at low
    # slots, overloading slot-bin 0 of every tile ~8x in the
    # MXU-scatter binning (measured; see BASELINE.md)
    _rng = np.random.default_rng(0x51A7)
    tile_lists = [lst[_rng.permutation(lst.shape[0])] for lst in tile_lists]
    item_map = np.full(Cdev, C, dtype=np.int64)
    for t, items in enumerate(tile_lists):
        item_map[t * tc : t * tc + items.shape[0]] = items

    t_users, t_slots, t_vals = _stack_m2_tiles_balanced(
        m2_csc, tile_lists, tc, u_pad
    )
    if mxu:
        b_ps, b_vv, b_cnt = _bin_tiles_mxu(
            t_users, t_slots, t_vals, u_pad, tc,
            compute_dtype in ("int8", "int4"),
        )
        coo = {
            "ps": b_ps,  # (nt, UB*SB*L, 1) packed u<<16|s
            "vv": b_vv,
            "cnt": b_cnt,  # (nt, UB*SB) live entries
        }
    else:
        coo = {
            "ru": t_users,  # (n_tiles_dev, p2) user index
            "sl": t_slots,  # (n_tiles_dev, p2) tile slot
            "vv": t_vals,
        }
    return coo, item_map


def cached_prep_symmetric(pre: Preprocessed, compute_dtype: str, tc: int,
                          n_tiles_dev: int, u_pad: int, mxu: bool,
                          key_tag, place_coo, place_vec):
    """Two-level prep cache shared by both symmetric executors.

    The O(nnz) COO stacking caches under a (matrix2, quantization,
    geometry) key; the cheap per-similarity vector layouts nest under that
    entry keyed by their fingerprints, so a sweep of different
    similarities over one matrix re-stacks nothing. `place_coo`/`place_vec`
    turn host dicts into device dicts (plain upload vs mesh-replicated,
    with any padding the executor needs). Returns (dev_coo, vecs,
    item_map)."""
    from .executor import _cache_get, _cache_put, _evict_stale, _fingerprint

    coo_key = (
        "sym_coo", key_tag, pre.fp2,
        pre.qscale2 if compute_dtype in ("int8", "int4") else None,
        compute_dtype in ("int8", "int4"),
        tc, n_tiles_dev, u_pad, mxu,
    )
    cached = _cache_get(coo_key)
    if cached is None:
        _evict_stale("sym_coo", pre.fp2, coo_key)
        coo_host, item_map = prep_coo_symmetric(
            pre, compute_dtype, tc, n_tiles_dev, u_pad, mxu
        )
        dev_coo = place_coo(coo_host)
        vec_cache: dict = {}
        _cache_put(coo_key, (dev_coo, item_map, vec_cache))
    else:
        dev_coo, item_map, vec_cache = cached
    vec_key = (
        _fingerprint(pre.Yt, pre.Yc, pre.Yd),
        _fingerprint(pre.Xt, pre.Xc, pre.Xd),
    )
    vecs = vec_cache.get(vec_key)
    if vecs is None:
        vecs = place_vec(
            prep_vecs_symmetric(pre, item_map, tc, n_tiles_dev)
        )
        if len(vec_cache) >= 16:
            vec_cache.pop(next(iter(vec_cache)))
        vec_cache[vec_key] = vecs
    return dev_coo, vecs, item_map


def prep_vecs_symmetric(pre: Preprocessed, item_map: np.ndarray, tc: int,
                        n_tiles_dev: int):
    """Cheap per-call prep: X/Y epilogue vectors in the tile-slot layout."""
    from .executor import _vec_by_map

    C = pre.n_output_cols
    return {
        "y_t": _vec_by_map(pre.Yt, item_map, C).reshape(n_tiles_dev, tc),
        "y_c": _vec_by_map(pre.Yc, item_map, C).reshape(n_tiles_dev, tc),
        "y_d": _vec_by_map(pre.Yd, item_map, C).reshape(n_tiles_dev, tc),
        "x_t": _vec_by_map(pre.Xt, item_map, C).reshape(n_tiles_dev, tc),
        "x_c": _vec_by_map(pre.Xc, item_map, C).reshape(n_tiles_dev, tc),
        "x_d": _vec_by_map(pre.Xd, item_map, C).reshape(n_tiles_dev, tc),
    }


# ---------------------------------------------------------------------------
# Host orchestration
# ---------------------------------------------------------------------------


def execute_symmetric(
    pre: Preprocessed,
    params: SPlusParams,
    *,
    compute_dtype: str = "auto",
    precision: str = "highest",
    budget_bytes: Optional[int] = None,
    progress=None,
):
    """Self-similarity top-K; returns host (C, k) vals f32 / idx int32."""
    import time as _time_mod

    from .executor import (
        _cache_get,
        _cache_put,
        _fingerprint,
        build_pvec,
        resolve_compute_dtype,
    )

    _t_enter = _time_mod.perf_counter()
    C = pre.n_output_cols
    U = pre.m1.shape[1]
    k = pre.k
    m2 = pre.m2

    compute_dtype, inv_scale = resolve_compute_dtype(compute_dtype, pre)
    budget = budget_bytes if budget_bytes is not None else hbm_budget_bytes()
    # cached device uploads belonging to OTHER matrices (e.g. a scoring
    # stage's panels while re-building a model) occupy real HBM — plan
    # around them instead of on top of them
    from .executor import foreign_cache_bytes

    foreign = foreign_cache_bytes((pre.fp1, pre.fp2))
    if foreign > (budget * 3) // 4:
        # the plan is floored at 25% of the budget; if the foreign entries
        # genuinely occupy HBM the floored plan can still OOM — surface it
        # so build-then-score OOMs are diagnosable (clear via
        # similaripy_tpu.engine.executor.clear_caches())
        import warnings

        warnings.warn(
            f"device cache holds {foreign / 2**30:.1f} GiB of other "
            f"matrices' uploads (> 75% of the {budget / 2**30:.1f} GiB HBM "
            "budget); planning with a floored 25% budget — call "
            "similaripy_tpu.clear_caches() if this call OOMs",
            RuntimeWarning,
            stacklevel=2,
        )
    budget = max(budget // 4, budget - foreign)

    # fused dual-sided kernel (pallas_kernels.fused_sym_topk): f32-HIGH
    # runs it in split-bf16x3 mode (XLA-HIGH accuracy at ~2x Mosaic's
    # HIGHEST, fusion kept); very large k falls back to the sort-based
    # top_k (one extraction pass per kept value otherwise)
    from .executor import _pallas_enabled

    use_pallas = _pallas_enabled()
    f32x3 = (
        use_pallas and compute_dtype == "float32" and precision == "high"
    )
    if f32x3:
        # self-similarity: both operands are the same matrix. When its
        # values are exactly bf16-representable, a single plain-bf16 phase
        # already IS f32-HIGH (bf16 products are exact in the f32
        # accumulator) — ride the bfloat16 mode instead of 3 split phases
        from .executor import _bf16_exact

        if _bf16_exact(pre.fp2, m2.data):
            compute_dtype = "bfloat16"
            f32x3 = False
    tc, gt, u_pad, dual = _plan(C, U, m2.nnz, compute_dtype, budget,
                                use_pallas)
    k_pad = k
    if use_pallas:
        from .pallas_kernels import KB

        # both carry planes must be k deep (they accumulate across the
        # whole sweep schedule — see pallas_kernels.sym_k_pads)
        k_pad = _round_up(min(k, C), 8)
        # cutovers, in order:
        #   1. k_pad > 1024: one extraction pass per kept value — beyond
        #      ~1024 the XLA sort-based top_k wins (same cutover as the
        #      general executor). Re-plan for the XLA path.
        #   2. k_pad*tc over the hardware-measured scoped-VMEM boundary
        #      (v5e, SYM_TM=512: the col-side carry blocks cost
        #      ~8*k_pad*tc B on a ~93 MB base; k_pad*tc = 1<<20 failed
        #      remote compile at 117.95M/116M, 768*1024 keeps >= 4 MB of
        #      headroom): SHRINK THE TILE WIDTH instead of falling back —
        #      a narrower fused tile (more scatter calls, same total nnz)
        #      beats the XLA chain by far (round 3: k=256 previously fell
        #      back for every tc=4096 plan since 256*4096 > 768*1024).
        if k_pad > 1024:
            use_pallas = False
            k_pad = k
            tc, gt, u_pad, dual = _plan(C, U, m2.nnz, compute_dtype, budget,
                                        False)
        else:
            if k_pad * tc > 768 * 1024:
                tc_fit = max(512, (768 * 1024 // k_pad) // 128 * 128)
                tc, gt, u_pad, dual = _plan(
                    C, U, m2.nnz, compute_dtype, budget, True,
                    tc_max=tc_fit,
                )
            u_pad = _round_up(u_pad, KB)
    # kernel-side k: no row has more than C candidates, so deeper planes
    # would only pad; the pack emits min(k, both planes) columns and the
    # host pads the (C, k) output with the XLA path's NEG_INF sentinel
    k_kern = min(k, C) if use_pallas else k

    # MXU-scatter mode (opt-in experiment): tiles densify via one-hot
    # matmuls over (512 user x 512 slot) bins. Exact for the int modes and
    # for bf16 tiles, and correct on real v5e, but MEASURED SLOWER than
    # the XLA scatter it replaces (5,022 vs 5,644 items/s on the headline
    # bench): per-bin grid-step overhead exceeds the matmul savings. Kept
    # in-tree, tested in interpret mode, off by default.
    mxu = (
        use_pallas
        and compute_dtype in ("int8", "int4", "bfloat16")
        and os.environ.get("SIMILARIPY_TPU_MXU_SCATTER", "0") in ("1", "true")
    )
    if mxu:
        from .pallas_kernels import SC, UBR

        mxu = tc % SC == 0  # small tiles keep the XLA scatter
    if mxu:
        u_pad = _round_up(u_pad, math.lcm(KB, UBR))

    n_tiles = math.ceil(C / tc)
    n_groups = math.ceil(n_tiles / gt)
    n_tiles_dev = n_groups * gt
    Cdev = n_tiles_dev * tc
    sw = gt * tc

    # ---- host prep: two-level cache (see cached_prep_symmetric) ----
    def place_coo(coo_host):
        dev_coo = {k2: jnp.asarray(v) for k2, v in coo_host.items()}
        dev_coo["tid"] = jnp.arange(n_tiles_dev, dtype=jnp.int32)
        return dev_coo

    def place_vec(vec_host):
        return {k2: jnp.asarray(v) for k2, v in vec_host.items()}

    dev_coo, vecs, item_map = cached_prep_symmetric(
        pre, compute_dtype, tc, n_tiles_dev, u_pad, mxu,
        key_tag="1dev", place_coo=place_coo, place_vec=place_vec,
    )
    dev = {**dev_coo, **vecs}

    pvec = jnp.asarray(build_pvec(params, inv_scale))
    flags = params.static_flags()
    asym = not epilogue_is_symmetric(pre, params)

    if use_pallas:
        from .pallas_kernels import sym_k_pads

        k_pad_r, k_pad_c = sym_k_pads(k_kern, tc, sw)
        carry = (
            jnp.full((k_pad_r, Cdev), NEG_INF, jnp.float32),
            jnp.zeros((k_pad_r, Cdev), jnp.int32),
            jnp.full((k_pad_c, Cdev), NEG_INF, jnp.float32),
            jnp.zeros((k_pad_c, Cdev), jnp.int32),
        )
    else:
        carry = (
            jnp.full((Cdev, k), NEG_INF, jnp.float32),
            jnp.zeros((Cdev, k), jnp.int32),
        )

    timing_env = os.environ.get("SIMILARIPY_TPU_TIMING", "0")
    timing = timing_env not in ("", "0")
    # level 2: force a device sync after every anchor densify / sweep chunk
    # so the lap times isolate scatter vs kernel cost (distorts pipelining —
    # diagnosis only)
    timing_sync = timing_env == "2"
    if timing:
        import sys
        import time as _time

        print(
            f"# sym plan: tc={tc} gt={gt} u_pad={u_pad} n_tiles={n_tiles_dev} "
            f"n_groups={n_groups} dual={dual} dtype={compute_dtype} "
            f"pallas={use_pallas} mxu={mxu} k_pad={k_pad} "
            f"prep: {_time.perf_counter() - _t_enter:.2f}s",
            file=sys.stderr, flush=True,
        )
        _t_mark = _time.perf_counter()

        def _lap(label, sync=None):
            nonlocal _t_mark
            if sync is not None:
                np.asarray(jax.tree.leaves(sync)[0].ravel()[:1])
            now = _time.perf_counter()
            print(f"# {label}: {now - _t_mark:.2f}s", file=sys.stderr,
                  flush=True)
            _t_mark = now

    def fresh_arena():
        """Zeros matching the densify output, so the FIRST pair also runs
        the donated-arena program: only the `_into` variants ever compile
        (one remote compile instead of two), and the buffer becomes the
        pair's resident anchor stack — nothing is wasted."""
        if use_pallas and f32x3:
            return jnp.zeros((gt, 2 * u_pad, tc), jnp.bfloat16)
        shape = (gt, u_pad, tc) if use_pallas else (gt, tc, u_pad)
        return jnp.zeros(shape, _cdt_store)

    def make_anchor(a: int, reuse=None):
        t0, t1 = a * gt, (a + 1) * gt
        arena = reuse if reuse is not None else fresh_arena()
        if mxu:
            lhs = _densify_anchor_mxu_into(
                arena, dev["ps"][t0:t1], dev["vv"][t0:t1], dev["cnt"][t0:t1],
                tc=tc, u_pad=u_pad, compute_dtype=compute_dtype,
            )
        elif use_pallas:
            lhs = _densify_rhs_stack_into(
                arena, dev["ru"][t0:t1], dev["sl"][t0:t1], dev["vv"][t0:t1],
                tc=tc, u_pad=u_pad, compute_dtype=compute_dtype, split=f32x3,
            )
        else:
            lhs = _densify_lhs_into(
                arena, dev["sl"][t0:t1], dev["ru"][t0:t1], dev["vv"][t0:t1],
                tc=tc, u_pad=u_pad, compute_dtype=compute_dtype,
            )
        if timing_sync:
            _lap(f"  anchor {a} densify ({gt} tiles)", sync=lhs)
        return {
            "lhs": lhs,
            "xt": dev["x_t"][t0:t1].reshape(sw),
            "xc": dev["x_c"][t0:t1].reshape(sw),
            "xd": dev["x_d"][t0:t1].reshape(sw),
            "y2t": dev["y_t"][t0:t1].reshape(sw),
            "y2c": dev["y_c"][t0:t1].reshape(sw),
            "y2d": dev["y_d"][t0:t1].reshape(sw),
            "a0": jnp.int32(t0),
        }

    chunk_names = (
        ("tid", "ps", "vv", "cnt", "y_t", "y_c", "y_d", "x_t", "x_c", "x_d")
        if mxu
        else ("tid", "ru", "sl", "vv", "y_t", "y_c", "y_d",
              "x_t", "x_c", "x_d")
    )

    # ---- anchor prefill (opt-in experiment): keep the NEXT pair's ----
    # ---- anchor tiles from the current sweep instead of re-scattering ----
    # Retires 15 of 48 scatters at ML-32M geometry and the sweeps DO get
    # faster, but peak residency grows to 4 anchor stacks (~13 GB) and the
    # measured end-to-end result is WORSE (5,774 vs 7,962 items/s): with
    # HBM nearly full, the packed d2h readbacks stall 1.6-4.8 s/round
    # through the tunnel instead of overlapping. Off by default; gated on
    # the measured device capacity when enabled.
    from .executor import compute_cast as _cc

    _cdt_store = _cc(compute_dtype)[0]
    isz = {"int8": 1, "int4": 1, "bfloat16": 2}.get(compute_dtype, 4)
    _cap = float(os.environ.get("SIMILARIPY_TPU_HBM_CAP_GB", "15")) * 2**30
    _lean = (
        m2.nnz * 4 * 3 * 1.3  # device COO (or binned) arrays
        + u_pad * tc * (2 + isz)  # scatter transient + cast
        + (1 << 29)  # carries, snapshots, slack
    )
    prefill_ok = (
        use_pallas
        and not f32x3  # arenas hold un-split tiles; keep the modes apart
        and os.environ.get("SIMILARIPY_TPU_SYM_PREFILL", "0") in ("1", "true")
        and 4 * gt * tc * u_pad * isz + _lean <= _cap
    )

    _dummy = [jnp.zeros((1,), jnp.int8)]

    def sweep(anchors, groups, c0: int, c1: int, pf_map=None, filled=None):
        nonlocal carry
        for s in range(c0, c1, gt):
            g = s // gt
            ai = groups.index(g) if use_pallas and g in groups else -1
            pf = pf_map is not None and g in pf_map
            arena = pf_map.pop(g) if pf else _dummy[0]
            chunk = {name: dev[name][s : s + gt] for name in chunk_names}
            carry, arena = _sweep_chunk(
                tuple(anchors), chunk, carry, arena,
                jnp.int32(ai if ai >= 0 else len(anchors)), pvec,
                flags=flags, k=k_kern, gt=gt, tc=tc, u_pad=u_pad,
                cs=gt, n_anchors=len(anchors),
                compute_dtype=compute_dtype, precision=precision,
                use_pallas=use_pallas, mxu=mxu,
                prefill=pf, asym=asym, f32x3=f32x3,
            )
            if pf:
                filled[g] = arena
            else:
                _dummy[0] = arena
            if timing_sync:
                _lap(
                    f"  chunk t={s}..{s + gt - 1} x{len(anchors)}a"
                    + (" pf" if pf else ""),
                    sync=carry[0],
                )

    # anchor pairs share one inner sweep (halves the rhs re-scatter);
    # finished pairs stream their packed rows host-ward asynchronously.
    # Each pair's anchors are densified INTO the previous pair's donated
    # lhs buffers, so no device barrier is needed between pairs (peak HBM
    # stays at one pair's working set) and the host runs one pair ahead;
    # materializing the previous pair's packed readback throttles the
    # pipeline to depth 1 and keeps progress ticks honest.
    pair_list = [
        (a, a + 1) if dual and a + 1 < n_groups else (a,)
        for a in range(0, n_groups, 2 if dual else 1)
    ]
    snapshots = []
    done_rows = 0
    retired: list = []  # previous pair's lhs buffers, ready for donation
    filled_prev: dict = {}  # group -> prefilled anchor stack
    prev_packed: list = []  # previous pair's packed rows (readback throttle)
    for pi, pair in enumerate(pair_list):
        anchors = []
        for a in pair:
            if a in filled_prev:
                t0a = a * gt
                anchors.append({
                    "lhs": filled_prev.pop(a),
                    "xt": dev["x_t"][t0a:t0a + gt].reshape(sw),
                    "xc": dev["x_c"][t0a:t0a + gt].reshape(sw),
                    "xd": dev["x_d"][t0a:t0a + gt].reshape(sw),
                    "y2t": dev["y_t"][t0a:t0a + gt].reshape(sw),
                    "y2c": dev["y_c"][t0a:t0a + gt].reshape(sw),
                    "y2d": dev["y_d"][t0a:t0a + gt].reshape(sw),
                    "a0": jnp.int32(t0a),
                })
                if timing_sync:
                    _lap(f"  anchor {a} prefilled")
            else:
                anchors.append(
                    make_anchor(a, reuse=retired.pop() if retired else None)
                )
        a0 = pair[0] * gt
        # prefill targets for the next pair's anchors, donated from the
        # retired arenas when available (fresh zeros otherwise)
        pf_map: dict = {}
        if prefill_ok and pi + 1 < len(pair_list):
            for g in pair_list[pi + 1]:
                pf_map[g] = (
                    retired.pop()
                    if retired
                    else jnp.zeros((gt, u_pad, tc), _cdt_store)
                )
        retired = []
        filled: dict = {}
        if len(pair) == 2:
            # band tiles: first anchor only
            sweep(anchors[:1], [pair[0]], a0, pair[1] * gt)
            sweep(anchors, list(pair), pair[1] * gt, n_tiles_dev,
                  pf_map, filled)
        else:
            sweep(anchors, list(pair), a0, n_tiles_dev, pf_map, filled)
        filled_prev = filled
        # pack per anchor GROUP (size sw, constant): a dual pair packs as
        # two calls of identical shape, so the whole run compiles ONE pack
        # program instead of one per pair width (remote compiles are
        # minutes each)
        pair_packed = []
        for g_a in pair:
            start_rows = g_a * sw
            if use_pallas:
                packed = _pack_rows_dual(
                    *carry, jnp.int32(start_rows), size=sw,
                    k=min(k, k_pad_r + k_pad_c),
                )
            else:
                packed = _pack_rows(*carry, jnp.int32(start_rows), size=sw)
            try:
                packed.copy_to_host_async()
            except Exception:
                pass  # backend without async copies: np.asarray still works
            pair_packed.append(packed)
            snapshots.append((start_rows, sw, packed))
        retired = [a["lhs"] for a in anchors]
        for a in anchors:
            a["lhs"] = None  # host must not touch donated-away buffers
        if pi > 0:
            # materialize the PREVIOUS pair's packed rows: completes its d2h
            # under this pair's enqueued compute and bounds host run-ahead
            for prev in prev_packed:
                np.asarray(prev)
        prev_packed = pair_packed
        if timing:
            _lap(f"pair {pair} sweep")
        if progress is not None and pi > 0:
            # tick the pair whose readback just materialized (one behind)
            done = min(C, ((pair_list[pi - 1][-1] + 1) * sw * C) // Cdev)
            if done > done_rows:
                progress.update(done - done_rows)
                done_rows = done

    # collect (transfers already in flight), map back to original item ids
    k_out = min(k, k_pad_r + k_pad_c) if use_pallas else k
    if k_out >= k:
        # every cell is written below (all C items appear in exactly one
        # tile slot); skip the 0.25s NEG_INF fill of the (C, k) buffers
        out_vals = np.empty((C, k), np.float32)
        out_idx = np.empty((C, k), np.int32)
    else:
        out_vals = np.full((C, k), NEG_INF, np.float32)
        out_idx = np.zeros((C, k), np.int32)
    item_map32 = item_map.astype(np.int32)  # C < 2**31 by validation
    for start, size, packed in snapshots:
        arr = np.asarray(packed)  # (size, k_out, 2) int32, contiguous
        vals = arr.view(np.float32)[..., 0]
        idx = arr[..., 1]
        seg = item_map[start : start + size]
        real = seg < C
        out_vals[seg[real], :k_out] = vals[real]
        out_idx[seg[real], :k_out] = idx[real]
    if timing:
        _lap("output readback")
    if progress is not None and done_rows < C:
        progress.update(C - done_rows)

    out_idx = item_map32[out_idx]
    return out_vals, out_idx
