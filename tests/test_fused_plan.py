"""Unit tests for the fused-path group planner (executor.plan_fused_groups).

The tc search is deterministic host logic; these tests pin its choices
at the geometries that matter (ML-32M scoring) and its budget safety.
"""

import math
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from similaripy_tpu.engine.executor import plan_fused_groups  # noqa: E402

ML32M_SCORING = dict(
    C=84_432, u_pad=84_480, trp=2048, k_pad=16,
    m1_nnz=31_468_483, m2_nnz=8_443_200, sel_nnz=31_468_483,
    m1_bytes=2048 * 84_480 * 2,  # bf16 'rhs' panel
    tile_item=4,  # [hi; lo] split stack
    budget=12 << 30, foreign=0, n_panels=99,
    f32x3="rhs", compute_dtype="float32", tm=512,
)


def test_scoring_geometry_picks_exact_tiling():
    """At ML-32M scoring geometry the search lands on tc=4224: 20 tiles
    exactly (84432 <= 20*4224, 0.06% column padding), no empty padded
    tiles, 4 groups instead of the fixed-2048 plan's 44-tile layout."""
    tc, n_tiles, g_tiles, n_groups = plan_fused_groups(
        tc=2048, search=True, max_tc=4480, **ML32M_SCORING
    )
    assert tc == 4224
    assert n_tiles == 20 and n_tiles * tc >= 84_432
    assert n_groups * g_tiles == n_tiles  # zero padded tiles
    assert n_groups <= 5


def test_search_never_exceeds_budget():
    for budget_gb in (8, 10, 12, 16):
        args = dict(ML32M_SCORING, budget=budget_gb << 30)
        tc, n_tiles, g_tiles, n_groups = plan_fused_groups(
            tc=2048, search=True, max_tc=4480, **args
        )
        # the resident d_stack must fit what the budget formula allows
        tile_b = args["u_pad"] * tc * args["tile_item"]
        assert g_tiles * tile_b <= args["budget"] * 0.85
        assert n_groups * g_tiles >= math.ceil(args["C"] / tc)


def test_no_search_keeps_fixed_tc():
    tc, n_tiles, g_tiles, n_groups = plan_fused_groups(
        tc=2048, search=False, max_tc=4480, **ML32M_SCORING
    )
    assert tc == 2048
    assert n_tiles == n_groups * g_tiles >= math.ceil(84_432 / 2048)


def test_small_catalog_single_candidate():
    args = dict(ML32M_SCORING, C=500, u_pad=1536, sel_nnz=0,
                m1_nnz=10_000, m2_nnz=5_000, n_panels=1)
    tc, n_tiles, g_tiles, n_groups = plan_fused_groups(
        tc=512, search=True, max_tc=4480, **args
    )
    assert tc == 512 and n_tiles == 1 and n_groups == 1


def test_search_is_deterministic():
    a = plan_fused_groups(tc=2048, search=True, max_tc=4480, **ML32M_SCORING)
    b = plan_fused_groups(tc=2048, search=True, max_tc=4480, **ML32M_SCORING)
    assert a == b


def test_tiny_budget_degrades_to_single_tile_groups():
    """Starved budgets must still produce a legal plan (g=1), never a
    zero or negative group size."""
    args = dict(ML32M_SCORING, budget=1 << 30)  # 1 GiB: reserve alone exceeds it
    tc, n_tiles, g_tiles, n_groups = plan_fused_groups(
        tc=2048, search=True, max_tc=4480, **args
    )
    assert g_tiles >= 1 and n_groups * g_tiles == n_tiles
    assert n_tiles * tc >= args["C"]


def test_deep_carry_vmem_cutover_narrows_tile():
    """The executor's k_pad-aware max_tc clamp (mirroring symmetric.py's
    k_pad*tc <= 768*1024 scoped-VMEM boundary) keeps the searched width
    legal for deep carries."""
    for k_pad in (8, 104, 256, 1024):
        max_tc = max(128, min(4480, ((768 * 1024 // k_pad) // 128) * 128))
        assert k_pad * max_tc <= 768 * 1024 or max_tc == 128
        args = dict(ML32M_SCORING, k_pad=k_pad)
        tc, n_tiles, g_tiles, n_groups = plan_fused_groups(
            tc=min(2048, max_tc), search=True, max_tc=max_tc, **args
        )
        assert tc <= max_tc
        assert n_groups * g_tiles == n_tiles >= 1
