"""Symmetric (self-similarity) executor vs the general path.

The general executor is the oracle: SIMILARIPY_TPU_SYMMETRIC=0 forces the
same call down the general path, and the two must agree exactly (int8) or
to float tolerance. Small SYM_TC/SYM_GT overrides shrink the tiles so tiny
matrices exercise the full triangle scheduling: multiple tiles, multiple
anchors, dual-anchor pairing, band masks, and the col-side transposed
merge.
"""

import numpy as np
import pytest
import scipy.sparse as sp

import similaripy_tpu as sim
from oracles import check_sum, top_k
from similaripy_tpu.engine import preprocess as prep_mod
from similaripy_tpu.engine.params import SPlusParams
from similaripy_tpu.engine.symmetric import symmetric_eligible


@pytest.fixture(autouse=True)
def _clear_caches():
    sim.clear_caches()
    yield
    sim.clear_caches()


def _rand(n, m, density=0.15, seed=3, integral=True):
    rng = np.random.default_rng(seed)
    a = sp.random_array((n, m), density=density, format="csr",
                        dtype=np.float32, random_state=rng)
    if integral:
        a.data[:] = np.round(a.data * 4) + 1.0
    return a


def _both_paths(fn, monkeypatch, *args, **kwargs):
    """Run a similarity through the symmetric and the general path."""
    got = fn(*args, **kwargs)
    monkeypatch.setenv("SIMILARIPY_TPU_SYMMETRIC", "0")
    sim.clear_caches()
    ref = fn(*args, **kwargs)
    monkeypatch.delenv("SIMILARIPY_TPU_SYMMETRIC")
    return got, ref


@pytest.mark.parametrize("tc,gt", [("128", "1"), ("128", "2"), ("256", "3")])
def test_multi_tile_triangle(monkeypatch, tc, gt):
    """Many tiles/anchors on a small matrix: the triangle scheduling, band
    masks and dual pairing must reproduce the general path exactly."""
    monkeypatch.setenv("SIMILARIPY_TPU_SYM_TC", tc)
    monkeypatch.setenv("SIMILARIPY_TPU_SYM_GT", gt)
    m = _rand(70, 900, seed=11).T.tocsr()  # 900 items x 70 users
    got, ref = _both_paths(sim.cosine, monkeypatch, m, k=17, verbose=False)
    np.testing.assert_allclose(check_sum(got), check_sum(ref), rtol=1e-6)


def test_single_anchor_mode(monkeypatch):
    monkeypatch.setenv("SIMILARIPY_TPU_SYM_TC", "128")
    monkeypatch.setenv("SIMILARIPY_TPU_SYM_GT", "2")
    monkeypatch.setenv("SIMILARIPY_TPU_SYM_DUAL", "0")
    m = _rand(60, 700, seed=5).T.tocsr()
    got, ref = _both_paths(sim.cosine, monkeypatch, m, k=9, verbose=False)
    np.testing.assert_allclose(check_sum(got), check_sum(ref), rtol=1e-6)


@pytest.mark.parametrize(
    "call",
    [
        lambda m, **kw: sim.dot_product(m, **kw),
        lambda m, **kw: sim.cosine(m, shrink=5.0, **kw),
        lambda m, **kw: sim.asymmetric_cosine(m, alpha=0.5, **kw),
        lambda m, **kw: sim.jaccard(m, **kw),
        lambda m, **kw: sim.dice(m, **kw),
        lambda m, **kw: sim.tversky(m, alpha=0.7, beta=0.7, **kw),
        lambda m, **kw: sim.s_plus(m, l1=0.4, l2=0.6, t1=0.8, t2=0.8,
                                   c1=0.5, c2=0.5, **kw),
    ],
)
def test_similarities_match_general(monkeypatch, call):
    monkeypatch.setenv("SIMILARIPY_TPU_SYM_TC", "128")
    monkeypatch.setenv("SIMILARIPY_TPU_SYM_GT", "2")
    m = _rand(50, 420, seed=7).T.tocsr()
    got, ref = _both_paths(call, monkeypatch, m, k=11, verbose=False)
    np.testing.assert_allclose(check_sum(got), check_sum(ref), rtol=1e-5)


def test_cosine_oracle_direct(monkeypatch):
    """Against the scipy oracle, not just the general path."""
    monkeypatch.setenv("SIMILARIPY_TPU_SYM_TC", "128")
    monkeypatch.setenv("SIMILARIPY_TPU_SYM_GT", "2")
    m = _rand(40, 300, seed=13).T.tocsr()
    got = sim.cosine(m, k=10, verbose=False)
    sq = m.multiply(m)
    norms = np.sqrt(np.asarray(sq.sum(axis=1)).ravel())
    denom = np.outer(norms, norms)
    dense = np.asarray((m @ m.T).todense())
    with np.errstate(divide="ignore", invalid="ignore"):
        cos = np.where((denom > 0) & (dense != 0), dense / denom, 0.0)
    ref = top_k(sp.csr_array(cos), 10)
    np.testing.assert_allclose(check_sum(got), check_sum(ref), rtol=1e-5)


def test_no_duplicate_neighbors(monkeypatch):
    """The exactly-once delivery proof, empirically: a double-counted
    band pair would surface as a repeated column id within a row."""
    monkeypatch.setenv("SIMILARIPY_TPU_SYM_TC", "128")
    monkeypatch.setenv("SIMILARIPY_TPU_SYM_GT", "2")
    m = _rand(80, 640, density=0.4, seed=17).T.tocsr()
    got = sim.dot_product(m, k=30, verbose=False).tocsr()
    for r in range(got.shape[0]):
        cols = got.indices[got.indptr[r] : got.indptr[r + 1]]
        assert len(set(cols.tolist())) == cols.shape[0], f"row {r} has dupes"


def test_float32_and_threshold(monkeypatch):
    monkeypatch.setenv("SIMILARIPY_TPU_SYM_TC", "128")
    monkeypatch.setenv("SIMILARIPY_TPU_SYM_GT", "2")
    m = _rand(45, 500, seed=19, integral=False).T.tocsr()
    got, ref = _both_paths(
        sim.cosine, monkeypatch, m, k=8, threshold=0.2,
        compute_dtype="float32", verbose=False,
    )
    np.testing.assert_allclose(check_sum(got), check_sum(ref), rtol=1e-5)


def test_binary_and_edge_k(monkeypatch):
    monkeypatch.setenv("SIMILARIPY_TPU_SYM_TC", "128")
    m = _rand(30, 280, seed=23).T.tocsr()
    got, ref = _both_paths(
        sim.jaccard, monkeypatch, m, k=1, binary=True, verbose=False
    )
    np.testing.assert_allclose(check_sum(got), check_sum(ref), rtol=1e-6)
    got, ref = _both_paths(
        sim.jaccard, monkeypatch, m, k=10_000, binary=True, verbose=False
    )
    np.testing.assert_allclose(check_sum(got), check_sum(ref), rtol=1e-6)


def test_trailing_empty_rows(monkeypatch):
    """Self-similarity where the last item rows are empty (ADVICE r1
    regression shape) through the symmetric path."""
    monkeypatch.setenv("SIMILARIPY_TPU_SYM_TC", "128")
    m = _rand(35, 260, seed=29).T.tocsr().tolil()
    m[258] = 0
    m[259] = 0
    m = sp.csr_array(m.tocsr())
    m.eliminate_zeros()
    got, ref = _both_paths(sim.cosine, monkeypatch, m, k=7, verbose=False)
    np.testing.assert_allclose(check_sum(got), check_sum(ref), rtol=1e-6)
    row = got.tocsr()[[5], :].toarray().ravel()
    assert abs(row[5] - 1.0) < 1e-5  # self-similarity on the diagonal


def _pre(m, **kw):
    return prep_mod.preprocess(m, m.T, self_similar=True, **kw)


def test_eligibility_gates():
    m = _rand(20, 60, seed=31)
    params = SPlusParams(a1=1, l1=0, l2=1, l3=0, t1=1, t2=1,
                         stabilized_shrink=0, bayesian_shrink=0, threshold=0)
    pre = _pre(m, l2=1.0)
    assert symmetric_eligible(pre, params, 0)
    # explicit block size -> general path (reference block_size semantics)
    assert not symmetric_eligible(pre, params, 64)
    assert not symmetric_eligible(pre, params, None)
    # target subset -> general path
    pre_t = prep_mod.preprocess(m, m.T, l2=1.0, target_rows=[1, 2],
                                self_similar=True)
    assert not symmetric_eligible(pre_t, params, 0)
    # column selectors -> general path
    pre_f = prep_mod.preprocess(m, m.T, l2=1.0, filter_cols=[3],
                                self_similar=True)
    assert not symmetric_eligible(pre_f, params, 0)
    # not a self-similarity call
    pre_x = prep_mod.preprocess(m, m.T, l2=1.0)
    assert not symmetric_eligible(pre_x, params, 0)
    # asymmetric EPILOGUES are now eligible: xy stays value-symmetric and
    # the executor re-runs the epilogue with swapped X/Y roles for the
    # col-side delivery (tversky t1!=t2, asymmetric cosine, one-sided
    # depop); correctness is pinned by test_asym_epilogue_* below
    params_asym = SPlusParams(a1=1, l1=1, l2=0, l3=0, t1=0.3, t2=0.9,
                              stabilized_shrink=0, bayesian_shrink=0,
                              threshold=0)
    pre_l1 = _pre(m, l1=1.0)
    assert symmetric_eligible(pre_l1, params_asym, 0)
    from similaripy_tpu.engine.symmetric import epilogue_is_symmetric
    assert not epilogue_is_symmetric(pre_l1, params_asym)
    pre_ac = _pre(m, l2=1.0, c1=0.2, c2=0.8)
    assert symmetric_eligible(pre_ac, params, 0)
    assert not epilogue_is_symmetric(pre_ac, params)


def test_asym_epilogue_tversky(monkeypatch):
    """Asymmetric tversky rides the symmetric path (swapped col-side
    epilogue) and must match the general path exactly."""
    monkeypatch.setenv("SIMILARIPY_TPU_SYM_TC", "128")
    monkeypatch.setenv("SIMILARIPY_TPU_SYM_GT", "2")
    m = _rand(40, 700, seed=37).T.tocsr()  # several tiles + pairs
    got, ref = _both_paths(
        sim.tversky, monkeypatch, m, alpha=0.2, beta=0.9, k=9, verbose=False
    )
    np.testing.assert_allclose(check_sum(got), check_sum(ref), rtol=1e-6)


def test_asym_epilogue_tversky_pallas(monkeypatch):
    monkeypatch.setenv("SIMILARIPY_TPU_USE_PALLAS", "1")
    monkeypatch.setenv("SIMILARIPY_TPU_SYM_TC", "128")
    monkeypatch.setenv("SIMILARIPY_TPU_SYM_GT", "2")
    m = _rand(40, 700, seed=37).T.tocsr()
    got, ref = _both_paths(
        sim.tversky, monkeypatch, m, alpha=0.2, beta=0.9, k=9, verbose=False
    )
    np.testing.assert_allclose(check_sum(got), check_sum(ref), rtol=1e-6)


def test_asym_epilogue_asymmetric_cosine(monkeypatch):
    monkeypatch.setenv("SIMILARIPY_TPU_SYM_TC", "128")
    monkeypatch.setenv("SIMILARIPY_TPU_SYM_GT", "1")
    m = _rand(50, 600, seed=41).T.tocsr()
    got, ref = _both_paths(
        sim.asymmetric_cosine, monkeypatch, m, alpha=0.2, k=11, verbose=False
    )
    np.testing.assert_allclose(check_sum(got), check_sum(ref), rtol=1e-6)


def test_asym_epilogue_asymmetric_cosine_pallas(monkeypatch):
    monkeypatch.setenv("SIMILARIPY_TPU_USE_PALLAS", "1")
    monkeypatch.setenv("SIMILARIPY_TPU_SYM_TC", "128")
    monkeypatch.setenv("SIMILARIPY_TPU_SYM_GT", "1")
    m = _rand(50, 600, seed=41).T.tocsr()
    got, ref = _both_paths(
        sim.asymmetric_cosine, monkeypatch, m, alpha=0.2, k=11, verbose=False
    )
    np.testing.assert_allclose(check_sum(got), check_sum(ref), rtol=1e-6)


def test_lazy_transpose_matches_explicit_matrix2(monkeypatch):
    """matrix2=None keeps m1.T as a zero-copy CSC; the result must equal
    the explicit matrix2=m.T call that runs the general two-matrix path."""
    monkeypatch.setenv("SIMILARIPY_TPU_SYM_TC", "128")
    m = _rand(40, 300, seed=43).T.tocsr()
    lazy = sim.cosine(m, k=8, verbose=False)
    explicit = sim.cosine(m, m.T.tocsr(), k=8, verbose=False)
    np.testing.assert_allclose(check_sum(lazy), check_sum(explicit), rtol=1e-6)


def test_inputs_never_mutated(monkeypatch):
    """The int8 path snaps data to the quantization grid on a copy; the
    caller's arrays (shared with the lazy transpose) must stay untouched,
    and a later float32 call must not see quantized leftovers."""
    m = _rand(40, 300, seed=47, integral=False).T.tocsr()
    data_before = m.data.copy()

    sim.cosine(m, k=6, compute_dtype="bfloat16", verbose=False)
    f32_first = sim.cosine(m, k=6, compute_dtype="float32", verbose=False)
    np.testing.assert_array_equal(m.data, data_before)

    sim.clear_caches()
    f32_fresh = sim.cosine(m, k=6, compute_dtype="float32", verbose=False)
    np.testing.assert_allclose(
        check_sum(f32_first), check_sum(f32_fresh), rtol=0
    )


def test_quantized_call_does_not_poison_cached_m2(monkeypatch):
    """int8 call then float32 call on the SAME cached matrices: the int8
    quantization must not leak into the cached m2 (csc_quantized copies)."""
    monkeypatch.setenv("SIMILARIPY_TPU_SYM_TC", "128")
    m = _rand(40, 300, seed=53).T.tocsr()  # integral -> auto int8
    sim.cosine(m, k=6, verbose=False)  # arms + caches the int8 artifacts
    warm = sim.cosine(m, k=6, compute_dtype="float32", verbose=False)
    sim.clear_caches()
    cold = sim.cosine(m, k=6, compute_dtype="float32", verbose=False)
    np.testing.assert_allclose(check_sum(warm), check_sum(cold), rtol=0)


def test_target_rows_subset_matches(monkeypatch):
    monkeypatch.setenv("SIMILARIPY_TPU_SYM_TC", "128")
    m = _rand(40, 200, seed=41).T.tocsr()
    full = sim.cosine(m, k=9, verbose=False).tocsr()
    sub = sim.cosine(m, k=9, target_rows=[4, 9, 77], verbose=False).tocsr()
    for r in (4, 9, 77):
        np.testing.assert_allclose(
            sub[[r], :].toarray(), full[[r], :].toarray(), rtol=1e-6
        )


def test_mxu_scatter_pipeline(monkeypatch):
    """Full symmetric pipeline through the MXU-scatter path (tc=512 bins,
    2-D binning, 3-D anchors, dot_general kernel) vs the general path."""
    monkeypatch.setenv("SIMILARIPY_TPU_USE_PALLAS", "1")
    monkeypatch.setenv("SIMILARIPY_TPU_MXU_SCATTER", "1")
    monkeypatch.setenv("SIMILARIPY_TPU_SYM_TC", "512")
    monkeypatch.setenv("SIMILARIPY_TPU_SYM_GT", "1")
    m = _rand(60, 1100, density=0.08, seed=23).T.tocsr()  # 1100 items
    got, ref = _both_paths(sim.cosine, monkeypatch, m, k=15, verbose=False)
    np.testing.assert_allclose(check_sum(got), check_sum(ref), rtol=1e-6)


def test_mxu_scatter_pipeline_dual_anchor(monkeypatch):
    monkeypatch.setenv("SIMILARIPY_TPU_USE_PALLAS", "1")
    monkeypatch.setenv("SIMILARIPY_TPU_MXU_SCATTER", "1")
    monkeypatch.setenv("SIMILARIPY_TPU_SYM_TC", "512")
    monkeypatch.setenv("SIMILARIPY_TPU_SYM_GT", "1")
    m = _rand(45, 2100, density=0.06, seed=29).T.tocsr()  # 5 tiles, pairs
    got, ref = _both_paths(
        sim.s_plus, monkeypatch, m, k=11, l1=0.6, t1=0.8, t2=0.8, c1=0.5,
        verbose=False,
    )
    np.testing.assert_allclose(check_sum(got), check_sum(ref), rtol=1e-6)


def test_prefill_anchor_path(monkeypatch):
    """Opt-in anchor prefill (sweep keeps the next pair's anchor tiles)
    must reproduce the general path exactly."""
    monkeypatch.setenv("SIMILARIPY_TPU_USE_PALLAS", "1")
    monkeypatch.setenv("SIMILARIPY_TPU_SYM_PREFILL", "1")
    monkeypatch.setenv("SIMILARIPY_TPU_SYM_TC", "128")
    monkeypatch.setenv("SIMILARIPY_TPU_SYM_GT", "2")
    m = _rand(70, 1700, seed=31).T.tocsr()  # 14 tiles, 7 groups, 4 pairs
    got, ref = _both_paths(sim.cosine, monkeypatch, m, k=13, verbose=False)
    np.testing.assert_allclose(check_sum(got), check_sum(ref), rtol=1e-6)


def test_rp3beta_value_symmetric_refactor(monkeypatch):
    """rp3beta's self-similar shrink-free form rides the symmetric path
    (row-depop + col-depop + swapped col epilogue) and must match the
    general path AND the plain (non-refactored) formulation."""
    monkeypatch.setenv("SIMILARIPY_TPU_SYM_TC", "128")
    monkeypatch.setenv("SIMILARIPY_TPU_SYM_GT", "2")
    m = _rand(45, 650, seed=43, integral=True).T.tocsr()
    got, ref = _both_paths(
        sim.rp3beta, monkeypatch, m, alpha=0.7, beta=0.4, k=10, verbose=False
    )
    np.testing.assert_allclose(check_sum(got), check_sum(ref), rtol=1e-6)
    # explicit matrix2 takes the historical two-matrix formulation
    sim.clear_caches()
    old = sim.rp3beta(m, matrix2=m.T, alpha=0.7, beta=0.4, k=10,
                      verbose=False)
    np.testing.assert_allclose(check_sum(got), check_sum(old), rtol=5e-4)


def test_rp3beta_refactor_pallas(monkeypatch):
    monkeypatch.setenv("SIMILARIPY_TPU_USE_PALLAS", "1")
    monkeypatch.setenv("SIMILARIPY_TPU_SYM_TC", "128")
    monkeypatch.setenv("SIMILARIPY_TPU_SYM_GT", "2")
    m = _rand(45, 650, seed=43, integral=True).T.tocsr()
    got, ref = _both_paths(
        sim.rp3beta, monkeypatch, m, alpha=0.7, beta=0.4, k=10, verbose=False
    )
    np.testing.assert_allclose(check_sum(got), check_sum(ref), rtol=1e-6)


def test_p3alpha_refactor_matches_two_matrix_form(monkeypatch):
    m = _rand(50, 500, seed=47, integral=True).T.tocsr()
    got = sim.p3alpha(m, alpha=0.8, k=9, verbose=False)
    sim.clear_caches()
    old = sim.p3alpha(m, matrix2=m.T, alpha=0.8, k=9, verbose=False)
    np.testing.assert_allclose(check_sum(got), check_sum(old), rtol=5e-4)


def test_pallas_k_exceeds_tile_width(monkeypatch):
    """k > tc: the carry planes accumulate candidates across the whole
    sweep, so their depth must be k — min(k, tc) silently dropped
    candidates ranked past one tile's width (regression)."""
    monkeypatch.setenv("SIMILARIPY_TPU_USE_PALLAS", "1")
    monkeypatch.setenv("SIMILARIPY_TPU_SYM_TC", "128")
    monkeypatch.setenv("SIMILARIPY_TPU_SYM_GT", "2")
    m = _rand(60, 600, density=0.4, seed=3).T.tocsr()
    got, ref = _both_paths(sim.dot_product, monkeypatch, m, k=200,
                           verbose=False)
    assert got.nnz == ref.nnz, (got.nnz, ref.nnz)
    np.testing.assert_allclose(check_sum(got), check_sum(ref), rtol=1e-6)


def test_pallas_k_exceeds_catalog(monkeypatch):
    """k > C with the fused path on: planes clamp to C, output pads to k."""
    monkeypatch.setenv("SIMILARIPY_TPU_USE_PALLAS", "1")
    monkeypatch.setenv("SIMILARIPY_TPU_SYM_TC", "128")
    m = _rand(30, 280, density=0.4, seed=23).T.tocsr()
    got, ref = _both_paths(sim.dot_product, monkeypatch, m, k=5000,
                           verbose=False)
    assert got.nnz == ref.nnz, (got.nnz, ref.nnz)
    np.testing.assert_allclose(check_sum(got), check_sum(ref), rtol=1e-6)


def test_midk_shrinks_tile_width_stays_fused(monkeypatch):
    """k_pad*tc over the scoped-VMEM boundary must SHRINK tc and stay on
    the fused kernel (round 3) — previously every k > ~192 at the default
    tile width fell back to the XLA chain."""
    import similaripy_tpu.engine.pallas_kernels as pk

    monkeypatch.setenv("SIMILARIPY_TPU_USE_PALLAS", "1")
    calls = []
    orig = pk.fused_sym_topk

    def spy(*a, **kw):
        calls.append(kw.get("tc"))
        return orig(*a, **kw)

    monkeypatch.setattr(pk, "fused_sym_topk", spy)
    # C=1200 -> default tc would be 1280; k=700 -> k_pad=704 and
    # 704*1280 > 768*1024, so the planner must shrink tc to <= 1024
    m = _rand(60, 1200, density=0.3, seed=31).T.tocsr()
    got = sim.dot_product(m, k=700, verbose=False)
    assert calls, "mid-k call fell off the fused kernel"
    assert all(tc is not None and tc * 704 <= 768 * 1024 for tc in calls)
    sim.clear_caches()
    monkeypatch.setenv("SIMILARIPY_TPU_SYMMETRIC", "0")
    ref = sim.dot_product(m, k=700, verbose=False)
    assert got.nnz == ref.nnz
    np.testing.assert_allclose(check_sum(got), check_sum(ref), rtol=1e-6)
