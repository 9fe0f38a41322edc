"""Edge cases: degenerate inputs the reference handles gracefully."""

import numpy as np
import pytest
import scipy.sparse as sp

import similaripy_tpu as sim
from oracles import check_sum, generate_random_matrix, top_k

VERBOSE = False


def test_empty_matrix():
    m = sp.csr_array((40, 30), dtype=np.float32)
    out = sim.cosine(m, k=10, verbose=VERBOSE)
    assert out.shape == (40, 40)
    assert out.nnz == 0


def test_single_nonzero():
    m = sp.csr_array((np.array([2.0], np.float32), (np.array([3]), np.array([4]))),
                     shape=(10, 8))
    out = sim.cosine(m, k=5, verbose=VERBOSE).tocsr()
    assert out.nnz == 1
    np.testing.assert_allclose(out[[3], [3]], [1.0], rtol=1e-5)


def test_negative_data_negative_threshold():
    rng = np.random.default_rng(0)
    m = generate_random_matrix(100, 60, density=0.1).tocsr()
    m.data = (rng.random(m.data.shape[0]) - 0.5).astype(np.float32)  # +/- values
    got = sim.dot_product(m, k=60, threshold=float("-inf"), verbose=VERBOSE)
    ref = top_k((m @ m.T).tocsr(), 60)
    np.testing.assert_allclose(check_sum(got), check_sum(ref), rtol=1e-4)
    # default threshold=0 drops negative scores
    got0 = sim.dot_product(m, k=60, verbose=VERBOSE)
    assert (got0.tocsr().data >= 0).all()


def test_unsorted_duplicate_target_rows():
    m = generate_random_matrix(50, 40, density=0.1).tocsr()
    tr = [7, 3, 7, 12]  # unsorted, duplicated
    out = sim.cosine(m, k=5, target_rows=tr, verbose=VERBOSE, format_output="coo")
    rows = np.unique(out.coords[0])
    assert set(rows) <= {3, 7, 12}
    # row 7 contributes twice in COO (reference keeps duplicates too)
    assert (out.coords[0] == 7).sum() == 2 * (out.coords[0] == 12).sum()


def test_target_rows_empty():
    m = generate_random_matrix(30, 20, density=0.1).tocsr()
    out = sim.cosine(m, k=5, target_rows=[], verbose=VERBOSE)
    assert out.nnz == 0


def test_int64_input_dtype():
    rng = np.random.default_rng(1)
    m = sp.random_array((60, 40), density=0.1, format="csr",
                        dtype=np.float64, random_state=rng)
    out = sim.cosine(m, k=10, verbose=VERBOSE)
    assert out.nnz > 0


def test_wide_and_tall_extremes():
    rng = np.random.default_rng(2)
    wide = sp.random_array((4, 5000), density=0.01, format="csr",
                           dtype=np.float32, random_state=rng)
    out = sim.dot_product(wide, k=4, verbose=VERBOSE)
    assert out.shape == (4, 4)
    tall = sp.random_array((5000, 4), density=0.05, format="csr",
                           dtype=np.float32, random_state=rng)
    out = sim.dot_product(tall, k=10, verbose=VERBOSE)
    assert out.shape == (5000, 5000)


def test_large_k_fused_path():
    """512 < k <= 1024 stays on the fused kernel and matches the oracle."""
    import os

    rng = np.random.default_rng(3)
    m = sp.random_array((600, 300), density=0.05, format="csr",
                        dtype=np.float32, random_state=rng)
    m.data[:] = np.round(m.data * 4) + 1.0
    os.environ["SIMILARIPY_TPU_USE_PALLAS"] = "1"
    try:
        got = sim.dot_product(m, k=600, threshold=float("-inf"), verbose=VERBOSE)
        # k = full output width (600 > 512): element-wise comparable
        ref = (m @ m.T).toarray()
        np.testing.assert_allclose(got.tocsr().toarray(), ref, rtol=1e-4)
    finally:
        del os.environ["SIMILARIPY_TPU_USE_PALLAS"]


def test_very_large_k_exact_fallback():
    """k > 1024 routes to the XLA path (still exact) even when the fused
    kernel is requested (documented cutover, executor.py)."""
    import os

    rng = np.random.default_rng(4)
    m = sp.random_array((60, 2000), density=0.06, format="csr",
                        dtype=np.float32, random_state=rng)
    os.environ["SIMILARIPY_TPU_USE_PALLAS"] = "1"
    try:
        got = sim.dot_product(m.T.tocsr(), k=2000, threshold=float("-inf"),
                              verbose=VERBOSE)
        ref = (m.T @ m).toarray()
        np.testing.assert_allclose(got.tocsr().toarray(), ref, rtol=1e-4)
    finally:
        del os.environ["SIMILARIPY_TPU_USE_PALLAS"]


def test_large_k_with_pallas_forced(monkeypatch):
    """k=2048 through SIMILARIPY_TPU_USE_PALLAS=1 (VERDICT r1 item 7):
    beyond the fused extraction's documented cutover the executor falls
    back to the exact XLA top-k internally, so forcing the kernel on must
    still match the oracle for any k."""
    import scipy.sparse as sp

    monkeypatch.setenv("SIMILARIPY_TPU_USE_PALLAS", "1")
    sim.clear_caches()
    rng = np.random.default_rng(61)
    m = sp.random_array((2500, 600), density=0.05, format="csr",
                        dtype=np.float32, random_state=rng)
    m.data[:] = np.round(m.data * 4) + 1.0
    got = sim.dot_product(m, k=2048, verbose=False)
    monkeypatch.setenv("SIMILARIPY_TPU_USE_PALLAS", "0")
    sim.clear_caches()
    ref = sim.dot_product(m, k=2048, verbose=False)
    assert got.nnz == ref.nnz, (got.nnz, ref.nnz)
    np.testing.assert_allclose(check_sum(got), check_sum(ref), rtol=1e-6)


def test_cache_info_reflects_residents():
    """sim.cache_info() reports entry counts and byte totals that appear
    after a call and vanish after clear_caches()."""
    import scipy.sparse as sp

    sim.clear_caches()
    empty = sim.cache_info()
    assert empty["entries"] == 0 and empty["device_bytes"] == 0
    assert empty["prep_entries"] == 0

    rng = np.random.default_rng(7)
    m = sp.random_array((300, 200), density=0.05, format="csr",
                        dtype=np.float32, random_state=rng)
    m.data[:] = np.round(m.data * 4) + 1.0
    sim.dot_product(m, m.T.tocsr(), k=10, verbose=False)
    info = sim.cache_info()
    assert info["entries"] >= 2  # m1 panels + m2 tiles
    assert info["device_bytes"] > 0
    assert {"m1", "m2"} <= set(info["by_kind"])
    assert info["prep_entries"] >= 1
    total_by_kind = sum(e["entries"] for e in info["by_kind"].values())
    assert total_by_kind == info["entries"]

    sim.clear_caches()
    after = sim.cache_info()
    assert after["entries"] == 0 and after["prep_entries"] == 0
