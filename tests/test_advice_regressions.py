"""Regression tests for round-1 advisor findings (ADVICE.md).

Each test pins a specific fixed defect:
  - csr_row_sums on matrices with trailing empty rows (high)
  - cache staleness after in-place .data mutation (medium)
  - quantize_scale snapping near-integral float noise onto int8 (low)
  - depop-weight validation raising bare TypeError on scalars (weak #6)
"""

import numpy as np
import pytest
import scipy.sparse as sp

import similaripy_tpu as sim
from similaripy_tpu.engine.preprocess import quantize_scale, validate_s_plus_inputs
from similaripy_tpu.ops.csr import csr_row_sums

VERBOSE = False


def test_csr_row_sums_trailing_empty_rows():
    # indptr=[0,3,5,5]: last non-empty row has 2 nnz, then a trailing empty row
    m = sp.csr_array(
        (
            np.array([1.0, 2.0, 3.0, 4.0, 5.0], np.float32),
            np.array([0, 1, 2, 0, 1]),
            np.array([0, 3, 5, 5]),
        ),
        shape=(3, 4),
    )
    np.testing.assert_allclose(csr_row_sums(m), [6.0, 9.0, 0.0])


def test_csr_row_sums_interleaved_empty_rows():
    rng = np.random.default_rng(0)
    dense = rng.random((20, 10)).astype(np.float32)
    dense[dense < 0.7] = 0.0
    dense[3] = 0.0
    dense[0] = 0.0
    dense[19] = 0.0  # trailing empty
    dense[18] = 0.0
    m = sp.csr_array(dense)
    np.testing.assert_allclose(csr_row_sums(m), dense.sum(axis=1), rtol=1e-6)


def test_cosine_with_trailing_empty_rows_exact():
    # end-to-end: advisor repro — self-similarity must be exactly 1.0
    dense = np.zeros((4, 5), np.float32)
    dense[0] = [1, 2, 0, 0, 0]
    dense[1] = [0, 1, 1, 0, 0]
    dense[2] = [3, 0, 0, 4, 0]  # last non-empty row, >=2 nnz
    # row 3 empty (trailing)
    m = sp.csr_array(dense)
    out = sim.cosine(m, k=4, verbose=VERBOSE).tocsr().toarray()
    np.testing.assert_allclose(np.diag(out)[:3], 1.0, rtol=1e-5)


def test_inplace_data_mutation_invalidates_caches():
    rng = np.random.default_rng(1)
    m = sp.random_array((50, 30), density=0.2, format="csr",
                        dtype=np.float32, random_state=rng)
    m.data[:] = np.round(m.data * 4) + 1.0
    out1 = sim.dot_product(m, k=50, threshold=float("-inf"), verbose=VERBOSE).tocsr()
    # mutate exactly one element in place (a normal scipy pattern)
    m.data[m.data.shape[0] // 2] += 1.0
    out2 = sim.dot_product(m, k=50, threshold=float("-inf"), verbose=VERBOSE).tocsr()
    ref2 = (m @ m.T).toarray()
    got2 = out2.toarray()
    np.testing.assert_allclose(got2, ref2, rtol=1e-4)
    assert not np.allclose(out1.toarray(), got2)


def test_clear_caches_api():
    m = sp.random_array((20, 10), density=0.3, format="csr", dtype=np.float32,
                        random_state=np.random.default_rng(2))
    sim.dot_product(m, k=5, verbose=VERBOSE)
    sim.clear_caches()  # must not raise; next call re-stages
    out = sim.dot_product(m, k=5, verbose=VERBOSE)
    assert out.nnz > 0


def test_quantize_scale_rejects_near_integral_noise():
    data = np.array([1.0, 2.0, 3.0], np.float32) + np.float32(1e-6)
    assert quantize_scale(data) is None
    # exactly representable half-stars still quantize with scale 2
    assert quantize_scale(np.array([0.5, 1.5, 5.0], np.float32)) == 2.0
    assert quantize_scale(np.array([1.0, 2.0, 127.0], np.float32)) == 1.0
    assert quantize_scale(np.array([200.0], np.float32)) is None


def test_rp3beta_negative_values_match_general_path():
    # round-2 advisor: the value-symmetric rp3beta refactor computed item
    # popularity as abs(m.T).sum(axis=0); the reference (similarity.py:479)
    # and the general path use the SIGNED sum. Negative data is degenerate
    # for p3 but the two paths must agree. alpha=beta=1 keeps the powers
    # defined on signed data.
    rng = np.random.default_rng(7)
    m = sp.random_array((40, 25), density=0.25, format="csr",
                        dtype=np.float32, random_state=rng)
    m.data = np.round(m.data * 4 - 1.0) + 0.5  # mix of signs, half-steps
    sym = sim.rp3beta(m, alpha=1.0, beta=1.0, k=25, verbose=VERBOSE).tocsr()
    gen = sim.rp3beta(m, matrix2=m.T.tocsr(), alpha=1.0, beta=1.0, k=25,
                      verbose=VERBOSE).tocsr()
    np.testing.assert_allclose(sym.toarray(), gen.toarray(),
                               rtol=1e-4, atol=1e-6)


def test_p3_symmetric_accepts_dense_input():
    # round-2 advisor: the non-sparse branch called .tocsr() on a dense
    # array (AttributeError); it must convert via csr_matrix instead
    rng = np.random.default_rng(8)
    dense = rng.random((12, 8)).astype(np.float32)
    dense[dense < 0.6] = 0.0
    out_d = sim.p3alpha(dense, alpha=1.0, k=8, verbose=VERBOSE).tocsr()
    out_s = sim.p3alpha(sp.csr_array(dense), alpha=1.0, k=8,
                        verbose=VERBOSE).tocsr()
    np.testing.assert_allclose(out_d.toarray(), out_s.toarray(), rtol=1e-5)


def test_depop_scalar_raises_value_error():
    m = sp.identity(4, format="csr", dtype=np.float32)
    with pytest.raises(ValueError, match="weight_depop_matrix1"):
        validate_s_plus_inputs(
            m, m, 3.5, "none", 5, None, None, None, False, "coo"
        )
    with pytest.raises(ValueError, match="weight_depop_matrix2"):
        validate_s_plus_inputs(
            m, m, "none", 7, 5, None, None, None, False, "coo"
        )
    with pytest.raises(ValueError, match='one of \\("none", "sum"\\)'):
        validate_s_plus_inputs(
            m, m, "bogus", "none", 5, None, None, None, False, "coo"
        )


def test_selector_cache_detects_filter_mutation():
    """The stacked selector tiles are cached by full-content fingerprint
    (executor.py sel_cache_key); an in-place mutation of the filter
    matrix's pattern between calls must never be served stale results."""
    rng = np.random.default_rng(21)
    m1 = sp.random_array((60, 30), density=0.2, format="csr",
                         dtype=np.float32, random_state=rng)
    m2 = sp.random_array((30, 40), density=0.2, format="csr",
                         dtype=np.float32, random_state=rng)
    # one excluded column per row, same nnz so the mutation is in-place
    rows = np.arange(60)
    filt = sp.csr_matrix(
        (np.ones(60, np.float32), (rows, np.full(60, 3))), shape=(60, 40)
    )
    out1 = sim.dot_product(
        m1, m2, k=40, filter_cols=filt, verbose=VERBOSE
    ).tocsr()
    assert np.all(out1[:, 3].toarray() == 0)
    filt.indices[:] = 7  # same pattern shape, different excluded column
    out2 = sim.dot_product(
        m1, m2, k=40, filter_cols=filt, verbose=VERBOSE
    ).tocsr()
    assert np.all(out2[:, 7].toarray() == 0)
    # column 3 is allowed again wherever it has a nonzero score
    ref = sim.dot_product(m1, m2, k=40, verbose=VERBOSE).tocsr()
    np.testing.assert_allclose(
        out2[:, 3].toarray(), ref[:, 3].toarray(), rtol=1e-5
    )


def test_device_cache_is_lru():
    """Round-3 advisor: eviction was insertion-order FIFO — a hot entry
    re-read every call could be evicted while colder entries survived.
    _cache_get must refresh recency."""
    from similaripy_tpu.engine import executor as ex

    sim.clear_caches()
    try:
        for i in range(ex._DEVICE_CACHE_CAP):
            ex._cache_put(("t", i), i)
        assert ex._cache_get(("t", 0)) == 0  # touch the oldest
        ex._cache_put(("t", "new"), 99)  # one over cap
        assert ex._cache_get(("t", 0)) == 0, "hot entry was evicted"
        assert ex._cache_get(("t", 1)) is None, "LRU entry survived"
    finally:
        sim.clear_caches()


def test_evict_stale_drops_other_geometries():
    """Round-3 advisor: a same-matrix entry staged under a different
    geometry holds unbudgeted HBM the planner never accounts for; the
    miss path must evict it before uploading the fresh stack."""
    from similaripy_tpu.engine import executor as ex

    sim.clear_caches()
    try:
        fp = "a" * 40
        other_fp = "b" * 40
        ex._cache_put(("m2", fp, "x", "float32", 512, 2, 128), 1)
        ex._cache_put(("m2", fp, "x", "int8", 1024, 4, 256), 2)
        ex._cache_put(("m2", other_fp, "x", "int8", 1024, 4, 256), 3)
        keep = ("m2", fp, "x", "int8", 1024, 4, 256)
        ex._evict_stale("m2", fp, keep)
        assert ex._cache_get(("m2", fp, "x", "float32", 512, 2, 128)) is None
        assert ex._cache_get(keep) == 2
        assert ex._cache_get(("m2", other_fp, "x", "int8", 1024, 4, 256)) == 3
    finally:
        sim.clear_caches()


def test_host_cache_byte_budget(monkeypatch):
    """Round-3 advisor: host-resident selector stacks (np arrays) were only
    count-capped; a handful of ML-32M-scale stacks could pin several GB of
    host RAM. They are now bounded by bytes (oldest evicted first, the
    newest always kept)."""
    from similaripy_tpu.engine import executor as ex

    sim.clear_caches()
    monkeypatch.setattr(ex, "_HOST_CACHE_MAX_BYTES", 1000)
    try:
        big = np.zeros(150, np.float64)  # 1200 bytes each
        ex._cache_put(("sel", "one"), {"fil_rows": big})
        ex._cache_put(("dev", "x"), 42)  # non-host entries are untouched
        ex._cache_put(("sel", "two"), {"fil_rows": big.copy()})
        assert ex._cache_get(("sel", "one")) is None, "oldest sel survived"
        assert ex._cache_get(("sel", "two")) is not None
        assert ex._cache_get(("dev", "x")) == 42
    finally:
        sim.clear_caches()


def test_symmetric_budget_floor_warns(monkeypatch):
    """Round-3 advisor: when foreign cached uploads exceed 75% of the HBM
    budget the symmetric planner silently floors at budget//4 — it must
    warn so build-then-score OOMs are diagnosable."""
    import warnings

    import jax.numpy as jnp

    from similaripy_tpu.engine import executor as ex

    sim.clear_caches()
    monkeypatch.setenv("SIMILARIPY_TPU_HBM_BYTES", str(64 << 20))
    m = sp.random_array((30, 20), density=0.3, format="csr",
                        dtype=np.float32, random_state=np.random.default_rng(3))
    try:
        # 56 MB foreign device entry (> 75% of the 64 MB budget)
        ex._cache_put(("m2", "f" * 40, "geom"),
                      jnp.zeros((14 << 20,), jnp.float32))
        with pytest.warns(RuntimeWarning, match="other matrices"):
            sim.cosine(m, k=5, verbose=VERBOSE)
        sim.clear_caches()
        # below the threshold: no warning
        with warnings.catch_warnings():
            warnings.simplefilter("error", RuntimeWarning)
            sim.cosine(m, k=5, verbose=VERBOSE)
    finally:
        sim.clear_caches()


def test_benchmark_rejects_zero_rounds():
    """Round-3 advisor: rounds=0 crashed statistics.mean of an empty list."""
    import sys

    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent.parent))
    from benchmarks.benchmark import benchmark_scoring, benchmark_similarity

    m = sp.identity(4, format="csr", dtype=np.float32)
    with pytest.raises(ValueError, match="rounds"):
        benchmark_similarity(sim.cosine, m, name="x", k=2, rounds=0)
    with pytest.raises(ValueError, match="rounds"):
        benchmark_scoring(lambda u, k, **kw: u, m, name="x", k=2, rounds=0)
    with pytest.raises(ValueError, match="warmup"):
        benchmark_similarity(sim.cosine, m, name="x", k=2, rounds=1, warmup=-1)


def test_foreign_cache_bytes_accounting():
    """foreign_cache_bytes counts device bytes of entries for OTHER
    matrices and excludes entries keyed by the given fingerprints —
    the planner input that fixed the ML-32M model-build-then-score OOM."""
    from similaripy_tpu.engine import executor as ex

    sim.clear_caches()
    rng = np.random.default_rng(5)
    a = sp.random_array((50, 30), density=0.2, format="csr",
                        dtype=np.float32, random_state=rng)
    b = sp.random_array((40, 30), density=0.2, format="csr",
                        dtype=np.float32, random_state=rng)
    sim.dot_product(a, b.T.tocsr(), k=5, verbose=VERBOSE)
    assert ex._DEVICE_CACHE, "expected device-cache entries after a call"
    # with no fingerprints kept, everything cached is foreign
    total = ex.foreign_cache_bytes(())
    assert total > 0
    # keeping every fingerprint present in the keys excludes everything
    fps = {
        part for key in ex._DEVICE_CACHE for part in key
        if isinstance(part, str) and len(part) == 40  # sha1 hex digests
    }
    assert ex.foreign_cache_bytes(tuple(fps)) == 0
    sim.clear_caches()
    assert ex.foreign_cache_bytes(()) == 0
