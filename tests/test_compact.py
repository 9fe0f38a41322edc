"""Union-compaction executor (engine/compact.py) correctness tests.

The compact path activates automatically for inner dims >= ~2048 (see
compact_eligible); these tests build matrices above that threshold and
check exact agreement with the NumPy oracles and with the dense grouped
path, across dtype modes and bucket promotion edge cases.
"""

import numpy as np
import pytest
import scipy.sparse as sp

import similaripy_tpu as sim
from oracles import check_sum, py_cosine, py_dot, py_jaccard, py_rp3beta
from similaripy_tpu.engine import compact
from similaripy_tpu.engine.preprocess import preprocess

VERBOSE = False


@pytest.fixture(autouse=True)
def _no_symmetric(monkeypatch):
    """Self-similarity calls route to the symmetric executor first; these
    tests target the compact path specifically, so disable that routing."""
    monkeypatch.setenv("SIMILARIPY_TPU_SYMMETRIC", "0")
    sim.clear_caches()
    yield
    sim.clear_caches()


def _int_matrix(rows, cols, density, seed):
    rng = np.random.default_rng(seed)
    m = sp.random_array((rows, cols), density=density, format="csr",
                        dtype=np.float32, random_state=rng)
    m.data[:] = np.round(m.data * 4) + 1.0  # small ints -> int8 path arms
    return m


@pytest.fixture
def probe(monkeypatch):
    """Asserts the compact path actually ran."""
    calls = {"n": 0}
    orig = compact.execute_compact

    def wrapper(*a, **kw):
        calls["n"] += 1
        return orig(*a, **kw)

    monkeypatch.setattr(compact, "execute_compact", wrapper)
    return calls


def test_compact_eligibility_threshold():
    m_small = _int_matrix(50, 500, 0.05, 0)
    pre = preprocess(m_small, m_small.T, l2=1.0, k=10)
    assert not compact.compact_eligible(pre, 10)
    m_big = _int_matrix(50, 4096, 0.05, 0)
    pre = preprocess(m_big, m_big.T, l2=1.0, k=10)
    assert compact.compact_eligible(pre, 10)


def test_compact_cosine_int8_vs_oracle(probe):
    m = _int_matrix(400, 6000, 0.02, 1)
    got = sim.cosine(m, k=30, verbose=VERBOSE)
    assert probe["n"] == 1
    ref = py_cosine(m, 30)
    np.testing.assert_allclose(check_sum(got), check_sum(ref), rtol=1e-4)


def test_compact_dot_float32_vs_oracle(probe):
    rng = np.random.default_rng(2)
    m = sp.random_array((300, 5000), density=0.02, format="csr",
                        dtype=np.float32, random_state=rng)
    # non-integral data -> float32 path
    got = sim.dot_product(m, k=25, verbose=VERBOSE)
    assert probe["n"] == 1
    ref = py_dot(m, 25)
    np.testing.assert_allclose(check_sum(got), check_sum(ref), rtol=1e-4)


def test_compact_jaccard_binary(probe):
    m = _int_matrix(300, 4500, 0.02, 3)
    got = sim.jaccard(m, k=20, binary=True, verbose=VERBOSE)
    m_bin = m.copy()
    m_bin.data[:] = 1.0
    ref = py_jaccard(m_bin, 20)
    np.testing.assert_allclose(check_sum(got), check_sum(ref), rtol=1e-4)


def test_compact_rp3beta(probe):
    m = _int_matrix(350, 4096, 0.015, 4)
    got = sim.rp3beta(m, alpha=0.8, beta=0.4, k=15, verbose=VERBOSE)
    ref = py_rp3beta(m, 0.8, 0.4, 15)
    np.testing.assert_allclose(check_sum(got), check_sum(ref), rtol=1e-4)


def test_compact_matches_grouped_path(monkeypatch):
    """Forcing compact off must give identical results (both exact int8)."""
    m = _int_matrix(300, 5000, 0.02, 5)
    got_c = sim.cosine(m, k=40, verbose=VERBOSE).tocsr()
    monkeypatch.setenv("SIMILARIPY_TPU_COMPACT", "0")
    got_d = sim.cosine(m, k=40, verbose=VERBOSE).tocsr()
    np.testing.assert_allclose(check_sum(got_c), check_sum(got_d), rtol=1e-6)


def test_compact_target_rows(probe):
    m = _int_matrix(300, 4096, 0.02, 6)
    tr = [5, 250, 17, 100]
    got = sim.cosine(m, k=10, target_rows=tr, verbose=VERBOSE,
                     format_output="coo")
    full = sim.cosine(m, k=10, verbose=VERBOSE, format_output="coo").tocsr()
    got_csr = got.tocsr()
    for r in tr:
        a = np.sort(got_csr.data[got_csr.indptr[r]: got_csr.indptr[r + 1]])
        b = np.sort(full.data[full.indptr[r]: full.indptr[r + 1]])
        np.testing.assert_allclose(a, b, rtol=1e-5)


def test_compact_filter_cols_array(probe):
    m = _int_matrix(250, 4096, 0.02, 7)
    banned = np.arange(0, 250, 3)
    got = sim.cosine(m, k=15, filter_cols=banned, verbose=VERBOSE).tocsr()
    assert probe["n"] == 1
    assert not set(got.indices) & set(banned.tolist())


def test_compact_matrix_selector_falls_back(probe):
    """MATRIX-mode selectors route to the grouped executor."""
    m = _int_matrix(200, 4096, 0.02, 8)
    fil = sp.random_array((200, 200), density=0.05, format="csr",
                          dtype=np.float32, random_state=np.random.default_rng(9))
    got = sim.dot_product(m, m.T, k=10, filter_cols=fil, verbose=VERBOSE)
    assert probe["n"] == 0  # fell back
    assert got.shape == (200, 200)


def test_compact_tiny_hot_prefix(monkeypatch, probe):
    """H forced tiny: everything lands in cold unions / dense promotion."""
    monkeypatch.setenv("SIMILARIPY_TPU_HOT", "512")
    m = _int_matrix(300, 4096, 0.03, 10)
    got = sim.cosine(m, k=20, verbose=VERBOSE)
    ref = py_cosine(m, 20)
    np.testing.assert_allclose(check_sum(got), check_sum(ref), rtol=1e-4)


def test_compact_skewed_degrees_promotion(probe):
    """Power-law degrees force head panels into bigger buckets / dense."""
    rng = np.random.default_rng(11)
    n_rows, n_cols = 400, 4096
    rows, cols = [], []
    w = 1.0 / np.arange(1, n_cols + 1) ** 1.1
    w /= w.sum()
    for r in range(n_rows):
        deg = int(rng.integers(1, 60)) if r > 10 else 2000  # 10 head rows
        c = rng.choice(n_cols, size=min(deg, n_cols), replace=False, p=None) \
            if r <= 10 else rng.choice(n_cols, size=deg, replace=False, p=w)
        rows.extend([r] * len(c))
        cols.extend(c.tolist())
    vals = np.ones(len(rows), np.float32)
    m = sp.csr_array((vals, (rows, cols)), shape=(n_rows, n_cols))
    got = sim.cosine(m, k=30, verbose=VERBOSE)
    ref = py_cosine(m, 30)
    np.testing.assert_allclose(check_sum(got), check_sum(ref), rtol=1e-4)


def test_compact_second_matrix(probe):
    """dot_product(m1, m2) with distinct matrices through compact."""
    m1 = _int_matrix(200, 4096, 0.02, 12)
    m2 = _int_matrix(200, 4096, 0.02, 13).T.tocsr()  # 4096 x 200
    got = sim.dot_product(m1, m2, k=20, threshold=float("-inf"),
                          verbose=VERBOSE).tocsr()
    ref = (m1 @ m2).toarray()
    # k=20 of 200 cols; compare via check_sum of oracle top-k
    from oracles import top_k
    ref_t = top_k(sp.csr_array(ref), 20)
    np.testing.assert_allclose(check_sum(got), check_sum(ref_t), rtol=1e-4)


def test_compact_caching_roundtrip(probe):
    m = _int_matrix(300, 4096, 0.02, 14)
    a = sim.cosine(m, k=10, verbose=VERBOSE)
    b = sim.cosine(m, k=10, verbose=VERBOSE)  # warm: cached plan + tiles
    np.testing.assert_allclose(check_sum(a), check_sum(b), rtol=0)
    assert probe["n"] == 2
