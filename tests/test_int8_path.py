"""Exact int8 quantization path.

When both matrices hold small integers after a power-of-two scaling
(ratings / binary / count data), the engine accumulates dot products
exactly in int32 on the MXU — faster than bfloat16 AND bit-exact. These
tests pin the auto-detection rules and the exactness claim.
"""

import numpy as np
import pytest
import scipy.sparse as sp

import similaripy_tpu as sim
from similaripy_tpu.engine.executor import resolve_compute_dtype
from similaripy_tpu.engine.preprocess import preprocess, quantize_scale
from oracles import check_sum, py_cosine, top_k


def _ratings_matrix(rows=300, cols=200, density=0.05, seed=0, half_stars=True):
    rng = np.random.default_rng(seed)
    m = sp.random_array(
        (rows, cols), density=density, format="csr", dtype=np.float32, random_state=rng
    )
    levels = np.arange(0.5, 5.5, 0.5) if half_stars else np.arange(1, 6)
    m.data = rng.choice(levels, size=m.data.shape[0]).astype(np.float32)
    return m


def test_quantize_scale():
    assert quantize_scale(np.array([1.0, 2.0, 5.0], np.float32)) == 1.0
    assert quantize_scale(np.array([0.5, 2.5, 5.0], np.float32)) == 2.0
    assert quantize_scale(np.array([0.25, 1.75], np.float32)) == 4.0
    assert quantize_scale(np.array([0.3, 1.0], np.float32)) is None
    assert quantize_scale(np.array([200.0], np.float32)) is None
    assert quantize_scale(np.array([], np.float32)) == 1.0


def test_auto_picks_int8_for_ratings():
    m = _ratings_matrix()
    pre = preprocess(m, m.T.tocsr(), k=10)
    dtype, inv_scale = resolve_compute_dtype("auto", pre)
    assert dtype == "int8"
    assert inv_scale == pytest.approx(1.0 / 4.0)  # half-stars: s1 = s2 = 2


def test_auto_falls_back_for_real_valued_data():
    rng = np.random.default_rng(1)
    m = sp.random_array((100, 80), density=0.05, format="csr",
                        dtype=np.float32, random_state=rng)
    pre = preprocess(m, m.T.tocsr(), k=10)
    dtype, _ = resolve_compute_dtype("auto", pre)
    assert dtype == "float32"


def test_int8_exact_vs_float32():
    """int8 and float32 paths agree exactly on integral data (not merely
    to tolerance — the int32 accumulation is exact)."""
    m = _ratings_matrix(seed=3)
    a = sim.dot_product(m, k=40, verbose=False, compute_dtype="int8").tocsr()
    b = sim.dot_product(m, k=40, verbose=False, compute_dtype="float32").tocsr()
    np.testing.assert_allclose(check_sum(a), check_sum(b), rtol=1e-6)
    a.sort_indices()
    b.sort_indices()
    np.testing.assert_array_equal(a.indptr, b.indptr)
    np.testing.assert_allclose(a.data, b.data, rtol=1e-6)


def test_int8_cosine_matches_oracle():
    m = _ratings_matrix(seed=4)
    got = sim.cosine(m, k=30, verbose=False, compute_dtype="int8")
    ref = py_cosine(m, 30).tocsr()
    np.testing.assert_allclose(check_sum(got), check_sum(ref), rtol=1e-4)


def test_int8_rejected_for_real_valued_data():
    rng = np.random.default_rng(2)
    m = sp.random_array((50, 40), density=0.1, format="csr",
                        dtype=np.float32, random_state=rng)
    with pytest.raises(ValueError, match="int8"):
        sim.dot_product(m, k=10, verbose=False, compute_dtype="int8")


def test_overflow_guard_falls_back():
    """A dense integer matrix whose worst-case dot exceeds int32 must not
    take the int8 path."""
    rng = np.random.default_rng(5)
    n = 150_000  # overlap bound ~n: 127*127*n >= 2**30
    row = sp.random_array((2, n), density=0.9, format="csr",
                          dtype=np.float32, random_state=rng)
    row.data = np.full_like(row.data, 127.0)
    pre = preprocess(row, row.T.tocsr(), k=1)
    dtype, _ = resolve_compute_dtype("auto", pre)
    assert dtype == "float32"


def test_int8_sharded():
    from similaripy_tpu.parallel.mesh import make_mesh

    m = _ratings_matrix(seed=6)
    mesh = make_mesh(rows=2, cols=4)
    got = sim.dot_product(m, k=25, verbose=False, compute_dtype="int8", mesh=mesh)
    ref = top_k(m @ m.T, 25)
    np.testing.assert_allclose(check_sum(got), check_sum(ref), rtol=1e-5)


def test_int4_resolution_gating(monkeypatch):
    """int4 arms only on TPU with SIMILARIPY_TPU_INT4=1 and nibble-sized
    values; explicit request off-TPU still resolves (execution would need
    a TPU backend, but planning is host-side)."""
    import scipy.sparse as sp

    from similaripy_tpu.engine.executor import resolve_compute_dtype
    from similaripy_tpu.engine.preprocess import preprocess

    m = sp.csr_array(
        (np.ones(4, np.float32), (np.arange(4), np.arange(4))), shape=(4, 5)
    )
    pre = preprocess(m, m.T, k=2)
    # auto on CPU: int8 even when the env flag is set (TPU-only feature)
    monkeypatch.setenv("SIMILARIPY_TPU_INT4", "1")
    dt, _ = resolve_compute_dtype("auto", pre)
    assert dt == "int8"
    # explicit int4 resolves with the right inverse scale
    dt, inv = resolve_compute_dtype("int4", pre)
    assert dt == "int4" and inv == 1.0
    # non-integerizable data refuses explicit int4
    m2 = sp.csr_array(
        (np.array([0.3, 0.7], np.float32), (np.array([0, 1]), np.array([0, 1]))),
        shape=(2, 5),
    )
    pre2 = preprocess(m2, m2.T, k=1)
    with pytest.raises(ValueError, match="int4"):
        resolve_compute_dtype("int4", pre2)
