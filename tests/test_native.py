"""Native (C++) host-runtime kernels vs SciPy/NumPy references.

Mirrors the reference's native data plane coverage: COO->CSR counting sort
with duplicates preserved (reference: cython_code/coo_to_csr.h:28-71,
utils.pyx:43-173) in both index widths, plus the fused top-K panel ->
COO extraction. Skipped when no C++ toolchain is available (the engine
falls back to vectorized NumPy)."""

import numpy as np
import pytest
import scipy.sparse as sp

from similaripy_tpu import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library not built (no g++?)"
)


def _random_coo(n, m, nnz, seed=0):
    rng = np.random.default_rng(seed)
    return (
        rng.integers(0, n, nnz).astype(np.int32),
        rng.integers(0, m, nnz).astype(np.int32),
        rng.random(nnz).astype(np.float32),
    )


@pytest.mark.parametrize("idx_dtype", [np.int32, np.int64])
def test_coo_to_csr_matches_scipy(idx_dtype):
    n, m, nnz = 60, 45, 500
    rows, cols, vals = _random_coo(n, m, nnz)
    indptr, indices, data = native.coo_to_csr(
        rows.astype(idx_dtype), cols.astype(idx_dtype), vals, n, idx_dtype
    )
    assert indptr.dtype == idx_dtype and indices.dtype == idx_dtype
    got = sp.csr_array((data, indices, indptr), shape=(n, m)).toarray()
    ref = sp.coo_array((vals, (rows, cols)), shape=(n, m)).toarray()
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_coo_to_csr_duplicates_preserved():
    rows = np.array([0, 0, 1], np.int32)
    cols = np.array([2, 2, 0], np.int32)
    vals = np.array([1.0, 3.0, 5.0], np.float32)
    indptr, indices, data = native.coo_to_csr(rows, cols, vals, 2, np.int32)
    assert list(indptr) == [0, 2, 3]
    assert list(indices) == [2, 2, 0]  # both duplicates kept, stable order
    assert list(data) == [1.0, 3.0, 5.0]


def test_coo_to_csr_empty_rows():
    rows = np.array([3], np.int32)
    cols = np.array([1], np.int32)
    vals = np.array([2.0], np.float32)
    indptr, indices, data = native.coo_to_csr(rows, cols, vals, 5, np.int32)
    assert list(indptr) == [0, 0, 0, 0, 1, 1]


def test_topk_to_coo_filters_empty_slots():
    vals = np.array([[1.0, -np.inf, 3.0], [np.nan, 5.0, -np.inf]], np.float32)
    idx = np.array([[0, 1, 2], [3, 4, 5]], np.int32)
    targets = np.array([7, 9], np.int32)
    r, c, v = native.topk_to_coo(vals, idx, targets)
    assert list(r) == [7, 7, 9]
    assert list(c) == [0, 2, 4]
    assert list(v) == [1.0, 3.0, 5.0]
