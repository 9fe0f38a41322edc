"""Native (C++) host-side runtime kernels with NumPy fallbacks.

The reference performs its host data-plane natively (header-only C++ via
Cython: COO->CSR counting sort at cython_code/coo_to_csr.h:28-71, CSR
column filtering at s_plus_utils.pyx:424-490). This package provides the
equivalent kernels as a small C++ library loaded via ctypes; when the
shared library is absent the callers fall back to vectorized NumPy/SciPy.

Build with: python -m similaripy_tpu.native.build
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None
_LIB_TRIED = False


def _load():
    global _LIB, _LIB_TRIED
    if _LIB_TRIED:
        return _LIB
    _LIB_TRIED = True
    path = os.path.join(os.path.dirname(__file__), "libsimtpu.so")
    if not os.path.exists(path):
        try:  # build lazily on first use; fall back silently without g++
            from .build import build

            build(verbose=False)
        except Exception:
            return None
    if not os.path.exists(path):
        return None
    try:
        lib = ctypes.CDLL(path)
        lib.coo_to_csr32.restype = None
        lib.coo_to_csr64.restype = None
        lib.topk_to_coo.restype = ctypes.c_longlong
        _LIB = lib
    except OSError:
        _LIB = None
    return _LIB


def available() -> bool:
    return _load() is not None


def coo_to_csr(rows, cols, vals, n_rows: int, idx_dtype):
    """Counting-sort COO->CSR (duplicates preserved, row-major, stable).

    Matches reference coo_to_csr.h:28-71 semantics; int64 variant included
    so huge outputs work on every platform.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native library not built")
    nnz = int(vals.shape[0])
    rows = np.ascontiguousarray(rows, dtype=idx_dtype)
    cols = np.ascontiguousarray(cols, dtype=idx_dtype)
    vals = np.ascontiguousarray(vals, dtype=np.float32)
    indptr = np.zeros(n_rows + 1, dtype=idx_dtype)
    indices = np.empty(nnz, dtype=idx_dtype)
    data = np.empty(nnz, dtype=np.float32)
    fn = lib.coo_to_csr32 if idx_dtype == np.int32 else lib.coo_to_csr64
    c_long = ctypes.c_longlong
    first = ctypes.c_int(n_rows) if idx_dtype == np.int32 else c_long(n_rows)
    fn(
        first,
        c_long(nnz),
        rows.ctypes.data_as(ctypes.c_void_p),
        cols.ctypes.data_as(ctypes.c_void_p),
        vals.ctypes.data_as(ctypes.c_void_p),
        indptr.ctypes.data_as(ctypes.c_void_p),
        indices.ctypes.data_as(ctypes.c_void_p),
        data.ctypes.data_as(ctypes.c_void_p),
    )
    return indptr, indices, data


def topk_to_coo(vals, idx, targets):
    """Fused -inf/NaN filtering + (row, col, val) extraction from (T, k)
    top-K panels (reference: s_plus.pyx:351-353 output buffers)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library not built")
    T, k = vals.shape
    vals = np.ascontiguousarray(vals, dtype=np.float32)
    idx = np.ascontiguousarray(idx, dtype=np.int32)
    targets = np.ascontiguousarray(targets, dtype=np.int32)
    out_rows = np.empty(T * k, dtype=np.int32)
    out_cols = np.empty(T * k, dtype=np.int32)
    out_vals = np.empty(T * k, dtype=np.float32)
    n = lib.topk_to_coo(
        ctypes.c_longlong(T),
        ctypes.c_longlong(k),
        vals.ctypes.data_as(ctypes.c_void_p),
        idx.ctypes.data_as(ctypes.c_void_p),
        targets.ctypes.data_as(ctypes.c_void_p),
        out_rows.ctypes.data_as(ctypes.c_void_p),
        out_cols.ctypes.data_as(ctypes.c_void_p),
        out_vals.ctypes.data_as(ctypes.c_void_p),
    )
    return out_rows[:n], out_cols[:n], out_vals[:n]
