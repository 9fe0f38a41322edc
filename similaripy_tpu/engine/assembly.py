"""Output assembly: (T, k) top-K buffers -> SciPy COO / CSR.

Plays the role of the reference's preallocated triple buffers + native
COO->CSR counting sort (reference: s_plus.pyx:351-353,406-424,
cython_code/coo_to_csr.h:28-71, utils.pyx:43-173). Index width (int32 vs
int64) is auto-dispatched the same way (utils.pyx:141-173) — and works for
the int64 case by construction (the reference's Windows `long` bug).

Uses the native C++ assembly kernels when built (similaripy_tpu/native),
falling back to vectorized NumPy/SciPy.
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp

from ..ops.csr import get_index_dtype


def assemble(
    vals: np.ndarray,  # (T, k) f32, -inf marks empty slots
    idx: np.ndarray,  # (T, k) int32 global column ids
    targets: np.ndarray,  # (T,) int32
    n_output_rows: int,
    n_output_cols: int,
    format_output: str,
):
    try:
        from ..native import topk_to_coo

        rows, cols, v = topk_to_coo(vals, idx, targets)
    except Exception:
        mask = vals > float("-inf")  # drops -inf and NaN slots
        flat_mask = mask.ravel()
        k = vals.shape[1]
        rows = np.repeat(targets.astype(np.int64, copy=False), k)[flat_mask]
        cols = idx.ravel()[flat_mask].astype(np.int64, copy=False)
        v = vals.ravel()[flat_mask]

    idx_dtype = get_index_dtype(max(int(v.shape[0]), n_output_cols, n_output_rows))
    rows = rows.astype(idx_dtype, copy=False)
    cols = cols.astype(idx_dtype, copy=False)

    if format_output == "coo":
        return sp.coo_array((v, (rows, cols)), shape=(n_output_rows, n_output_cols))

    res = _coo_to_csr(rows, cols, v, n_output_rows, n_output_cols, idx_dtype)
    res.eliminate_zeros()  # reference: s_plus.pyx:423-424
    return res


def _coo_to_csr(rows, cols, vals, n_rows, n_cols, idx_dtype):
    try:
        from ..native import coo_to_csr as native_coo_to_csr

        indptr, indices, data = native_coo_to_csr(rows, cols, vals, n_rows, idx_dtype)
        return sp.csr_array((data, indices, indptr), shape=(n_rows, n_cols))
    except Exception:
        coo = sp.coo_array((vals, (rows, cols)), shape=(n_rows, n_cols))
        return coo.tocsr()
