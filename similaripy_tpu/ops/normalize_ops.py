"""Device-side CSR normalization kernels (pure JAX segment ops).

The reference implements these as in-place Cython loops over CSR arrays
(reference: similaripy/cython_code/normalization.pyx:97-334). On TPU the
same math is a handful of segment reductions plus an elementwise rescale of
the nnz data vector — fully vectorizable, no Pallas needed (SURVEY §7 step 2).

All functions take CSR *components* (data, indices, row_ids) and return the
new data vector; the sparsity pattern never changes. `row_ids` is the
per-nnz row index (host-expanded from indptr once, C-speed).

TF / IDF mode tables follow the reference exactly
(normalization.pyx:12-24,47-94):
  tf:  binary | raw | sqrt | freq | log
  idf: unary | base | smooth | prob | bm25
Note the reference's smooth IDF is log(N / (1 + df)) — the code, not the
docs, is authoritative (normalization.pyx:90-91).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

TF_MODES = ("binary", "raw", "sqrt", "freq", "log")
IDF_MODES = ("unary", "base", "smooth", "prob", "bm25")


def _segment_sum(values, segment_ids, num_segments):
    return jax.ops.segment_sum(values, segment_ids, num_segments=num_segments)


@partial(jax.jit, static_argnames=("n_rows", "norm"))
def normalize_rows(data, row_ids, n_rows: int, norm: str):
    """L1 / L2 / max row normalization.

    Rows whose norm is 0 (or max <= 0, matching the reference's guard at
    normalization.pyx:193-195) are left untouched.
    """
    if norm == "l1":
        norms = _segment_sum(jnp.abs(data), row_ids, n_rows)
        scale = jnp.where(norms == 0.0, 1.0, norms)
    elif norm == "l2":
        norms = jnp.sqrt(_segment_sum(data * data, row_ids, n_rows))
        scale = jnp.where(norms == 0.0, 1.0, norms)
    elif norm == "max":
        norms = jax.ops.segment_max(data, row_ids, num_segments=n_rows)
        scale = jnp.where(norms > 0.0, norms, 1.0)
    else:  # pragma: no cover - validated at API layer
        raise ValueError(norm)
    return data / scale[row_ids]


def _tf(data, doc_len_per_nnz, mode: str, log_logbase):
    if mode == "binary":
        return jnp.where(data != 0.0, 1.0, 0.0).astype(data.dtype)
    if mode == "raw":
        return data
    if mode == "sqrt":
        return jnp.sqrt(data)
    if mode == "freq":
        return data / doc_len_per_nnz
    # log
    return jnp.log1p(data) / log_logbase


def _idf(df, n_docs, mode: str, log_logbase):
    if mode == "unary":
        return jnp.ones_like(df)
    if mode == "base":
        return jnp.log(n_docs / df) / log_logbase
    if mode == "smooth":
        return jnp.log(n_docs / (1.0 + df)) / log_logbase
    if mode == "prob":
        return jnp.log((n_docs - df) / df) / log_logbase
    # bm25
    return jnp.log((n_docs - df + 0.5) / (df + 0.5)) / log_logbase


def _doc_stats(data, indices, row_ids, n_rows: int, n_cols: int):
    """doc_len (row sums of raw data) and df (count of data>0 per column).

    Matches the reference's single pass at normalization.pyx:242-246.
    """
    doc_len = _segment_sum(data, row_ids, n_rows)
    df = _segment_sum((data > 0.0).astype(data.dtype), indices, n_cols)
    return doc_len, df


@partial(jax.jit, static_argnames=("n_rows", "n_cols", "tf_mode", "idf_mode"))
def tfidf_data(data, indices, row_ids, n_rows: int, n_cols: int, tf_mode: str, idf_mode: str, logbase):
    log_logbase = jnp.log(jnp.asarray(logbase, data.dtype))
    doc_len, df = _doc_stats(data, indices, row_ids, n_rows, n_cols)
    # idf only where df != 0 (reference: normalization.pyx:248-250); columns
    # with no positive entries keep idf 0.
    idf_vals = jnp.where(df != 0.0, _idf(df, jnp.asarray(float(n_rows), data.dtype), idf_mode, log_logbase), 0.0)
    tf_vals = _tf(data, doc_len[row_ids], tf_mode, log_logbase)
    return tf_vals * idf_vals[indices]


@partial(jax.jit, static_argnames=("n_rows", "n_cols", "tf_mode", "idf_mode"))
def bm25plus_data(
    data,
    indices,
    row_ids,
    n_rows: int,
    n_cols: int,
    k1,
    b,
    delta,
    tf_mode: str,
    idf_mode: str,
    logbase,
):
    """BM25+ reweighting; BM25 is the delta=0 special case
    (reference: normalization.py:144-148, normalization.pyx:260-334)."""
    log_logbase = jnp.log(jnp.asarray(logbase, data.dtype))
    doc_len, df = _doc_stats(data, indices, row_ids, n_rows, n_cols)
    idf_vals = jnp.where(df != 0.0, _idf(df, jnp.asarray(float(n_rows), data.dtype), idf_mode, log_logbase), 0.0)
    avg_doc_len = jnp.sum(doc_len) / n_rows
    norm_doc_len = (1.0 - b) + b * doc_len / avg_doc_len
    tf_vals = _tf(data, doc_len[row_ids], tf_mode, log_logbase)
    return idf_vals[indices] * (tf_vals * (k1 + 1.0) / (tf_vals + k1 * norm_doc_len[row_ids]) + delta)
