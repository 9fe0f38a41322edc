"""Normalization suite vs dense NumPy constructions.

Test oracles mirror the reference's strategy exactly
(reference: tests/test_normalization.py): l1/l2/max vs dense row scaling,
tfidf vs explicit log(N/(1+df)) construction, bm25 vs a literal loop
implementation of the formula at rtol=1e-3.
"""

import numpy as np
import scipy.sparse as sp

import similaripy_tpu.normalization as norm


def generate_random_matrix(n_rows=100, n_cols=50, density=0.05, seed=42):
    rng = np.random.default_rng(seed)
    return sp.random_array(
        (n_rows, n_cols), density=density, format="csr", dtype=np.float32, random_state=rng
    )


def test_normalize_l1():
    X = generate_random_matrix()
    X_norm = norm.normalize(X, norm="l1")

    expected = X.copy()
    row_sums = np.asarray(expected.sum(axis=1)).ravel()
    row_sums[row_sums == 0] = 1
    expected.data /= np.repeat(row_sums, np.diff(expected.indptr))

    np.testing.assert_allclose(X_norm.toarray(), expected.toarray(), rtol=1e-5)


def test_normalize_l2():
    X = generate_random_matrix()
    X_norm = norm.normalize(X, norm="l2")

    expected = X.copy()
    row_norms = np.asarray(np.sqrt(expected.multiply(expected).sum(axis=1))).ravel()
    row_norms[row_norms == 0] = 1
    expected.data /= np.repeat(row_norms, np.diff(expected.indptr))

    np.testing.assert_allclose(X_norm.toarray(), expected.toarray(), rtol=1e-5)


def test_normalize_max():
    X = generate_random_matrix()
    X_norm = norm.normalize(X, norm="max")

    expected = X.copy()
    max_values = expected.max(axis=1).toarray().flatten()
    max_values[max_values == 0] = 1
    expected.data /= np.repeat(max_values, np.diff(expected.indptr))

    np.testing.assert_allclose(X_norm.toarray(), expected.toarray(), rtol=1e-5)


def test_normalize_axis0():
    X = generate_random_matrix()
    X_norm = norm.normalize(X, norm="l1", axis=0)

    expected = X.copy()
    col_sums = np.asarray(expected.sum(axis=0)).ravel()
    col_sums[col_sums == 0] = 1
    dense = expected.toarray() / col_sums[None, :]

    np.testing.assert_allclose(X_norm.toarray(), dense, rtol=1e-5)


def test_normalize_inplace_and_copy():
    X = generate_random_matrix()
    orig = X.toarray()
    out = norm.normalize(X, norm="l2", inplace=False)
    np.testing.assert_array_equal(X.toarray(), orig)  # input untouched
    out2 = norm.normalize(X, norm="l2", inplace=True)
    np.testing.assert_allclose(out.toarray(), out2.toarray(), rtol=1e-6)
    assert not np.allclose(X.toarray(), orig)  # mutated in place


def test_tfidf():
    X = generate_random_matrix(n_rows=200, n_cols=100, density=0.05)
    X_tfidf = norm.tfidf(X, tf_mode="sqrt", idf_mode="smooth", logbase=np.e)

    tf = X.copy().tocsr()
    tf.data = np.sqrt(tf.data)
    df = np.diff((X > 0).tocsc().indptr)
    idf = np.log(X.shape[0] / (1 + df))
    tf = tf.tocsc()
    tf.data *= np.repeat(idf, np.diff(tf.indptr))
    tf = tf.tocsr()

    np.testing.assert_allclose(X_tfidf.toarray(), tf.toarray(), rtol=1e-4)


def test_bm25():
    X = generate_random_matrix(n_rows=200, n_cols=100, density=0.05)
    X_bm25 = norm.bm25(X, k1=1.2, b=0.75, tf_mode="raw", idf_mode="bm25", logbase=np.e)

    tf = X.copy().tocsr()
    dl = np.array(tf.sum(axis=1)).flatten()
    avgdl = np.mean(dl)
    df = np.diff((tf > 0).tocsc().indptr)
    idf = np.log((tf.shape[0] - df + 0.5) / (df + 0.5))

    row, col = tf.nonzero()
    new_data = []
    for i, j, tf_ij in zip(row, col, tf.data):
        denom = tf_ij + 1.2 * (1 - 0.75 + 0.75 * dl[i] / avgdl)
        new_data.append(tf_ij * (1.2 + 1) / denom * idf[j])
    bm25_ref = sp.csr_array((new_data, (row, col)), shape=tf.shape)

    np.testing.assert_allclose(X_bm25.toarray(), bm25_ref.toarray(), rtol=1e-3)


def test_bm25plus_delta():
    X = generate_random_matrix(n_rows=100, n_cols=60, density=0.08)
    plain = norm.bm25(X, k1=1.5, b=0.6)
    plus = norm.bm25plus(X, k1=1.5, b=0.6, delta=1.0)

    # delta adds idf[col] * delta at every nnz
    df = np.diff((X > 0).tocsc().indptr)
    idf = np.log((X.shape[0] - df + 0.5) / (df + 0.5))
    diff = plus.toarray() - plain.toarray()
    expected = np.where(X.toarray() != 0, idf[None, :], 0.0)
    np.testing.assert_allclose(diff, expected, rtol=1e-3, atol=1e-5)


def test_tf_idf_modes_run():
    X = generate_random_matrix(n_rows=60, n_cols=40, density=0.1)
    for tf_mode in norm._TF_MODES:
        for idf_mode in norm._IDF_MODES:
            out = norm.tfidf(X, tf_mode=tf_mode, idf_mode=idf_mode)
            assert out.shape == X.shape
            assert np.isfinite(out.data).all()


def test_mode_validation():
    X = generate_random_matrix()
    import pytest

    with pytest.raises(ValueError):
        norm.tfidf(X, tf_mode="bogus")
    with pytest.raises(ValueError):
        norm.bm25(X, idf_mode="bogus")
    with pytest.raises(ValueError):
        norm.normalize(X, norm="l3")
    with pytest.raises(ValueError):
        norm.normalize(X, axis=2)
    with pytest.raises(TypeError):
        norm.normalize(np.ones((3, 3)))


def test_float64_path():
    X = generate_random_matrix().astype(np.float64)
    out = norm.normalize(X, norm="l2")
    assert out.data.dtype == np.float64
    row_norms = np.sqrt(np.asarray(X.multiply(X).sum(axis=1))).ravel()
    row_norms[row_norms == 0] = 1
    np.testing.assert_allclose(out.toarray(), X.toarray() / row_norms[:, None], rtol=1e-12)


def test_tf_modes_values():
    """Each TF mode vs its explicit formula (reference: normalization.pyx:47-69)."""
    X = generate_random_matrix(n_rows=80, n_cols=50, density=0.1)
    dl = np.asarray(X.sum(axis=1)).ravel()
    row_ids = np.repeat(np.arange(X.shape[0]), np.diff(X.indptr))
    tf_expected = {
        "binary": np.ones_like(X.data),
        "raw": X.data,
        "sqrt": np.sqrt(X.data),
        "freq": X.data / dl[row_ids],
        "log": np.log1p(X.data),
    }
    for mode, exp in tf_expected.items():
        out = norm.tfidf(X, tf_mode=mode, idf_mode="unary", logbase=np.e)
        np.testing.assert_allclose(out.tocsr().data, exp, rtol=1e-5,
                                   err_msg=f"tf_mode={mode}")


def test_idf_modes_values():
    """Each IDF mode vs its explicit formula (reference: normalization.pyx:72-94)."""
    X = generate_random_matrix(n_rows=80, n_cols=50, density=0.1)
    n = float(X.shape[0])
    df = np.diff((X > 0).tocsc().indptr).astype(np.float64)
    idf_expected = {
        "unary": np.ones_like(df),
        "base": np.log(n / df),
        "smooth": np.log(n / (1.0 + df)),
        "prob": np.log((n - df) / df),
        "bm25": np.log((n - df + 0.5) / (df + 0.5)),
    }
    col_ids = X.tocsr().indices
    for mode, exp in idf_expected.items():
        out = norm.tfidf(X, tf_mode="binary", idf_mode=mode, logbase=np.e)
        np.testing.assert_allclose(
            out.tocsr().data, exp[col_ids], rtol=1e-4, atol=1e-6,
            err_msg=f"idf_mode={mode}",
        )


def test_logbase():
    X = generate_random_matrix(n_rows=60, n_cols=40, density=0.1)
    out_e = norm.tfidf(X, tf_mode="binary", idf_mode="base", logbase=np.e)
    out_2 = norm.tfidf(X, tf_mode="binary", idf_mode="base", logbase=2.0)
    np.testing.assert_allclose(
        out_2.tocsr().data, out_e.tocsr().data / np.log(2.0), rtol=1e-5
    )
