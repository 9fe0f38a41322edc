"""sim.recommend() — the recommendation-stage convenience wrapper.

Semantics pinned against the explicit idiom it wraps (reference:
README.md:86-94 / notebook cell 37): dot_product(urm, W.T, k,
filter_cols=urm).
"""

import numpy as np
import pytest
import scipy.sparse as sp

import similaripy_tpu as sim

VERBOSE = False


@pytest.fixture(scope="module")
def urm():
    rng = np.random.default_rng(11)
    return sp.random_array(
        (300, 120), density=0.08, format="csr", dtype=np.float32,
        random_state=rng,
    )


@pytest.fixture(scope="module")
def model(urm):
    return sim.cosine(urm.T, k=30, verbose=VERBOSE).tocsr()


def test_matches_explicit_dot_product(urm, model):
    got = sim.recommend(urm, model, k=10, verbose=VERBOSE).tocsr()
    want = sim.dot_product(
        urm, model.T.tocsr(), k=10, filter_cols=urm, verbose=VERBOSE
    ).tocsr()
    np.testing.assert_allclose(got.toarray(), want.toarray(), rtol=1e-5)


def test_exclude_seen_masks_interactions(urm, model):
    recs = sim.recommend(urm, model, k=10, verbose=VERBOSE).tocsr()
    u = urm.tocsr()
    for r in range(u.shape[0]):
        seen = set(u.indices[u.indptr[r]:u.indptr[r + 1]])
        got = set(recs.indices[recs.indptr[r]:recs.indptr[r + 1]])
        assert not (got & seen), f"row {r} recommended a seen item"


def test_exclude_seen_false(urm, model):
    got = sim.recommend(
        urm, model, k=10, exclude_seen=False, verbose=VERBOSE
    ).tocsr()
    want = sim.dot_product(
        urm, model.T.tocsr(), k=10, verbose=VERBOSE
    ).tocsr()
    np.testing.assert_allclose(got.toarray(), want.toarray(), rtol=1e-5)


def test_combines_sparse_filter(urm, model):
    # additionally ban item 0 for every user via a sparse filter
    extra = sp.csr_matrix(
        (np.ones(urm.shape[0], np.float32),
         (np.arange(urm.shape[0]), np.zeros(urm.shape[0], np.int64))),
        shape=urm.shape,
    )
    recs = sim.recommend(
        urm, model, k=10, filter_cols=extra, verbose=VERBOSE
    ).tocsr()
    u = urm.tocsr()
    for r in range(u.shape[0]):
        seen = set(u.indices[u.indptr[r]:u.indptr[r + 1]]) | {0}
        got = set(recs.indices[recs.indptr[r]:recs.indptr[r + 1]])
        assert not (got & seen)


def test_target_rows(urm, model):
    recs = sim.recommend(
        urm, model, k=5, target_rows=[3, 7], verbose=VERBOSE
    ).tocsr()
    assert recs.shape == urm.shape
    nnz_rows = np.flatnonzero(np.diff(recs.indptr))
    assert set(nnz_rows) <= {3, 7}


def test_array_filter_with_exclude_seen_raises(urm, model):
    with pytest.raises(ValueError, match="array-form"):
        sim.recommend(urm, model, k=5, filter_cols=[1, 2], verbose=VERBOSE)


def test_shape_mismatch_raises(urm, model):
    with pytest.raises(ValueError, match="items x items"):
        sim.recommend(urm.T, model, k=5, verbose=VERBOSE)


def test_exported():
    assert "recommend" in sim.__all__
