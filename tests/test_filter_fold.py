"""Exclude-seen filter fold: dot_product(urm, W.T, filter_cols=urm).

The recommend() idiom's per-row filter is re-expressed as matmul algebra
(m2 - M*I) under a strict exactness gate (engine/executor.py::
_exclude_seen_fold). These tests pin (a) that the fold arms exactly when
the gate says so, (b) bit-level output parity against the masked path,
and (c) that every gate condition actually disarms it.
"""

import numpy as np
import pytest
import scipy.sparse as sp

import similaripy_tpu as sim
from similaripy_tpu.engine import executor
from oracles import check_sum

pytestmark = []


@pytest.fixture()
def data():
    rng = np.random.default_rng(3)
    urm = sp.random_array((240, 160), density=0.06, format="csr",
                          dtype=np.float32, random_state=rng)
    urm.data[:] = np.rint(urm.data * 8) / 2 + 0.5  # half-star ratings
    w = sim.cosine(urm.T.tocsr(), k=30, verbose=False).tocsr()
    return urm, w


def _spy_fold(monkeypatch):
    calls = []
    orig = executor._exclude_seen_fold

    def rec(*a, **kw):
        r = orig(*a, **kw)
        calls.append(r)
        return r

    monkeypatch.setattr(executor, "_exclude_seen_fold", rec)
    return calls


def _pair(urm, w, monkeypatch, **kw):
    """(folded, masked) results of the same recommend-idiom call."""
    sim.clear_caches()
    folded = sim.dot_product(urm, w.T.tocsr(), filter_cols=urm,
                             verbose=False, **kw)
    monkeypatch.setenv("SIMILARIPY_TPU_FOLD_FILTER", "0")
    sim.clear_caches()
    masked = sim.dot_product(urm, w.T.tocsr(), filter_cols=urm,
                             verbose=False, **kw)
    monkeypatch.delenv("SIMILARIPY_TPU_FOLD_FILTER")
    sim.clear_caches()
    return folded, masked


def test_fold_arms_and_matches_masked_path(data, monkeypatch):
    urm, w = data
    calls = _spy_fold(monkeypatch)
    folded, masked = _pair(urm, w, monkeypatch, k=10)
    assert calls and calls[0] is not None  # armed on the folded call
    assert folded.nnz == masked.nnz
    np.testing.assert_allclose(
        check_sum(folded), check_sum(masked), rtol=1e-6
    )


def test_fold_excludes_every_seen_item(data, monkeypatch):
    urm, w = data
    folded = sim.dot_product(urm, w.T.tocsr(), k=10, filter_cols=urm,
                             verbose=False).tocsr()
    u = urm.tocsr()
    for r in range(urm.shape[0]):
        got = set(folded.indices[folded.indptr[r]:folded.indptr[r + 1]])
        seen = set(u.indices[u.indptr[r]:u.indptr[r + 1]])
        assert not (got & seen), (r, got & seen)
    sim.clear_caches()


def test_fold_with_target_rows_and_precision_high(data, monkeypatch):
    urm, w = data
    tr = np.arange(0, urm.shape[0], 3)
    folded, masked = _pair(
        urm, w, monkeypatch, k=10, target_rows=tr,
        compute_dtype="float32", precision="high",
    )
    assert folded.nnz == masked.nnz
    np.testing.assert_allclose(
        check_sum(folded), check_sum(masked), rtol=1e-5
    )


def test_fold_xla_path_parity(data, monkeypatch):
    urm, w = data
    monkeypatch.setenv("SIMILARIPY_TPU_USE_PALLAS", "0")
    folded, masked = _pair(urm, w, monkeypatch, k=10)
    assert folded.nnz == masked.nnz
    np.testing.assert_allclose(
        check_sum(folded), check_sum(masked), rtol=1e-6
    )


def test_fold_gate_disarms(data, monkeypatch):
    """Each gate condition must disarm the fold (helper-level)."""
    urm, w = data
    calls = _spy_fold(monkeypatch)

    # denominator epilogue (cosine) never folds
    sim.clear_caches()
    sim.cosine(urm, w.T.tocsr(), k=10, filter_cols=urm, verbose=False)
    assert calls[-1] is None

    # negative threshold never folds
    sim.clear_caches()
    sim.dot_product(urm, w.T.tocsr(), k=10, filter_cols=urm,
                    threshold=-1.0, verbose=False)
    assert calls[-1] is None

    # filter with a different pattern never folds
    rng = np.random.default_rng(5)
    other = sp.random_array(urm.shape, density=0.06, format="csr",
                            dtype=np.float32, random_state=rng)
    sim.clear_caches()
    sim.dot_product(urm, w.T.tocsr(), k=10, filter_cols=other,
                    verbose=False)
    assert calls[-1] is None

    # non-positive ratings never fold
    neg = urm.copy()
    neg.data[0] = -1.0
    sim.clear_caches()
    sim.dot_product(neg, w.T.tocsr(), k=10, filter_cols=neg, verbose=False)
    assert calls[-1] is None

    # pathological dynamic range disarms: a denormal-scale rating would
    # push the penalty past f32 (0 * inf = NaN would poison every unseen
    # cell) — the fold must fall back to masks, and the output must still
    # match the masked path
    tiny = urm.copy()
    tiny.data = tiny.data.copy()
    tiny.data[0] = 1e-35
    sim.clear_caches()
    folded = sim.dot_product(tiny, w.T.tocsr(), k=10, filter_cols=tiny,
                             verbose=False)
    assert calls[-1] is None
    assert folded.nnz > 0
    sim.clear_caches()


def test_fold_opt_out_env(data, monkeypatch):
    urm, w = data
    calls = _spy_fold(monkeypatch)
    monkeypatch.setenv("SIMILARIPY_TPU_FOLD_FILTER", "0")
    sim.clear_caches()
    sim.dot_product(urm, w.T.tocsr(), k=10, filter_cols=urm, verbose=False)
    assert calls[-1] is None
    sim.clear_caches()


def test_fold_binary_mode_stays_int8(data, monkeypatch):
    """binary=True binarizes BOTH matrices (reference semantics), so the
    call rides the exact int8 path — faster than any float mode — and the
    fold correctly stays off (-M cannot be carried in int8). The masked
    path must agree with itself across the env knob (pure regression)."""
    urm, w = data
    calls = _spy_fold(monkeypatch)
    folded, masked = _pair(urm, w, monkeypatch, k=10, binary=True)
    assert calls and calls[0] is None  # int8 gate keeps the fold off
    assert folded.nnz == masked.nnz
    np.testing.assert_allclose(check_sum(folded), check_sum(masked), rtol=1e-6)


def test_fold_positive_threshold(data, monkeypatch):
    urm, w = data
    folded, masked = _pair(urm, w, monkeypatch, k=10, threshold=0.5)
    assert folded.nnz == masked.nnz
    np.testing.assert_allclose(check_sum(folded), check_sum(masked), rtol=1e-6)


def test_fold_csr_output_format(data, monkeypatch):
    urm, w = data
    folded, masked = _pair(urm, w, monkeypatch, k=10, format_output="csr")
    assert folded.format == masked.format == "csr"
    assert folded.nnz == masked.nnz
    np.testing.assert_allclose(check_sum(folded), check_sum(masked), rtol=1e-6)


def test_fold_sharded_mesh_parity(data, monkeypatch):
    """The sharded grouped path folds too: mesh result must match both
    the mesh masked path and the single-device folded path."""
    import jax

    from similaripy_tpu.parallel import make_mesh

    urm, w = data
    if jax.device_count() < 4:
        pytest.skip("needs the 8-device CPU mesh")
    mesh = make_mesh(rows=2, cols=2, devices=jax.devices()[:4])
    wt = w.T.tocsr()
    sim.clear_caches()
    mesh_folded = sim.dot_product(urm, wt, k=10, filter_cols=urm,
                                  mesh=mesh, verbose=False)
    monkeypatch.setenv("SIMILARIPY_TPU_FOLD_FILTER", "0")
    sim.clear_caches()
    mesh_masked = sim.dot_product(urm, wt, k=10, filter_cols=urm,
                                  mesh=mesh, verbose=False)
    monkeypatch.delenv("SIMILARIPY_TPU_FOLD_FILTER")
    sim.clear_caches()
    single = sim.dot_product(urm, wt, k=10, filter_cols=urm, verbose=False)
    sim.clear_caches()
    assert mesh_folded.nnz == mesh_masked.nnz == single.nnz
    np.testing.assert_allclose(
        check_sum(mesh_folded), check_sum(mesh_masked), rtol=1e-6
    )
    np.testing.assert_allclose(
        check_sum(mesh_folded), check_sum(single), rtol=1e-6
    )


def test_fold_recommend_api(data, monkeypatch):
    """sim.recommend() (exclude_seen=True) rides the fold and matches the
    masked path."""
    urm, w = data
    calls = _spy_fold(monkeypatch)
    sim.clear_caches()
    recs = sim.recommend(urm, w, k=8, verbose=False)
    assert calls and calls[-1] is not None
    monkeypatch.setenv("SIMILARIPY_TPU_FOLD_FILTER", "0")
    sim.clear_caches()
    ref = sim.recommend(urm, w, k=8, verbose=False)
    monkeypatch.delenv("SIMILARIPY_TPU_FOLD_FILTER")
    sim.clear_caches()
    assert recs.nnz == ref.nnz
    np.testing.assert_allclose(check_sum(recs), check_sum(ref), rtol=1e-6)
