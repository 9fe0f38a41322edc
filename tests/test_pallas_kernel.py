"""Fused Pallas kernel vs the XLA path (interpret mode on CPU).

The kernel fuses matmul + S-Plus epilogue + exact top-k extraction; these
tests force it on (SIMILARIPY_TPU_USE_PALLAS=1 -> interpret mode off-TPU)
and require agreement with the XLA path and the NumPy oracles, covering
every epilogue configuration and both selector kinds.
"""

import os

import numpy as np
import pytest
import scipy.sparse as sp

import similaripy_tpu as sim
from oracles import check_sum, generate_random_matrix, py_cosine, py_s_plus, top_k


@pytest.fixture(autouse=True)
def force_pallas(monkeypatch):
    monkeypatch.setenv("SIMILARIPY_TPU_USE_PALLAS", "1")


@pytest.fixture(scope="module")
def matrix():
    return generate_random_matrix(300, 250, density=0.04).tocsr()


def test_pallas_cosine(matrix):
    got = sim.cosine(matrix, k=20, verbose=False)
    ref = py_cosine(matrix, 20).tocsr()
    np.testing.assert_allclose(check_sum(got), check_sum(ref), rtol=1e-4)


def test_pallas_dot(matrix):
    got = sim.dot_product(matrix, k=20, verbose=False)
    ref = top_k(matrix @ matrix.T, 20)
    np.testing.assert_allclose(check_sum(got), check_sum(ref), rtol=1e-4)


def test_pallas_splus_full_epilogue(matrix):
    got = sim.s_plus(
        matrix, l1=0.5, l2=0.5, l3=1, t1=1, t2=1, c1=0.5, c2=0.5,
        alpha=1, beta1=0, beta2=0, pop1="none", pop2="sum",
        k=20, verbose=False,
    )
    ref = py_s_plus(
        matrix, l1=0.5, l2=0.5, l3=1, t1=1, t2=1, c1=0.5, c2=0.5,
        alpha=1, beta1=0, beta2=0, pop1="none", pop2="sum", k=20,
    )
    np.testing.assert_allclose(check_sum(got), check_sum(ref), rtol=1e-4)


def test_pallas_matches_xla_exactly(matrix, monkeypatch):
    got_p = sim.cosine(matrix, k=15, verbose=False).tocsr()
    monkeypatch.setenv("SIMILARIPY_TPU_USE_PALLAS", "0")
    got_x = sim.cosine(matrix, k=15, verbose=False).tocsr()
    np.testing.assert_allclose(check_sum(got_p), check_sum(got_x), rtol=1e-6)


def test_pallas_int8():
    rng = np.random.default_rng(5)
    m = sp.random_array((200, 160), density=0.06, format="csr",
                        dtype=np.float32, random_state=rng)
    m.data = rng.choice(np.arange(0.5, 5.5, 0.5), m.data.shape[0]).astype(np.float32)
    got = sim.dot_product(m, k=25, verbose=False, compute_dtype="int8")
    ref = top_k(m @ m.T, 25)
    np.testing.assert_allclose(check_sum(got), check_sum(ref), rtol=1e-5)


def test_pallas_filter_matrix():
    rng = np.random.default_rng(9)
    urm = sp.random_array((120, 90), density=0.06, format="csr",
                          dtype=np.float32, random_state=rng)
    W = sp.random_array((90, 90), density=1, format="csr",
                        dtype=np.float32, random_state=rng)
    got = sim.dot_product(urm, W, k=90, filter_cols=urm, verbose=False).tocsr()
    got.eliminate_zeros()
    for u in range(urm.shape[0]):
        seen = set(urm.indices[urm.indptr[u]:urm.indptr[u + 1]])
        rec = set(got.indices[got.indptr[u]:got.indptr[u + 1]])
        assert not (seen & rec), f"user {u}"


def test_pallas_target_cols(matrix):
    rng = np.random.default_rng(2)
    target_cols = rng.choice(matrix.shape[0], size=60, replace=False).tolist()
    got = sim.cosine(matrix, k=20, target_cols=target_cols, verbose=False)
    full = py_cosine(matrix, k=matrix.shape[0]).tocsr()
    mask = np.zeros(matrix.shape[0], dtype=bool)
    mask[target_cols] = True
    ref = top_k(full @ sp.diags_array(mask.astype(np.float32)), 20)
    np.testing.assert_allclose(check_sum(got), check_sum(ref), rtol=1e-3)


def test_pallas_threshold_and_shrink(matrix):
    got = sim.cosine(matrix, k=50, shrink=5, shrink_type="bayesian",
                     threshold=0.01, verbose=False)
    assert (got.tocsr().data >= 0.01 - 1e-6).all()
    ref = py_cosine(matrix, 50, h=5, shrink_mode="bayesian").tocsr()
    ref.data[ref.data < 0.01] = 0
    ref.eliminate_zeros()
    ref = top_k(ref, 50)
    np.testing.assert_allclose(check_sum(got), check_sum(ref), rtol=1e-3)
