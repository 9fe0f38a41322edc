"""Similarity functions vs NumPy oracles.

Coverage mirrors the reference suite (reference: tests/test_similarity.py):
all nine similarities top-k and full-row, three shrink types, output
formats, README pipeline smoke, target_rows / filter_cols / target_cols,
block_size modes, and sparse-matrix filter_cols with exact per-row
index-set equality.
"""

import numpy as np
import pytest
import scipy.sparse as sp

import similaripy_tpu as sim
from oracles import (
    check_full,
    check_sum,
    generate_random_matrix,
    py_asy_cosine,
    py_cosine,
    py_dice,
    py_dot,
    py_jaccard,
    py_p3alpha,
    py_rp3beta,
    py_s_plus,
    py_tversky,
    top_k,
)

VERBOSE = False


def check_similarity(m, k, rtol=0.0001, full=False):
    results = {
        "dot": sim.dot_product(m, k=k, verbose=VERBOSE),
        "cosine": sim.cosine(m, k=k, verbose=VERBOSE),
        "asy_cosine": sim.asymmetric_cosine(m, alpha=0.2, k=k, verbose=VERBOSE),
        "jaccard": sim.jaccard(m, k=k, verbose=VERBOSE),
        "dice": sim.dice(m, k=k, verbose=VERBOSE),
        "tversky": sim.tversky(m, alpha=0.8, beta=0.4, k=k, verbose=VERBOSE),
        "p3alpha": sim.p3alpha(m, alpha=0.8, k=k, verbose=VERBOSE),
        "rp3beta": sim.rp3beta(m, alpha=0.8, beta=0.4, k=k, verbose=VERBOSE),
        "splus": sim.s_plus(
            m, l1=0.5, l2=0.5, l3=1, t1=1, t2=1, c1=0.5, c2=0.5,
            alpha=1, beta1=0, beta2=0, pop1="none", pop2="sum", k=k, verbose=VERBOSE,
        ),
    }
    oracles = {
        "dot": py_dot(m, k),
        "cosine": py_cosine(m, k).tocsr(),
        "asy_cosine": py_asy_cosine(m, 0.2, k=k),
        "jaccard": py_jaccard(m, k),
        "dice": py_dice(m, k),
        "tversky": py_tversky(m, alpha=0.8, beta=0.4, k=k),
        "p3alpha": py_p3alpha(m, alpha=0.8, k=k),
        "rp3beta": py_rp3beta(m, alpha=0.8, beta=0.4, k=k),
        "splus": py_s_plus(
            m, l1=0.5, l2=0.5, l3=1, t1=1, t2=1, c1=0.5, c2=0.5,
            alpha=1, beta1=0, beta2=0, pop1="none", pop2="sum", k=k,
        ),
    }
    for name in results:
        np.testing.assert_allclose(
            check_sum(results[name]), check_sum(oracles[name]), rtol=rtol,
            err_msg=f"{name} error",
        )
    if full:
        for name in results:
            assert check_full(results[name], oracles[name], rtol) == 0, f"{name} error"


def test_similarity_topk():
    m = generate_random_matrix(1000, 800, density=0.025).tocsr()
    check_similarity(m=m, k=50, rtol=0.0001, full=False)


def test_similarity_full():
    m = generate_random_matrix(400, 50, density=0.025).tocsr()
    check_similarity(m=m, k=50, rtol=0.0001, full=True)


def test_shrink_types():
    m = generate_random_matrix(400, 50, density=0.025).tocsr()
    k = 50
    for mode in ("stabilized", "bayesian", "additive"):
        got = sim.cosine(m, k=k, shrink=10, shrink_type=mode, verbose=VERBOSE)
        ref = py_cosine(m, k, h=10, shrink_mode=mode).tocsr()
        np.testing.assert_allclose(
            check_sum(got), check_sum(ref), rtol=0.0001,
            err_msg=f"Mismatch for shrink_type={mode}",
        )
        assert check_full(got, ref, 0.0001) == 0, f"Mismatch for shrink_type={mode}"


def test_output_format():
    m = generate_random_matrix(1000, 800, density=0.025).tocsr()
    sim_csr = sim.cosine(m, format_output="csr", k=50, verbose=VERBOSE)
    assert sp.issparse(sim_csr)
    assert isinstance(sim_csr, sp.csr_array)
    sim_coo = sim.cosine(m, format_output="coo", k=50, verbose=VERBOSE)
    assert sp.issparse(sim_coo)
    assert isinstance(sim_coo, sp.coo_array)
    assert sim_csr.nnz > 0
    assert sim_coo.nnz > 0


def test_example_code():
    """README pipeline smoke (reference: tests/test_similarity.py:359-381)."""
    urm = sp.random_array((1000, 2000), density=0.025)
    urm = sim.normalization.bm25(urm)
    similarity_matrix = sim.cosine(urm.T, k=50, verbose=VERBOSE)
    recommendations = sim.dot_product(
        urm,
        similarity_matrix.T,
        k=100,
        target_rows=[1, 14, 8],
        filter_cols=urm,
        verbose=VERBOSE,
    )
    assert recommendations.shape == (1000, 2000)


def test_target_rows():
    rows = 1000
    m = generate_random_matrix(rows, 800, density=0.025).tocsr()
    k = 50
    rng = np.random.default_rng(42)
    target_rows = rng.choice(rows, size=100, replace=False).tolist()
    sim_target = sim.cosine(m, k=k, target_rows=target_rows, verbose=VERBOSE)
    cosine_full = py_cosine(m, k).tocsr()
    mask = np.zeros(rows, dtype=bool)
    mask[target_rows] = True
    cosine_subset = sp.csr_array(sp.diags(mask.astype(np.float32)).dot(cosine_full))
    np.testing.assert_allclose(
        check_sum(sim_target), check_sum(cosine_subset), rtol=0.001,
        err_msg="target_rows cosine error",
    )


def test_filter_cols():
    rows = 1000
    m = generate_random_matrix(rows, 800, density=0.025).tocsr()
    k = 50
    rng = np.random.default_rng(42)
    filter_cols = sorted(rng.choice(rows, size=100, replace=False).tolist())
    sim_filtered = sim.cosine(m, k=k, filter_cols=filter_cols, verbose=VERBOSE)
    cosine_full_no_topk = py_cosine(m, k=rows).tocsr()
    mask = np.ones(rows, dtype=bool)
    mask[filter_cols] = False
    ref = top_k(cosine_full_no_topk.dot(sp.diags(mask.astype(np.float32))), k)
    np.testing.assert_allclose(
        check_sum(sim_filtered), check_sum(ref), rtol=0.001,
        err_msg="filter_cols cosine error",
    )


def test_target_cols():
    rows = 1000
    m = generate_random_matrix(rows, 800, density=0.025).tocsr()
    k = 50
    rng = np.random.default_rng(42)
    target_cols = rng.choice(rows, size=100, replace=False).tolist()
    sim_target = sim.cosine(m, k=k, target_cols=target_cols, verbose=VERBOSE)
    cosine_full_no_topk = py_cosine(m, k=rows).tocsr()
    mask = np.zeros(rows, dtype=bool)
    mask[target_cols] = True
    ref = top_k(cosine_full_no_topk.dot(sp.diags(mask.astype(np.float32))), k)
    np.testing.assert_allclose(
        check_sum(sim_target), check_sum(ref), rtol=0.001,
        err_msg="target_cols cosine error",
    )


def test_block_size():
    """Blocked and unblocked tilings produce identical results
    (reference: tests/test_similarity.py:505-540)."""
    m = generate_random_matrix(1000, 800, density=0.025).tocsr()
    k = 50
    dot_py = py_dot(m, k)
    cosine_py = py_cosine(m, k)
    rp3beta_py = py_rp3beta(m, alpha=0.8, beta=0.4, k=k)
    splus_py = py_s_plus(
        m, l1=0.5, l2=0.5, l3=1, t1=1, t2=1, c1=0.5, c2=0.5,
        alpha=1, beta1=0, beta2=0, pop1="none", pop2="sum", k=k,
    )
    for bs, label in [(None, "disabled"), (0, "auto"), (64, "64"), (256, "256")]:
        for fn, ref in [
            (lambda: sim.dot_product(m, k=k, block_size=bs, verbose=VERBOSE), dot_py),
            (lambda: sim.cosine(m, k=k, block_size=bs, verbose=VERBOSE), cosine_py),
            (
                lambda: sim.rp3beta(m, alpha=0.8, beta=0.4, k=k, block_size=bs, verbose=VERBOSE),
                rp3beta_py,
            ),
            (
                lambda: sim.s_plus(
                    m, l1=0.5, l2=0.5, l3=1, t1=1, t2=1, c1=0.5, c2=0.5,
                    alpha=1, beta1=0, beta2=0, pop1="none", pop2="sum",
                    k=k, block_size=bs, verbose=VERBOSE,
                ),
                splus_py,
            ),
        ]:
            np.testing.assert_allclose(
                check_sum(fn()), check_sum(ref), rtol=0.0001,
                err_msg=f"block_size={label} vs python ref",
            )


def test_filter_cols_matrix():
    """Sparse-matrix filter_cols: per-user seen-item masking with exact
    per-row index-set equality (reference: tests/test_similarity.py:543-617)."""
    num_users, num_items = 100, 200
    rng = np.random.default_rng(42)
    urm = sp.random_array(
        (num_users, num_items), density=0.05, format="csr", dtype=np.float32, random_state=rng
    )
    item_similarity = sp.random_array(
        (num_items, num_items), density=1, format="csr", dtype=np.float32, random_state=rng
    )
    k = 200
    rec_filtered = sim.dot_product(
        urm, item_similarity, k=k, filter_cols=urm, verbose=VERBOSE
    )
    rec_full = (urm.dot(item_similarity)).tocsr()
    rec_ref = rec_full.tolil()
    for u in range(num_users):
        seen = urm.indices[urm.indptr[u] : urm.indptr[u + 1]]
        rec_ref[u, seen] = 0
    rec_ref = top_k(rec_ref.tocsr(), k)
    np.testing.assert_allclose(
        check_sum(rec_filtered), check_sum(rec_ref), rtol=0.001,
        err_msg="filter_cols with matrix (seen items) error",
    )
    a = rec_filtered.tocsr()
    a.eliminate_zeros()
    b = rec_ref.tocsr()
    b.eliminate_zeros()
    for u in range(num_users):
        ia = np.sort(a.indices[a.indptr[u] : a.indptr[u + 1]])
        ib = np.sort(b.indices[b.indptr[u] : b.indptr[u + 1]])
        np.testing.assert_array_equal(ia, ib, err_msg=f"Mismatch in items for user {u}")


def test_target_cols_matrix():
    """Sparse-matrix target_cols: per-row inclusion sets."""
    num_users, num_items = 80, 150
    rng = np.random.default_rng(7)
    urm = sp.random_array(
        (num_users, num_items), density=0.05, format="csr", dtype=np.float32, random_state=rng
    )
    item_similarity = sp.random_array(
        (num_items, num_items), density=1, format="csr", dtype=np.float32, random_state=rng
    )
    k = 150
    rec = sim.dot_product(urm, item_similarity, k=k, target_cols=urm, verbose=VERBOSE)
    rec_full = (urm.dot(item_similarity)).tocsr()
    # keep only seen items per row
    ref = rec_full.tolil()
    dense_mask = urm.toarray() != 0
    ref_arr = rec_full.toarray() * dense_mask
    ref = top_k(sp.csr_array(ref_arr), k)
    np.testing.assert_allclose(check_sum(rec), check_sum(ref), rtol=0.001)


def test_threshold():
    m = generate_random_matrix(300, 200, density=0.05).tocsr()
    thr = 0.5
    got = sim.dot_product(m, k=200, threshold=thr, verbose=VERBOSE).tocsr()
    got.eliminate_zeros()
    full = (m @ m.T).tocsr()
    ref_arr = full.toarray()
    ref_arr[ref_arr < thr] = 0
    ref = top_k(sp.csr_array(ref_arr), 200).tocsr()
    ref.eliminate_zeros()
    np.testing.assert_allclose(check_sum(got), check_sum(ref), rtol=0.0001)
    assert (got.data >= thr).all()


def test_binary_mode():
    m = generate_random_matrix(300, 200, density=0.05).tocsr()
    got = sim.dot_product(m, k=200, binary=True, verbose=VERBOSE)
    mb = m.copy()
    mb.data = np.ones_like(mb.data)
    ref = py_dot(mb, 200)
    np.testing.assert_allclose(check_sum(got), check_sum(ref), rtol=0.0001)


def test_k_clamped_to_cols():
    m = generate_random_matrix(50, 30, density=0.2).tocsr()
    out = sim.dot_product(m, k=1000, verbose=VERBOSE)  # k > n_cols
    assert out.shape == (50, 50)


def test_explicit_matrix2():
    m1 = generate_random_matrix(120, 80, density=0.05, seed=1).tocsr()
    m2 = generate_random_matrix(80, 90, density=0.05, seed=2).tocsr()
    got = sim.dot_product(m1, m2, k=90, verbose=VERBOSE)
    ref = top_k(m1 @ m2, 90)
    np.testing.assert_allclose(check_sum(got), check_sum(ref), rtol=0.0001)


def test_validation_errors():
    m = generate_random_matrix(50, 30).tocsr()
    with pytest.raises(TypeError):
        sim.dot_product(np.ones((3, 3)), verbose=VERBOSE)
    with pytest.raises(ValueError):
        sim.dot_product(m, m, k=10, verbose=VERBOSE)  # shape mismatch
    with pytest.raises(ValueError):
        sim.dot_product(m, k=0, verbose=VERBOSE)
    with pytest.raises(ValueError):
        sim.dot_product(m, k=10, format_output="bogus", verbose=VERBOSE)
    with pytest.raises(ValueError):
        sim.cosine(m, k=10, shrink=1, shrink_type="bogus", verbose=VERBOSE)
