"""Multi-device sharded executor vs the single-device path and oracles.

Runs on the 8-virtual-CPU-device mesh set up in conftest.py. The sharded
path must be bit-compatible in check_sum terms with the single-device
executor across mesh shapes: pure row-sharding (DP), pure column-sharding
(distributed top-K merge over 'cols'), and mixed grids (SURVEY §2.5).
"""

import numpy as np
import pytest
import scipy.sparse as sp

import similaripy_tpu as sim
from similaripy_tpu.parallel.mesh import make_mesh
from oracles import (
    check_sum,
    generate_random_matrix,
    py_cosine,
    py_rp3beta,
    py_s_plus,
    top_k,
)

VERBOSE = False
MESH_SHAPES = [(1, 8), (8, 1), (2, 4), (4, 2)]


@pytest.fixture(scope="module")
def matrix():
    return generate_random_matrix(500, 400, density=0.03).tocsr()


@pytest.mark.parametrize("rows,cols", MESH_SHAPES)
def test_sharded_cosine_matches_oracle(matrix, rows, cols):
    mesh = make_mesh(rows=rows, cols=cols)
    k = 30
    got = sim.cosine(matrix, k=k, verbose=VERBOSE, mesh=mesh)
    ref = py_cosine(matrix, k).tocsr()
    np.testing.assert_allclose(
        check_sum(got), check_sum(ref), rtol=1e-4,
        err_msg=f"sharded cosine mesh {rows}x{cols}",
    )


def test_sharded_all_similarities(matrix):
    """Every epilogue configuration through the sharded path on a 2x4 mesh."""
    mesh = make_mesh(rows=2, cols=4)
    k = 30
    cases = {
        "dot": (
            sim.dot_product(matrix, k=k, verbose=VERBOSE, mesh=mesh),
            sim.dot_product(matrix, k=k, verbose=VERBOSE),
        ),
        "jaccard": (
            sim.jaccard(matrix, k=k, verbose=VERBOSE, mesh=mesh),
            sim.jaccard(matrix, k=k, verbose=VERBOSE),
        ),
        "asy_cosine": (
            sim.asymmetric_cosine(matrix, alpha=0.2, k=k, verbose=VERBOSE, mesh=mesh),
            sim.asymmetric_cosine(matrix, alpha=0.2, k=k, verbose=VERBOSE),
        ),
        "rp3beta": (
            sim.rp3beta(matrix, alpha=0.8, beta=0.4, k=k, verbose=VERBOSE, mesh=mesh),
            py_rp3beta(matrix, alpha=0.8, beta=0.4, k=k),
        ),
        "splus": (
            sim.s_plus(
                matrix, l1=0.5, l2=0.5, l3=1, t1=1, t2=1, c1=0.5, c2=0.5,
                alpha=1, beta1=0, beta2=0, pop1="none", pop2="sum",
                k=k, verbose=VERBOSE, mesh=mesh,
            ),
            py_s_plus(
                matrix, l1=0.5, l2=0.5, l3=1, t1=1, t2=1, c1=0.5, c2=0.5,
                alpha=1, beta1=0, beta2=0, pop1="none", pop2="sum", k=k,
            ),
        ),
    }
    for name, (got, ref) in cases.items():
        np.testing.assert_allclose(
            check_sum(got), check_sum(ref), rtol=1e-4, err_msg=f"sharded {name}"
        )


def test_sharded_filter_cols_matrix():
    """Per-row seen-item masking survives the distributed top-K merge."""
    mesh = make_mesh(rows=2, cols=4)
    num_users, num_items = 90, 180
    rng = np.random.default_rng(11)
    urm = sp.random_array(
        (num_users, num_items), density=0.05, format="csr",
        dtype=np.float32, random_state=rng,
    )
    W = sp.random_array(
        (num_items, num_items), density=1, format="csr",
        dtype=np.float32, random_state=rng,
    )
    k = 180
    got = sim.dot_product(urm, W, k=k, filter_cols=urm, verbose=VERBOSE, mesh=mesh)
    single = sim.dot_product(urm, W, k=k, filter_cols=urm, verbose=VERBOSE)
    np.testing.assert_allclose(check_sum(got), check_sum(single), rtol=1e-4)
    a, b = got.tocsr(), single.tocsr()
    a.eliminate_zeros()
    b.eliminate_zeros()
    for u in range(num_users):
        np.testing.assert_array_equal(
            np.sort(a.indices[a.indptr[u] : a.indptr[u + 1]]),
            np.sort(b.indices[b.indptr[u] : b.indptr[u + 1]]),
            err_msg=f"row {u} index set",
        )


def test_sharded_target_rows_and_cols(matrix):
    mesh = make_mesh(rows=4, cols=2)
    k = 30
    rng = np.random.default_rng(3)
    target_rows = rng.choice(matrix.shape[0], size=77, replace=False).tolist()
    target_cols = rng.choice(matrix.shape[0], size=90, replace=False).tolist()
    got = sim.cosine(
        matrix, k=k, target_rows=target_rows, target_cols=target_cols,
        verbose=VERBOSE, mesh=mesh,
    )
    single = sim.cosine(
        matrix, k=k, target_rows=target_rows, target_cols=target_cols,
        verbose=VERBOSE,
    )
    np.testing.assert_allclose(check_sum(got), check_sum(single), rtol=1e-4)


def test_sharded_uneven_rows():
    """Target count not divisible by the mesh row axis."""
    mesh = make_mesh(rows=8, cols=1)
    m = generate_random_matrix(131, 97, density=0.05, seed=5).tocsr()
    got = sim.dot_product(m, k=13, verbose=VERBOSE, mesh=mesh)
    ref = top_k(m @ m.T, 13)
    np.testing.assert_allclose(check_sum(got), check_sum(ref), rtol=1e-4)


def test_sharded_grouped_matches_legacy(monkeypatch):
    """The grouped+fused sharded path and the legacy scan-over-tiles path
    produce identical results (both exact on the int8 path)."""
    from oracles import check_sum

    rng = np.random.default_rng(21)
    m = sp.random_array((160, 90), density=0.12, format="csr",
                        dtype=np.float32, random_state=rng)
    m.data[:] = np.round(m.data * 4) + 1.0
    mesh = make_mesh(rows=2, cols=4)
    a = sim.cosine(m, k=12, verbose=VERBOSE, mesh=mesh)
    monkeypatch.setenv("SIMILARIPY_TPU_SHARDED_GROUPED", "0")
    b = sim.cosine(m, k=12, verbose=VERBOSE, mesh=mesh)
    np.testing.assert_allclose(check_sum(a), check_sum(b), rtol=1e-6)


def test_sharded_grouped_f32x3(matrix, monkeypatch):
    """f32-HIGH through the grouped sharded path's split-bf16x3 kernel."""
    monkeypatch.setenv("SIMILARIPY_TPU_USE_PALLAS", "1")
    mesh = make_mesh(rows=2, cols=4)
    got = sim.cosine(matrix, matrix.T.tocsr(), k=20, verbose=VERBOSE,
                     mesh=mesh, compute_dtype="float32", precision="high")
    ref = sim.cosine(matrix, matrix.T.tocsr(), k=20, verbose=VERBOSE,
                     compute_dtype="float32", precision="high")
    np.testing.assert_allclose(
        check_sum(got), check_sum(ref), rtol=1e-5,
        err_msg="sharded grouped f32x3",
    )


def test_sharded_grouped_selectors_pallas(matrix, monkeypatch):
    """MATRIX-mode filter + target selectors through the grouped sharded
    path's fused kernel (scatter-mask tiles sharded over both mesh axes)."""
    monkeypatch.setenv("SIMILARIPY_TPU_USE_PALLAS", "1")
    mesh = make_mesh(rows=2, cols=4)
    rng = np.random.default_rng(13)
    out_shape = (matrix.shape[0], matrix.shape[0])
    fil = sp.random_array(out_shape, density=0.02, format="csr",
                          dtype=np.float32, random_state=rng)
    tgt = sp.random_array(out_shape, density=0.3, format="csr",
                          dtype=np.float32, random_state=rng)
    got = sim.cosine(matrix, matrix.T.tocsr(), k=25, filter_cols=fil,
                     target_cols=tgt, verbose=VERBOSE, mesh=mesh)
    ref = sim.cosine(matrix, matrix.T.tocsr(), k=25, filter_cols=fil,
                     target_cols=tgt, verbose=VERBOSE)
    np.testing.assert_allclose(
        check_sum(got), check_sum(ref), rtol=1e-4,
        err_msg="sharded grouped selectors",
    )
