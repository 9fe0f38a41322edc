"""Mesh-sharded symmetric executor vs the single-device symmetric path.

The single-device symmetric executor (itself pinned against the general
path in test_symmetric.py) is the oracle: every self-similarity call with
a mesh must agree in check_sum terms across mesh shapes, tile geometries
(multi-tile triangles, dual-anchor pairs, band masks), epilogue families
(symmetric, asymmetric, value-symmetric rp3beta), dtypes, and both the
XLA and the fused-Pallas (interpret mode) block paths. Runs on the
8-virtual-CPU-device mesh from conftest.py.
"""

import numpy as np
import pytest
import scipy.sparse as sp

import similaripy_tpu as sim
from oracles import check_sum
from similaripy_tpu.parallel.mesh import make_mesh

MESH_SHAPES = [(8, 1), (2, 4), (1, 8)]


@pytest.fixture(autouse=True)
def _clear_caches():
    sim.clear_caches()
    yield
    sim.clear_caches()


def _rand(n, m, density=0.15, seed=3, integral=True):
    rng = np.random.default_rng(seed)
    a = sp.random_array((n, m), density=density, format="csr",
                        dtype=np.float32, random_state=rng)
    if integral:
        a.data[:] = np.round(a.data * 4) + 1.0
    return a


def _both(fn, mesh, *args, **kwargs):
    got = fn(*args, mesh=mesh, **kwargs)
    sim.clear_caches()
    ref = fn(*args, **kwargs)
    return got, ref


def test_routes_through_sym_sharded(monkeypatch):
    """A plain self-similarity call with a mesh must take the sharded
    symmetric executor (not the general grouped path)."""
    import similaripy_tpu.engine.sym_sharded as ss

    hits = []
    orig = ss.execute_symmetric_sharded
    monkeypatch.setattr(
        ss, "execute_symmetric_sharded",
        lambda *a, **kw: (hits.append(1), orig(*a, **kw))[1],
    )
    m = _rand(30, 300, seed=3).T.tocsr()
    sim.cosine(m, k=9, verbose=False, mesh=make_mesh(rows=2, cols=4))
    assert hits, "mesh self-similarity call did not route through sym_sharded"


@pytest.mark.parametrize("rows,cols", MESH_SHAPES)
def test_cosine_matches_single_device(monkeypatch, rows, cols):
    monkeypatch.setenv("SIMILARIPY_TPU_SYM_TC", "128")
    monkeypatch.setenv("SIMILARIPY_TPU_SYM_GT", "2")
    mesh = make_mesh(rows=rows, cols=cols)
    m = _rand(70, 900, seed=11).T.tocsr()  # 8 tiles: multi-pair triangle
    got, ref = _both(sim.cosine, mesh, m, k=17, verbose=False)
    np.testing.assert_allclose(check_sum(got), check_sum(ref), rtol=1e-6)


@pytest.mark.parametrize(
    "call",
    [
        lambda m, **kw: sim.dot_product(m, **kw),
        lambda m, **kw: sim.cosine(m, shrink=5.0, **kw),
        lambda m, **kw: sim.asymmetric_cosine(m, alpha=0.2, **kw),
        lambda m, **kw: sim.jaccard(m, **kw),
        lambda m, **kw: sim.tversky(m, alpha=0.2, beta=0.9, **kw),
        lambda m, **kw: sim.rp3beta(m, alpha=0.7, beta=0.4, **kw),
        lambda m, **kw: sim.p3alpha(m, alpha=0.8, **kw),
        lambda m, **kw: sim.s_plus(m, l1=0.4, l2=0.6, t1=0.8, t2=0.8,
                                   c1=0.5, c2=0.5, **kw),
    ],
)
def test_similarities_match_single_device(monkeypatch, call):
    """Every epilogue family (incl. asymmetric col-side re-runs) on a
    2x4 mesh with a ragged triangle (5 tiles over 8 devices)."""
    monkeypatch.setenv("SIMILARIPY_TPU_SYM_TC", "128")
    monkeypatch.setenv("SIMILARIPY_TPU_SYM_GT", "1")
    mesh = make_mesh(rows=2, cols=4)
    m = _rand(50, 600, seed=7).T.tocsr()
    got, ref = _both(call, mesh, m, k=11, verbose=False)
    np.testing.assert_allclose(check_sum(got), check_sum(ref), rtol=1e-5)


def test_pallas_kernel_path(monkeypatch):
    """Fused dual-sided kernel inside shard_map (interpret mode)."""
    monkeypatch.setenv("SIMILARIPY_TPU_USE_PALLAS", "1")
    monkeypatch.setenv("SIMILARIPY_TPU_SYM_TC", "128")
    monkeypatch.setenv("SIMILARIPY_TPU_SYM_GT", "2")
    mesh = make_mesh(rows=4, cols=2)
    m = _rand(60, 700, seed=13).T.tocsr()
    got, ref = _both(sim.cosine, mesh, m, k=9, verbose=False)
    np.testing.assert_allclose(check_sum(got), check_sum(ref), rtol=1e-6)


def test_pallas_asym_epilogue(monkeypatch):
    monkeypatch.setenv("SIMILARIPY_TPU_USE_PALLAS", "1")
    monkeypatch.setenv("SIMILARIPY_TPU_SYM_TC", "128")
    monkeypatch.setenv("SIMILARIPY_TPU_SYM_GT", "1")
    mesh = make_mesh(rows=2, cols=4)
    m = _rand(40, 700, seed=37).T.tocsr()
    got, ref = _both(sim.tversky, mesh, m, alpha=0.2, beta=0.9, k=9,
                     verbose=False)
    np.testing.assert_allclose(check_sum(got), check_sum(ref), rtol=1e-6)


def test_single_tile_small_matrix(monkeypatch):
    """Fewer tiles than devices: most devices sweep only the padding tile."""
    mesh = make_mesh(rows=8, cols=1)
    m = _rand(30, 200, seed=17).T.tocsr()
    got, ref = _both(sim.cosine, mesh, m, k=5, verbose=False)
    np.testing.assert_allclose(check_sum(got), check_sum(ref), rtol=1e-6)


def test_float32_path(monkeypatch):
    monkeypatch.setenv("SIMILARIPY_TPU_SYM_TC", "128")
    monkeypatch.setenv("SIMILARIPY_TPU_SYM_GT", "2")
    mesh = make_mesh(rows=2, cols=4)
    m = _rand(45, 500, seed=19, integral=False).T.tocsr()
    got, ref = _both(sim.cosine, mesh, m, k=8, compute_dtype="float32",
                     verbose=False)
    np.testing.assert_allclose(check_sum(got), check_sum(ref), rtol=1e-5)


def test_edge_k_values(monkeypatch):
    monkeypatch.setenv("SIMILARIPY_TPU_SYM_TC", "128")
    mesh = make_mesh(rows=2, cols=4)
    m = _rand(30, 280, seed=23).T.tocsr()
    got, ref = _both(sim.jaccard, mesh, m, k=1, binary=True, verbose=False)
    np.testing.assert_allclose(check_sum(got), check_sum(ref), rtol=1e-6)
    sim.clear_caches()
    got, ref = _both(sim.jaccard, mesh, m, k=10_000, binary=True,
                     verbose=False)
    np.testing.assert_allclose(check_sum(got), check_sum(ref), rtol=1e-6)


def test_no_duplicate_neighbors_across_devices(monkeypatch):
    """Exactly-once delivery across the device partition: a block computed
    on two devices would surface as a repeated column id within a row."""
    monkeypatch.setenv("SIMILARIPY_TPU_SYM_TC", "128")
    monkeypatch.setenv("SIMILARIPY_TPU_SYM_GT", "2")
    mesh = make_mesh(rows=2, cols=4)
    m = _rand(80, 640, density=0.4, seed=17).T.tocsr()
    got = sim.dot_product(m, k=30, verbose=False, mesh=mesh).tocsr()
    for r in range(got.shape[0]):
        cols = got.indices[got.indptr[r] : got.indptr[r + 1]]
        assert len(set(cols.tolist())) == cols.shape[0], f"row {r} has dupes"


def test_f32x3_pallas_mesh(monkeypatch):
    """split-bf16x3 fused kernel inside shard_map (f32 + precision=high)."""
    monkeypatch.setenv("SIMILARIPY_TPU_USE_PALLAS", "1")
    monkeypatch.setenv("SIMILARIPY_TPU_SYM_TC", "128")
    monkeypatch.setenv("SIMILARIPY_TPU_SYM_GT", "2")
    mesh = make_mesh(rows=2, cols=4)
    m = _rand(45, 500, seed=19, integral=False).T.tocsr()
    got, ref = _both(sim.cosine, mesh, m, k=8, compute_dtype="float32",
                     precision="high", verbose=False)
    np.testing.assert_allclose(check_sum(got), check_sum(ref), rtol=1e-5)


def test_pallas_k_exceeds_tile_width_mesh(monkeypatch):
    """k > tc through the sharded fused path (carry-depth regression)."""
    monkeypatch.setenv("SIMILARIPY_TPU_USE_PALLAS", "1")
    monkeypatch.setenv("SIMILARIPY_TPU_SYM_TC", "128")
    monkeypatch.setenv("SIMILARIPY_TPU_SYM_GT", "2")
    mesh = make_mesh(rows=2, cols=4)
    m = _rand(60, 600, density=0.4, seed=3).T.tocsr()
    got, ref = _both(sim.dot_product, mesh, m, k=200, verbose=False)
    assert got.nnz == ref.nnz, (got.nnz, ref.nnz)
    np.testing.assert_allclose(check_sum(got), check_sum(ref), rtol=1e-6)


@pytest.mark.parametrize("use_pallas", ["0", "1"])
def test_shard_densify_matches_replicated(monkeypatch, use_pallas):
    """The sharded anchor densify (per-device entry slices + psum union)
    must be exact vs both the replicated densify and the single-device
    executor, on the XLA and fused (interpret) block paths."""
    monkeypatch.setenv("SIMILARIPY_TPU_USE_PALLAS", use_pallas)
    m = _rand(64, 500, density=0.2, seed=11).T.tocsr()  # 500 items
    mesh = make_mesh(rows=2, cols=4)

    monkeypatch.setenv("SIMILARIPY_TPU_SYM_SHARD_DENSIFY", "1")
    sharded = sim.cosine(m, k=7, verbose=False, mesh=mesh).tocsr()
    sim.clear_caches()
    monkeypatch.setenv("SIMILARIPY_TPU_SYM_SHARD_DENSIFY", "0")
    replicated = sim.cosine(m, k=7, verbose=False, mesh=mesh).tocsr()
    sim.clear_caches()
    monkeypatch.delenv("SIMILARIPY_TPU_SYM_SHARD_DENSIFY")
    single = sim.cosine(m, k=7, verbose=False).tocsr()

    # int8-exact path: the three results must agree exactly in value terms
    np.testing.assert_allclose(check_sum(sharded), check_sum(replicated),
                               rtol=1e-6)
    np.testing.assert_allclose(check_sum(sharded), check_sum(single),
                               rtol=1e-6)


def test_shard_densify_float_path(monkeypatch):
    m = _rand(48, 400, density=0.2, seed=12, integral=False).T.tocsr()
    mesh = make_mesh(rows=8, cols=1)
    monkeypatch.setenv("SIMILARIPY_TPU_SYM_SHARD_DENSIFY", "1")
    got, ref = _both(sim.cosine, mesh, m, k=6, verbose=False,
                     compute_dtype="float32")
    np.testing.assert_allclose(check_sum(got), check_sum(ref), rtol=1e-4)
