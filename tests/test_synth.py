"""Synthetic dataset generator properties (bench.py's data source)."""

import numpy as np

from similaripy_tpu.utils.synth import synthetic_urm


def test_shape_and_nnz_target():
    urm = synthetic_urm(n_users=5000, n_items=2000, nnz=100_000, seed=3)
    assert urm.shape == (5000, 2000)
    assert urm.nnz == 100_000  # top-up loop must hit the target exactly


def test_half_star_value_domain():
    urm = synthetic_urm(n_users=2000, n_items=1000, nnz=30_000)
    assert set(np.unique(urm.data)) <= set(np.arange(0.5, 5.5, 0.5).astype(np.float32))


def test_binary_mode():
    urm = synthetic_urm(n_users=2000, n_items=1000, nnz=30_000, ratings="binary")
    assert (urm.data == 1.0).all()


def test_power_law_degrees():
    urm = synthetic_urm(n_users=5000, n_items=2000, nnz=200_000, seed=1)
    d_item = np.diff(urm.tocsc().indptr)
    # strong popularity skew: the top 1% of items should hold far more
    # than 1% of interactions
    top = np.sort(d_item)[-len(d_item) // 100 :].sum()
    assert top / urm.nnz > 0.10


def test_deterministic_by_seed():
    a = synthetic_urm(n_users=1000, n_items=500, nnz=20_000, seed=9)
    b = synthetic_urm(n_users=1000, n_items=500, nnz=20_000, seed=9)
    assert (a != b).nnz == 0
