"""Benchmark CLI building blocks (host-only; no device work)."""

import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "benchmarks"))

from benchmark import BenchmarkResult, system_info  # noqa: E402
from compare_benchmarks import compare  # noqa: E402
from dataset_loaders import DATASETS, load_urm  # noqa: E402
from run_benchmarks import format_summary_table  # noqa: E402


def _result(name, mean, thr):
    r = BenchmarkResult(name=name, k=100, rounds=2)
    r.times_s = [mean, mean]
    r.mean_s = mean
    r.std_s = 0.0
    r.best_s = mean
    r.throughput_items_s = thr
    r.output_nnz = 1000
    r.avg_neighbors = 10.0
    return r


def test_system_info_has_backend():
    info = system_info()
    assert "platform" in info and "python" in info
    assert info.get("backend") in ("cpu", "tpu", "gpu", None)


def test_format_summary_table():
    table = format_summary_table([_result("cosine", 1.5, 666.0)])
    assert "cosine" in table and "666.0" in table


def test_compare_reports():
    base = {
        "dataset": "a", "system": {"backend": "cpu"},
        "results": [_result("cosine", 2.0, 500.0).to_dict()],
    }
    cand = {
        "dataset": "a", "system": {"backend": "tpu"},
        "results": [_result("cosine", 1.0, 1000.0).to_dict()],
    }
    out = compare(base, cand)
    assert "2.00x" in out


def test_result_roundtrips_json():
    r = _result("dot_product", 1.0, 100.0)
    assert json.loads(json.dumps(r.to_dict()))["name"] == "dot_product"


def test_synthetic_loader_shapes():
    urm, provenance = load_urm("synthetic_small")
    n_users, n_items, nnz = DATASETS["synthetic_small"]
    assert urm.shape == (n_users, n_items)
    assert 0.9 * nnz <= urm.nnz <= nnz
    assert provenance.startswith("synthetic:")


def test_unknown_dataset():
    with pytest.raises(ValueError):
        load_urm("nope")


def test_csv_loader(tmp_path):
    p = tmp_path / "ratings.csv"
    p.write_text("userId,movieId,rating\n1,10,4.0\n1,20,3.5\n2,10,5.0\n")
    urm, provenance = load_urm("movielens_32m", data_path=str(p))
    assert urm.shape == (2, 2)
    assert urm.nnz == 3
    np.testing.assert_allclose(urm.toarray(), [[4.0, 3.5], [5.0, 0.0]])
