"""Benchmark CLI building blocks (host-only; no device work)."""

import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "benchmarks"))

from benchmark import BenchmarkResult, system_info  # noqa: E402
import compare_benchmarks as cb  # noqa: E402
from dataset_loaders import DATASETS, _has_egress, load_urm  # noqa: E402
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


def test_compare_reports(tmp_path, capsys):
    base = {
        "dataset": "a", "k": 100, "rounds": 2, "system": {"backend": "cpu"},
        "results": [_result("cosine", 2.0, 500.0).to_dict()],
    }
    cand = {
        "dataset": "a", "k": 100, "rounds": 2, "system": {"backend": "tpu"},
        "results": [_result("cosine", 1.0, 1000.0).to_dict()],
    }
    pb = tmp_path / "benchmark_a_1.json"
    pc = tmp_path / "benchmark_a_2.json"
    pb.write_text(json.dumps(base))
    pc.write_text(json.dumps(cand))
    rc = cb.main([str(pb), str(pc), "--bench-dir", str(tmp_path)])
    out = capsys.readouterr().out
    assert rc == 0
    assert "2.00x" in out
    assert "backend: cpu -> tpu" in out


def test_compare_regression_gate(tmp_path, capsys):
    fast = {
        "dataset": "a", "k": 100, "rounds": 2, "system": {},
        "results": [_result("cosine", 1.0, 1000.0).to_dict()],
    }
    slow = {
        "dataset": "a", "k": 100, "rounds": 2, "system": {},
        "results": [_result("cosine", 2.0, 500.0).to_dict()],
    }
    pf = tmp_path / "benchmark_a_1.json"
    ps = tmp_path / "benchmark_a_2.json"
    pf.write_text(json.dumps(fast))
    ps.write_text(json.dumps(slow))
    rc = cb.main([str(pf), str(ps), "--max-regression", "0.10",
                  "--bench-dir", str(tmp_path)])
    assert rc == 1
    assert "REGRESSION" in capsys.readouterr().out


def test_compare_list_and_latest(tmp_path, capsys):
    for i, t in enumerate((3.0, 2.0, 1.0)):
        rep = {
            "dataset": "a", "k": 100, "rounds": 1, "system": {},
            "results": [_result("cosine", t, 100.0 / t).to_dict()],
        }
        (tmp_path / f"benchmark_a_{i}.json").write_text(json.dumps(rep))
    assert cb.main(["--list", "--bench-dir", str(tmp_path)]) == 0
    assert "3 report(s)" in capsys.readouterr().out
    assert cb.main(["--latest", "3", "--bench-dir", str(tmp_path)]) == 0
    out = capsys.readouterr().out
    assert "[B]" in out and "[C]" in out


def test_bench_gate_end_to_end(tmp_path, capsys):
    """bench_gate: bootstrap pass -> same-machine compare pass -> a forged
    faster baseline trips the regression gate."""
    import scipy.sparse as sp

    import bench_gate

    rng = np.random.default_rng(5)
    m = sp.random_array((300, 120), density=0.1, format="csr",
                        dtype=np.float32, random_state=rng)
    npz = tmp_path / "urm.npz"
    sp.save_npz(str(npz), sp.csr_matrix(m))
    out_dir = str(tmp_path / "reports")
    gate_args = [
        "--dataset", "synthetic_small", "--data-path", str(npz),
        "--similarities", "dot_product", "--k", "10", "--rounds", "1",
        "--warmup", "0", "--output-dir", out_dir,
    ]
    # 1) no prior report: bootstrap pass
    assert bench_gate.main(gate_args) == 0
    assert "bootstrap" in capsys.readouterr().out
    # 2) prior report exists, same machine: compared, passes
    assert bench_gate.main(gate_args) == 0
    assert "comparing against" in capsys.readouterr().out
    # 3) forge the latest baseline 100x faster: the fresh run regresses
    import glob

    latest = sorted(glob.glob(os.path.join(out_dir, "*.json")))[-1]
    rep = json.load(open(latest))
    for r in rep["results"]:
        r["mean_s"] /= 100.0
        r["throughput_items_s"] *= 100.0
    with open(latest, "w") as f:
        json.dump(rep, f)
    assert bench_gate.main(gate_args) == 1
    assert "REGRESSION" in capsys.readouterr().out
    # 4) different backend class is never compared (no false CI failures)
    for p in glob.glob(os.path.join(out_dir, "*.json")):
        rep = json.load(open(p))
        rep["system"]["backend"] = "other"
        with open(p, "w") as f:
            json.dump(rep, f)
    assert bench_gate.main(gate_args) == 0
    assert "bootstrap" in capsys.readouterr().out


def test_kernel_stamp_tracks_source_hash(tmp_path, monkeypatch):
    import kernel_stamp as ks

    monkeypatch.setattr(ks, "STAMP_PATH", str(tmp_path / "kc.stamp"))
    assert not ks.stamp_is_current()  # no stamp yet
    ks.write_stamp("quick", "tpu")
    assert ks.stamp_is_current()
    st = ks.read_stamp()
    assert st["mode"] == "quick" and st["backend"] == "tpu"
    # a kernel-source edit invalidates the stamp
    monkeypatch.setattr(ks, "kernel_hash", lambda: "deadbeef")
    assert not ks.stamp_is_current()


def test_kernel_stamp_geometry_hash(tmp_path, monkeypatch):
    """Geometry-source CODE edits (e.g. a tile constant) invalidate the
    stamp; comment/docstring edits do not (VERDICT r4 #5)."""
    import kernel_stamp as ks

    geo = tmp_path / "geo.py"
    geo.write_text('"""doc."""\nSYM_TM = 512  # measured best\n')
    monkeypatch.setattr(ks, "_GEOMETRY_SOURCES", (str(geo),))
    monkeypatch.setattr(ks, "STAMP_PATH", str(tmp_path / "kc.stamp"))
    ks.write_stamp("quick", "tpu")
    assert ks.stamp_is_current()
    # comment + docstring churn: still current (no forced re-sweep)
    geo.write_text('"""new doc."""\nSYM_TM = 512  # re-annotated\n')
    assert ks.stamp_is_current()
    # a real constant change: stale
    geo.write_text('"""new doc."""\nSYM_TM = 1024  # re-annotated\n')
    assert not ks.stamp_is_current()


def test_cache_audit_flags_new_and_untracked_entries(tmp_path, monkeypatch, capsys):
    """cache_audit fails when a benchmark run writes a new compile-cache
    entry (= the tracked cache missed) or when entries sit untracked."""
    import cache_audit as ca

    cache = tmp_path / ".jax_cache"
    cache.mkdir()
    (cache / "jit_old-cache").write_bytes(b"x")
    monkeypatch.setattr(ca, "CACHE_DIR", str(cache))
    monkeypatch.setattr(ca, "_untracked_cache_files", lambda: [])
    calls = []

    def fake_run(label, cmd, env):
        calls.append(label)
        return 0.1

    monkeypatch.setattr(ca, "_run", fake_run)
    # all programs served: OK
    assert ca.main([]) == 0
    assert calls == ["headline bench", "ml32m scoring"]
    assert "OK" in capsys.readouterr().out
    # a run that writes a fresh entry: MISS -> fail (sized above the
    # trivial-program threshold; tiny op-dispatch entries are
    # informational only)
    def miss_run(label, cmd, env):
        (cache / f"jit_{label.split()[0]}-cache").write_bytes(b"y" * (64 << 10))
        return 0.1

    monkeypatch.setattr(ca, "_run", miss_run)
    assert ca.main(["--skip-scoring"]) == 1
    assert "MISS" in capsys.readouterr().out
    # a tiny fresh entry does NOT fail the audit
    def small_run(label, cmd, env):
        (cache / f"jit_small_{len(calls)}-cache").write_bytes(b"y")
        calls.append(label)
        return 0.1

    monkeypatch.setattr(ca, "_run", small_run)
    assert ca.main(["--skip-scoring"]) == 0
    assert "trivial new entries" in capsys.readouterr().out
    # untracked-by-git entries fail even without a miss
    monkeypatch.setattr(ca, "_run", fake_run)
    monkeypatch.setattr(ca, "_untracked_cache_files", lambda: ["jit_x-cache"])
    assert ca.main(["--skip-scoring", "--skip-headline"]) == 1
    assert "UNTRACKED" in capsys.readouterr().out


def test_scoring_stage_end_to_end(tmp_path, capsys):
    """--stage scoring builds the model untimed, scores all users with
    filter_cols=urm, and writes a stage-tagged report."""
    import glob

    import scipy.sparse as sp

    import run_benchmarks as rb

    rng = np.random.default_rng(7)
    m = sp.random_array((200, 80), density=0.1, format="csr",
                        dtype=np.float32, random_state=rng)
    npz = tmp_path / "urm.npz"
    sp.save_npz(str(npz), sp.csr_matrix(m))
    out_dir = str(tmp_path / "reports")
    rc = rb.main([
        "--dataset", "synthetic_small", "--data-path", str(npz),
        "--stage", "scoring", "--similarities", "cosine",
        "--k", "20", "--scoring-k", "5", "--rounds", "1", "--warmup", "0",
        "--output-dir", out_dir,
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "users/s" in out
    reports = glob.glob(os.path.join(out_dir, "benchmark_*_scoring_*.json"))
    assert len(reports) == 1
    rep = json.load(open(reports[0]))
    assert rep["stage"] == "scoring"
    (res,) = rep["results"]
    assert res["name"] == "scoring[cosine]"
    assert res["n_rows"] == 200 and res["n_cols"] == 80
    assert res["k"] == 5
    # k=5 recs per user, minus rows whose candidates were fully filtered
    assert 0 < res["output_nnz"] <= 200 * 5


def test_egress_probe_is_fast():
    import time

    t0 = time.perf_counter()
    _has_egress(timeout=0.5)
    assert time.perf_counter() - t0 < 5.0


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
