"""bench.py control-flow tests with a stubbed engine.

The real headline benchmark needs TPU hardware and minutes of runtime;
these tests pin the harness logic around it — escalating rest cycles,
the diagnostic lap round, and the reported best — by stubbing
sim.cosine and the dataset load (VERDICT r4 #1c).
"""

import json
import os
import sys
import types

import numpy as np
import pytest
import scipy.sparse as sp

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402


class _FakeResult:
    nnz = 123

    def tocsr(self):
        return sp.csr_array((3, 3))


def _run_main(monkeypatch, tmp_path, env, sleeps):
    monkeypatch.setenv("JAX_COMPILATION_CACHE_DIR", str(tmp_path / "jc"))
    monkeypatch.setenv("SIMILARIPY_BENCH_SETTLE_S", "0")
    for k, v in env.items():
        monkeypatch.setenv(k, v)

    urm = sp.random_array((40, 30), density=0.2, format="csr",
                          dtype=np.float32, random_state=0)
    import similaripy_tpu.utils.npz_cache as npz_cache

    monkeypatch.setattr(npz_cache, "cached_npz",
                        lambda *a, **kw: (urm, True))

    import similaripy_tpu as sim

    calls = []

    def fake_cosine(m, k=100, verbose=False):
        calls.append(1)
        return _FakeResult()

    monkeypatch.setattr(sim, "cosine", fake_cosine)
    monkeypatch.setattr(bench, "_sample_recall", lambda *a, **kw: 1.0)
    monkeypatch.setattr(bench, "ensure_kernel_stamp", lambda: None)
    import time as time_mod

    monkeypatch.setattr(time_mod, "sleep", lambda s: sleeps.append(s))
    bench.main()
    return calls


def test_bench_reports_best_and_runs_diag(monkeypatch, tmp_path, capsys):
    sleeps = []
    calls = _run_main(
        monkeypatch, tmp_path,
        {"SIMILARIPY_BENCH_SCALE": "0.5",  # != 1.0: no rest loop
         "SIMILARIPY_BENCH_ROUNDS": "2",
         "SIMILARIPY_BENCH_MAX_EXTRA": "0"},
        sleeps,
    )
    out = capsys.readouterr()
    line = json.loads(out.out.strip().splitlines()[-1])
    assert line["metric"] == "ml32m_item_item_cosine_k100"
    assert line["value"] > 0 and "vs_baseline" in line
    # warmup + 2 timed + 1 diagnostic round
    assert len(calls) == 4
    assert "diagnostic round" in out.err and "d2h probe" in out.err
    # the diag round must not leak the TIMING env to later callers
    assert "SIMILARIPY_TPU_TIMING" not in os.environ


def test_bench_escalating_rest_doubles_and_respects_budget(
    monkeypatch, tmp_path, capsys
):
    sleeps = []
    # stub rounds are microseconds, so force the "degraded" branch by
    # making the clean-window best unreachable
    monkeypatch.setattr(bench, "CLEAN_BEST_S", -1.0)
    calls = _run_main(
        monkeypatch, tmp_path,
        {"SIMILARIPY_BENCH_SCALE": "1.0",
         "SIMILARIPY_BENCH_ROUNDS": "1",
         "SIMILARIPY_BENCH_MAX_EXTRA": "0",
         "SIMILARIPY_BENCH_DIAG": "0",
         "SIMILARIPY_BENCH_REST_S": "10",
         "SIMILARIPY_BENCH_REST_BUDGET_S": "30"},
        sleeps,
    )
    # rests escalate 10 -> 20, then the 30s budget is spent (next would
    # need 40); two cycles x two rounds + warmup + 1 timed
    assert sleeps == [10, 20]
    assert len(calls) == 2 + 4
    assert "rest budget" in capsys.readouterr().err


def test_bench_no_rest_when_within_band(monkeypatch, tmp_path, capsys):
    sleeps = []
    monkeypatch.setattr(bench, "CLEAN_BEST_S", 1e9)  # any round is "clean"
    calls = _run_main(
        monkeypatch, tmp_path,
        {"SIMILARIPY_BENCH_SCALE": "1.0",
         "SIMILARIPY_BENCH_ROUNDS": "1",
         "SIMILARIPY_BENCH_MAX_EXTRA": "0",
         "SIMILARIPY_BENCH_DIAG": "0"},
        sleeps,
    )
    assert sleeps == []
    assert len(calls) == 2  # warmup + 1 timed, no rest rounds
