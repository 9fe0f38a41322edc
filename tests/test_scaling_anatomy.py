"""Scaling-anatomy evidence for the sharded symmetric executor.

docs/distributed.md claims per-device MXU block products and inner-tile
scatters scale 1/N while anchor densifies stay replicated (~12% of the
1-chip schedule time). These tests pin those claims against
sym_sharded.schedule_anatomy, which replays the executor's OWN schedule
helpers (_pair_schedule/_sweep_windows — the same objects
execute_symmetric_sharded iterates), and emit the numbers into
reports/scaling_anatomy.json via benchmarks/scaling_anatomy.py.
"""

import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from similaripy_tpu.engine.sym_sharded import (  # noqa: E402
    _pair_schedule,
    _sweep_windows,
    schedule_anatomy,
)

ML32M = {"C": 84_432, "U": 200_948, "nnz": 31_468_483}
BUDGET = 12 << 30  # fixed budget so the plan is deterministic across hosts


def _anatomy(N):
    return schedule_anatomy(**ML32M, N=N, budget=BUDGET)


def test_schedule_covers_every_window_exactly():
    # the per-device counts must partition the schedule: summed over
    # devices they equal the serial window totals for every N
    a1 = _anatomy(1)
    serial_products = sum(a1["products_per_device"])
    serial_scatters = sum(a1["scatters_per_device"])
    gt, nt = a1["gt"], a1["n_tiles_dev"]
    n_groups = nt // gt
    want_products = sum(
        (c1 - c0) * n_anchors
        for pair in _pair_schedule(n_groups, a1["dual"])
        for n_anchors, c0, c1 in _sweep_windows(pair, gt, nt)
    )
    assert serial_products == want_products
    for n in (2, 4, 8):
        a = _anatomy(n)
        assert sum(a["products_per_device"]) == serial_products
        assert sum(a["scatters_per_device"]) == serial_scatters


def test_products_and_scatters_scale_inverse_n():
    a1 = _anatomy(1)
    p1 = max(a1["products_per_device"])
    s1 = max(a1["scatters_per_device"])
    prev_p = float("inf")
    for n in (2, 4, 8):
        a = _anatomy(n)
        p = max(a["products_per_device"])
        s = max(a["scatters_per_device"])
        # 1/N up to the chunk-granularity slack: each sweep window can
        # leave at most one partially-filled dispatch per device
        windows = 2 * a["n_pairs"]
        assert p <= p1 / n + 2 * windows, (n, p, p1)
        assert s <= s1 / n + windows, (n, s, s1)
        assert p <= prev_p
        prev_p = p


def test_anchor_densifies_stay_replicated():
    counts = {n: _anatomy(n)["anchor_densifies_per_device"]
              for n in (1, 2, 4, 8)}
    assert len(set(counts.values())) == 1  # same on every device at every N


def test_time_model_matches_documented_fractions(tmp_path):
    from benchmarks.scaling_anatomy import anatomy_table

    table = anatomy_table(**ML32M)
    rows = {r["N"]: r for r in table["mesh_sizes"]}
    # docs/distributed.md: anchor densifies ~12% of the 1-chip schedule
    frac1 = rows[1]["anchor_densify_time_fraction"]
    assert 0.08 <= frac1 <= 0.17, frac1
    # the replicated term grows as a fraction when everything else shrinks
    assert rows[8]["anchor_densify_time_fraction"] > frac1
    # modeled speedups are monotone but sub-linear at this geometry
    sp = [rows[n]["modeled_speedup_vs_1dev"] for n in (1, 2, 4, 8)]
    assert sp == sorted(sp)
    assert sp[-1] < 8.0
    # PINNED: the 1-chip modeled schedule total must stay inside the
    # MEASURED clean-window band (9.11-10.5 s warm rounds, r3; the model
    # matched 9.9 s) — this is what makes the N>1 efficiency claim
    # falsifiable the day multi-chip hardware shows up (VERDICT r4 #4).
    # If a model or engine change moves this, re-validate against laps
    # before loosening the band.
    total_1 = rows[1]["modeled_seconds"]["total"]
    assert 8.0 <= total_1 <= 11.5, total_1


def test_bench_n2_harness_smoke(tmp_path):
    """The multi-chip measurement harness (make bench-n2) runs end-to-end
    on a virtual CPU mesh: times 1-dev vs 2-dev, check_sums the results,
    and writes measured-vs-modeled efficiency (VERDICT r4 #4)."""
    import json
    import subprocess

    out = tmp_path / "n2.json"
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    env["PYTHONPATH"] = os.pathsep.join(
        [REPO] + [p for p in env.get("PYTHONPATH", "").split(os.pathsep) if p]
    )
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "benchmarks", "bench_n2.py"),
         "--n", "2", "--smoke", "--force-cpu", "--rounds", "1",
         "--out", str(out)],
        capture_output=True, text=True, timeout=600, env=env, cwd=REPO,
    )
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    rep = json.loads(out.read_text())
    assert rep["mode"] == "smoke" and rep["check_sum_ok"] is True
    assert rep["n"] == 2 and "measured_efficiency" in rep
    assert set(rep["best_s"]) == {"1", "2"}

    # scoring stage: the filtered recommendation call on the mesh, exact
    # vs single-device (no schedule model — measured numbers only)
    out2 = tmp_path / "n2_scoring.json"
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "benchmarks", "bench_n2.py"),
         "--n", "2", "--smoke", "--force-cpu", "--rounds", "1",
         "--stage", "scoring", "--out", str(out2)],
        capture_output=True, text=True, timeout=600, env=env, cwd=REPO,
    )
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    rep2 = json.loads(out2.read_text())
    assert rep2["stage"] == "scoring" and rep2["check_sum_ok"] is True
    assert rep2["modeled_efficiency"] is None


@pytest.mark.skipif(os.environ.get("CI") == "true", reason="writes reports/")
def test_report_emitted():
    from benchmarks.scaling_anatomy import main

    out = os.path.join(REPO, "reports", "scaling_anatomy.json")
    assert main(["--out", out]) == 0
    assert os.path.exists(out)
