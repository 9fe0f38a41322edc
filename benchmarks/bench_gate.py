"""Performance-regression gate: fresh bench vs the latest same-backend report.

Runs a quick benchmark (synthetic_small by default), then compares it
against the most recent compatible prior report in reports/ through
compare_benchmarks' --max-regression logic, failing (exit 1) when any
similarity regressed beyond the threshold. This turns the reference's
A/B comparison tables (reference: tests/benchmarks/compare_benchmarks.py)
into an automated gate: a throughput regression surfaces in CI / `make
bench-gate` instead of waiting for a human to read numbers.

Reports are only comparable on the same backend class (a CPU CI runner
must not be judged against a checked-in TPU report), so the prior-report
search additionally requires matching `system.backend` and device kind.
With no comparable prior report the fresh run becomes the new baseline
and the gate passes (bootstrap).

Usage:
    python benchmarks/bench_gate.py [--dataset synthetic_small]
        [--rounds 2] [--max-regression 0.10] [--output-dir reports]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benchmarks.compare_benchmarks import compare_reports, compatible  # noqa: E402


def _load(path: str) -> dict:
    with open(path) as f:
        return json.load(f)


def _same_machine_class(a: dict, b: dict) -> bool:
    sa, sb = a.get("system", {}), b.get("system", {})
    return (
        sa.get("backend") == sb.get("backend")
        and sa.get("devices") == sb.get("devices")
    )


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dataset", default="synthetic_small")
    p.add_argument("--data-path", default=None,
                   help="local ratings file overriding the dataset")
    p.add_argument("--similarities", nargs="+",
                   default=["dot_product", "cosine", "rp3beta"])
    p.add_argument("--k", type=int, default=100)
    p.add_argument("--rounds", type=int, default=2)
    p.add_argument("--warmup", type=int, default=1)
    p.add_argument("--max-regression", type=float, default=0.10)
    p.add_argument("--output-dir", default="reports")
    args = p.parse_args(argv)

    from benchmarks.run_benchmarks import main as run_main

    pattern = os.path.join(args.output_dir, f"benchmark_{args.dataset}_*.json")
    prior = sorted(glob.glob(pattern))
    # second-resolution report stamps can collide with a run from the same
    # second; track mtimes so the fresh report is found even if it reused
    # (overwrote) a prior filename
    prior_mtime = {p: os.path.getmtime(p) for p in prior}

    run_args = [
        "--dataset", args.dataset,
        "--similarities", *args.similarities,
        "--k", str(args.k),
        "--rounds", str(args.rounds),
        "--warmup", str(args.warmup),
        "--output-dir", args.output_dir,
    ]
    if args.data_path:
        run_args += ["--data-path", args.data_path]
    rc = run_main(run_args)
    if rc:
        print("bench-gate: benchmark run failed", file=sys.stderr)
        return rc

    fresh_paths = sorted(glob.glob(pattern))
    new_paths = [
        f for f in fresh_paths
        if f not in prior_mtime or os.path.getmtime(f) > prior_mtime[f]
    ]
    if not new_paths:
        print("bench-gate: no fresh report written", file=sys.stderr)
        return 1
    fresh = _load(new_paths[-1])

    baseline_path = None
    for path in reversed([p for p in prior if p not in new_paths]):
        rep = _load(path)
        if compatible(rep, fresh) and _same_machine_class(rep, fresh):
            baseline_path = path
            break
    if baseline_path is None:
        print(
            f"bench-gate: no comparable prior report for {args.dataset} on "
            f"this backend — fresh run ({new_paths[-1]}) is the new baseline; "
            "PASS (bootstrap)"
        )
        return 0

    print(f"bench-gate: comparing against {baseline_path} "
          f"(threshold {args.max_regression:.0%})")
    from pathlib import Path

    reports = [
        (Path(baseline_path), _load(baseline_path)),
        (Path(new_paths[-1]), fresh),
    ]
    return compare_reports(reports, None, args.max_regression)


if __name__ == "__main__":
    raise SystemExit(main())
