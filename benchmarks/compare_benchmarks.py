"""A/B comparison of two benchmark JSON reports.

Mirrors the reference comparison CLI (reference:
tests/benchmarks/compare_benchmarks.py): align similarities by name,
report speedups and throughput ratios.

Usage: python benchmarks/compare_benchmarks.py baseline.json candidate.json
"""

from __future__ import annotations

import argparse
import json
import sys


def load(path: str) -> dict:
    with open(path) as f:
        return json.load(f)


def compare(base: dict, cand: dict) -> str:
    base_by = {r["name"]: r for r in base["results"]}
    cand_by = {r["name"]: r for r in cand["results"]}
    names = [n for n in base_by if n in cand_by]
    header = (
        f"{'similarity':<20}{'base (s)':>10}{'cand (s)':>10}{'speedup':>9}"
        f"{'base it/s':>12}{'cand it/s':>12}"
    )
    lines = [
        f"baseline:  {base.get('dataset')} on {base.get('system', {}).get('backend')}",
        f"candidate: {cand.get('dataset')} on {cand.get('system', {}).get('backend')}",
        "",
        header,
        "-" * len(header),
    ]
    for n in names:
        b, c = base_by[n], cand_by[n]
        speed = b["mean_s"] / c["mean_s"] if c["mean_s"] else float("inf")
        lines.append(
            f"{n:<20}{b['mean_s']:>10.2f}{c['mean_s']:>10.2f}{speed:>8.2f}x"
            f"{b['throughput_items_s']:>12.1f}{c['throughput_items_s']:>12.1f}"
        )
    missing = sorted(set(base_by) ^ set(cand_by))
    if missing:
        lines.append(f"\n(not in both reports: {', '.join(missing)})")
    return "\n".join(lines)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("baseline")
    p.add_argument("candidate")
    args = p.parse_args(argv)
    print(compare(load(args.baseline), load(args.candidate)))
    return 0


if __name__ == "__main__":
    sys.exit(main())
