"""Audit the tracked compile cache against the headline + scoring programs.

The round driver wipes untracked files, so every compile-cache entry the
headline bench and the ML-32M scoring stage need must be GIT-TRACKED in
`.jax_cache` — a single missing entry costs the driver capture a
multi-minute round 0 (BENCH_r04: 142 s despite a 285 MB tracked cache,
because 4 headline entries were produced after the last cache commit and
never re-tracked). This audit exists to make that failure mode visible
BEFORE the driver runs (VERDICT r4 #1b):

  1. run the headline bench (1 round, no rests) and the full-scale
     scoring stage in subprocesses (the parent never imports jax — a
     parent holding a TPU client next to a TPU subprocess can leave the
     device resource-exhausted, see bench.py::ensure_kernel_stamp)
  2. diff the cache directory: any NEW file means a program the tracked
     cache could not serve (the run that found the miss also warmed it —
     `git add` the listed files to fix)
  3. any file untracked by git (new or preexisting) fails the audit

Usage: python benchmarks/cache_audit.py [--skip-scoring] [--scale S]
Exit 0 = every program was served from tracked entries.
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CACHE_DIR = os.path.join(REPO, ".jax_cache")


def _cache_files() -> set[str]:
    try:
        return set(os.listdir(CACHE_DIR))
    except FileNotFoundError:
        return set()


def _untracked_cache_files() -> list[str]:
    out = subprocess.run(
        ["git", "status", "--porcelain", "--", ".jax_cache"],
        cwd=REPO, capture_output=True, text=True,
    ).stdout
    return [
        line[3:].strip()
        for line in out.splitlines()
        if line.startswith("??")
    ]


def _run(label: str, cmd: list[str], env: dict) -> float:
    print(f"# audit: running {label}: {' '.join(cmd)}", flush=True)
    t0 = time.perf_counter()
    proc = subprocess.run(cmd, cwd=REPO, env=env)
    dt = time.perf_counter() - t0
    print(f"# audit: {label} rc={proc.returncode} in {dt:.1f}s", flush=True)
    if proc.returncode != 0:
        print(f"# audit: {label} FAILED — aborting", flush=True)
        sys.exit(2)
    return dt


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--skip-scoring", action="store_true",
                   help="audit only the headline bench programs")
    p.add_argument("--skip-headline", action="store_true",
                   help="audit only the scoring-stage programs")
    p.add_argument("--scale", default="1.0",
                   help="headline bench scale (audit the driver's 1.0)")
    args = p.parse_args(argv)

    before = _cache_files()
    pre_untracked = _untracked_cache_files()
    if pre_untracked:
        print(f"# audit: {len(pre_untracked)} cache files already untracked "
              "BEFORE the run (stale working tree?)", flush=True)

    # inherit the environment untouched EXCEPT the cache dir: the driver
    # and a plain `python` both reach the real TPU, and forcing a
    # different JAX_PLATFORMS here could change compile-cache keys away
    # from what the driver will use — but the audit watches CACHE_DIR,
    # so the subprocesses must write there (a stray exported
    # JAX_COMPILATION_CACHE_DIR would otherwise make every run look like
    # a perfect hit while the tracked cache silently misses everything)
    env = dict(os.environ)
    env["JAX_COMPILATION_CACHE_DIR"] = CACHE_DIR
    if not args.skip_headline:
        benv = dict(env)
        # one timed round, no adaptive extension, no rest cycles: the audit
        # cares about compile-cache service, not throughput
        benv.update({
            "SIMILARIPY_BENCH_ROUNDS": "1",
            "SIMILARIPY_BENCH_MAX_EXTRA": "0",
            "SIMILARIPY_BENCH_REST_BUDGET_S": "0",
            "SIMILARIPY_BENCH_DIAG": "0",
            "SIMILARIPY_BENCH_SCALE": args.scale,
        })
        _run("headline bench", [sys.executable, "bench.py"], benv)
    if not args.skip_scoring:
        _run("ml32m scoring", [
            sys.executable, "benchmarks/run_benchmarks.py",
            "--dataset", "movielens_32m", "--stage", "scoring",
            "--similarities", "cosine", "--precision", "high",
            "--rounds", "1", "--warmup", "1",
        ], env)

    new = sorted(_cache_files() - before)
    # tiny op-dispatch programs (dynamic_slice, broadcast_in_dim, ...)
    # appear incidentally with run-varying shapes and recompile in under
    # a second — only entries big enough to represent a real program
    # (multi-second to multi-minute compiles) count as audit failures
    min_bytes = int(os.environ.get("SIMILARIPY_AUDIT_MIN_BYTES", 64 * 1024))
    big_new = [
        f for f in new
        if os.path.getsize(os.path.join(CACHE_DIR, f)) >= min_bytes
    ]
    small_new = [f for f in new if f not in big_new]
    untracked = _untracked_cache_files()
    ok = True
    if small_new:
        print(f"# audit: {len(small_new)} trivial new entries (<{min_bytes}B,"
              " sub-second recompiles — informational only):", flush=True)
        for f in small_new:
            print(f"#   small {f}", flush=True)
    if big_new:
        ok = False
        print(f"# audit: {len(big_new)} cache MISSES (entries written by this "
              "run — the tracked cache could not serve these programs):",
              flush=True)
        for f in big_new:
            print(f"#   MISS {f}", flush=True)
    def _size(f: str) -> int:
        try:
            return os.path.getsize(
                os.path.join(CACHE_DIR, os.path.basename(f))
            )
        except OSError:
            return min_bytes  # unknown: treat as significant

    big_untracked = [f for f in untracked if _size(f) >= min_bytes]
    if big_untracked:
        ok = False
        print(f"# audit: {len(big_untracked)} cache files untracked by git "
              "(the driver wipes these between rounds):", flush=True)
        for f in big_untracked:
            print(f"#   UNTRACKED {f}", flush=True)
        print("# audit: fix with  git add .jax_cache && git commit", flush=True)
    if ok:
        print(f"# audit: OK — all programs served from the tracked cache "
              f"({len(before)} entries)", flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
