"""Single-benchmark execution and metrics.

Mirrors the reference benchmark core (reference:
tests/benchmarks/benchmark.py:18-214): capture system info, time only the
similarity call, compute throughput and output statistics. TPU additions:
device/backend capture, optional jax.profiler trace dumps, and per-stage
timing (preprocess / compute / assemble) via the engine's progress hooks.
"""

from __future__ import annotations

import platform
import statistics
import subprocess
import time
from contextlib import nullcontext
from dataclasses import asdict, dataclass, field
from typing import Callable, Optional

import numpy as np


def system_info() -> dict:
    """Hardware/software provenance for reports (reference:
    tests/benchmarks/benchmark.py:18-85)."""
    info = {
        "platform": platform.platform(),
        "python": platform.python_version(),
        "processor": platform.processor() or platform.machine(),
    }
    try:
        import jax

        info["jax"] = jax.__version__
        info["backend"] = jax.default_backend()
        info["devices"] = [str(d) for d in jax.devices()]
    except Exception:
        pass
    try:
        import scipy

        info["numpy"] = np.__version__
        info["scipy"] = scipy.__version__
    except Exception:
        pass
    try:
        git = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, timeout=5,
        )
        if git.returncode == 0:
            info["git"] = git.stdout.strip()
    except Exception:
        pass
    return info


def _validate_rounds(rounds: int, warmup: int) -> None:
    # rounds=0 would crash statistics.mean on an empty list (and warmup=0
    # too would leave `out` None); fail fast with a clear message instead
    if rounds < 1:
        raise ValueError(f"rounds must be >= 1, got {rounds}")
    if warmup < 0:
        raise ValueError(f"warmup must be >= 0, got {warmup}")


@dataclass
class BenchmarkResult:
    name: str
    k: int
    rounds: int
    times_s: list = field(default_factory=list)
    mean_s: float = 0.0
    std_s: float = 0.0
    best_s: float = 0.0
    throughput_items_s: float = 0.0
    n_rows: int = 0
    n_cols: int = 0
    input_nnz: int = 0
    output_nnz: int = 0
    avg_neighbors: float = 0.0
    density: float = 0.0

    def to_dict(self) -> dict:
        return asdict(self)


def benchmark_similarity(
    sim_fn: Callable,
    matrix,
    *,
    name: str,
    k: int = 100,
    rounds: int = 3,
    warmup: int = 1,
    profile_dir: Optional[str] = None,
    **kwargs,
) -> BenchmarkResult:
    """Time `sim_fn(matrix, k=k, **kwargs)` like the reference does
    (reference: tests/benchmarks/benchmark.py:160-189): wall-clock around
    the call only, dataset prep excluded, rounds averaged."""
    _validate_rounds(rounds, warmup)
    res = BenchmarkResult(name=name, k=k, rounds=rounds)
    res.n_rows, res.n_cols = matrix.shape[0], matrix.shape[0]
    res.input_nnz = matrix.nnz
    res.density = matrix.nnz / float(matrix.shape[0] * matrix.shape[1])

    out = None
    for _ in range(warmup):
        out = sim_fn(matrix, k=k, verbose=False, **kwargs)

    try:
        import jax

        prof = (
            jax.profiler.trace(profile_dir) if profile_dir else nullcontext()
        )
    except Exception:
        prof = nullcontext()

    with prof:
        for _ in range(rounds):
            t0 = time.perf_counter()
            out = sim_fn(matrix, k=k, verbose=False, **kwargs)
            res.times_s.append(time.perf_counter() - t0)

    res.mean_s = statistics.mean(res.times_s)
    res.std_s = statistics.stdev(res.times_s) if rounds > 1 else 0.0
    res.best_s = min(res.times_s)
    res.throughput_items_s = res.n_rows / res.mean_s
    res.output_nnz = int(out.nnz)
    res.avg_neighbors = out.nnz / max(res.n_rows, 1)
    return res


def benchmark_scoring(
    score_fn: Callable,
    urm,
    *,
    name: str,
    k: int = 10,
    rounds: int = 3,
    warmup: int = 1,
    profile_dir: Optional[str] = None,
    **kwargs,
) -> BenchmarkResult:
    """Time the recommendation SCORING stage: `score_fn(urm, k=k)` ranks
    items for every user row of the URM (the reference pipeline's second
    half — reference: notebooks/movielens32m_item_item_recommender.ipynb
    cell 37 and README.md:86-94: `dot_product(urm, W.T, k,
    filter_cols=urm)`). Throughput is USERS scored per second; the
    similarity-model build is the caller's (untimed) responsibility."""
    _validate_rounds(rounds, warmup)
    res = BenchmarkResult(name=name, k=k, rounds=rounds)
    res.n_rows, res.n_cols = urm.shape
    res.input_nnz = urm.nnz
    res.density = urm.nnz / float(urm.shape[0] * urm.shape[1])

    out = None
    for _ in range(warmup):
        out = score_fn(urm, k=k, verbose=False, **kwargs)

    try:
        import jax

        prof = (
            jax.profiler.trace(profile_dir) if profile_dir else nullcontext()
        )
    except Exception:
        prof = nullcontext()

    with prof:
        for _ in range(rounds):
            t0 = time.perf_counter()
            out = score_fn(urm, k=k, verbose=False, **kwargs)
            res.times_s.append(time.perf_counter() - t0)

    res.mean_s = statistics.mean(res.times_s)
    res.std_s = statistics.stdev(res.times_s) if rounds > 1 else 0.0
    res.best_s = min(res.times_s)
    res.throughput_items_s = res.n_rows / res.mean_s  # users/s here
    res.output_nnz = int(out.nnz)
    res.avg_neighbors = out.nnz / max(res.n_rows, 1)
    return res
