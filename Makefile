# similaripy_tpu developer targets (reference shape: Makefile:1-50)

.PHONY: install test native bench bench-small bench-medium bench-large clean

install:
	pip install -e .

native:
	python -m similaripy_tpu.native.build

test:
	python -m pytest tests/ -q

bench:
	python bench.py

bench-small:
	python benchmarks/run_benchmarks.py --dataset synthetic_small

bench-medium:
	python benchmarks/run_benchmarks.py --dataset synthetic_medium

bench-large:
	python benchmarks/run_benchmarks.py --dataset movielens_32m

# recommendation-scoring stage (users/s; see benchmarks/README.md)
bench-scoring:
	python benchmarks/run_benchmarks.py --dataset synthetic_medium \
	    --stage scoring --similarities cosine --precision high

clean:
	rm -rf build dist *.egg-info reports
	find . -name __pycache__ -type d -exec rm -rf {} +
	rm -f similaripy_tpu/native/libsimtpu.so

test-pallas:
	SIMILARIPY_TPU_USE_PALLAS=1 python -m pytest tests/ -q

# real-TPU validation sweep of every fused-kernel family vs the XLA path
# (re-run after ANY kernel edit — interpret mode misses Mosaic failures)
kernel-check:
	python benchmarks/tpu_kernel_check.py

# perf-regression gate: fresh quick bench vs the latest same-backend
# report, fail on >10% throughput drop (bootstrap-pass when none exists)
bench-gate:
	python benchmarks/bench_gate.py

# N-device scaling measurement, ready for the first multi-chip host:
# times the headline on 1 device vs an N-device mesh, checks exactness,
# prints measured-vs-modeled efficiency per stage (exit 3 = not enough
# devices). Smoke variant runs anywhere on a virtual CPU mesh.
bench-n2:
	python benchmarks/bench_n2.py --n 2

bench-n2-smoke:
	XLA_FLAGS=--xla_force_host_platform_device_count=8 \
	    python benchmarks/bench_n2.py --n 2 --smoke --force-cpu --rounds 1

# compile-cache completeness audit: run the headline bench + ML-32M
# scoring once and fail if any program was NOT served from the
# git-tracked .jax_cache (the driver wipes untracked entries, so a miss
# here means a multi-minute round 0 in the next driver capture)
cache-audit:
	python benchmarks/cache_audit.py
