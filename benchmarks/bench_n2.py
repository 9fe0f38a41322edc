"""Multi-chip scaling harness for the sharded symmetric headline.

This environment has ONE TPU chip, so the N>1 efficiency story rests on
(a) CPU-mesh exactness tests and (b) the schedule-replay time model
(benchmarks/scaling_anatomy.py, pinned against 1-chip measured laps).
This harness is the third leg, ready to run the day a multi-chip host
shows up (VERDICT r4 #4): `make bench-n2` times the ML-32M headline
(item-item cosine, k=100) on 1 device and on an N-device mesh, checks
the results agree (check_sum), and prints measured-vs-modeled speedup
and efficiency per stage (the modeled per-stage seconds come from
anatomy_table at the same geometry; a diagnostic round prints the
engine's per-stage laps next to them).

Usage:
  make bench-n2                         # N=2, ML-32M scale, real chips
  python benchmarks/bench_n2.py --n 4   # any mesh size the host has
  python benchmarks/bench_n2.py --smoke --force-cpu   # tiny CPU smoke
    (run with XLA_FLAGS=--xla_force_host_platform_device_count=8 to get
     a virtual 8-device mesh; this is what the test suite exercises)

Exit codes: 0 ok, 3 = not enough devices (skip, not failure).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--n", type=int, default=2, help="mesh size to measure")
    p.add_argument("--scale", type=float, default=1.0,
                   help="fraction of ML-32M nnz (measured mode)")
    p.add_argument("--rounds", type=int, default=3)
    p.add_argument("--k", type=int, default=100)
    p.add_argument("--stage", default="similarity",
                   choices=["similarity", "scoring"],
                   help="'scoring' measures the filtered recommendation "
                        "stage (users/s) on the mesh instead of the "
                        "item-item build")
    p.add_argument("--smoke", action="store_true",
                   help="tiny matrix; proves the harness end-to-end on any "
                        "backend (virtual CPU mesh ok), no timing claims")
    p.add_argument("--force-cpu", action="store_true",
                   help="pin the CPU platform before jax init (the env var "
                        "alone is overridden by the PJRT plugin)")
    p.add_argument("--out", default=None,
                   help="report path (default reports/bench_n2_<ts>.json)")
    args = p.parse_args(argv)

    if args.force_cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    elif not args.smoke:
        from similaripy_tpu.utils.env import enable_persistent_compile_cache

        enable_persistent_compile_cache(os.path.join(REPO, ".jax_cache"))
    import jax

    import similaripy_tpu as sim
    from similaripy_tpu.parallel import make_mesh

    have = jax.device_count()
    if have < args.n:
        print(f"# bench-n2: need {args.n} devices, have {have} "
              f"({jax.default_backend()}) — skipping (exit 3). On a "
              "multi-chip host this runs as-is; for a virtual mesh use "
              "--smoke --force-cpu with "
              "XLA_FLAGS=--xla_force_host_platform_device_count=8",
              flush=True)
        return 3

    from similaripy_tpu.utils.synth import synthetic_urm

    if args.smoke:
        urm = synthetic_urm(n_users=3000, n_items=800, nnz=40_000, seed=0)
    else:
        from similaripy_tpu.utils.npz_cache import cached_npz
        from similaripy_tpu.utils.synth import (
            ML32M_ITEMS,
            ML32M_NNZ,
            ML32M_USERS,
        )

        urm, _ = cached_npz(
            os.path.join(REPO, f".bench_data_{args.scale}.npz"),
            lambda: synthetic_urm(nnz=int(ML32M_NNZ * args.scale)),
            expect_shape=(ML32M_USERS, ML32M_ITEMS),
        )
    item_user = urm.T.tocsr()
    n_items = item_user.shape[0]
    print(f"# bench-n2: {n_items} items x {item_user.shape[1]} users, "
          f"nnz={item_user.nnz:,}, backend={jax.default_backend()}, "
          f"devices={have}, mesh sizes [1, {args.n}]", flush=True)

    if args.stage == "scoring":
        # the recommendation stage: model built once (untimed, single
        # device), then each mesh size times the filtered scoring of ALL
        # users — the sharded grouped executor carries the MATRIX
        # selector, and the exclude-seen fold applies on-mesh too.
        # NOTE on accounting: the N=1 baseline runs the single-device
        # grouped executor (wide-tile planner, 512/1536 blocks) while
        # N>1 runs the sharded grouped path with its own plan — the
        # efficiency is honestly measured against the BEST single-device
        # engine, so plan differences show up as (real) scaling cost.
        model = sim.cosine(item_user, k=args.k, verbose=False)
        model_t = model.T.tocsr()  # hoisted: time only the scoring call

        def work(mesh):
            return sim.dot_product(
                urm, model_t, k=10, filter_cols=urm,
                compute_dtype="float32", precision="high",
                verbose=False, mesh=mesh,
            )

        n_units, unit = urm.shape[0], "users"
    else:
        def work(mesh):
            return sim.cosine(item_user, k=args.k, verbose=False, mesh=mesh)

        n_units, unit = n_items, "items"

    results = {}
    sums = {}
    for n in (1, args.n):
        if n in results:
            continue
        mesh = None if n == 1 else make_mesh(rows=1, cols=n)
        times = []
        w = None
        for r in range(args.rounds + 1):
            t0 = time.perf_counter()
            w = work(mesh)
            dt = time.perf_counter() - t0
            print(f"# N={n} round {r}: {dt:.2f}s "
                  f"({n_units / dt:.0f} {unit}/s)", flush=True)
            if r > 0:
                times.append(dt)
        results[n] = min(times)
        sums[n] = (float(w.data.sum()), int(w.nnz))
        if not args.smoke:
            # diagnostic round: engine per-stage laps for this mesh size,
            # printed next to the modeled per-stage seconds below
            os.environ["SIMILARIPY_TPU_TIMING"] = "1"
            print(f"# N={n} diagnostic round (per-stage laps):", flush=True)
            work(mesh)
            os.environ.pop("SIMILARIPY_TPU_TIMING", None)

    # exactness: the sharded schedule must reproduce the 1-device result
    s1, sN = sums[1], sums[args.n]
    check_ok = sN[1] == s1[1] and abs(sN[0] - s1[0]) <= 1e-5 * max(abs(s1[0]), 1.0)
    speedup = results[1] / results[args.n]
    efficiency = speedup / args.n

    C, U = item_user.shape
    m1 = mN = None
    if args.stage == "similarity":
        # the schedule-replay model covers the symmetric (self-sim)
        # executor only; scoring mode reports measured numbers alone
        from benchmarks.scaling_anatomy import anatomy_table

        table = anatomy_table(C=C, U=U, nnz=item_user.nnz, n_list=(1, args.n))
        modeled = {r["N"]: r for r in table["mesh_sizes"]}
        m1, mN = modeled[1], modeled[args.n]
        print("# modeled per-stage seconds (schedule replay x measured "
              "1-chip rates):", flush=True)
        for n, m in ((1, m1), (args.n, mN)):
            s = m["modeled_seconds"]
            print(f"#   N={n}: mxu {s['mxu']:.2f}  inner-scatter "
                  f"{s['inner_scatters']:.2f}  anchor-densify "
                  f"{s['anchor_densifies_replicated']:.2f}  total "
                  f"{s['total']:.2f}", flush=True)
    modeled_note = (
        f" (modeled {mN['modeled_speedup_vs_1dev']:.2f}x / "
        f"{mN['modeled_efficiency']:.1%})" if mN is not None else ""
    )
    print(
        f"# measured: 1dev {results[1]:.2f}s, {args.n}dev "
        f"{results[args.n]:.2f}s -> speedup {speedup:.2f}x, efficiency "
        f"{efficiency:.1%}{modeled_note}; check_sum "
        f"{'OK' if check_ok else 'MISMATCH'}", flush=True,
    )

    out = args.out or os.path.join(
        REPO, "reports",
        f"bench_n2_{time.strftime('%Y%m%d_%H%M%S')}.json",
    )
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump(
            {
                "mode": "smoke" if args.smoke else "measured",
                "stage": args.stage,
                "backend": jax.default_backend(),
                "n": args.n,
                "k": args.k,
                "geometry": {"C": C, "U": U, "nnz": int(item_user.nnz)},
                "best_s": {str(n): results[n] for n in results},
                "measured_speedup": speedup,
                "measured_efficiency": efficiency,
                "modeled_speedup": (
                    mN["modeled_speedup_vs_1dev"] if mN is not None else None
                ),
                "modeled_efficiency": (
                    mN["modeled_efficiency"] if mN is not None else None
                ),
                "modeled_seconds": (
                    {
                        "1": m1["modeled_seconds"],
                        str(args.n): mN["modeled_seconds"],
                    } if mN is not None else None
                ),
                "check_sum_ok": bool(check_ok),
            },
            f, indent=2,
        )
        f.write("\n")
    print(f"# report: {out}", flush=True)
    return 0 if check_ok else 1


if __name__ == "__main__":
    sys.exit(main())
