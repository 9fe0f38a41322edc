"""Sharded-symmetric scaling anatomy: per-device work counts at N devices.

Emits the evidence behind docs/distributed.md's scaling table (MXU block
products 1/N, inner scatters 1/N, anchor densifies replicated) by
replaying the executor's own schedule (sym_sharded.schedule_anatomy uses
the same _pair_schedule/_sweep_windows helpers the executor iterates) at
ML-32M geometry for N in {1, 2, 4, 8}. No hardware needed — the schedule
is deterministic host logic; the single-device measured rates (BASELINE.md)
then place wall-clock estimates on each term.

Usage: python benchmarks/scaling_anatomy.py [--out reports/scaling_anatomy.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# ML-32M item-item geometry (BASELINE.md): C items x U users
ML32M = {"C": 84_432, "U": 200_948, "nnz": 31_468_483}


# measured single-chip v5e rates (BASELINE.md "Environment facts"): the
# model places wall-clock weights on the counted terms so the replicated
# anchor-densify share is expressed as a fraction of schedule TIME (the
# docs/distributed.md "~12%" number), not of raw counts
MXU_INT8_OPS = 296e12
SCATTER_NNZ_RATE = 25e6
# ICI all-reduce estimate for the sharded anchor densify's psum — an
# ESTIMATE (no multi-chip hardware here), labeled as such in the report:
# v5e ICI ~100 GB/s/link usable, ring all-reduce moves ~2(N-1)/N of the
# (u_pad, tc) bf16 tile
ICI_GBPS_ESTIMATE = 100e9


def anatomy_table(C: int, U: int, nnz: int, n_list=(1, 2, 4, 8),
                  budget: int | None = 12 << 30) -> dict:
    from similaripy_tpu.engine.sym_sharded import schedule_anatomy

    rows = []
    base = None
    for n in n_list:
        # fixed default budget so the modeled plan (and the pinned 1-chip
        # total the tests validate) is deterministic across hosts
        a = schedule_anatomy(C, U, nnz, N=n, budget=budget)
        prod_max = max(a["products_per_device"])
        scat_max = max(a["scatters_per_device"])
        # modeled per-device wall time of each term
        tc, gt, u_pad = a["tc"], a["gt"], a["u_pad"]
        t_product = (gt * tc) * tc * u_pad * 2 / MXU_INT8_OPS
        nnz_tile = nnz / a["n_tiles_dev"]
        t_scatter = nnz_tile / SCATTER_NNZ_RATE
        t_mxu = prod_max * t_product
        t_inner = scat_max * t_scatter
        if n > 1:
            # sharded anchor densify (engine default for N > 1): per-device
            # scatter work is 1/N, plus one psum per anchor tile (ICI rate
            # is an ESTIMATE — no multi-chip hardware to measure here)
            tile_bytes = u_pad * tc * 2  # bf16 scatter dtype
            t_psum = 2 * (n - 1) / n * tile_bytes / ICI_GBPS_ESTIMATE
            t_anchor = a["anchor_densify_tile_equiv_sharded"] * t_scatter + (
                a["anchor_psum_collectives"] * t_psum
            )
        else:
            t_anchor = a["anchor_densifies_per_device"] * t_scatter
        t_total = t_mxu + t_inner + t_anchor
        if base is None:
            base = (prod_max, scat_max, t_total)
        rows.append(
            {
                **{k: v for k, v in a.items()
                   if not k.endswith("per_device")},
                "products_max_device": prod_max,
                "scatters_max_device": scat_max,
                "padded_steps_max_device": max(a["padded_steps_per_device"]),
                "products_speedup_vs_1dev": base[0] / max(prod_max, 1),
                "scatters_speedup_vs_1dev": base[1] / max(scat_max, 1),
                "modeled_seconds": {
                    "mxu": t_mxu,
                    "inner_scatters": t_inner,
                    "anchor_densifies_replicated": t_anchor,
                    "total": t_total,
                },
                "modeled_speedup_vs_1dev": base[2] / t_total,
                "modeled_efficiency": base[2] / t_total / n,
                "anchor_densify_time_fraction": t_anchor / t_total,
            }
        )
    return {"geometry": {"C": C, "U": U, "nnz": nnz}, "mesh_sizes": rows}


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", default="reports/scaling_anatomy.json")
    args = p.parse_args(argv)

    table = anatomy_table(**ML32M)
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(table, f, indent=2)
        f.write("\n")

    print(f"{'N':>3} {'products/dev':>13} {'scatters/dev':>13} "
          f"{'modeled-s':>10} {'speedup':>8} {'eff':>6} {'anchor-frac':>12}")
    for r in table["mesh_sizes"]:
        print(
            f"{r['N']:>3} {r['products_max_device']:>13} "
            f"{r['scatters_max_device']:>13} "
            f"{r['modeled_seconds']['total']:>10.2f} "
            f"{r['modeled_speedup_vs_1dev']:>8.2f} "
            f"{r['modeled_efficiency']:>6.1%} "
            f"{r['anchor_densify_time_fraction']:>12.1%}"
        )
    print(f"written to {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
