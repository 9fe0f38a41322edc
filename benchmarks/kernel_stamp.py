"""Hardware-sweep stamp for the fused Pallas kernels.

Interpret-mode tests cannot catch Mosaic failures (sub-word compares, DMA
tiling, excess-precision elision — see CLAUDE.md), so every kernel edit
must be validated on real TPU by benchmarks/tpu_kernel_check.py. This
module makes that ritual enforceable: the checker writes a stamp keyed on
a hash of the kernel sources when the sweep passes, and bench.py refuses
to time an UNSWEPT kernel — it runs the quick sweep first instead (see
bench.py::ensure_kernel_stamp). A kernel edit therefore cannot reach a
recorded benchmark number without hardware validation.
"""

from __future__ import annotations

import hashlib
import json
import os
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
STAMP_PATH = os.path.join(REPO, "reports", "kernel_check.stamp")

# sources whose edits invalidate the last hardware sweep: the Mosaic
# kernels themselves and the sweep driver (a widened sweep must re-run)
_SOURCES = (
    os.path.join(REPO, "similaripy_tpu", "engine", "pallas_kernels.py"),
    os.path.join(REPO, "benchmarks", "tpu_kernel_check.py"),
)


def kernel_hash() -> str:
    h = hashlib.sha256()
    for path in _SOURCES:
        with open(path, "rb") as f:
            h.update(f.read())
    return h.hexdigest()[:16]


def read_stamp() -> dict | None:
    try:
        with open(STAMP_PATH) as f:
            return json.load(f)
    except (OSError, ValueError):
        return None


def write_stamp(mode: str, backend: str) -> None:
    os.makedirs(os.path.dirname(STAMP_PATH), exist_ok=True)
    with open(STAMP_PATH, "w") as f:
        json.dump(
            {
                "hash": kernel_hash(),
                "mode": mode,
                "backend": backend,
                "time": time.strftime("%Y-%m-%d %H:%M:%S UTC", time.gmtime()),
            },
            f,
            indent=2,
        )
        f.write("\n")


def stamp_is_current() -> bool:
    stamp = read_stamp()
    return stamp is not None and stamp.get("hash") == kernel_hash()
