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

import ast
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

# executors whose grid/tile/shape logic decides what the kernels are asked
# to compile on hardware (SYM_TM, KB, tc rounding, carry-plane depths, ...).
# Their edits also invalidate the sweep — but hashed over a docstring- and
# comment-insensitive AST dump, so annotating a measurement in a comment
# does not force a multi-minute re-sweep while changing any actual code
# (including a tile constant) does.
_GEOMETRY_SOURCES = (
    os.path.join(REPO, "similaripy_tpu", "engine", "executor.py"),
    os.path.join(REPO, "similaripy_tpu", "engine", "symmetric.py"),
    os.path.join(REPO, "similaripy_tpu", "engine", "compact.py"),
    os.path.join(REPO, "similaripy_tpu", "engine", "sharded.py"),
    os.path.join(REPO, "similaripy_tpu", "engine", "sym_sharded.py"),
)


def _strip_docstrings(tree: ast.AST) -> ast.AST:
    for node in ast.walk(tree):
        if isinstance(
            node, (ast.Module, ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)
        ):
            body = getattr(node, "body", None)
            if (
                body
                and isinstance(body[0], ast.Expr)
                and isinstance(body[0].value, ast.Constant)
                and isinstance(body[0].value.value, str)
            ):
                node.body = body[1:] or [ast.Pass()]
    return tree


def _code_hash_bytes(path: str) -> bytes:
    """Comment/docstring-insensitive content of a Python source file."""
    with open(path, "rb") as f:
        raw = f.read()
    try:
        tree = _strip_docstrings(ast.parse(raw))
        return ast.dump(tree, annotate_fields=False).encode()
    except SyntaxError:  # unparsable: fall back to raw bytes
        return raw


def kernel_hash() -> str:
    h = hashlib.sha256()
    for path in _SOURCES:
        with open(path, "rb") as f:
            h.update(f.read())
    for path in _GEOMETRY_SOURCES:
        h.update(_code_hash_bytes(path))
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
