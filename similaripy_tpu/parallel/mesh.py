"""Device mesh helpers.

The engine scales out over a `jax.sharding.Mesh` with two logical axes:
  'rows' — data parallelism over target rows (the TPU analogue of the
           reference's OpenMP row loop, s_plus.h:337-338)
  'cols' — tensor-style parallelism over matrix2 columns, with an
           all-gather top-K merge (SURVEY §2.5)
"""

from __future__ import annotations

import numpy as np


def make_mesh(rows: int = 1, cols: int | None = None, devices=None):
    """Build a ('rows','cols') mesh. Defaults to all local devices on cols."""
    import jax
    from jax.sharding import Mesh

    if devices is None:
        devices = jax.devices()
    if cols is None:
        cols = len(devices) // rows
    if rows * cols > len(devices):
        raise ValueError(
            f"mesh {rows}x{cols} needs {rows * cols} devices, have {len(devices)}"
        )
    dev_array = np.array(devices[: rows * cols]).reshape(rows, cols)
    return Mesh(dev_array, axis_names=("rows", "cols"))
