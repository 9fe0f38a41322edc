"""Benchmark dataset loading.

The reference downloads MovieLens 25M/32M and Yambda 50M/500M
(reference: tests/benchmarks/dataset_loaders.py:21-232). This environment
has no network egress, so the loaders resolve in order:
  1. a local file (CSV ratings / .npz sparse) given via --data-path or
     found under ./data/<name>/
  2. a synthetic power-law URM with the named dataset's published shape
     and nnz (similaripy_tpu/utils/synth.py)
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np
import scipy.sparse as sp

from similaripy_tpu.utils.synth import synthetic_urm

# (n_users, n_items, nnz) of the datasets the reference benchmarks on
DATASETS = {
    "movielens_32m": (200_948, 84_432, 32_000_204),
    "movielens_25m": (162_541, 59_047, 25_000_095),
    "yambda_50m": (1_000_000, 9_390_623, 50_000_000),
    "synthetic_small": (20_000, 5_000, 1_000_000),
    "synthetic_medium": (100_000, 30_000, 8_000_000),
}


def _from_csv(path: str) -> sp.csr_array:
    """userId,movieId,rating[,timestamp] ratings file -> URM."""
    raw = np.loadtxt(path, delimiter=",", skiprows=1, usecols=(0, 1, 2))
    users, user_idx = np.unique(raw[:, 0].astype(np.int64), return_inverse=True)
    items, item_idx = np.unique(raw[:, 1].astype(np.int64), return_inverse=True)
    return sp.csr_array(
        (raw[:, 2].astype(np.float32), (user_idx, item_idx)),
        shape=(len(users), len(items)),
    )


def _from_npz(path: str) -> sp.csr_array:
    m = sp.load_npz(path)
    return sp.csr_array(m.tocsr())


def load_urm(
    name: str, data_path: Optional[str] = None, seed: int = 0
) -> tuple[sp.csr_array, str]:
    """Resolve a dataset by name; returns (URM, provenance string)."""
    if data_path:
        if data_path.endswith(".npz"):
            return _from_npz(data_path), f"file:{data_path}"
        return _from_csv(data_path), f"file:{data_path}"

    local_dir = os.path.join("data", name)
    if os.path.isdir(local_dir):
        for fname in ("ratings.npz", "urm.npz"):
            p = os.path.join(local_dir, fname)
            if os.path.exists(p):
                return _from_npz(p), f"file:{p}"
        for fname in ("ratings.csv",):
            p = os.path.join(local_dir, fname)
            if os.path.exists(p):
                return _from_csv(p), f"file:{p}"

    if name not in DATASETS:
        raise ValueError(
            f"unknown dataset '{name}'; known: {sorted(DATASETS)} "
            "(or pass --data-path)"
        )
    n_users, n_items, nnz = DATASETS[name]
    urm = synthetic_urm(n_users=n_users, n_items=n_items, nnz=nnz, seed=seed)
    return urm, f"synthetic:{name} (no-egress environment)"
