"""Sanity-check the reference driver's top-k output against a SciPy oracle.

Loads the staged workload + the driver's dumped (cols, vals), maps columns
back through the popularity permutation, and compares a row sample against
exact cosine scores (tie-tolerant recall + value agreement).
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np
import scipy.sparse as sp


def main(data_dir: str, k: int = 100, n_sample: int = 200) -> None:
    with open(os.path.join(data_dir, "meta.json")) as f:
        meta = json.load(f)
    n_items, n_users = meta["n_items"], meta["n_users"]

    def rd(name, dtype):
        return np.fromfile(os.path.join(data_dir, name), dtype=dtype)

    m1 = sp.csr_array(
        (rd("m1_data.bin", np.float32), rd("m1_indices.bin", np.int32),
         rd("m1_indptr.bin", np.int32)),
        shape=(n_items, n_users),
    )
    perm = rd("back_perm.bin", np.int64)
    out_cols = rd("ref_out_cols.bin", np.int32).reshape(n_items, k)
    out_vals = rd("ref_out_vals.bin", np.float32).reshape(n_items, k)
    out_cols_orig = perm[out_cols]  # back to original column ids

    sq = m1.multiply(m1)
    norms = np.sqrt(np.asarray(sq.sum(axis=1)).ravel())
    rng = np.random.default_rng(7)
    sample = rng.choice(n_items, size=min(n_sample, n_items), replace=False)
    scores = np.asarray((m1[sample] @ m1.T).todense())
    denom = norms[sample][:, None] * norms[None, :]
    with np.errstate(divide="ignore", invalid="ignore"):
        cos = np.where(denom > 0, scores / denom, 0.0)
    cos[scores == 0] = 0.0

    hits = total = 0
    val_err = 0.0
    for i, row in enumerate(sample):
        oracle = cos[i]
        nz = oracle[oracle > 0]
        kk = min(k, nz.shape[0])
        if kk == 0:
            continue
        kth = -np.partition(-nz, kk - 1)[kk - 1]
        got = out_cols_orig[row][out_vals[row] > 0]
        hits += int((oracle[got] >= kth * (1 - 1e-6)).sum())
        total += kk
        if got.shape[0]:
            val_err = max(
                val_err,
                float(np.abs(out_vals[row][: got.shape[0]] - oracle[got]).max()),
            )
    recall = hits / max(total, 1)
    print(json.dumps({"recall": round(recall, 5), "max_val_err": val_err}))
    assert recall >= 0.999, recall


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/ref_cpu_bench")
