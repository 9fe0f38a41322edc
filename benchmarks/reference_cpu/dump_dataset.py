"""Stage the ML-32M-shaped synthetic workload for the reference CPU driver.

Writes the CSR components + cosine normalization vectors as raw binaries so
benchmarks/reference_cpu/ref_bench.cpp (which #includes the untouched
reference headers from /root/reference) can run the reference's own
`compute_similarities_parallel` on this machine's CPU.

Faithful to the reference cosine call (reference: similarity.py:106-123 ->
s_plus.pyx:95-433): m1 = item x user CSR, m2 = user x item CSR,
Xcos = (row |x|^2)^0.5, Ycos = (col |y|^2)^0.5, and the auto-block path's
popularity column reorder (s_plus.pyx:308-346) applied host-side —
conservatively UNtimed, so the reference kernel gets its cache-hot layout
for free.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from similaripy_tpu.ops.csr import csr_col_sums, csr_row_sums  # noqa: E402
from similaripy_tpu.utils.synth import ML32M_NNZ, synthetic_urm  # noqa: E402


def main(out_dir: str, scale: float) -> None:
    os.makedirs(out_dir, exist_ok=True)
    urm = synthetic_urm(nnz=int(ML32M_NNZ * scale))
    m1 = urm.T.tocsr()  # item x user
    m1.eliminate_zeros()
    m2 = urm.tocsr()  # user x item
    m2.eliminate_zeros()

    import scipy.sparse as sp

    m1_sq = sp.csr_array((m1.data * m1.data, m1.indices, m1.indptr), shape=m1.shape)
    m2_sq = sp.csr_array((m2.data * m2.data, m2.indices, m2.indptr), shape=m2.shape)
    xcos = np.power(csr_row_sums(m1_sq), 0.5, dtype=np.float32)
    ycos = np.power(csr_col_sums(m2_sq), 0.5, dtype=np.float32)

    # popularity reorder of output columns (descending col nnz), as the
    # reference's auto-block path does before compute
    col_nnz = np.bincount(m2.indices, minlength=m2.shape[1])
    perm = np.argsort(-col_nnz, kind="stable").astype(np.int64)
    m2r = m2[:, perm].tocsr()
    m2r.sort_indices()
    ycos_r = ycos[perm]

    def w(name, arr, dtype):
        np.ascontiguousarray(arr.astype(dtype, copy=False)).tofile(
            os.path.join(out_dir, name)
        )

    w("m1_data.bin", m1.data, np.float32)
    w("m1_indices.bin", m1.indices, np.int32)
    w("m1_indptr.bin", m1.indptr, np.int32)
    w("m2_data.bin", m2r.data, np.float32)
    w("m2_indices.bin", m2r.indices, np.int32)
    w("m2_indptr.bin", m2r.indptr, np.int32)
    w("xcos.bin", xcos, np.float32)
    w("ycos.bin", ycos_r, np.float32)
    w("back_perm.bin", perm, np.int64)

    meta = {
        "n_items": int(m1.shape[0]),
        "n_users": int(m1.shape[1]),
        "nnz": int(m1.nnz),
        "scale": scale,
    }
    with open(os.path.join(out_dir, "meta.json"), "w") as f:
        json.dump(meta, f)
    print(json.dumps(meta))


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/ref_cpu_bench"
    scale = float(sys.argv[2]) if len(sys.argv) > 2 else 1.0
    main(out, scale)
