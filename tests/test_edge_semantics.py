"""Pinned edge semantics flagged by the round-1 review (VERDICT.md weak #6/#7).

- Candidate semantics for exactly-cancelling products: the reference's SPA
  tracks structural nonzeros (s_plus.h:112-117), so a cell whose products sum
  to exactly 0.0 is still "present" (an explicit zero can appear in COO
  output). The dense-tile engine's candidate proxy is xy != 0, so such a
  cell is a non-candidate and is dropped. With the default threshold=0 the
  reference drops it from top-K scoring anyway (val <= 0 never beats real
  candidates, and explicit zeros are eliminated in CSR output); the tests
  pin the one visible difference and the equivalence everywhere else.
- Validation messages: exact strings for the common misuse cases.
"""

import numpy as np
import pytest
import scipy.sparse as sp

import similaripy_tpu as sim

VERBOSE = False


def _cancelling_pair():
    # rows 0 and 1 overlap in cols {0,1} with products +1 and -1: xy == 0.0
    # exactly, though the cell is structurally nonzero
    dense = np.array(
        [
            [1.0, 1.0, 2.0, 0.0],
            [1.0, -1.0, 0.0, 3.0],
            [0.0, 0.0, 1.0, 1.0],
        ],
        dtype=np.float32,
    )
    return sp.csr_array(dense)


def test_cancelling_cell_dropped_from_candidates():
    m = _cancelling_pair()
    out = sim.dot_product(
        m, k=3, threshold=float("-inf"), verbose=VERBOSE, format_output="coo"
    ).tocsr()
    # cell (0,1): 1*1 + 1*(-1) + 2*0 = 0.0 exactly -> not a candidate here.
    # (The reference would emit an explicit 0.0; we document the difference.)
    row0 = out.indices[out.indptr[0]: out.indptr[1]]
    assert 1 not in set(row0.tolist())


def test_cancelling_cell_equivalent_under_default_threshold():
    """With threshold=0 (the default), engine and oracle agree exactly:
    the cancelled cell never enters the reference's top-K output either
    once zeros are eliminated."""
    m = _cancelling_pair()
    out = sim.dot_product(m, k=4, verbose=VERBOSE).tocsr()
    ref = (m @ m.T).toarray()
    ref[ref <= 0] = 0.0
    got = out.toarray()
    np.testing.assert_allclose(got, ref, rtol=1e-6)


def test_validation_messages_pinned():
    m = sp.identity(4, format="csr", dtype=np.float32)
    with pytest.raises(ValueError, match=r"k must be >= 1, got 0"):
        sim.s_plus(m, k=0, verbose=VERBOSE)
    with pytest.raises(
        ValueError,
        match=r"Incompatible matrix shapes: matrix1.shape\[1\]=4 must equal "
              r"matrix2.shape\[0\]=3",
    ):
        sim.dot_product(m, sp.identity(3, format="csr", dtype=np.float32),
                        verbose=VERBOSE)
    with pytest.raises(TypeError, match=r"matrix1 must be a sparse matrix"):
        sim.cosine(np.eye(4), verbose=VERBOSE)
    with pytest.raises(ValueError, match=r"format_output must be 'coo' or 'csr'"):
        sim.cosine(m, format_output="dense", verbose=VERBOSE)
    with pytest.raises(TypeError, match=r"verbose must be boolean"):
        sim.cosine(m, verbose="yes")
    with pytest.raises(
        ValueError, match=r"target_rows length \(9\) cannot exceed"
    ):
        sim.cosine(m, target_rows=list(range(9)), verbose=VERBOSE)
    with pytest.raises(
        TypeError, match=r"filter_cols must be a sparse matrix, list, numpy"
    ):
        sim.cosine(m, filter_cols=3.5, verbose=VERBOSE)
    with pytest.raises(ValueError, match=r"norm must be one of"):
        sim.normalize(m, norm="l7")
    with pytest.raises(ValueError, match=r"axis must be 0 or 1, got 2"):
        sim.normalize(m, axis=2)
    with pytest.raises(ValueError, match=r"tf_mode must be one of"):
        sim.tfidf(m, tf_mode="bogus")
    with pytest.raises(ValueError, match=r"idf_mode must be one of"):
        sim.bm25(m, idf_mode="bogus")
