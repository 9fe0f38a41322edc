"""similaripy_tpu — a TPU-native sparse-similarity candidate-retrieval engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of SimilariPy
(reference: bogliosimone/similaripy): nine KNN similarity functions over
sparse matrices (dot, cosine, asymmetric cosine, Jaccard, Dice, Tversky,
P3alpha, RP3beta, S-Plus) expressed as one generalized fused kernel, plus an
in-place CSR normalization suite (L1/L2/max, TF-IDF, BM25, BM25+).

The public API mirrors the reference package root re-exports
(reference: similaripy/__init__.py:8-36) so users of the reference can
switch imports and find everything in the same place.

Architecture (TPU-first, not a port):
  - compute path: densified MXU tile matmuls with a fused S-Plus epilogue
    and a streaming per-row top-K merge (similaripy_tpu/engine/executor.py)
  - normalizers: JAX segment-ops over CSR components (similaripy_tpu/ops)
  - scale-out: jax.sharding Mesh + shard_map column/row sharding with an
    all-gather top-K merge (similaripy_tpu/engine/sharded.py)
"""

from .version import __version__

from .normalization import normalize, bm25, bm25plus, tfidf
from .similarity import (
    dot_product,
    cosine,
    asymmetric_cosine,
    jaccard,
    dice,
    tversky,
    p3alpha,
    rp3beta,
    s_plus,
    recommend,
)
from . import normalization
from .engine.executor import cache_info, clear_caches

__all__ = [
    "__version__",
    "cache_info",
    "clear_caches",
    "normalize",
    "bm25",
    "bm25plus",
    "tfidf",
    "dot_product",
    "cosine",
    "asymmetric_cosine",
    "jaccard",
    "dice",
    "tversky",
    "p3alpha",
    "rp3beta",
    "s_plus",
    "recommend",
]
