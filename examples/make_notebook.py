"""Generate examples/item_item_recommender.ipynb.

Notebook-form of the end-to-end pipeline (the reference ships
notebooks/movielens32m_item_item_recommender.ipynb; this repo's script
examples/item_item_recommender.py is the single source of truth for the
pipeline code — the notebook imports its helpers so the two cannot
drift). Re-run this script after editing the example to refresh the
checked-in notebook: python examples/make_notebook.py
"""

from __future__ import annotations

import os

import nbformat as nbf

HERE = os.path.dirname(os.path.abspath(__file__))

MD = [
    # (position, markdown)
    """# Item-item recommender with similaripy_tpu

End-to-end pipeline, notebook form (script twin:
`examples/item_item_recommender.py`; reference analogue:
`notebooks/movielens32m_item_item_recommender.ipynb`):

1. load interactions (synthetic MovieLens-shaped by default — set
   `DATA_PATH` to a real `ratings.csv` / Yambda `.parquet` / `.npz`),
2. leave-n-out split,
3. BM25-weight the URM,
4. train an item-item similarity model,
5. score users with seen-item filtering,
6. evaluate NDCG@10 / recall@10,
7. (optional) tune rp3beta and draw the 2-D item-space map.
""",
    """## 1. Data

`DATA_PATH = None` builds a synthetic power-law URM so the notebook runs
without network egress; point it at a MovieLens-format ratings file to
use real data.""",
    """## 2. Split and BM25 preprocessing

Leave-2-out per user (the reference notebook splits temporally; synthetic
data has no timestamps). BM25 weighting sharpens informative
interactions, exactly as in the reference pipeline.""",
    """## 3. Train the similarity model

`rp3beta` on the transposed URM — the random-walk similarity the
reference notebook tunes. Swap in `sim.cosine`, `sim.asymmetric_cosine`,
`sim.s_plus`, ... freely; all nine similarities share the same engine.""",
    """## 4. Score and evaluate

Recommendations are `URM @ W.T` with the user's seen items masked
*before* top-K (`filter_cols=train`) — the reference's two-stage
retrieval pattern.""",
    """## 5. Hyperparameter tuning (optional)

Optuna when installed, seeded random search otherwise. A handful of
trials is enough to see the (alpha, beta) response surface move.""",
    """## 6. Item-space visualization (optional)

Truncated-SVD projection of the BM25-weighted item vectors with the
strongest learned similarity edges drawn on top (the reference notebook
uses UMAP; SVD ships with SciPy).""",
]

CODE = [
    """import os, sys, time
# notebook lives in examples/; make the repo root and examples importable
sys.path[:0] = [os.getcwd(), os.path.abspath(os.path.join(os.getcwd(), ".."))]

import numpy as np
import scipy.sparse as sp

import similaripy_tpu as sim
from similaripy_tpu.utils.synth import synthetic_urm
from item_item_recommender import holdout_split, ndcg_and_recall_at

DATA_PATH = None  # e.g. "data/movielens_32m/ratings.csv"
K = 100  # similarity neighbors

if DATA_PATH:
    from benchmarks.dataset_loaders import load_file
    urm = load_file(DATA_PATH)
else:
    urm = synthetic_urm(n_users=20_000, n_items=4_000, nnz=400_000)
urm = sp.csr_array(urm[np.diff(urm.indptr) >= 5])  # drop sparse users
print(f"URM: {urm.shape[0]:,} x {urm.shape[1]:,}, nnz={urm.nnz:,}")""",
    """train, test = holdout_split(urm)
train_w = sim.normalization.bm25(train, axis=1, k1=1.2, b=0.75)
print(f"train nnz={train.nnz:,}, held-out nnz={test.nnz:,}")""",
    """t0 = time.perf_counter()
W = sim.rp3beta(train.T, alpha=1.0, beta=0.6, k=K, verbose=False)
print(f"rp3beta similarity: {time.perf_counter() - t0:.2f}s, nnz={W.nnz:,}")""",
    """recs = sim.dot_product(train_w, W.T, k=10, filter_cols=train,
                       verbose=False, format_output="csr")
ndcg, recall = ndcg_and_recall_at(recs, test, n=10)
print(f"NDCG@10 = {ndcg:.4f}   recall@10 = {recall:.4f}")""",
    """N_TRIALS = 0  # set to e.g. 10 to tune
if N_TRIALS:
    from item_item_recommender import tune_hyperparams
    best = tune_hyperparams(train, train_w, test, K, N_TRIALS)
    W = sim.rp3beta(train.T, k=K, verbose=False, **best)
    recs = sim.dot_product(train_w, W.T, k=10, filter_cols=train,
                           verbose=False, format_output="csr")
    ndcg, recall = ndcg_and_recall_at(recs, test, n=10)
    print(f"tuned: NDCG@10 = {ndcg:.4f}   recall@10 = {recall:.4f}")""",
    """DRAW = False  # set True to render the item-space map
if DRAW:
    from item_item_recommender import visualize_item_space
    visualize_item_space(train_w, W, "item_space.png")""",
]


def build() -> nbf.NotebookNode:
    nb = nbf.v4.new_notebook()
    nb.metadata["kernelspec"] = {
        "display_name": "Python 3", "language": "python", "name": "python3",
    }
    cells = [nbf.v4.new_markdown_cell(MD[0])]
    for md, code in zip(MD[1:], CODE):
        cells.append(nbf.v4.new_markdown_cell(md))
        cells.append(nbf.v4.new_code_cell(code))
    nb.cells = cells
    return nb


if __name__ == "__main__":
    out = os.path.join(HERE, "item_item_recommender.ipynb")
    nbf.write(build(), out)
    print(f"wrote {out}")
