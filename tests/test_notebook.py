"""The notebook-form E2E artifact (reference ships
notebooks/movielens32m_item_item_recommender.ipynb; here the checked-in
examples/item_item_recommender.ipynb is generated from
examples/make_notebook.py and imports the script's helpers, so the two
pipeline forms cannot drift)."""

import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
NB_PATH = os.path.join(REPO, "examples", "item_item_recommender.ipynb")
sys.path.insert(0, os.path.join(REPO, "examples"))


def test_notebook_in_sync_with_generator():
    nbformat = pytest.importorskip("nbformat")

    import make_notebook

    on_disk = nbformat.read(NB_PATH, as_version=4)
    regen = make_notebook.build()
    assert [c.source for c in on_disk.cells] == [c.source for c in regen.cells]


def test_notebook_executes_end_to_end():
    nbformat = pytest.importorskip("nbformat")
    nbclient = pytest.importorskip("nbclient")

    nb = nbformat.read(NB_PATH, as_version=4)
    # hermetic: force the CPU platform inside the kernel (the env var
    # alone is overridden by a sitecustomize PJRT plugin — conftest.py)
    nb.cells.insert(
        1,
        nbformat.v4.new_code_cell(
            "import jax; jax.config.update('jax_platforms', 'cpu')"
        ),
    )
    client = nbclient.NotebookClient(
        nb, timeout=600, kernel_name="python3",
        resources={"metadata": {"path": os.path.join(REPO, "examples")}},
    )
    client.execute()
    text = "".join(
        o.get("text", "")
        for c in nb.cells
        for o in c.get("outputs", [])
        if o.get("output_type") == "stream"
    )
    assert "NDCG@10" in text
    assert "rp3beta similarity" in text
