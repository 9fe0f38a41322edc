"""Offline tests of the benchmark dataset-ingestion paths.

The reference's loaders are exercised by its benchmark runs against the
real downloads (reference: tests/benchmarks/dataset_loaders.py:45-232);
this environment has no egress, so tiny checked-in fixtures pin the
parsing semantics instead: MovieLens-format ratings.csv, Yambda-format
event parquet, and the .npz round-trip — plus the example pipeline
end-to-end on a real-format file via --data-path.
"""

import os
import subprocess
import sys

import numpy as np
import pytest
import scipy.sparse as sp

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIXTURES = os.path.join(REPO, "tests", "fixtures")
sys.path.insert(0, REPO)

from benchmarks.dataset_loaders import (  # noqa: E402
    DATASETS,
    _from_csv,
    _from_npz,
    _from_parquet,
    load_file,
    load_urm,
)


def test_movielens_csv_parse_exact():
    urm = _from_csv(os.path.join(FIXTURES, "ratings.csv"))
    # 5 users, 6 distinct movies (296, 306, 307, 665, 899, 1088), ids
    # remapped to dense 0..n ranges in sorted order
    assert urm.shape == (5, 6)
    assert urm.nnz == 12
    assert urm.dtype == np.float32
    dense = urm.toarray()
    # movie 296 -> col 0: users 1, 2, 4 rated it 5.0 / 4.0 / 0.5
    np.testing.assert_allclose(dense[:, 0], [5.0, 4.0, 0.0, 0.5, 0.0])
    # user 5 (row 4) rated only movie 1088 (last column) 2.5
    np.testing.assert_allclose(dense[4], [0, 0, 0, 0, 0, 2.5])
    # half-star domain preserved exactly (the int8-exact path depends on it)
    assert set(np.unique(urm.data)) <= {0.5 * i for i in range(1, 11)}


def test_yambda_parquet_parse_event_counts():
    pytest.importorskip("pyarrow")
    urm = _from_parquet(os.path.join(FIXTURES, "yambda_events.parquet"))
    # 4 users (10, 42, 77, 99), 4 items (7002, 7010, 7031, 7050)
    assert urm.shape == (4, 4)
    dense = urm.toarray()
    expected = np.array(
        [
            [2, 1, 0, 0],  # user 10: 7002 twice (duplicate events SUM), 7010
            [1, 0, 1, 0],  # user 42: 7002, 7031
            [0, 1, 1, 1],  # user 77: 7010, 7031, 7050
            [0, 0, 0, 1],  # user 99: 7050
        ],
        np.float32,
    )
    # duplicate (user, item) events sum to an event count, matching the
    # reference's COO-with-implicit-1s -> tocsr() collapse (reference:
    # tests/benchmarks/dataset_loaders.py:208-210)
    np.testing.assert_array_equal(dense, expected)


def test_npz_roundtrip(tmp_path):
    rng = np.random.default_rng(3)
    m = sp.random_array((30, 20), density=0.2, format="csr",
                        dtype=np.float32, random_state=rng)
    p = str(tmp_path / "urm.npz")
    sp.save_npz(p, sp.csr_matrix(m))
    out = _from_npz(p)
    np.testing.assert_allclose(out.toarray(), m.toarray())


def test_load_file_dispatches_by_extension(tmp_path):
    assert load_file(os.path.join(FIXTURES, "ratings.csv")).shape == (5, 6)
    if _has_pyarrow():
        assert load_file(
            os.path.join(FIXTURES, "yambda_events.parquet")
        ).shape == (4, 4)


def _has_pyarrow() -> bool:
    try:
        import pyarrow  # noqa: F401

        return True
    except ImportError:
        return False


def test_load_urm_data_path_and_local_dir(tmp_path, monkeypatch):
    urm, src = load_urm("anything",
                        data_path=os.path.join(FIXTURES, "ratings.csv"))
    assert urm.shape == (5, 6) and src.startswith("file:")
    # local data/<name>/ratings.csv resolution (no egress involved)
    monkeypatch.chdir(tmp_path)
    os.makedirs("data/movielens_32m")
    import shutil

    shutil.copy(os.path.join(FIXTURES, "ratings.csv"),
                "data/movielens_32m/ratings.csv")
    urm2, src2 = load_urm("movielens_32m")
    assert urm2.shape == (5, 6) and src2.startswith("file:")


def test_load_urm_falls_back_to_synthetic():
    urm, src = load_urm("synthetic_small", seed=1)
    n_users, n_items, nnz = DATASETS["synthetic_small"]
    assert urm.shape == (n_users, n_items)
    assert src.startswith("synthetic:")


def test_example_pipeline_on_real_format_csv(tmp_path):
    """examples/item_item_recommender.py --data-path end-to-end on a
    MovieLens-format CSV (synthetic ratings written in the real format,
    large enough to survive the holdout split and scoring)."""
    from similaripy_tpu.utils.synth import synthetic_urm

    urm = synthetic_urm(n_users=400, n_items=150, nnz=8000, seed=11)
    coo = urm.tocoo()
    csv = tmp_path / "ratings.csv"
    with open(csv, "w") as f:
        f.write("userId,movieId,rating,timestamp\n")
        for u, i, v in zip(coo.coords[0], coo.coords[1], coo.data):
            # real MovieLens ids are arbitrary ints; offset to prove remap
            f.write(f"{u + 1},{i * 7 + 3},{v},1147880044\n")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = os.pathsep.join(
        [REPO] + [p for p in env.get("PYTHONPATH", "").split(os.pathsep) if p]
    )
    script = os.path.join(REPO, "examples", "item_item_recommender.py")
    # the env var alone does not force CPU (a sitecustomize PJRT plugin may
    # override it — same reason tests/conftest.py uses jax.config); run the
    # script through a wrapper that pins the platform before anything else
    wrapper = (
        "import sys, runpy, jax; jax.config.update('jax_platforms', 'cpu'); "
        f"sys.argv = [{script!r}] + sys.argv[1:]; "
        f"runpy.run_path({script!r}, run_name='__main__')"
    )
    proc = subprocess.run(
        [sys.executable, "-c", wrapper,
         "--data-path", str(csv), "--k", "20", "--model", "cosine"],
        capture_output=True, text=True, timeout=600, env=env, cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "NDCG@10" in proc.stdout
    assert f"loading ratings from {csv}" in proc.stdout


def test_download_contract_constants():
    """Pin the real-download contract so the first networked run cannot
    fail on a path typo (VERDICT r4 #7): URL strings, archive member
    names, HuggingFace repo/file paths, and the recorded dataset shape
    constants, validated against the reference loader's configuration
    (reference: tests/benchmarks/dataset_loaders.py:21-41,274-289)."""
    from benchmarks.dataset_loaders import (
        _YAMBDA_REPO,
        MOVIELENS_URLS,
        YAMBDA_FILES,
    )

    # the contract, hard-coded (CI has no reference checkout)
    assert MOVIELENS_URLS == {
        "movielens_25m": (
            "https://files.grouplens.org/datasets/movielens/ml-25m.zip",
            "ml-25m",
        ),
        "movielens_32m": (
            "https://files.grouplens.org/datasets/movielens/ml-32m.zip",
            "ml-32m",
        ),
    }
    assert _YAMBDA_REPO == "yandex/yambda"
    assert YAMBDA_FILES == {
        "yambda_50m": "flat/50m/multi_event.parquet",
        "yambda_500m": "flat/500m/multi_event.parquet",
    }
    # published dataset shapes used for the synthetic stand-ins
    assert DATASETS["movielens_32m"] == (200_948, 84_432, 32_000_204)
    assert DATASETS["movielens_25m"] == (162_541, 59_047, 25_000_095)


def test_download_contract_matches_reference_source():
    """Cross-check the hard-coded contract against the reference loader's
    own source when the checkout is present (skipped in CI)."""
    ref = "/root/reference/tests/benchmarks/dataset_loaders.py"
    if not os.path.exists(ref):
        pytest.skip("reference checkout not available")
    import ast

    from benchmarks.dataset_loaders import (
        _YAMBDA_REPO,
        MOVIELENS_URLS,
        YAMBDA_FILES,
    )

    tree = ast.parse(open(ref).read())
    consts = {}
    for node in ast.walk(tree):
        if isinstance(node, ast.Assign) and isinstance(node.targets[0], ast.Name):
            try:
                consts[node.targets[0].id] = ast.literal_eval(node.value)
            except ValueError:
                pass
    ml = consts["MOVIELENS_CONFIGS"]
    assert MOVIELENS_URLS["movielens_25m"] == (ml["25m"]["url"], ml["25m"]["name"])
    assert MOVIELENS_URLS["movielens_32m"] == (ml["32m"]["url"], ml["32m"]["name"])
    ya = consts["YAMBDA_CONFIGS"]
    for ours, theirs in (("yambda_50m", "50m"), ("yambda_500m", "500m")):
        assert YAMBDA_FILES[ours] == (
            ya[theirs]["data_dir"] + "/" + ya[theirs]["data_files"]
        )
    # the reference loads via HF `datasets` with repo "yandex/yambda"
    src = open(ref).read()
    assert f'"{_YAMBDA_REPO}"' in src
    # member name inside the MovieLens zip: <inner>/ratings.csv
    assert "ratings.csv" in src


def test_cached_npz_rejects_stale_shape(tmp_path):
    """A cached matrix whose shape no longer matches the expectation is a
    miss: regenerated and overwritten, never silently served."""
    import scipy.sparse as sp

    from similaripy_tpu.utils.npz_cache import cached_npz

    p = str(tmp_path / "c.npz")
    gen_calls = []

    def gen_small():
        gen_calls.append(1)
        return sp.random_array((4, 6), density=0.5, format="csr",
                               dtype=np.float32, random_state=0)

    m1, hit1 = cached_npz(p, gen_small, expect_shape=(4, 6))
    assert not hit1 and len(gen_calls) == 1
    m2, hit2 = cached_npz(p, gen_small, expect_shape=(4, 6))
    assert hit2 and len(gen_calls) == 1
    assert (m1 != m2).nnz == 0
    # definition changed: same path, different expected shape -> miss
    def gen_big():
        gen_calls.append(1)
        return sp.random_array((8, 6), density=0.5, format="csr",
                               dtype=np.float32, random_state=0)

    m3, hit3 = cached_npz(p, gen_big, expect_shape=(8, 6))
    assert not hit3 and len(gen_calls) == 2 and m3.shape == (8, 6)
