"""Device-OOM resilience: execute() replans once with a smaller budget.

The planners budget HBM from a model; a misestimate surfaces as a lazy
ResourceExhausted mid-run (observed on v5e when a new tile geometry's
split transient was unbudgeted). The engine retries the whole call once
at 75% budget instead of failing.
"""

import os
import sys

import numpy as np
import pytest
import scipy.sparse as sp

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import similaripy_tpu as sim  # noqa: E402
from similaripy_tpu.engine import executor  # noqa: E402


def _fake_oom_once(monkeypatch, record):
    real = executor._execute_impl

    def flaky(pre, params, **kw):
        record.append(kw.get("budget_bytes"))
        if len(record) == 1:
            raise RuntimeError("RESOURCE_EXHAUSTED: TPU backend error")
        return real(pre, params, **kw)

    monkeypatch.setattr(executor, "_execute_impl", flaky)


def test_execute_replans_once_on_oom(monkeypatch):
    m = sp.random_array((60, 40), density=0.2, format="csr",
                        dtype=np.float32, random_state=0)
    m.data[:] = np.round(m.data * 4) + 1
    budgets = []
    _fake_oom_once(monkeypatch, budgets)
    sim.clear_caches()
    out = sim.cosine(m, k=5, verbose=False)
    assert out.shape == (60, 60) and out.nnz > 0
    # first attempt at the default budget, retry at 75% of it
    assert len(budgets) == 2
    assert budgets[0] is None
    from similaripy_tpu.utils.env import hbm_budget_bytes

    assert budgets[1] == int(hbm_budget_bytes() * 0.75)


def test_execute_does_not_mask_other_errors(monkeypatch):
    m = sp.random_array((30, 20), density=0.2, format="csr",
                        dtype=np.float32, random_state=1)

    def boom(pre, params, **kw):
        raise ValueError("unrelated failure")

    monkeypatch.setattr(executor, "_execute_impl", boom)
    sim.clear_caches()
    with pytest.raises(ValueError, match="unrelated failure"):
        sim.cosine(m, k=5, verbose=False)


def test_progress_reset():
    from similaripy_tpu.utils.progress import ProgressBar

    bar = ProgressBar(10, disabled=True)
    bar.update(7)
    assert bar.count == 7
    bar.reset()
    assert bar.count == 0
