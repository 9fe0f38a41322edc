"""Fused Pallas kernel vs the XLA path (interpret mode on CPU).

The kernel fuses matmul + S-Plus epilogue + exact top-k extraction; these
tests force it on (SIMILARIPY_TPU_USE_PALLAS=1 -> interpret mode off-TPU)
and require agreement with the XLA path and the NumPy oracles, covering
every epilogue configuration and both selector kinds.
"""

import os

import numpy as np
import pytest
import scipy.sparse as sp

import similaripy_tpu as sim
from oracles import check_sum, generate_random_matrix, py_cosine, py_s_plus, top_k


@pytest.fixture(autouse=True)
def force_pallas(monkeypatch):
    monkeypatch.setenv("SIMILARIPY_TPU_USE_PALLAS", "1")


@pytest.fixture(scope="module")
def matrix():
    return generate_random_matrix(300, 250, density=0.04).tocsr()


def test_pallas_cosine(matrix):
    got = sim.cosine(matrix, k=20, verbose=False)
    ref = py_cosine(matrix, 20).tocsr()
    np.testing.assert_allclose(check_sum(got), check_sum(ref), rtol=1e-4)


def test_pallas_dot(matrix):
    got = sim.dot_product(matrix, k=20, verbose=False)
    ref = top_k(matrix @ matrix.T, 20)
    np.testing.assert_allclose(check_sum(got), check_sum(ref), rtol=1e-4)


def test_pallas_splus_full_epilogue(matrix):
    got = sim.s_plus(
        matrix, l1=0.5, l2=0.5, l3=1, t1=1, t2=1, c1=0.5, c2=0.5,
        alpha=1, beta1=0, beta2=0, pop1="none", pop2="sum",
        k=20, verbose=False,
    )
    ref = py_s_plus(
        matrix, l1=0.5, l2=0.5, l3=1, t1=1, t2=1, c1=0.5, c2=0.5,
        alpha=1, beta1=0, beta2=0, pop1="none", pop2="sum", k=20,
    )
    np.testing.assert_allclose(check_sum(got), check_sum(ref), rtol=1e-4)


def test_pallas_matches_xla_exactly(matrix, monkeypatch):
    got_p = sim.cosine(matrix, k=15, verbose=False).tocsr()
    monkeypatch.setenv("SIMILARIPY_TPU_USE_PALLAS", "0")
    got_x = sim.cosine(matrix, k=15, verbose=False).tocsr()
    np.testing.assert_allclose(check_sum(got_p), check_sum(got_x), rtol=1e-6)


def test_pallas_int8():
    rng = np.random.default_rng(5)
    m = sp.random_array((200, 160), density=0.06, format="csr",
                        dtype=np.float32, random_state=rng)
    m.data = rng.choice(np.arange(0.5, 5.5, 0.5), m.data.shape[0]).astype(np.float32)
    got = sim.dot_product(m, k=25, verbose=False, compute_dtype="int8")
    ref = top_k(m @ m.T, 25)
    np.testing.assert_allclose(check_sum(got), check_sum(ref), rtol=1e-5)


def test_pallas_filter_matrix():
    rng = np.random.default_rng(9)
    urm = sp.random_array((120, 90), density=0.06, format="csr",
                          dtype=np.float32, random_state=rng)
    W = sp.random_array((90, 90), density=1, format="csr",
                        dtype=np.float32, random_state=rng)
    got = sim.dot_product(urm, W, k=90, filter_cols=urm, verbose=False).tocsr()
    got.eliminate_zeros()
    for u in range(urm.shape[0]):
        seen = set(urm.indices[urm.indptr[u]:urm.indptr[u + 1]])
        rec = set(got.indices[got.indptr[u]:got.indptr[u + 1]])
        assert not (seen & rec), f"user {u}"


def test_pallas_target_cols(matrix):
    rng = np.random.default_rng(2)
    target_cols = rng.choice(matrix.shape[0], size=60, replace=False).tolist()
    got = sim.cosine(matrix, k=20, target_cols=target_cols, verbose=False)
    full = py_cosine(matrix, k=matrix.shape[0]).tocsr()
    mask = np.zeros(matrix.shape[0], dtype=bool)
    mask[target_cols] = True
    ref = top_k(full @ sp.diags_array(mask.astype(np.float32)), 20)
    np.testing.assert_allclose(check_sum(got), check_sum(ref), rtol=1e-3)


def test_pallas_threshold_and_shrink(matrix):
    got = sim.cosine(matrix, k=50, shrink=5, shrink_type="bayesian",
                     threshold=0.01, verbose=False)
    assert (got.tocsr().data >= 0.01 - 1e-6).all()
    ref = py_cosine(matrix, 50, h=5, shrink_mode="bayesian").tocsr()
    ref.data[ref.data < 0.01] = 0
    ref.eliminate_zeros()
    ref = top_k(ref, 50)
    np.testing.assert_allclose(check_sum(got), check_sum(ref), rtol=1e-3)


def test_mxu_scatter_matches_densify():
    """One-hot-matmul scatter == XLA scatter via the real binning helper."""
    import jax
    import jax.numpy as jnp

    from similaripy_tpu.engine.executor import densify
    from similaripy_tpu.engine.pallas_kernels import SC, UBR, mxu_scatter
    from similaripy_tpu.engine.symmetric import _bin_tiles_mxu

    u_pad, tc = 2 * UBR, 2 * SC
    rng = np.random.default_rng(3)
    nnz = 5000
    lin = rng.choice(u_pad * tc, size=nnz, replace=False)
    users = (lin // tc).astype(np.int32)
    slots = (lin % tc).astype(np.int32)
    vals = rng.integers(-9, 10, size=nnz).astype(np.float32)

    # one "tile" with some explicit padding entries (user == u_pad)
    t_users = np.concatenate([users, np.full(37, u_pad, np.int32)])[None, :]
    t_slots = np.concatenate([slots, np.zeros(37, np.int32)])[None, :]
    t_vals = np.concatenate([vals, np.zeros(37, np.float32)])[None, :]
    ps, vv, cnt = _bin_tiles_mxu(
        t_users, t_slots, t_vals, u_pad, tc, int_mode=True
    )

    got = mxu_scatter(
        jnp.asarray(ps[0]),
        jnp.asarray(vv[0]),
        jnp.asarray(cnt[0]),
        u_pad=u_pad,
        tc=tc,
        out_dtype=jnp.int8,
        interpret=jax.default_backend() != "tpu",
    )
    # the binning permutes the user axis; apply the same permutation to ref
    from similaripy_tpu.engine.symmetric import _lpt_user_perm

    perm = _lpt_user_perm(t_users, u_pad)
    ref = densify(
        (u_pad, tc),
        jnp.asarray(perm[users].astype(np.int32)),
        jnp.asarray(slots),
        jnp.asarray(vals),
        jnp.int8,
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_mxu_scatter_bf16():
    import jax
    import jax.numpy as jnp

    from similaripy_tpu.engine.executor import densify
    from similaripy_tpu.engine.pallas_kernels import SC, UBR, mxu_scatter
    from similaripy_tpu.engine.symmetric import (
        _bin_tiles_mxu,
        _lpt_user_perm,
    )

    u_pad, tc = UBR, SC
    rng = np.random.default_rng(5)
    nnz = 800
    lin = rng.choice(u_pad * tc, size=nnz, replace=False)
    users = (lin // tc).astype(np.int32)
    slots = (lin % tc).astype(np.int32)
    vals = (rng.integers(1, 11, size=nnz) * 0.5).astype(np.float32)

    ps, vv, cnt = _bin_tiles_mxu(
        users[None, :], slots[None, :], vals[None, :], u_pad, tc,
        int_mode=False,
    )
    got = mxu_scatter(
        jnp.asarray(ps[0]),
        jnp.asarray(vv[0]),
        jnp.asarray(cnt[0]),
        u_pad=u_pad,
        tc=tc,
        out_dtype=jnp.bfloat16,
        interpret=jax.default_backend() != "tpu",
    )
    perm = _lpt_user_perm(users[None, :], u_pad)
    ref = densify(
        (u_pad, tc),
        jnp.asarray(perm[users].astype(np.int32)),
        jnp.asarray(slots),
        jnp.asarray(vals),
        jnp.bfloat16,
    )
    np.testing.assert_array_equal(
        np.asarray(got).astype(np.float32), np.asarray(ref).astype(np.float32)
    )


# ---------------------------------------------------------------------------
# split-bf16x3 f32-HIGH mode: the fused kernel's 3-phase K sweep must
# reproduce XLA HIGH (bf16x3) accuracy on every executor family
# ---------------------------------------------------------------------------


def _cs_pair_f32_high(call, monkeypatch, *args, **kwargs):
    got = call(*args, compute_dtype="float32", precision="high",
               verbose=False, **kwargs)
    sim.clear_caches()
    monkeypatch.setenv("SIMILARIPY_TPU_USE_PALLAS", "0")
    ref = call(*args, compute_dtype="float32", precision="high",
               verbose=False, **kwargs)
    monkeypatch.setenv("SIMILARIPY_TPU_USE_PALLAS", "1")
    sim.clear_caches()
    return check_sum(got), check_sum(ref)


def test_f32x3_symmetric_path(matrix, monkeypatch):
    monkeypatch.setenv("SIMILARIPY_TPU_SYM_TC", "128")
    monkeypatch.setenv("SIMILARIPY_TPU_SYM_GT", "2")
    a, b = _cs_pair_f32_high(sim.cosine, monkeypatch, matrix, k=15)
    np.testing.assert_allclose(a, b, rtol=1e-5)


def test_f32x3_symmetric_asym_epilogue(matrix, monkeypatch):
    monkeypatch.setenv("SIMILARIPY_TPU_SYM_TC", "128")
    monkeypatch.setenv("SIMILARIPY_TPU_SYM_GT", "1")
    a, b = _cs_pair_f32_high(
        sim.tversky, monkeypatch, matrix, alpha=0.2, beta=0.9, k=11
    )
    np.testing.assert_allclose(a, b, rtol=1e-5)


def test_f32x3_general_path(matrix, monkeypatch):
    a, b = _cs_pair_f32_high(
        sim.cosine, monkeypatch, matrix, matrix.T.tocsr(), k=15
    )
    np.testing.assert_allclose(a, b, rtol=1e-5)


def test_f32x3_vs_full_f32_oracle(matrix, monkeypatch):
    """bf16x3 accuracy holds up against the exact f32 NumPy oracle."""
    monkeypatch.setenv("SIMILARIPY_TPU_SYM_TC", "128")
    got = sim.cosine(matrix, k=20, compute_dtype="float32",
                     precision="high", verbose=False)
    ref = py_cosine(matrix, 20).tocsr()
    np.testing.assert_allclose(check_sum(got), check_sum(ref), rtol=1e-4)


# ---------------------------------------------------------------------------
# one-sided split modes: when one operand is exactly bf16-representable
# (integer ratings, binary interactions) its lo half is identically zero, so
# the f32-HIGH sweep drops that phase ('rhs'/'lhs', 2 phases instead of 3 —
# the scoring-call shape, where m1=URM is integer and m2=W.T is float)
# ---------------------------------------------------------------------------


def _spy_split_modes(monkeypatch):
    import similaripy_tpu.engine.pallas_kernels as pk

    seen = []
    orig = pk._split_maps

    def rec(n_k, mode="both"):
        seen.append(mode)
        return orig(n_k, mode)

    monkeypatch.setattr(pk, "_split_maps", rec)
    return seen


def _int_float_pair(seed=7):
    rng = np.random.default_rng(seed)
    urm = sp.random_array(
        (220, 330), density=0.05, format="csr", dtype=np.float32,
        random_state=rng,
    )
    urm.data[:] = np.rint(urm.data * 4) + 1.0  # integer ratings: bf16-exact
    w = sp.random_array(
        (330, 180), density=0.08, format="csr", dtype=np.float32,
        random_state=rng,
    )  # float weights: not bf16-exact
    return urm, w


def test_f32x3_rhs_mode_arms_and_matches(monkeypatch):
    """Scoring shape (integer m1 x float m2) uses the 2-phase 'rhs' sweep
    and agrees with the XLA f32-HIGH path."""
    urm, w = _int_float_pair()
    seen = _spy_split_modes(monkeypatch)
    sim.clear_caches()
    got = sim.dot_product(urm, w, k=25, compute_dtype="float32",
                          precision="high", verbose=False)
    assert seen and set(seen) == {"rhs"}, seen
    monkeypatch.setenv("SIMILARIPY_TPU_USE_PALLAS", "0")
    sim.clear_caches()
    ref = sim.dot_product(urm, w, k=25, compute_dtype="float32",
                          precision="high", verbose=False)
    sim.clear_caches()
    np.testing.assert_allclose(check_sum(got), check_sum(ref), rtol=1e-5)


def test_f32x3_lhs_mode_arms_and_matches(monkeypatch):
    """Transposed shape (float m1 x integer m2) uses the 'lhs' sweep."""
    urm, w = _int_float_pair(seed=9)
    wt = w.T.tocsr()  # float lhs
    urm_t = urm.T.tocsr()  # integer rhs
    seen = _spy_split_modes(monkeypatch)
    sim.clear_caches()
    got = sim.dot_product(wt, urm_t, k=25, compute_dtype="float32",
                          precision="high", verbose=False)
    assert seen and set(seen) == {"lhs"}, seen
    monkeypatch.setenv("SIMILARIPY_TPU_USE_PALLAS", "0")
    sim.clear_caches()
    ref = sim.dot_product(wt, urm_t, k=25, compute_dtype="float32",
                          precision="high", verbose=False)
    sim.clear_caches()
    np.testing.assert_allclose(check_sum(got), check_sum(ref), rtol=1e-5)


def test_f32x3_both_exact_rides_bf16(monkeypatch):
    """Both operands bf16-exact but not int8-quantizable (values > 127):
    f32-HIGH collapses to the plain bfloat16 mode (single phase, exact)."""
    rng = np.random.default_rng(13)
    m = sp.random_array((150, 200), density=0.06, format="csr",
                        dtype=np.float32, random_state=rng)
    m.data[:] = np.rint(m.data * 60) + 130.0  # 130..190: bf16-exact, >127
    m2 = m.T.tocsr()
    seen = _spy_split_modes(monkeypatch)
    sim.clear_caches()
    got = sim.dot_product(m, m2, k=20, compute_dtype="float32",
                          precision="high", verbose=False)
    assert seen == []  # no split phases at all
    monkeypatch.setenv("SIMILARIPY_TPU_USE_PALLAS", "0")
    sim.clear_caches()
    ref = sim.dot_product(m, m2, k=20, compute_dtype="float32",
                          precision="high", verbose=False)
    sim.clear_caches()
    np.testing.assert_allclose(check_sum(got), check_sum(ref), rtol=1e-5)


def test_f32x3_symmetric_both_exact_rides_bf16(monkeypatch):
    """Self-similarity on bf16-exact (integer) data with explicit
    f32-HIGH: the symmetric executor collapses to the plain bf16 kernel
    (no split phases) and still matches the XLA f32-HIGH path."""
    monkeypatch.setenv("SIMILARIPY_TPU_SYM_TC", "128")
    rng = np.random.default_rng(17)
    m = sp.random_array((250, 300), density=0.05, format="csr",
                        dtype=np.float32, random_state=rng)
    m.data[:] = np.rint(m.data * 4) + 1.0
    seen = _spy_split_modes(monkeypatch)
    sim.clear_caches()
    got = sim.cosine(m, k=15, compute_dtype="float32", precision="high",
                     verbose=False)
    assert seen == []
    monkeypatch.setenv("SIMILARIPY_TPU_USE_PALLAS", "0")
    sim.clear_caches()
    ref = sim.cosine(m, k=15, compute_dtype="float32", precision="high",
                     verbose=False)
    sim.clear_caches()
    np.testing.assert_allclose(check_sum(got), check_sum(ref), rtol=1e-4)


def test_f32x3_rhs_vs_numpy_oracle(monkeypatch):
    """'rhs' accuracy holds against the exact f32 NumPy oracle too."""
    urm, w = _int_float_pair(seed=21)
    sim.clear_caches()
    got = sim.dot_product(urm, w, k=30, compute_dtype="float32",
                          precision="high", verbose=False)
    ref = top_k(sp.csr_matrix(urm) @ sp.csr_matrix(w), 30)
    sim.clear_caches()
    np.testing.assert_allclose(check_sum(got), check_sum(ref), rtol=1e-4)


def test_bf16_exact_detector():
    from similaripy_tpu.engine.executor import _bf16_exact

    assert _bf16_exact(("t", 1), np.array([1.0, 5.0, 130.0, 256.0], np.float32))
    assert not _bf16_exact(("t", 2), np.array([0.1], np.float32))
    assert not _bf16_exact(("t", 3), np.array([257.0], np.float32))  # 9 bits
    assert _bf16_exact(("t", 4), np.array([], np.float32))  # empty: trivially
    # f64 values are judged against their f32 cast (what the engine feeds)
    assert _bf16_exact(("t", 5), np.array([2.0, 64.0], np.float64))


@pytest.mark.parametrize("seed", [101, 102, 103, 104])
def test_pallas_fuzz_random_epilogue(matrix, seed):
    """Seeded fuzz over the S-Plus parameter space: random epilogue
    configurations through the fused kernel must match the NumPy oracle.
    Complements the 11 hand-picked configs with arbitrary-weight ones."""
    rng = np.random.default_rng(seed)
    l1, l2, l3 = rng.uniform(0.0, 1.5, 3).round(2)
    t1, t2 = rng.uniform(0.1, 1.2, 2).round(2)
    c1, c2 = rng.uniform(0.2, 0.9, 2).round(2)
    beta2 = round(float(rng.uniform(0.0, 0.8)), 2)
    pop2 = "sum" if rng.random() < 0.5 else "none"
    kw = dict(l1=float(l1), l2=float(l2), l3=float(l3), t1=float(t1),
              t2=float(t2), c1=float(c1), c2=float(c2), alpha=1.0,
              beta1=0.0, beta2=float(beta2), pop1="none", pop2=pop2)
    sim.clear_caches()
    got = sim.s_plus(matrix, k=17, verbose=False, **kw)
    ref = py_s_plus(matrix, 17, **kw)
    assert got.nnz == ref.tocsr().nnz
    np.testing.assert_allclose(check_sum(got), check_sum(ref), rtol=1e-4)
    sim.clear_caches()


@pytest.mark.parametrize("seed", [201, 202, 203])
def test_pallas_fuzz_random_selectors(matrix, seed, monkeypatch):
    """Seeded fuzz over selector combinations (random filter/target
    matrices, random target_rows): fused path vs the XLA path."""
    rng = np.random.default_rng(seed)
    n, c = matrix.shape[0], matrix.shape[0]  # self-sim output space
    m2 = matrix.T.tocsr()
    kw = {}
    if rng.random() < 0.8:
        kw["filter_cols"] = sp.random_array(
            (n, c), density=float(rng.uniform(0.002, 0.02)), format="csr",
            dtype=np.float32, random_state=rng,
        )
    if rng.random() < 0.8:
        kw["target_cols"] = sp.random_array(
            (n, c), density=float(rng.uniform(0.2, 0.5)), format="csr",
            dtype=np.float32, random_state=rng,
        )
    if rng.random() < 0.5:
        kw["target_rows"] = np.sort(
            rng.choice(n, size=int(n * 0.6), replace=False)
        )
    sim.clear_caches()
    got = sim.cosine(matrix, m2, k=13, verbose=False, **kw)
    monkeypatch.setenv("SIMILARIPY_TPU_USE_PALLAS", "0")
    sim.clear_caches()
    ref = sim.cosine(matrix, m2, k=13, verbose=False, **kw)
    monkeypatch.setenv("SIMILARIPY_TPU_USE_PALLAS", "1")
    sim.clear_caches()
    assert got.nnz == ref.nnz, (got.nnz, ref.nnz)
    np.testing.assert_allclose(check_sum(got), check_sum(ref), rtol=1e-5)


def test_pallas_carry_merge_multigroup(monkeypatch):
    """In-kernel carry merge across MULTIPLE resident tile groups on the
    general (explicit matrix2) path: the donated carry planes must thread
    through group boundaries exactly."""
    monkeypatch.setenv("SIMILARIPY_TPU_HBM_BYTES", str(64 << 20))
    monkeypatch.setenv("SIMILARIPY_TPU_TC", "128")  # 3 tiles, g_tiles=1
    sim.clear_caches()
    rng = np.random.default_rng(11)
    m = sp.random_array((300, 700), density=0.05, format="csr",
                        dtype=np.float32, random_state=rng)
    m.data[:] = np.round(m.data * 4) + 1.0  # auto int8
    got = sim.cosine(m, m.T.tocsr(), k=40, verbose=False)
    monkeypatch.setenv("SIMILARIPY_TPU_USE_PALLAS", "0")
    sim.clear_caches()
    ref = sim.cosine(m, m.T.tocsr(), k=40, verbose=False)
    assert got.nnz == ref.nnz, (got.nnz, ref.nnz)
    np.testing.assert_allclose(check_sum(got), check_sum(ref), rtol=1e-6)
