"""Real-TPU validation sweep for the fused Pallas kernels.

Interpret mode does NOT catch Mosaic failures (round 1 found sub-word
vector compares and bf16 precision args only on hardware; round 2 the
1-D int8 gather returned wrong data silently). This script is the
recorded hardware sweep: it drives every fused-kernel family through the
public API on the REAL TPU backend and checks each against the XLA path
(bit-exact for int8, tolerance for floats).

Run (takes ~15-30 min cold through the axon tunnel — compiles dominate):

    python benchmarks/tpu_kernel_check.py            # full sweep
    SIMILARIPY_KC_QUICK=1 python benchmarks/tpu_kernel_check.py

Families covered:
  - fused_sym_topk (symmetric executor): epilogue variants x dtypes
  - fused_tile_topk (general executor): target_rows forces the general
    path; int8 + float32
  - probe: Mosaic dot_general with a transposed-lhs contraction (the
    unified-orientation design needs lhs (K, M) blocks contracted on
    dim 0 — unproven on Mosaic, probed here before any executor uses it)

Exit code 0 = all variants match. Any mismatch prints FAIL and exits 1.
"""

from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("SIMILARIPY_TPU_TIMING", "0")
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import scipy.sparse as sp


def row_values_rel(got, ref) -> float:
    """Max relative difference between per-row SORTED value sets.

    Tie-insensitive: when scores tie at the k boundary the two paths may
    keep different (equally-scored) columns — the reference's heap breaks
    ties arbitrarily too — so indices are not comparable, but the sorted
    kept values must agree (exactly, for the int8 path)."""
    g, r = got.tocsr(), ref.tocsr()
    assert g.shape == r.shape and g.nnz == r.nnz
    worst = 0.0
    for i in range(g.shape[0]):
        gv = np.sort(g.data[g.indptr[i]:g.indptr[i + 1]])
        rv = np.sort(r.data[r.indptr[i]:r.indptr[i + 1]])
        if gv.shape != rv.shape:
            return float("inf")
        denom = np.maximum(np.abs(rv), 1e-30)
        if gv.shape[0]:
            worst = max(worst, float(np.max(np.abs(gv - rv) / denom)))
    return worst


def _probe_transposed_lhs(dtype: str):
    """Mosaic probe: dot_general contracting lhs dim 0 ((K,M)^T @ (K,N)).

    The unified-orientation symmetric executor wants anchor tiles kept in
    rhs orientation and contracted on the user axis directly — legal in
    XLA everywhere, but Mosaic's matmul lowering must be proven per dtype
    (round 1: bf16 rejected precision args; sub-word quirks abound)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    K, M, N = 512, 256, 1024
    dn = (((0,), (0,)), ((), ()))
    acc = jnp.int32 if dtype == "int8" else jnp.float32

    def kern(a_ref, b_ref, o_ref):
        if dtype == "float32":
            o_ref[:] = jax.lax.dot_general(
                a_ref[:], b_ref[:], dn, preferred_element_type=acc,
                precision=jax.lax.Precision.HIGHEST,
            )
        else:
            o_ref[:] = jax.lax.dot_general(
                a_ref[:], b_ref[:], dn, preferred_element_type=acc
            )

    rng = np.random.default_rng(0)
    a_i = rng.integers(-5, 6, (K, M))
    b_i = rng.integers(-5, 6, (K, N))
    np_dt = {"int8": np.int8, "bfloat16": np.float32,
             "float32": np.float32}[dtype]
    a, b = a_i.astype(np_dt), b_i.astype(np_dt)
    ja = jnp.asarray(a).astype(jnp.bfloat16) if dtype == "bfloat16" else jnp.asarray(a)
    jb = jnp.asarray(b).astype(jnp.bfloat16) if dtype == "bfloat16" else jnp.asarray(b)
    try:
        out = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((M, N), acc),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024
            ),
        )(ja, jb)
        # |values| <= 5, overlap <= 512: exact in every mode
        ref = a_i.T @ b_i
        ok = bool(np.array_equal(np.asarray(out).astype(np.int64), ref))
        return ("ok" if ok else "WRONG DATA"), ok
    except Exception as e:  # Mosaic rejection is a finding, not a crash
        return f"rejected: {type(e).__name__}: {e}", False


def main():
    quick = os.environ.get("SIMILARIPY_KC_QUICK") == "1"

    import jax

    if os.environ.get("SIMILARIPY_KC_CPU") == "1":
        # hermetic smoke mode: the axon sitecustomize overrides
        # JAX_PLATFORMS, so force the platform through the config
        jax.config.update("jax_platforms", "cpu")
    # use the shared helper so the sweep warms the SAME cache keys the
    # benchmarks read (it also drops full-traceback locations, which are
    # part of the Mosaic payload and hence the key — see
    # utils/env.enable_persistent_compile_cache)
    from similaripy_tpu.utils.env import enable_persistent_compile_cache

    enable_persistent_compile_cache(os.environ["JAX_COMPILATION_CACHE_DIR"])
    import similaripy_tpu as sim

    print(f"backend: {jax.default_backend()}", flush=True)

    for dt in ("int8", "bfloat16", "float32"):
        name, ok = _probe_transposed_lhs(dt)
        print(f"probe transposed-lhs dot_general [{dt}]: {name}", flush=True)

    rng = np.random.default_rng(0)
    C, U = (3000, 1500) if quick else (6144, 3000)
    m = sp.random_array((C, U), density=0.01, format="csr",
                        dtype=np.float32, random_state=rng)
    m.data[:] = np.round(m.data * 4) + 1.0  # integral -> auto int8
    mf = m.copy()
    mf.data = mf.data + 0.123  # non-integral -> float paths

    os.environ["SIMILARIPY_TPU_SYM_TC"] = "2048"
    os.environ["SIMILARIPY_TPU_SYM_GT"] = "2"

    def _with_env(key, val, call):
        def run():
            old = os.environ.get(key)
            os.environ[key] = val
            try:
                return call()
            finally:
                if old is None:
                    del os.environ[key]
                else:
                    os.environ[key] = old
        return run

    rng_sel = np.random.default_rng(1)
    filt = sp.random_array((C, C), density=0.005, format="csr",
                           dtype=np.float32, random_state=rng_sel)
    tgt = sp.random_array((C, C), density=0.3, format="csr",
                          dtype=np.float32, random_state=rng_sel)

    sym_variants = [
        ("sym cosine int8", lambda: sim.cosine(m, k=50, verbose=False), 0),
        ("sym dot int8", lambda: sim.dot_product(m, k=50, verbose=False), 0),
        ("sym splus full int8",
         lambda: sim.s_plus(m, l1=0.4, l2=0.6, t1=0.8, t2=0.8, c1=0.4,
                            c2=0.4, l3=0.2, shrink=2.0,
                            shrink_type="stabilized", threshold=0.001,
                            k=50, verbose=False), 1e-5),
        ("sym jaccard binary",
         lambda: sim.jaccard(m, k=50, binary=True, verbose=False), 0),
        ("sym cosine f32",
         lambda: sim.cosine(mf, k=50, compute_dtype="float32",
                            verbose=False), 1e-5),
        ("sym cosine bf16",
         lambda: sim.cosine(m, k=50, compute_dtype="bfloat16",
                            verbose=False), 5e-2),
        # asymmetric epilogues on the symmetric path (round 2): the col-side
        # delivery re-runs the epilogue with swapped X/Y roles in-kernel
        ("sym tversky asym",
         lambda: sim.tversky(m, alpha=0.2, beta=0.9, k=50, verbose=False),
         1e-5),
        ("sym asym-cosine",
         lambda: sim.asymmetric_cosine(m, alpha=0.2, k=50, verbose=False),
         1e-5),
        ("sym rp3beta (refactored)",
         lambda: sim.rp3beta(m, alpha=0.7, beta=0.4, k=50, verbose=False),
         1e-5),
        # split-bf16x3 f32-HIGH mode (3-phase K sweep; late round 2) —
        # the XLA reference runs real bf16x3 too, so only summation order
        # differs
        ("sym cosine f32-high (bf16x3)",
         lambda: sim.cosine(mf, k=50, compute_dtype="float32",
                            precision="high", verbose=False), 1e-4),
        ("sym tversky asym f32-high",
         lambda: sim.tversky(mf, alpha=0.2, beta=0.9, k=50,
                             compute_dtype="float32", precision="high",
                             verbose=False), 1e-4),
        # carry planes deeper than one tile (k > tc regression; the fused
        # cutover keeps this on the kernel at tc=128)
        ("sym k>tile-width int8",
         _with_env("SIMILARIPY_TPU_SYM_TC", "128",
                   lambda: sim.dot_product(m, k=200, verbose=False)), 0),
        # mid-k: k_pad*tc over the scoped-VMEM boundary shrinks the tile
        # width and stays fused (round 3; previously fell back to XLA).
        # SYM_TC=4096 so the 264*4096 product trips the bound -> tc=2944,
        # which also exercises the tm=128 row-block fallback
        ("sym mid-k shrink-tc int8",
         _with_env("SIMILARIPY_TPU_SYM_TC", "4096",
                   lambda: sim.cosine(m, k=256, verbose=False)), 0),
    ]
    gen_variants = [
        ("gen cosine int8 (target_rows)",
         lambda: sim.cosine(m, k=50, verbose=False,
                            target_rows=np.arange(0, C, 2)), 0),
        ("gen cosine f32 (target_rows)",
         lambda: sim.cosine(mf, k=50, compute_dtype="float32", verbose=False,
                            target_rows=np.arange(0, C, 2)), 1e-5),
        ("gen cosine f32-high (target_rows)",
         lambda: sim.cosine(mf, k=50, compute_dtype="float32",
                            precision="high", verbose=False,
                            target_rows=np.arange(0, C, 2)), 1e-4),
        # in-kernel carry merge + scatter-mask selectors (late round 2)
        ("gen filter+target masks int8",
         lambda: sim.cosine(m, m.T.tocsr(), k=50, filter_cols=filt,
                            target_cols=tgt, verbose=False), 0),
        # one-sided split modes (round 4): integer x float operands run
        # the 2-phase 'rhs'/'lhs' K sweep — the scoring-call shape
        ("gen f32-high rhs-split (int x float)",
         lambda: sim.dot_product(m, mf.T.tocsr(), k=50,
                                 compute_dtype="float32", precision="high",
                                 verbose=False), 1e-4),
        ("gen f32-high lhs-split (float x int)",
         lambda: sim.dot_product(mf, m.T.tocsr(), k=50,
                                 compute_dtype="float32", precision="high",
                                 verbose=False), 1e-4),
        # round 5: float-family general kernel runs tm=512/kb=1536 and the
        # tc search may pick widths past 4096 (ML-32M scoring lands on
        # 4224) — pin one wide-tile rhs-split case on hardware
        ("gen f32-high rhs-split tc=4224",
         lambda: sim.dot_product(m, mf.T.tocsr(), k=50,
                                 compute_dtype="float32", precision="high",
                                 block_size=4224, verbose=False), 1e-4),
    ]
    if quick:
        sym_variants = sym_variants[:2]
        # keep the wide-tile rhs-split case (last entry): the float-family
        # general kernel's tm=512/kb=1536 + tc>4096 geometry is exactly
        # the program class a quick-mode stamp would otherwise never
        # hardware-validate (round-5 review finding)
        gen_variants = gen_variants[:1] + gen_variants[-1:]

    failures = []
    for label, call, tol in sym_variants + gen_variants:
        os.environ["SIMILARIPY_TPU_USE_PALLAS"] = "1"
        sim.clear_caches()
        t0 = time.time()
        got = call()
        t_pal = time.time() - t0
        os.environ["SIMILARIPY_TPU_USE_PALLAS"] = "0"
        sim.clear_caches()
        t0 = time.time()
        ref = call()
        t_xla = time.time() - t0
        rel = row_values_rel(got, ref)
        match = (rel == 0.0) if tol == 0 else (rel <= tol)
        gotc = got.tocsr()
        dupes = any(
            len(set(gotc.indices[gotc.indptr[r]:gotc.indptr[r + 1]].tolist()))
            != gotc.indptr[r + 1] - gotc.indptr[r]
            for r in range(0, gotc.shape[0], 97)
        )
        status = "ok" if (match and not dupes) else "FAIL"
        if status == "FAIL":
            failures.append(label)
        print(
            f"{status:4s} {label:34s} rel={rel:.2e} nnz {got.nnz}/{ref.nnz} "
            f"dupes={dupes} pallas {t_pal:.1f}s / xla {t_xla:.1f}s",
            flush=True,
        )
    del os.environ["SIMILARIPY_TPU_USE_PALLAS"]

    if failures:
        print(f"FAILED: {failures}", flush=True)
        sys.exit(1)
    print("all kernel variants match", flush=True)

    if jax.default_backend() == "tpu":
        from benchmarks.kernel_stamp import write_stamp

        write_stamp("quick" if quick else "full", jax.default_backend())
        print("kernel_check.stamp updated", flush=True)


if __name__ == "__main__":
    main()
