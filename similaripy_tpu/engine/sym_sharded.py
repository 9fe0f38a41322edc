"""Mesh-sharded symmetric (self-similarity) executor.

Scales the upper-triangle symmetric executor (symmetric.py) over every
device of a `jax.sharding.Mesh` by sharding the INNER SWEEP: each sweep
dispatch covers N*cs inner tiles, device d scattering + computing its own
cs-tile span against the (replicated) resident anchor stacks. Each device
keeps full-width local top-K carry planes; because every (anchor, tile)
score block is computed on exactly one device and the tile-granularity
delivery masks are global properties of (row tile, col tile), the
per-device candidate streams are DISJOINT — so the per-pair pack is an
exact merge: slice the pair's finished rows from both local planes, take a
local top-k, `all_gather` the k partials across the mesh and re-select
(the same distributed heap-drain replacement as sharded.py's `_merge_cols`;
reference: s_plus.h:39-64).

Communication pattern: one all-gather of (pair_rows, k) partials per
anchor pair, plus — with the sharded anchor densify (default for N > 1)
— one psum per anchor tile that unions the per-device partial scatters
(each device scatters 1/N of the entries; exact because (user, slot)
pairs are unique, so every cell is nonzero on exactly one device).
Matrix data otherwise never moves between devices: the per-tile COO
arrays are replicated once at prep (each device's HBM holds its own
copy, exactly as each host thread of the reference's OpenMP loop reads
the shared CSR).

Scaling anatomy (per device): MXU block products / N (device-offset
rotation spreads dispatch remainders), inner-tile scatters / N, anchor
densify entries / N + one ICI psum per anchor tile, pack collectives ~0.
See docs/distributed.md + benchmarks/scaling_anatomy.py for the counted
evidence.

Reference parity: replaces the same work as the reference's OpenMP-blocked
Gustavson loop (s_plus.h:313-338,358-410) for `matrix2=None` calls on a
device mesh; its correctness oracle is the single-device symmetric path.
"""

from __future__ import annotations

import math
import os
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..utils.env import hbm_budget_bytes
from .params import SPlusParams
from .preprocess import Preprocessed
from .symmetric import (
    NEG_INF,
    _densify_lhs,
    _densify_lhs_into,
    _densify_rhs_stack,
    _densify_rhs_stack_into,
    _plan,
    _round_up,
    cached_prep_symmetric,
    epilogue_is_symmetric,
)


def _pair_schedule(n_groups: int, dual: bool) -> list:
    """Anchor-pair processing order (shared by executor and anatomy)."""
    return [
        (a, a + 1) if dual and a + 1 < n_groups else (a,)
        for a in range(0, n_groups, 2 if dual else 1)
    ]


def _sweep_windows(pair: tuple, gt: int, n_tiles_dev: int) -> list:
    """(n_anchors, c0, c1) sweep windows of one pair: a dual pair sweeps
    its band with the first anchor only, then everything right of it with
    both (shared by the executor loop and schedule_anatomy)."""
    a0 = pair[0] * gt
    if len(pair) == 2:
        return [(1, a0, pair[1] * gt), (2, pair[1] * gt, n_tiles_dev)]
    return [(len(pair), a0, n_tiles_dev)]


def schedule_anatomy(
    C: int,
    U: int,
    nnz: int,
    *,
    N: int,
    compute_dtype: str = "int8",
    budget: Optional[int] = None,
    use_pallas: bool = True,
    cs: int = 1,
) -> dict:
    """Per-device work counts of the sharded symmetric schedule at mesh
    size N — the evidence behind docs/distributed.md's scaling table.

    Replays the executor's own pair/window loop (via _pair_schedule /
    _sweep_windows, the same helpers execute_symmetric_sharded iterates)
    and counts, for each device: live MXU block products, inner-tile
    scatters, dead padding-tile steps, plus the replicated anchor-densify
    count and per-pair pack collectives. A block product is one
    (gt*tc x tc) fused-kernel invocation; an inner scatter is one
    (u_pad, tc) tile densify."""
    if budget is None:
        budget = hbm_budget_bytes()
    tc, gt, u_pad, dual = _plan(C, U, nnz, compute_dtype, budget, use_pallas)
    n_tiles = math.ceil(C / tc)
    n_groups = math.ceil(n_tiles / gt)
    n_tiles_dev = n_groups * gt
    chunk = N * cs

    products = [0] * N
    scatters = [0] * N
    padded_steps = [0] * N
    pair_list = _pair_schedule(n_groups, dual)
    dispatch = 0  # device-offset rotation, mirroring the executor's sweep
    for pair in pair_list:
        for n_anchors, c0, c1 in _sweep_windows(pair, gt, n_tiles_dev):
            for s in range(c0, c1, chunk):
                rot = dispatch % N
                dispatch += 1
                for d in range(N):
                    t0 = s + ((d + rot) % N) * cs
                    live = max(0, min(t0 + cs, c1) - min(t0, c1))
                    products[d] += live * n_anchors
                    scatters[d] += live
                    padded_steps[d] += cs - live
    return {
        "N": N,
        "tc": tc,
        "gt": gt,
        "u_pad": u_pad,
        "dual": dual,
        "n_tiles_dev": n_tiles_dev,
        "n_pairs": len(pair_list),
        "pack_collectives": len(pair_list),
        # replicated-densify mode: every device scatters every anchor
        # tile. With the sharded densify (default for N > 1) each device
        # scatters 1/N of the entries — tile-equivalents below — plus one
        # psum collective per anchor tile.
        "anchor_densifies_per_device": n_tiles_dev,
        "anchor_densify_tile_equiv_sharded": n_tiles_dev / N,
        "anchor_psum_collectives": n_tiles_dev if N > 1 else 0,
        "products_per_device": products,
        "scatters_per_device": scatters,
        "padded_steps_per_device": padded_steps,
    }


def _mesh_axes(mesh: Mesh) -> tuple[tuple, int]:
    """All mesh axis names (flattened into one logical sweep axis) + size."""
    axes = tuple(mesh.axis_names)
    n = 1
    for a in axes:
        n *= mesh.shape[a]
    return axes, n


def _flat_index(mesh: Mesh, axes: tuple):
    """Row-major flat device index over all mesh axes (inside shard_map)."""
    idx = jnp.int32(0)
    for name in axes:
        idx = idx * mesh.shape[name] + jax.lax.axis_index(name)
    return idx


@partial(
    jax.jit,
    static_argnames=(
        "mesh", "axes", "flags", "k", "gt", "tc", "u_pad", "cs",
        "n_anchors", "compute_dtype", "precision", "use_pallas", "asym",
        "f32x3",
    ),
    donate_argnums=(2,),
)
def _sweep_chunk_sharded(
    anchors,  # tuple of dicts (replicated): lhs, x*/y2* vecs, a0 scalar
    dev,  # dict of full (n_tiles_ext, ...) per-tile arrays, replicated
    carry,  # donated; leaves lead with the device axis N
    s,  # i32 scalar — first tile of this dispatch's schedule window
    end,  # i32 scalar — schedule window end (exclusive); beyond it the
    #       step is redirected to the empty padding tile
    pad_tile,  # i32 scalar — index of the always-empty padding tile
    rot,  # i32 scalar — device-offset rotation: without it every
    #      dispatch's remainder tiles land on device 0 and the most-loaded
    #      device does ~1.5x the mean at N=8 (counted by schedule_anatomy);
    #      rotating by the global dispatch index spreads the remainders
    pvec,
    *,
    mesh: Mesh,
    axes: tuple,
    flags: tuple,
    k: int,
    gt: int,
    tc: int,
    u_pad: int,
    cs: int,
    n_anchors: int,
    compute_dtype: str,
    precision: str,
    use_pallas: bool,
    asym: bool,
    f32x3: bool = False,
):
    """One sweep dispatch: N devices x cs inner tiles x n_anchors blocks.

    Device d sweeps tiles [s + d*cs, s + (d+1)*cs) of the schedule window;
    steps past `end` clamp to the padding tile (empty COO -> no candidates
    -> carry merge is a no-op), which keeps every dispatch the same shape
    regardless of the triangle's raggedness.
    """
    from .executor import compute_cast, densify, splus_epilogue, topk_merge

    cdt, acc = compute_cast(compute_dtype)
    prec = {
        "default": jax.lax.Precision.DEFAULT,
        "high": jax.lax.Precision.HIGH,
        "highest": jax.lax.Precision.HIGHEST,
    }[precision]
    sw = gt * tc
    int_mode = compute_dtype in ("int8", "int4")
    interpret = jax.default_backend() != "tpu"
    if use_pallas:
        from .pallas_kernels import sym_k_pads

        k_pad_r, k_pad_c = sym_k_pads(k, tc, sw)

    def block_fn(anchors, dev, carry, s, end, pad_tile, rot, pvec):
        carry = jax.tree.map(lambda x: x[0], carry)
        n_dev = 1
        for name in axes:
            n_dev *= mesh.shape[name]
        t0 = s + ((_flat_index(mesh, axes) + rot) % n_dev) * cs

        def at(name, t):
            return jax.lax.dynamic_index_in_dim(
                dev[name], t, axis=0, keepdims=False
            )

        def step(carry, i):
            t = t0 + i
            t = jnp.where(t < end, t, pad_tile)
            d = densify(
                (u_pad, tc), at("ru", t), at("sl", t), at("vv", t), cdt
            )
            if f32x3:
                from .pallas_kernels import split_bf16x3

                d = split_bf16x3(d, axis=0)
            y_t, y_c, y_d = at("y_t", t), at("y_c", t), at("y_d", t)
            base_t = t * tc
            if not use_pallas:
                cv, ci = carry
            for a in anchors:
                lhs = a["lhs"] if use_pallas else a["lhs"].reshape(sw, u_pad)
                base_a = a["a0"] * tc

                if use_pallas:
                    from .pallas_kernels import fused_sym_topk

                    crv, cri, ccv, cci = carry
                    pvec_ext = jnp.concatenate(
                        [
                            pvec,
                            base_t.astype(jnp.float32).reshape(1),
                            base_a.astype(jnp.float32).reshape(1),
                            t.astype(jnp.float32).reshape(1),
                            a["a0"].astype(jnp.float32).reshape(1),
                            jnp.zeros(2, jnp.float32),
                        ]
                    )
                    crv_blk = jax.lax.dynamic_slice(
                        crv, (0, base_a), (k_pad_r, sw)
                    )
                    cri_blk = jax.lax.dynamic_slice(
                        cri, (0, base_a), (k_pad_r, sw)
                    )
                    rkth_blk = crv_blk[k_pad_r - 1].reshape(sw, 1)
                    ccv_blk = jax.lax.dynamic_slice(
                        ccv, (0, base_t), (k_pad_c, tc)
                    )
                    cci_blk = jax.lax.dynamic_slice(
                        cci, (0, base_t), (k_pad_c, tc)
                    )
                    rvals, ridx, cvals, cidx = fused_sym_topk(
                        lhs, d, a["xt"], a["xc"], a["xd"],
                        y_t, y_c, y_d,
                        crv_blk, cri_blk, rkth_blk, ccv_blk, cci_blk,
                        pvec_ext,
                        flags=flags, k=k, tc=tc,
                        int8_mode=int_mode, precision=prec,
                        x2=(
                            (at("x_t", t), at("x_c", t), at("x_d", t))
                            if asym else None
                        ),
                        y2=(a["y2t"], a["y2c"], a["y2d"]) if asym else None,
                        split_f32=f32x3, interpret=interpret,
                    )
                    crv = jax.lax.dynamic_update_slice(crv, rvals, (0, base_a))
                    cri = jax.lax.dynamic_update_slice(cri, ridx, (0, base_a))
                    ccv = jax.lax.dynamic_update_slice(ccv, cvals, (0, base_t))
                    cci = jax.lax.dynamic_update_slice(cci, cidx, (0, base_t))
                    carry = (crv, cri, ccv, cci)
                    continue

                xy = jnp.dot(
                    lhs, d, preferred_element_type=acc, precision=prec
                )
                if int_mode:
                    xy = xy.astype(jnp.float32) * pvec[9]
                candidate = xy != 0.0
                val = splus_epilogue(
                    xy, candidate, a["xt"], a["xc"], a["xd"],
                    y_t, y_c, y_d, pvec, flags,
                )
                row_tile = a["a0"] + jax.lax.broadcasted_iota(
                    jnp.int32, (sw, 1), 0
                ) // tc

                # row side: anchor rows gain tile t's columns
                rv = jnp.where(row_tile <= t, val, NEG_INF)
                cv_a = jax.lax.dynamic_slice(cv, (base_a, 0), (sw, k))
                ci_a = jax.lax.dynamic_slice(ci, (base_a, 0), (sw, k))
                col_ids = base_t + jax.lax.broadcasted_iota(
                    jnp.int32, (1, tc), 1
                )
                nv, ni = topk_merge(cv_a, ci_a, rv, col_ids, k)
                cv = jax.lax.dynamic_update_slice(cv, nv, (base_a, 0))
                ci = jax.lax.dynamic_update_slice(ci, ni, (base_a, 0))

                # col side: tile t's rows gain anchor candidates (strict <)
                if asym:
                    val_c_t = splus_epilogue(
                        xy.T, candidate.T,
                        at("x_t", t), at("x_c", t), at("x_d", t),
                        a["y2t"], a["y2c"], a["y2d"], pvec, flags,
                    )
                    colv = jnp.where(row_tile.T < t, val_c_t, NEG_INF)
                else:
                    colv = jnp.where(row_tile < t, val, NEG_INF).T
                cv_t = jax.lax.dynamic_slice(cv, (base_t, 0), (tc, k))
                ci_t = jax.lax.dynamic_slice(ci, (base_t, 0), (tc, k))
                cand_ids = base_a + jax.lax.broadcasted_iota(
                    jnp.int32, (1, sw), 1
                )
                nv2, ni2 = topk_merge(cv_t, ci_t, colv, cand_ids, k)
                cv = jax.lax.dynamic_update_slice(cv, nv2, (base_t, 0))
                ci = jax.lax.dynamic_update_slice(ci, ni2, (base_t, 0))
            if not use_pallas:
                carry = (cv, ci)
            return carry, None

        carry, _ = jax.lax.scan(step, carry, jnp.arange(cs, dtype=jnp.int32))
        return jax.tree.map(lambda x: x[None], carry)

    carry_spec = jax.tree.map(lambda _: P(axes, None, None), carry)
    return jax.shard_map(
        block_fn,
        mesh=mesh,
        in_specs=(
            jax.tree.map(lambda _: P(), anchors),
            jax.tree.map(lambda _: P(), dev),
            carry_spec,
            P(), P(), P(), P(), P(),
        ),
        out_specs=carry_spec,
        check_vma=False,
    )(anchors, dev, carry, s, end, pad_tile, rot, pvec)


@partial(
    jax.jit,
    static_argnames=("mesh", "axes", "tc", "u_pad", "compute_dtype",
                     "split", "lhs_orient"),
    donate_argnums=(0,),
)
def _densify_anchor_sharded(
    arena, ru, sl, vv, *,
    mesh: Mesh, axes: tuple, tc: int, u_pad: int, compute_dtype: str,
    split: bool, lhs_orient: bool,
):
    """Anchor densify with the SCATTER sharded over the mesh.

    The replicated anchor stacks are the sharded schedule's only
    non-scaling term (~12.7% of the 1-chip wall model — see
    benchmarks/scaling_anatomy.py). Here each device scatters only its
    1/N slice of every tile's COO entries (the entry axis arrives
    pre-split as (N, ps) from place_coo) and a psum over the mesh unions
    the partial tiles — exact, because (user, slot) pairs are unique, so
    each cell is nonzero on exactly one device and the sum IS the union.
    The psum rides ICI (one (u_pad, tc) tile per anchor tile), trading
    (N-1)/N of the pinned ~25 Mnnz/s scatter cost for a bandwidth-bound
    collective. Gated by SIMILARIPY_TPU_SYM_SHARD_DENSIFY (default on
    for N > 1)."""
    from .executor import compute_cast, densify

    cdt, _ = compute_cast(compute_dtype)
    # scatter + psum in the scatter dtype (bf16 for the int modes: exact
    # for |v| <= 127 and avoids relying on sub-word all-reduce support)
    sdt = jnp.bfloat16 if cdt in (jnp.int8, jnp.int4) else cdt

    def block_fn(arena, ru, sl, vv):
        del arena  # donated: buffer reused for the replicated output
        idx = _flat_index(mesh, axes)

        def one(args):
            u, s, v = args  # (N, ps) entry slices per device

            def pick(a):
                return jax.lax.dynamic_index_in_dim(a, idx, 0, keepdims=False)

            shape = (tc, u_pad) if lhs_orient else (u_pad, tc)
            part = densify(shape, pick(u), pick(s), pick(v), sdt)
            full = jax.lax.psum(part, axes)
            out = full.astype(cdt) if sdt != cdt else full
            if split:
                from .pallas_kernels import split_bf16x3

                out = split_bf16x3(out, axis=0)
            return out

        if lhs_orient:
            return jax.lax.map(one, (sl, ru, vv))
        return jax.lax.map(one, (ru, sl, vv))

    return jax.shard_map(
        block_fn,
        mesh=mesh,
        in_specs=(P(), P(), P(), P()),
        out_specs=P(),
        check_vma=False,
    )(arena, ru, sl, vv)


@partial(
    jax.jit,
    static_argnames=("mesh", "axes", "size", "k", "use_pallas"),
)
def _pack_rows_sharded(carry, start, *, mesh: Mesh, axes: tuple, size: int,
                       k: int, use_pallas: bool):
    """Exact cross-device merge + pack of one pair's finished rows.

    Per device: slice the pair's rows from the local carry planes and
    reduce to a local (size, k) top-k (row/col planes are disjoint by the
    delivery masks; devices are disjoint by the sweep partition). Then one
    all_gather over the mesh + a final top_k — the packed (size, k, 2)
    int32 result is replicated, so the host reads a single d2h copy."""

    def block_fn(carry, start):
        carry = jax.tree.map(lambda x: x[0], carry)
        if use_pallas:
            crv, cri, ccv, cci = carry
            kr, kc = crv.shape[0], ccv.shape[0]
            rv = jax.lax.dynamic_slice(crv, (0, start), (kr, size))
            ri = jax.lax.dynamic_slice(cri, (0, start), (kr, size))
            cv = jax.lax.dynamic_slice(ccv, (0, start), (kc, size))
            ci = jax.lax.dynamic_slice(cci, (0, start), (kc, size))
            all_v = jnp.concatenate([rv, cv], axis=0).T  # (size, kr+kc)
            all_i = jnp.concatenate([ri, ci], axis=0).T
            lv, pos = jax.lax.top_k(all_v, k)
            li = jnp.take_along_axis(all_i, pos, axis=1)
        else:
            cv, ci = carry
            lv = jax.lax.dynamic_slice(cv, (start, 0), (size, k))
            li = jax.lax.dynamic_slice(ci, (start, 0), (size, k))
        av = jax.lax.all_gather(lv, axes, axis=1, tiled=True)  # (size, N*k)
        ai = jax.lax.all_gather(li, axes, axis=1, tiled=True)
        nv, pos = jax.lax.top_k(av, k)
        ni = jnp.take_along_axis(ai, pos, axis=1)
        return jnp.stack(
            [jax.lax.bitcast_convert_type(nv, jnp.int32), ni], axis=-1
        )

    return jax.shard_map(
        block_fn,
        mesh=mesh,
        in_specs=(
            jax.tree.map(lambda _: P(axes, None, None), carry),
            P(),
        ),
        out_specs=P(None, None, None),
        check_vma=False,
    )(carry, start)


def execute_symmetric_sharded(
    pre: Preprocessed,
    params: SPlusParams,
    *,
    mesh: Mesh,
    compute_dtype: str = "auto",
    precision: str = "highest",
    budget_bytes: Optional[int] = None,
    progress=None,
):
    """Mesh-sharded self-similarity top-K; returns host (C, k) f32/i32."""
    import time as _time_mod

    from .executor import (
        _pallas_enabled,
        build_pvec,
        resolve_compute_dtype,
    )

    _t_enter = _time_mod.perf_counter()
    axes, N = _mesh_axes(mesh)
    C = pre.n_output_cols
    U = pre.m1.shape[1]
    k = pre.k
    m2 = pre.m2

    compute_dtype, inv_scale = resolve_compute_dtype(compute_dtype, pre)
    budget = budget_bytes if budget_bytes is not None else hbm_budget_bytes()

    use_pallas = _pallas_enabled()
    # f32-HIGH rides the fused kernel in split-bf16x3 mode (see symmetric.py)
    f32x3 = use_pallas and compute_dtype == "float32" and precision == "high"
    if f32x3:
        # both-exact self-sim collapses to plain bf16 (see symmetric.py)
        from .executor import _bf16_exact

        if _bf16_exact(pre.fp2, m2.data):
            compute_dtype = "bfloat16"
            f32x3 = False
    tc, gt, u_pad, dual = _plan(C, U, m2.nnz, compute_dtype, budget,
                                use_pallas)
    if use_pallas:
        from .pallas_kernels import KB

        # both carry planes must be k deep (they accumulate across the
        # whole sweep schedule — see pallas_kernels.sym_k_pads); cutovers
        # mirror symmetric.py: k_pad > 1024 -> XLA path, scoped-VMEM
        # boundary -> shrink the tile width and stay fused
        k_pad = _round_up(min(k, C), 8)
        if k_pad > 1024:
            use_pallas = False
            f32x3 = False
            tc, gt, u_pad, dual = _plan(C, U, m2.nnz, compute_dtype, budget,
                                        False)
        else:
            if k_pad * tc > 768 * 1024:
                tc_fit = max(512, (768 * 1024 // k_pad) // 128 * 128)
                tc, gt, u_pad, dual = _plan(
                    C, U, m2.nnz, compute_dtype, budget, True,
                    tc_max=tc_fit,
                )
            u_pad = _round_up(u_pad, KB)
    # kernel-side k: no row has more than C candidates (see symmetric.py)
    k_kern = min(k, C) if use_pallas else k

    cs = max(1, int(os.environ.get("SIMILARIPY_TPU_SYM_SHARD_CS", "1")))
    n_tiles = math.ceil(C / tc)
    n_groups = math.ceil(n_tiles / gt)
    n_tiles_dev = n_groups * gt
    Cdev = n_tiles_dev * tc
    sw = gt * tc
    chunk = N * cs
    # one always-empty padding tile absorbs steps past a window's end
    n_tiles_ext = n_tiles_dev + 1
    Cext = n_tiles_ext * tc

    # two-level prep cache shared with the single-device executor; the
    # placement callbacks append the always-empty padding tile (absorbs
    # out-of-window sweep steps) and replicate over the mesh
    def pad_tiles(a, fill):
        pad = np.full((1,) + a.shape[1:], fill, a.dtype)
        return np.concatenate([a, pad], axis=0)

    repl = NamedSharding(mesh, P())

    def split_entries(a, fill):
        # entry axis pre-split to (N, ps) so the sharded anchor densify
        # can slice per device; sentinel padding scatters nowhere. The
        # inner sweep's densify is shape-agnostic over the index arrays.
        nt, p2 = a.shape
        ps = -(-p2 // N)
        out = np.full((nt, N * ps), fill, a.dtype)
        out[:, :p2] = a
        return out.reshape(nt, N, ps)

    def place_coo(coo_host):
        coo_host = {
            "ru": split_entries(pad_tiles(coo_host["ru"], u_pad), u_pad),
            "sl": split_entries(pad_tiles(coo_host["sl"], 0), 0),
            "vv": split_entries(pad_tiles(coo_host["vv"], 0), 0),
        }
        return {k2: jax.device_put(v, repl) for k2, v in coo_host.items()}

    def place_vec(vec_host):
        return {
            k2: jax.device_put(pad_tiles(v, 1.0), repl)
            for k2, v in vec_host.items()
        }

    dev_coo, vecs, item_map = cached_prep_symmetric(
        pre, compute_dtype, tc, n_tiles_dev, u_pad, False,
        key_tag=("mesh", mesh), place_coo=place_coo, place_vec=place_vec,
    )
    dev = {**dev_coo, **vecs}

    pvec = jnp.asarray(build_pvec(params, inv_scale))
    flags = params.static_flags()
    asym = not epilogue_is_symmetric(pre, params)

    carry_sharding = NamedSharding(mesh, P(axes, None, None))
    if use_pallas:
        from .pallas_kernels import sym_k_pads

        k_pad_r, k_pad_c = sym_k_pads(k_kern, tc, sw)
        carry = (
            jax.device_put(
                np.full((N, k_pad_r, Cext), NEG_INF, np.float32),
                carry_sharding,
            ),
            jax.device_put(np.zeros((N, k_pad_r, Cext), np.int32),
                           carry_sharding),
            jax.device_put(
                np.full((N, k_pad_c, Cext), NEG_INF, np.float32),
                carry_sharding,
            ),
            jax.device_put(np.zeros((N, k_pad_c, Cext), np.int32),
                           carry_sharding),
        )
    else:
        carry = (
            jax.device_put(
                np.full((N, Cext, k), NEG_INF, np.float32), carry_sharding
            ),
            jax.device_put(np.zeros((N, Cext, k), np.int32), carry_sharding),
        )

    timing = os.environ.get("SIMILARIPY_TPU_TIMING", "0") not in ("", "0")
    if timing:
        import sys
        import time as _time

        print(
            f"# sym-sharded plan: N={N} tc={tc} gt={gt} u_pad={u_pad} "
            f"n_tiles={n_tiles_dev} n_groups={n_groups} dual={dual} cs={cs} "
            f"dtype={compute_dtype} pallas={use_pallas} "
            f"prep: {_time.perf_counter() - _t_enter:.2f}s",
            file=sys.stderr, flush=True,
        )
        _t_mark = _time.perf_counter()

        def _lap(label):
            nonlocal _t_mark
            now = _time.perf_counter()
            print(f"# {label}: {now - _t_mark:.2f}s", file=sys.stderr,
                  flush=True)
            _t_mark = now

    from .executor import compute_cast as _cc

    _cdt_store = _cc(compute_dtype)[0]

    def fresh_arena():
        # replicated zeros matching the densify output so the first pair
        # also runs the donated-arena program (only the `_into` variants
        # compile; the buffer becomes the pair's resident stack — see
        # symmetric.py). Replication must be explicit: each device memsets
        # locally, and multi-process meshes reject uncommitted inputs.
        if use_pallas and f32x3:
            shape, dt = (gt, 2 * u_pad, tc), jnp.bfloat16
        else:
            shape = (gt, u_pad, tc) if use_pallas else (gt, tc, u_pad)
            dt = _cdt_store
        return jax.jit(
            partial(jnp.zeros, shape, dt), out_shardings=repl
        )()

    # sharded anchor densify: each device scatters 1/N of the entries and
    # a psum unions the partial tiles — removes the schedule's replicated
    # scatter term at the cost of one ICI collective per anchor tile
    shard_densify = N > 1 and os.environ.get(
        "SIMILARIPY_TPU_SYM_SHARD_DENSIFY", "1"
    ) not in ("0", "false")

    def make_anchor(a: int, reuse=None):
        # each pair's anchors densify INTO the retired pair's donated
        # buffers (per device, since the stacks are replicated) — no
        # device barrier between pairs and peak HBM stays at one pair's
        # working set per device, same as the single-device executor
        t0, t1 = a * gt, (a + 1) * gt
        arena = reuse if reuse is not None else fresh_arena()
        if shard_densify:
            lhs = _densify_anchor_sharded(
                arena, dev["ru"][t0:t1], dev["sl"][t0:t1], dev["vv"][t0:t1],
                mesh=mesh, axes=axes, tc=tc, u_pad=u_pad,
                compute_dtype=compute_dtype, split=f32x3,
                lhs_orient=not use_pallas,
            )
        elif use_pallas:
            lhs = _densify_rhs_stack_into(
                arena, dev["ru"][t0:t1], dev["sl"][t0:t1], dev["vv"][t0:t1],
                tc=tc, u_pad=u_pad, compute_dtype=compute_dtype, split=f32x3,
            )
        else:
            lhs = _densify_lhs_into(
                arena, dev["sl"][t0:t1], dev["ru"][t0:t1], dev["vv"][t0:t1],
                tc=tc, u_pad=u_pad, compute_dtype=compute_dtype,
            )
        return {
            "lhs": lhs,
            "xt": dev["x_t"][t0:t1].reshape(sw),
            "xc": dev["x_c"][t0:t1].reshape(sw),
            "xd": dev["x_d"][t0:t1].reshape(sw),
            "y2t": dev["y_t"][t0:t1].reshape(sw),
            "y2c": dev["y_c"][t0:t1].reshape(sw),
            "y2d": dev["y_d"][t0:t1].reshape(sw),
            "a0": jnp.int32(t0),
        }

    dispatch_counter = [0]  # feeds the device-offset rotation (see rot)

    def sweep(anchors, c0: int, c1: int):
        nonlocal carry
        for s in range(c0, c1, chunk):
            rot = dispatch_counter[0] % N
            dispatch_counter[0] += 1
            carry = _sweep_chunk_sharded(
                tuple(anchors), dev, carry,
                jnp.int32(s), jnp.int32(c1), jnp.int32(n_tiles_dev),
                jnp.int32(rot), pvec,
                mesh=mesh, axes=axes, flags=flags, k=k_kern, gt=gt, tc=tc,
                u_pad=u_pad, cs=cs, n_anchors=len(anchors),
                compute_dtype=compute_dtype, precision=precision,
                use_pallas=use_pallas, asym=asym, f32x3=f32x3,
            )

    pair_list = _pair_schedule(n_groups, dual)
    snapshots = []
    done_rows = 0
    retired: list = []  # previous pair's lhs buffers, ready for donation
    for pi, pair in enumerate(pair_list):
        anchors = [
            make_anchor(a, reuse=retired.pop() if retired else None)
            for a in pair
        ]
        a0 = pair[0] * gt
        for n_anchors, c0, c1 in _sweep_windows(pair, gt, n_tiles_dev):
            sweep(anchors[:n_anchors], c0, c1)
        size = len(pair) * sw
        packed = _pack_rows_sharded(
            carry, jnp.int32(a0 * tc),
            mesh=mesh, axes=axes, size=size,
            k=min(k, k_pad_r + k_pad_c) if use_pallas else k,
            use_pallas=use_pallas,
        )
        try:
            packed.copy_to_host_async()
        except Exception:
            pass
        snapshots.append((a0 * tc, size, packed))
        retired = [a["lhs"] for a in anchors]
        for a in anchors:
            a["lhs"] = None  # host must not touch donated-away buffers
        if pi > 0:
            # materialize the PREVIOUS pair's packed rows: completes its d2h
            # under this pair's enqueued compute and bounds host run-ahead
            np.asarray(snapshots[pi - 1][2])
        if timing:
            _lap(f"pair {pair} sweep")
        if progress is not None and pi > 0:
            done = min(C, ((pair_list[pi - 1][-1] + 1) * sw * C) // Cdev)
            if done > done_rows:
                progress.update(done - done_rows)
                done_rows = done

    k_out = min(k, k_pad_r + k_pad_c) if use_pallas else k
    if k_out >= k:
        # every cell is written below; skip the NEG_INF fill (symmetric.py)
        out_vals = np.empty((C, k), np.float32)
        out_idx = np.empty((C, k), np.int32)
    else:
        out_vals = np.full((C, k), NEG_INF, np.float32)
        out_idx = np.zeros((C, k), np.int32)
    item_map32 = item_map.astype(np.int32)
    for start, size, packed in snapshots:
        arr = np.asarray(packed)  # (size, k_out, 2) int32
        vals = arr.view(np.float32)[..., 0]
        idx = arr[..., 1]
        seg = item_map[start : start + size]
        real = seg < C
        out_vals[seg[real], :k_out] = vals[real]
        out_idx[seg[real], :k_out] = idx[real]
    if timing:
        _lap("output readback")
    if progress is not None and done_rows < C:
        progress.update(C - done_rows)

    out_idx = item_map32[out_idx]
    return out_vals, out_idx
