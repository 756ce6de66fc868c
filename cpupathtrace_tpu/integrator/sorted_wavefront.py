"""Sorted-wavefront megakernel: per-bounce ray reordering for coherence.

The while-loop megakernel (pallas_megakernel.py) keeps path state in
registers across bounces — optimal HBM traffic, but ray blocks become
INCOHERENT after the first diffuse bounce, and the in-kernel cluster
traversal pays for the union of every lane's needed clusters (~150 record
visits per 1024-ray block per bounce on the dragon). The classic wavefront
answer (ref analog: none — the C++ reference is per-ray recursive) is to
re-sort rays between bounces so blocks share a direction octant and origin
cell.

This driver runs ONE jit program per frame:

    while any ray alive:
        state <- single-bounce megakernel step (Pallas, same bounce body)
        state <- gather(state, argsort(coherence key))

The state round trip is ~70 B/ray/bounce (~18 MB/bounce at 262k rays —
tens of microseconds at HBM bandwidth), and `jax.lax.sort` of 262k keys is
~2 ms: negligible against the traversal savings when blocks are coherent.
Dead rays sort to the tail, so whole blocks go dead and the step kernel
skips them — free path compaction, which the register-resident megakernel
cannot do (its blocks stay resident until their LAST lane dies).

The coherence key packs (dead, origin Morton cell, direction octant); the
random stream is per-ORIGINAL-ray (hashed from the launch index and carried
with the state), so the estimate is sort-invariant in distribution.
"""
from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..accel.kernel_traverse import (
    GROUP,
    GROUP2,
    MASK_SLOTS,
    PAIR_COLS,
    REC_LANES,
    REC_QUEUE,
    clb_compiler_params,
    clb_fits_vmem,
)
from ..core.config import RenderOptions
from ..scene.scene import SceneData
from .pallas_megakernel import (
    N_STATE,
    _KRN_BLOCK_ROWS,
    _LANES,
    _fmix32,
    _make_megakernel,
    _pack_tables,
)

# Entry-point Morton resolution (bits per axis): 3*bits + 3-bit octant key.
# Capped at 8 so the miss sentinel (1 << (3*bits + 3)) and the dead-ray
# key (2^30) stay distinct i32 values above every entering key.
_MORTON_BITS = min(8, max(1, int(os.environ.get("PTX_SORT_MORTON_BITS", "4"))))

# Skip the per-bounce re-sort when fewer rays than this are alive: the live
# set is already packed at the head (dead rays sort to the tail and STAY
# there — a dead ray's key is terminal), so late sparse bounces get no new
# coherence for the sort's ~5-10 ms. Applied as min(threshold, rays/4) so
# small chunks still sort their early bounces (a fixed 64k threshold would
# disable sorting entirely below 64k rays). Swept on the 200k bench
# (packed glue, round 4): 16k -> 0.86, 32k -> 0.89, 64k -> 0.90 Mrays/s,
# 128k+ -> 0.69 (half the frame never sorted — coherence collapses).
_SORT_MIN_ALIVE = int(os.environ.get("PTX_SORT_MIN_ALIVE", str(1 << 16)))

# Permutation glue implementation:
#   "fused"  — ONE multi-operand lax.sort carries the full 19-array path
#              state through the sort network. Fastest per bounce (zero
#              gathers) but the variadic TPU sort lowering costs ~5.5 s of
#              XLA compile PER OPERAND (measured: 20 operands = 170 s) —
#              a ~3 min cold compile for the dragon program.
#   "packed" — 2-operand argsort (key, iota), then the state rides ONE
#              row-gather of a bit-packed [R, 19] matrix. TPU gather cost
#              is per ROW (a 128-lane line regardless of column count),
#              so one wide gather ≈ one narrow gather — measured ~19x
#              cheaper than the 19 per-array takes of round 2, and the
#              whole program compiles ~10x faster than "fused".
#   "wide"   — 2-operand sort of (key broadcast to [R, W], packed
#              [R, W] payload) along axis 0: W independent column sorts
#              whose exchange decisions depend only on the (identical)
#              key columns, so every column applies the SAME permutation
#              (bit-exactness tested vs "fused"). Compiles in ~6 s and
#              runs 5.7 ms/sort STANDALONE, but inside this driver's
#              while-loop v5e emits a ~250 ms/sort program (layout
#              {0,1:T(8,128)} sort emission; HLO shows no transposes —
#              the cost is inside the sort custom-call). Kept as an
#              experiment knob; do not default.
#
# Measured on the 200k dragon bench (v5e, round 4): fused 261.5 ms
# frame / ~176 s compile; packed 288.7 ms / ~23 s compile; per-sort
# amortized cost argsort 1.35 ms, packed 8.4 ms, wide 5.7 ms
# (standalone). Round-5 pipelined re-measurement: fused 244 ms vs packed
# 266 ms (+9% frame) — and the persistent compilation cache makes the
# fused lowering a ONE-TIME cost, so the default is now "auto": fused
# for bench-class scenes (n_super <= _FUSED_MAX_SUP, where the lowering
# stays minutes at worst), packed at full scale (the fused sort's XLA
# lowering grows with program size and the glue is a smaller frame
# fraction there). PTX_SORT_GLUE=fused/packed/wide forces a mode.
_SORT_GLUE = os.environ.get("PTX_SORT_GLUE", "auto")
_FUSED_MAX_SUP = int(os.environ.get("PTX_SORT_FUSED_MAX_SUP", "1024"))


def _resolve_glue(n_super: int) -> str:
    if _SORT_GLUE == "auto":
        return "fused" if n_super <= _FUSED_MAX_SUP else "packed"
    return _SORT_GLUE


def _permute_packed(key, arrays):
    """Sort-order permutation via argsort + one packed row-gather.

    Returns (sorted_key, permuted arrays). Non-f32 operands ride the
    gather bit-cast to f32: stack/gather/slice are byte-preserving (no
    arithmetic touches the lanes), verified bit-exact for arbitrary
    uint32 patterns in tests/test_megakernel.py."""
    r = key.shape[0]
    key_s, order = jax.lax.sort(
        (key, jax.lax.iota(jnp.int32, r)), num_keys=1, is_stable=False
    )
    cols = [
        a if a.dtype == jnp.float32
        else jax.lax.bitcast_convert_type(a, jnp.float32)
        for a in arrays
    ]
    g = jnp.take(jnp.stack(cols, axis=-1), order, axis=0)
    return key_s, tuple(
        g[:, i] if a.dtype == jnp.float32
        else jax.lax.bitcast_convert_type(g[:, i], a.dtype)
        for i, a in enumerate(arrays)
    )


def _permute_wide(key, arrays):
    """Sort-order permutation via ONE broadcast-key wide-payload sort.

    The payload rides bit-packed as [R, W]; the key is broadcast to the
    same shape and `lax.sort(dimension=0)` runs W independent column
    sorts. Exchange decisions depend only on the key columns, which are
    identical, so every column applies the same permutation — verified
    bit-exact against the fused multi-operand sort in tests. Two
    operands keep the TPU sort's compile cost flat in state width
    (the variadic lowering costs ~5.5 s/operand)."""
    r = key.shape[0]
    w = len(arrays)
    cols = [
        a if a.dtype == jnp.float32
        else jax.lax.bitcast_convert_type(a, jnp.float32)
        for a in arrays
    ]
    kb = jnp.broadcast_to(key[:, None], (r, w))
    ks, ps = jax.lax.sort(
        (kb, jnp.stack(cols, axis=-1)), dimension=0, num_keys=1,
        is_stable=False,
    )
    return ks[:, 0], tuple(
        ps[:, i] if a.dtype == jnp.float32
        else jax.lax.bitcast_convert_type(ps[:, i], a.dtype)
        for i, a in enumerate(arrays)
    )


def _seed_rng_flat(seed, idx):
    """Per-ray xorshift32 state from the ORIGINAL ray index (sort-stable);
    same mixing family as pallas_megakernel._seed_rng."""
    idx = idx.astype(jnp.uint32)
    s = (
        jnp.asarray(seed).astype(jnp.uint32) * jnp.uint32(2654435761)
        ^ (idx * jnp.uint32(40503) + jnp.uint32(0x9E3779B9))
        ^ ((idx >> jnp.uint32(7)) * jnp.uint32(2246822519)
           + jnp.uint32(0x85EBCA6B))
    )
    return _fmix32(s)


def _sort_key(ox, oy, oz, dx, dy, dz, alive_f, lo, hi):
    """i32 coherence key: dead rays last; alive rays split by whether they
    enter the cluster-set root AABB at all (non-entering rays are gated
    out of the traversal entirely — accel/kernel_traverse.py:_root_gate —
    so grouping them shrinks the set of blocks that traverse); entering
    rays are grouped by the Morton cell of their ENTRY POINT into the root
    (4 bits/axis), then direction octant.

    Key choice measured on the dragon bench frame (CPU visit simulation,
    /tmp/key_study.py r2): origin-cell keys cut block cluster visits only
    ~1.2x overall (bounce origins clip onto the root AABB's faces);
    entry-point keys cut them 2.2-3.2x per depth and leave only ~10-16% of
    blocks traversing."""
    octant = (
        (dx < 0).astype(jnp.int32)
        + 2 * (dy < 0).astype(jnp.int32)
        + 4 * (dz < 0).astype(jnp.int32)
    )
    # Slab entry into the root AABB.
    eps = jnp.float32(1e-30)
    ixd = 1.0 / jnp.where(jnp.abs(dx) < eps, jnp.where(dx < 0, -eps, eps), dx)
    iyd = 1.0 / jnp.where(jnp.abs(dy) < eps, jnp.where(dy < 0, -eps, eps), dy)
    izd = 1.0 / jnp.where(jnp.abs(dz) < eps, jnp.where(dz < 0, -eps, eps), dz)
    t1x, t2x = (lo[0] - ox) * ixd, (hi[0] - ox) * ixd
    t1y, t2y = (lo[1] - oy) * iyd, (hi[1] - oy) * iyd
    t1z, t2z = (lo[2] - oz) * izd, (hi[2] - oz) * izd
    tmin = jnp.maximum(
        jnp.maximum(jnp.minimum(t1x, t2x), jnp.minimum(t1y, t2y)),
        jnp.minimum(t1z, t2z),
    )
    tmax = jnp.minimum(
        jnp.minimum(jnp.maximum(t1x, t2x), jnp.maximum(t1y, t2y)),
        jnp.maximum(t1z, t2z),
    )
    enters = (tmax >= 0.0) & (tmin <= tmax)
    te = jnp.maximum(tmin, 0.0)
    px = ox + dx * te
    py = oy + dy * te
    pz = oz + dz * te

    ext = jnp.maximum(hi - lo, 1e-30)
    scale = float(1 << _MORTON_BITS) * 0.9999
    cx = ((px - lo[0]) / ext[0]).clip(0.0, 0.9999) * scale
    cy = ((py - lo[1]) / ext[1]).clip(0.0, 0.9999) * scale
    cz = ((pz - lo[2]) / ext[2]).clip(0.0, 0.9999) * scale
    ix = cx.astype(jnp.int32)
    iy = cy.astype(jnp.int32)
    iz = cz.astype(jnp.int32)
    m = jnp.zeros_like(ix)
    for b in range(_MORTON_BITS):
        m = m | (((ix >> b) & 1) << (3 * b + 2))
        m = m | (((iy >> b) & 1) << (3 * b + 1))
        m = m | (((iz >> b) & 1) << (3 * b))
    key = jnp.where(
        enters, (m << 3) | octant,
        (1 << (3 * _MORTON_BITS + 3)) | octant,
    )
    return jnp.where(alive_f > 0.5, key, jnp.int32(2 ** 30))


@partial(
    jax.jit,
    static_argnames=("n_tri", "n_sph", "n_mat", "n_lights", "n_em", "em_k",
                     "epsilon", "n_super", "block_rows", "dense_pair",
                     "cull_mode", "big_cull_mode", "debug_visits",
                     "diff_records"),
)
def _bounce_call(tables, seed_depth, state, n_tri, n_sph, n_mat, n_lights,
                 n_em, em_k, epsilon, n_super, block_rows,
                 dense_pair=False, cull_mode=-1, big_cull_mode=-1,
                 debug_visits=False, diff_records=False):
    """One bounce of the megakernel body over [rows, 128] state blocks.

    `diff_records=True` (mutually exclusive with debug_visits) appends the
    differentiable-replay record planes — n_diff_records(n_lights, em_k)
    extra [rows, 128] outputs per bounce (integrator/diff_megakernel.py)."""
    assert not (diff_records and debug_visits)
    tri, sph, mat, lgt, em, sup, hyp, clb, rec, bigp = tables
    rows = state[1].shape[0]
    grid = (rows // block_rows,)
    ray_spec = pl.BlockSpec(
        (block_rows, _LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    smem = lambda shape: pl.BlockSpec(
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.SMEM
    )
    clb_vmem = bool(n_super) and clb_fits_vmem(clb)
    kernel = _make_megakernel(
        n_tri, n_sph, n_mat, n_lights, n_em, em_k, max_depth=0,
        epsilon=epsilon, n_super=n_super, single_bounce=True,
        dense_pair=dense_pair, clb_vmem=clb_vmem, cull_mode=cull_mode,
        big_cull_mode=big_cull_mode,
        debug_visits=bool(debug_visits and n_super),
        diff_records=diff_records,
    )
    table_specs = [
        smem((2,)),
        smem(tri.shape), smem(sph.shape), smem(mat.shape),
        smem(lgt.shape), smem(em.shape),
    ]
    table_args = [seed_depth, tri, sph, mat, lgt, em]
    scratch = []
    if dense_pair and not n_super:
        table_specs += [pl.BlockSpec(memory_space=pltpu.VMEM)]
        table_args += [bigp]
    if n_super:
        vmem_full = pl.BlockSpec(memory_space=pltpu.VMEM)
        table_specs += [
            vmem_full,
            vmem_full,
            vmem_full if clb_vmem else pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            vmem_full,
        ]
        table_args += [sup, hyp, clb, rec, bigp]
        rows_max = max(1, em_k) * block_rows
        rec_rows = rec.shape[1] if rec.ndim == 3 else REC_LANES
        scratch = [
            pltpu.VMEM((GROUP, 128), jnp.float32),
            pltpu.VMEM((REC_QUEUE, rec_rows, PAIR_COLS), jnp.float32),
            pltpu.VMEM((hyp.shape[0], rows_max, 128), jnp.float32),
            pltpu.VMEM((GROUP2, rows_max, 128), jnp.float32),
            pltpu.VMEM((GROUP, rows_max, 128), jnp.float32),
            pltpu.SMEM((MASK_SLOTS,), jnp.int32),
            pltpu.VMEM((REC_QUEUE, rows_max, 128), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA((REC_QUEUE,)),
        ]
    out_specs = [ray_spec] * N_STATE
    out_shape = [
        jax.ShapeDtypeStruct((rows, _LANES), a.dtype) for a in state
    ]
    if debug_visits and n_super:
        out_specs = out_specs + [
            pl.BlockSpec((grid[0], 4), lambda i: (0, 0),
                         memory_space=pltpu.SMEM)
        ]
        out_shape = out_shape + [
            jax.ShapeDtypeStruct((grid[0], 4), jnp.int32)
        ]
        scratch = scratch + [pltpu.SMEM((4,), jnp.int32)]
    if diff_records:
        from .pallas_megakernel import n_diff_records

        n_drec = n_diff_records(n_lights, em_k)
        out_specs = out_specs + [ray_spec] * n_drec
        out_shape = out_shape + [
            jax.ShapeDtypeStruct((rows, _LANES), jnp.float32)
        ] * n_drec
    params = clb_compiler_params(clb, clb_vmem)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=table_specs + [ray_spec] * N_STATE,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        compiler_params=params,
    )(*table_args, *state)


def trace_megakernel_sorted(
    scene: SceneData,
    rays,
    options: RenderOptions,
    seed,
    tables=None,
    sort: bool = True,
    debug_visits: bool = False,
):
    """Full-path trace with per-bounce coherence sorting. Same contract as
    trace_megakernel: returns (spectrum [R,4] with alpha=collected,
    collected [R] bool); with debug_visits (profiling, binned scenes
    only) additionally a [max_depth, n_blocks, 4] i32 per-bounce visit
    counter array (see _mega_call for the column meaning).

    `sort=False` disables the permutation (an ablation/debug mode): each
    ray's RNG stream rides its carried state, so per-ray estimates are
    sort-invariant up to cross-record exact-t tie-breaks — sorted and
    unsorted runs agree per ray to float exactness on generic scenes."""
    if tables is None:
        tables = _pack_tables(scene)
    if scene.has_kernel_records:
        if scene.big_v0.shape[0] > scene.krn_big_pair.shape[0]:
            raise ValueError(
                f"megakernel unsupported: {scene.big_v0.shape[0]} dense "
                f"triangles exceed the pair record "
                f"({scene.krn_big_pair.shape[0]} rows)"
            )
        n_super = int(scene.krn_cl_bounds.shape[0])
        n_tri_tbl = int(scene.big_v0.shape[0])
        block_rows = int(
            os.environ.get("PTX_KRN_BLOCK_ROWS", _KRN_BLOCK_ROWS)
        )
        tables = tables + (
            scene.krn_sup_bounds, scene.krn_hyp_bounds,
            scene.krn_cl_bounds, scene.krn_records, scene.krn_big_pair,
        )
    else:
        n_super = 0
        n_tri_tbl = int(scene.tri_v0.shape[0])
        block_rows = _KRN_BLOCK_ROWS
        z = jnp.zeros((1,), jnp.float32)
        tables = tables + (z, z, z, z, scene.krn_big_pair)
    dense_pair = (not scene.has_kernel_records) and (
        scene.krn_big_pair.shape[0] > 1
    )

    o = jnp.asarray(rays.origin, jnp.float32)
    d = jnp.asarray(rays.direction, jnp.float32)
    r = o.shape[0]
    block = block_rows * _LANES
    pad = (-r) % block
    if pad:
        o = jnp.concatenate([o, jnp.zeros((pad, 3), o.dtype)])
        d = jnp.concatenate(
            [d, jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]], d.dtype), (pad, 1))]
        )
    rp = r + pad
    rows = rp // _LANES

    debug_visits = bool(debug_visits and n_super)
    statics = dict(
        n_tri=n_tri_tbl, n_sph=int(scene.sph_center.shape[0]),
        n_mat=int(scene.num_materials), n_lights=int(scene.n_point_lights),
        n_em=int(scene.n_emissive), em_k=int(scene.emissive_sample_count),
        epsilon=float(options.epsilon), n_super=n_super,
        block_rows=block_rows, dense_pair=dense_pair,
        cull_mode=int(scene.krn_cull_mode),
        big_cull_mode=int(scene.krn_big_cull_mode),
        debug_visits=debug_visits,
    )
    max_depth = int(options.max_depth)
    glue = _resolve_glue(n_super)
    lo = scene.root_lo
    hi = scene.root_hi
    seed_i = jnp.asarray(seed, jnp.int32)

    idx0 = jnp.arange(rp, dtype=jnp.int32)
    ones = jnp.ones(rp, jnp.float32)
    zeros = jnp.zeros(rp, jnp.float32)
    alive0 = jnp.concatenate(
        [jnp.ones(r, jnp.float32), jnp.zeros(pad, jnp.float32)]
    )
    state = (
        _seed_rng_flat(seed_i, idx0),
        o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2],
        ones, ones, ones, zeros, zeros, zeros,
        ones, ones, ones, zeros, alive0,
    )

    def cond(c):
        depth, st, idx, vis = c
        return (depth < max_depth) & (jnp.max(st[17]) > 0.5)

    def step(c):
        depth, st, idx, vis = c
        st2d = tuple(a.reshape(rows, _LANES) for a in st)
        seed_depth = jnp.stack([seed_i, depth])
        out = _bounce_call(tables, seed_depth, st2d, **statics)
        if debug_visits:
            st2d, v = out[:N_STATE], out[N_STATE]
            vis = jax.lax.dynamic_update_slice(
                vis, v[None], (depth, 0, 0)
            )
        else:
            st2d = out
        st = tuple(a.reshape(-1) for a in st2d)
        if not sort:
            return depth + 1, st, idx, vis
        key = _sort_key(st[1], st[2], st[3], st[4], st[5], st[6],
                        st[17], lo, hi)

        # Permutation glue (see _SORT_GLUE): the fused multi-operand sort
        # or the argsort + packed-row-gather. Round 2's 19 PER-ARRAY
        # takes (116 ms/bounce) are the formulation both replace.
        if glue == "fused":
            def do_sort(ops):
                return jax.lax.sort(ops, num_keys=1, is_stable=False)
        elif glue == "packed":
            def do_sort(ops):
                key_s, rest = _permute_packed(ops[0], ops[1:])
                return (key_s,) + rest
        else:  # "wide"
            def do_sort(ops):
                key_s, rest = _permute_wide(ops[0], ops[1:])
                return (key_s,) + rest

        # Tail bounces carry few live rays (sorted to the head, whole
        # blocks dead): re-sorting the full array buys nothing there, so
        # skip the sort once the live population is small.
        # Integer sum: an f32 accumulation loses exactness above ~2^24
        # rays per chunk, blurring the threshold comparison.
        n_alive = jnp.sum((st[17] > 0.5).astype(jnp.int32))
        out = jax.lax.cond(
            n_alive >= min(_SORT_MIN_ALIVE, max(rp // 4, 1)),
            do_sort, lambda ops: ops,
            (key,) + st + (idx,),
        )
        return depth + 1, tuple(out[1:1 + N_STATE]), out[1 + N_STATE], vis

    vis0 = jnp.zeros(
        (max_depth, rows // block_rows, 4) if debug_visits else (1, 1, 1),
        jnp.int32,
    )
    _, st, idx, vis = jax.lax.while_loop(
        cond, step, (jnp.int32(0), state, idx0, vis0)
    )

    # Un-permute by sorting on the original ray index.
    if glue == "fused":
        idx, out_r, out_g, out_b, coll_f = jax.lax.sort(
            (idx, st[10], st[11], st[12], st[16]), num_keys=1,
            is_stable=False,
        )
    else:
        unperm = _permute_wide if glue == "wide" else _permute_packed
        _, (out_r, out_g, out_b, coll_f) = unperm(
            idx, (st[10], st[11], st[12], st[16])
        )
    out_r = out_r[:r]
    out_g = out_g[:r]
    out_b = out_b[:r]
    coll = coll_f[:r] > 0.5
    spectrum = jnp.stack(
        [out_r, out_g, out_b, coll.astype(jnp.float32)], axis=-1
    )
    if debug_visits:
        return spectrum, coll, vis
    return spectrum, coll
