"""Binned cluster-major traversal v2: the TPU large-scene intersector.

The round-2 architecture of docs/DESIGN_large_scenes.md, fully fused:

  1. `_cand_kernel` (Pallas): per 1024-ray block, a `fori_loop` scans every
     cluster's AABB (SMEM-resident bounds, ~30 vector ops per cluster for
     the whole block) and keeps each ray's top-M candidate clusters — entry
     distance + id, (entry, id)-lexicographically ordered — in registers.
     No [R, C] matrix ever exists; HBM traffic is rays in, M slots out.
  2. Binning (jnp): one `lax.sort` keyed by cluster id that carries the
     ray components as payload operands — XLA TPU gathers and scatters are
     latency-bound (a measured 29 ms searchsorted + ~13 ms of gathers per
     65k-ray query at first), so the pipeline is built exclusively from
     sorts, tiny C-sized searchsorteds over the sorted keys, and layout
     ops. Per-cluster ranges stay unaligned/contiguous.
  3. `_isect_kernel` (Pallas): grid over clusters; each program keeps its
     cluster's triangle block VMEM-resident and streams its binned rays
     from HBM in double-buffered 512-ray groups, testing 8 triangles x 128
     rays per vector op. Outputs per-pair nearest (t, prim). Group tails
     spill into later clusters' ranges; the sequential grid guarantees the
     owning (later) program writes those slots last, so no alignment
     padding is needed.
  4. Resolve (jnp): min over the M slots per ray; then the *exactness
     rounds*: a ray whose (M+1)-th candidate entry (also returned by the
     kernel) still beats its best hit re-runs 1-3 with the lexicographic
     lower bound advanced past its processed clusters. The loop provably
     terminates (the bound strictly advances through a finite cluster set)
     and never approximates — same nearest-hit contract as the reference's
     ordered BVH recursion (ref: src/scene/scene.cpp:104-150).

Scene partition (SceneBuilder accel="binned"): "big" triangles (walls,
ground planes) are dense-tested per ray; only small mesh triangles live in
the clusters, so the cluster-set root AABB is tight and most rays are
pruned before step 1 (`live` mask + block-level skip). Shadow rays pass
`t_max`/`any_hit` and prune even harder.

Geometry is treated as non-differentiable on this path (the north-star
gradient contract covers materials/emitters only); inputs and outputs are
stop_gradient'ed.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..scene.scene import SceneData

_TRI_EPS = 1e-6
_FLT_MAX = 3.4028234663852886e38
_BLOCK = 1024          # rays per candidate-kernel program (8 sublanes x 128)
_GROUP = 512           # rays per intersect-kernel DMA group (and range align)
_TILE_TRIS = 64        # triangles per (8, 128) block tile: 8 octets x 8 rows
_RAY_ROWS = 16         # packed ray-table rows (9 used)
_M_ROWS = 8            # top-M slots + 1 overflow row => M <= 7
_MAX_CLUSTERS = 4096   # SMEM bounds-table budget
MAX_CLUSTERS = _MAX_CLUSTERS  # public: SceneBuilder sizes clusters to fit


# ---------------------------------------------------------------------------
# Host-side packing (called once at scene build)
# ---------------------------------------------------------------------------

def pack_blocks_np(blk_v0, blk_v1, blk_v2, blk_cull, blk_prim) -> np.ndarray:
    """[C, L//64, 8, 128] f32 cluster triangle blocks in Mosaic tile layout.

    One (8, 128) tile holds 64 triangles: sublane = triangle-within-octet,
    lane = octet*16 + component. Components: v0(0:3) e1(3:6) e2(6:9)
    cull(9) prim(10, f32; -1 on padding rows). Zero HBM padding waste
    (both trailing dims are tile-aligned), unlike a [C, L, 16] layout whose
    16-lane minor axis would be padded 8x to 128.
    """
    v0 = np.asarray(blk_v0, np.float32)
    v1 = np.asarray(blk_v1, np.float32)
    v2 = np.asarray(blk_v2, np.float32)
    cull = np.asarray(blk_cull)
    prim = np.asarray(blk_prim)
    c, l, _ = v0.shape
    if l % _TILE_TRIS:
        raise ValueError(f"cluster_size must be a multiple of {_TILE_TRIS}")
    if prim.max(initial=0) >= 2 ** 24:
        raise ValueError("binned traversal carries prim ids as f32 (< 2^24)")
    comp = np.zeros((c, l, 16), np.float32)
    comp[:, :, 0:3] = v0
    comp[:, :, 3:6] = v1 - v0
    comp[:, :, 6:9] = v2 - v0
    comp[:, :, 9] = cull
    comp[:, :, 10] = prim
    # t = tile*64 + octet*8 + sub  ->  [c, tile, sub, octet*16 + comp]
    comp = comp.reshape(c, l // _TILE_TRIS, 8, 8, 16)
    comp = comp.transpose(0, 1, 3, 2, 4)
    return np.ascontiguousarray(comp.reshape(c, l // _TILE_TRIS, 8, 128))


def pack_bounds_np(blk_lo, blk_hi, valid=None) -> np.ndarray:
    """[C, 8] f32 cluster bounds for the SMEM candidate scan:
    lo(0:3) hi(3:6) valid(6)."""
    lo = np.asarray(blk_lo, np.float32)
    hi = np.asarray(blk_hi, np.float32)
    c = lo.shape[0]
    if c > _MAX_CLUSTERS:
        raise ValueError(
            f"{c} clusters exceed the SMEM bounds budget ({_MAX_CLUSTERS}); "
            "increase cluster_size"
        )
    out = np.zeros((c, 8), np.float32)
    out[:, 0:3] = lo
    out[:, 3:6] = hi
    out[:, 6] = 1.0 if valid is None else np.asarray(valid, np.float32)
    return out


# ---------------------------------------------------------------------------
# Candidate kernel: per-ray top-M candidate clusters
# ---------------------------------------------------------------------------

def _cand_kernel(bounds_ref, rays_ref, ids_out, ent_out,
                 *, n_clusters: int, m: int):
    shp = (8, 128)
    inf = jnp.full(shp, jnp.inf, jnp.float32)
    for s in range(_M_ROWS):
        ids_out[0, s] = jnp.full(shp, -1, jnp.int32)
        ent_out[0, s] = inf

    # Whole-block skip: rays with nothing pending carry t_lo == inf (dead
    # lanes, finished rays, rays past the compacted live prefix), so blocks
    # with no pending ray never pay the cluster scan. Round 1 benefits from
    # the live-first compaction; later rounds from sparse pendings.
    t_lo = rays_ref[7, 0]
    run = jnp.min(t_lo) < jnp.inf

    @pl.when(run)
    def _():
        ox, oy, oz = rays_ref[0, 0], rays_ref[1, 0], rays_ref[2, 0]
        dx, dy, dz = rays_ref[3, 0], rays_ref[4, 0], rays_ref[5, 0]
        best = rays_ref[6, 0]
        id_lo = rays_ref[8, 0]
        # Reference slab-test semantics: zero direction components use
        # FLT_MAX inverses (ref: src/scene/bounding_box.cpp:38-73).
        zx, zy, zz = jnp.abs(dx) > 0.0, jnp.abs(dy) > 0.0, jnp.abs(dz) > 0.0
        ix = jnp.where(zx, 1.0 / jnp.where(zx, dx, 1.0), _FLT_MAX)
        iy = jnp.where(zy, 1.0 / jnp.where(zy, dy, 1.0), _FLT_MAX)
        iz = jnp.where(zz, 1.0 / jnp.where(zz, dz, 1.0), _FLT_MAX)

        init = tuple([inf] * (m + 1) + [inf] * (m + 1))

        def body(c, carry):
            e = list(carry[: m + 1])
            cid = list(carry[m + 1:])
            lox, loy, loz = bounds_ref[c, 0], bounds_ref[c, 1], bounds_ref[c, 2]
            hix, hiy, hiz = bounds_ref[c, 3], bounds_ref[c, 4], bounds_ref[c, 5]
            bval = bounds_ref[c, 6]
            t1x, t2x = (lox - ox) * ix, (hix - ox) * ix
            t1y, t2y = (loy - oy) * iy, (hiy - oy) * iy
            t1z, t2z = (loz - oz) * iz, (hiz - oz) * iz
            tmin = jnp.maximum(
                jnp.maximum(jnp.minimum(t1x, t2x), jnp.minimum(t1y, t2y)),
                jnp.minimum(t1z, t2z),
            )
            tmax = jnp.minimum(
                jnp.minimum(jnp.maximum(t1x, t2x), jnp.maximum(t1y, t2y)),
                jnp.maximum(t1z, t2z),
            )
            entry = jnp.where(tmin < 0.0, 0.0, tmin)
            cf = jnp.full(shp, c, jnp.float32)
            # Lexicographic lower bound (entry, id) > (t_lo, id_lo): the
            # rounds' strict-progress guarantee even through entry ties
            # (rays inside several overlapping cluster AABBs all clamp to 0).
            after = (entry > t_lo) | ((entry == t_lo) & (cf > id_lo))
            ok = (
                (bval > 0.5) & (tmax >= 0.0) & (tmin <= tmax)
                & (entry < best) & after
            )
            ce = jnp.where(ok, entry, jnp.inf)
            ci = jnp.where(ok, cf, jnp.inf)
            # Insertion into the sorted slots; the displaced element falls
            # through and finally competes for the overflow row (the best
            # candidate NOT kept — the rounds' continuation signal).
            for j in range(m):
                less = (ce < e[j]) | ((ce == e[j]) & (ci < cid[j]))
                e[j], ce = (
                    jnp.where(less, ce, e[j]), jnp.where(less, e[j], ce),
                )
                cid[j], ci = (
                    jnp.where(less, ci, cid[j]), jnp.where(less, cid[j], ci),
                )
            less = (ce < e[m]) | ((ce == e[m]) & (ci < cid[m]))
            e[m] = jnp.where(less, ce, e[m])
            cid[m] = jnp.where(less, ci, cid[m])
            return tuple(e + cid)

        carry = jax.lax.fori_loop(0, n_clusters, body, init)
        for s in range(m + 1):
            es, cs = carry[s], carry[m + 1 + s]
            has = es < jnp.inf
            ent_out[0, s] = es
            ids_out[0, s] = jnp.where(has, cs, -1.0).astype(jnp.int32)


@functools.partial(
    jax.jit, static_argnames=("n_clusters", "m", "interpret")
)
def _cand_call(bounds, rays4, n_clusters, m, interpret=False):
    nb = rays4.shape[1]
    smem = lambda a: pl.BlockSpec(
        a.shape, lambda i: (0,) * a.ndim, memory_space=pltpu.SMEM
    )
    rays_spec = pl.BlockSpec(
        (_RAY_ROWS, 1, 8, 128), lambda i: (0, i, 0, 0),
        memory_space=pltpu.VMEM,
    )
    out_spec = pl.BlockSpec(
        (1, _M_ROWS, 8, 128), lambda i: (i, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )
    kernel = functools.partial(_cand_kernel, n_clusters=n_clusters, m=m)
    return pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[smem(bounds), rays_spec],
        out_specs=[out_spec, out_spec],
        out_shape=[
            jax.ShapeDtypeStruct((nb, _M_ROWS, 8, 128), jnp.int32),
            jax.ShapeDtypeStruct((nb, _M_ROWS, 8, 128), jnp.float32),
        ],
        interpret=interpret,
    )(bounds, rays4)


# ---------------------------------------------------------------------------
# Cluster-major intersect kernel
# ---------------------------------------------------------------------------

def _isect_kernel(offs_ref, cnts_ref, blk_ref, rays_hbm, t_out, p_out,
                  rscr, tscr, pscr, in_sem, out_sem, *, n_tiles: int):
    ci = pl.program_id(0)
    start = offs_ref[ci]
    count = cnts_ref[ci]
    n_groups = pl.cdiv(count, _GROUP)

    # Ranges are 128-aligned by the binning's sort fillers (Mosaic demands
    # provable lane alignment for DMA offsets — the multiple_of hint
    # asserts it). A group's 512-wide tail spills into later clusters'
    # ranges — the sequential grid guarantees the owning program writes
    # those slots last (and each program drains its output DMAs before
    # finishing), so spill is benign.
    def in_dma(slot, g):
        base = pl.multiple_of(start + g * _GROUP, 128)
        return pltpu.make_async_copy(
            rays_hbm.at[:, pl.ds(base, _GROUP)], rscr.at[slot], in_sem.at[slot]
        )

    def out_dma_t(slot, g):
        base = pl.multiple_of(start + g * _GROUP, 128)
        return pltpu.make_async_copy(
            tscr.at[slot], t_out.at[:, pl.ds(base, _GROUP)], out_sem.at[slot, 0]
        )

    def out_dma_p(slot, g):
        base = pl.multiple_of(start + g * _GROUP, 128)
        return pltpu.make_async_copy(
            pscr.at[slot], p_out.at[:, pl.ds(base, _GROUP)], out_sem.at[slot, 1]
        )

    @pl.when(n_groups > 0)
    def _():
        in_dma(0, 0).start()

    def group(g, _):
        slot = g % 2

        @pl.when(g + 1 < n_groups)
        def _():
            in_dma((g + 1) % 2, g + 1).start()

        # The write scratch for this slot was handed to a DMA two groups
        # ago; reclaim it before overwriting.
        @pl.when(g >= 2)
        def _():
            out_dma_t(slot, g - 2).wait()
            out_dma_p(slot, g - 2).wait()

        in_dma(slot, g).wait()

        for sub in range(_GROUP // 128):
            sl = slice(sub * 128, (sub + 1) * 128)
            ox, oy, oz = rscr[slot, 0:1, sl], rscr[slot, 1:2, sl], rscr[slot, 2:3, sl]
            dx, dy, dz = rscr[slot, 3:4, sl], rscr[slot, 4:5, sl], rscr[slot, 5:6, sl]
            bt = jnp.full((1, 128), jnp.inf, jnp.float32)
            bp = jnp.full((1, 128), -1.0, jnp.float32)
            for tile in range(n_tiles):
                for octet in range(8):
                    q = octet * 16
                    v0x = blk_ref[0, tile, :, q + 0: q + 1]
                    v0y = blk_ref[0, tile, :, q + 1: q + 2]
                    v0z = blk_ref[0, tile, :, q + 2: q + 3]
                    e1x = blk_ref[0, tile, :, q + 3: q + 4]
                    e1y = blk_ref[0, tile, :, q + 4: q + 5]
                    e1z = blk_ref[0, tile, :, q + 5: q + 6]
                    e2x = blk_ref[0, tile, :, q + 6: q + 7]
                    e2y = blk_ref[0, tile, :, q + 7: q + 8]
                    e2z = blk_ref[0, tile, :, q + 8: q + 9]
                    cull = blk_ref[0, tile, :, q + 9: q + 10]
                    prim = blk_ref[0, tile, :, q + 10: q + 11]

                    # Moller-Trumbore, (8 tris, 128 rays) per op
                    # (ref: src/scene/object.cpp:146-182).
                    px = dy * e2z - dz * e2y
                    py = dz * e2x - dx * e2z
                    pz = dx * e2y - dy * e2x
                    det = e1x * px + e1y * py + e1z * pz
                    is_cull = cull > 0.5
                    miss_det = (is_cull & (det <= _TRI_EPS)) | (
                        (~is_cull) & (jnp.abs(det) <= _TRI_EPS)
                    )
                    inv_det = 1.0 / jnp.where(miss_det, 1.0, det)
                    tx = ox - v0x
                    ty = oy - v0y
                    tz = oz - v0z
                    u = (tx * px + ty * py + tz * pz) * inv_det
                    qx = ty * e1z - tz * e1y
                    qy = tz * e1x - tx * e1z
                    qz = tx * e1y - ty * e1x
                    v = (dx * qx + dy * qy + dz * qz) * inv_det
                    t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
                    ok = (
                        (prim >= 0.0) & ~miss_det
                        & (u >= 0.0) & (u <= 1.0)
                        & (v >= 0.0) & (u + v <= 1.0)
                        & (t >= 0.0)
                    )
                    th = jnp.where(ok, t, jnp.inf)
                    tmin = jnp.min(th, axis=0, keepdims=True)
                    pmin = jnp.min(
                        jnp.where(th <= tmin, prim, jnp.float32(3e38)),
                        axis=0, keepdims=True,
                    )
                    better = tmin < bt
                    bt = jnp.where(better, tmin, bt)
                    bp = jnp.where(better, pmin, bp)
            tscr[slot, 0:1, sl] = bt
            pscr[slot, 0:1, sl] = jnp.where(bt < jnp.inf, bp, -1.0).astype(
                jnp.int32
            )

        out_dma_t(slot, g).start()
        out_dma_p(slot, g).start()
        return 0

    jax.lax.fori_loop(0, n_groups, group, 0)

    @pl.when(n_groups >= 2)
    def _():
        s = (n_groups - 2) % 2
        out_dma_t(s, n_groups - 2).wait()
        out_dma_p(s, n_groups - 2).wait()

    @pl.when(n_groups >= 1)
    def _():
        s = (n_groups - 1) % 2
        out_dma_t(s, n_groups - 1).wait()
        out_dma_p(s, n_groups - 1).wait()


@functools.partial(jax.jit, static_argnames=("n_tiles", "interpret"))
def _isect_call(offs, cnts, blocks, rays_t, n_tiles, interpret=False):
    c = blocks.shape[0]
    tp = rays_t.shape[1]
    smem = lambda a: pl.BlockSpec(
        a.shape, lambda i: (0,) * a.ndim, memory_space=pltpu.SMEM
    )
    blk_spec = pl.BlockSpec(
        (1,) + blocks.shape[1:], lambda i: (i, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )
    hbm_spec = pl.BlockSpec(memory_space=pl.ANY)
    kernel = functools.partial(_isect_kernel, n_tiles=n_tiles)
    return pl.pallas_call(
        kernel,
        grid=(c,),
        in_specs=[smem(offs), smem(cnts), blk_spec, hbm_spec],
        out_specs=[hbm_spec, hbm_spec],
        out_shape=[
            jax.ShapeDtypeStruct((8, tp), jnp.float32),
            jax.ShapeDtypeStruct((8, tp), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, 8, _GROUP), jnp.float32),
            pltpu.VMEM((2, 8, _GROUP), jnp.float32),
            pltpu.VMEM((2, 8, _GROUP), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        interpret=interpret,
    )(offs, cnts, blocks, rays_t)


# ---------------------------------------------------------------------------
# jnp pipeline: binning, rounds, batching
# ---------------------------------------------------------------------------

def _dense_part(scene: SceneData, o, d):
    """Nearest hit over the big-triangle set + spheres (jnp; both sets are
    tiny for partitioned scenes)."""
    from ..ops.intersect import intersect_spheres, intersect_triangles

    big = jnp.int32(2 ** 30)
    best_t = jnp.full(o.shape[0], jnp.inf)
    best_p = jnp.full(o.shape[0], -1, jnp.int32)
    # min+masked-min selects instead of argmin/take_along_axis: XLA TPU
    # gathers are latency-bound even at these sizes.
    if scene.n_big > 0:
        t = intersect_triangles(
            o[:, None, :], d[:, None, :],
            scene.big_v0[None], scene.big_v1[None], scene.big_v2[None],
            scene.big_cull[None],
        )
        t = jnp.where((scene.big_prim[None] >= 0) & (t >= 0.0), t, jnp.inf)
        tb = jnp.min(t, axis=1)
        pb = jnp.min(
            jnp.where(t <= tb[:, None], scene.big_prim[None], big), axis=1
        )
        hit = jnp.isfinite(tb)
        best_t = jnp.where(hit, tb, best_t)
        best_p = jnp.where(hit, pb, best_p)
    if scene.n_sph > 0:
        t = intersect_spheres(
            o[:, None, :], d[:, None, :],
            scene.sph_center[None], scene.sph_radius[None],
        )
        t = jnp.where(scene.sph_valid[None] & (t >= 0.0), t, jnp.inf)
        ts = jnp.min(t, axis=1)
        sl = jnp.arange(t.shape[1], dtype=jnp.int32)[None] + scene.n_tri
        ps = jnp.min(jnp.where(t <= ts[:, None], sl, big), axis=1)
        better = ts < best_t
        best_t = jnp.where(better, ts, best_t)
        best_p = jnp.where(better, ps, best_p)
    return best_t, best_p


def _root_entry(scene: SceneData, o, d):
    from ..ops.intersect import intersect_aabb

    return intersect_aabb(o, d, scene.root_lo[None], scene.root_hi[None])


def _pack_rays4(o, d, best, t_lo, id_lo):
    """[16, NB, 8, 128] candidate-kernel ray table from [RB] columns."""
    rb = o.shape[0]
    nb = rb // _BLOCK
    rows = [o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2],
            best, t_lo, id_lo]
    rows += [jnp.zeros(rb)] * (_RAY_ROWS - len(rows))
    return jnp.stack(rows).astype(jnp.float32).reshape(_RAY_ROWS, nb, 8, 128)


def _round_body(scene, o, d, best_t, best_p, t_lo, id_lo, live, *,
                m, any_hit, interpret):
    """One candidate->bin->intersect->resolve round over a [RB] batch."""
    rb = o.shape[0]
    c = scene.trv_bounds.shape[0]
    n_tiles = scene.trv_blocks.shape[1]
    l = n_tiles * _TILE_TRIS

    # Dead/finished rays: best=0 so `entry < best` never passes (and their
    # t_lo carries inf, enabling the kernel's whole-block skip).
    best_in = jnp.where(live, best_t, 0.0)
    t_lo_in = jnp.where(live, t_lo, jnp.inf)
    rays4 = _pack_rays4(o, d, best_in, t_lo_in, id_lo)
    ids4, ent4 = _cand_call(
        scene.trv_bounds, rays4, n_clusters=c, m=m, interpret=interpret,
    )
    # [NB, 8, 8, 128] -> [slots, RB]
    ids = ids4.transpose(1, 0, 2, 3).reshape(_M_ROWS, rb)
    ent = ent4.transpose(1, 0, 2, 3).reshape(_M_ROWS, rb)

    # --- Binning: ONE sort keyed by cluster id, carrying the pair's ray
    # components and original index as payload operands. No gathers, no
    # scatters, no searchsorted over pair-sized arrays (all measured
    # latency-bound on TPU); range bookkeeping is C-sized.
    #
    # Mosaic requires 128-lane-aligned DMA offsets, so per-cluster ranges
    # are aligned BY THE SORT ITSELF: 128 filler elements per cluster ride
    # along, keyed to their cluster exactly `(-count) % 128` times (the
    # rest key to the trash bin at c). Stable sorting then leaves every
    # cluster's range a multiple of 128 long at an aligned offset.
    flat_ids = ids[:m].reshape(-1)  # pair p = s*rb + r
    key = jnp.where(flat_ids >= 0, flat_ids, c).astype(jnp.int32)
    counts0 = jax.ops.segment_sum(
        jnp.ones_like(key), key, num_segments=c + 1
    )[:c].astype(jnp.int32)
    deficit = (-counts0) % 128
    fk = jax.lax.broadcasted_iota(jnp.int32, (c, 128), 0)
    fj = jax.lax.broadcasted_iota(jnp.int32, (c, 128), 1)
    fill_key = jnp.where(fj < deficit[:, None], fk, c).reshape(-1)

    npair = rb * m
    nfill = c * 128
    tot = npair + nfill
    key_all = jnp.concatenate([key, fill_key])
    payload = jnp.arange(tot, dtype=jnp.int32)
    tile = lambda x, v: jnp.concatenate(
        [jnp.tile(x, m), jnp.full(nfill, v, jnp.float32)]
    )
    skey, sox, soy, soz, sdx, sdy, sdz, spay = jax.lax.sort(
        [key_all,
         tile(o[:, 0], 0.0), tile(o[:, 1], 0.0), tile(o[:, 2], 0.0),
         tile(d[:, 0], 0.0), tile(d[:, 1], 0.0), tile(d[:, 2], 1.0),
         payload],
        num_keys=1,
    )
    # Per-cluster contiguous (now 128-aligned) ranges off the sorted keys.
    offs = jnp.searchsorted(
        skey, jnp.arange(c + 1, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)
    counts = jnp.diff(offs)
    zero = jnp.zeros(tot, jnp.float32)
    rays_t = jnp.stack([sox, soy, soz, sdx, sdy, sdz, zero, zero])
    # Spill margin: the last cluster's final 512-ray group may read/write
    # past its range end.
    rays_t = jnp.pad(rays_t, ((0, 0), (0, _GROUP)))

    t_pairs, p_pairs = _isect_call(
        offs[:c], counts, scene.trv_blocks, rays_t,
        n_tiles=n_tiles, interpret=interpret,
    )
    # Un-sort with a second (3-operand) sort by original index; the filler
    # payloads (>= npair) sort to the tail and are sliced away.
    _, t_flat, p_flat = jax.lax.sort(
        [spay, t_pairs[0, :tot], p_pairs[0, :tot]], num_keys=1
    )
    valid_cand = ids[:m] >= 0
    t_cand = jnp.where(valid_cand, t_flat[:npair].reshape(m, rb), jnp.inf)
    p_cand = p_flat[:npair].reshape(m, rb)

    # --- Resolve (masked-min selects; no take_along_axis).
    t_new = jnp.min(t_cand, axis=0)
    p_new = jnp.full(rb, -1, jnp.int32)
    chosen = jnp.zeros(rb, bool)
    for s in range(m):
        on = (~chosen) & (t_cand[s] == t_new)
        p_new = jnp.where(on, p_cand[s], p_new)
        chosen = chosen | on
    better = live & (t_new < best_t)
    best_t = jnp.where(better, t_new, best_t)
    best_p = jnp.where(better, p_new, best_p)

    # Advance the lexicographic bound past this round's processed clusters
    # (last valid slot wins by sequential overwrite — slots are a valid
    # prefix by construction).
    worst_e = jnp.full(rb, -jnp.inf)
    worst_i = jnp.full(rb, -jnp.inf)
    for s in range(m):
        v = valid_cand[s]
        worst_e = jnp.where(v, ent[s], worst_e)
        worst_i = jnp.where(v, ids[s].astype(jnp.float32), worst_i)
    any_kept = valid_cand[0]
    e_next = ent[m]
    pending = live & any_kept & (e_next < best_t)
    if any_hit:
        pending = pending & (best_p < 0)
    t_lo = jnp.where(pending, worst_e, jnp.inf)
    id_lo = jnp.where(pending, worst_i, jnp.inf)
    return best_t, best_p, t_lo, id_lo, pending


def binned_intersect_tpu(
    scene: SceneData,
    o,
    d,
    t_max=None,
    live=None,
    any_hit: bool = False,
    m: int = 4,
    batch: int = 1 << 17,
    interpret: bool = False,
):
    """Exact nearest-hit through the binned cluster-major pipeline.

    o, d: [R, 3]. `t_max` ([R] or None): hits at t >= t_max are reported as
    misses (shadow-ray semantics; also a pruning bound). `live` ([R] bool or
    None): lanes with live=False skip the cluster stage and return the
    dense-part (big tris + spheres) result — callers pass their alive mask
    so dead wavefront lanes cost nothing. `any_hit`: stop the exactness
    rounds once any in-range hit is known (visibility queries; the returned
    hit may then not be the nearest). Returns (t [R], prim [R]), -1 on miss.
    """
    assert 1 <= m <= _M_ROWS - 1
    o = jax.lax.stop_gradient(jnp.asarray(o, jnp.float32))
    d = jax.lax.stop_gradient(jnp.asarray(d, jnp.float32))
    if t_max is not None:
        t_max = jax.lax.stop_gradient(t_max)
    r = o.shape[0]

    t0, p0 = _dense_part(scene, o, d)
    if t_max is not None:
        miss = t0 >= t_max
        t0 = jnp.where(miss, jnp.inf, t0)
        p0 = jnp.where(miss, -1, p0)

    entry = _root_entry(scene, o, d)
    live0 = (entry >= 0.0) & (entry < t0)
    if t_max is not None:
        live0 = live0 & (entry < t_max)
    if live is not None:
        live0 = live0 & live
    if any_hit:
        live0 = live0 & (p0 < 0)  # dense occluder already decides visibility

    best0 = t0 if t_max is None else jnp.minimum(t0, t_max)

    # Compact live rays to the front with ONE sort that carries the ray
    # components, dense results, and original indices (gather/scatter-free:
    # XLA TPU gathers are latency-bound). Batch the cluster stage over
    # fixed [RB] slices so every downstream shape (sorts, pair table,
    # kernels) scales with the live count, not the wavefront size.
    rb = min(batch, max(_BLOCK, -(-r // _BLOCK) * _BLOCK))
    pad = (-r) % rb
    n_live = jnp.sum(live0).astype(jnp.int32)

    key0 = (~live0).astype(jnp.int32)
    pay0 = jnp.arange(r, dtype=jnp.int32)
    (_, sox, soy, soz, sdx, sdy, sdz,
     sbest, st0, sp0, spay) = jax.lax.sort(
        [key0, o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2],
         best0, t0, p0, pay0],
        num_keys=1,
    )

    padf = lambda x, v: jnp.pad(x, (0, pad), constant_values=v)
    os_ = jnp.stack([padf(sox, 0.0), padf(soy, 0.0), padf(soz, 0.0)], -1)
    ds_ = jnp.stack([padf(sdx, 0.0), padf(sdy, 0.0), padf(sdz, 1.0)], -1)
    bests = padf(sbest, 0.0)
    lives = jnp.arange(r + pad) < n_live

    # Accumulators live in SORTED space (batch writes are contiguous
    # dynamic_update_slices); one final sort by original index un-sorts.
    out_t = padf(st0, jnp.inf)
    out_p = padf(sp0, -1)
    spay_p = jnp.concatenate(
        [spay, jnp.arange(r, r + pad, dtype=jnp.int32)]
    )

    n_batches = (r + pad) // rb

    def batch_cond(st):
        b = st[0]
        return (b < n_batches) & (b * rb < n_live)

    def batch_body(st):
        b, out_t, out_p = st
        sl = b * rb
        o_b = jax.lax.dynamic_slice(os_, (sl, 0), (rb, 3))
        d_b = jax.lax.dynamic_slice(ds_, (sl, 0), (rb, 3))
        best_b = jax.lax.dynamic_slice(bests, (sl,), (rb,))
        live_b = jax.lax.dynamic_slice(lives, (sl,), (rb,))

        best_t = best_b
        best_p = jnp.full(rb, -1, jnp.int32)
        t_lo = jnp.where(live_b, -jnp.inf, jnp.inf)
        id_lo = jnp.full(rb, -jnp.inf)

        c = scene.trv_bounds.shape[0]

        def r_cond(rst):
            return jnp.any(rst[2] < jnp.inf) & (rst[5] < c + 1)

        def r_body(rst):
            bt, bp, tl, il, live_r, rnd = rst
            bt, bp, tl, il, pend = _round_body(
                scene, o_b, d_b, bt, bp, tl, il, live_r,
                m=m, any_hit=any_hit, interpret=interpret,
            )
            return bt, bp, tl, il, live_r & pend, rnd + 1

        bt, bp, _, _, _, _ = jax.lax.while_loop(
            r_cond, r_body,
            (best_t, best_p, t_lo, id_lo, live_b, jnp.int32(0)),
        )

        # Cluster hits merge into the dense-initialized outputs; lanes whose
        # best is still the dense result write nothing new (bp stays -1).
        mask = live_b & (bp >= 0)
        cur_t = jax.lax.dynamic_slice(out_t, (sl,), (rb,))
        cur_p = jax.lax.dynamic_slice(out_p, (sl,), (rb,))
        out_t = jax.lax.dynamic_update_slice(
            out_t, jnp.where(mask, bt, cur_t), (sl,)
        )
        out_p = jax.lax.dynamic_update_slice(
            out_p, jnp.where(mask, bp, cur_p), (sl,)
        )
        return b + 1, out_t, out_p

    _, out_t, out_p = jax.lax.while_loop(
        batch_cond, batch_body, (jnp.int32(0), out_t, out_p)
    )

    _, t, p = jax.lax.sort([spay_p, out_t, out_p], num_keys=1)
    t = t[:r]
    p = p[:r]
    hit = (p >= 0) & jnp.isfinite(t)
    return jnp.where(hit, t, -1.0), jnp.where(hit, p, -1)


# ---------------------------------------------------------------------------
# jnp reference path (CPU fallback + differential-test oracle)
# ---------------------------------------------------------------------------

def binned_intersect_ref(scene: SceneData, o, d, t_max=None, live=None,
                         any_hit: bool = False):
    """Same contract as binned_intersect_tpu, pure jnp: dense part + the
    sweep intersector over the cluster blocks. Used off-TPU and as the
    exactness oracle for the kernels."""
    from ..ops.intersect import sweep_intersect

    t0, p0 = _dense_part(scene, o, d)
    ts, ps = sweep_intersect(scene, o, d)
    ts = jnp.where(ts >= 0.0, ts, jnp.inf)
    better = ts < t0
    t = jnp.where(better, ts, t0)
    p = jnp.where(better, ps, p0)
    if t_max is not None:
        miss = t >= t_max
        t = jnp.where(miss, jnp.inf, t)
        p = jnp.where(miss, -1, p)
    hit = (p >= 0) & jnp.isfinite(t)
    return jnp.where(hit, t, -1.0), jnp.where(hit, p, -1)


# ---------------------------------------------------------------------------
# In-kernel traversal as a standalone wavefront intersector (gp fast path)
# ---------------------------------------------------------------------------

def krn_intersect(scene: SceneData, o, d, t_max=None, live=None,
                  any_hit: bool = False, interpret: bool = False):
    """Same contract as binned_intersect_tpu, but the clustered mesh is
    resolved by the in-kernel tiered traversal (accel/kernel_traverse.py)
    instead of the binned sort/bin pipeline — zero per-query glue, exact
    over any cluster subset. This is the per-shard intersector for
    geometry-parallel rendering (parallel/geometry.py): min-over-shards of
    exact local nearest hits is the exact global nearest, and the records
    carry GLOBAL prim ids so the replicated estimator shades winners from
    the replicated tri tables. Also serves lean-built scenes, whose
    binned-wavefront tables were never packed.

    Ref analog: none — the reference shares one BVH across threads
    (src/worker.cpp:364-387); primitive sharding has no C++ counterpart.
    """
    from ..accel.kernel_traverse import cluster_intersect_kernel

    if scene.krn_records.ndim == 4:
        # Inside a shard_map body the stacked kernel tables arrive with a
        # local leading length-1 shard axis — peel it.
        import dataclasses

        scene = dataclasses.replace(
            scene,
            krn_records=scene.krn_records[0],
            krn_cl_bounds=scene.krn_cl_bounds[0],
            krn_sup_bounds=scene.krn_sup_bounds[0],
            krn_hyp_bounds=scene.krn_hyp_bounds[0],
        )
    o = jax.lax.stop_gradient(jnp.asarray(o, jnp.float32))
    d = jax.lax.stop_gradient(jnp.asarray(d, jnp.float32))
    if t_max is not None:
        t_max = jax.lax.stop_gradient(t_max)

    t0, p0 = _dense_part(scene, o, d)  # (inf, -1) on miss
    if t_max is not None:
        miss = t0 >= t_max
        t0 = jnp.where(miss, jnp.inf, t0)
        p0 = jnp.where(miss, -1, p0)

    # Pruning bound for the cluster query: the dense hit (or the shadow
    # limit) — lanes below it never descend. Dead lanes carry 0 so the
    # kernel's root gate drops them outright; for visibility queries a
    # dense occluder already decides, so those lanes go inactive too.
    lim = t0 if t_max is None else jnp.minimum(t0, t_max)
    if live is not None:
        lim = jnp.where(live, lim, 0.0)
    if any_hit:
        lim = jnp.where(p0 >= 0, 0.0, lim)

    t1, p1 = cluster_intersect_kernel(
        scene, o, d, t_max=lim, any_hit=any_hit, interpret=interpret
    )

    if any_hit:
        occ = (p1 >= 0) | (p0 >= 0)
        # Any in-range hit decides; report the dense t where known, else
        # the kernel's sentinel (callers only consume p >= 0).
        t = jnp.where(p0 >= 0, t0, t1)
        return jnp.where(occ, t, -1.0), jnp.where(occ, jnp.maximum(p1, p0), -1)

    hit1 = p1 >= 0
    t = jnp.where(hit1, t1, t0)
    p = jnp.where(hit1, p1, p0)
    hit = (p >= 0) & jnp.isfinite(t)
    return jnp.where(hit, t, -1.0), jnp.where(hit, p, -1)
