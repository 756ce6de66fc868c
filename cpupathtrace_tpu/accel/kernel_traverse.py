"""In-kernel cluster traversal: the large-scene intersector for the Pallas
megakernel (and a standalone single-query kernel for tests/benchmarks).

The binned pipeline (pallas_traverse.py) is exact and general but pays
~15-35 ms of sort/bin glue per wavefront query; with ~24 queries per
rendered frame (intersect + shadow per bounce) that caps the dragon
benchmark near the CPU reference. This module removes the glue entirely:
traversal runs INSIDE a Pallas program against the bounce state held in
registers, so a full path trace issues zero intermediate HBM round trips
(ref: the recursive in-cache BVH walk src/scene/scene.cpp:104-150 — the
TPU analog keeps the working set on-chip instead of in L1).

Everything on this path is VECTOR work: measured on v5e, serial
`fori_loop`s with per-iteration SMEM scalar loads stall the VPU so badly
(~0.7 us/ray/bounce for a ~40-op loop body) that they dominated whole
frames. The three tiers are therefore all evaluated PAIRWISE:

  * superclusters: groups of 32 consecutive clusters (the cluster BVH
    emits clusters in spatial order). Bounds live in a VMEM table
    [Sp, 128] (sublanes = superclusters, lanes = lo3/hi3/valid); slab
    entries for all (sup, ray) pairs are computed once per query into an
    [Sp, 8, 128] tensor (+inf where invalid/no-hit), so the scan step is
    one compare + reduce per supercluster.
  * cluster bounds: per group, a [32, 128] page (sublanes = clusters,
    lanes = lo3/hi3/valid) DMA'd HBM->VMEM on descent; pair entries
    [32, 8, 128] computed once per descended group.
  * cluster records: up to 128 triangles, packed as PAIRWISE feature
    tables [128, 128] f32 (sublanes = triangles, lanes = Plucker/MT
    features, 28 used — see `pack_kernel_tables_np`), DMA'd HBM->VMEM
    DOUBLE-BUFFERED: the fetch of record k overlaps the test of k-1.

The record test builds all (128 tris x 128 rays) Moller-Trumbore
quantities per ray row from rank-1 broadcasts (tri-feature column x
ray-feature row) on the VPU — measured 3.1x faster per record than the
serial formulation; the MXU matmul variant loses to the f32 3-pass
decomposition and the [5T, R] writeback. The Plucker factorization
(m = o x d):

    det   = -d . N                  (N = e1 x e2)
    u_num =  m . e2 + d . (v0 x e2)
    v_num = -m . e1 - d . (v0 x e1)
    t_num =  o . N  - v0 . N
    u, v, t = (u_num, v_num, t_num) / det

matches the classic (P, Q) form (ops/intersect.py:32-96, ref:
src/scene/object.cpp:146-182) to ~1e-7 relative. Sign-normalizing by
sgn(det) makes the inside test `min(su, sv, sd-su-sv) >= 0 and st >= 0`;
back-face culling additionally requires det > 0 (ref semantics:
object.cpp:152-158). Ray rows whose slab test rejects the cluster skip
the pair test entirely via scalar `lax.cond` — the SIMT-divergence
analog at 128-ray granularity.

Nearest-hit queries tighten `best_t` as clusters resolve, so later
clusters prune; any-hit (shadow) queries drop lanes as they occlude.
Exactness: every cluster whose AABB any live ray enters below its
current bound is tested — the same contract as the reference's ordered
recursion, without the ordering (pruning is monotone, order only affects
how fast it tightens).

Geometry is non-differentiable on this path (north-star gradients cover
materials/emitters only).
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TRI_EPS = 1e-6
_FLT_MAX = 3.4028234663852886e38
_INF = np.float32(np.inf)

REC_LANES = 128  # triangles per cluster (one sublane-tile column)
# Feature columns per triangle: 28 used, padded to a full 128-lane tile —
# Mosaic cannot slice sub-tile minor dims out of HBM memrefs for DMA.
PAIR_COLS = 128
GROUP = 32       # clusters per supercluster
GROUP2 = 16      # superclusters per hyper page (<= _MASK_BITS: one mask)

# Pair-record feature columns ([128 tris, 128] f32, 28 used):
#   0:3   -N            (det = -d.N;  t_num uses o.N = -(c0..c2 . o))
#   3:6   e2            (u_num: m . e2)
#   6:9   v0 x e2       (u_num: d . (v0 x e2))
#   9:12  -e1           (v_num: -m . e1)
#   12:15 -(v0 x e1)    (v_num: -d . (v0 x e1))
#   15    v0 . N        (t_num = o.N - v0.N)
#   16    cull flag
#   17    prim id (f32, exact < 2^24)
#   18    mat id
#   19:22 n0   22:25 n1   25:28 n2   (unnormalized vertex normals)
_C_CULL, _C_PRIM, _C_MAT, _C_N0 = 16, 17, 18, 19

# Bounds-table lanes (both tiers): lo(0:3) hi(3:6) valid(6).
_B_LO, _B_HI, _B_VALID = 0, 3, 6

# Half-record sub-bounds (round 4): each record's triangle rows split in
# two sublane-aligned halves (mid = (rows // 16) * 8) whose AABBs ride
# the record's FREE feature lanes — row h (h = 0, 1) carries half h's
# lo(28:31) / hi(31:34) / valid(34). The pair test block-gates each half
# behind one scalar cond (pair_test_nearest/anyhit use_halves), skipping
# half the pair math when a half's box is beyond every lane's bound.
# Zero extra DMA: the bounds arrive inside the record itself.
_C_HLO, _C_HHI, _C_HVALID = 28, 31, 34


def _half_mid(rows: int) -> int:
    """Sublane-aligned split row of a half-gated record."""
    return (rows // 16) * 8


def _write_half_bounds(rec, v0, v1, v2, live):
    """Write per-half AABBs into rec[:, 0:2, 28:35] from [C, L, 3]
    vertex arrays + [C, L] liveness. No-op for records too short to
    split."""
    l = v0.shape[1]
    mid = _half_mid(l)
    if mid < 8 or l - mid < 8:
        return
    for h, sl in enumerate((slice(0, mid), slice(mid, l))):
        lv = live[:, sl]
        any_v = lv.any(axis=1)
        pts = np.stack(
            [v0[:, sl], v1[:, sl], v2[:, sl]], axis=2
        )  # [C, Lh, 3verts, 3]
        lo = np.where(lv[..., None, None], pts, np.inf).min(axis=(1, 2))
        hi = np.where(lv[..., None, None], pts, -np.inf).max(axis=(1, 2))
        rec[:, h, _C_HLO:_C_HLO + 3] = np.where(any_v[:, None], lo, 0.0)
        rec[:, h, _C_HHI:_C_HHI + 3] = np.where(any_v[:, None], hi, 0.0)
        rec[:, h, _C_HVALID] = any_v.astype(np.float32)


def pack_pair_record_np(v0, v1, v2, cull, prim, n0, n1, n2, mat,
                        rows=None):
    """Pack one pairwise MT record [rows, PAIR_COLS] from [L<=rows, ...]
    triangle arrays; rows defaults to L padded to a sublane tile (8) —
    pair-test cost scales with the record height, so keep it minimal.
    Padding slots carry N = 0 (det = 0 => auto-miss) and prim = -1."""
    v0 = np.asarray(v0, np.float32)
    l = v0.shape[0]
    if rows is None:
        rows = max(8, -(-l // 8) * 8)
    if l > rows:
        raise ValueError(f"{l} triangles > record capacity {rows}")
    prim = np.asarray(prim, np.float32)
    e1 = np.asarray(v1, np.float32) - v0
    e2 = np.asarray(v2, np.float32) - v0
    n = np.cross(e1, e2)
    live = prim >= 0
    n = np.where(live[..., None], n, 0.0)

    rec = np.zeros((rows, PAIR_COLS), np.float32)
    rec[:, _C_PRIM] = -1.0
    rec[:l, 0:3] = -n
    rec[:l, 3:6] = e2
    rec[:l, 6:9] = np.cross(v0, e2)
    rec[:l, 9:12] = -e1
    rec[:l, 12:15] = -np.cross(v0, e1)
    rec[:l, 15] = (v0 * n).sum(-1)
    rec[:l, _C_CULL] = np.asarray(cull, np.float32)
    rec[:l, _C_PRIM] = prim
    rec[:l, _C_MAT] = np.asarray(mat, np.float32)
    rec[:l, _C_N0:_C_N0 + 3] = np.asarray(n0, np.float32)
    rec[:l, _C_N0 + 3:_C_N0 + 6] = np.asarray(n1, np.float32)
    rec[:l, _C_N0 + 6:_C_N0 + 9] = np.asarray(n2, np.float32)
    return rec


def pack_kernel_tables_np(cl_v0, cl_v1, cl_v2, cl_cull, cl_prim,
                          cl_n0, cl_n1, cl_n2, cl_mat, c_lo, c_hi):
    """Pack the traversal tiers from [C, L<=128, ...] cluster arrays.

    Returns (pair_records [Cp, 128, 128], cl_bounds [S, 32, 128],
    sup_pages [Hp, GROUP2, 128], hyp_bounds [Hp8, 128]) with
    Cp = S * GROUP, Hp = ceil(S / GROUP2) supercluster pages, and Hp8 = Hp
    rounded up to a sublane tile. Bounds rows carry lanes lo3/hi3/valid;
    padding clusters/superclusters/hypers carry valid = 0 so they are
    never entered. The hyper tier bounds GROUP2-supercluster pages: the
    scan tests hypers first and pair-slabs only the descended pages, so
    the fixed per-query vector work is ~Hp instead of ~S boxes."""
    v0 = np.asarray(cl_v0, np.float32)
    c, l, _ = v0.shape
    if l > REC_LANES:
        raise ValueError(f"cluster_size {l} > {REC_LANES}")
    if l % 8:
        raise ValueError(f"cluster_size {l} must be a sublane multiple (8)")
    prim = np.asarray(cl_prim, np.float32)
    if prim.max(initial=0) >= 2 ** 24:
        raise ValueError("kernel traversal carries prim ids as f32 (< 2^24)")
    s = -(-c // GROUP)
    cp = s * GROUP

    rec = np.zeros((cp, l, PAIR_COLS), np.float32)
    # Only the padding records [c:cp] need the explicit miss marker; the
    # batch pack below writes every lane of the real records (a full-table
    # strided init here costs ~10 s at the 7.2M-triangle scale).
    rec[c:, :, _C_PRIM] = -1.0
    _pack_pair_records_batch(
        v0, np.asarray(cl_v1, np.float32), np.asarray(cl_v2, np.float32),
        np.asarray(cl_cull, np.float32), prim,
        np.asarray(cl_n0, np.float32), np.asarray(cl_n1, np.float32),
        np.asarray(cl_n2, np.float32), np.asarray(cl_mat, np.float32),
        out=rec[:c],
    )

    lo = np.asarray(c_lo, np.float32)
    hi = np.asarray(c_hi, np.float32)
    valid = np.zeros(cp, np.float32)
    valid[:c] = 1.0
    lo_p = np.full((cp, 3), np.inf, np.float32)
    hi_p = np.full((cp, 3), -np.inf, np.float32)
    lo_p[:c] = lo
    hi_p[:c] = hi

    clb = np.zeros((s, GROUP, 128), np.float32)
    lo_g = lo_p.reshape(s, GROUP, 3)
    hi_g = hi_p.reshape(s, GROUP, 3)
    clb[:, :, _B_LO:_B_LO + 3] = lo_g
    clb[:, :, _B_HI:_B_HI + 3] = hi_g
    clb[:, :, _B_VALID] = valid.reshape(s, GROUP)

    sup_pages, hyp = tiers_from_cluster_bounds(clb)
    return rec, clb, sup_pages, hyp


def _reduce_bounds_rows(lo, hi, vmask):
    """[N, G, ...] -> [N, 128] bounds rows (lo3/hi3/valid) reducing the
    group axis over valid members; empty groups carry valid = 0."""
    n = lo.shape[0]
    any_v = vmask.any(axis=1)
    out = np.zeros((n, 128), np.float32)
    out[:, _B_LO:_B_LO + 3] = np.where(
        any_v[:, None], np.where(vmask[..., None], lo, np.inf).min(axis=1),
        0.0,
    )
    out[:, _B_HI:_B_HI + 3] = np.where(
        any_v[:, None], np.where(vmask[..., None], hi, -np.inf).max(axis=1),
        0.0,
    )
    out[:, _B_VALID] = any_v.astype(np.float32)
    return out


def tiers_from_cluster_bounds(clb):
    """Rebuild the supercluster pages + hyper bounds from a cluster-bounds
    table [S, GROUP, 128] (lanes lo3/hi3/valid). Used at pack time and by
    geometry-parallel sharding (parallel/geometry.py), where each shard's
    upper tiers must bound only ITS supercluster slice."""
    clb = np.asarray(clb, np.float32)
    s = clb.shape[0]
    sup_s = _reduce_bounds_rows(
        clb[:, :, _B_LO:_B_LO + 3], clb[:, :, _B_HI:_B_HI + 3],
        clb[:, :, _B_VALID] > 0.5,
    )
    hp = -(-s // GROUP2)
    sp = hp * GROUP2
    sup = np.zeros((sp, 128), np.float32)
    sup[:s] = sup_s
    sup_pages = sup.reshape(hp, GROUP2, 128)

    hp8 = -(-hp // 8) * 8
    hyp = np.zeros((hp8, 128), np.float32)
    hyp[:hp] = _reduce_bounds_rows(
        sup.reshape(hp, GROUP2, 128)[:, :, _B_LO:_B_LO + 3],
        sup.reshape(hp, GROUP2, 128)[:, :, _B_HI:_B_HI + 3],
        sup.reshape(hp, GROUP2, 128)[:, :, _B_VALID] > 0.5,
    )
    return sup_pages, hyp


def _pack_pair_records_batch(v0, v1, v2, cull, prim, n0, n1, n2, mat,
                             out=None):
    """Vectorized pack_pair_record_np over a [C, L, ...] cluster batch.

    `out` ([C, L, PAIR_COLS] f32, zeroed) lets the caller pack straight
    into a preallocated table — at dragon scale the record tensor is
    ~0.5 GB, so skipping the extra alloc+copy matters.

    The 28 feature columns are assembled in a CONTIGUOUS [C, L, 28]
    staging block and written into the 128-lane table in ONE strided
    pass: column-at-a-time writes re-touch every 512-byte table row per
    column (~14 full-table traffic passes — measured 44 s of the 7.2M
    build), while the single block write pays one.

    When the native library is available AND `out` is a zeroed
    contiguous table, the threaded C++ packer
    (native.pack_pair_records_native) does the whole job in one
    streaming pass — ~10x over even the staged numpy path at the
    7.2M-triangle scale."""
    c, l, _ = v0.shape
    if out is not None and out.flags.c_contiguous and out.dtype == np.float32:
        from ..native import pack_pair_records_native

        if pack_pair_records_native(v0, v1, v2, cull, prim, mat,
                                    n0, n1, n2, out):
            return out
    e1 = v1 - v0
    e2 = v2 - v0
    n = np.cross(e1, e2)
    live = prim >= 0
    n = np.where(live[..., None], n, 0.0)
    blk = np.empty((c, l, 28), np.float32)
    blk[..., 0:3] = -n
    blk[..., 3:6] = e2
    blk[..., 6:9] = np.cross(v0, e2)
    blk[..., 9:12] = -e1
    blk[..., 12:15] = -np.cross(v0, e1)
    blk[..., 15] = (v0 * n).sum(-1)
    blk[..., _C_CULL] = cull
    blk[..., _C_PRIM] = prim
    blk[..., _C_MAT] = mat
    blk[..., _C_N0:_C_N0 + 3] = n0
    blk[..., _C_N0 + 3:_C_N0 + 6] = n1
    blk[..., _C_N0 + 6:_C_N0 + 9] = n2
    rec = np.zeros((c, l, PAIR_COLS), np.float32) if out is None else out
    rec[:, :, :28] = blk
    _write_half_bounds(rec, v0, v1, v2, live)
    return rec


def _inv_dir(d):
    """Reference slab-test inverse: zero components use FLT_MAX
    (ref: src/scene/bounding_box.cpp:44-49)."""
    nz = jnp.abs(d) > 0.0
    return jnp.where(nz, 1.0 / jnp.where(nz, d, 1.0), _FLT_MAX)


def _moment(ox, oy, oz, dx, dy, dz):
    """Plucker moment m = o x d, per lane."""
    return (oy * dz - oz * dy, oz * dx - ox * dz, ox * dy - oy * dx)


def pair_slab_entries(bnd, rows_n, ox, oy, oz, ix, iy, iz):
    """Pairwise slab entries for all (box, ray) pairs.

    bnd: [B, 128] bounds table ref/array (lanes lo3/hi3/valid).
    Returns entry' [B, rows_n, 128] f32 — the clamped slab entry where the
    ray hits a VALID box, +inf otherwise (ref slab semantics:
    src/scene/bounding_box.cpp:38-73)."""
    lox = bnd[:, _B_LO:_B_LO + 1]
    loy = bnd[:, _B_LO + 1:_B_LO + 2]
    loz = bnd[:, _B_LO + 2:_B_LO + 3]
    hix = bnd[:, _B_HI:_B_HI + 1]
    hiy = bnd[:, _B_HI + 1:_B_HI + 2]
    hiz = bnd[:, _B_HI + 2:_B_HI + 3]
    invalid = bnd[:, _B_VALID:_B_VALID + 1] < 0.5  # [B, 1]

    outs = []
    for j in range(rows_n):
        oxj, oyj, ozj = ox[j:j + 1, :], oy[j:j + 1, :], oz[j:j + 1, :]
        ixj, iyj, izj = ix[j:j + 1, :], iy[j:j + 1, :], iz[j:j + 1, :]
        t1x, t2x = (lox - oxj) * ixj, (hix - oxj) * ixj
        t1y, t2y = (loy - oyj) * iyj, (hiy - oyj) * iyj
        t1z, t2z = (loz - ozj) * izj, (hiz - ozj) * izj
        tmin = jnp.maximum(
            jnp.maximum(jnp.minimum(t1x, t2x), jnp.minimum(t1y, t2y)),
            jnp.minimum(t1z, t2z),
        )
        tmax = jnp.minimum(
            jnp.minimum(jnp.maximum(t1x, t2x), jnp.maximum(t1y, t2y)),
            jnp.maximum(t1z, t2z),
        )
        miss = invalid | (tmax < 0.0) | (tmin > tmax)
        outs.append(jnp.where(miss, _INF, jnp.maximum(tmin, 0.0)))
    return jnp.stack(outs, axis=1)  # [B, rows_n, 128]


def _root_gate(sup_v, ox, oy, oz, ix, iy, iz, bound):
    """Scalar pregate: does ANY lane enter the union AABB of the valid
    superclusters closer than its pruning bound (`bound` [rows,128],
    0 = inactive lane)? One slab test (~30 vector ops) decides whether the
    whole tier scan runs — on box-dominated workloads most bounce blocks
    and nearly all shadow blocks never approach the cluster set, and the
    sup-tier pair-slab pass ([Sp, rows, 128]) is their dominant cost."""
    valid = sup_v[:, _B_VALID:_B_VALID + 1] > 0.5  # [Sp, 1]
    lo = [
        jnp.min(jnp.where(valid, sup_v[:, _B_LO + a:_B_LO + a + 1], _INF))
        for a in range(3)
    ]
    hi = [
        jnp.max(jnp.where(valid, sup_v[:, _B_HI + a:_B_HI + a + 1], -_INF))
        for a in range(3)
    ]
    t1x, t2x = (lo[0] - ox) * ix, (hi[0] - ox) * ix
    t1y, t2y = (lo[1] - oy) * iy, (hi[1] - oy) * iy
    t1z, t2z = (lo[2] - oz) * iz, (hi[2] - oz) * iz
    tmin = jnp.maximum(
        jnp.maximum(jnp.minimum(t1x, t2x), jnp.minimum(t1y, t2y)),
        jnp.minimum(t1z, t2z),
    )
    tmax = jnp.minimum(
        jnp.minimum(jnp.maximum(t1x, t2x), jnp.maximum(t1y, t2y)),
        jnp.maximum(t1z, t2z),
    )
    enter = (
        (tmax >= 0.0) & (tmin <= tmax) & (jnp.maximum(tmin, 0.0) < bound)
    )
    return jnp.max(jnp.where(enter, 1.0, 0.0)) > 0.5


def _pair_quantities(cols, ojx, ojy, ojz, djx, djy, djz, mjx, mjy, mjz,
                     cull_mode=-1):
    """Sign-normalized MT quantities for one ray row vs a resident record:
    `cols` = the first 17 feature columns as [T, 1] arrays. Returns
    (sd, su, sv, st, ok) as [T tris, 128 rays] f32/bool with ok =
    geometric hit with t >= 0 (no t-upper-bound applied).

    `cull_mode` (static): -1 = per-triangle cull column, 0 = no triangle
    in the record culls, 1 = every triangle culls. The uniform modes drop
    the per-pair cull-column compare/or from the hot loop (~8% of the
    record test on the dragon bench)."""
    c = cols
    det = c[0] * djx + c[1] * djy + c[2] * djz
    un = (c[3] * mjx + c[4] * mjy + c[5] * mjz
          + c[6] * djx + c[7] * djy + c[8] * djz)
    vn = (c[9] * mjx + c[10] * mjy + c[11] * mjz
          + c[12] * djx + c[13] * djy + c[14] * djz)
    tn = -(c[0] * ojx + c[1] * ojy + c[2] * ojz) - c[15]
    sgn = jnp.where(det >= 0.0, 1.0, -1.0)
    sd = det * sgn
    su = un * sgn
    sv = vn * sgn
    st = tn * sgn
    # st >= 0 folded into the inside-min: one min replaces a cmp + and.
    inside = jnp.minimum(
        jnp.minimum(jnp.minimum(su, sv), sd - su - sv), st
    )
    if cull_mode == 0:
        ok = (inside >= 0.0) & (sd > _TRI_EPS)
    elif cull_mode == 1:
        # Culling tris require det > 0; with sd = |det| > eps that is
        # det > eps exactly.
        ok = (inside >= 0.0) & (det > _TRI_EPS)
    else:
        cull_ok = (c[_C_CULL] < 0.5) | (det > 0.0)
        ok = (inside >= 0.0) & (sd > _TRI_EPS) & cull_ok
    return sd, su, sv, st, ok


def _half_need(cols_b, h, ox, oy, oz, dx, dy, dz, bound):
    """Scalar gate for half `h` of a record: does ANY lane's slab entry
    into the half's AABB (cols_b = feature columns 28..34, [T,1] each;
    row h carries half h's bounds) fall below its pruning bound?"""
    lo = [cols_b[a][h, 0] for a in range(3)]
    hi = [cols_b[3 + a][h, 0] for a in range(3)]
    valid = cols_b[6][h, 0] > 0.5
    ix, iy, iz = _inv_dir(dx), _inv_dir(dy), _inv_dir(dz)
    t1x, t2x = (lo[0] - ox) * ix, (hi[0] - ox) * ix
    t1y, t2y = (lo[1] - oy) * iy, (hi[1] - oy) * iy
    t1z, t2z = (lo[2] - oz) * iz, (hi[2] - oz) * iz
    tmin = jnp.maximum(
        jnp.maximum(jnp.minimum(t1x, t2x), jnp.minimum(t1y, t2y)),
        jnp.minimum(t1z, t2z),
    )
    tmax = jnp.minimum(
        jnp.minimum(jnp.maximum(t1x, t2x), jnp.maximum(t1y, t2y)),
        jnp.maximum(t1z, t2z),
    )
    enter = (tmax >= 0.0) & (tmin <= tmax) & (jnp.maximum(tmin, 0.0) < bound)
    return valid & (jnp.max(jnp.where(enter, 1.0, 0.0)) > 0.5)


def pair_test_nearest(col, ox, oy, oz, dx, dy, dz, mx, my, mz,
                      state, *, want_normal_mat, enter_f=None,
                      use_conds=True, cull_mode=-1, use_halves=False):
    """Nearest-hit pair test of one resident record against the whole
    (rows, 128) ray block. `col(i)` yields record feature column i as
    [T, 1]. state = (best_t, best_p, nx, ny, nz, mid) as (rows, 128)
    arrays; returns the updated tuple. `enter_f` ((rows,128) f32 or None)
    gates each ray row on having any lane that entered the cluster.

    `use_conds=False` drops every per-row `lax.cond` in favor of
    unconditional masked selects — the right call for records that are
    (almost) always live: a Mosaic cond region costs more than the ~30
    vector ops it would skip once the surrounding live state is large.

    `use_halves=True` additionally block-gates each sublane-aligned HALF
    of the record behind one scalar cond against the per-half AABB packed
    in feature lanes 28:35 (see _write_half_bounds) — half the pair math
    skips whenever a half's box is beyond every lane's current bound.
    Exact: skipped halves cannot contain a winning triangle."""
    rows = ox.shape[0]
    cols = [col(i) for i in range(17)]
    tri_rows = cols[0].shape[0]

    def run_range(a, b, state):
        cols_r = [c[a:b] for c in cols]
        n_r = b - a
        tri_iota = jax.lax.broadcasted_iota(
            jnp.int32, (n_r, ox.shape[1]), 0
        ).astype(jnp.float32)

        def row_test(j, row_state):
            def run(row_state):
                btj = row_state[0]
                sd, su, sv, st, ok = _pair_quantities(
                    cols_r,
                    ox[j:j + 1, :], oy[j:j + 1, :], oz[j:j + 1, :],
                    dx[j:j + 1, :], dy[j:j + 1, :], dz[j:j + 1, :],
                    mx[j:j + 1, :], my[j:j + 1, :], mz[j:j + 1, :],
                    cull_mode=cull_mode,
                )
                # (Measured: an approx-reciprocal t here saves nothing —
                # the [T, R] divide is not a bottleneck on v5e.)
                tv = st / jnp.where(ok, sd, 1.0)
                okf = ok & (tv < btj)
                key = jnp.where(okf, tv, _INF)
                tmin = jnp.min(key, axis=0, keepdims=True)      # [1, R]
                improved = tmin < btj

                def extract(row_state):
                    btj, bpj, nxj, nyj, nzj, midj = row_state
                    # Unique winner: lowest triangle slot among exact-t
                    # ties (matches a serial scan's
                    # first-strict-improvement; halves run low-to-high
                    # rows and later halves need a STRICT improvement, so
                    # cross-half exact ties keep the lower slot too).
                    oh0 = key == tmin
                    tsel = jnp.min(
                        jnp.where(oh0, tri_iota, jnp.float32(n_r)),
                        axis=0, keepdims=True,
                    )
                    ohf = jnp.where(oh0 & (tri_iota == tsel), 1.0, 0.0)

                    def pick(c):
                        return jnp.sum(ohf * c[a:b], axis=0, keepdims=True)

                    prim_w = pick(col(_C_PRIM))
                    bpj = jnp.where(improved, prim_w.astype(jnp.int32), bpj)
                    if want_normal_mat:
                        sdw = jnp.maximum(
                            jnp.sum(ohf * sd, axis=0, keepdims=True), 1e-30
                        )
                        uw = jnp.sum(ohf * su, axis=0, keepdims=True) / sdw
                        vw = jnp.sum(ohf * sv, axis=0, keepdims=True) / sdw
                        w0 = 1.0 - uw - vw
                        snx = (w0 * pick(col(_C_N0))
                               + uw * pick(col(_C_N0 + 3))
                               + vw * pick(col(_C_N0 + 6)))
                        sny = (w0 * pick(col(_C_N0 + 1))
                               + uw * pick(col(_C_N0 + 4))
                               + vw * pick(col(_C_N0 + 7)))
                        snz = (w0 * pick(col(_C_N0 + 2))
                               + uw * pick(col(_C_N0 + 5))
                               + vw * pick(col(_C_N0 + 8)))
                        inv = jax.lax.rsqrt(
                            snx * snx + sny * sny + snz * snz + 1e-30
                        )
                        nxj = jnp.where(improved, snx * inv, nxj)
                        nyj = jnp.where(improved, sny * inv, nyj)
                        nzj = jnp.where(improved, snz * inv, nzj)
                        mat_w = pick(col(_C_MAT))
                        midj = jnp.where(
                            improved, mat_w.astype(jnp.int32), midj
                        )
                    btj = jnp.minimum(btj, tmin)
                    return btj, bpj, nxj, nyj, nzj, midj

                if not use_conds:
                    # `extract` masks every update on `improved`, so
                    # running it unconditionally is exact.
                    return extract(row_state)
                return jax.lax.cond(
                    jnp.max(jnp.where(improved, 1.0, 0.0)) > 0.5,
                    extract, lambda c: c, row_state,
                )

            if enter_f is None or not use_conds:
                return run(row_state)
            need_row = jnp.max(enter_f[j:j + 1, :]) > 0.5
            return jax.lax.cond(need_row, run, lambda c: c, row_state)

        out_rows = []
        for j in range(rows):
            row_state = tuple(x[j:j + 1, :] for x in state)
            out_rows.append(row_test(j, row_state))
        return tuple(
            jnp.concatenate([r[i] for r in out_rows], axis=0)
            for i in range(6)
        )

    mid = _half_mid(tri_rows)
    if not (use_halves and mid >= 8 and tri_rows - mid >= 8):
        return run_range(0, tri_rows, state)
    cols_b = [col(_C_HLO + i) for i in range(7)]
    for h, (a, b) in enumerate(((0, mid), (mid, tri_rows))):
        need = _half_need(cols_b, h, ox, oy, oz, dx, dy, dz, state[0])
        state = jax.lax.cond(
            need, lambda s, a=a, b=b: run_range(a, b, s),
            lambda s: s, state,
        )
    return state


def pair_test_anyhit(col, ox, oy, oz, dx, dy, dz, mx, my, mz,
                     t_lim, occ_f, *, enter_f=None, use_conds=True,
                     cull_mode=-1, use_halves=False):
    """Any-hit pair test of one resident record: returns the updated
    (rows, 128) occlusion mask (f32). The t division is avoided entirely:
    t < t_lim iff st < t_lim * sd (sd > 0 post-normalization).
    `use_conds=False` / `use_halves`: see pair_test_nearest."""
    rows = ox.shape[0]
    cols = [col(i) for i in range(17)]
    tri_rows = cols[0].shape[0]

    def run_range(a, b, occ_f):
        cols_r = [c[a:b] for c in cols]

        def row_test(j, occ_row_j):
            def run(occ_row_j):
                tlj = t_lim[j:j + 1, :]
                sd, su, sv, st, ok = _pair_quantities(
                    cols_r,
                    ox[j:j + 1, :], oy[j:j + 1, :], oz[j:j + 1, :],
                    dx[j:j + 1, :], dy[j:j + 1, :], dz[j:j + 1, :],
                    mx[j:j + 1, :], my[j:j + 1, :], mz[j:j + 1, :],
                    cull_mode=cull_mode,
                )
                hit = ok & (st < tlj * sd)
                occ_row = jnp.max(
                    jnp.where(hit, 1.0, 0.0), axis=0, keepdims=True
                )
                return jnp.maximum(occ_row_j, occ_row)

            if enter_f is None or not use_conds:
                return run(occ_row_j)
            need_row = jnp.max(enter_f[j:j + 1, :]) > 0.5
            return jax.lax.cond(need_row, run, lambda o: o, occ_row_j)

        return jnp.concatenate(
            [row_test(j, occ_f[j:j + 1, :]) for j in range(rows)], axis=0
        )

    mid = _half_mid(tri_rows)
    if not (use_halves and mid >= 8 and tri_rows - mid >= 8):
        return run_range(0, tri_rows, occ_f)
    cols_b = [col(_C_HLO + i) for i in range(7)]
    for h, (a, b) in enumerate(((0, mid), (mid, tri_rows))):
        # Resolved lanes carry bound 0; a fully-occluded block skips both.
        bound = jnp.where(occ_f > 0.5, 0.0, t_lim)
        need = _half_need(cols_b, h, ox, oy, oz, dx, dy, dz, bound)
        occ_f = jax.lax.cond(
            need, lambda o, a=a, b=b: run_range(a, b, o),
            lambda o: o, occ_f,
        )
    return occ_f


# Bits packed per scalar mask: sums of DISTINCT powers of two up to 2^22
# total at most 2^23 - 1, every value of which is exact in f32 — so the
# pack can ride a plain f32 masked-sum reduce (Mosaic's only reliable
# vector->scalar path) and convert to i32 losslessly.
_MASK_BITS = 23


def _bit_weights(n, idx_iota):
    """[n, 1] i32 weights 2^(idx % _MASK_BITS), built from static selects
    (no vector shifts / exp2 — keeps Mosaic lowering trivial)."""
    b = idx_iota % _MASK_BITS
    w = jnp.zeros_like(idx_iota)
    for k in range(_MASK_BITS):
        w = jnp.where(b == k, jnp.int32(1 << k), w)
    return w


def _ctz(low):
    """Index of the (single) set bit of a scalar i32 via a shift ladder."""
    g = jnp.int32(0)
    for s in (16, 8, 4, 2, 1):
        big = low >= jnp.int32(1 << s)
        g = g + jnp.where(big, jnp.int32(s), 0)
        low = jnp.where(big, low >> s, low)
    return g


def _pack_masks(flag_col, weights_col, idx_iota, n, n_masks):
    """Pack an [n, 1] f32 flag column (>0.5 = set) into n_masks scalar i32
    bitmasks of _MASK_BITS bits each. The per-mask masked sum is exact in
    f32 (distinct powers of two, total < 2^23)."""
    masks = []
    for m in range(n_masks):
        in_m = (idx_iota >= m * _MASK_BITS) & (idx_iota < (m + 1) * _MASK_BITS)
        contrib = jnp.where(
            in_m & (flag_col > 0.5), weights_col.astype(jnp.float32), 0.0
        )
        masks.append(jnp.sum(contrib).astype(jnp.int32))
    return masks


# Front-to-back buckets for the supercluster scan: groups are processed in
# ascending order of their block-min slab entry, so near geometry resolves
# first and the per-descend bound recheck prunes far groups. Linear split
# of the [min, max] entry range — cheap and good enough for pruning.
# Clamped to 8: the MASK_SLOTS scratch layout budgets for at most 8 buckets
# (see the arithmetic above MASK_SLOTS), and >4 measured worse anyway.
_N_BUCKETS = min(8, max(1, int(os.environ.get("PTX_KRN_BUCKETS", "4"))))  # 1 = off
# Shadow (any-hit) scans walk entry-ordered buckets BACK-to-front when
# set — the "emitter-apex" ordering (occluders near the light first)
# instead of the default near-the-origin-first. A/B knob; measured on the
# 7.2M bench the default front-to-back wins (the dragon occludes its own
# shadow rays near the ORIGIN), see docs/DESIGN_large_scenes.md.
_SHADOW_REVERSE = os.environ.get("PTX_SHADOW_REVERSE", "0") == "1"

# Record-DMA ring depth: Q-1 fetches in flight while the oldest pending
# record is pair-tested (~2 us each), hiding HBM latency across descend
# boundaries where a 2-slot pipeline stalls on every first record.
REC_QUEUE = max(2, int(os.environ.get("PTX_REC_QUEUE", "4")))

# Cluster-bounds pages ([S, 32, 128] f32 = S * 16 KB) are kept whole in
# VMEM below this budget (dragon bench: S = 97 -> 1.55 MB; the 7.2M
# 128-tri build: S = 2049 -> 33.6 MB), eliminating a synchronous 16 KB
# DMA stall per supercluster descend. Default 40 MB covers the full-scale
# benchmark (measured +4.4% on the 7.2M frame, round 4; the per-kernel
# vmem_limit_bytes bump in the callers keeps Mosaic happy). Meshes whose
# table exceeds the budget keep the DMA path.
_CLB_VMEM_BYTES = int(
    float(os.environ.get("PTX_KRN_CLB_VMEM_MB", "40")) * (1 << 20)
)


def clb_fits_vmem(clb) -> bool:
    """Residency policy for the cluster-bounds table (see _CLB_VMEM_BYTES)."""
    return int(np.prod(clb.shape)) * 4 <= _CLB_VMEM_BYTES


def clb_compiler_params(clb, clb_resident: bool):
    """Per-kernel Mosaic VMEM-limit bump for a resident cluster-bounds
    table: a 33.6 MB table (7.2M tris) exceeds the default scoped-VMEM
    budget; raise the per-kernel limit (v5e VMEM is 128 MiB) instead of
    globally via XLA flags. Returns None when no bump is needed."""
    if not clb_resident:
        return None
    need = int(np.prod(clb.shape)) * 4
    if need <= 8 * (1 << 20):
        return None
    return pltpu.CompilerParams(
        vmem_limit_bytes=min(need + (1 << 25), 112 * (1 << 20))
    )
# SMEM scratch slots for packed masks. The layout (asserted in
# _scan_pipelined) is n_buckets * ceil(hp8/23) hyper masks + n_sb
# supercluster-bucket masks + ceil(GROUP/23) cluster masks; at the caps
# (_MAX_SUP=4096 -> hp8=256, buckets 8, n_sb 8) that is 8*12 + 8 + 2 = 106.
MASK_SLOTS = 128


def _scan_pipelined(sup_pg, hyp_v, clb_hbm, rec_hbm, scr_c, scr2, scr_eh,
                    scr_es, scr_ec, scr_m, scr_ef, sem_c, sem2,
                    ox, oy, oz, dx, dy, dz, ix, iy, iz,
                    bound_fn, process_fn, carry0, n_super, run_gate,
                    visit_ref, visit_base, clb_resident=False,
                    reverse_buckets=False):
    """Three-tier cluster scan: vectorized enter flags, SCALAR bitmask
    stepping, and DOUBLE-BUFFERED record DMA.

    The naive scan pays a vector->scalar reduce + cond per tier step
    (~0.25 us on v5e) whether or not the step descends — measured ~8 us
    per descended group (32 cluster steps) and ~12 us per supercluster
    scan, dominating dragon frames. Here every per-step decision is
    precomputed VECTORIZED: slab entries for all (box, ray) pairs land in
    VMEM scratch per tier, one compare + axis-reduce yields per-box enter
    flags, and the flags are packed into scalar i32 bitmasks (exact f32
    masked sums — see _MASK_BITS). The scan then runs a scalar while-loop
    per mask that visits ONLY set bits: ~0.05 us per skipped box instead
    of ~0.25, and zero vector work for boxes nobody enters.

    The tiers: HYPER bounds ([Hp8, 128], Hp = ceil(S / GROUP2) pages) are
    pair-slabbed for every query — the only fixed vector cost, ~Hp boxes.
    A descended hyper pair-slabs its GROUP2-supercluster page ([G2, rows,
    128]); a descended supercluster DMAs + pair-slabs its GROUP-cluster
    bounds page; entered clusters schedule their pair records. Before the
    hyper tier existed the per-query fixed cost was the FULL supercluster
    scan ([S, rows, 128] — ~2300 vector instructions at S = 128, rows = 8,
    twice per bounce), which profiling implicated as the dragon frame's
    "estimator floor".

    Pruning semantics: hyper flags are computed against the INITIAL bound
    (conservative superset); each hyper/supercluster descend re-checks its
    box against the CURRENT bound and computes the next tier's flags with
    it, so cross-box best_t tightening prunes at every tier. Per-record
    `enter` masks are captured at schedule time — conservative under later
    tightening (bounds only shrink; stale rows do harmless extra work).

    The record fetch of cluster k overlaps the pair test of cluster k-1:
    scheduling a needed record starts its DMA into scr2[par], then drains
    (waits + processes) the previously scheduled record from scr2[1-par].

    bound_fn(carry) -> (rows,128) per-lane pruning bound (0 = inactive).
    process_fn(slot, enter_f, carry) -> carry: pair-test the record
    resident in scr2[slot].
    """
    shp = ox.shape
    rows = shp[0]
    hp = sup_pg.shape[0]          # hyper pages
    hp8 = hyp_v.shape[0]          # padded hyper rows
    n_hyp_masks = -(-hp8 // _MASK_BITS)
    n_cl_masks = -(-GROUP // _MASK_BITS)
    n_buckets = _N_BUCKETS if hp > 2 else 1
    # Front-to-back buckets WITHIN a descended hyper page too: a page
    # spans GROUP2 * GROUP clusters (~8k tris at 16-tri records), and
    # walking its superclusters in index order discovers near hits late.
    # 4 entry-ordered buckets cost 3 extra mask packs per page descend
    # and let an early hit prune the rest of the page.
    n_sb = _N_BUCKETS if n_super > 2 * GROUP2 else 1
    sup_slot = n_buckets * n_hyp_masks
    cl_off = sup_slot + n_sb
    assert GROUP2 <= _MASK_BITS  # one supercluster mask per page
    assert cl_off + n_cl_masks <= MASK_SLOTS

    q = scr2.shape[0]  # record-DMA queue depth

    def sched(idx, enter_f, st):
        """Ring-buffered record pipeline: start the fetch for this record
        into slot `head`, then (only once Q-1 fetches are in flight) drain
        and pair-test the OLDEST pending record. Record k's DMA thus has
        Q-2 full record tests (~2-5 us) to land before its wait — enough
        to hide HBM latency across descend boundaries, where the 2-slot
        pipeline stalled on every first record of a cluster page. Enter
        flags for pending records are staged per-slot in `scr_ef` (they
        are captured at schedule time; staleness under later bound
        tightening is conservative — rows only do harmless extra work)."""
        carry, count, head = st
        if visit_ref is not None:
            visit_ref[visit_base + 1] = visit_ref[visit_base + 1] + 1
        pltpu.make_async_copy(
            rec_hbm.at[idx], scr2.at[head], sem2.at[head]
        ).start()
        scr_ef[head, :rows] = enter_f

        def drain(carry):
            tail = jax.lax.rem(head + jnp.int32(1), jnp.int32(q))
            pltpu.make_async_copy(
                rec_hbm.at[0], scr2.at[tail], sem2.at[tail]
            ).wait()
            return process_fn(tail, scr_ef[tail, :rows], carry)

        carry = jax.lax.cond(count >= q - 1, drain, lambda c: c, carry)
        return (
            carry,
            jnp.minimum(count + 1, jnp.int32(q - 1)),
            jax.lax.rem(head + jnp.int32(1), jnp.int32(q)),
        )

    def scan(carry0):
        # Pair entries are staged through VMEM scratch so per-box slices
        # are ref loads (Mosaic has no dynamic_slice on values). The
        # scratch may be taller than this query (shared between the
        # nearest and the merged-shadow row counts) — slice to `rows`.
        scr_eh[:, :rows] = pair_slab_entries(
            hyp_v, rows, ox, oy, oz, ix, iy, iz
        )  # [Hp8, rows, 128]
        bound0 = bound_fn(carry0)

        hyp_iota = jax.lax.broadcasted_iota(jnp.int32, (hp8, 1), 0)
        hyp_w = _bit_weights(hp8, hyp_iota)
        # Per-hyper any-lane-enters flag: reduce rows then lanes.
        ent_b = scr_eh[:, :rows] < bound0[None]
        ent_h = jnp.where(ent_b, 1.0, 0.0)
        flag_h = jnp.max(jnp.max(ent_h, axis=1), axis=1, keepdims=True)  # [Hp8,1]
        if n_buckets > 1:
            # Bucket hypers front-to-back by block-min entry.
            emin = jnp.min(
                jnp.min(jnp.where(ent_b, scr_eh[:, :rows], _INF), axis=1),
                axis=1, keepdims=True,
            )  # [Hp8, 1]
            on = flag_h > 0.5
            m0 = jnp.min(jnp.where(on, emin, _INF))
            m1 = jnp.max(jnp.where(on, emin, -_INF))
            span = jnp.maximum(m1 - m0, 1e-20)
            bidx = jnp.floor(jnp.clip(
                (emin - m0) / span * n_buckets, 0.0, n_buckets - 1.0
            ))
            if reverse_buckets:
                bidx = (n_buckets - 1.0) - bidx
        # All packed masks land in SMEM so ONE flattened loop nest (a
        # single textual copy of descend/sched) walks them in order.
        for b in range(n_buckets):
            fb = flag_h
            if n_buckets > 1:
                fb = jnp.where(bidx == b, flag_h, 0.0)
            masks = _pack_masks(fb, hyp_w, hyp_iota, hp8, n_hyp_masks)
            for hm in range(n_hyp_masks):
                scr_m[b * n_hyp_masks + hm] = masks[hm]

        sup_iota = jax.lax.broadcasted_iota(jnp.int32, (GROUP2, 1), 0)
        sup_w = _bit_weights(GROUP2, sup_iota)
        cl_iota = jax.lax.broadcasted_iota(jnp.int32, (GROUP, 1), 0)
        cl_w = _bit_weights(GROUP, cl_iota)

        def descend(s, st):
            if visit_ref is not None:
                visit_ref[visit_base] = visit_ref[visit_base] + 1
            if clb_resident:
                # Cluster-bounds pages live in VMEM whole (small scenes:
                # S * 16 KB) — no per-descend DMA stall.
                page = clb_hbm[s]
            else:
                cpb = pltpu.make_async_copy(clb_hbm.at[s], scr_c, sem_c)
                cpb.start()
                cpb.wait()
                page = scr_c
            scr_ec[:, :rows] = pair_slab_entries(
                page, rows, ox, oy, oz, ix, iy, iz
            )  # [GROUP, rows, 128]
            bound = bound_fn(st[0])
            ent_c = jnp.where(scr_ec[:, :rows] < bound[None], 1.0, 0.0)
            flag_c = jnp.max(jnp.max(ent_c, axis=1), axis=1, keepdims=True)
            cl_masks = _pack_masks(flag_c, cl_w, cl_iota, GROUP, n_cl_masks)
            for cm in range(n_cl_masks):
                scr_m[cl_off + cm] = cl_masks[cm]

            def cl_outer(cm, st):
                base = cm * _MASK_BITS

                def cl_bit(c):
                    m, st = c
                    g = _ctz(m & (-m)) + base
                    bound = bound_fn(st[0])
                    enter_f = jnp.where(scr_ec[g, :rows] < bound, 1.0, 0.0)
                    st = jax.lax.cond(
                        jnp.max(enter_f) > 0.5,
                        lambda st: sched(s * GROUP + g, enter_f, st),
                        lambda st: st,
                        st,
                    )
                    return (m & (m - 1), st)

                _, st = jax.lax.while_loop(
                    lambda c: c[0] != 0, cl_bit, (scr_m[cl_off + cm], st)
                )
                return st

            return jax.lax.fori_loop(0, n_cl_masks, cl_outer, st)

        def descend_page(h, st):
            # Pair-slab the descended hyper's supercluster page against
            # the CURRENT bound (tighter than bound0) and walk its bits.
            scr_es[:, :rows] = pair_slab_entries(
                sup_pg[h], rows, ox, oy, oz, ix, iy, iz
            )  # [GROUP2, rows, 128]
            bound = bound_fn(st[0])
            ent_sb = scr_es[:, :rows] < bound[None]
            ent_s = jnp.where(ent_sb, 1.0, 0.0)
            flag_s = jnp.max(jnp.max(ent_s, axis=1), axis=1, keepdims=True)
            if n_sb > 1:
                emin_s = jnp.min(
                    jnp.min(jnp.where(ent_sb, scr_es[:, :rows], _INF),
                            axis=1),
                    axis=1, keepdims=True,
                )  # [GROUP2, 1]
                on_s = flag_s > 0.5
                s0 = jnp.min(jnp.where(on_s, emin_s, _INF))
                s1 = jnp.max(jnp.where(on_s, emin_s, -_INF))
                span_s = jnp.maximum(s1 - s0, 1e-20)
                bidx_s = jnp.floor(jnp.clip(
                    (emin_s - s0) / span_s * n_sb, 0.0, n_sb - 1.0
                ))
                if reverse_buckets:
                    bidx_s = (n_sb - 1.0) - bidx_s
                for b in range(n_sb):
                    fb = jnp.where(bidx_s == b, flag_s, 0.0)
                    scr_m[sup_slot + b] = _pack_masks(
                        fb, sup_w, sup_iota, GROUP2, 1
                    )[0]
            else:
                scr_m[sup_slot] = _pack_masks(
                    flag_s, sup_w, sup_iota, GROUP2, 1
                )[0]

            def sup_bit(c):
                m, st = c
                g = _ctz(m & (-m))
                # Re-check against the CURRENT bound: a group flagged
                # above may be pruned by now (nearest tightening / shadow
                # full occlusion).
                bound = bound_fn(st[0])
                need = jnp.max(
                    jnp.where(scr_es[g, :rows] < bound, 1.0, 0.0)
                ) > 0.5
                st = jax.lax.cond(
                    need, lambda st: descend(h * GROUP2 + g, st),
                    lambda st: st, st,
                )
                return (m & (m - 1), st)

            def sup_bucket(b, st):
                _, st = jax.lax.while_loop(
                    lambda c: c[0] != 0, sup_bit, (scr_m[sup_slot + b], st)
                )
                return st

            return jax.lax.fori_loop(0, n_sb, sup_bucket, st)

        st = (carry0, jnp.int32(0), jnp.int32(0))

        def hyp_outer(i, st):
            base = jax.lax.rem(i, jnp.int32(n_hyp_masks)) * _MASK_BITS

            def hyp_bit(c):
                m, st = c
                h = _ctz(m & (-m)) + base
                bound = bound_fn(st[0])
                need = jnp.max(
                    jnp.where(scr_eh[h, :rows] < bound, 1.0, 0.0)
                ) > 0.5
                st = jax.lax.cond(
                    need, lambda st: descend_page(h, st), lambda st: st, st
                )
                return (m & (m - 1), st)

            _, st = jax.lax.while_loop(
                lambda c: c[0] != 0, hyp_bit, (scr_m[i], st)
            )
            return st

        st = jax.lax.fori_loop(0, n_buckets * n_hyp_masks, hyp_outer, st)
        carry, count, head = st

        # Drain the pipeline tail: up to Q-1 records are still in flight,
        # oldest first.
        for _ in range(q - 1):
            def final_drain(c, count=count, head=head):
                tail = jax.lax.rem(head + jnp.int32(q) - count, jnp.int32(q))
                pltpu.make_async_copy(
                    rec_hbm.at[0], scr2.at[tail], sem2.at[tail]
                ).wait()
                return process_fn(tail, scr_ef[tail, :rows], c)

            carry = jax.lax.cond(
                count > 0, final_drain, lambda c: c, carry
            )
            count = jnp.maximum(count - 1, 0)
        return carry

    return jax.lax.cond(run_gate, scan, lambda c: c, carry0)


def traverse_clusters(
    sup_pg, hyp_v, clb_hbm, rec_hbm, scr_c, scr2, scr_eh, scr_es, scr_ec,
    scr_m, scr_ef, sem_c, sem2,
    ox, oy, oz, dx, dy, dz,
    best_t, best_p, nx, ny, nz, mid,
    *,
    n_super: int,
    want_normal_mat: bool,
    active=None,
    root=None,
    visit_ref=None,
    rec_conds=True,
    rec_halves=False,
    clb_resident=False,
    cull_mode=-1,
):
    """Nearest-hit over the cluster set, inlined into a Pallas kernel.

    sup_pg: VMEM [Hp, GROUP2, 128] supercluster bound pages; hyp_v: VMEM
    [Hp8, 128] hyper bounds. clb_hbm: ANY [S, 32, 128] cluster-bounds
    pages. rec_hbm: ANY [S*32, 128, 128] pairwise records.
    scr_c: VMEM scratch (32, 128) (bounds page); scr2: VMEM scratch
    (2, 128, 128) (double-buffered record pages); sem_c: DMA semaphore;
    sem2: DMA semaphore pair.
    ox..dz, best_t: (rows, 128) f32; best_p: (rows, 128) i32 (global prim
    id, -1 = miss). nx/ny/nz/mid updated at win time when want_normal_mat.
    `active` ((rows,128) f32 mask — >0.5 live — or None) masks lanes that
    still need geometry; it rides as f32 because Mosaic cannot legalize
    i1 vectors captured across scf.for region boundaries.
    `root` (scalar bool or None) gates the whole scan. Returns the
    updated 6-tuple.

    `visit_ref` (optional SMEM (4,) i32 scratch): profiling counters —
    [0] += 1 per supercluster descend, [1] += 1 per cluster-record visit
    (this pass uses slots 0/1; the any-hit pass uses 2/3)."""
    ix, iy, iz = _inv_dir(dx), _inv_dir(dy), _inv_dir(dz)
    mx, my, mz = _moment(ox, oy, oz, dx, dy, dz)

    def bound_fn(carry):
        if active is None:
            return carry[0]
        return jnp.where(active > 0.5, carry[0], 0.0)

    def process(slot, enter_f, carry):
        col = lambda i: scr2[slot, :, i:i + 1]
        return pair_test_nearest(
            col, ox, oy, oz, dx, dy, dz, mx, my, mz, carry,
            want_normal_mat=want_normal_mat, enter_f=enter_f,
            use_conds=rec_conds, cull_mode=cull_mode,
            use_halves=rec_halves,
        )

    carry0 = (best_t, best_p, nx, ny, nz, mid)
    run_gate = _root_gate(hyp_v, ox, oy, oz, ix, iy, iz, bound_fn(carry0))
    if root is not None:
        run_gate = run_gate & root
    return _scan_pipelined(
        sup_pg, hyp_v, clb_hbm, rec_hbm, scr_c, scr2, scr_eh, scr_es,
        scr_ec, scr_m, scr_ef, sem_c, sem2,
        ox, oy, oz, dx, dy, dz, ix, iy, iz,
        bound_fn, process, carry0, n_super, run_gate, visit_ref, 0,
        clb_resident=clb_resident,
    )


def traverse_clusters_anyhit(
    sup_pg, hyp_v, clb_hbm, rec_hbm, scr_c, scr2, scr_eh, scr_es, scr_ec,
    scr_m, scr_ef, sem_c, sem2,
    ox, oy, oz, dx, dy, dz,
    t_lim, occluded_f,
    *,
    n_super: int,
    root=None,
    visit_ref=None,
    rec_conds=True,
    rec_halves=False,
    clb_resident=False,
    cull_mode=-1,
):
    """Any-hit (shadow) traversal: returns the updated occluded mask
    (as bool, from an f32 `occluded_f` input — see `active` in
    traverse_clusters for why masks cross this interface as f32).
    A lane is occluded once any cluster triangle hits at t in [0, t_lim).
    Lanes with t_lim <= 0 are inactive. Tiers stop being fetched as soon
    as every lane is resolved — the visibility-query analog of the
    reference's early-out shadow test (ref: src/worker.cpp:84-100)."""
    ix, iy, iz = _inv_dir(dx), _inv_dir(dy), _inv_dir(dz)
    mx, my, mz = _moment(ox, oy, oz, dx, dy, dz)

    def bound_fn(occ_f):
        return jnp.where(occ_f > 0.5, 0.0, t_lim)

    def process(slot, enter_f, occ_f):
        col = lambda i: scr2[slot, :, i:i + 1]
        return pair_test_anyhit(
            col, ox, oy, oz, dx, dy, dz, mx, my, mz, t_lim, occ_f,
            enter_f=enter_f, use_conds=rec_conds, cull_mode=cull_mode,
            use_halves=rec_halves,
        )

    run_gate = _root_gate(hyp_v, ox, oy, oz, ix, iy, iz, t_lim)
    if root is not None:
        run_gate = run_gate & root
    occ_f = _scan_pipelined(
        sup_pg, hyp_v, clb_hbm, rec_hbm, scr_c, scr2, scr_eh, scr_es,
        scr_ec, scr_m, scr_ef, sem_c, sem2,
        ox, oy, oz, dx, dy, dz, ix, iy, iz,
        bound_fn, process, occluded_f, n_super, run_gate, visit_ref, 2,
        clb_resident=clb_resident, reverse_buckets=_SHADOW_REVERSE,
    )
    return occ_f > 0.5


# ---------------------------------------------------------------------------
# Standalone single-query kernel (tests + benchmarks)
# ---------------------------------------------------------------------------

def _single_kernel(sup_ref, hyp_ref, clb_hbm, rec_hbm,
                   ox_r, oy_r, oz_r, dx_r, dy_r, dz_r,
                   lim_r, t_out, p_out, scr_c, scr2, scr_eh, scr_es,
                   scr_ec, scr_m, scr_ef, sem_c, sem2,
                   *, n_super, any_hit, clb_resident=False,
                   rec_halves=False):
    ox, oy, oz = ox_r[:], oy_r[:], oz_r[:]
    dx, dy, dz = dx_r[:], dy_r[:], dz_r[:]
    lim = lim_r[:]
    shp = ox.shape
    if any_hit:
        occ = traverse_clusters_anyhit(
            sup_ref, hyp_ref, clb_hbm, rec_hbm, scr_c, scr2, scr_eh,
            scr_es, scr_ec, scr_m, scr_ef, sem_c, sem2,
            ox, oy, oz, dx, dy, dz,
            lim, jnp.zeros(shp, jnp.float32),
            n_super=n_super, clb_resident=clb_resident,
            rec_halves=rec_halves,
        )
        t_out[:] = jnp.where(occ, 1.0, jnp.inf)
        p_out[:] = jnp.where(occ, 0, -1)
    else:
        best_t = lim
        best_p = jnp.full(shp, -1, jnp.int32)
        dummy = jnp.zeros(shp, jnp.float32)
        dmid = jnp.zeros(shp, jnp.int32)
        best_t, best_p, _, _, _, _ = traverse_clusters(
            sup_ref, hyp_ref, clb_hbm, rec_hbm, scr_c, scr2, scr_eh,
            scr_es, scr_ec, scr_m, scr_ef, sem_c, sem2,
            ox, oy, oz, dx, dy, dz,
            best_t, best_p, dummy, dummy, dummy, dmid,
            n_super=n_super, rec_halves=rec_halves,
            want_normal_mat=False, clb_resident=clb_resident,
        )
        t_out[:] = best_t
        p_out[:] = best_p


@functools.partial(
    jax.jit,
    static_argnames=("n_super", "any_hit", "interpret", "clb_resident",
                     "rec_halves"),
)
def _single_call(sup, hyp, clb, records, comps, lim, n_super,
                 any_hit, interpret=False, clb_resident=False,
                 rec_halves=False):
    rows = comps[0].shape[0]
    grid = (rows // 8,)
    ray_spec = pl.BlockSpec((8, 128), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    kernel = functools.partial(
        _single_kernel, n_super=n_super, any_hit=any_hit,
        clb_resident=clb_resident, rec_halves=rec_halves,
    )
    clb_spec = (
        pl.BlockSpec(clb.shape, lambda i: (0, 0, 0),
                     memory_space=pltpu.VMEM)
        if clb_resident else pl.BlockSpec(memory_space=pl.ANY)
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(sup.shape, lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(hyp.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            clb_spec,
            pl.BlockSpec(memory_space=pl.ANY),
        ] + [ray_spec] * 7,
        out_specs=[ray_spec, ray_spec],
        out_shape=[
            jax.ShapeDtypeStruct((rows, 128), jnp.float32),
            jax.ShapeDtypeStruct((rows, 128), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((GROUP, 128), jnp.float32),
            pltpu.VMEM((REC_QUEUE, records.shape[1], PAIR_COLS),
                       jnp.float32),
            pltpu.VMEM((hyp.shape[0], 8, 128), jnp.float32),
            pltpu.VMEM((GROUP2, 8, 128), jnp.float32),
            pltpu.VMEM((GROUP, 8, 128), jnp.float32),
            pltpu.SMEM((MASK_SLOTS,), jnp.int32),
            pltpu.VMEM((REC_QUEUE, 8, 128), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA((REC_QUEUE,)),
        ],
        interpret=interpret,
        compiler_params=clb_compiler_params(clb, clb_resident),
    )(sup, hyp, clb, records, *comps, lim)


def cluster_intersect_kernel(scene, o, d, t_max=None, any_hit=False,
                             interpret=False, rec_halves=False):
    """Standalone cluster-set query through the in-kernel traversal
    (dense big-tri/sphere parts NOT included — compose with
    pallas_traverse._dense_part for a full scene query). Returns
    (t [R], prim [R]) with -1/-1.0 on miss; for any_hit, t is 1.0 on any
    occlusion in [0, t_max)."""
    o = jnp.asarray(o, jnp.float32)
    d = jnp.asarray(d, jnp.float32)
    r = o.shape[0]
    block = 8 * 128
    pad = (-r) % block
    if pad:
        o = jnp.concatenate([o, jnp.zeros((pad, 3), o.dtype)])
        d = jnp.concatenate(
            [d, jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]], d.dtype), (pad, 1))]
        )
    if t_max is None:
        lim = jnp.full(r + pad, jnp.inf, jnp.float32)
    else:
        lim = jnp.concatenate(
            [jnp.asarray(t_max, jnp.float32), jnp.zeros(pad, jnp.float32)]
        )
    if pad and t_max is None:
        lim = lim.at[r:].set(0.0)  # padding lanes are inactive
    rows = (r + pad) // 128
    comps = [arr[:, j].reshape(rows, 128) for arr in (o, d) for j in range(3)]
    lim2 = lim.reshape(rows, 128)
    t, p = _single_call(
        scene.krn_sup_bounds, scene.krn_hyp_bounds, scene.krn_cl_bounds,
        scene.krn_records, comps, lim2,
        n_super=int(scene.krn_cl_bounds.shape[0]),
        any_hit=any_hit, interpret=interpret,
        clb_resident=clb_fits_vmem(scene.krn_cl_bounds),
        rec_halves=rec_halves,
    )
    t = t.reshape(-1)[:r]
    p = p.reshape(-1)[:r]
    hit = p >= 0
    return jnp.where(hit, t, -1.0), p
