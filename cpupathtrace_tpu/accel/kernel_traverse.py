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

Three-tier layout (sized so SMEM stays bounded for arbitrarily large
meshes — a flat [C, 8] SMEM bounds table dies at ~2k clusters):

  * superclusters: groups of 32 consecutive clusters (the cluster BVH
    emits clusters in spatial order). Union AABBs in an SMEM table
    [S, 8] — the only resident-by-default metadata (S = C/32).
  * cluster bounds: per group, an [8, 128] component-major page
    (rows lo/hi/valid, lanes = clusters; 32 used) DMA'd HBM->SMEM when
    the supercluster is entered.
  * cluster records: up to 128 triangles, packed component-major as
    [C, 24, 128] f32 (rows v0/e1/e2/cull/prim/n0/n1/n2/mat, lanes =
    tris), DMA'd HBM->SMEM (12 KB) when the cluster is entered.

Per (8, 128)-ray block the scan is a `fori_loop` over superclusters:
vector slab test vs the SMEM scalars (ref slab semantics:
src/scene/bounding_box.cpp:38-73) reduced to a scalar
`need = any(entry < bound)`; on need, descend a tier. Leaf tests are
Moller-Trumbore over all 1024 block rays per op (ref: src/scene/
object.cpp:146-182), interpolating the smooth shading normal at win time
(ref object.cpp:126-144).

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

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TRI_EPS = 1e-6
_FLT_MAX = 3.4028234663852886e38

REC_ROWS = 24
REC_LANES = 128  # triangles per cluster (one vector register row)
GROUP = 32       # clusters per supercluster

# Record row indices
_V0, _E1, _E2 = 0, 3, 6
_CULL, _PRIM = 9, 10
_N0, _N1, _N2 = 11, 14, 17
_MAT = 20


def pack_kernel_tables_np(cl_v0, cl_v1, cl_v2, cl_cull, cl_prim,
                          cl_n0, cl_n1, cl_n2, cl_mat, c_lo, c_hi):
    """Pack the three traversal tiers from [C, L<=128, ...] cluster arrays.

    Returns (records [Cp, 24, 128], cl_bounds [S, 8, 128],
    sup_bounds [S, 8]) with Cp = S * GROUP (padding clusters carry
    prim = -1 / valid = 0). Prim ids ride as f32: exact below 2^24
    (asserted)."""
    v0 = np.asarray(cl_v0, np.float32)
    c, l, _ = v0.shape
    if l > REC_LANES:
        raise ValueError(f"cluster_size {l} > {REC_LANES}")
    prim = np.asarray(cl_prim, np.float32)
    if prim.max(initial=0) >= 2 ** 24:
        raise ValueError("kernel traversal carries prim ids as f32 (< 2^24)")
    s = -(-c // GROUP)
    cp = s * GROUP

    rec = np.zeros((cp, REC_ROWS, REC_LANES), np.float32)
    rec[:, _PRIM, :] = -1.0
    rec[:c, _V0:_V0 + 3, :l] = v0.transpose(0, 2, 1)
    rec[:c, _E1:_E1 + 3, :l] = (np.asarray(cl_v1, np.float32) - v0).transpose(0, 2, 1)
    rec[:c, _E2:_E2 + 3, :l] = (np.asarray(cl_v2, np.float32) - v0).transpose(0, 2, 1)
    rec[:c, _CULL, :l] = np.asarray(cl_cull, np.float32)
    rec[:c, _PRIM, :l] = prim
    rec[:c, _N0:_N0 + 3, :l] = np.asarray(cl_n0, np.float32).transpose(0, 2, 1)
    rec[:c, _N1:_N1 + 3, :l] = np.asarray(cl_n1, np.float32).transpose(0, 2, 1)
    rec[:c, _N2:_N2 + 3, :l] = np.asarray(cl_n2, np.float32).transpose(0, 2, 1)
    rec[:c, _MAT, :l] = np.asarray(cl_mat, np.float32)

    # A padding cluster may still be DMA'd if its group is entered; its
    # bounds are invalid so it never is, but keep records benign anyway.
    lo = np.asarray(c_lo, np.float32)
    hi = np.asarray(c_hi, np.float32)
    valid = np.zeros(cp, np.float32)
    valid[:c] = 1.0
    lo_p = np.full((cp, 3), np.inf, np.float32)
    hi_p = np.full((cp, 3), -np.inf, np.float32)
    lo_p[:c] = lo
    hi_p[:c] = hi

    clb = np.zeros((s, 8, 128), np.float32)
    lo_g = lo_p.reshape(s, GROUP, 3)
    hi_g = hi_p.reshape(s, GROUP, 3)
    clb[:, 0:3, :GROUP] = lo_g.transpose(0, 2, 1)
    clb[:, 3:6, :GROUP] = hi_g.transpose(0, 2, 1)
    clb[:, 6, :GROUP] = valid.reshape(s, GROUP)

    sup = np.zeros((s, 8), np.float32)
    vmask = valid.reshape(s, GROUP) > 0.5
    any_v = vmask.any(axis=1)
    sup[:, 0:3] = np.where(
        any_v[:, None], np.where(vmask[..., None], lo_g, np.inf).min(axis=1), 0.0
    )
    sup[:, 3:6] = np.where(
        any_v[:, None], np.where(vmask[..., None], hi_g, -np.inf).max(axis=1), 0.0
    )
    sup[:, 6] = any_v.astype(np.float32)
    return rec, clb, sup


def _inv_dir(d):
    """Reference slab-test inverse: zero components use FLT_MAX
    (ref: src/scene/bounding_box.cpp:44-49)."""
    nz = jnp.abs(d) > 0.0
    return jnp.where(nz, 1.0 / jnp.where(nz, d, 1.0), _FLT_MAX)


def _slab(lox, loy, loz, hix, hiy, hiz, ox, oy, oz, ix, iy, iz):
    """Vector slab test; returns (entry, enter_mask_precursor tmin<=tmax,
    tmax>=0)."""
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
    entry = jnp.maximum(tmin, 0.0)
    return entry, (tmax >= 0.0) & (tmin <= tmax)


def _mt_scalar(scr, k, ox, oy, oz, dx, dy, dz):
    """Moller-Trumbore of all block rays vs triangle k of the SMEM-resident
    record. Returns (t, u, v, prim, ok_geom)."""
    v0x, v0y, v0z = scr[_V0, k], scr[_V0 + 1, k], scr[_V0 + 2, k]
    e1x, e1y, e1z = scr[_E1, k], scr[_E1 + 1, k], scr[_E1 + 2, k]
    e2x, e2y, e2z = scr[_E2, k], scr[_E2 + 1, k], scr[_E2 + 2, k]
    cull = scr[_CULL, k]
    prim = scr[_PRIM, k]
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
        & (u >= 0.0) & (u <= 1.0) & (v >= 0.0) & (u + v <= 1.0)
        & (t >= 0.0)
    )
    return t, u, v, prim, ok


def traverse_clusters(
    sup_ref, clb_hbm, rec_hbm, scr_b, scr, sem_b, sem,
    ox, oy, oz, dx, dy, dz,
    best_t, best_p, nx, ny, nz, mid,
    *,
    n_super: int,
    n_tri_rows: int,
    want_normal_mat: bool,
    active=None,
    root=None,
    visit_ref=None,
):
    """Nearest-hit over the cluster set, inlined into a Pallas kernel.

    sup_ref: SMEM [S, 8] supercluster bounds. clb_hbm: ANY [S, 8, 128]
    cluster-bounds pages. rec_hbm: ANY [S*32, 24, 128] records.
    scr_b/scr: SMEM scratch (8, 128)/(24, 128); sem_b/sem: DMA semaphores.
    ox..dz, best_t: (8, 128) f32; best_p: (8, 128) i32 (global prim id,
    -1 = miss). nx/ny/nz/mid updated at win time when want_normal_mat.
    `active` ((8,128) f32 mask — >0.5 live — or None) masks lanes that
    still need geometry; it rides as f32 because Mosaic cannot legalize
    i1 vectors captured across scf.for region boundaries.
    `root` (scalar bool or None) gates the whole scan. Returns the
    updated 6-tuple.

    `visit_ref` (optional SMEM (4,) i32 scratch): profiling counters —
    [0] += 1 per supercluster descend, [1] += 1 per cluster-record visit
    (this pass uses slots 0/1; the any-hit pass uses 2/3)."""
    shp = ox.shape
    ix, iy, iz = _inv_dir(dx), _inv_dir(dy), _inv_dir(dz)

    def bound_of(best_t):
        if active is None:
            return best_t
        return jnp.where(active > 0.5, best_t, 0.0)

    def sup_body(s, carry):
        best_t = carry[0]
        bound = bound_of(best_t)
        entry, geo = _slab(
            sup_ref[s, 0], sup_ref[s, 1], sup_ref[s, 2],
            sup_ref[s, 3], sup_ref[s, 4], sup_ref[s, 5],
            ox, oy, oz, ix, iy, iz,
        )
        enter = geo & (entry < bound)
        need = (sup_ref[s, 6] > 0.5) & (
            jnp.max(jnp.where(enter, 1.0, 0.0)) > 0.5
        )

        def descend(carry):
            if visit_ref is not None:
                visit_ref[0] = visit_ref[0] + 1
            cpb = pltpu.make_async_copy(clb_hbm.at[s], scr_b, sem_b)
            cpb.start()
            cpb.wait()

            def cl_body(g, carry):
                best_t, best_p, nx, ny, nz, mid = carry
                bound = bound_of(best_t)
                entry, geo = _slab(
                    scr_b[0, g], scr_b[1, g], scr_b[2, g],
                    scr_b[3, g], scr_b[4, g], scr_b[5, g],
                    ox, oy, oz, ix, iy, iz,
                )
                enter = geo & (entry < bound)
                need_c = (scr_b[6, g] > 0.5) & (
                    jnp.max(jnp.where(enter, 1.0, 0.0)) > 0.5
                )

                def resident(carry):
                    best_t, best_p, nx, ny, nz, mid = carry
                    if visit_ref is not None:
                        visit_ref[1] = visit_ref[1] + 1
                    cp = pltpu.make_async_copy(
                        rec_hbm.at[s * GROUP + g], scr, sem
                    )
                    cp.start()
                    cp.wait()

                    def tri_body(k, st):
                        best_t, best_p, nx, ny, nz, mid = st
                        t, u, v, prim, okg = _mt_scalar(
                            scr, k, ox, oy, oz, dx, dy, dz
                        )
                        ok = okg & (t < best_t)
                        best_t = jnp.where(ok, t, best_t)
                        best_p = jnp.where(
                            ok,
                            jnp.full(shp, prim, jnp.float32).astype(jnp.int32),
                            best_p,
                        )
                        if want_normal_mat:
                            w0 = 1.0 - u - v
                            snx = (w0 * scr[_N0, k] + u * scr[_N1, k]
                                   + v * scr[_N2, k])
                            sny = (w0 * scr[_N0 + 1, k] + u * scr[_N1 + 1, k]
                                   + v * scr[_N2 + 1, k])
                            snz = (w0 * scr[_N0 + 2, k] + u * scr[_N1 + 2, k]
                                   + v * scr[_N2 + 2, k])
                            inv = jax.lax.rsqrt(
                                snx * snx + sny * sny + snz * snz + 1e-30
                            )
                            nx = jnp.where(ok, snx * inv, nx)
                            ny = jnp.where(ok, sny * inv, ny)
                            nz = jnp.where(ok, snz * inv, nz)
                            mid = jnp.where(
                                ok,
                                jnp.full(shp, scr[_MAT, k],
                                         jnp.float32).astype(jnp.int32),
                                mid,
                            )
                        return best_t, best_p, nx, ny, nz, mid

                    return jax.lax.fori_loop(0, n_tri_rows, tri_body, carry)

                return jax.lax.cond(need_c, resident, lambda x: x, carry)

            return jax.lax.fori_loop(0, GROUP, cl_body, carry)

        return jax.lax.cond(need, descend, lambda x: x, carry)

    bound0 = bound_of(best_t)
    run = jnp.max(jnp.where(bound0 > 0.0, 1.0, 0.0)) > 0.5
    if root is not None:
        run = run & root

    return jax.lax.cond(
        run,
        lambda c: jax.lax.fori_loop(0, n_super, sup_body, c),
        lambda c: c,
        (best_t, best_p, nx, ny, nz, mid),
    )


def traverse_clusters_anyhit(
    sup_ref, clb_hbm, rec_hbm, scr_b, scr, sem_b, sem,
    ox, oy, oz, dx, dy, dz,
    t_lim, occluded_f,
    *,
    n_super: int,
    n_tri_rows: int,
    root=None,
    visit_ref=None,
):
    """Any-hit (shadow) traversal: returns the updated occluded mask
    (as bool, from an f32 `occluded_f` input — see `active` in
    traverse_clusters for why masks cross this interface as f32).
    A lane is occluded once any cluster triangle hits at t in [0, t_lim).
    Lanes with t_lim <= 0 are inactive. Tiers stop being fetched as soon
    as every lane is resolved — the visibility-query analog of the
    reference's early-out shadow test (ref: src/worker.cpp:84-100)."""
    ix, iy, iz = _inv_dir(dx), _inv_dir(dy), _inv_dir(dz)

    # Mask rides the carries as f32 (Mosaic cannot carry i1 vectors
    # through scf.for/scf.if).
    def sup_body(s, occ_f):
        pending_lim = jnp.where(occ_f > 0.5, 0.0, t_lim)
        entry, geo = _slab(
            sup_ref[s, 0], sup_ref[s, 1], sup_ref[s, 2],
            sup_ref[s, 3], sup_ref[s, 4], sup_ref[s, 5],
            ox, oy, oz, ix, iy, iz,
        )
        enter = geo & (entry < pending_lim)
        need = (sup_ref[s, 6] > 0.5) & (
            jnp.max(jnp.where(enter, 1.0, 0.0)) > 0.5
        )

        def descend(occ_f):
            if visit_ref is not None:
                visit_ref[2] = visit_ref[2] + 1
            cpb = pltpu.make_async_copy(clb_hbm.at[s], scr_b, sem_b)
            cpb.start()
            cpb.wait()

            def cl_body(g, occ_f):
                pending_lim = jnp.where(occ_f > 0.5, 0.0, t_lim)
                entry, geo = _slab(
                    scr_b[0, g], scr_b[1, g], scr_b[2, g],
                    scr_b[3, g], scr_b[4, g], scr_b[5, g],
                    ox, oy, oz, ix, iy, iz,
                )
                enter = geo & (entry < pending_lim)
                need_c = (scr_b[6, g] > 0.5) & (
                    jnp.max(jnp.where(enter, 1.0, 0.0)) > 0.5
                )

                def resident(occ_f):
                    if visit_ref is not None:
                        visit_ref[3] = visit_ref[3] + 1
                    cp = pltpu.make_async_copy(
                        rec_hbm.at[s * GROUP + g], scr, sem
                    )
                    cp.start()
                    cp.wait()

                    def tri_body(k, occ_f):
                        t, u, v, prim, okg = _mt_scalar(
                            scr, k, ox, oy, oz, dx, dy, dz
                        )
                        hit = okg & (t < t_lim)
                        return jnp.where(hit, 1.0, occ_f)

                    return jax.lax.fori_loop(0, n_tri_rows, tri_body, occ_f)

                return jax.lax.cond(need_c, resident, lambda o: o, occ_f)

            return jax.lax.fori_loop(0, GROUP, cl_body, occ_f)

        return jax.lax.cond(need, descend, lambda o: o, occ_f)

    run = jnp.max(jnp.where(t_lim > 0.0, 1.0, 0.0)) > 0.5
    if root is not None:
        run = run & root

    occ_f = occluded_f
    occ_f = jax.lax.cond(
        run,
        lambda o: jax.lax.fori_loop(0, n_super, sup_body, o),
        lambda o: o,
        occ_f,
    )
    return occ_f > 0.5


# ---------------------------------------------------------------------------
# Standalone single-query kernel (tests + benchmarks)
# ---------------------------------------------------------------------------

def _single_kernel(sup_ref, clb_hbm, rec_hbm,
                   ox_r, oy_r, oz_r, dx_r, dy_r, dz_r,
                   lim_r, t_out, p_out, scr_b, scr, sem_b, sem,
                   *, n_super, n_tri_rows, any_hit):
    ox, oy, oz = ox_r[:], oy_r[:], oz_r[:]
    dx, dy, dz = dx_r[:], dy_r[:], dz_r[:]
    lim = lim_r[:]
    shp = ox.shape
    if any_hit:
        occ = traverse_clusters_anyhit(
            sup_ref, clb_hbm, rec_hbm, scr_b, scr, sem_b, sem,
            ox, oy, oz, dx, dy, dz,
            lim, jnp.zeros(shp, jnp.float32),
            n_super=n_super, n_tri_rows=n_tri_rows,
        )
        t_out[:] = jnp.where(occ, 1.0, jnp.inf)
        p_out[:] = jnp.where(occ, 0, -1)
    else:
        best_t = lim
        best_p = jnp.full(shp, -1, jnp.int32)
        dummy = jnp.zeros(shp, jnp.float32)
        dmid = jnp.zeros(shp, jnp.int32)
        best_t, best_p, _, _, _, _ = traverse_clusters(
            sup_ref, clb_hbm, rec_hbm, scr_b, scr, sem_b, sem,
            ox, oy, oz, dx, dy, dz,
            best_t, best_p, dummy, dummy, dummy, dmid,
            n_super=n_super, n_tri_rows=n_tri_rows,
            want_normal_mat=False,
        )
        t_out[:] = best_t
        p_out[:] = best_p


@functools.partial(
    jax.jit, static_argnames=("n_super", "n_tri_rows", "any_hit",
                              "interpret")
)
def _single_call(sup, clb, records, comps, lim, n_super, n_tri_rows,
                 any_hit, interpret=False):
    rows = comps[0].shape[0]
    grid = (rows // 8,)
    ray_spec = pl.BlockSpec((8, 128), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    kernel = functools.partial(
        _single_kernel, n_super=n_super, n_tri_rows=n_tri_rows,
        any_hit=any_hit,
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(sup.shape, lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ] + [ray_spec] * 7,
        out_specs=[ray_spec, ray_spec],
        out_shape=[
            jax.ShapeDtypeStruct((rows, 128), jnp.float32),
            jax.ShapeDtypeStruct((rows, 128), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.SMEM((8, 128), jnp.float32),
            pltpu.SMEM((REC_ROWS, REC_LANES), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(sup, clb, records, *comps, lim)


def cluster_intersect_kernel(scene, o, d, t_max=None, any_hit=False,
                             interpret=False):
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
        scene.krn_sup_bounds, scene.krn_cl_bounds, scene.krn_records,
        comps, lim2,
        n_super=int(scene.krn_sup_bounds.shape[0]),
        n_tri_rows=int(min(scene.krn_cluster_size, REC_LANES)),
        any_hit=any_hit, interpret=interpret,
    )
    t = t.reshape(-1)[:r]
    p = p.reshape(-1)[:r]
    hit = p >= 0
    return jnp.where(hit, t, -1.0), p
