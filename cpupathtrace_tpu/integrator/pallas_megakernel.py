"""Pallas TPU megakernel: the full path-trace loop on-chip.

The wavefront integrator (`wavefront.py`) round-trips every per-bounce
intermediate through HBM; measured cost ~200ms per bounce for a 1M-ray
batch on v5e — bandwidth, not compute. This kernel runs the ENTIRE
estimator for a block of rays inside one Pallas program: scene tables in
SMEM, all path state in vector registers/VMEM, a `fori_loop` over bounces,
per-core PRNG for sampling. HBM traffic collapses to reading the ray batch
and writing (spectrum, collected) — ~40 bytes per ray for the whole path.

Estimator parity with `wavefront.trace` / the C++ reference
(ref: src/worker.cpp:26-146):
  * emission at every vertex weighted 1/(divisor * bounce_pd)
  * NEE at every vertex over point lights + K CDF-drawn emissive prims,
    weight 1/(divisor * bounce_pd * light_pd * shadow_pd); specular BSDFs
    opt out via synthetic pdf 0
  * roulette p=1 through depth 4 then 0.1+0.1*min(contribution,1), with the
    (1-p) stop factor folded into bounce_pd
  * 1e-20 divisor/bounce_pd cutoffs; alpha = any-hit
The RANDOM STREAM differs (pltpu PRNG vs threefry): estimates agree in
distribution, not bitwise — exactly the relationship the reference has with
its own `std::random_device`-seeded runs.

Scope: "dense-table" scenes — up to _MAX_TRI triangles + _MAX_SPH spheres
(the benchmark/test scenes; large scenes use the cluster/sweep path).
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..scene.scene import SceneData, BSDF_GLASS, BSDF_LAMBERTIAN, BSDF_MIRROR
from ..core.config import RenderOptions
from ..accel.kernel_traverse import (
    GROUP,
    GROUP2,
    MASK_SLOTS,
    PAIR_COLS,
    REC_LANES,
    REC_QUEUE,
    _moment,
    clb_compiler_params,
    clb_fits_vmem,
    pair_test_anyhit,
    pair_test_nearest,
    traverse_clusters,
    traverse_clusters_anyhit,
)

_TRI_EPS = 1e-6
_PD_CUTOFF = 1e-20
_PI = 3.14159265358979323846
_BLOCK_ROWS = 64
# Binned scenes use smaller ray blocks: a block descends a cluster tier
# iff ANY of its rays needs it, so fewer rays per block = tighter culling.
_KRN_BLOCK_ROWS = 8
_LANES = 128
# Table loops are `fori_loop`s over SMEM rows (not unrolled), so the caps
# bound per-bounce runtime cost, not compile time. Past ~512 triangles the
# binned traversal path wins anyway (accel/pallas_traverse.py).
_MAX_TRI = 512
_MAX_SPH = 64
_MAX_EM = 256
# Supercluster cap: since the hyper tier, per-query fixed work scales with
# Hp = ceil(S/16) pages (the hyper pair-slab + scr_eh scratch), not S, so
# the cap mainly bounds VMEM scratch (scr_eh [S/16, em_k*8, 128] f32 —
# ~2.4 MB at 4608 sups) and the SMEM bitmask slot budget
# (kernel_traverse.MASK_SLOTS: hp8 = 288 -> 13 hyper masks; worst case
# 8 buckets * 13 + 8 sup-bucket + 2 cluster = 114 <= 128). 4608 sups *
# 32 clusters * 64-tri records = ~9.4M triangles through the in-kernel
# traversal (the 7.2M benchmark at 64-tri records is 4097 sups).
_MAX_SUP = 4608

# Table row layouts (all f32):
# tri: v0(0:3) e1(3:6) e2(6:9) cull(9) valid(10) n0(11:14) n1(14:17) n2(17:20)
#      mat(20)
_TRI_COLS = 24
# sph: center(0:3) radius(3) valid(4) mat(5)
_SPH_COLS = 8
# mat: diffuse(0:3) specular(3:6) ior(6) emission(7:10) bsdf(10) one_way(11)
_MAT_COLS = 12
# light (point): pos(0:3) spectrum(3:6)
_LGT_COLS = 8
# emissive (fully pre-resolved so NEE is O(E), not O(E*T*M)):
# cdf(0) sel_p(1) is_sphere(2) v0|center(3:6) e1|radius(6:9) e2(9:12)
# face_normal(12:15) pd_area(15) cull(16) emission(17:20)
_EM_COLS = 24


def _seed_rng(seed, shape):
    """Per-lane xorshift32 state (the TPU-native analog of the reference's
    per-thread xorshift engines, ref: base.h:24-42 + worker.cpp:369-382).
    A software generator keeps the kernel portable across interpret mode
    and hardware (pltpu.prng_random_bits has no interpret implementation).
    Seeded by a multiply-xor hash of (seed, row, lane)."""
    row = jax.lax.broadcasted_iota(jnp.uint32, shape, 0)
    lane = jax.lax.broadcasted_iota(jnp.uint32, shape, 1)
    s = (
        seed.astype(jnp.uint32) * jnp.uint32(2654435761)
        ^ (row * jnp.uint32(40503) + jnp.uint32(0x9E3779B9))
        ^ (lane * jnp.uint32(2246822519) + jnp.uint32(0x85EBCA6B))
    )
    return _fmix32(s)


def _fmix32(s):
    """murmur3 finalizer + forbid the all-zero state.

    A single mix round here left structure in the early draws of nearby
    (row, lane) seeds; with only ~50 draws per path, the structured
    roulette draws SHIFT the realized survival rate away from the
    roulette pdf the estimator divides by — measured as a 9-10% deficit
    in the depth>4 contribution on the box verify workload. Full
    avalanche restores agreement with the threefry wavefront."""
    s = s ^ (s >> jnp.uint32(16))
    s = s * jnp.uint32(0x85EBCA6B)
    s = s ^ (s >> jnp.uint32(13))
    s = s * jnp.uint32(0xC2B2AE35)
    s = s ^ (s >> jnp.uint32(16))
    return s | jnp.uint32(1)


def _next_u01(state):
    """Advance xorshift32; returns (state, uniform [0,1))."""
    state = state ^ (state << jnp.uint32(13))
    state = state ^ (state >> jnp.uint32(17))
    state = state ^ (state << jnp.uint32(5))
    # Mosaic has no uint32->float32 cast; the 24-bit value is sign-safe as
    # int32, so bitcast then convert.
    u24 = jax.lax.bitcast_convert_type(state >> jnp.uint32(8), jnp.int32)
    u = u24.astype(jnp.float32) * jnp.float32(1.0 / (1 << 24))
    return state, u


def _intersect_tables(tri_ref, sph_ref, n_tri, n_sph,
                      ox, oy, oz, dx, dy, dz, want_normal_mat):
    """Nearest-hit over the SMEM tables (fori_loops with dynamic row reads —
    compile cost is independent of the table sizes). Returns best_t (+inf on
    miss), best_prim, and — when want_normal_mat — the interpolated shading
    normal and material id of the winner, computed in-loop at win time."""
    shp = ox.shape
    best_t = jnp.full(shp, jnp.inf, jnp.float32)
    best_p = jnp.full(shp, -1, jnp.int32)
    nx = jnp.zeros(shp, jnp.float32)
    ny = jnp.ones(shp, jnp.float32)
    nz = jnp.zeros(shp, jnp.float32)
    mat = jnp.zeros(shp, jnp.int32)

    def tri_body(k, st):
        best_t, best_p, nx, ny, nz, mat = st
        v0x, v0y, v0z = tri_ref[k, 0], tri_ref[k, 1], tri_ref[k, 2]
        e1x, e1y, e1z = tri_ref[k, 3], tri_ref[k, 4], tri_ref[k, 5]
        e2x, e2y, e2z = tri_ref[k, 6], tri_ref[k, 7], tri_ref[k, 8]
        cull = tri_ref[k, 9]
        valid = tri_ref[k, 10]

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
            (valid > 0.5) & ~miss_det
            & (u >= 0.0) & (u <= 1.0) & (v >= 0.0) & (u + v <= 1.0)
            & (t >= 0.0) & (t < best_t)
        )
        best_t = jnp.where(ok, t, best_t)
        best_p = jnp.where(ok, k, best_p)
        if want_normal_mat:
            # Barycentric shading normal at win time
            # (ref: object.cpp:126-144): weights (1-u-v, u, v).
            w0 = 1.0 - u - v
            snx = (w0 * tri_ref[k, 11] + u * tri_ref[k, 14] + v * tri_ref[k, 17])
            sny = (w0 * tri_ref[k, 12] + u * tri_ref[k, 15] + v * tri_ref[k, 18])
            snz = (w0 * tri_ref[k, 13] + u * tri_ref[k, 16] + v * tri_ref[k, 19])
            inv = jax.lax.rsqrt(snx * snx + sny * sny + snz * snz + 1e-30)
            nx = jnp.where(ok, snx * inv, nx)
            ny = jnp.where(ok, sny * inv, ny)
            nz = jnp.where(ok, snz * inv, nz)
            mat = jnp.where(ok, tri_ref[k, 20].astype(jnp.int32), mat)
        return best_t, best_p, nx, ny, nz, mat

    def sph_body(k, st):
        best_t, best_p, nx, ny, nz, mat = st
        cx, cy, cz = sph_ref[k, 0], sph_ref[k, 1], sph_ref[k, 2]
        r = sph_ref[k, 3]
        valid = sph_ref[k, 4]
        cox = ox - cx
        coy = oy - cy
        coz = oz - cz
        dd = dx * cox + dy * coy + dz * coz
        disc = dd * dd - (cox * cox + coy * coy + coz * coz) + r * r
        t = -(dd + jnp.sqrt(jnp.maximum(disc, 0.0)))
        ok = (valid > 0.5) & (disc >= 0.0) & (t >= 0.0) & (t < best_t)
        best_t = jnp.where(ok, t, best_t)
        best_p = jnp.where(ok, k + n_tri, best_p)
        if want_normal_mat:
            hx = ox + dx * t - cx
            hy = oy + dy * t - cy
            hz = oz + dz * t - cz
            inv = jax.lax.rsqrt(hx * hx + hy * hy + hz * hz + 1e-30)
            nx = jnp.where(ok, hx * inv, nx)
            ny = jnp.where(ok, hy * inv, ny)
            nz = jnp.where(ok, hz * inv, nz)
            mat = jnp.where(ok, sph_ref[k, 5].astype(jnp.int32), mat)
        return best_t, best_p, nx, ny, nz, mat

    st = (best_t, best_p, nx, ny, nz, mat)
    st = jax.lax.fori_loop(0, n_tri, tri_body, st)
    st = jax.lax.fori_loop(0, n_sph, sph_body, st)
    best_t, best_p, nx, ny, nz, mat = st

    if want_normal_mat:
        return best_t, best_p, nx, ny, nz, mat
    return best_t, best_p


def _gather_mat_all(mat_ref, mid, n_mat):
    """All 12 per-lane material columns in one fori pass over the table."""
    shp = mid.shape

    def body(m, cols):
        on = mid == m
        return tuple(
            jnp.where(on, mat_ref[m, c], cols[c]) for c in range(_MAT_COLS)
        )

    cols = tuple(jnp.zeros(shp, jnp.float32) for _ in range(_MAT_COLS))
    return jax.lax.fori_loop(0, n_mat, body, cols)


def _tangent_frame(nx, ny, nz):
    """Branch-free tangent frame (parity: propagation.cpp:24-62 structure,
    see utils/math.orthonormal_frame)."""
    has_x = jnp.abs(nx) > 0.0
    has_y = jnp.abs(ny) > 0.0
    dxv = jnp.where(has_x, 0.0, jnp.where(has_y, -ny, 1.0))
    dyv = jnp.where(has_x, -nx, jnp.where(has_y, nz, 0.0))
    dzv = jnp.where(has_x, jnp.where(has_y, ny, nz), 0.0)
    inv = jax.lax.rsqrt(dxv * dxv + dyv * dyv + dzv * dzv + 1e-30)
    dxv, dyv, dzv = dxv * inv, dyv * inv, dzv * inv
    # b1 = normalize(cross(d, n))
    b1x = dyv * nz - dzv * ny
    b1y = dzv * nx - dxv * nz
    b1z = dxv * ny - dyv * nx
    inv1 = jax.lax.rsqrt(b1x * b1x + b1y * b1y + b1z * b1z + 1e-30)
    b1x, b1y, b1z = b1x * inv1, b1y * inv1, b1z * inv1
    # b2 = normalize(cross(b1, n))
    b2x = b1y * nz - b1z * ny
    b2y = b1z * nx - b1x * nz
    b2z = b1x * ny - b1y * nx
    inv2 = jax.lax.rsqrt(b2x * b2x + b2y * b2y + b2z * b2z + 1e-30)
    return b1x, b1y, b1z, b2x * inv2, b2y * inv2, b2z * inv2


_SKIP_TRAVERSE = os.environ.get("PTX_SKIP_TRAVERSE", "") == "1"  # ablation
# Per-row lax.cond gating in the traversal record tests (A/B knob): conds
# skip rows that did not enter a cluster, but each Mosaic cond region costs
# more as the surrounding live state grows. Measured on the dragon bench
# (round 3): blocks are row-coherent — the conds almost never skip and cost
# ~3% of the frame, so they default OFF.
# Per-row lax.cond gating of the record pair tests. Default "auto": ON
# for 128-triangle records (full-scale meshes — bracketed A/B on the
# 7.2M dragon, round 4: nearest conds -12% frame, shadow conds -3%),
# OFF below (measured slower at the 200k bench's 56-tri records, round
# 3: short records make the cond region overhead exceed the skipped
# work). Round-3 lore said nearest conds hang the Mosaic compile at
# full scale — disproved in round 4 (the "hang" was the 4.9 GB scene
# upload over the dev tunnel; the real compile is ~12 s, see
# benchmarks/experiments/aot_compile_test.py).
_REC_CONDS = os.environ.get("PTX_REC_CONDS", "auto")
_REC_CONDS_SHADOW = os.environ.get("PTX_REC_CONDS_SHADOW", "auto")
# Half-record gating: block-level scalar cond per sublane-aligned record
# half against per-half AABBs packed in the record's free lanes
# (kernel_traverse._write_half_bounds). "0" until the full-scale A/B
# lands a verdict.
_REC_HALVES = os.environ.get("PTX_REC_HALVES", "0")


def _conds_policy(flag: str, rec) -> bool:
    """Resolve a row-cond knob ("auto"/"0"/"1") for a record table."""
    if flag == "auto":
        rows = rec.shape[1] if rec.ndim == 3 else REC_LANES
        return rows >= 128
    return flag == "1"


def _shadow_conds(rec) -> bool:
    return _conds_policy(_REC_CONDS_SHADOW, rec)


def _nearest_conds(rec) -> bool:
    return _conds_policy(_REC_CONDS, rec)


def _rec_halves(rec) -> bool:
    return _conds_policy(_REC_HALVES, rec)
# Comma-separated kernel-body ablations for perf bisection (profiling only):
# "nee" drops next-event estimation, "bigpair" drops the big-partition pair
# tests, "prop" replaces BSDF sampling with straight-through propagation,
# "mat" skips the material gather.
_ABLATE = frozenset(
    x for x in os.environ.get("PTX_ABLATE", "").split(",") if x
)


# Path-state tuple order, shared by the while-loop megakernel's carry and
# the single-bounce kernel's IO (trace_megakernel_sorted): rng rides as
# uint32; masks ride as f32 (Mosaic cannot carry i1 vectors through scf).
STATE_FIELDS = (
    "rng", "ox", "oy", "oz", "dx", "dy", "dz",
    "sr", "sg", "sb", "out_r", "out_g", "out_b",
    "divisor", "bounce_pd", "contrib_unw", "collected_f", "alive_f",
)
N_STATE = len(STATE_FIELDS)


def n_diff_records(n_lights: int, em_k: int) -> int:
    """Channel count of the differentiable-replay records
    (integrator/diff_megakernel.py): [mid, emission-weight W, chain-sel]
    + one NEE weight per point light + (CDF row, NEE weight) per
    emissive draw."""
    return 3 + n_lights + 2 * em_k


def _make_megakernel(n_tri, n_sph, n_mat, n_lights, n_em, em_k, max_depth,
                     epsilon, n_super=0, debug_visits=False,
                     single_bounce=False, dense_pair=False,
                     clb_vmem=False, cull_mode=-1, big_cull_mode=-1,
                     diff_records=False):
    """n_super > 0 adds the in-kernel cluster traversal (large meshes): the
    kernel then takes four extra inputs (supercluster VMEM bounds, cluster
    bounds pages, cluster records, big-partition pair record) and four
    scratch refs. On this path the dense-triangle work is PAIRWISE too:
    the big partition (walls/emitters) rides a single always-tested pair
    record instead of a serial SMEM fori loop — per-iteration scalar loads
    measured ~0.7 us/ray/bounce in stalls (accel/kernel_traverse.py).

    `single_bounce` builds the sorted-wavefront step kernel instead: IO is
    the full N_STATE path state (in and out), the bounce depth rides in
    seed_ref[1], and the body runs ONCE (the driver sorts rays by
    coherence key between bounces — integrator/sorted_wavefront.py)."""

    def kernel(seed_ref, tri_ref, sph_ref, mat_ref, lgt_ref, em_ref,
               *rest):
        vis_ref = None
        pos = 0
        if n_super:
            sup_ref, hyp_ref, clb_hbm, rec_hbm, bigp_ref = rest[pos:pos + 5]
            pos += 5
        elif dense_pair:
            bigp_ref = rest[pos]
            pos += 1
        if n_super or dense_pair:
            bigp_col = lambda i: bigp_ref[:, i:i + 1]
        if single_bounce:
            st_in = rest[pos:pos + N_STATE]
            pos += N_STATE
            st_out = rest[pos:pos + N_STATE]
            pos += N_STATE
            if debug_visits:
                vis_out = rest[pos]
                pos += 1
            if diff_records:
                n_drec = n_diff_records(n_lights, em_k)
                drec_out = rest[pos:pos + n_drec]
                pos += n_drec
            shp = st_in[1].shape
        else:
            (ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref) = rest[
                pos:pos + 6
            ]
            pos += 6
            (r_out, g_out, b_out, coll_out) = rest[pos:pos + 4]
            pos += 4
            if debug_visits:
                vis_out = rest[pos]
                pos += 1
            shp = ox_ref.shape
        if n_super:
            (scr_c, scr2, scr_eh, scr_es, scr_ec, scr_m, scr_ef,
             sem_c, sem2) = rest[pos:pos + 9]
            pos += 9
        if debug_visits:
            vis_ref = rest[pos]
            pos += 1
            for c in range(4):
                vis_ref[c] = 0
        assert pos == len(rest), (pos, len(rest))
        pid = pl.program_id(0)
        rng0 = _seed_rng(seed_ref[0] + pid * jnp.int32(1000003), shp)

        def body(depth, st, drec=None):
            # Masks ride the carry as f32 (Mosaic cannot carry i1 vectors
            # through scf.for). `drec` (diff_records mode, single_bounce
            # only): a dict this body fills with the differentiable-replay
            # record vectors — see integrator/diff_megakernel.py for the
            # replay contract.
            (rng, ox, oy, oz, dx, dy, dz,
             sr, sg, sb, out_r, out_g, out_b,
             divisor, bounce_pd, contrib_unw, collected_f, alive_f) = st
            collected = collected_f > 0.5
            alive = alive_f > 0.5

            if n_super or dense_pair:
                # Binned or dense-pair scene: spheres via the (tiny) SMEM
                # loop, the dense triangle set via one always-tested pair
                # record, a clustered mesh (binned only) via the tiered
                # traversal. Prim ids mix table space (spheres) and global
                # space (triangles) — only `>= 0` (hit) is consumed, so
                # mixing is benign.
                bt, bp, nx, ny, nz, mid = _intersect_tables(
                    tri_ref, sph_ref, 0, n_sph, ox, oy, oz, dx, dy, dz, True
                )
                if "bigpair" not in _ABLATE:
                    mxr, myr, mzr = _moment(ox, oy, oz, dx, dy, dz)
                    bt, bp, nx, ny, nz, mid = pair_test_nearest(
                        bigp_col, ox, oy, oz, dx, dy, dz, mxr, myr, mzr,
                        (bt, bp, nx, ny, nz, mid), want_normal_mat=True,
                        use_conds=False, cull_mode=big_cull_mode,
                    )
            else:
                bt, bp, nx, ny, nz, mid = _intersect_tables(
                    tri_ref, sph_ref, n_tri, n_sph,
                    ox, oy, oz, dx, dy, dz, True,
                )
            if n_super and not _SKIP_TRAVERSE:
                bt, bp, nx, ny, nz, mid = traverse_clusters(
                    sup_ref, hyp_ref, clb_hbm, rec_hbm, scr_c, scr2,
                    scr_eh, scr_es, scr_ec, scr_m, scr_ef, sem_c, sem2,
                    ox, oy, oz, dx, dy, dz,
                    bt, bp, nx, ny, nz, mid,
                    n_super=n_super,
                    want_normal_mat=True, active=alive_f,
                    visit_ref=vis_ref, rec_conds=_nearest_conds(rec_hbm),
                    rec_halves=_rec_halves(rec_hbm),
                    clb_resident=clb_vmem, cull_mode=cull_mode,
                )
            hit = alive & (bp >= 0)
            collected = collected | hit
            t_hit = jnp.where(bp >= 0, bt, 0.0)
            pxp = ox + dx * t_hit
            pyp = oy + dy * t_hit
            pzp = oz + dz * t_hit

            if "mat" in _ABLATE:
                zs, os_ = jnp.zeros(shp, jnp.float32), jnp.ones(shp, jnp.float32)
                (md_r, md_g, md_b, ms_r, ms_g, ms_b, ior,
                 me_r, me_g, me_b, bsdf, one_way_f) = (
                    os_ * 0.5, os_ * 0.5, os_ * 0.5, zs, zs, zs, os_ * 1.5,
                    zs + 0.05, zs + 0.05, zs + 0.05, zs, zs)
            else:
                (md_r, md_g, md_b, ms_r, ms_g, ms_b, ior,
                 me_r, me_g, me_b, bsdf, one_way_f) = _gather_mat_all(
                    mat_ref, mid, n_mat
                )
            one_way = one_way_f > 0.5
            is_glass = bsdf == jnp.float32(BSDF_GLASS)
            is_mirror = bsdf == jnp.float32(BSDF_MIRROR)
            is_spec = is_glass | is_mirror

            weight = 1.0 / (divisor * bounce_pd)
            out_r = out_r + jnp.where(hit, sr * me_r * weight, 0.0)
            out_g = out_g + jnp.where(hit, sg * me_g * weight, 0.0)
            out_b = out_b + jnp.where(hit, sb * me_b * weight, 0.0)
            if drec is not None:
                drec["mid"] = jnp.where(hit, mid.astype(jnp.float32), -1.0)
                drec["W"] = jnp.where(hit, weight, 0.0)
                drec["pl_w"] = []
                drec["em"] = []

            # Russian roulette (ref: worker.cpp:67-70); depth is scalar.
            mean_s = (sr + sg + sb) / 3.0
            bpv = jnp.where(
                depth + 1 <= 4,
                jnp.float32(1.0),
                0.1 + 0.1 * jnp.minimum(contrib_unw * mean_s, 1.0),
            )
            rng, u_rt = _next_u01(rng)
            do_bounce = u_rt < bpv

            # ---- Next-event estimation ----------------------------------
            def shadow_setup(lx, ly, lz, lpd, lvalid):
                """Shadow-ray geometry + dense-table/big-partition
                occlusion. Returns (shadow origin+dir, visible-so-far,
                t_lim for the cluster tier — 0 where irrelevant)."""
                tlx = lx - pxp
                tly = ly - pyp
                tlz = lz - pzp
                dist2 = tlx * tlx + tly * tly + tlz * tlz
                dist = jnp.sqrt(dist2)
                inv = 1.0 / jnp.maximum(dist, 1e-30)
                ldx, ldy, ldz = tlx * inv, tly * inv, tlz * inv
                sox = pxp + ldx * epsilon
                soy = pyp + ldy * epsilon
                soz = pzp + ldz * epsilon
                st_t, st_p = _intersect_tables(
                    tri_ref, sph_ref,
                    0 if (n_super or dense_pair) else n_tri, n_sph,
                    sox, soy, soz, ldx, ldy, ldz, False,
                )
                lt = jnp.where(st_p >= 0, st_t, -1.0)
                visible = (lt < 0.0) | (lt >= dist - epsilon)
                if (n_super or dense_pair) and "bigpair" not in _ABLATE:
                    # Big-partition occlusion, pairwise.
                    smx, smy, smz = _moment(sox, soy, soz, ldx, ldy, ldz)
                    occ_big = pair_test_anyhit(
                        bigp_col, sox, soy, soz, ldx, ldy, ldz,
                        smx, smy, smz,
                        jnp.maximum(dist - epsilon, 0.0),
                        jnp.zeros(shp, jnp.float32),
                        use_conds=False, cull_mode=big_cull_mode,
                    )
                    visible = visible & ~(occ_big > 0.5)
                relevant = hit & lvalid & (~is_spec) & (lpd > 0.0)
                t_lim = jnp.where(relevant & visible, dist - epsilon, 0.0)
                return sox, soy, soz, ldx, ldy, ldz, visible, t_lim

            def nee_finish(ldx, ldy, ldz, visible, ls_r, ls_g, ls_b,
                           lpd, lvalid, out_r, out_g, out_b):
                # Lambertian eval (specular: synthetic pdf 0 -> skip).
                # Also returns the light's detached weight `w` for the
                # differentiable-replay records.
                cos_s = jnp.maximum(nx * ldx + ny * ldy + nz * ldz, 0.0)
                shade = cos_s / _PI
                use = hit & lvalid & visible & (~is_spec) & (lpd > 0.0)
                w = jnp.where(use, shade / (divisor * bounce_pd * lpd), 0.0)
                out_r = out_r + w * md_r * ls_r * sr
                out_g = out_g + w * md_g * ls_g * sg
                out_b = out_b + w * md_b * ls_b * sb
                return out_r, out_g, out_b, w

            def nee_accumulate(lx, ly, lz, ls_r, ls_g, ls_b, lpd, lvalid,
                               out_r, out_g, out_b):
                (sox, soy, soz, ldx, ldy, ldz,
                 visible, t_lim) = shadow_setup(lx, ly, lz, lpd, lvalid)
                if n_super and not _SKIP_TRAVERSE:
                    # Cluster-set occlusion for lanes the dense tables left
                    # visible; inactive lanes carry t_lim = 0.
                    occ = traverse_clusters_anyhit(
                        sup_ref, hyp_ref, clb_hbm, rec_hbm, scr_c, scr2,
                        scr_eh, scr_es, scr_ec, scr_m, scr_ef, sem_c, sem2,
                        sox, soy, soz, ldx, ldy, ldz,
                        t_lim, jnp.zeros(shp, jnp.float32),
                        n_super=n_super,
                        visit_ref=vis_ref, rec_conds=_shadow_conds(rec_hbm),
                        rec_halves=_rec_halves(rec_hbm),
                        clb_resident=clb_vmem, cull_mode=cull_mode,
                    )
                    visible = visible & ~occ
                return nee_finish(ldx, ldy, ldz, visible, ls_r, ls_g, ls_b,
                                  lpd, lvalid, out_r, out_g, out_b)

            def point_light(li, acc):
                out_r, out_g, out_b = acc
                out_r, out_g, out_b, w = nee_accumulate(
                    lgt_ref[li, 0], lgt_ref[li, 1], lgt_ref[li, 2],
                    lgt_ref[li, 3], lgt_ref[li, 4], lgt_ref[li, 5],
                    jnp.float32(1.0), jnp.full(shp, True),
                    out_r, out_g, out_b,
                )
                if drec is not None:
                    drec["pl_w"].append(w)
                return out_r, out_g, out_b

            if "nee" not in _ABLATE:
                if drec is not None:
                    # Unrolled so each point light's weight lands in its
                    # own record channel (n_lights is small and static).
                    for li in range(n_lights):
                        out_r, out_g, out_b = point_light(
                            li, (out_r, out_g, out_b)
                        )
                else:
                    out_r, out_g, out_b = jax.lax.fori_loop(
                        0, n_lights, point_light, (out_r, out_g, out_b)
                    )

            em_draws = []
            for _ in range(0 if "nee" in _ABLATE else em_k):
                rng, rsel = _next_u01(rng)
                rng, u1 = _next_u01(rng)
                rng, u2 = _next_u01(rng)

                # CDF selection (lower_bound semantics, ref: scene.cpp:238-257)
                # as a descending fori over the packed emissive rows.
                def cdf_body(i, sel):
                    e = n_em - 1 - i
                    return jnp.where(rsel <= em_ref[e, 0], e, sel)

                sel = jax.lax.fori_loop(
                    0, n_em, cdf_body, jnp.full(shp, n_em - 1, jnp.int32)
                )

                # Fetch the selected row's pre-resolved sample data by
                # masked selects — one O(E) pass, no triangle/material scan.
                sq = jnp.sqrt(u1)
                w1 = 1.0 - sq
                w2 = sq * (1.0 - u2)
                w3 = sq * u2
                # Uniform sphere point (ref: object.cpp:101-116).
                theta = 2.0 * _PI * u1
                cphi = 1.0 - 2.0 * u2
                sphi = jnp.sqrt(jnp.maximum(1.0 - cphi * cphi, 0.0))
                ux_s = sphi * jnp.cos(theta)
                uy_s = sphi * jnp.sin(theta)
                uz_s = cphi

                def em_body(e, st):
                    # cullm rides as f32: Mosaic cannot carry i1 vectors
                    # through scf.for.
                    (spx, spy, spz, snx_, sny_, snz_, s_pd,
                     e_r, e_g, e_b, cullm_f) = st
                    on = sel == e
                    is_sph = em_ref[e, 2] > 0.5
                    v0x, v0y, v0z = em_ref[e, 3], em_ref[e, 4], em_ref[e, 5]
                    e1x, e1y, e1z = em_ref[e, 6], em_ref[e, 7], em_ref[e, 8]
                    e2x, e2y, e2z = em_ref[e, 9], em_ref[e, 10], em_ref[e, 11]
                    # Triangle: sqrt-warp sample + face normal
                    # (ref: object.cpp:192-207). Sphere: v0 = center,
                    # e1x = radius, normal = unit sample direction.
                    r_s = e1x
                    cx = jnp.where(
                        is_sph, v0x + r_s * ux_s,
                        v0x + w2 * e1x + w3 * e2x,
                    )
                    cy = jnp.where(
                        is_sph, v0y + r_s * uy_s,
                        v0y + w2 * e1y + w3 * e2y,
                    )
                    cz = jnp.where(
                        is_sph, v0z + r_s * uz_s,
                        v0z + w2 * e1z + w3 * e2z,
                    )
                    fnx = jnp.where(is_sph, ux_s, em_ref[e, 12])
                    fny = jnp.where(is_sph, uy_s, em_ref[e, 13])
                    fnz = jnp.where(is_sph, uz_s, em_ref[e, 14])
                    spx = jnp.where(on, cx, spx)
                    spy = jnp.where(on, cy, spy)
                    spz = jnp.where(on, cz, spz)
                    snx_ = jnp.where(on, fnx, snx_)
                    sny_ = jnp.where(on, fny, sny_)
                    snz_ = jnp.where(on, fnz, snz_)
                    s_pd = jnp.where(on, em_ref[e, 1] * em_ref[e, 15], s_pd)
                    cullm_f = jnp.where(
                        on & (em_ref[e, 16] > 0.5), 1.0, cullm_f
                    )
                    e_r = jnp.where(on, em_ref[e, 17], e_r)
                    e_g = jnp.where(on, em_ref[e, 18], e_g)
                    e_b = jnp.where(on, em_ref[e, 19], e_b)
                    return (spx, spy, spz, snx_, sny_, snz_, s_pd,
                            e_r, e_g, e_b, cullm_f)

                st0 = (
                    jnp.zeros(shp, jnp.float32), jnp.zeros(shp, jnp.float32),
                    jnp.zeros(shp, jnp.float32), jnp.zeros(shp, jnp.float32),
                    jnp.ones(shp, jnp.float32), jnp.zeros(shp, jnp.float32),
                    jnp.ones(shp, jnp.float32), jnp.zeros(shp, jnp.float32),
                    jnp.zeros(shp, jnp.float32), jnp.zeros(shp, jnp.float32),
                    jnp.zeros(shp, jnp.float32),
                )
                (spx, spy, spz, snx_, sny_, snz_, s_pd,
                 e_r, e_g, e_b, cullm_f) = jax.lax.fori_loop(
                    0, n_em, em_body, st0
                )
                cullm = cullm_f > 0.5
                # Area -> solid angle conversion (ref: scene.cpp:280).
                tlx = spx - pxp
                tly = spy - pyp
                tlz = spz - pzp
                dist2 = tlx * tlx + tly * tly + tlz * tlz
                invd = jax.lax.rsqrt(jnp.maximum(dist2, 1e-30))
                ldx, ldy, ldz = tlx * invd, tly * invd, tlz * invd
                adot = jnp.abs(-(ldx * snx_ + ldy * sny_ + ldz * snz_))
                lvalid = (adot > 0.0) & (dist2 > 0.0)
                lvalid = lvalid & (
                    (~cullm) | ((ldx * snx_ + ldy * sny_ + ldz * snz_) < 0.0)
                )
                lpd = s_pd * dist2 / jnp.maximum(adot, 1e-30)
                if n_super and not _SKIP_TRAVERSE:
                    # Defer: all em_k draws share ONE merged cluster
                    # occlusion query below (the sup/cluster tier scans
                    # amortize over em_k * rows shadow rows, and records
                    # both draws need are fetched once).
                    em_draws.append((spx, spy, spz, e_r, e_g, e_b,
                                     lpd, lvalid, sel))
                else:
                    out_r, out_g, out_b, w_em = nee_accumulate(
                        spx, spy, spz, e_r, e_g, e_b, lpd, lvalid,
                        out_r, out_g, out_b,
                    )
                    if drec is not None:
                        drec["em"].append((sel.astype(jnp.float32), w_em))

            if em_draws:
                sh = [shadow_setup(d[0], d[1], d[2], d[6], d[7])
                      for d in em_draws]
                cat = lambda i: jnp.concatenate([s[i] for s in sh], axis=0)
                occ_all = traverse_clusters_anyhit(
                    sup_ref, hyp_ref, clb_hbm, rec_hbm, scr_c, scr2,
                    scr_eh, scr_es, scr_ec, scr_m, scr_ef, sem_c, sem2,
                    cat(0), cat(1), cat(2), cat(3), cat(4), cat(5),
                    cat(7), jnp.zeros((len(sh) * shp[0], shp[1]),
                                      jnp.float32),
                    n_super=n_super,
                    visit_ref=vis_ref, rec_conds=_shadow_conds(rec_hbm),
                    rec_halves=_rec_halves(rec_hbm),
                    clb_resident=clb_vmem, cull_mode=cull_mode,
                )
                r0 = shp[0]
                for k, (d, s) in enumerate(zip(em_draws, sh)):
                    occ_k = occ_all[k * r0:(k + 1) * r0]
                    out_r, out_g, out_b, w_em = nee_finish(
                        s[3], s[4], s[5], s[6] & ~occ_k,
                        d[3], d[4], d[5], d[6], d[7],
                        out_r, out_g, out_b,
                    )
                    if drec is not None:
                        drec["em"].append((d[8].astype(jnp.float32), w_em))

            # Roulette bookkeeping (ref: worker.cpp:106-110).
            bounce_pd = jnp.where(
                hit,
                jnp.where(do_bounce, bounce_pd * bpv, bounce_pd * (1.0 - bpv)),
                bounce_pd,
            )
            cont = hit & do_bounce & (bounce_pd > _PD_CUTOFF)

            # ---- Propagate (ref: propagation.cpp) -----------------------
            rng, u1 = _next_u01(rng)
            rng, u2 = _next_u01(rng)
            rng, ub = _next_u01(rng)

            # Lambertian cosine sample.
            fac = jnp.sqrt(jnp.maximum(1.0 - u2, 0.0))
            cos_t = jnp.sqrt(u2)
            ang = 2.0 * _PI * u1
            lx_t = fac * jnp.cos(ang)
            ly_t = fac * jnp.sin(ang)
            p_lam = 2.0 * cos_t / (2.0 * _PI)
            b1x, b1y, b1z, b2x, b2y, b2z = _tangent_frame(nx, ny, nz)
            ldx_l = b1x * lx_t + b2x * ly_t + nx * cos_t
            ldy_l = b1y * lx_t + b2y * ly_t + ny * cos_t
            ldz_l = b1z * lx_t + b2z * ly_t + nz * cos_t

            # Glass (Fresnel unpolarized; ref: propagation.cpp:64-160).
            ray_dot = -(dx * nx + dy * ny + dz * nz)
            entering = ray_dot >= 0.0
            ri_l = jnp.where(entering, 1.0, ior)
            ri_e = jnp.where(entering, ior, 1.0)
            adot = jnp.abs(ray_dot)
            sin_i = jnp.sqrt(jnp.maximum(1.0 - adot * adot, 0.0))
            sin_t = ri_l / ri_e * sin_i
            tir = sin_t >= 1.0
            cos_tt = jnp.sqrt(jnp.maximum(1.0 - sin_t * sin_t, 0.0))
            r_par = (ri_e * adot - ri_l * cos_tt) / (ri_e * adot + ri_l * cos_tt)
            r_perp = (ri_l * adot - ri_e * cos_tt) / (ri_l * adot + ri_e * cos_tt)
            rat = jnp.where(tir, 1.0, (r_par * r_par + r_perp * r_perp) * 0.5)
            cos_tt = jnp.where(tir, 0.0, cos_tt)
            refl = ub < rat
            sgn = jnp.where(ray_dot < 0.0, -1.0, 1.0)
            # reflect about n*sgn
            ddn = dx * nx * sgn + dy * ny * sgn + dz * nz * sgn
            rx = dx - 2.0 * ddn * nx * sgn
            ry = dy - 2.0 * ddn * ny * sgn
            rz = dz - 2.0 * ddn * nz * sgn
            ratio = ri_l / ri_e
            fx = dx * ratio + nx * (ratio * adot - cos_tt) * sgn
            fy = dy * ratio + ny * (ratio * adot - cos_tt) * sgn
            fz = dz * ratio + nz * (ratio * adot - cos_tt) * sgn
            invf = jax.lax.rsqrt(fx * fx + fy * fy + fz * fz + 1e-30)
            fx, fy, fz = fx * invf, fy * invf, fz * invf
            gdx = jnp.where(refl, rx, fx)
            gdy = jnp.where(refl, ry, fy)
            gdz = jnp.where(refl, rz, fz)
            ri_fac = (ri_e * ri_e) / (ri_l * ri_l)
            fac_glass = jnp.where(refl, rat, ri_fac * (1.0 - rat))
            p_glass = jnp.where(refl, rat, 1.0 - rat)

            # Mirror (ref: propagation.cpp:180-204).
            unaligned = (dx * nx + dy * ny + dz * nz) > 0.0
            pass_through = one_way & unaligned
            flip = (~one_way) & unaligned
            msgn = jnp.where(flip, -1.0, 1.0)
            mdn = dx * nx * msgn + dy * ny * msgn + dz * nz * msgn
            mx = jnp.where(pass_through, dx, dx - 2.0 * mdn * nx * msgn)
            my = jnp.where(pass_through, dy, dy - 2.0 * mdn * ny * msgn)
            mz = jnp.where(pass_through, dz, dz - 2.0 * mdn * nz * msgn)

            ndx = jnp.where(is_glass, gdx, jnp.where(is_mirror, mx, ldx_l))
            ndy = jnp.where(is_glass, gdy, jnp.where(is_mirror, my, ldy_l))
            ndz = jnp.where(is_glass, gdz, jnp.where(is_mirror, mz, ldz_l))
            ray_factor = jnp.where(is_glass, fac_glass, 1.0)
            ray_pd = jnp.where(is_glass, p_glass, jnp.where(is_mirror, 1.0, p_lam))

            # Bounce eval (non-synthetic getSpectrum).
            cos_n = jnp.maximum(nx * ndx + ny * ndy + nz * ndz, 0.0)
            shade_l = cos_n / _PI
            same_side = (dx * ndx + dy * ndy + dz * ndz) <= 0.0
            gl_r = jnp.where(same_side, ms_r, md_r)
            gl_g = jnp.where(same_side, ms_g, md_g)
            gl_b = jnp.where(same_side, ms_b, md_b)
            mm = (~one_way) | same_side
            mi_r = jnp.where(mm, ms_r, 1.0)
            mi_g = jnp.where(mm, ms_g, 1.0)
            mi_b = jnp.where(mm, ms_b, 1.0)
            mult_r = jnp.where(is_glass, gl_r, jnp.where(is_mirror, mi_r, md_r))
            mult_g = jnp.where(is_glass, gl_g, jnp.where(is_mirror, mi_g, md_g))
            mult_b = jnp.where(is_glass, gl_b, jnp.where(is_mirror, mi_b, md_b))
            shading = jnp.where(is_spec, 1.0, shade_l)
            shading_pd = jnp.float32(1.0)
            if "prop" in _ABLATE:
                # Override the sampled bounce with straight-through rays —
                # the unused sampling math above is dead-code-eliminated.
                ndx = jnp.where(u1 > 0.5, dx, -dx)
                ndy, ndz = dy, dz
                ray_factor = jnp.ones(shp, jnp.float32)
                ray_pd = jnp.ones(shp, jnp.float32)
                mult_r, mult_g, mult_b = md_r, md_g, md_b
                shading = jnp.ones(shp, jnp.float32)

            divisor_new = divisor * (ray_pd / jnp.maximum(ray_factor, 1e-30)) * (
                shading_pd / jnp.maximum(shading, 1e-30)
            )
            divisor = jnp.where(cont, divisor_new, divisor)
            contrib_unw = jnp.where(
                cont, contrib_unw * ray_factor * shading, contrib_unw
            )
            sr = jnp.where(cont, mult_r * sr, sr)
            sg = jnp.where(cont, mult_g * sg, sg)
            sb = jnp.where(cont, mult_b * sb, sb)
            if drec is not None:
                # Chain-advance selector (replay applies the matching
                # material color to its running spectrum product):
                # 0 = no advance, 1 = diffuse, 2 = specular, 3 = ones.
                code = jnp.where(
                    is_glass,
                    jnp.where(same_side, 2.0, 1.0),
                    jnp.where(
                        is_mirror, jnp.where(mm, 2.0, 3.0), 1.0
                    ),
                )
                drec["sel"] = jnp.where(cont, code, 0.0)

            alive = cont & (divisor > _PD_CUTOFF)
            ox = jnp.where(alive, pxp + ndx * epsilon, ox)
            oy = jnp.where(alive, pyp + ndy * epsilon, oy)
            oz = jnp.where(alive, pzp + ndz * epsilon, oz)
            dx = jnp.where(alive, ndx, dx)
            dy = jnp.where(alive, ndy, dy)
            dz = jnp.where(alive, ndz, dz)

            return (rng, ox, oy, oz, dx, dy, dz, sr, sg, sb,
                    out_r, out_g, out_b,
                    divisor, bounce_pd, contrib_unw,
                    jnp.where(collected, 1.0, 0.0),
                    jnp.where(alive, 1.0, 0.0))

        if single_bounce:
            # One bounce over externally-carried state; skip fully dead
            # blocks (the driver sorts dead rays to the tail, so whole
            # blocks go dead as paths terminate).
            st = tuple(r[:] for r in st_in)
            depth = seed_ref[1]
            if diff_records:
                assert not _ABLATE, "diff records with PTX_ABLATE set"
                zero = jnp.zeros(st[1].shape, jnp.float32)

                def run(s):
                    dr = {}
                    out = body(depth, s, drec=dr)
                    flat = (
                        [dr["mid"], dr["W"], dr["sel"]]
                        + dr["pl_w"]
                        + [x for pair in dr["em"] for x in pair]
                    )
                    return out + tuple(flat)

                def skip(s):
                    # Dead block: mid = -1, every weight 0, sel 0 = the
                    # replay's no-contribution encoding.
                    n_drec = n_diff_records(n_lights, em_k)
                    return s + tuple(
                        [zero - 1.0] + [zero] * (n_drec - 1)
                    )

                res = jax.lax.cond(
                    jnp.max(st[17]) > 0.5, run, skip, st
                )
                st = res[:N_STATE]
                for r, v in zip(drec_out, res[N_STATE:]):
                    r[:] = v
            else:
                st = jax.lax.cond(
                    jnp.max(st[17]) > 0.5, lambda s: body(depth, s),
                    lambda s: s, st,
                )
            for r, v in zip(st_out, st):
                r[:] = v
            if vis_ref is not None:
                for c in range(4):
                    vis_out[pl.program_id(0), c] = vis_ref[c]
            return

        ones = jnp.ones(shp, jnp.float32)
        zeros = jnp.zeros(shp, jnp.float32)
        st = (rng0, ox_ref[:], oy_ref[:], oz_ref[:],
              dx_ref[:], dy_ref[:], dz_ref[:],
              ones, ones, ones, zeros, zeros, zeros,
              ones, ones, ones, zeros, ones)

        # Early exit once every lane in the block is dead: the roulette
        # kills most paths by depth ~6, so running all max_depth iterations
        # wastes ~4x (the reference's unbounded loop exits per ray;
        # the block-wide any() is the SIMD analog).
        def cond(carry):
            depth, st = carry
            # st[17] is alive_f (st[16] is collected_f).
            return (depth < max_depth) & (jnp.max(st[17]) > 0.5)

        def wbody(carry):
            depth, st = carry
            return depth + 1, body(depth, st)

        _, st = jax.lax.while_loop(cond, wbody, (jnp.int32(0), st))

        r_out[:] = st[10]
        g_out[:] = st[11]
        b_out[:] = st[12]
        coll_out[:] = st[16]
        if vis_ref is not None:
            for c in range(4):
                vis_out[pl.program_id(0), c] = vis_ref[c]

    return kernel


def megakernel_supported(scene: SceneData) -> bool:
    """Static (trace-safe) check: the SMEM tables fit. Emissive spheres and
    triangles are both supported. Binned scenes route the large-mesh
    partition through the in-kernel cluster traversal; only the dense
    (big-triangle) partition must fit the tables then."""
    if scene.has_kernel_records:
        return (
            # The big partition rides ONE always-tested pair record.
            scene.big_v0.shape[0] <= REC_LANES
            and scene.sph_center.shape[0] <= _MAX_SPH
            and scene.emissive_cdf.shape[0] <= _MAX_EM
            and scene.krn_cl_bounds.shape[0] <= _MAX_SUP
            # Emissive prims must live in the dense partition: the NEE
            # table resolves their geometry from the dense rows, and
            # keeping emitters out of the cluster set spares shadow rays
            # a cluster descent that ends just short of the light.
            and scene.emissive_in_dense
        )
    return (
        scene.tri_v0.shape[0] <= _MAX_TRI
        and scene.sph_center.shape[0] <= _MAX_SPH
        and scene.emissive_cdf.shape[0] <= _MAX_EM
    )


def _pack_tables(scene: SceneData):
    """jnp packing of the SMEM tables — trace-safe (XLA hoists the tiny
    assembly when the scene is a constant and fuses it when traced)."""
    f32 = jnp.float32
    if scene.has_kernel_records:
        # Binned scene: the dense table holds only the big-triangle
        # partition (walls/planes/emitters); the clustered mesh rides the
        # krn_* tiers through the in-kernel traversal.
        idx = jnp.maximum(scene.big_prim, 0)
        tri_v0 = scene.big_v0
        tri_e1 = scene.big_v1 - tri_v0
        tri_e2 = scene.big_v2 - tri_v0
        tri_cull = scene.big_cull
        tri_valid = scene.big_prim >= 0
        tri_n0 = scene.tri_n0[idx]
        tri_n1 = scene.tri_n1[idx]
        tri_n2 = scene.tri_n2[idx]
        tri_mat = scene.tri_material[idx]
    else:
        tri_v0 = scene.tri_v0
        tri_e1 = scene.tri_v1 - tri_v0
        tri_e2 = scene.tri_v2 - tri_v0
        tri_cull = scene.tri_cull
        tri_valid = scene.tri_valid
        tri_n0, tri_n1, tri_n2 = scene.tri_n0, scene.tri_n1, scene.tri_n2
        tri_mat = scene.tri_material
    n_rows = tri_v0.shape[0]
    tri = jnp.concatenate(
        [
            tri_v0,
            tri_e1,
            tri_e2,
            tri_cull.astype(f32)[:, None],
            tri_valid.astype(f32)[:, None],
            tri_n0, tri_n1, tri_n2,
            tri_mat.astype(f32)[:, None],
            jnp.zeros((n_rows, _TRI_COLS - 21), f32),
        ],
        axis=1,
    )
    s_rows = scene.sph_center.shape[0]
    sph = jnp.concatenate(
        [
            scene.sph_center,
            scene.sph_radius[:, None],
            scene.sph_valid.astype(f32)[:, None],
            scene.sph_material.astype(f32)[:, None],
            jnp.zeros((s_rows, _SPH_COLS - 6), f32),
        ],
        axis=1,
    )
    m_rows = scene.num_materials
    mat = jnp.concatenate(
        [
            scene.mat_diffuse[:, :3],
            scene.mat_specular[:, :3],
            scene.mat_ior[:, None],
            scene.mat_emission[:, :3],
            scene.mat_bsdf.astype(f32)[:, None],
            scene.mat_one_way.astype(f32)[:, None],
        ],
        axis=1,
    )
    l_rows = scene.light_pos.shape[0]
    lgt = jnp.concatenate(
        [
            scene.light_pos,
            scene.light_spectrum[:, :3],
            jnp.zeros((l_rows, _LGT_COLS - 6), f32),
        ],
        axis=1,
    )
    # Emissive rows fully pre-resolved (geometry, pdf, emission) so the
    # in-kernel NEE pass is a single O(E) fori, independent of scene size.
    cdf = scene.emissive_cdf
    e_rows = cdf.shape[0]
    prob = jnp.diff(jnp.concatenate([jnp.zeros(1, f32), cdf]))
    prim = scene.emissive_prim
    is_sph = prim >= scene.n_tri
    ti = jnp.clip(prim, 0, scene.tri_v0.shape[0] - 1)
    si = jnp.clip(prim - scene.n_tri, 0, scene.sph_center.shape[0] - 1)
    v0 = jnp.where(is_sph[:, None], scene.sph_center[si], scene.tri_v0[ti])
    e1t = scene.tri_v1[ti] - scene.tri_v0[ti]
    e2t = scene.tri_v2[ti] - scene.tri_v0[ti]
    e1 = jnp.where(
        is_sph[:, None],
        jnp.stack([scene.sph_radius[si]] + [jnp.zeros(e_rows, f32)] * 2, -1),
        e1t,
    )
    e2 = jnp.where(is_sph[:, None], 0.0, e2t)
    fn = jnp.cross(e1t, e2t)
    area2 = jnp.sqrt(jnp.sum(fn * fn, axis=-1))
    fn = fn / jnp.maximum(area2, 1e-30)[:, None]
    pd_area = jnp.where(
        is_sph,
        1.0 / jnp.maximum(
            4.0 * _PI * scene.sph_radius[si] ** 2, 1e-30
        ),
        1.0 / jnp.maximum(area2 * 0.5, 1e-30),
    )
    cull = jnp.where(is_sph, False, scene.tri_cull[ti])
    mid = jnp.where(is_sph, scene.sph_material[si], scene.tri_material[ti])
    emission = scene.mat_emission[mid][:, :3]
    em = jnp.concatenate(
        [
            cdf[:, None],
            (prob * float(scene.emissive_sample_count))[:, None],
            is_sph.astype(f32)[:, None],
            v0, e1, e2, fn,
            pd_area[:, None],
            cull.astype(f32)[:, None],
            emission,
            jnp.zeros((e_rows, _EM_COLS - 20), f32),
        ],
        axis=1,
    )
    return tri, sph, mat, lgt, em


@functools.partial(
    jax.jit,
    static_argnames=("n_tri", "n_sph", "n_mat", "n_lights", "n_em", "em_k",
                     "max_depth", "epsilon", "n_super",
                     "block_rows", "debug_visits", "dense_pair",
                     "cull_mode", "big_cull_mode"),
)
def _mega_call(tables, seed, comps, n_tri, n_sph, n_mat, n_lights, n_em,
               em_k, max_depth, epsilon, n_super=0,
               block_rows=_BLOCK_ROWS, debug_visits=False,
               dense_pair=False, cull_mode=-1, big_cull_mode=-1):
    tri, sph, mat, lgt, em, sup, hyp, clb, rec, bigp = tables
    rows = comps[0].shape[0]
    grid = (rows // block_rows,)
    ray_spec = pl.BlockSpec(
        (block_rows, _LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    smem = lambda shape: pl.BlockSpec(
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.SMEM
    )
    debug_visits = bool(debug_visits and n_super)
    clb_vmem = bool(n_super) and clb_fits_vmem(clb)
    kernel = _make_megakernel(
        n_tri, n_sph, n_mat, n_lights, n_em, em_k, max_depth, epsilon,
        n_super=n_super, debug_visits=debug_visits, dense_pair=dense_pair,
        clb_vmem=clb_vmem, cull_mode=cull_mode,
        big_cull_mode=big_cull_mode,
    )
    table_specs = [
        smem((1,)),
        smem(tri.shape), smem(sph.shape), smem(mat.shape),
        smem(lgt.shape), smem(em.shape),
    ]
    table_args = [seed, tri, sph, mat, lgt, em]
    scratch = []
    out_specs = [ray_spec, ray_spec, ray_spec, ray_spec]
    out_shape = [
        jax.ShapeDtypeStruct((rows, _LANES), jnp.float32) for _ in range(4)
    ]
    if dense_pair and not n_super:
        table_specs += [pl.BlockSpec(memory_space=pltpu.VMEM)]
        table_args += [bigp]
    if n_super:
        # Cluster tiers: supercluster bounds + the big-partition pair
        # record resident in VMEM; triangle records stay in HBM and are
        # DMA'd into VMEM scratch on descent (kernel_traverse.py).
        # Cluster-bounds pages are VMEM-resident too when small enough
        # (clb_fits_vmem) — per-descend DMA stalls measured ~10% of
        # dragon frames.
        vmem_full = pl.BlockSpec(memory_space=pltpu.VMEM)
        table_specs += [
            vmem_full,
            vmem_full,
            vmem_full if clb_vmem else pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            vmem_full,
        ]
        table_args += [sup, hyp, clb, rec, bigp]
        # Slab-entry scratch is sized for the tallest query: the merged
        # shadow pass runs em_k * block_rows rows (kernel_traverse.py
        # slices to each query's row count).
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
        if debug_visits:
            # Per-block traversal counters (profiling only):
            # [nearest supercluster descends, nearest record visits,
            #  shadow supercluster descends, shadow record visits].
            # Full-array SMEM block (Mosaic rejects partial SMEM tiles);
            # each grid step writes its own row via program_id.
            out_specs = out_specs + [
                pl.BlockSpec((grid[0], 4), lambda i: (0, 0),
                             memory_space=pltpu.SMEM)
            ]
            out_shape = out_shape + [
                jax.ShapeDtypeStruct((grid[0], 4), jnp.int32)
            ]
            scratch = scratch + [pltpu.SMEM((4,), jnp.int32)]
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=table_specs + [ray_spec] * 6,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        compiler_params=clb_compiler_params(clb, clb_vmem),
    )(*table_args, *comps)


def trace_megakernel(
    scene: SceneData,
    rays,
    options: RenderOptions,
    seed,
    tables=None,
    debug_visits=False,
):
    """Full-path trace of a ray batch via the megakernel.

    rays: Rays with [R,3] origin/direction. seed: int32 scalar (NOT a
    threefry key — the kernel uses the TPU per-core PRNG). Returns
    (spectrum [R,4] with alpha=collected, collected [R] bool); with
    debug_visits (profiling, binned scenes only) additionally a
    [n_blocks, 4] i32 array of traversal counters per ray block
    (nearest sup/rec, shadow sup/rec — see kernel_traverse.py).
    """
    if tables is None:
        tables = _pack_tables(scene)
    if scene.has_kernel_records:
        if scene.big_v0.shape[0] > scene.krn_big_pair.shape[0]:
            # The big partition outgrew the single pair record (> REC_LANES
            # triangles): megakernel_supported is False and the (1,1)
            # placeholder record would be read out of bounds. Fail loudly
            # for direct callers that bypass the dispatch predicate.
            raise ValueError(
                f"megakernel unsupported: {scene.big_v0.shape[0]} dense "
                f"triangles exceed the pair record "
                f"({scene.krn_big_pair.shape[0]} rows)"
            )
        n_super = int(scene.krn_cl_bounds.shape[0])
        n_tri_tbl = int(scene.big_v0.shape[0])
        # Smaller blocks sharpen the per-block cluster culling (a block
        # descends a tier iff ANY of its rays needs it).
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
        block_rows = _BLOCK_ROWS
        z = jnp.zeros((1,), jnp.float32)
        tables = tables + (z, z, z, z, scene.krn_big_pair)
    dense_pair = (not scene.has_kernel_records) and (
        scene.krn_big_pair.shape[0] > 1
    )
    o = rays.origin
    d = rays.direction
    r = o.shape[0]
    block = block_rows * _LANES
    pad = (-r) % block
    if pad:
        o = jnp.concatenate([o, jnp.zeros((pad, 3), o.dtype)])
        d = jnp.concatenate(
            [d, jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]], d.dtype), (pad, 1))]
        )
    rows = (r + pad) // _LANES
    comps = [arr[:, j].reshape(rows, _LANES) for arr in (o, d) for j in range(3)]
    seed_arr = jnp.asarray([seed], jnp.int32)
    outs = _mega_call(
        tables, seed_arr, comps,
        n_tri=n_tri_tbl, n_sph=int(scene.sph_center.shape[0]),
        n_mat=int(scene.num_materials), n_lights=int(scene.n_point_lights),
        n_em=int(scene.n_emissive), em_k=int(scene.emissive_sample_count),
        max_depth=int(options.max_depth), epsilon=float(options.epsilon),
        n_super=n_super, block_rows=block_rows,
        debug_visits=bool(debug_visits and n_super),
        dense_pair=dense_pair, cull_mode=int(scene.krn_cull_mode),
        big_cull_mode=int(scene.krn_big_cull_mode),
    )
    out_r, out_g, out_b, coll = outs[:4]
    coll = coll.reshape(-1)[:r] > 0.5
    spectrum = jnp.stack(
        [
            out_r.reshape(-1)[:r],
            out_g.reshape(-1)[:r],
            out_b.reshape(-1)[:r],
            coll.astype(jnp.float32),
        ],
        axis=-1,
    )
    if debug_visits and n_super:
        return spectrum, coll, outs[4]
    return spectrum, coll
