"""Experimental Pallas cluster-major compute stage for binned traversal.

The round-2 design (docs/DESIGN_large_scenes.md) steps 3-4: after binning
candidate (ray, cluster) pairs by cluster, a grid program per cluster keeps
that cluster's triangle block VMEM-resident and streams its binned rays
through it. Compute layout: 128 rays on lanes x 8 triangles on sublanes per
vector op — one (8, 128) op advances 1024 ray-triangle pairs with no
gathers and no per-triangle scalar reads.

VMEM layout rules learned the hard way (BASELINE.md): any [N, small] array
pads its last dim to 128 lanes (16-32x waste), so the candidate ray table
and outputs are stored transposed ([8, NC] / [1-row, NC]) with candidates
on lanes.

Status: experimental — exact vs the jnp paths (interpret mode + hardware);
wavefront-level integration lands in round 2.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..scene.scene import SceneData
from .binned import bin_candidates, generate_candidates
from ..ops.intersect import intersect_spheres

_TRI_EPS = 1e-6
_RGROUP = 128  # rays per vector-op group (lane count)
_TGROUP = 8    # triangles per step (sublane count)

# Block columns: v0(3) e1(3) e2(3) cull valid prim -> padded row of 16.
_COLS = 16


def pack_blocks(scene: SceneData) -> jnp.ndarray:
    """[C, L, 16] f32 cluster triangle blocks (tris on the sublane axis)."""
    v0 = np.asarray(scene.blk_v0)  # [C, L, 3]
    v1 = np.asarray(scene.blk_v1)
    v2 = np.asarray(scene.blk_v2)
    cull = np.asarray(scene.blk_cull)
    prim = np.asarray(scene.blk_prim)
    # Prim ids ride the kernel as f32: exact only below 2^24. Scenes beyond
    # ~16.7M triangles must use an i32 id path (accel/pallas_traverse.py).
    if prim.max(initial=0) >= 2**24:
        raise ValueError("pallas_binned f32 prim ids require n_tri < 2**24")
    c, l, _ = v0.shape
    out = np.zeros((c, l, _COLS), np.float32)
    out[:, :, 0:3] = v0
    out[:, :, 3:6] = v1 - v0
    out[:, :, 6:9] = v2 - v0
    out[:, :, 9] = cull
    out[:, :, 10] = prim >= 0
    out[:, :, 11] = np.maximum(prim, 0)
    return jnp.asarray(out)


def _cluster_kernel(offs_ref, cnts_ref, blk_ref, rays_ref, t_out, p_out,
                    *, n_tri_groups: int):
    """One program per cluster: stream binned 128-ray groups through the
    VMEM-resident triangle block, 8 tris per vector op."""
    i = pl.program_id(0)
    start = offs_ref[i]
    count = cnts_ref[i]

    n_ray_groups = (count + _RGROUP - 1) // _RGROUP

    def ray_group(g, _):
        # Cluster ranges are 128-aligned by construction (host side); the
        # hint lets Mosaic prove lane alignment of the dynamic slice.
        base = pl.multiple_of(start + g * _RGROUP, _RGROUP)
        ox = rays_ref[0:1, pl.ds(base, _RGROUP)]  # (1, 128)
        oy = rays_ref[1:2, pl.ds(base, _RGROUP)]
        oz = rays_ref[2:3, pl.ds(base, _RGROUP)]
        dx = rays_ref[3:4, pl.ds(base, _RGROUP)]
        dy = rays_ref[4:5, pl.ds(base, _RGROUP)]
        dz = rays_ref[5:6, pl.ds(base, _RGROUP)]

        best_t = jnp.full((1, _RGROUP), jnp.inf, jnp.float32)
        best_p = jnp.full((1, _RGROUP), -1.0, jnp.float32)

        for tg in range(n_tri_groups):
            sl = slice(tg * _TGROUP, (tg + 1) * _TGROUP)
            v0x = blk_ref[0, sl, 0:1]  # (8, 1)
            v0y = blk_ref[0, sl, 1:2]
            v0z = blk_ref[0, sl, 2:3]
            e1x = blk_ref[0, sl, 3:4]
            e1y = blk_ref[0, sl, 4:5]
            e1z = blk_ref[0, sl, 5:6]
            e2x = blk_ref[0, sl, 6:7]
            e2y = blk_ref[0, sl, 7:8]
            e2z = blk_ref[0, sl, 8:9]
            cull = blk_ref[0, sl, 9:10]
            valid = blk_ref[0, sl, 10:11]
            prim = blk_ref[0, sl, 11:12]

            # (8,1) tri x (1,128) ray -> (8,128)
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
                & (t >= 0.0)
            )
            t_hit = jnp.where(ok, t, jnp.inf)  # (8, 128)
            tg_min = jnp.min(t_hit, axis=0, keepdims=True)  # (1, 128)
            tg_prim = jnp.min(
                jnp.where(t_hit <= tg_min, prim, jnp.float32(1e30)),
                axis=0, keepdims=True,
            )
            better = tg_min < best_t
            best_t = jnp.where(better, tg_min, best_t)
            best_p = jnp.where(better, tg_prim, best_p)

        # Tail group may overrun into the next cluster's range; mask. The
        # grid runs sequentially, so read-modify-write is safe.
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, _RGROUP), 1)
        in_range = (g * _RGROUP + lane) < count
        # Every in-range slot must be written (out buffers start
        # uninitialized): miss slots get inf/-1 explicitly.
        cur_t = t_out[0:1, pl.ds(base, _RGROUP)]
        cur_p = p_out[0:1, pl.ds(base, _RGROUP)]
        t_out[0:1, pl.ds(base, _RGROUP)] = jnp.where(in_range, best_t, cur_t)
        p_out[0:1, pl.ds(base, _RGROUP)] = jnp.where(in_range, best_p, cur_p)
        return 0

    jax.lax.fori_loop(0, n_ray_groups, ray_group, 0)


@functools.partial(jax.jit, static_argnames=("n_clusters", "l"))
def _cluster_call(offs, cnts, blocks, rays_t, n_clusters, l):
    nc_pad = rays_t.shape[1]
    out_shape = [
        jax.ShapeDtypeStruct((1, nc_pad), jnp.float32),
        jax.ShapeDtypeStruct((1, nc_pad), jnp.float32),
    ]
    smem = lambda a: pl.BlockSpec(
        a.shape, lambda i: (0,) * a.ndim, memory_space=pltpu.SMEM
    )
    blk_spec = pl.BlockSpec(
        (1,) + blocks.shape[1:], lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    rays_spec = pl.BlockSpec(
        rays_t.shape, lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    out_spec = pl.BlockSpec((1, nc_pad), lambda i: (0, 0), memory_space=pltpu.VMEM)
    kernel = functools.partial(
        _cluster_kernel, n_tri_groups=l // _TGROUP
    )
    return pl.pallas_call(
        kernel,
        grid=(n_clusters,),
        in_specs=[smem(offs), smem(cnts), blk_spec, rays_spec],
        out_specs=[out_spec, out_spec],
        out_shape=out_shape,
    )(offs, cnts, blocks, rays_t)


def binned_intersect_pallas(
    scene: SceneData, o, d, max_candidates: int = 4, blocks=None
):
    """Exact nearest-hit using the cluster-major Pallas compute stage.

    o, d: [R,3]. Triangle hits only come from candidate clusters; the
    residual round and spheres reuse the jnp paths (see accel/binned.py).
    """
    n_rays = o.shape[0]
    c = scene.blk_prim.shape[0]
    l = scene.blk_prim.shape[1]
    if blocks is None:
        blocks = pack_blocks(scene)

    ids, entry = generate_candidates(scene, o, d, max_candidates)
    m = ids.shape[1]
    order, sorted_key, counts = bin_candidates(ids, c)
    nc = n_rays * m

    counts = counts.astype(jnp.int32)
    # 128-aligned per-cluster ranges (Mosaic requires lane-aligned dynamic
    # slices): each cluster's candidates live at
    # [offs_al[k], offs_al[k] + counts[k]) inside a padded table.
    counts_al = ((counts + _RGROUP - 1) // _RGROUP) * _RGROUP
    offs_al = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(counts_al)[:-1]]
    )
    offs_un = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(counts)[:-1]]
    )
    # Position of each sorted candidate in the padded table. Empty slots
    # (key == C) are parked past every aligned range.
    total_pad = nc + c * _RGROUP
    key_c = jnp.minimum(sorted_key, c - 1)
    in_real = sorted_key < c
    rank = jnp.arange(nc, dtype=jnp.int32) - offs_un[key_c]
    positions = jnp.where(
        in_real, offs_al[key_c] + rank, total_pad - 1
    )

    flat_ray = jnp.repeat(jnp.arange(n_rays, dtype=jnp.int32), m)[order]
    comp = jnp.concatenate([o.T, d.T, jnp.zeros((2, n_rays), o.dtype)], axis=0)
    rays_t = jnp.zeros((8, total_pad), o.dtype).at[:, positions].set(
        comp[:, flat_ray]
    )

    t_sorted, p_sorted = _cluster_call(
        offs_al, counts, blocks, rays_t, n_clusters=c, l=l,
    )
    t_sorted = t_sorted[0, positions]
    p_sorted = p_sorted[0, positions]
    t_sorted = jnp.where(in_real, t_sorted, jnp.inf)
    p_sorted = jnp.where(in_real, p_sorted, -1.0)

    # Un-sort back to [R, M] candidate slots.
    t_flat = jnp.full(nc, jnp.inf).at[order].set(t_sorted)
    p_flat = jnp.full(nc, -1.0).at[order].set(p_sorted)
    t_cand = jnp.where(ids >= 0, t_flat.reshape(n_rays, m), jnp.inf)
    p_cand = p_flat.reshape(n_rays, m)

    j = jnp.argmin(t_cand, axis=1)
    best_t = jnp.take_along_axis(t_cand, j[:, None], axis=1)[:, 0]
    best_p = jnp.take_along_axis(p_cand, j[:, None], axis=1)[:, 0].astype(jnp.int32)

    # Residual exactness round (see accel/binned.py).
    worst_entry = jnp.max(jnp.where(jnp.isfinite(entry), entry, -jnp.inf), axis=1)
    saturated = jnp.isfinite(entry[:, -1])
    needs_residual = saturated & (worst_entry < best_t)
    from ..ops.intersect import sweep_intersect

    def residual(_):
        return sweep_intersect(scene, o, d)

    def fast(_):
        return (
            jnp.where(jnp.isfinite(best_t), best_t, jnp.inf),
            jnp.where(jnp.isfinite(best_t), best_p, -1),
        )

    rt, rp = jax.lax.cond(jnp.any(needs_residual), residual, fast, None)
    rt = jnp.where(rt < 0, jnp.inf, rt)
    best_t = jnp.where(needs_residual, rt, best_t)
    best_p = jnp.where(needs_residual, rp, best_p)

    if scene.n_sph > 0:
        t_sph = intersect_spheres(
            o[:, None, :], d[:, None, :],
            scene.sph_center[None], scene.sph_radius[None],
        )
        t_sph = jnp.where(scene.sph_valid[None] & (t_sph >= 0.0), t_sph, jnp.inf)
        js = jnp.argmin(t_sph, axis=1)
        ts = jnp.take_along_axis(t_sph, js[:, None], axis=1)[:, 0]
        better = ts < jnp.where(jnp.isfinite(best_t), best_t, jnp.inf)
        best_t = jnp.where(better, ts, best_t)
        best_p = jnp.where(better, js.astype(jnp.int32) + scene.n_tri, best_p)

    hit = (best_p >= 0) & jnp.isfinite(best_t)
    return jnp.where(hit, best_t, -1.0), jnp.where(hit, best_p, -1)
