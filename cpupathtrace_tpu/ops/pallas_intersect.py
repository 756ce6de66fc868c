"""Pallas TPU kernel: dense ray-scene intersection for small scenes.

The jnp dense intersector broadcasts rays against triangles, making XLA
materialize [R, T, 3] intermediates in HBM — ~7KB of traffic per ray per
bounce. This kernel keeps the whole primitive table in VMEM (a small scene
is a few KB), streams rays through VMEM in (8, 128)-lane tiles, and writes
only the nearest (t, prim) back: ~32B of HBM traffic per ray, a ~200x
bandwidth reduction on the benchmark box scene.

Math parity: Moller-Trumbore with eps=1e-6 + culling rule and the near-root
sphere test, identical to ops/intersect.py (ref: src/scene/object.cpp:72-84,
146-182).
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
_BLOCK_ROWS = 64  # rows per grid step; 64*128 = 8192 rays/step
_LANES = 128


def _dense_kernel(
    tri_ref,  # [T, 16] f32: v0(3) e1(3) e2(3) cull(1) valid(1) pad — SMEM
    sph_ref,  # [S, 8] f32: center(3) radius(1) valid(1) pad — SMEM
    ox_ref, oy_ref, oz_ref,  # [8, 128] ray origin components
    dx_ref, dy_ref, dz_ref,  # [8, 128] ray directions
    t_out, prim_out,  # [8, 128] outputs
    *,
    n_tri_rows: int,
    n_sph_rows: int,
    n_tri: int,
):
    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]

    best_t = jnp.full(ox.shape, jnp.inf, jnp.float32)
    best_p = jnp.full(ox.shape, -1, jnp.int32)

    for k in range(n_tri_rows):
        v0x, v0y, v0z = tri_ref[k, 0], tri_ref[k, 1], tri_ref[k, 2]
        e1x, e1y, e1z = tri_ref[k, 3], tri_ref[k, 4], tri_ref[k, 5]
        e2x, e2y, e2z = tri_ref[k, 6], tri_ref[k, 7], tri_ref[k, 8]
        cull = tri_ref[k, 9]
        valid = tri_ref[k, 10]

        # pvec = d x e2
        px = dy * e2z - dz * e2y
        py = dz * e2x - dx * e2z
        pz = dx * e2y - dy * e2x
        det = e1x * px + e1y * py + e1z * pz

        # NB: select over boolean vectors fails Mosaic legalization;
        # express the cull choice with logical ops instead.
        is_cull = cull > 0.5
        miss_det = (is_cull & (det <= _TRI_EPS)) | (
            (~is_cull) & (jnp.abs(det) <= _TRI_EPS)
        )
        inv_det = 1.0 / jnp.where(miss_det, 1.0, det)

        tx = ox - v0x
        ty = oy - v0y
        tz = oz - v0z
        u = (tx * px + ty * py + tz * pz) * inv_det
        # qvec = tvec x e1
        qx = ty * e1z - tz * e1y
        qy = tz * e1x - tx * e1z
        qz = tx * e1y - ty * e1x
        v = (dx * qx + dy * qy + dz * qz) * inv_det
        t = (e2x * qx + e2y * qy + e2z * qz) * inv_det

        ok = (
            (valid > 0.5)
            & ~miss_det
            & (u >= 0.0) & (u <= 1.0)
            & (v >= 0.0) & (u + v <= 1.0)
            & (t >= 0.0) & (t < best_t)
        )
        best_t = jnp.where(ok, t, best_t)
        best_p = jnp.where(ok, k, best_p)

    for k in range(n_sph_rows):
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

    hit = best_p >= 0
    t_out[:] = jnp.where(hit, best_t, -1.0)
    prim_out[:] = best_p


def _pack_scene_tables(scene: SceneData):
    """Pack the VMEM primitive tables (jnp; traceable — XLA fuses/hoists
    this tiny [T,16] assembly, so packing under jit is free)."""
    tri_v0 = scene.tri_v0
    n_rows = tri_v0.shape[0]
    tri = jnp.concatenate(
        [
            tri_v0,
            scene.tri_v1 - tri_v0,
            scene.tri_v2 - tri_v0,
            scene.tri_cull.astype(jnp.float32)[:, None],
            scene.tri_valid.astype(jnp.float32)[:, None],
            jnp.zeros((n_rows, 5), jnp.float32),
        ],
        axis=1,
    )
    s_rows = scene.sph_center.shape[0]
    sph = jnp.concatenate(
        [
            scene.sph_center,
            scene.sph_radius[:, None],
            scene.sph_valid.astype(jnp.float32)[:, None],
            jnp.zeros((s_rows, 3), jnp.float32),
        ],
        axis=1,
    )
    return tri, sph


@functools.partial(jax.jit, static_argnames=("n_tri_rows", "n_sph_rows", "n_tri"))
def _dense_pallas_call(tri, sph, ox, oy, oz, dx, dy, dz, n_tri_rows, n_sph_rows, n_tri):
    rows = ox.shape[0]
    grid = (rows // _BLOCK_ROWS,)
    ray_spec = pl.BlockSpec(
        (_BLOCK_ROWS, _LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    # Tables live in SMEM: the kernel reads them one scalar at a time, and
    # scalar loads from VMEM (vector memory) are pathologically slow.
    table_spec = lambda shape: pl.BlockSpec(
        shape, lambda i: (0, 0), memory_space=pltpu.SMEM
    )
    kernel = functools.partial(
        _dense_kernel,
        n_tri_rows=n_tri_rows,
        n_sph_rows=n_sph_rows,
        n_tri=n_tri,
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            table_spec(tri.shape),
            table_spec(sph.shape),
            ray_spec, ray_spec, ray_spec, ray_spec, ray_spec, ray_spec,
        ],
        out_specs=[ray_spec, ray_spec],
        out_shape=[
            jax.ShapeDtypeStruct((rows, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((rows, _LANES), jnp.int32),
        ],
    )(tri, sph, ox, oy, oz, dx, dy, dz)


def dense_intersect_pallas(scene: SceneData, o, d, tables=None):
    """Drop-in replacement for ops.intersect.dense_intersect on TPU.

    o, d: [R, 3]. Returns (t [R], prim [R]); -1 encodes a miss.
    """
    if tables is None:
        tables = _pack_scene_tables(scene)
    tri, sph = tables

    r = o.shape[0]
    block = _BLOCK_ROWS * _LANES
    pad = (-r) % block
    if pad:
        o = jnp.concatenate([o, jnp.zeros((pad, 3), o.dtype)])
        d = jnp.concatenate([d, jnp.ones((pad, 3), d.dtype)])
    rows = (r + pad) // _LANES

    comps = []
    for arr in (o, d):
        for j in range(3):
            comps.append(arr[:, j].reshape(rows, _LANES))
    t, prim = _dense_pallas_call(
        tri, sph, *comps,
        n_tri_rows=tri.shape[0], n_sph_rows=sph.shape[0], n_tri=scene.n_tri,
    )
    t = t.reshape(-1)[:r]
    prim = prim.reshape(-1)[:r]
    return t, prim
