"""Bin-by-cluster wavefront traversal machinery (round-2 architecture).

See docs/DESIGN_large_scenes.md. This module implements the data movement
half of the design in pure jnp — candidate generation, sort-based binning,
and the exact resolve — with a jnp compute stage standing in for the
cluster-major Pallas kernel. The binning layer is the part that must be
exactly right (it decides *what* gets intersected); the Pallas kernel then
only changes *how fast* the per-candidate tests run.

Measured v5e costs for the primitives used here (BASELINE.md): 1M-pair sort
2.0 ms, 1M->4096 segment_sum 1.2 ms.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..scene.scene import SceneData
from .build import FlatBVH  # noqa: F401  (re-exported context)
from ..ops.intersect import intersect_aabb, intersect_spheres, intersect_triangles


def generate_candidates(scene: SceneData, o, d, max_candidates: int):
    """Per-ray candidate clusters whose AABB the ray enters, nearest-first.

    Returns (cluster_ids [R, M], entry_t [R, M]) with -1/inf padding, where
    M = max_candidates. Exactness contract: every cluster containing a
    potential nearest hit appears among the candidates *or* has entry_t
    beyond any returned candidate's (callers run a residual round when a
    returned hit does not dominate the remaining entries — same scheme as
    ops.intersect.sweep_intersect).
    """
    t_c = intersect_aabb(
        o[:, None, :], d[:, None, :], scene.blk_lo[None], scene.blk_hi[None]
    )
    valid = jnp.any(scene.blk_prim >= 0, axis=1)
    t_c = jnp.where((t_c >= 0.0) & valid[None, :], t_c, jnp.inf)
    neg, idx = jax.lax.top_k(-t_c, min(max_candidates, t_c.shape[1]))
    has = jnp.isfinite(neg)
    return jnp.where(has, idx, -1), jnp.where(has, -neg, jnp.inf)


def bin_candidates(cluster_ids, n_clusters: int):
    """Sort flattened (cluster, ray) candidate pairs by cluster id.

    cluster_ids: [R, M] (-1 = empty). Returns (order [R*M] indices into the
    flat candidate list sorted by cluster, sorted_cluster [R*M],
    counts [C] candidates per cluster). Empty slots sort to the end
    (cluster id C).
    """
    r, m = cluster_ids.shape
    flat = cluster_ids.reshape(-1)
    key = jnp.where(flat >= 0, flat, n_clusters).astype(jnp.int32)
    payload = jnp.arange(r * m, dtype=jnp.int32)
    sorted_key, order = jax.lax.sort([key, payload], num_keys=1)
    counts = jax.ops.segment_sum(
        jnp.ones_like(key), key, num_segments=n_clusters + 1
    )[:n_clusters]
    return order, sorted_key, counts


def _test_candidates_jnp(scene: SceneData, o, d, cluster_ids):
    """Reference compute stage: dense-test each (ray, cluster) candidate.

    [R, M] candidate blocks; the Pallas cluster-major kernel replaces this
    with per-cluster VMEM-resident streaming. Returns (t [R, M], prim
    [R, M]) nearest hit within each candidate cluster.
    """
    r, m = cluster_ids.shape
    cid = jnp.maximum(cluster_ids, 0)
    v0 = scene.blk_v0[cid]
    v1 = scene.blk_v1[cid]
    v2 = scene.blk_v2[cid]
    cull = scene.blk_cull[cid]
    pid = scene.blk_prim[cid]
    t = intersect_triangles(
        o[:, None, None, :], d[:, None, None, :], v0, v1, v2, cull
    )
    t = jnp.where((cluster_ids[..., None] >= 0) & (pid >= 0) & (t >= 0.0), t, jnp.inf)
    j = jnp.argmin(t, axis=-1)
    t_min = jnp.take_along_axis(t, j[..., None], axis=-1)[..., 0]
    p_min = jnp.take_along_axis(pid, j[..., None], axis=-1)[..., 0]
    return t_min, p_min


def binned_intersect(scene: SceneData, o, d, max_candidates: int = 8):
    """Exact nearest-hit via candidate generation + resolve.

    Functionally equivalent to sweep_intersect; structured so the compute
    stage can be swapped for the cluster-major Pallas kernel. o, d: [R,3].
    """
    n_rays = o.shape[0]

    ids, entry = generate_candidates(scene, o, d, max_candidates)
    t_cand, p_cand = _test_candidates_jnp(scene, o, d, ids)

    # Resolve: nearest candidate hit per ray.
    j = jnp.argmin(t_cand, axis=1)
    best_t = jnp.take_along_axis(t_cand, j[:, None], axis=1)[:, 0]
    best_p = jnp.take_along_axis(p_cand, j[:, None], axis=1)[:, 0]

    # Residual exactness round: clusters beyond the candidate set can only
    # matter when their entry beats best_t AND they were not in the top-M.
    # Reuse the sweep path for those (rare) rays — full correctness without
    # approximation.
    worst_entry = jnp.max(jnp.where(jnp.isfinite(entry), entry, -jnp.inf), axis=1)
    saturated = jnp.isfinite(entry[:, -1])  # all M slots used
    needs_residual = saturated & (worst_entry < best_t)
    if bool(scene.n_tri):  # static structure; residual handled lazily
        from ..ops.intersect import sweep_intersect

        def residual(_):
            return sweep_intersect(scene, o, d)

        def fast(_):
            return (
                jnp.where(jnp.isfinite(best_t), best_t, jnp.inf),
                jnp.where(jnp.isfinite(best_t), best_p, -1),
            )

        rt, rp = jax.lax.cond(jnp.any(needs_residual), residual, fast, None)
        best_t = jnp.where(needs_residual, rt, best_t)
        best_p = jnp.where(needs_residual, rp, best_p)

    # Spheres: dense.
    if scene.n_sph > 0:
        t_sph = intersect_spheres(
            o[:, None, :], d[:, None, :],
            scene.sph_center[None], scene.sph_radius[None],
        )
        t_sph = jnp.where(scene.sph_valid[None] & (t_sph >= 0.0), t_sph, jnp.inf)
        js = jnp.argmin(t_sph, axis=1)
        ts = jnp.take_along_axis(t_sph, js[:, None], axis=1)[:, 0]
        sph_better = ts < jnp.where(jnp.isfinite(best_t), best_t, jnp.inf)
        best_t = jnp.where(sph_better, ts, best_t)
        best_p = jnp.where(sph_better, js.astype(jnp.int32) + scene.n_tri, best_p)

    hit = (best_p >= 0) & jnp.isfinite(best_t)
    return jnp.where(hit, best_t, -1.0), jnp.where(hit, best_p, -1)
