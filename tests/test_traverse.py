"""Binned cluster-major traversal (accel/pallas_traverse.py) exactness.

The Pallas kernels run in interpret mode on CPU; the oracle is the pure-jnp
reference path (dense big-set + sweep over the cluster blocks), itself
equivalent to brute-force dense intersection (tested in test_binned.py).
Nearest-hit comparisons accept prim mismatches only at exact t ties (two
triangles sharing the winning distance are both correct answers, matching
the reference's traversal-order-dependent tie behavior).
"""
import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cpupathtrace_tpu.accel.pallas_traverse import (
    binned_intersect_ref,
    binned_intersect_tpu,
)
from cpupathtrace_tpu.models.scenes import bench_dragon_scene
from cpupathtrace_tpu.ops.intersect import dense_intersect, scene_intersect


@pytest.fixture(scope="module")
def dragon_scene():
    return bench_dragon_scene(dragon_tris=1500, accel="binned", cluster_size=64)


def _rays(n, seed, inside=False):
    rng = np.random.default_rng(seed)
    if inside:
        o = rng.uniform(-0.3, 0.3, (n, 3)).astype(np.float32)
        o[:, 1] -= 0.5  # inside the dragon region: entry-t ties at 0
        d = rng.normal(size=(n, 3))
    else:
        o = rng.uniform(-0.9, 0.9, (n, 3)).astype(np.float32)
        o[: n // 2, 2] = -2.8
        tgt = rng.uniform(-0.4, 0.4, (n, 3)).astype(np.float32)
        tgt[:, 1] -= 0.5
        d = tgt - o
        d[n // 2:] = rng.normal(size=(n - n // 2, 3))
    d = (d / np.linalg.norm(d, axis=1, keepdims=True)).astype(np.float32)
    return jnp.asarray(o), jnp.asarray(d)


def _agree(tk, pk, tr, pr, mask=None):
    tk, pk, tr, pr = map(np.asarray, (tk, pk, tr, pr))
    same = (pk == pr) | (tk == tr)
    if mask is not None:
        same = same[np.asarray(mask)]
    return same.all()


def test_builder_partition(dragon_scene):
    s = dragon_scene
    assert s.accel == "binned"
    assert s.n_big == 14  # 12 box triangles + 2 light-panel triangles
    assert s.trv_bounds.shape[0] >= 2
    # Cluster-set root bounds are tight around the dragon, not the room.
    assert float(s.root_hi[1]) < 0.0
    # Every triangle is exactly once in (big set) + (cluster blocks).
    blk = np.asarray(s.blk_prim)
    big = np.asarray(s.big_prim)
    got = np.sort(np.concatenate([blk[blk >= 0], big[big >= 0]]))
    assert np.array_equal(got, np.arange(s.n_tri))


def test_ref_path_matches_dense(dragon_scene):
    o, d = _rays(1024, 0)
    dense = dataclasses.replace(dragon_scene, accel="dense")
    t_r, p_r = binned_intersect_ref(dragon_scene, o, d)
    t_d, p_d = dense_intersect(dense, o, d)
    assert _agree(t_r, p_r, t_d, p_d)
    assert int(np.sum(np.asarray(p_d) >= 0)) > 100


@pytest.mark.parametrize("m", [1, 4])
@pytest.mark.parametrize("inside", [False, True])
def test_kernels_match_oracle(dragon_scene, m, inside):
    """m=1 forces the multi-round exactness machinery on every ray."""
    o, d = _rays(768, 1, inside=inside)
    t_r, p_r = binned_intersect_ref(dragon_scene, o, d)
    t_k, p_k = binned_intersect_tpu(
        dragon_scene, o, d, m=m, batch=1024, interpret=True
    )
    assert _agree(t_k, p_k, t_r, p_r)


def test_t_max_and_any_hit(dragon_scene):
    o, d = _rays(768, 2, inside=True)
    rng = np.random.default_rng(3)
    tm = jnp.asarray(rng.uniform(0.05, 1.5, 768).astype(np.float32))
    t_r, p_r = binned_intersect_ref(dragon_scene, o, d, t_max=tm)
    t_k, p_k = binned_intersect_tpu(
        dragon_scene, o, d, t_max=tm, any_hit=True, batch=1024, interpret=True
    )
    p_k, p_r = np.asarray(p_k), np.asarray(p_r)
    # Occlusion (hit-existence) agrees; any-hit may return a farther hit
    # but it must be a real one inside the bound.
    assert np.array_equal(p_k >= 0, p_r >= 0)
    assert np.all((p_k < 0) | (np.asarray(t_k) < np.asarray(tm)))


def test_live_mask(dragon_scene):
    o, d = _rays(768, 4, inside=True)
    live = jnp.asarray(np.random.default_rng(5).random(768) < 0.5)
    t_r, p_r = binned_intersect_ref(dragon_scene, o, d)
    t_k, p_k = binned_intersect_tpu(
        dragon_scene, o, d, live=live, batch=1024, interpret=True
    )
    assert _agree(t_k, p_k, t_r, p_r, mask=live)


def test_multi_batch(dragon_scene):
    """Rays spanning several fixed-size batches resolve identically."""
    o, d = _rays(3072, 6)
    t_r, p_r = binned_intersect_ref(dragon_scene, o, d)
    t_k, p_k = binned_intersect_tpu(
        dragon_scene, o, d, batch=1024, interpret=True
    )
    assert _agree(t_k, p_k, t_r, p_r)


def test_scene_intersect_dispatch(dragon_scene):
    """accel='binned' routes through scene_intersect off-TPU (ref path)."""
    o, d = _rays(256, 7)
    t, p = scene_intersect(dragon_scene, o, d)
    t_r, p_r = binned_intersect_ref(dragon_scene, o, d)
    assert _agree(t, p, t_r, p_r)


def test_wavefront_render_binned_matches_sweep():
    """End-to-end estimator parity: the same scene built binned vs sweep
    renders bit-identically on CPU (identical keys, identical nearest
    hits; only the intersector implementation differs)."""
    from cpupathtrace_tpu.core.config import RenderOptions
    from cpupathtrace_tpu.integrator.film import (
        pixel_camera_coords,
        render_chunk,
    )
    from cpupathtrace_tpu.models.scenes import bench_camera

    opts = RenderOptions(12, 12, 4, 4, epsilon=1e-3, max_depth=6)
    xg, yg = np.meshgrid(
        np.arange(12, dtype=np.float32), np.arange(12, dtype=np.float32)
    )
    x_cam, y_cam = pixel_camera_coords(opts, xg.ravel(), yg.ravel())
    key = jax.random.PRNGKey(0)
    cam = bench_camera()

    imgs = []
    for accel in ("binned", "sweep"):
        scene = bench_dragon_scene(
            dragon_tris=900, accel=accel, cluster_size=64
        )
        s, c = render_chunk(
            scene, cam, opts,
            jnp.asarray(x_cam, jnp.float32), jnp.asarray(y_cam, jnp.float32),
            key, 4,
        )
        imgs.append((np.asarray(s), np.asarray(c)))
    np.testing.assert_array_equal(imgs[0][1], imgs[1][1])
    np.testing.assert_allclose(imgs[0][0], imgs[1][0], rtol=1e-6, atol=1e-6)


def test_giant_scene_auto_coarsens(monkeypatch):
    """Beyond the SMEM cluster budget the builder grows cluster_size until
    the cut fits, and beyond the pair-record budget it skips the in-kernel
    megakernel tables — the scene still intersects exactly through the
    binned wavefront (the 7.2M-triangle real-dragon regime, scaled down by
    shrinking the budgets)."""
    from cpupathtrace_tpu.accel import pallas_traverse
    from cpupathtrace_tpu.integrator.pallas_megakernel import (
        megakernel_supported,
    )

    monkeypatch.setattr(pallas_traverse, "MAX_CLUSTERS", 16)
    monkeypatch.setenv("PTX_KRN_MAX_TRIS", "1000")
    scene = bench_dragon_scene(dragon_tris=5000, accel="binned")
    assert scene.accel == "binned"
    assert scene.trv_bounds.shape[0] <= 16
    assert scene.cluster_size >= 5000 // 16
    assert scene.krn_cluster_size == 0  # records skipped -> no megakernel
    assert not megakernel_supported(scene)

    ref = bench_dragon_scene(dragon_tris=5000, accel="sweep")
    o, d = _rays(512, 11, inside=True)
    t_b, p_b = scene_intersect(scene, o, d)
    t_r, p_r = scene_intersect(ref, o, d)
    assert _agree(t_b, p_b, t_r, p_r)
