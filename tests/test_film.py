"""Film / adaptive-sampling tests (ref: src/worker.cpp:149-322)."""
import jax
import jax.numpy as jnp
import numpy as np

from cpupathtrace_tpu import RenderOptions, make_camera
from cpupathtrace_tpu.integrator.film import (
    adaptive_constants,
    pixel_camera_coords,
    render_chunk,
    render_tile,
)
from cpupathtrace_tpu.scene.scene import SceneBuilder
from cpupathtrace_tpu.scene.geometry import make_box, make_plane


def test_adaptive_constants_match_reference_integer_math():
    """stats = clamp(min_sc/4, 1, 64); candidate_batch =
    max(max(min,max/4)/stats, 2); check batches (ref: worker.cpp:158-163)."""
    o = RenderOptions(8, 8, min_sample_count=16, max_sample_count=64)
    stats, cbc, check = adaptive_constants(o)
    assert stats == 4
    assert cbc == max(max(16, 16) // 4, 2)
    assert check == min(max(8, 6, 8, 4), 1024) // 4

    o2 = RenderOptions(8, 8, min_sample_count=1, max_sample_count=1)
    stats2, cbc2, check2 = adaptive_constants(o2)
    assert stats2 == 1
    assert cbc2 == 2


def test_pixel_camera_coords():
    o = RenderOptions(4, 4, 1, 1)
    x, y = pixel_camera_coords(o, np.array(0.0), np.array(0.0))
    np.testing.assert_allclose(x, -0.75)
    np.testing.assert_allclose(y, 0.75)  # y flipped (ref: worker.cpp:166-171)
    x, y = pixel_camera_coords(o, np.array(3.0), np.array(3.0))
    np.testing.assert_allclose(x, 0.75)
    np.testing.assert_allclose(y, -0.75)


def _box_scene():
    from tests.scenes_util import inward_box_scene

    return inward_box_scene()


def test_render_chunk_accumulates_spp():
    scene = _box_scene()
    cam = make_camera((0, 0, 0), (0, 0, 0.9), (0, 1, 0))
    opts = RenderOptions(4, 4, 4, 4, max_depth=6)
    px = np.arange(4, dtype=np.float32)
    xg, yg = np.meshgrid(px, px)
    x, y = pixel_camera_coords(opts, xg.ravel(), yg.ravel())
    s, coll = render_chunk(
        scene, cam, opts, jnp.asarray(x, jnp.float32), jnp.asarray(y, jnp.float32),
        jax.random.PRNGKey(0), 4,
    )
    assert s.shape == (16, 4)
    # Closed box: every sample collects.
    np.testing.assert_array_equal(np.asarray(coll), 4)
    # Sum of 4 samples with alpha 1 each.
    np.testing.assert_allclose(np.asarray(s[:, 3]), 4.0)


def test_render_tile_unbiased_vs_biased_shapes():
    scene = _box_scene()
    cam = make_camera((0, 0, 0), (0, 0, 0.9), (0, 1, 0))
    px = np.arange(4, dtype=np.float32)
    xg, yg = np.meshgrid(px, px)
    for allow_bias in (False, True):
        opts = RenderOptions(4, 4, 4, 8, max_depth=6, allow_bias=allow_bias)
        x, y = pixel_camera_coords(opts, xg.ravel(), yg.ravel())
        out = render_tile(
            scene, cam, opts,
            jnp.asarray(x, jnp.float32), jnp.asarray(y, jnp.float32),
            jax.random.PRNGKey(1),
        )
        assert out.shape == (16, 4)
        assert bool(jnp.all(jnp.isfinite(out)))
        np.testing.assert_allclose(np.asarray(out[:, 3]), 1.0)


def test_chunked_mean_consistency():
    """Mean over many samples of a closed box converges: two independent
    seeds agree within MC tolerance (estimator sanity)."""
    scene = _box_scene()
    cam = make_camera((0, 0, 0), (0, 0, 0.9), (0, 1, 0))
    opts = RenderOptions(2, 2, 64, 64, max_depth=8)
    px = np.arange(2, dtype=np.float32)
    xg, yg = np.meshgrid(px, px)
    x, y = pixel_camera_coords(opts, xg.ravel(), yg.ravel())
    x = jnp.asarray(x, jnp.float32)
    y = jnp.asarray(y, jnp.float32)
    means = []
    for seed in (0, 1):
        s, coll = render_chunk(scene, cam, opts, x, y, jax.random.PRNGKey(seed), 64)
        means.append(np.asarray(s[:, :3]).sum() / np.asarray(coll).sum())
    assert abs(means[0] - means[1]) / (abs(means[0]) + 1e-9) < 0.35
