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


def test_render_chunk_pixel_order_positional_identity():
    """`pixel_order` permutes the LAUNCH order only: sums scatter back to
    the caller's pixel positions (film.py render_chunk). In a closed box
    coverage is exact per pixel; radiance differs only by RNG pairing,
    checked per-pixel against the unpermuted render at matched seeds."""
    from cpupathtrace_tpu.integrator.film import morton_perm

    scene = _box_scene()
    cam = make_camera((0, 0, 0), (0, 0, 0.9), (0, 1, 0))
    opts = RenderOptions(8, 8, 8, 8, max_depth=6)
    px = np.arange(8, dtype=np.float32)
    xg, yg = np.meshgrid(px, px)
    x, y = pixel_camera_coords(opts, xg.ravel(), yg.ravel())
    x = jnp.asarray(x, jnp.float32)
    y = jnp.asarray(y, jnp.float32)
    perm = jnp.asarray(morton_perm(xg.ravel(), yg.ravel()), jnp.int32)

    s0, c0 = render_chunk(scene, cam, opts, x, y, jax.random.PRNGKey(3), 8)
    s1, c1 = render_chunk(
        scene, cam, opts, x, y, jax.random.PRNGKey(3), 8, pixel_order=perm
    )
    np.testing.assert_array_equal(np.asarray(c0), np.asarray(c1))
    np.testing.assert_array_equal(np.asarray(s1[:, 3]), 8.0)

    # Positional check with deterministic per-pixel structure: a lone
    # sphere covers only the central pixels, so the per-pixel collected
    # counts pin every sum to its original position (no pixel jitter —
    # coverage is exact).
    b = SceneBuilder()
    m = b.add_material(diffuse=(1, 1, 1, 1))
    b.add_sphere((0.0, 0.0, 2.0), 0.7, m)
    sph = b.build()
    opts0 = opts
    _, cc0 = render_chunk(sph, cam, opts0, x, y, jax.random.PRNGKey(5), 8)
    _, cc1 = render_chunk(
        sph, cam, opts0, x, y, jax.random.PRNGKey(5), 8, pixel_order=perm
    )
    cc0 = np.asarray(cc0)
    cc1 = np.asarray(cc1)
    assert cc0.min() == 0 and cc0.max() == 8  # real spatial structure
    # Pixels fully inside/outside the silhouette are deterministic under
    # sub-pixel jitter; only rim pixels (partial coverage in either run)
    # may differ between RNG pairings. Everything else must coincide
    # positionally — a misplaced scatter would land interior hits on
    # exterior positions.
    rim = ((cc0 % 8) != 0) | ((cc1 % 8) != 0)
    np.testing.assert_array_equal((cc0 == 8)[~rim], (cc1 == 8)[~rim])


def test_morton_perm_is_tile_local():
    from cpupathtrace_tpu.integrator.film import morton_perm

    px, py = np.meshgrid(np.arange(16), np.arange(16))
    perm = morton_perm(px.ravel(), py.ravel())
    # First 4 codes form the 2x2 tile at the origin.
    first = set(perm[:4].tolist())
    assert first == {0, 1, 16, 17}
    assert sorted(perm.tolist()) == list(range(256))


# ---------------------------------------------------------------------------
# Fused adaptive launches (round 4): render_chunk_batched + the jitted
# per-batch state fold must reproduce the unfused chunk semantics.
# ---------------------------------------------------------------------------

def test_render_chunk_batched_k1_bitwise_equals_chunk():
    from cpupathtrace_tpu.integrator.film import (
        morton_perm,
        render_chunk,
        render_chunk_batched,
    )

    scene = _box_scene()
    cam = make_camera((0, 0, -2.8), (0, 0, 1), (0, 1, 0), 1.0, 1.0)
    opts = RenderOptions(8, 8, 4, 4, epsilon=1e-3, max_depth=5)
    xg, yg = np.meshgrid(np.arange(8, dtype=np.float32), np.arange(8, dtype=np.float32))
    from cpupathtrace_tpu.integrator.film import pixel_camera_coords

    x, y = pixel_camera_coords(opts, xg.ravel(), yg.ravel())
    x, y = jnp.asarray(x, jnp.float32), jnp.asarray(y, jnp.float32)
    key = jax.random.PRNGKey(11)
    s, c = render_chunk(scene, cam, opts, x, y, key, 4)
    s_b, c_b = render_chunk_batched(scene, cam, opts, x, y, key, 4, 1)
    np.testing.assert_array_equal(np.asarray(s_b[0]), np.asarray(s))
    np.testing.assert_array_equal(np.asarray(c_b[0]), np.asarray(c))

    perm = jnp.asarray(morton_perm(xg.ravel(), yg.ravel()), jnp.int32)
    s, c = render_chunk(scene, cam, opts, x, y, key, 4, pixel_order=perm)
    s_b, c_b = render_chunk_batched(
        scene, cam, opts, x, y, key, 4, 1, pixel_order=perm
    )
    np.testing.assert_array_equal(np.asarray(s_b[0]), np.asarray(s))
    np.testing.assert_array_equal(np.asarray(c_b[0]), np.asarray(c))


def test_render_chunk_batched_total_matches_wide_chunk():
    """The K per-batch sums partition one K*spp chunk's samples: their
    total must equal render_chunk(spp=K*spp) with the same key bitwise
    (identical ray stream, just grouped)."""
    from cpupathtrace_tpu.integrator.film import (
        render_chunk,
        render_chunk_batched,
    )

    scene = _box_scene()
    cam = make_camera((0, 0, -2.8), (0, 0, 1), (0, 1, 0), 1.0, 1.0)
    opts = RenderOptions(8, 8, 4, 4, epsilon=1e-3, max_depth=5)
    from cpupathtrace_tpu.integrator.film import pixel_camera_coords

    xg, yg = np.meshgrid(np.arange(8, dtype=np.float32), np.arange(8, dtype=np.float32))
    x, y = pixel_camera_coords(opts, xg.ravel(), yg.ravel())
    x, y = jnp.asarray(x, jnp.float32), jnp.asarray(y, jnp.float32)
    key = jax.random.PRNGKey(7)
    s_b, c_b = render_chunk_batched(scene, cam, opts, x, y, key, 4, 3)
    s_w, c_w = render_chunk(scene, cam, opts, x, y, key, 12)
    np.testing.assert_allclose(
        np.asarray(s_b.sum(axis=0)), np.asarray(s_w), rtol=1e-6, atol=1e-6
    )
    np.testing.assert_array_equal(
        np.asarray(c_b.sum(axis=0)), np.asarray(c_w)
    )


def test_adaptive_fuse_levels_agree(monkeypatch):
    """Full adaptive renders at fuse=1 (legacy launch-per-batch) and
    fuse=4 draw different sample streams but identical estimator
    semantics: exact coverage, means within MC tolerance."""
    import cpupathtrace_tpu as ptx

    scene = _box_scene()
    cam = make_camera((0, 0, -2.8), (0, 0, 1), (0, 1, 0), 1.0, 1.0)
    opts = RenderOptions(16, 16, 16, 64, epsilon=1e-3, max_depth=8)
    monkeypatch.setenv("PTX_ADAPTIVE_FUSE", "1")
    img1 = ptx.render(scene, cam, opts, seed=5)
    monkeypatch.setenv("PTX_ADAPTIVE_FUSE", "4")
    img4 = ptx.render(scene, cam, opts, seed=5)
    np.testing.assert_array_equal(img1[..., 3], img4[..., 3])
    d = abs(float(img1[..., :3].mean()) - float(img4[..., :3].mean()))
    assert d < 0.15 * max(float(img1[..., :3].mean()), 1e-6)
