"""End-to-end render integration tests (ref: test/render_test.cpp).

Assertions are deliberately noise-immune — alpha/coverage only, never
radiance values — exactly like the reference's render tests.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cpupathtrace_tpu import Material, RenderOptions, SceneBuilder, make_camera, render
from cpupathtrace_tpu.scene.geometry import HostTriangle
from cpupathtrace_tpu.scene.scene import BSDF_GLASS


def test_empty_scene_renders_transparent_black():
    # (ref: render_test.cpp:14-29)
    cam = make_camera((0, 0, 0), (0, 0, 1), (0, 1, 0), 1.0, 1.0, 1.0)
    scene = SceneBuilder().build()
    opts = RenderOptions(1, 1, 1, 1, epsilon=1e-3, max_depth=8)
    img = render(scene, cam, opts, seed=0)
    np.testing.assert_array_equal(img[0, 0], [0.0, 0.0, 0.0, 0.0])


def test_simple_scene_sphere_and_point_light():
    # (ref: render_test.cpp:31-52)
    cam = make_camera((0, 0, 0), (0, 0, 1), (0, 1, 0), 0.1, 1.0, 1.0)
    b = SceneBuilder()
    b.add_point_light((0.0, 1.0, 0.0), (1.0, 1.0, 1.0, 1.0))
    b.add_sphere((0.0, 0.0, 0.6), 0.5)
    scene = b.build()
    opts = RenderOptions(16, 16, 2, 2, epsilon=1e-3, max_depth=8)
    img = render(scene, cam, opts, seed=1)
    # Corner pixel sees past the sphere: exactly transparent black.
    np.testing.assert_array_equal(img[0, 0], [0.0, 0.0, 0.0, 0.0])
    # Center pixel hits the sphere: alpha > 0.
    assert img[8, 8][3] > 0.0


def test_advanced_scene():
    # (ref: render_test.cpp:54-90) — glass sphere + emissive lambertian
    # sphere + ground triangle.
    cam = make_camera((0, 0, 0), (0, 0, 1), (0, 1, 0), 0.2, 0.5, 1.94)
    b = SceneBuilder()
    b.add_point_light((0.0, 1.0, 0.0), (1.0, 1.0, 1.0, 1.0))
    glass = b.add_material(diffuse=(1.0, 1.0, 1.0, 1.5), ior=1.5, bsdf=BSDF_GLASS)
    b.add_sphere((0.1, 0.1, 1.0), 0.5, glass)
    emissive = b.add_material(
        diffuse=(0.8, 0.4, 0.6, 1.0), emission=(0.2, 0.1, 0.3, 1.0)
    )
    b.add_sphere((-0.1, 0.2, 2.0), 0.6, emissive)
    ground_mat = b.add_material(diffuse=(0.4, 0.6, 0.4, 1.0))
    b.add_triangles(
        [HostTriangle([5.0, -1.0, 5.0], [0.0, -1.0, -5.0], [-5.0, -1.0, 5.0])],
        ground_mat,
    )
    scene = b.build()
    opts = RenderOptions(132, 68, 5, 10, epsilon=1e-3, max_depth=8)
    img = render(scene, cam, opts, seed=2)
    assert img.shape == (68, 132, 4)
    # Top-left corner: sky, transparent black (row 0 = y 0).
    np.testing.assert_array_equal(img[0, 0], [0.0, 0.0, 0.0, 0.0])
    # Reference asserts image(64, 32) -> (x=64, y=32) hits geometry.
    assert img[32, 64][3] > 0.0
    assert bool(np.isfinite(img).all())


def test_closed_box_fully_covered_and_lit():
    """Inside a closed emissive-ceiling box with inward windings (the
    reference flips no normals; winding decides, ref: worker.cpp:55 +
    demo/main.cpp:66-135), every pixel collects and light reaches the film."""
    from tests.scenes_util import inward_box_scene

    scene = inward_box_scene()
    cam = make_camera((0, 0, 0), (0, 0, 0.9), (0, 1, 0))
    opts = RenderOptions(8, 8, 4, 4, epsilon=1e-3, max_depth=8)
    img = render(scene, cam, opts, seed=3)
    assert np.all(img[..., 3] == 1.0)  # camera inside closed geometry
    assert img[..., :3].mean() > 0.0  # light reaches the film
    assert np.isfinite(img).all()


def test_determinism_same_seed():
    cam = make_camera((0, 0, 0), (0, 0, 1), (0, 1, 0), 0.1, 1.0, 1.0)
    b = SceneBuilder()
    b.add_point_light((0.0, 1.0, 0.0), (1.0, 1.0, 1.0, 1.0))
    b.add_sphere((0.0, 0.0, 0.6), 0.5)
    scene = b.build()
    opts = RenderOptions(8, 8, 2, 2, epsilon=1e-3, max_depth=8)
    img1 = render(scene, cam, opts, seed=42)
    img2 = render(scene, cam, opts, seed=42)
    np.testing.assert_array_equal(img1, img2)
    img3 = render(scene, cam, opts, seed=43)
    assert not np.array_equal(img1, img3)


def test_mirror_sphere_reflects_light():
    """A mirror floor under a point light: radiance reaches the camera only
    via the specular bounce; NEE through specular is disabled
    (synthetic pdf 0, ref: propagation.cpp:173,214)."""
    from cpupathtrace_tpu.scene.scene import BSDF_MIRROR
    from cpupathtrace_tpu.scene.geometry import make_plane

    b = SceneBuilder()
    # Emissive panel above a mirror plane; camera looks down at the mirror.
    light = b.add_material(diffuse=(1, 1, 1, 1), emission=(5, 5, 5, 1))
    mirror = b.add_material(specular=(1, 1, 1, 1), bsdf=BSDF_MIRROR)
    b.add_triangles(make_plane((-2, 2.0, -2), (2, 2.0, 2)), light)
    b.add_triangles(make_plane((-2, 0.0, -2), (2, 0.0, 2)), mirror)
    scene = b.build()
    cam = make_camera((0.0, 1.0, -1.5), (0.0, 0.0, 0.0), (0, 1, 0))
    opts = RenderOptions(8, 8, 8, 8, epsilon=1e-3, max_depth=8)
    img = render(scene, cam, opts, seed=5)
    # The mirror shows the emissive panel: some pixels carry radiance.
    assert img[..., :3].max() > 0.1
    assert np.isfinite(img).all()
