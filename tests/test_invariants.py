"""Exact estimator invariants (no MC tolerance).

The golden tests pin distribution-level parity with the C++ reference;
these pin algebraic properties of the estimator that hold exactly, seed
for seed — sharp regressions for weight-bookkeeping bugs that statistical
bounds could absorb.
"""
import numpy as np

from tests.scenes_util import inward_box_scene
from tests.test_parity import render_fixed

from cpupathtrace_tpu import SceneBuilder, make_camera
from cpupathtrace_tpu.scene.geometry import make_plane

CAM = ((0, 0, 0), (0, 0, 0.9), (0, 1, 0), 1.0, 1.0, 1.0)


def test_emission_linearity_exact():
    """With a single emitter, radiance is exactly linear in its emission:
    the emitter CDF is degenerate ([1.0]), the sample count is unchanged,
    roulette depends only on throughput (BSDF factors), and doubling is
    exact in binary float — so the 2x render equals 2x the 1x render
    bit-for-bit at the same seed."""
    cam = make_camera(*CAM)
    img1 = render_fixed(inward_box_scene(1.0), cam, 16, 64, seed=5)
    img2 = render_fixed(inward_box_scene(2.0), cam, 16, 64, seed=5)
    np.testing.assert_array_equal(img2[..., :3], 2.0 * img1[..., :3])
    np.testing.assert_array_equal(img2[..., 3], img1[..., 3])


def test_zero_albedo_shows_only_direct_emission():
    """Black walls (diffuse 0) kill every path at its first diffuse
    bounce (factor 0 -> divisor cutoff), so the image is exactly the
    directly-visible emission: emitter pixels carry the emission value,
    everything else is exactly 0."""
    b = SceneBuilder()
    black = b.add_material(diffuse=(0, 0, 0, 1))
    light = b.add_material(diffuse=(0, 0, 0, 1), emission=(3.0, 2.0, 1.0, 1))
    b.add_triangles(make_plane((1, -1, -1), (-1, -1, 1), True), black)
    b.add_triangles(make_plane((-1, 1, -1), (1, 1, 1), True), black)
    b.add_triangles(
        make_plane((-0.25, 0.99, -0.25), (0.25, 0.99, 0.25), True), light
    )
    b.add_triangles(make_plane((-1, -1, -1), (1, 1, -1), True), black)
    b.add_triangles(make_plane((-1, -1, -1), (-1, 1, 1), True), black)
    b.add_triangles(make_plane((1, -1, 1), (-1, 1, 1), True), black)
    b.add_triangles(make_plane((1, -1, 1), (1, 1, -1), True), black)
    scene = b.build()
    # Look straight up at the ceiling panel.
    cam = make_camera((0, 0, 0), (0, 0.9, 0), (0, 0, 1), 1.0, 0.6, 0.6)
    img = render_fixed(scene, cam, 16, 16, seed=2)
    rgb = img[..., :3]
    lit = rgb.sum(-1) > 0
    assert lit.any(), "panel not visible"
    # Each pixel is exactly emission * (panel hits / 16): sub-pixel jitter
    # makes silhouette pixels partial, but every sample contributes the
    # emission exactly (divisor 1, bounce_pd 1) or exactly nothing.
    frac = rgb[lit][:, 2] / 1.0  # blue channel = coverage fraction
    np.testing.assert_array_equal(frac * 16, np.round(frac * 16))
    assert ((0 < frac) & (frac <= 1)).all()
    np.testing.assert_array_equal(
        rgb[lit], frac[:, None] * np.asarray([3.0, 2.0, 1.0], np.float32)
    )
    # Fully-covered pixels exist and carry the emission exactly.
    assert (frac == 1.0).sum() > 0
    # Everything else: exactly black.
    assert (rgb[~lit] == 0.0).all()
