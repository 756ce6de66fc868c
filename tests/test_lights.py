"""NEE light-sampling tests (ref: src/scene/scene.cpp:222-289)."""
import jax
import jax.numpy as jnp
import numpy as np

from cpupathtrace_tpu.scene.lights import num_light_samples, sample_lights
from cpupathtrace_tpu.scene.scene import SceneBuilder
from cpupathtrace_tpu.scene.geometry import make_plane


def _emissive_scene():
    b = SceneBuilder()
    bright = b.add_material(emission=(3.0, 3.0, 3.0, 1.0))
    dim = b.add_material(emission=(1.0, 1.0, 1.0, 1.0))
    b.add_triangles(make_plane((0, 2, 0), (1, 2, 1)), bright)
    b.add_triangles(make_plane((2, 2, 0), (3, 2, 1)), dim)
    b.add_point_light((0, 5, 0), (1, 1, 1, 1))
    return b.build()


def test_sample_count_formula():
    scene = _emissive_scene()
    # 4 emissive tris: min(2 + int(log10(5)), 4) = 2, plus 1 point light.
    assert scene.emissive_sample_count == 2
    assert num_light_samples(scene) == 3


def test_point_light_delta():
    scene = _emissive_scene()
    pos = jnp.zeros((4, 3))
    s = sample_lights(scene, pos, jax.random.PRNGKey(0))
    # First column is the point light: exact position, pd 1, always valid.
    np.testing.assert_allclose(np.asarray(s.target[:, 0]), [[0, 5, 0]] * 4)
    np.testing.assert_allclose(np.asarray(s.pd[:, 0]), 1.0)
    assert bool(jnp.all(s.valid[:, 0]))
    np.testing.assert_allclose(np.asarray(s.spectrum[:, 0]), [[1, 1, 1, 1]] * 4)


def test_cdf_favors_bright_emitter():
    scene = _emissive_scene()
    n = 4096
    pos = jnp.zeros((n, 3))
    s = sample_lights(scene, pos, jax.random.PRNGKey(1))
    targets = np.asarray(s.target[:, 1:]).reshape(-1, 3)
    # Bright plane x in [0,1], dim plane x in [2,3]; power ratio 3:1.
    frac_bright = (targets[:, 0] <= 1.5).mean()
    np.testing.assert_allclose(frac_bright, 0.75, atol=0.03)


def test_emissive_sample_positions_on_surface():
    scene = _emissive_scene()
    s = sample_lights(scene, jnp.zeros((512, 3)), jax.random.PRNGKey(2))
    t = np.asarray(s.target[:, 1:]).reshape(-1, 3)
    np.testing.assert_allclose(t[:, 1], 2.0, atol=1e-5)  # both planes at y=2
    assert t[:, 0].min() >= -1e-5 and t[:, 0].max() <= 3.0 + 1e-5


def test_pd_solid_angle_conversion():
    """pd = selection_p * (1/area) * dist^2/|cos| (ref: scene.cpp:280-286)."""
    b = SceneBuilder()
    em = b.add_material(emission=(1, 1, 1, 1))
    # Single unit-area plane at y=1 facing down; shading point directly below.
    b.add_triangles(make_plane((-0.5, 1.0, -0.5), (0.5, 1.0, 0.5)), em)
    scene = b.build()
    pos = jnp.array([[0.0, 0.0, 0.0]])
    k = scene.emissive_sample_count
    s = sample_lights(scene, pos, jax.random.PRNGKey(3))
    t = np.asarray(s.target[0])
    pd = np.asarray(s.pd[0])
    for i in range(k):
        d = t[i] - np.array([0.0, 0.0, 0.0])
        dist2 = (d * d).sum()
        cos = abs(d[1] / np.sqrt(dist2))
        # selection over 2 tris each area .5: selection_p = p_tri * k;
        # surface pdf = 1/area_tri = 2.
        expected = (0.5 * k) * 2.0 * dist2 / cos
        np.testing.assert_allclose(pd[i], expected, rtol=1e-4)


def test_backface_culled_emitter_invalid_from_behind():
    b = SceneBuilder()
    em = b.add_material(emission=(1, 1, 1, 1))
    b.add_triangles(make_plane((-0.5, 1.0, -0.5), (0.5, 1.0, 0.5), True), em)
    scene = b.build()
    above = jnp.array([[0.0, 2.0, 0.0]])
    below = jnp.array([[0.0, 0.0, 0.0]])
    s_above = sample_lights(scene, above, jax.random.PRNGKey(4))
    s_below = sample_lights(scene, below, jax.random.PRNGKey(4))
    v_above = bool(jnp.any(s_above.valid))
    v_below = bool(jnp.any(s_below.valid))
    # The culled side is invalid from exactly one side (ref: scene.cpp:273-277
    # requires dot(dir, n) < 0).
    assert v_above != v_below
