"""Camera tests: look-at frame, jitter bounds, apertures, thin lens
(ref: src/camera.cpp:51-113)."""
import jax
import jax.numpy as jnp
import numpy as np

from cpupathtrace_tpu.camera.camera import (
    APERTURE_CIRCULAR,
    APERTURE_HEXAGONAL,
    _sample_circular,
    _sample_hexagonal,
    make_camera,
    shoot_rays,
)


def test_center_ray_points_at_look_at():
    cam = make_camera((0, 0, -3), (0, 0, 0), (0, 1, 0))
    rays = shoot_rays(
        cam,
        jnp.zeros(64),
        jnp.zeros(64),
        0.0,  # zero pixel size: no jitter spread
        0.0,
        jax.random.PRNGKey(0),
    )
    np.testing.assert_allclose(
        np.asarray(rays.direction), np.tile([[0, 0, 1.0]], (64, 1)), atol=1e-6
    )
    np.testing.assert_allclose(np.asarray(rays.origin), np.tile([[0, 0, -3.0]], (64, 1)))


def test_sensor_corners_diverge():
    cam = make_camera((0, 0, 0), (0, 0, 1), (0, 1, 0), focal_length=1.0, height=1.0)
    x = jnp.array([-1.0, 1.0, 0.0])
    y = jnp.array([0.0, 0.0, 1.0])
    rays = shoot_rays(cam, x, y, 0.0, 0.0, jax.random.PRNGKey(0))
    d = np.asarray(rays.direction)
    # x=-1 -> ray biased toward -right; right = cross(forward, up)... sign per
    # construction: right_dir = normalize(cross(forward, up_v)).
    assert d[0][0] != d[1][0]
    assert abs(d[2][1]) > 0.1  # y offset moves the ray vertically
    # Unit directions.
    np.testing.assert_allclose(np.linalg.norm(d, axis=1), 1.0, rtol=1e-5)


def test_negative_aspect_flips_horizontal():
    cam_pos = make_camera((0, 0, -3), (0, 0, 0), (0, 1, 0), aspect_ratio=1.0)
    cam_neg = make_camera((0, 0, -3), (0, 0, 0), (0, 1, 0), aspect_ratio=-1.0)
    x = jnp.array([0.5])
    y = jnp.array([0.0])
    d_pos = np.asarray(shoot_rays(cam_pos, x, y, 0.0, 0.0, jax.random.PRNGKey(0)).direction)
    d_neg = np.asarray(shoot_rays(cam_neg, x, y, 0.0, 0.0, jax.random.PRNGKey(0)).direction)
    np.testing.assert_allclose(d_pos[0][0], -d_neg[0][0], atol=1e-6)


def test_pixel_jitter_bounded():
    cam = make_camera((0, 0, 0), (0, 0, 1), (0, 1, 0))
    n = 4096
    pw = 0.125
    rays = shoot_rays(cam, jnp.zeros(n), jnp.zeros(n), pw, pw, jax.random.PRNGKey(3))
    d = np.asarray(rays.direction)
    # Sensor offset = x + jitter*pw with jitter in [-.5, .5]; the ray direction
    # projection onto right/up must stay within the half-pixel footprint.
    tan_x = d[:, 0] / d[:, 2]
    # Sensor half-height 0.5 scales sensor offsets by 0.5 in tan space.
    assert np.all(np.abs(tan_x) <= pw / 2 * 0.5 * 1.01)
    assert np.abs(tan_x).max() > pw / 8 * 0.5  # jitter actually spreads


def test_circular_aperture_disk():
    x, y = _sample_circular(jax.random.PRNGKey(0), (8192,))
    r2 = np.asarray(x) ** 2 + np.asarray(y) ** 2
    assert r2.max() <= 1.0 + 1e-6
    # Uniform disk: mean r^2 = 1/2.
    np.testing.assert_allclose(r2.mean(), 0.5, atol=0.02)


def test_hexagonal_aperture_in_bounds():
    hr = 0.5
    x, y = _sample_hexagonal(jax.random.PRNGKey(1), (8192,), hr)
    x = np.asarray(x)
    y = np.asarray(y)
    assert np.all(np.abs(x) <= 1.0 + 1e-6)
    assert np.all(np.abs(y) <= 1.0 + 1e-6)
    # Accept rule: rel_x <= 0 or rel_x/(1-hr) >= y for |x|,|y|
    # (ref: camera.cpp:25-49).
    rel = np.abs(x) - hr
    ok = (rel <= 0) | (rel / (1 - hr) >= np.abs(y))
    assert ok.mean() > 0.999
    # Sign symmetry.
    assert abs(np.mean(np.sign(x))) < 0.05
    assert abs(np.mean(np.sign(y))) < 0.05


def test_thin_lens_focuses_at_focal_plane():
    fp = 3.5
    cam = make_camera(
        (0, 0, -3),
        (0, 0, 0),
        (0, 1, 0),
        aperture_width=0.2,
        aperture_height=0.2,
        aperture=APERTURE_CIRCULAR,
        focal_plane_dist=fp,
    )
    n = 512
    rays = shoot_rays(cam, jnp.full((n,), 0.3), jnp.full((n,), -0.2), 0.0, 0.0, jax.random.PRNGKey(7))
    o = np.asarray(rays.origin)
    d = np.asarray(rays.direction)
    # Aperture spreads origins.
    assert o[:, 0].std() > 1e-3
    # All rays converge at the focal plane: o + t*d equal across rays where
    # the ray reaches forward distance fp (ref: camera.cpp:102-110).
    fwd = np.array([0, 0, 1.0])
    t = fp / (d @ fwd)
    pts = o + d * t[:, None]
    assert pts.std(axis=0).max() < 1e-4


def test_aperture_quirk_x_along_up():
    # The reference applies the aperture x offset along `up` and y along
    # `right` (ref: camera.cpp:99). With a wide ap_x-only aperture the ray
    # origins must spread along up (y axis here).
    cam = make_camera(
        (0, 0, -3), (0, 0, 0), (0, 1, 0),
        aperture_width=0.5, aperture_height=0.0,
        aperture=APERTURE_CIRCULAR, focal_plane_dist=3.0,
    )
    rays = shoot_rays(cam, jnp.zeros(256), jnp.zeros(256), 0.0, 0.0, jax.random.PRNGKey(9))
    o = np.asarray(rays.origin)
    assert o[:, 1].std() > 1e-3  # spread along up
    assert o[:, 0].std() < 1e-8  # none along right
