"""Post-processing invariants (ref: test/post_processing_test.cpp)."""
import jax.numpy as jnp
import numpy as np

from cpupathtrace_tpu.post import gamma_correct, post_process, tone_map
from tests.test_image_io import get_test_image


def test_tone_map_preserves_dimensions():
    img = jnp.asarray(get_test_image(64, 32))
    out = tone_map(img)
    assert out.shape == img.shape
    assert bool(jnp.all(jnp.isfinite(out)))


def test_tone_map_preserves_alpha():
    img = jnp.asarray(get_test_image(32, 16))
    out = tone_map(img)
    np.testing.assert_allclose(np.asarray(out[..., 3]), np.asarray(img[..., 3]))


def test_tone_map_monotone_on_brightness_order():
    # A brighter pixel maps to a >= output brightness (piecewise-linear CDF
    # remap is monotone, ref: post_processing.cpp:130-162).
    img = np.zeros((1, 64, 4), np.float32)
    img[0, :, 0] = np.linspace(0.0, 4.0, 64)
    img[0, :, 3] = 1.0
    out = np.asarray(tone_map(jnp.asarray(img)))
    b = out[0, :, 0]
    assert np.all(np.diff(b) >= -1e-5)


def test_gamma_one_is_identity():
    # (ref: post_processing_test.cpp:21-45)
    img = jnp.asarray(get_test_image(64, 32))
    out = gamma_correct(img, gamma=1.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-6)


def test_gamma_brightens_midtones():
    img = jnp.full((4, 4, 4), 0.25)
    out = np.asarray(gamma_correct(img, gamma=1.8))
    # factor = b^(1/1.8 - 1) > 1 for b < 1.
    assert np.all(out[..., :3] > 0.25)


def test_gamma_black_stays_black():
    img = jnp.zeros((4, 4, 4))
    out = np.asarray(gamma_correct(img))
    np.testing.assert_allclose(out, 0.0)
    assert np.all(np.isfinite(out))


def test_post_process_composition():
    img = jnp.asarray(get_test_image(32, 32))
    np.testing.assert_allclose(
        np.asarray(post_process(img)),
        np.asarray(gamma_correct(tone_map(img))),
        atol=1e-6,
    )
