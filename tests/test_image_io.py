"""PNG round-trip tests (ref: test/image/image_io_test.cpp): encode->decode
within 1/256 quantization error, deterministic random test image."""
import numpy as np

from cpupathtrace_tpu.utils.image_io import read_rgb_image, write_rgb_image


def get_test_image(width=256, height=128, seed=1234):
    """Deterministic random RGBA image (ref: test/test_utils.cpp:13-25)."""
    rng = np.random.default_rng(seed)
    return rng.uniform(0.0, 1.0, size=(height, width, 4)).astype(np.float32)


def test_roundtrip(tmp_path):
    img = get_test_image()
    path = tmp_path / "roundtrip.png"
    write_rgb_image(path, img)
    back = read_rgb_image(path)
    assert back.shape == img.shape
    # 8-bit quantization bound (ref: image_io_test.cpp:29-39, eps=0.004).
    np.testing.assert_allclose(back, img, atol=0.004)


def test_rgb_input_gets_opaque_alpha(tmp_path):
    img = get_test_image(64, 32)[..., :3]
    path = tmp_path / "rgb.png"
    write_rgb_image(path, img)
    back = read_rgb_image(path)
    assert back.shape == (32, 64, 4)
    np.testing.assert_allclose(back[..., 3], 1.0)


def test_clamping(tmp_path):
    img = np.array([[[2.0, -1.0, 0.5, 1.0]]], dtype=np.float32)
    path = tmp_path / "clamp.png"
    write_rgb_image(path, img)
    back = read_rgb_image(path)
    np.testing.assert_allclose(back[0, 0, 0], 1.0)
    np.testing.assert_allclose(back[0, 0, 1], 0.0)
    np.testing.assert_allclose(back[0, 0, 2], 0.5, atol=0.004)


def test_16bit_png_strips_high_byte(tmp_path):
    """16-bit PNGs strip to the high byte like the reference's
    PNG_TRANSFORM_STRIP_16 (image_io.cpp:58) — a direct RGBA convert
    would clip bright values to 1.0 instead."""
    from PIL import Image as PILImage

    arr16 = (np.arange(16, dtype=np.uint16).reshape(4, 4) * 4096)
    p = str(tmp_path / "g16.png")
    PILImage.fromarray(arr16).save(p)
    out = read_rgb_image(p)
    assert out.shape == (4, 4, 4)
    expect = (arr16 >> 8).astype(np.float32) / 255.0
    np.testing.assert_allclose(out[..., 0], expect, atol=1e-6)
    np.testing.assert_array_equal(out[..., 3], np.ones((4, 4), np.float32))
