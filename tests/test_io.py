"""Image IO round-trip tests (reference analog: tests/imageio.cpp:83-89)."""

import numpy as np
import pytest

from tpurt.io import exr, image


@pytest.fixture
def rgb():
    rng = np.random.default_rng(0)
    return rng.uniform(0, 4, size=(33, 47, 3)).astype(np.float32)


def test_exr_roundtrip_float_none(tmp_path, rgb):
    p = str(tmp_path / "a.exr")
    exr.write_exr_rgb(p, rgb, half=False)
    back = exr.read_exr_rgb(p)
    np.testing.assert_array_equal(back, rgb)


def test_exr_roundtrip_half_zip(tmp_path, rgb):
    p = str(tmp_path / "a.exr")
    exr.write_exr(
        p,
        {"R": rgb[..., 0], "G": rgb[..., 1], "B": rgb[..., 2]},
        half=True,
        compression=exr.ZIP_COMPRESSION,
    )
    back = exr.read_exr_rgb(p)
    np.testing.assert_allclose(back, rgb.astype(np.float16).astype(np.float32))


def test_exr_roundtrip_zips_float(tmp_path, rgb):
    p = str(tmp_path / "a.exr")
    exr.write_exr(
        p,
        {"R": rgb[..., 0], "G": rgb[..., 1], "B": rgb[..., 2]},
        half=False,
        compression=exr.ZIPS_COMPRESSION,
    )
    back = exr.read_exr_rgb(p)
    np.testing.assert_array_equal(back, rgb)


def test_exr_tall_image_multi_block(tmp_path):
    # >16 scanlines exercises multiple ZIP blocks.
    rng = np.random.default_rng(1)
    img = rng.standard_normal((70, 20, 3)).astype(np.float32)
    p = str(tmp_path / "tall.exr")
    exr.write_exr_rgb(p, img, half=False)
    np.testing.assert_array_equal(exr.read_exr_rgb(p), img)


def test_pfm_roundtrip(tmp_path, rgb):
    p = str(tmp_path / "a.pfm")
    image.write_pfm(p, rgb)
    np.testing.assert_array_equal(image.read_pfm(p), rgb)


def test_png_roundtrip(tmp_path):
    rng = np.random.default_rng(2)
    u8 = rng.integers(0, 256, size=(21, 17, 3), dtype=np.uint8)
    p = str(tmp_path / "a.png")
    image.write_png(p, u8)
    np.testing.assert_array_equal(image.read_png(p), u8)


def test_write_read_image_dispatch(tmp_path, rgb):
    p = str(tmp_path / "img.exr")
    image.write_image(p, rgb)
    back = image.read_image(p)
    assert back.shape == rgb.shape
    np.testing.assert_allclose(back, rgb, rtol=2e-3, atol=2e-3)  # half precision


def test_gamma_roundtrip():
    v = np.linspace(0, 1, 64, dtype=np.float32)
    np.testing.assert_allclose(
        image.inverse_gamma_correct(image.gamma_correct(v)), v, atol=1e-6
    )
