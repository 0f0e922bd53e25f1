"""Tool tests (tools/imgtool.py — the imgtool.cpp analog)."""

import numpy as np

import tpurt.io as tio
from tools.imgtool import main as imgtool


def test_imgtool_diff_and_convert(tmp_path):
    a = np.full((8, 8, 3), 0.5, np.float32)
    b = a.copy()
    b[0, 0] = 2.0
    pa, pb = str(tmp_path / "a.exr"), str(tmp_path / "b.exr")
    tio.write_image(pa, a)
    tio.write_image(pb, b)
    assert imgtool(["diff", pa, pb]) != 0  # differs
    assert imgtool(["diff", pa, pa]) == 0
    out = str(tmp_path / "c.exr")
    assert imgtool(["convert", pa, out, "--scale", "2"]) == 0
    np.testing.assert_allclose(tio.read_image(out), 1.0, atol=1e-3)


def test_imgtool_makesky(tmp_path):
    out = str(tmp_path / "sky.exr")
    assert imgtool(["makesky", "-o", out, "--elevation", "30",
                    "--resolution", "64"]) == 0
    img = tio.read_image(out)
    assert img.shape == (64, 128, 3)
    assert np.isfinite(img).all() and img.max() > 0
    # upper hemisphere lit, below horizon black; zenith bluer than red
    assert img[:32].max() > 0
    np.testing.assert_allclose(img[56:], 0.0, atol=1e-6)
    zen = img[2].mean(axis=0)
    assert zen[2] > zen[0]
