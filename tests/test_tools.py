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


def test_makesky_matches_cpp_imgtool(tmp_path):
    """imgtool makesky: the Hosek-Wilkie implementation (datasets read
    from the upstream data header, model re-implemented in
    tools/hosek_sky.py) must match the C++ imgtool's output bit-for-bit
    after half-float EXR quantization (measured round 2: maxdiff 0.0 at
    res 32, elevation 20, turbidity 4)."""
    import os
    import subprocess

    import pytest

    from tools.hosek_sky import load_datasets

    if load_datasets() is None:
        pytest.skip("Hosek datasets unavailable")
    out_py = str(tmp_path / "sky_py.exr")
    assert imgtool(["makesky", "--resolution", "24", "--elevation", "35",
                    "--turbidity", "6", "--outfile", out_py]) == 0
    img = tio.read_image(out_py)
    assert np.isfinite(img).all() and img.max() > 0
    # (at res 24 the 0.255-degree solar disc falls between pixel centres
    # — same point sampling as the C++ tool — so no sun-brightness check
    # here; the bit-exact comparison below covers the disc at any res)
    cpp = None
    for c in ("/tmp/refbuild-out/bin/imgtool", "/tmp/refbuild/bin/imgtool"):
        if os.path.isfile(c) and os.access(c, os.X_OK):
            cpp = c
            break
    if cpp is None:
        pytest.skip("C++ imgtool not built (make -C refbuild)")
    out_cpp = str(tmp_path / "sky_cpp.exr")
    subprocess.run([cpp, "makesky", "--resolution", "24", "--elevation",
                    "35", "--turbidity", "6", "--outfile", out_cpp],
                   check=True, cwd=str(tmp_path))
    ref = tio.read_image(out_cpp)
    np.testing.assert_allclose(img, ref, atol=1e-6)
