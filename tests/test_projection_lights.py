"""Projection + goniometric light tests (lights/projection.cpp,
lights/goniometric.cpp analogs)."""

import numpy as np
import pytest

import tpurt.io as tio
from tpurt.render.driver import render
from tpurt.scene import load_scene_string


def _wall_scene(light_lines):
    return f"""
    Film "image" "integer xresolution" [24] "integer yresolution" [24]
    Sampler "random" "integer pixelsamples" [8]
    Integrator "path" "integer maxdepth" [2]
    Camera "perspective" "float fov" [70]
    WorldBegin
    {light_lines}
    Material "matte" "color Kd" [.7 .7 .7]
    Shape "trianglemesh" "integer indices" [0 1 2 0 2 3]
      "point P" [-6 -6 4  6 -6 4  6 6 4  -6 6 4]
    WorldEnd
    """


def test_projection_light_projects_image(tmp_path):
    """A half-bright/half-dark slide projects onto the wall: one side lit,
    the other dark, and corners outside the fov cone unlit; flipping the
    slide flips the lit side."""
    img = np.zeros((8, 8, 3), np.float32)
    img[:, 4:] = 1.0  # right half bright
    p1 = str(tmp_path / "slide.exr")
    tio.write_image(p1, img)
    p2 = str(tmp_path / "slide_flip.exr")
    tio.write_image(p2, img[:, ::-1].copy())

    def render_with(path):
        out, _ = render(load_scene_string(_wall_scene(
            f'LightSource "projection" "color I" [60 60 60] '
            f'"float fov" [40] "string mapname" "{path}"')), progress=False)
        return out

    r1 = render_with(p1)
    r2 = render_with(p2)
    assert np.isfinite(r1).all()
    left1 = r1[:, :12].mean()
    right1 = r1[:, 12:].mean()
    lo, hi = sorted([left1, right1])
    assert hi > 3 * max(lo, 1e-5), (left1, right1)
    # flipped slide flips the bright side
    left2 = r2[:, :12].mean()
    right2 = r2[:, 12:].mean()
    assert (left1 > right1) != (left2 > right2)
    # wall corners are outside the 40-degree cone: dark
    assert r1[0, 0].max() < 1e-3 and r1[-1, -1].max() < 1e-3


def test_projection_light_cone_limits():
    """Without a slide, the projection light is a uniform cone: the wall
    center is lit, far corners are not (projection.cpp Projection screen
    bounds)."""
    img, _ = render(load_scene_string(_wall_scene(
        'LightSource "projection" "color I" [60 60 60] "float fov" [30]')),
        progress=False)
    assert img[12, 12].mean() > 0.1
    assert img[0, 0].max() < 1e-3


def test_goniometric_constant_map_matches_point(tmp_path):
    """A goniometric light with a constant map equals a point light of the
    same intensity (goniometric.h Scale == 1)."""
    flat = np.ones((4, 8, 3), np.float32)
    p = str(tmp_path / "gonio.exr")
    tio.write_image(p, flat)
    img_g, _ = render(load_scene_string(_wall_scene(
        f'LightSource "goniometric" "color I" [60 60 60] '
        f'"string mapname" "{p}"')), progress=False)
    img_p, _ = render(load_scene_string(_wall_scene(
        'LightSource "point" "color I" [60 60 60]')), progress=False)
    sel = img_p.mean(-1) > 0.05
    assert sel.sum() > 100
    np.testing.assert_allclose(img_g[sel], img_p[sel], rtol=0.05, atol=1e-3)


def test_goniometric_directional_map(tmp_path):
    """A map that is dark toward the wall dims the wall (direction
    dependence flows through the spherical lookup)."""
    # after the reference's y/z swap, the lookup pole is light-space +y;
    # the wall direction (+z light space) lands on the equator theta=pi/2,
    # phi = pi/2 -> s = 0.25.  Zero out that column region.
    m = np.ones((8, 16, 3), np.float32)
    m[:, 2:6] = 0.0
    p = str(tmp_path / "gonio_dir.exr")
    tio.write_image(p, m)
    img_g, _ = render(load_scene_string(_wall_scene(
        f'LightSource "goniometric" "color I" [60 60 60] '
        f'"string mapname" "{p}"')), progress=False)
    img_p, _ = render(load_scene_string(_wall_scene(
        'LightSource "point" "color I" [60 60 60]')), progress=False)
    c = 12
    assert img_p[c, c].mean() > 0.1
    assert img_g[c, c].mean() < 0.2 * img_p[c, c].mean()
