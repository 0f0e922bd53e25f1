"""Realistic-camera lens system tests.

Reference analog: cameras/realistic.cpp has no upstream unit tests; here
the thick-lens focusing and the trace itself are validated against
first-principles optics: a point source at the focus distance must image
onto the film plane (z=0) through a simple biconvex lens.
"""

import os

import numpy as np
import pytest

from tpurt.render.lenses import (build_lens_system, focus_thick_lens,
                                 load_lens_file, trace_from_film_np,
                                 _trace_from_scene_np)

# biconvex lens (f ~ 35mm), aperture stop, in pbrt .dat format (mm):
# rows are scene-side first: radius thickness ior aperture-diameter
LENS = """# simple biconvex
35.0    4.0   1.5   20.0
-35.0  50.0   1.0   20.0
"""


@pytest.fixture()
def lens_path(tmp_path):
    p = tmp_path / "biconvex.dat"
    p.write_text(LENS)
    return str(p)


def test_load_lens_file(lens_path):
    el = load_lens_file(lens_path, aperture_diameter_mm=10.0)
    assert el.shape == (2, 4)
    np.testing.assert_allclose(el[0], [0.035, 0.004, 1.5, 0.010])
    np.testing.assert_allclose(el[1], [-0.035, 0.050, 1.0, 0.010])


def test_thick_lens_focus_images_point_source(lens_path):
    el = load_lens_file(lens_path, 10.0)
    fd = 1.0  # focus at 1 m
    el[-1, 1] = focus_thick_lens(el, fd, diagonal_m := 0.035)
    # point source on the optical axis at camera z = fd -> lens z = -fd;
    # paraxial bundle through the front element
    n = 16
    front_z = float(np.sum(el[:, 1]))
    heights = np.linspace(-0.002, 0.002, n)  # +-2 mm: paraxial
    o = np.stack([np.zeros(n), np.zeros(n), np.full(n, -fd)], -1)
    target = np.stack([heights, np.zeros(n),
                       np.full(n, -(front_z - 1e-5))], -1)
    d = target - o
    ok, oo, dd = _trace_from_scene_np(el, o, d)
    assert ok.sum() >= n // 2
    # axis crossing: z where x = 0 (film plane is z = 0 in lens space)
    t = -oo[ok, 0] / dd[ok, 0]
    z_cross = oo[ok, 2] + t * dd[ok, 2]
    assert np.all(np.abs(z_cross) < 0.02 * fd), z_cross


def test_exit_pupil_bounds_nonempty(lens_path):
    ls = build_lens_system(lens_path, 10.0, 1.0, 0.035, n_zones=8)
    areas = ((ls.exit_pupil[:, 2] - ls.exit_pupil[:, 0])
             * (ls.exit_pupil[:, 3] - ls.exit_pupil[:, 1]))
    assert np.all(areas > 0)
    assert ls.rear_z > 0


def test_device_trace_matches_numpy(lens_path):
    import jax.numpy as jnp
    from tpurt.render.camera import _trace_lenses_from_film

    el = load_lens_file(lens_path, 10.0)
    el[-1, 1] = focus_thick_lens(el, 1.0, 0.035)
    rng = np.random.default_rng(2)
    n = 256
    o = np.stack([rng.uniform(-0.01, 0.01, n), rng.uniform(-0.01, 0.01, n),
                  np.zeros(n)], -1)
    rear_z = el[-1, 1]
    tgt = np.stack([rng.uniform(-0.005, 0.005, n),
                    rng.uniform(-0.005, 0.005, n),
                    np.full(n, -rear_z)], -1)
    d = tgt - o
    ok_np, o_np, d_np = trace_from_film_np(el, o, d)
    lens_el = tuple(tuple(float(v) for v in row) for row in el)
    ok_j, o_j, d_j = _trace_lenses_from_film(
        lens_el, jnp.asarray(o, jnp.float32), jnp.asarray(d, jnp.float32))
    np.testing.assert_array_equal(np.asarray(ok_j), ok_np)
    np.testing.assert_allclose(np.asarray(o_j)[ok_np], o_np[ok_np],
                               atol=1e-5)
    d_np_n = d_np / np.linalg.norm(d_np, axis=-1, keepdims=True)
    d_j_n = np.asarray(d_j, np.float64)
    d_j_n /= np.linalg.norm(d_j_n, axis=-1, keepdims=True)
    np.testing.assert_allclose(d_j_n[ok_np], d_np_n[ok_np], atol=1e-4)


def test_realistic_camera_end_to_end(lens_path):
    from tpurt.scene import load_scene_string
    from tpurt.render.driver import render

    scene = f"""
Film "image" "integer xresolution" [24] "integer yresolution" [24]
Sampler "random" "integer pixelsamples" [4]
Integrator "path" "integer maxdepth" [2]
Camera "realistic" "string lensfile" ["{lens_path}"]
  "float focusdistance" [2] "float aperturediameter" [8]
WorldBegin
AttributeBegin
  AreaLightSource "area" "color L" [40 40 40] "bool twosided" "true"
  Translate 0 0 2
  Shape "sphere" "float radius" [0.6]
AttributeEnd
WorldEnd
"""
    sd = load_scene_string(scene)
    img, _ = render(sd, progress=False)
    assert np.isfinite(img).all()
    # the emitter in front of the lens must put light on the film
    assert img.max() > 1.0, img.max()
    # center outshines the extreme corner (vignetting / pupil falloff)
    assert img[10:14, 10:14].mean() > img[:2, :2].mean()
