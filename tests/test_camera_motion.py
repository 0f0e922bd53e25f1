"""Animated camera (AnimatedTransform) + shutter tests."""

import numpy as np

from tpurt.render.driver import render
from tpurt.scene import load_scene_string


def _scene(pre_camera):
    return f"""
    Film "image" "integer xresolution" [32] "integer yresolution" [32]
    Sampler "random" "integer pixelsamples" [16]
    Integrator "path" "integer maxdepth" [2]
    {pre_camera}
    Camera "perspective" "float fov" [40]
    WorldBegin
    AttributeBegin
      AreaLightSource "area" "color L" [30 30 30] "bool twosided" "true"
      Translate 0 0 5
      Shape "sphere" "float radius" [0.3]
    AttributeEnd
    WorldEnd
    """


def test_identical_endpoints_match_static():
    """Decompose -> slerp -> compose round-trips: identical transform
    endpoints render exactly like a static camera."""
    static = """
    Translate 0.3 -0.2 0
    Rotate 10 0 1 0
    """
    animated = """
    TransformTimes 0 1
    ActiveTransform All
    Translate 0.3 -0.2 0
    Rotate 10 0 1 0
    """
    img_s, _ = render(load_scene_string(_scene(static)), progress=False)
    img_a, _ = render(load_scene_string(_scene(animated)), progress=False)
    np.testing.assert_allclose(img_a, img_s, atol=2e-3)


def test_moving_camera_streaks():
    """A camera translated across the shutter smears the bright sphere
    into a streak: more lit pixels, lower peak."""
    moving = """
    TransformTimes 0 1
    ActiveTransform EndTime
    Translate 1.2 0 0
    ActiveTransform All
    """
    img_s, _ = render(load_scene_string(_scene("")), progress=False)
    img_m, _ = render(load_scene_string(_scene(moving)), progress=False)
    assert np.isfinite(img_m).all()
    lit_s = (img_s[..., 0] > 1.0).sum()
    lit_m = (img_m[..., 0] > 1.0).sum()
    assert lit_m > 1.5 * lit_s, (lit_s, lit_m)
    # energy is conserved within noise (same sphere, just smeared)
    np.testing.assert_allclose(img_m.sum(), img_s.sum(), rtol=0.15)
