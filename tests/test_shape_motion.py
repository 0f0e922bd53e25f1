"""Animated shape transforms (TransformedPrimitive analog): motion-BVH
leaf lerp by ray time."""

import numpy as np

from tpurt.render.driver import render
from tpurt.scene import load_scene_string

_QUAD = """Shape "trianglemesh" "integer indices" [0 1 2 0 2 3]
      "point P" [-0.4 -0.4 0  0.4 -0.4 0  0.4 0.4 0  -0.4 0.4 0]"""


def _scene(shape_xf):
    return f"""
    Film "image" "integer xresolution" [32] "integer yresolution" [32]
    Sampler "random" "integer pixelsamples" [16]
    Integrator "path" "integer maxdepth" [2]
    Camera "perspective" "float fov" [40]
    WorldBegin
    AttributeBegin
      AreaLightSource "area" "color L" [25 25 25] "bool twosided" "true"
      {shape_xf}
      Translate 0 0 5
      {_QUAD}
    AttributeEnd
    WorldEnd
    """


def test_static_endpoints_match():
    """Identical animated endpoints reproduce the static render exactly
    (delta table of zeros)."""
    static = _scene("Translate 0.2 0.1 0")
    anim = _scene("""ActiveTransform All
      Translate 0.2 0.1 0""")
    img_s, _ = render(load_scene_string(static), progress=False)
    img_a, _ = render(load_scene_string(anim), progress=False)
    np.testing.assert_allclose(img_a, img_s, atol=2e-3)


def test_translated_shape_streaks():
    """A quad translated across the shutter smears into a streak with
    conserved total energy."""
    anim = _scene("""ActiveTransform EndTime
      Translate 1.5 0 0
      ActiveTransform All""")
    img_s, _ = render(load_scene_string(_scene("")), progress=False)
    img_m, _ = render(load_scene_string(anim), progress=False)
    assert np.isfinite(img_m).all()
    lit_s = (img_s[..., 0] > 1.0).sum()
    lit_m = (img_m[..., 0] > 1.0).sum()
    assert lit_m > 1.4 * lit_s, (lit_s, lit_m)
    np.testing.assert_allclose(img_m.sum(), img_s.sum(), rtol=0.15)


def test_moving_occluder_shadows_partially():
    """Shadow rays see the occluder at the lane's time: a blocker that
    covers the light only at shutter END half-shadows the wall."""
    tmpl = """
    Film "image" "integer xresolution" [21] "integer yresolution" [21]
    Sampler "random" "integer pixelsamples" [64]
    Integrator "path" "integer maxdepth" [2]
    Camera "perspective" "float fov" [40]
    WorldBegin
    LightSource "point" "color I" [50 50 50] "point from" [0 0 0]
    {blocker}
    Material "matte" "color Kd" [.6 .6 .6]
    Shape "trianglemesh" "integer indices" [0 1 2 0 2 3]
      "point P" [-3 -3 6  3 -3 6  3 3 6  -3 3 6]
    WorldEnd
    """
    # blocker slides from x=+5 (far away) to x=0 (blocking) over the shutter
    blocker = """
    AttributeBegin
      ActiveTransform StartTime
      Translate 5 0 3
      ActiveTransform EndTime
      Translate 0 0 3
      ActiveTransform All
      Material "matte" "color Kd" [0 0 0]
      Shape "trianglemesh" "integer indices" [0 1 2 0 2 3]
        "point P" [-1.2 -1.2 0  1.2 -1.2 0  1.2 1.2 0  -1.2 1.2 0]
    AttributeEnd
    """
    img_b, _ = render(load_scene_string(tmpl.format(blocker=blocker)),
                      progress=False)
    img_0, _ = render(load_scene_string(tmpl.format(blocker="")),
                      progress=False)
    c = 10
    ratio = img_b[c, c, 0] / img_0[c, c, 0]
    # the 1.2-half-width blocker reaches the axis when |5(1-t)| <= 1.2,
    # i.e. the last ~24% of the shutter: expect ~76% light (a static
    # blocker at either endpoint would give 0% or 100%)
    assert 0.6 < ratio < 0.92, ratio
