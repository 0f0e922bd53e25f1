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


def test_animated_quadric_streaks():
    """Animated QUADRICS (round 2): a sphere translated during the
    shutter must streak like an animated mesh does (TransformedPrimitive
    over a quadric, core/transform.h:412; device TRS slerp in
    intersect.interp_quad_transform).  Also: identical endpoints must
    reproduce the static image."""
    def sphere_scene(xf):
        return f"""
        Film "image" "integer xresolution" [32] "integer yresolution" [32]
        Sampler "random" "integer pixelsamples" [24]
        Integrator "path" "integer maxdepth" [2]
        Camera "perspective" "float fov" [40]
        WorldBegin
        LightSource "distant" "color L" [6 6 6]
          "point from" [0 0 0] "point to" [0 0 1]
        Material "matte" "color Kd" [.8 .8 .8]
        AttributeBegin
          {xf}
          Translate 0 0 5
          Shape "sphere" "float radius" [0.5]
        AttributeEnd
        WorldEnd
        """

    img_static, _ = render(load_scene_string(sphere_scene(
        "Translate -0.6 0 0")), progress=False)
    img_same, _ = render(load_scene_string(sphere_scene(
        "ActiveTransform All\n          Translate -0.6 0 0")),
        progress=False)
    np.testing.assert_allclose(np.asarray(img_same), np.asarray(img_static),
                               atol=3e-3)

    moving = sphere_scene("""ActiveTransform StartTime
          Translate -0.6 0 0
          ActiveTransform EndTime
          Translate 0.6 0 0
          ActiveTransform All""")
    img_m, _ = render(load_scene_string(moving), progress=False)
    img_m = np.asarray(img_m)
    s = np.asarray(img_static)
    assert np.isfinite(img_m).all()
    lit = (img_m[..., 0] > 0.02)
    lit_static = (s[..., 0] > 0.02)
    # the streak must cover BOTH endpoint positions...
    left = lit_static
    right = lit_static[:, ::-1]  # mirrored endpoint (+0.6 is the mirror)
    assert (lit & left).sum() > 0.5 * left.sum()
    assert (lit & right).sum() > 0.5 * right.sum()
    # ...and each endpoint region is dimmer than the static sphere
    # (each shutter time sees the sphere in only part of the streak)
    assert img_m[left].mean() < 0.8 * s[left].mean()
