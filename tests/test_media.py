"""Participating media tests (reference analog: media/homogeneous.cpp +
integrators/volpath.cpp)."""

import numpy as np
import pytest

from tpurt.render.driver import render
from tpurt.scene import load_scene_string


def test_absorbing_fog_attenuates_beer_lambert():
    """Camera in a purely absorbing medium sees an emitter at distance 3
    attenuated by exp(-sigma_a * d).  (Absorption-only media terminate the
    medium-scatter paths with sigma_s = 0, so the surviving surface paths
    estimate Le * Tr, like the reference.)"""
    sigma_a = 0.2
    scene = f"""
    Film "image" "integer xresolution" [24] "integer yresolution" [24]
    Sampler "random" "integer pixelsamples" [64]
    Integrator "volpath" "integer maxdepth" [2]
    MakeNamedMedium "fog" "string type" "homogeneous"
      "rgb sigma_a" [{sigma_a} {sigma_a} {sigma_a}] "rgb sigma_s" [0 0 0]
    MediumInterface "" "fog"
    Camera "perspective" "float fov" [30]
    WorldBegin
    AttributeBegin
      AreaLightSource "area" "color L" [4 4 4] "bool twosided" "true"
      Translate 0 0 3
      Shape "sphere" "float radius" [1]
    AttributeEnd
    WorldEnd
    """
    img, _ = render(load_scene_string(scene), progress=False)
    assert np.isfinite(img).all()
    # pixels on the sphere: expected 4 * exp(-0.2 * 2) (sphere front at z=2)
    hot = img[..., 0][img[..., 0] > 1.0]
    want = 4.0 * np.exp(-sigma_a * 2.0)
    assert len(hot) > 30
    np.testing.assert_allclose(hot.mean(), want, rtol=0.08)


def test_volpath_without_media_matches_path():
    scene_t = """
    Film "image" "integer xresolution" [24] "integer yresolution" [24]
    Sampler "halton" "integer pixelsamples" [4]
    Integrator "{integ}" "integer maxdepth" [3]
    Camera "perspective" "float fov" [60]
    WorldBegin
    LightSource "point" "color I" [10 10 10] "point from" [0 3 4]
    Material "matte" "color Kd" [.6 .6 .6]
    Translate 0 0 4
    Shape "sphere" "float radius" [1]
    WorldEnd
    """
    img_p, _ = render(load_scene_string(scene_t.format(integ="path")),
                      progress=False)
    img_v, _ = render(load_scene_string(scene_t.format(integ="volpath")),
                      progress=False)
    np.testing.assert_allclose(img_v, img_p, atol=1e-5)


def test_scattering_fog_glows():
    """A scattering medium around a point light produces in-scattered
    radiance on camera rays that hit nothing."""
    scene = """
    Film "image" "integer xresolution" [24] "integer yresolution" [24]
    Sampler "random" "integer pixelsamples" [16]
    Integrator "volpath" "integer maxdepth" [3]
    MakeNamedMedium "fog" "string type" "homogeneous"
      "rgb sigma_a" [0.01 0.01 0.01] "rgb sigma_s" [0.3 0.3 0.3] "float g" [0]
    MediumInterface "" "fog"
    Camera "perspective" "float fov" [60]
    WorldBegin
    LightSource "point" "color I" [20 20 20] "point from" [0 0 4]
    WorldEnd
    """
    img, _ = render(load_scene_string(scene), progress=False)
    assert np.isfinite(img).all()
    # no surfaces at all: radiance comes ONLY from in-scattering
    assert img.mean() > 0.01, img.mean()


def test_medium_interface_crossing():
    """A null-material sphere bounding a fog volume: rays attenuate only
    inside it."""
    scene = """
    Film "image" "integer xresolution" [24] "integer yresolution" [24]
    Sampler "random" "integer pixelsamples" [32]
    Integrator "volpath" "integer maxdepth" [4]
    MakeNamedMedium "smoke" "string type" "homogeneous"
      "rgb sigma_a" [0.4 0.4 0.4] "rgb sigma_s" [0 0 0]
    Camera "perspective" "float fov" [40]
    WorldBegin
    AttributeBegin
      AreaLightSource "area" "color L" [4 4 4] "bool twosided" "true"
      Translate 0 0 6
      Shape "sphere" "float radius" [1]
    AttributeEnd
    AttributeBegin
      Material "none"
      MediumInterface "smoke" ""
      Translate 0 0 3
      Shape "sphere" "float radius" [1]
    AttributeEnd
    WorldEnd
    """
    img, _ = render(load_scene_string(scene), progress=False)
    assert np.isfinite(img).all()
    hot = img[..., 0][img[..., 0] > 0.5]
    assert len(hot) > 20
    # center rays pass through 2 units of smoke: 4*exp(-0.8) ~ 1.8;
    # the emitter is visible but dimmed below 4
    assert hot.mean() < 3.6
    assert hot.mean() > 1.0
