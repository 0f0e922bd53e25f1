"""End-to-end subsurface material tests (materials/subsurface.cpp +
path.cpp:153-174 analog)."""

import numpy as np

from tpurt.render.driver import render
from tpurt.scene import load_scene_string


def _render(mat_lines, spp=32, maxdepth=6):
    scene = f"""
    Film "image" "integer xresolution" [24] "integer yresolution" [24]
    Sampler "random" "integer pixelsamples" [{spp}]
    Integrator "path" "integer maxdepth" [{maxdepth}]
    Camera "perspective" "float fov" [40]
    WorldBegin
    AttributeBegin
      AreaLightSource "area" "color L" [12 12 12]
      Translate 0 3 2
      Shape "sphere" "float radius" [0.7]
    AttributeEnd
    {mat_lines}
    Translate 0 0 4
    Shape "sphere" "float radius" [1]
    WorldEnd
    """
    img, _ = render(load_scene_string(scene), progress=False)
    return img


def test_subsurface_sphere_scatters_light():
    """A dense scattering subsurface sphere returns light (the BSSRDF hop
    contributes): brighter than a black surface, finite, bounded."""
    img = _render('Material "subsurface" "float scale" [20]'
                  ' "color sigma_s" [2.55 3.21 3.77]'
                  ' "color sigma_a" [0.001 0.002 0.01]')
    assert np.isfinite(img).all()
    sphere = img[8:20, 6:18].mean(axis=-1)
    assert sphere.mean() > 0.05, sphere.mean()
    assert img.max() < 40.0  # bounded energy


def test_kdsubsurface_brightness_tracks_kd():
    """kdsubsurface with higher diffuse reflectance is brighter (the
    SubsurfaceFromDiffuse inversion feeds through the render)."""
    lo = _render('Material "kdsubsurface" "color Kd" [.1 .1 .1]'
                 ' "float mfp" [0.05]')
    hi = _render('Material "kdsubsurface" "color Kd" [.8 .8 .8]'
                 ' "float mfp" [0.05]')
    assert np.isfinite(lo).all() and np.isfinite(hi).all()
    m_lo = lo[8:20, 6:18].mean()
    m_hi = hi[8:20, 6:18].mean()
    assert m_hi > 2.0 * m_lo, (m_lo, m_hi)


def test_subsurface_preset_parses():
    img = _render('Material "subsurface" "string name" "Skin1"'
                  ' "float scale" [5]', spp=8, maxdepth=4)
    assert np.isfinite(img).all()
