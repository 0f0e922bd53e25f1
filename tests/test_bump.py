"""Bump mapping tests (core/material.cpp Bump analog)."""

import numpy as np

from tpurt.render.driver import render
from tpurt.scene import load_scene_string


def _scene(tex_and_mat):
    return f"""
    Film "image" "integer xresolution" [24] "integer yresolution" [24]
    Sampler "random" "integer pixelsamples" [8]
    Integrator "path" "integer maxdepth" [2]
    Camera "perspective" "float fov" [40]
    WorldBegin
    LightSource "distant" "color L" [3 3 3] "point from" [4 2 0] "point to" [0 0 4]
    {tex_and_mat}
    Translate 0 0 4
    Shape "sphere" "float radius" [1]
    WorldEnd
    """


def test_constant_bump_is_identity():
    """A constant displacement has zero gradient: the render must match
    the unbumped one exactly (Bump perturbs by finite differences)."""
    flat = _scene("""
    Texture "b" "float" "constant" "float value" [0.7]
    Material "matte" "color Kd" [.6 .6 .6] "texture bumpmap" "b"
    """)
    none = _scene('Material "matte" "color Kd" [.6 .6 .6]')
    img_f, _ = render(load_scene_string(flat), progress=False)
    img_n, _ = render(load_scene_string(none), progress=False)
    np.testing.assert_allclose(img_f, img_n, atol=2e-3)


def test_procedural_bump_perturbs_shading():
    """An fbm displacement visibly changes the shading (normals wiggle),
    without changing the silhouette."""
    bumped = _scene("""
    Texture "b" "float" "fbm" "integer octaves" [4] "float roughness" [0.6]
    Material "matte" "color Kd" [.6 .6 .6] "texture bumpmap" "b"
    """)
    none = _scene('Material "matte" "color Kd" [.6 .6 .6]')
    img_b, _ = render(load_scene_string(bumped), progress=False)
    img_n, _ = render(load_scene_string(none), progress=False)
    assert np.isfinite(img_b).all()
    sil_b = img_b.mean(-1) > 1e-4
    sil_n = img_n.mean(-1) > 1e-4
    assert (sil_b == sil_n).mean() > 0.97  # same silhouette
    lit = sil_n & sil_b
    diff = np.abs(img_b - img_n).mean(-1)[lit]
    assert diff.mean() > 0.005, diff.mean()
