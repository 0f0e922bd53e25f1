"""--cat / --toply scene echo tests (main/pbrt.cpp --cat analog): the
printed scene must re-parse to the same render."""

import io
import os

import numpy as np

from tpurt.render.driver import render
from tpurt.scene import load_scene_string
from tpurt.scene.catapi import PrintingAPI
from tpurt.scene.parser import parse_string

SCENE = """
LookAt 0 1 -4  0 0 0  0 1 0
Camera "perspective" "float fov" [45]
Film "image" "integer xresolution" [20] "integer yresolution" [20]
Sampler "random" "integer pixelsamples" [4]
Integrator "path" "integer maxdepth" [3]
WorldBegin
LightSource "point" "color I" [12 10 8] "point from" [2 3 -2]
AttributeBegin
  Material "plastic" "color Kd" [.4 .2 .2] "float roughness" [0.2]
  Translate 0 0 1
  Shape "sphere" "float radius" [1]
AttributeEnd
Material "matte" "color Kd" [.6 .6 .6]
Shape "trianglemesh" "integer indices" [0 1 2 0 2 3]
  "point P" [-5 -1 -5  5 -1 -5  5 -1 5  -5 -1 5]
WorldEnd
"""


def _cat(scene_text, **kw):
    buf = io.StringIO()
    api = PrintingAPI(out=buf, **kw)
    parse_string(scene_text, api)
    return buf.getvalue()


def test_cat_round_trips_to_same_render():
    echoed = _cat(SCENE)
    img_a, _ = render(load_scene_string(SCENE), progress=False)
    img_b, _ = render(load_scene_string(echoed), progress=False)
    np.testing.assert_allclose(img_b, img_a, atol=1e-6)
    # and the echo is idempotent
    assert _cat(echoed) == echoed


def test_toply_extracts_big_meshes(tmp_path):
    n = 40  # (n-1)^2 * 2 = 3042 triangles > the 500 threshold
    xs, ys = np.meshgrid(np.linspace(-1, 1, n), np.linspace(-1, 1, n))
    P = np.stack([xs, ys, np.zeros_like(xs)], -1).reshape(-1, 3)
    idx = []
    for j in range(n - 1):
        for i in range(n - 1):
            a = j * n + i
            idx += [[a, a + 1, a + n], [a + 1, a + n + 1, a + n]]
    scene = f"""
    Film "image" "integer xresolution" [8] "integer yresolution" [8]
    Camera "perspective"
    WorldBegin
    Shape "trianglemesh"
      "integer indices" [{' '.join(str(v) for t in idx for v in t)}]
      "point P" [{' '.join('%g' % v for v in P.ravel())}]
    WorldEnd
    """
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        echoed = _cat(scene, to_ply=True, ply_dir=str(tmp_path))
    finally:
        os.chdir(cwd)
    assert 'Shape "plymesh"' in echoed
    assert "integer indices" not in echoed
    ply = tmp_path / "mesh_00000.ply"
    assert ply.exists()
    # the PLY round-trips through the plymesh loader with full geometry
    sd = load_scene_string(echoed, base_dir=str(tmp_path))
    mesh = sd.primitives[0].shape
    assert len(mesh.indices) == len(idx)
    assert len(mesh.vertices) == len(P)
