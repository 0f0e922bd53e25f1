"""Texture evaluation tests (reference analog: src/textures/* Evaluate).
Covers the device DAG evaluation + the end-to-end textured render path
(BASELINE.json config #5 exercises texture lookup)."""

import numpy as np
import pytest

from tpurt.io.exr import write_exr_rgb
from tpurt.render.driver import render
from tpurt.scene import load_scene_string


def test_checkerboard_scene():
    scene = """
    Film "image" "integer xresolution" [32] "integer yresolution" [32]
    Sampler "halton" "integer pixelsamples" [4]
    Integrator "directlighting"
    Camera "perspective" "float fov" [50]
    WorldBegin
    LightSource "distant" "color L" [3 3 3] "point from" [0 5 0] "point to" [0 0 0]
    Texture "checks" "spectrum" "checkerboard"
      "float uscale" [4] "float vscale" [4]
      "rgb tex1" [1 0 0] "rgb tex2" [0 0 1]
    Material "matte" "texture Kd" "checks"
    Shape "trianglemesh" "point P" [-2 -1 2  2 -1 2  2 -1 6  -2 -1 6]
      "float uv" [0 0  1 0  1 1  0 1]
      "integer indices" [0 1 2 2 3 0]
    WorldEnd
    """
    img, _ = render(load_scene_string(scene), progress=False)
    assert np.isfinite(img).all()
    lit = img[img.sum(-1) > 0.01]
    assert len(lit) > 50
    # both checker colors appear: some pixels red-dominant, some blue
    red = lit[lit[:, 0] > 2 * lit[:, 2]]
    blue = lit[lit[:, 2] > 2 * lit[:, 0]]
    assert len(red) > 10 and len(blue) > 10, (len(red), len(blue))


def test_imagemap_scene(tmp_path):
    # horizontal gradient texture
    tex = np.zeros((8, 8, 3), np.float32)
    tex[:, :, 1] = np.linspace(0, 1, 8)[None, :]
    path = str(tmp_path / "grad.exr")
    write_exr_rgb(path, tex, half=False)
    scene = f"""
    Film "image" "integer xresolution" [32] "integer yresolution" [32]
    Sampler "halton" "integer pixelsamples" [4]
    Integrator "directlighting"
    Camera "perspective" "float fov" [50]
    WorldBegin
    LightSource "distant" "color L" [3 3 3] "point from" [0 5 0] "point to" [0 0 0]
    Texture "grad" "spectrum" "imagemap" "string filename" "{path}"
    Material "matte" "texture Kd" "grad"
    Shape "trianglemesh" "point P" [-2 -1 2  2 -1 2  2 -1 6  -2 -1 6]
      "float uv" [0 0  1 0  1 1  0 1]
      "integer indices" [0 1 2 2 3 0]
    WorldEnd
    """
    img, _ = render(load_scene_string(scene), progress=False)
    assert np.isfinite(img).all()
    # green increases with u (left->right on the quad seen from above)
    g = img[..., 1]
    rows = g[g.sum(-1) > 0].reshape(-1, g.shape[1]) if False else g
    lit_cols = np.where(g.sum(0) > 0.01)[0]
    assert len(lit_cols) > 8
    left = g[:, lit_cols[: len(lit_cols) // 3]].mean()
    right = g[:, lit_cols[-len(lit_cols) // 3:]].mean()
    assert (right > 1.5 * left) or (left > 1.5 * right)  # monotone gradient


def test_noise_textures_evaluate():
    """fbm/marble/windy evaluate to finite values over hit buffers."""
    import jax.numpy as jnp

    from tpurt.render.texeval import eval_texture, fbm, perlin_noise
    from tpurt.scene.records import TextureRecord

    rng = np.random.default_rng(0)
    p = jnp.asarray(rng.uniform(-10, 10, (128, 3)).astype(np.float32))
    n = np.asarray(perlin_noise(p))
    assert np.isfinite(n).all() and (np.abs(n) <= 1.5).all()
    assert n.std() > 0.05  # actually varies

    class FakeSI:
        pass

    si = FakeSI()
    si.p = p
    si.uv = jnp.asarray(rng.uniform(0, 1, (128, 2)).astype(np.float32))
    for name, params in [
        ("fbm", {"octaves": 4, "roughness": 0.5}),
        ("wrinkled", {"octaves": 4, "roughness": 0.5}),
        ("windy", {}),
        ("marble", {"octaves": 4, "roughness": 0.5, "scale": 1.0,
                    "variation": 0.2}),
    ]:
        rec = TextureRecord(name, "float", params)
        v = np.asarray(eval_texture(rec, si, name == "marble"))
        assert np.isfinite(v).all(), name


def test_ptex_parses_and_warns(caplog):
    """Texture "ptex" (textures/ptex.cpp) is environment-gated: the scene
    must PARSE, warn about the substitution, and still render (the shim
    build of the C++ reference stubs ptex the same way)."""
    import logging

    import numpy as np

    from tpurt.render.driver import render
    from tpurt.scene import load_scene_string

    scene = """
    Film "image" "integer xresolution" [16] "integer yresolution" [16]
    Sampler "random" "integer pixelsamples" [1]
    Integrator "path" "integer maxdepth" [2]
    Camera "perspective" "float fov" [60]
    WorldBegin
    LightSource "distant" "color L" [3 3 3] "point from" [0 5 5] "point to" [0 0 0]
    Texture "skin" "color" "ptex" "string filename" "missing.ptx"
    Material "matte" "texture Kd" "skin"
    Translate 0 0 4
    Shape "sphere" "float radius" [1]
    WorldEnd
    """
    with caplog.at_level(logging.WARNING):
        sd = load_scene_string(scene)
    assert any("ptex" in r.message for r in caplog.records)
    img, _ = render(sd, progress=False)
    img = np.asarray(img)
    assert np.isfinite(img).all() and img.max() > 0.01
