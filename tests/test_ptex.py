"""Ptex per-face texturing: container roundtrip (tpurt/io/ptex.py) and
the renderer-visible semantics (textures/ptex.cpp:63-158 — lookups keyed
by si.faceIndex with face-local uv, post-filter gamma).

The reference snapshot's own src/ext/ptex submodule is empty, so the
shim-built C++ binary cannot render ptex at all; these tests pin tpurt's
behavior against the format spec and analytic expectations instead.
"""

import os

import numpy as np
import pytest

from tpurt.io.ptex import (MESH_QUAD, PtexData, PtexError, read_ptex,
                           write_ptex)


def test_roundtrip_float_faces(tmp_path):
    rng = np.random.default_rng(0)
    faces = [rng.uniform(0, 1, (4, 8, 3)).astype(np.float32),
             rng.uniform(0, 1, (16, 2, 3)).astype(np.float32),
             rng.uniform(0, 1, (1, 1, 3)).astype(np.float32)]  # constant enc
    p = str(tmp_path / "a.ptx")
    write_ptex(p, faces)
    got = read_ptex(p)
    assert got.nfaces == 3 and got.nchannels == 3
    assert got.meshtype == MESH_QUAD
    for a, b in zip(faces, got.faces):
        np.testing.assert_array_equal(a, b)


def test_roundtrip_uint8_normalizes(tmp_path):
    faces = [np.arange(4 * 4 * 1, dtype=np.uint8).reshape(4, 4, 1) * 16]
    p = str(tmp_path / "b.ptx")
    write_ptex(p, faces, datatype=np.uint8)
    got = read_ptex(p)
    np.testing.assert_allclose(got.faces[0], faces[0] / 255.0, atol=1e-7)


def test_reader_rejects_garbage(tmp_path):
    p = str(tmp_path / "c.ptx")
    with open(p, "wb") as f:
        f.write(b"NotAPtexFile" + b"\0" * 64)
    with pytest.raises(PtexError):
        read_ptex(p)


_PTEX_SCENE = """
LookAt 0 0 3  0 0 0  0 1 0
Camera "perspective" "float fov" [60]
Film "image" "integer xresolution" [64] "integer yresolution" [32]
  "string filename" "{out}"
Sampler "halton" "integer pixelsamples" [4]
Integrator "directlighting"
WorldBegin
LightSource "distant" "color L" [3.2 3.2 3.2] "point from" [0 0 3]
  "point to" [0 0 0]
Texture "faces" "spectrum" "ptex" "string filename" ["{ptx}"]
  "float gamma" [1]
Material "matte" "texture Kd" "faces"
# two unit quads side by side, each one ptex face (face-local uv)
Shape "trianglemesh"
  "point P" [-2 -1 0  0 -1 0  0 1 0  -2 1 0
              0 -1 0  2 -1 0  2 1 0   0 1 0]
  "integer indices" [0 1 2 0 2 3  4 5 6 4 6 7]
  "integer faceIndices" [0 0 1 1]
  "point2 uv" [0 0  1 0  1 1  0 1  0 0  1 0  1 1  0 1]
WorldEnd
"""


def test_per_face_lookup_renders(tmp_path):
    """Face 0 is red, face 1 is green: the rendered left half must be
    red-dominant and the right half green-dominant, proving faceIndex
    plumbing from the mesh through the interaction to the texture."""
    import tpurt.io as tio
    from tpurt.render.driver import render
    from tpurt.scene import load_scene_string

    faces = [np.broadcast_to(np.asarray([0.9, 0.05, 0.05], np.float32),
                             (8, 8, 3)).copy(),
             np.broadcast_to(np.asarray([0.05, 0.9, 0.05], np.float32),
                             (8, 8, 3)).copy()]
    ptx = str(tmp_path / "faces.ptx")
    write_ptex(ptx, faces)
    scene = _PTEX_SCENE.format(out="x.exr", ptx=ptx)
    sd = load_scene_string(scene, base_dir=str(tmp_path))
    img, _ = render(sd, progress=False)
    img = np.asarray(img)
    # pbrt's LookAt is left-handed: world -x (face 0) lands on screen
    # +x, so face 0 is the RIGHT half of the image
    face0 = img[8:24, 34:48]
    face1 = img[8:24, 16:30]
    assert face0[..., 0].mean() > 4 * face0[..., 1].mean()
    assert face1[..., 1].mean() > 4 * face1[..., 0].mean()


def test_face_local_uv_gradient(tmp_path):
    """A horizontal gradient within ONE face must track the face-local
    u coordinate (bilinear at the stored res)."""
    import tpurt.io as tio
    from tpurt.render.driver import render
    from tpurt.scene import load_scene_string

    g = np.linspace(0.1, 0.9, 16, dtype=np.float32)
    f0 = np.broadcast_to(g[None, :, None], (16, 16, 3)).copy()
    f1 = np.full((4, 4, 3), 0.5, np.float32)
    ptx = str(tmp_path / "grad.ptx")
    write_ptex(ptx, [f0, f1])
    scene = _PTEX_SCENE.format(out="x.exr", ptx=ptx)
    sd = load_scene_string(scene, base_dir=str(tmp_path))
    img, _ = render(sd, progress=False)
    img = np.asarray(img)
    row = img[16, :, 0]
    # face 0 occupies the screen-right half (world -x); its face-local u
    # rises with world x, i.e. right->left on screen
    assert row[36] > row[46] > row[56]
    # face 1 is flat mid-gray (screen-left half)
    flat = img[8:24, 16:30, 0]
    assert flat.std() < 0.05 * flat.mean()
