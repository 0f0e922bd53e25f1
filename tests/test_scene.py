"""Scene front-end tests: tokenizer, paramset, parser, API state machine.

Reference analog: src/tests/parser.cpp (tokenizer basics + file/string
equivalence) plus end-to-end parses of the repo's target scenes."""

import numpy as np
import pytest

from tpurt.scene.tokenizer import Tokenizer
from tpurt.scene.paramset import ParamSet
from tpurt.scene import load_scene, load_scene_string
from tpurt.scene.records import QuadricRecord, TriangleMeshRecord


def toks(s):
    t = Tokenizer(s)
    out = []
    while True:
        tok = t.next()
        if tok is None:
            return out
        out.append((tok.kind, tok.value))


def test_tokenizer_basics():
    assert toks('Shape "sphere" "float radius" [3]') == [
        ("atom", "Shape"), ("string", "sphere"), ("string", "float radius"),
        ("open", "["), ("atom", "3"), ("close", "]"),
    ]


def test_tokenizer_comments_and_negative_numbers():
    assert toks("Translate -1 2.5e3 .5 # comment\nRotate 1 0 0 1") == [
        ("atom", "Translate"), ("atom", "-1"), ("atom", "2.5e3"), ("atom", ".5"),
        ("atom", "Rotate"), ("atom", "1"), ("atom", "0"), ("atom", "0"), ("atom", "1"),
    ]


def test_tokenizer_unterminated_string():
    with pytest.raises(SyntaxError):
        toks('Shape "sphere')


def test_paramset_types():
    ps = ParamSet.from_parsed([
        ("float fov", ["39"]),
        ("integer xresolution", ["700"]),
        ("color L", ["2000", "2000", "2000"]),
        ("bool twosided", ["true"]),
        ("string filename", ["out.exr"]),
        ("point P", ["0", "0", "0", "1", "1", "1"]),
    ])
    assert ps.find_one_float("fov", 90.0) == 39.0
    assert ps.find_one_int("xresolution", 1280) == 700
    np.testing.assert_array_equal(ps.find_one_spectrum("L", 1.0), [2000] * 3)
    assert ps.find_one_bool("twosided", False) is True
    assert ps.find_one_string("filename", "") == "out.exr"
    assert ps.find_point3_array("P").shape == (2, 3)
    # defaults for missing params
    assert ps.find_one_float("nope", 7.5) == 7.5


def test_paramset_blackbody_is_normalized():
    ps = ParamSet.from_parsed([("blackbody L", ["6500", "1"])])
    rgb = ps.find_one_spectrum("L", 1.0)
    # 6500K is near-white; peak-normalized so components are O(1)
    assert rgb.max() < 2.0 and rgb.min() > 0.2


MINI_SCENE = """
LookAt 0 0 5  0 0 0  0 1 0
Camera "perspective" "float fov" [60]
Film "image" "integer xresolution" [64] "integer yresolution" [48]
  "string filename" "mini.exr"
Sampler "halton" "integer pixelsamples" [4]
Integrator "path" "integer maxdepth" [3]
WorldBegin
AttributeBegin
  AreaLightSource "area" "color L" [10 10 10] "integer nsamples" [8]
  Translate 0 3 0
  Shape "sphere" "float radius" [0.5]
AttributeEnd
Material "matte" "color Kd" [.6 .5 .4]
Shape "trianglemesh" "point P" [-1 -1 0  1 -1 0  1 1 0  -1 1 0]
  "integer indices" [0 1 2 2 3 0]
WorldEnd
"""


def test_mini_scene_api_state():
    sc = load_scene_string(MINI_SCENE)
    assert sc.resolution == (64, 48)
    assert sc.output_filename == "mini.exr"
    assert sc.sampler_name == "halton"
    assert sc.sampler_params.find_one_int("pixelsamples", 16) == 4
    assert sc.integrator_name == "path"
    assert len(sc.primitives) == 2
    sphere, mesh = sc.primitives
    assert isinstance(sphere.shape, QuadricRecord) and sphere.shape.kind == "sphere"
    assert sphere.shape.radius == 0.5
    assert sphere.area_light is not None and sphere.area_light.n_samples == 8
    np.testing.assert_array_equal(sphere.area_light.L, [10, 10, 10])
    # sphere translate baked into object_to_world
    np.testing.assert_allclose(sphere.shape.object_to_world.m[:3, 3], [0, 3, 0])
    assert isinstance(mesh.shape, TriangleMeshRecord)
    assert mesh.shape.indices.shape == (2, 3)
    assert mesh.material.name == "matte"
    np.testing.assert_allclose(
        mesh.material.slots["Kd"][1], [0.6, 0.5, 0.4], atol=1e-7
    )
    # attribute stack popped: area light does not leak to the mesh
    assert mesh.area_light is None
    # camera transform: eye at origin+5z looking at origin
    c2w = sc.camera_to_world.m
    np.testing.assert_allclose(c2w[:3, 3], [0, 0, 5], atol=1e-12)


def test_attribute_and_transform_stacks():
    sc = load_scene_string("""
    WorldBegin
    TransformBegin
      Translate 5 0 0
      Shape "sphere" "float radius" [1]
    TransformEnd
    Shape "sphere" "float radius" [2]
    WorldEnd
    """)
    s1, s2 = [p.shape for p in sc.primitives]
    np.testing.assert_allclose(s1.object_to_world.m[:3, 3], [5, 0, 0])
    np.testing.assert_allclose(s2.object_to_world.m[:3, 3], [0, 0, 0])


def test_object_instancing_flattens():
    sc = load_scene_string("""
    WorldBegin
    ObjectBegin "tree"
      Shape "trianglemesh" "point P" [0 0 0  1 0 0  0 1 0] "integer indices" [0 1 2]
    ObjectEnd
    Translate 10 0 0
    ObjectInstance "tree"
    Translate 10 0 0
    ObjectInstance "tree"
    WorldEnd
    """)
    assert len(sc.primitives) == 2
    v0 = sc.primitives[0].shape.vertices
    v1 = sc.primitives[1].shape.vertices
    np.testing.assert_allclose(v0[0], [10, 0, 0], atol=1e-6)
    np.testing.assert_allclose(v1[0], [20, 0, 0], atol=1e-6)


def test_named_materials():
    sc = load_scene_string("""
    WorldBegin
    MakeNamedMaterial "shiny" "string type" "plastic" "float roughness" [.01]
    NamedMaterial "shiny"
    Shape "sphere" "float radius" [1]
    WorldEnd
    """)
    assert sc.primitives[0].material.name == "plastic"
    assert sc.primitives[0].material.slots["roughness"][1] == pytest.approx(0.01)


def test_world_state_errors():
    from tpurt.scene.api import APIError
    with pytest.raises(APIError):
        load_scene_string("Shape \"sphere\"\nWorldBegin\nWorldEnd")  # shape outside world
    with pytest.raises(APIError):
        load_scene_string("WorldBegin\nCamera \"perspective\"\nWorldEnd")  # option in world


def test_parse_killeroo_scenes(scenes_dir):
    sc = load_scene(f"{scenes_dir}/killeroo-simple.pbrt")
    assert sc.resolution == (700, 700)
    assert sc.integrator_name == "path"
    assert sc.sampler_params.find_one_int("pixelsamples", 16) == 8
    # 1 light sphere + 2 ground/wall meshes + 2 killeroo instances
    kinds = [type(p.shape).__name__ for p in sc.primitives]
    assert kinds.count("QuadricRecord") == 1
    n_meshes = kinds.count("TriangleMeshRecord")
    assert n_meshes == 4
    killeroos = [p for p in sc.primitives
                 if isinstance(p.shape, TriangleMeshRecord)
                 and len(p.shape.indices) > 100]
    assert len(killeroos) == 2
    assert killeroos[0].material.name == "plastic"
    # the two killeroos have different plastic params
    np.testing.assert_allclose(killeroos[0].material.slots["Kd"][1], [0.4, 0.2, 0.2])
    np.testing.assert_allclose(killeroos[1].material.slots["Kd"][1], [0.4, 0.5, 0.4])
    # area light on the sphere
    lightprim = sc.primitives[kinds.index("QuadricRecord")]
    assert lightprim.area_light is not None
    np.testing.assert_array_equal(lightprim.area_light.L, [2000] * 3)
    assert lightprim.area_light.n_samples == 8

    sc2 = load_scene(f"{scenes_dir}/sample.pbrt")
    assert sc2.integrator_name == "rpf"
    assert sc2.output_filename == "sample.exr"
    assert len(sc2.primitives) == len(sc.primitives)


_ACCEL_SCENE = """
LookAt 0 0 4  0 0 0  0 1 0
Camera "perspective" "float fov" [60]
Film "image" "integer xresolution" [32] "integer yresolution" [32]
Sampler "halton" "integer pixelsamples" [2]
Integrator "path" "integer maxdepth" [3]
{accel}
WorldBegin
AttributeBegin
  AreaLightSource "area" "color L" [8 8 8]
  Translate 0 2.5 0
  Shape "sphere" "float radius" [.4]
AttributeEnd
Material "matte" "color Kd" [.5 .6 .7]
Shape "trianglemesh" "point P" [-5 -1 -5  5 -1 -5  5 -1 5  -5 -1 5]
  "integer indices" [0 1 2 2 3 0]
Shape "sphere" "float radius" [.8]
WorldEnd
"""


def test_kdtree_accelerator_equivalence():
    """Accelerator "kdtree" builds a REAL SAH kd-tree (kdtreeaccel.cpp
    semantics, geom/kdtree.py) whose renders must match the wide-BVH
    build exactly: both accelerators feed the same fused-triangle leaf
    test, so every hit (t, prim, barycentrics) is bit-identical."""
    from tpurt.render.driver import render

    sc_kd = load_scene_string(_ACCEL_SCENE.format(
        accel='Accelerator "kdtree" "integer traversalcost" [1]'))
    assert sc_kd.accelerator_name == "kdtree"
    sc_bvh = load_scene_string(_ACCEL_SCENE.format(accel=""))
    img_kd, _ = render(sc_kd, progress=False)
    img_bvh, _ = render(sc_bvh, progress=False)
    np.testing.assert_array_equal(np.asarray(img_kd), np.asarray(img_bvh))


def test_material_directive_shares_one_record():
    """One Material directive -> ONE shared MaterialRecord across shapes
    (api.cpp:1248 MaterialInstance; GetMaterialForShape:1479-1491).
    Identity matters beyond dedup: the BSSRDF probe chain admits chord
    crossings by material identity (bssrdf.cpp:311)."""
    sc = load_scene_string("""
    WorldBegin
    Material "matte" "color Kd" [.5 .5 .5]
    Shape "sphere" "float radius" [1]
    Shape "sphere" "float radius" [2]
    AttributeBegin
      Shape "sphere" "float radius" [3]
    AttributeEnd
    WorldEnd
    """)
    mats = [p.material for p in sc.primitives]
    assert mats[0] is mats[1] is mats[2]

    # a shape whose params shadow material params gets a ONE-OFF material
    # (shapeMaySetMaterialParameters, api.cpp:1428): single non-radius
    # float -> one-off; "radius"-only sphere stays shared
    sc2 = load_scene_string("""
    WorldBegin
    Material "plastic"
    Shape "sphere" "float radius" [1]
    Shape "sphere" "float radius" [1] "float roughness" [0.2]
    WorldEnd
    """)
    m2 = [p.material for p in sc2.primitives]
    assert m2[0] is not m2[1]
    # two directives = two instances even with equal params (pointer
    # semantics, not content dedup)
    sc3 = load_scene_string("""
    WorldBegin
    Material "matte"
    Shape "sphere" "float radius" [1]
    Material "matte"
    Shape "sphere" "float radius" [1]
    WorldEnd
    """)
    m3 = [p.material for p in sc3.primitives]
    assert m3[0] is not m3[1]
