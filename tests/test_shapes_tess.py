"""Curve / NURBS tessellation tests (shapes/curve.cpp, nurbs.cpp analogs)."""

import numpy as np

import tpurt.scene  # noqa: F401  (break the api<->shapes import cycle)
from tpurt.geom.shapes import make_shapes
from tpurt.geom.transform import Transform
from tpurt.scene.paramset import ParamSet


def _ps(d):
    ps = ParamSet()
    for (t, n), v in d.items():
        ps.add(t, n, v)
    return ps


def test_curve_cylinder_tube_geometry():
    # straight bezier along +x with constant width: tube of radius w/2
    ps = _ps({
        ("point3", "P"): [0, 0, 0, 1, 0, 0, 2, 0, 0, 3, 0, 0],
        ("string", "type"): ["cylinder"],
        ("float", "width"): [0.2],
    })
    recs = make_shapes("curve", Transform(), False, ps)
    assert len(recs) == 1
    mesh = recs[0]
    # all vertices lie on the Cauchy-corrected tube around the x axis:
    # vertex radius = (w/2) * pi/(6 sin(pi/6)) so the hexagonal tube's
    # MEAN silhouette width equals the true cylinder's (shapes.py)
    r = np.sqrt(mesh.vertices[:, 1] ** 2 + mesh.vertices[:, 2] ** 2)
    np.testing.assert_allclose(r, 0.1 * np.pi / (6 * np.sin(np.pi / 6)),
                               atol=1e-5)
    assert mesh.vertices[:, 0].min() >= -1e-6
    assert mesh.vertices[:, 0].max() <= 3 + 1e-6
    assert len(mesh.indices) > 0


def test_curve_flat_width_interpolation():
    ps = _ps({
        ("point3", "P"): [0, 0, 0, 1, 0, 0, 2, 0, 0, 3, 0, 0],
        ("string", "type"): ["flat"],
        ("float", "width0"): [0.4],
        ("float", "width1"): [0.0],
    })
    recs = make_shapes("curve", Transform(), False, ps)
    v = recs[0].vertices
    m = len(v) // 2
    # strip width tapers from 0.4 to 0 along u
    widths = np.linalg.norm(v[m:] - v[:m], axis=-1)
    np.testing.assert_allclose(widths[0], 0.4, atol=1e-5)
    np.testing.assert_allclose(widths[-1], 0.0, atol=1e-5)
    assert np.all(np.diff(widths) < 1e-6)


def test_curve_bspline_basis_accepted():
    ps = _ps({
        ("point3", "P"): [0, 0, 0, 1, 1, 0, 2, -1, 0, 3, 0, 0, 4, 1, 0],
        ("string", "basis"): ["bspline"],
        ("string", "type"): ["cylinder"],
        ("float", "width"): [0.1],
    })
    recs = make_shapes("curve", Transform(), False, ps)
    assert recs and len(recs[0].indices) > 0
    assert np.isfinite(recs[0].vertices).all()


def test_nurbs_flat_patch():
    # order-2 (linear) NURBS in both directions = a flat unit quad
    ps = _ps({
        ("integer", "nu"): [2], ("integer", "nv"): [2],
        ("integer", "uorder"): [2], ("integer", "vorder"): [2],
        ("float", "uknots"): [0, 0, 1, 1],
        ("float", "vknots"): [0, 0, 1, 1],
        ("point3", "P"): [0, 0, 0, 1, 0, 0, 0, 1, 0, 1, 1, 0],
    })
    recs = make_shapes("nurbs", Transform(), False, ps)
    assert len(recs) == 1
    v = recs[0].vertices
    np.testing.assert_allclose(v[:, 2], 0.0, atol=1e-6)
    assert v[:, 0].min() >= -1e-6 and v[:, 0].max() <= 1 + 1e-6
    # normals all +/-z
    n = recs[0].normals
    np.testing.assert_allclose(np.abs(n[:, 2]), 1.0, atol=1e-4)


def test_nurbs_quarter_cylinder_rational():
    # classical rational quadratic arc: quarter circle radius 1, extruded
    # in v; middle control point (1,1) with weight sqrt(2)/2, supplied in
    # PREMULTIPLIED homogeneous form like the reference expects
    w = np.sqrt(2) / 2
    pw = []
    for z in (0.0, 1.0):
        pw += [1, 0, z, 1,  w * 1, w * 1, w * z, w,  0, 1, z, 1]
    ps = _ps({
        ("integer", "nu"): [3], ("integer", "nv"): [2],
        ("integer", "uorder"): [3], ("integer", "vorder"): [2],
        ("float", "uknots"): [0, 0, 0, 1, 1, 1],
        ("float", "vknots"): [0, 0, 1, 1],
        ("float", "Pw"): pw,
    })
    recs = make_shapes("nurbs", Transform(), False, ps)
    v = recs[0].vertices
    r = np.sqrt(v[:, 0] ** 2 + v[:, 1] ** 2)
    np.testing.assert_allclose(r, 1.0, atol=1e-4)
