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


def _subdiv(P, idx, levels):
    ps = ParamSet()
    ps.add("integer", "levels", [levels])
    ps.add("integer", "indices", [int(i) for i in np.asarray(idx).ravel()])
    ps.add("point", "P", np.asarray(P, np.float64).ravel().tolist())
    recs = make_shapes("loopsubdiv", Transform(), False, ps)
    assert len(recs) == 1
    return recs[0]


def test_loopsubdiv_limit_interior_valence4():
    """Octahedron control mesh at levels=0: every vertex is interior with
    valence 4, so the limit push is P/2 + ring_sum/8 (weightOneRing with
    loopGamma(4)=1/8, loopsubdiv.cpp:334-341).  Ring sums are zero by
    symmetry -> limit vertices are the control points halved."""
    P = np.array([[1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0],
                  [0, 0, 1], [0, 0, -1]], np.float64)
    idx = [[0, 2, 4], [2, 1, 4], [1, 3, 4], [3, 0, 4],
           [2, 0, 5], [1, 2, 5], [3, 1, 5], [0, 3, 5]]
    rec = _subdiv(P, idx, levels=0)
    np.testing.assert_allclose(rec.vertices, 0.5 * P, atol=1e-6)
    # limit normals are radial by symmetry
    nrm = rec.normals / np.linalg.norm(rec.normals, axis=-1, keepdims=True)
    radial = P / np.linalg.norm(P, axis=-1, keepdims=True)
    dots = np.abs((nrm * radial).sum(-1))
    np.testing.assert_allclose(dots, 1.0, atol=1e-5)


def test_loopsubdiv_limit_boundary_rule():
    """A single triangle is all-boundary (valence 2): limit position is
    weightBoundary with beta 1/5 -> 0.6*P + 0.2*(n0+n1); the limit
    normal must match the face plane."""
    P = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float64)
    rec = _subdiv(P, [[0, 1, 2]], levels=0)
    want0 = 0.6 * P[0] + 0.2 * (P[1] + P[2])
    np.testing.assert_allclose(rec.vertices[0], want0, atol=1e-6)
    nrm = rec.normals / np.linalg.norm(rec.normals, axis=-1, keepdims=True)
    np.testing.assert_allclose(np.abs(nrm[:, 2]), 1.0, atol=1e-6)


def test_loopsubdiv_levels_converge():
    """Subdivided octahedron stays inside the control hull, shrinks
    toward the limit sphere-like surface, and its vertex count follows
    the 4-to-1 face split (V' = V + E)."""
    P = np.array([[1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0],
                  [0, 0, 1], [0, 0, -1]], np.float64)
    idx = [[0, 2, 4], [2, 1, 4], [1, 3, 4], [3, 0, 4],
           [2, 0, 5], [1, 2, 5], [3, 1, 5], [0, 3, 5]]
    rec = _subdiv(P, idx, levels=2)
    assert len(rec.vertices) == 6 + 12 + 48  # V + E per level
    assert len(rec.indices) == 8 * 16
    r = np.linalg.norm(rec.vertices, axis=-1)
    assert r.max() <= 1.0 + 1e-6
    assert r.min() > 0.4
    # smooth closed surface: every limit normal is unit and outward
    nrm = rec.normals
    np.testing.assert_allclose(np.linalg.norm(nrm, axis=-1), 1.0, atol=1e-5)
    outward = (nrm * rec.vertices).sum(-1) / r
    assert (np.abs(outward) > 0.8).all()
