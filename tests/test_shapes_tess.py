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
    # Round-3 curves are RAY-TRACED CurveRecord spans (scene/records.py:38,
    # pre-split blossoms of curve.cpp:43-53), not tessellated meshes.
    # Straight bezier along +x with constant width: every span control
    # point stays on the x axis and keeps the full width.
    ps = _ps({
        ("point3", "P"): [0, 0, 0, 1, 0, 0, 2, 0, 0, 3, 0, 0],
        ("string", "type"): ["cylinder"],
        ("float", "width"): [0.2],
    })
    recs = make_shapes("curve", Transform(), False, ps)
    assert len(recs) == 1
    rec = recs[0]
    assert rec.kind == "curve" and rec.ctype == "cylinder"
    cp = rec.cp.reshape(-1, 3)
    np.testing.assert_allclose(cp[:, 1:], 0.0, atol=1e-6)
    assert cp[:, 0].min() >= -1e-6 and cp[:, 0].max() <= 3 + 1e-6
    np.testing.assert_allclose(rec.width, 0.2, atol=1e-6)
    # spans tile the parameter range [0,1] without gaps
    u = rec.u[np.argsort(rec.u[:, 0])]
    np.testing.assert_allclose(u[0, 0], 0.0, atol=1e-6)
    np.testing.assert_allclose(u[-1, 1], 1.0, atol=1e-6)
    np.testing.assert_allclose(u[1:, 0], u[:-1, 1], atol=1e-6)


def test_curve_flat_width_interpolation():
    ps = _ps({
        ("point3", "P"): [0, 0, 0, 1, 0, 0, 2, 0, 0, 3, 0, 0],
        ("string", "type"): ["flat"],
        ("float", "width0"): [0.4],
        ("float", "width1"): [0.0],
    })
    recs = make_shapes("curve", Transform(), False, ps)
    rec = recs[0]
    assert rec.ctype == "flat"
    # span end widths interpolate the shape's width0/width1 linearly in u
    # (curve.cpp:96-97 Lerp(u, width[0], width[1]))
    np.testing.assert_allclose(rec.width, 0.4 * (1.0 - rec.u), atol=1e-5)


def test_curve_bspline_basis_accepted():
    ps = _ps({
        ("point3", "P"): [0, 0, 0, 1, 1, 0, 2, -1, 0, 3, 0, 0, 4, 1, 0],
        ("string", "basis"): ["bspline"],
        ("string", "type"): ["cylinder"],
        ("float", "width"): [0.1],
    })
    recs = make_shapes("curve", Transform(), False, ps)
    assert recs
    # bspline with 5 control points -> 2 cubic segments' worth of spans
    cp = np.concatenate([r.cp.reshape(-1, 3) for r in recs])
    assert np.isfinite(cp).all() and len(cp) >= 8
    assert all(np.isfinite(r.width).all() for r in recs)


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
