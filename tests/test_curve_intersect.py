"""Ray-traced curve intersection tests.

Validates tpurt's device curve kernel (intersect._curve_bundle_test +
the curve-span wide BVH) against an INDEPENDENT f64 dense-sampling
oracle: a point on the curve axis is hit when its distance from the ray
(measured perpendicular to the ray) is inside the interpolated
half-width — which is the geometric predicate the reference's recursive
splitting converges to (shapes/curve.cpp:188-374; refinement criterion
width/20 at curve.cpp:213-214).  Boundary cases within the refinement
tolerance are excluded rather than asserted either way.
"""

import numpy as np
import pytest

from tpurt.config import set_config
from tpurt.scene import load_scene_string
from tpurt.render.driver import build_job, render


def _bezier(cp, u):
    """f64 cubic Bezier points + derivatives at u (M,)."""
    cp = np.asarray(cp, np.float64)
    u = np.asarray(u, np.float64)[:, None]
    a = [cp[i] + u * (cp[i + 1] - cp[i]) for i in range(3)]
    b = [a[i] + u * (a[i + 1] - a[i]) for i in range(2)]
    p = b[0] + u * (b[1] - b[0])
    d = 3.0 * (b[1] - b[0])
    return p, d


def _oracle(cp, w0, w1, o, d, t_max=np.inf, n_samp=20001):
    """Dense-sampling hit oracle for flat/cylinder curves.

    Returns (hit, t, u, margin) where margin is the signed distance (in
    widths) of the closest approach from the acceptance boundary —
    |margin| small means the case is inside the refinement tolerance and
    should not be asserted."""
    u = np.linspace(0.0, 1.0, n_samp)
    p, _ = _bezier(cp, u)
    dl = np.linalg.norm(d)
    dh = d / dl
    q = p - o
    z = q @ dh
    r2 = np.maximum(np.einsum("ij,ij->i", q, q) - z * z, 0.0)
    r = np.sqrt(r2)
    hw = 0.5 * (w0 + (w1 - w0) * u)
    inside = (r <= hw) & (z > 0) & (z < dl * t_max)
    rel = (r - hw) / np.maximum(hw, 1e-12)
    if inside.any():
        zi = np.where(inside, z, np.inf)
        i = int(np.argmin(zi))
        # margin: how decisively inside the tube the accepted point is
        return True, z[i] / dl, u[i], -rel[i]
    i = int(np.argmin(rel))
    return False, np.inf, u[i], rel[i]


def _device_hit(sd_scene, o, d, t_max=1e4):
    import jax.numpy as jnp

    from tpurt.render.intersect import intersect_closest

    job = build_job(sd_scene)
    geo = job.scene.geo
    hit = intersect_closest(geo, jnp.asarray(o, jnp.float32),
                            jnp.asarray(d, jnp.float32), t_max)
    return (np.asarray(hit.t), np.asarray(hit.prim), np.asarray(hit.b0),
            np.asarray(hit.b1), geo)


def _curve_scene(cp, w0, w1, ctype="cylinder", extra=""):
    pts = " ".join("%.9g" % x for x in np.asarray(cp).ravel())
    return load_scene_string(
        f"""
Film "image" "integer xresolution" [8] "integer yresolution" [8]
Camera "perspective" "float fov" [45]
WorldBegin
Material "matte" "color Kd" [.5 .5 .5]
Shape "curve" "string type" "{ctype}" "float width0" [{w0}]
  "float width1" [{w1}] "point P" [{pts}] {extra}
WorldEnd
""", base_dir=".")


def test_straight_axis_curve_hits_by_width():
    """Rays perpendicular to a straight curve hit exactly inside the
    half-width, and t/u/v are analytic."""
    cp = np.array([[-1, 0, 0], [-1 / 3, 0, 0], [1 / 3, 0, 0], [1, 0, 0]],
                  np.float64)
    w0 = w1 = 0.2
    sd = _curve_scene(cp, w0, w1)
    ys = np.array([0.0, 0.05, 0.099, 0.101, 0.3, -0.05, -0.099])
    o = np.stack([np.linspace(-0.9, 0.9, len(ys)), ys, np.full(len(ys), 2.0)],
                 axis=1)
    d = np.tile([0.0, 0.0, -1.0], (len(ys), 1))
    t, prim, s, v = _device_hit(sd, o, d)[:4]
    expect = np.abs(ys) < 0.1
    assert ((prim >= 0) == expect).all()
    np.testing.assert_allclose(t[expect], 2.0, rtol=1e-5)
    # u equals the x position mapped to [0,1] (uniform parameterization)
    geo_u = (o[expect, 0] + 1.0) / 2.0
    # recover global u from span-local s via the shade row
    hits = np.where(expect)[0]
    for k, i in enumerate(hits):
        # v: 0.5 at the axis, 0/1 at the edges
        assert abs(v[i] - (0.5 + ys[i] / w0)) < 0.02 or \
               abs(v[i] - (0.5 - ys[i] / w0)) < 0.02


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_fuzz_vs_dense_oracle(seed):
    """Random curves x random near-aiming rays: hit classification, t and
    u agree with the dense f64 oracle away from the width boundary."""
    rng = np.random.default_rng(seed)
    cp = rng.uniform(-1, 1, (4, 3))
    # keep the curve from self-folding too tightly: stretch along x
    cp[:, 0] = np.sort(cp[:, 0]) * 1.5
    w0, w1 = rng.uniform(0.05, 0.25, 2)
    sd = _curve_scene(cp, w0, w1)

    n = 64
    u_aim = rng.uniform(0, 1, n)
    p_aim, _ = _bezier(cp, u_aim)
    o = p_aim + rng.normal(0, 0.5, (n, 3))
    o[:, 2] = 3.0
    d = p_aim + rng.normal(0, 0.12, (n, 3)) - o
    t, prim, s, v, geo = _device_hit(sd, o, d)

    rows = np.asarray(geo.shade_rows)
    checked = 0
    for i in range(n):
        ohit, ot, ou, margin = _oracle(cp, w0, w1, o[i], d[i])
        if abs(margin) < 0.12:
            continue  # inside refinement tolerance: not asserted
        assert (prim[i] >= 0) == ohit, (i, margin, ohit)
        if ohit:
            # map span-local s to the global u via the shade row
            r = rows[prim[i]]
            u_glob = r[21] + s[i] * (r[22] - r[21])
            assert abs(t[i] - ot) < 2e-2 * max(ot, 1.0), (i, t[i], ot)
            assert abs(u_glob - ou) < 0.05, (i, u_glob, ou)
        checked += 1
    assert checked >= n // 3


def test_ribbon_width_projection():
    """A ribbon seen face-on keeps its full width; seen edge-on it
    vanishes (curve.cpp:313-321)."""
    cp = np.array([[-1, 0, 0], [-1 / 3, 0, 0], [1 / 3, 0, 0], [1, 0, 0]],
                  np.float64)
    sd = _curve_scene(cp, 0.2, 0.2, ctype="ribbon",
                      extra='"normal N" [0 0 1  0 0 1]')
    o = np.array([[0, 0.05, 2], [0, 0.05, 2], [0, 2, 0.0]], np.float64)
    d = np.array([[0, 0, -1], [0, 0, -1], [0, -1, 0.001]], np.float64)
    t, prim, s, v = _device_hit(sd, o, d)[:4]
    assert prim[0] >= 0 and prim[1] >= 0  # face-on: inside half width
    assert prim[2] < 0  # edge-on: projected width ~ 0


def test_curve_shading_normal_faces_ray_plane():
    """compute_interaction for curve hits: normal ⟂ dpdu, |n|=1, uv in
    range, and flat-curve normals lie in the plane ⟂ ray."""
    import jax.numpy as jnp

    from tpurt.render.interaction import compute_interaction
    from tpurt.render.intersect import intersect_closest

    cp = np.array([[-1, 0, 0], [-0.3, 0.4, 0.2], [0.3, -0.4, -0.2],
                   [1, 0, 0]], np.float64)
    sd = _curve_scene(cp, 0.15, 0.25, ctype="flat")
    job = build_job(sd)
    geo = job.scene.geo
    rng = np.random.default_rng(3)
    u_aim = rng.uniform(0, 1, 32)
    p_aim, _ = _bezier(cp, u_aim)
    o = p_aim + np.array([0.1, 0.2, 2.5])
    d = p_aim - o + rng.normal(0, 0.02, (32, 3))
    hit = intersect_closest(geo, jnp.asarray(o, jnp.float32),
                            jnp.asarray(d, jnp.float32), 1e4)
    si = compute_interaction(geo, hit, jnp.asarray(o, jnp.float32),
                             jnp.asarray(d, jnp.float32), tangents=True,
                             dpduv=True)
    valid = np.asarray(si.valid)
    assert valid.sum() >= 16
    ns = np.asarray(si.ns)[valid]
    dpdu = np.asarray(si.dpdu)[valid]
    uv = np.asarray(si.uv)[valid]
    assert np.allclose(np.linalg.norm(ns, axis=-1), 1.0, atol=1e-3)
    cosun = np.abs(np.einsum("ij,ij->i", ns, dpdu)
                   / np.maximum(np.linalg.norm(dpdu, axis=-1), 1e-9))
    assert (cosun < 1e-2).all()
    assert (uv[:, 0] >= -1e-4).all() and (uv[:, 0] <= 1 + 1e-4).all()
    assert (uv[:, 1] >= -1e-4).all() and (uv[:, 1] <= 1 + 1e-4).all()
    # hit points lie within half-width of the true curve axis
    p = np.asarray(si.p)[valid]
    uu = np.linspace(0, 1, 4001)
    axis_pts, _ = _bezier(cp, uu)
    dmin = np.min(np.linalg.norm(p[:, None, :] - axis_pts[None], axis=-1),
                  axis=1)
    hw = 0.5 * (0.15 + (0.25 - 0.15) * uv[:, 0])
    assert (dmin <= hw * 1.1 + 1e-3).all()


def test_curve_scene_renders_both_types():
    """End-to-end: a cylinder and a flat curve shade under a distant
    light; energy appears in the right image bands."""
    sd = load_scene_string("""
LookAt 0 0 5  0 0 0  0 1 0
Camera "perspective" "float fov" [30]
Film "image" "integer xresolution" [64] "integer yresolution" [64]
Sampler "random" "integer pixelsamples" [2]
Integrator "path" "integer maxdepth" [3]
WorldBegin
LightSource "distant" "color L" [3 3 3] "point from" [0 2 5]
Material "matte" "color Kd" [.8 .2 .2]
Shape "curve" "string type" "cylinder" "float width" [0.5]
  "point P" [-1.5 0 0  -0.5 0.8 0  0.5 -0.8 0  1.5 0 0]
Material "matte" "color Kd" [.2 .8 .2]
Shape "curve" "string type" "flat" "float width" [0.3]
  "point P" [-1.5 -1.2 0  -0.5 -1.2 0.5  0.5 -1.2 -0.5  1.5 -1.2 0]
WorldEnd
""", base_dir=".")
    img, _ = render(sd, progress=False)
    img = np.asarray(img)
    assert np.isfinite(img).all()
    mid = img[24:40].mean(axis=(0, 1))
    bot = img[56:].mean(axis=(0, 1))
    assert mid[0] > 3 * mid[1]  # red cylinder band
    assert bot[1] > 3 * bot[0]  # green flat band
    assert mid[0] > 0.02 and bot[1] > 0.02


def test_tessellate_mode_still_available():
    """config.curve_mode='tessellate' keeps the round-1/2 path alive and
    produces a comparable silhouette."""
    cp = np.array([[-1, 0, 0], [-1 / 3, 0.5, 0], [1 / 3, -0.5, 0],
                   [1, 0, 0]], np.float64)
    try:
        set_config(curve_mode="tessellate")
        sd = _curve_scene(cp, 0.2, 0.2)
        job = build_job(sd)
        assert job.scene.geo.n_curves == 0
        assert job.scene.geo.n_tris > 10
    finally:
        set_config(curve_mode="raytrace")
