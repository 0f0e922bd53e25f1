"""Geometry gate tests: primitive intersections vs independent oracles, and
BVH traversal vs brute force (SURVEY.md §7 stage-2 gate; reference analog:
src/tests/shapes.cpp watertight + reintersection tests)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpurt.geom.bvh import build_bvh
from tpurt.geom.transform import Transform, translate, scale as xscale
from tpurt.render.geometry_build import flatten_geometry
from tpurt.render.intersect import (
    DeviceGeometry,
    intersect_any,
    intersect_closest,
    ray_triangle,
)
from tpurt.scene.records import PrimitiveRecord, QuadricRecord, TriangleMeshRecord


def _moller_trumbore(o, d, v0, v1, v2):
    """Independent oracle triangle intersect (classic algorithm, numpy f64)."""
    e1, e2 = v1 - v0, v2 - v0
    p = np.cross(d, e2)
    det = e1 @ p
    if abs(det) < 1e-12:
        return None
    inv = 1.0 / det
    tv = o - v0
    u = (tv @ p) * inv
    if u < 0 or u > 1:
        return None
    q = np.cross(tv, e1)
    v = (d @ q) * inv
    if v < 0 or u + v > 1:
        return None
    t = (e2 @ q) * inv
    return t if t > 0 else None


def test_ray_triangle_matches_oracle():
    rng = np.random.default_rng(3)
    n_hit = 0
    for _ in range(300):
        v = rng.standard_normal((3, 3))
        o = rng.standard_normal(3) * 3
        target = v.mean(axis=0) + rng.standard_normal(3) * 0.7
        d = target - o
        d /= np.linalg.norm(d)
        hit, t, b0, b1 = jax.jit(ray_triangle)(
            jnp.float32(o), jnp.float32(d), jnp.float32(1e8),
            jnp.float32(v[0]), jnp.float32(v[1]), jnp.float32(v[2]))
        want = _moller_trumbore(o.astype(np.float64), d, *v.astype(np.float64))
        if want is not None and want > 1e-3:
            assert bool(hit), (o, d, v)
            np.testing.assert_allclose(float(t), want, rtol=1e-3)
            # barycentric point reconstruction
            p_ours = float(b0) * v[0] + float(b1) * v[1] + (1 - float(b0) - float(b1)) * v[2]
            np.testing.assert_allclose(p_ours, o + want * d, atol=1e-3)
            n_hit += 1
        elif want is None:
            assert not bool(hit) or float(t) > 1e6
    assert n_hit > 50  # sanity: the test exercised real hits


def _scene_geo(prims):
    mats = {}

    def mat_index(m):
        return -1

    def al_index(p, _):
        return -1

    return flatten_geometry(prims, mat_index, al_index)


def _random_tri_scene(rng, n_tri=120, n_sphere=8):
    prims = []
    centers = rng.uniform(-5, 5, (n_tri, 3))
    verts = centers[:, None, :] + rng.standard_normal((n_tri, 3, 3)) * 0.6
    mesh = TriangleMeshRecord(
        vertices=verts.reshape(-1, 3).astype(np.float32),
        indices=np.arange(n_tri * 3, dtype=np.int32).reshape(-1, 3),
    )
    prims.append(PrimitiveRecord(shape=mesh, material=None))
    for _ in range(n_sphere):
        c = rng.uniform(-5, 5, 3)
        r = rng.uniform(0.3, 1.2)
        prims.append(PrimitiveRecord(
            shape=QuadricRecord("sphere", translate(c), radius=r,
                                z_min=-r, z_max=r),
            material=None))
    return prims


def test_bvh_traversal_matches_brute_force():
    rng = np.random.default_rng(11)
    geo_h = _scene_geo(_random_tri_scene(rng))
    geo = DeviceGeometry.from_host(geo_h)

    n_rays = 256
    o = rng.uniform(-8, 8, (n_rays, 3)).astype(np.float32)
    # aim at jittered scene points so a good fraction of rays hit something
    targets = (rng.uniform(-5, 5, (n_rays, 3))
               + rng.standard_normal((n_rays, 3))).astype(np.float32)
    d = targets - o
    d /= np.linalg.norm(d, axis=-1, keepdims=True)

    hit = jax.jit(lambda o, d: intersect_closest(geo, o, d, 1e8))(o, d)

    # brute force over all prims with the same primitive tests
    from tpurt.render.intersect import _intersect_prim

    def brute_one(oo, dd):
        def body(pi, best):
            t_b, p_b = best
            h, t, _, _ = _intersect_prim(geo, pi, oo, dd, t_b)
            better = h & (t < t_b)
            return jnp.where(better, t, t_b), jnp.where(better, pi, p_b)

        t, p = jax.lax.fori_loop(0, geo.prim_type.shape[0], body,
                                 (jnp.float32(1e8), jnp.int32(-1)))
        return t, p

    bt, bp = jax.jit(jax.vmap(brute_one))(o, d)

    bvh_hit = np.asarray(hit.prim >= 0)
    brute_hit = np.asarray(bp >= 0)
    np.testing.assert_array_equal(bvh_hit, brute_hit)
    # same t (ties between prims allowed if t equal)
    np.testing.assert_allclose(
        np.asarray(hit.t)[bvh_hit], np.asarray(bt)[brute_hit], rtol=1e-4
    )
    assert bvh_hit.sum() > n_rays // 4  # scene dense enough to be a real test


def test_intersect_any_consistent_with_closest():
    rng = np.random.default_rng(4)
    geo = DeviceGeometry.from_host(_scene_geo(_random_tri_scene(rng, 60, 4)))
    n = 128
    o = rng.uniform(-8, 8, (n, 3)).astype(np.float32)
    d = rng.standard_normal((n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    closest = intersect_closest(geo, o, d, 1e8)
    any_hit = intersect_any(geo, o, d, 1e8)
    np.testing.assert_array_equal(np.asarray(any_hit), np.asarray(closest.valid))
    # t_max clipping: a shadow ray ending before the first hit sees nothing
    t = np.asarray(closest.t)
    sel = np.asarray(closest.valid)
    short = intersect_any(geo, o[sel], d[sel], jnp.asarray(t[sel] * 0.5))
    assert not np.any(np.asarray(short))


def test_sphere_partial_z_and_phi():
    # z-clipped sphere: rays down the +x axis hit only where |z| <= zmax
    prims = [PrimitiveRecord(
        shape=QuadricRecord("sphere", Transform(), radius=1.0,
                            z_min=-0.3, z_max=0.3),
        material=None)]
    geo = DeviceGeometry.from_host(_scene_geo(prims))
    o = np.array([[-5, 0, 0], [-5, 0, 0.9], [-5, 0, 0.29]], np.float32)
    d = np.tile(np.array([[1, 0, 0]], np.float32), (3, 1))
    hit = intersect_closest(geo, o, d, 1e8)
    assert bool(hit.valid[0])
    assert not bool(hit.valid[1])
    assert bool(hit.valid[2])
    np.testing.assert_allclose(float(hit.t[0]), 4.0, rtol=1e-4)


def test_cylinder_disk_quadrics():
    prims = [
        PrimitiveRecord(shape=QuadricRecord("cylinder", Transform(), radius=1.0,
                                            z_min=-1, z_max=1), material=None),
        PrimitiveRecord(shape=QuadricRecord("disk", translate([4, 0, 0]),
                                            radius=1.0, height=0.0), material=None),
    ]
    geo = DeviceGeometry.from_host(_scene_geo(prims))
    o = np.array([
        [-5, 0, 0],     # hits cylinder at x=-1 -> t=4
        [-5, 0, 2],     # above cylinder -> miss
        [4, 0.5, -5],   # hits disk from below -> t=5
        [4, 1.5, -5],   # outside disk radius -> miss
    ], np.float32)
    d = np.array([[1, 0, 0], [1, 0, 0], [0, 0, 1], [0, 0, 1]], np.float32)
    hit = intersect_closest(geo, o, d, 1e8)
    assert [bool(v) for v in hit.valid] == [True, False, True, False]
    np.testing.assert_allclose(float(hit.t[0]), 4.0, rtol=1e-4)
    np.testing.assert_allclose(float(hit.t[2]), 5.0, rtol=1e-4)


def test_bvh_shadow_acne_reintersection():
    """Spawning from a hit point offset along the normal must not re-hit
    the same surface (shapes.cpp reintersection tests)."""
    rng = np.random.default_rng(5)
    geo = DeviceGeometry.from_host(_scene_geo(_random_tri_scene(rng, 80, 6)))
    n = 200
    o = rng.uniform(-8, 8, (n, 3)).astype(np.float32)
    d = rng.standard_normal((n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    hit = intersect_closest(geo, o, d, 1e8)
    sel = np.asarray(hit.valid)
    p = o[sel] + np.asarray(hit.t)[sel, None] * d[sel]
    # bounce straight back toward the origin side with a scaled offset
    eps = 1e-3 * np.maximum(1.0, np.linalg.norm(p, axis=-1, keepdims=True))
    back = -d[sel]
    hit2 = intersect_closest(geo, (p + eps * back).astype(np.float32),
                             back.astype(np.float32), 1e8)
    # no re-hit at t ~ 0
    t2 = np.asarray(hit2.t)
    assert not np.any(t2 < 1e-4)


def test_empty_scene():
    geo = DeviceGeometry.from_host(_scene_geo([]))
    o = np.zeros((4, 3), np.float32)
    d = np.tile(np.array([[0, 0, 1]], np.float32), (4, 1))
    hit = intersect_closest(geo, o, d, 1e8)
    assert not np.any(np.asarray(hit.valid))


def test_bvh_build_structure():
    rng = np.random.default_rng(9)
    lo = rng.uniform(-10, 10, (500, 3))
    hi = lo + rng.uniform(0.1, 1.0, (500, 3))
    bvh = build_bvh(lo, hi)
    assert sorted(bvh.prim_order.tolist()) == list(range(500))
    # each leaf's prims are inside its bounds
    for i in range(bvh.n_nodes):
        np_ = bvh.n_prims[i]
        if np_ > 0:
            prims = bvh.prim_order[bvh.prim_offset[i]: bvh.prim_offset[i] + np_]
            assert (lo[prims] >= bvh.bounds_lo[i] - 1e-4).all()
            assert (hi[prims] <= bvh.bounds_hi[i] + 1e-4).all()
    assert bvh.max_depth() < 64


def test_hyperboloid_renders_and_matches_implicit():
    """Hyperboloid quadric (shapes/hyperboloid.cpp): device hits satisfy
    the implicit equation ah(x^2+y^2) - ch z^2 = 1 and the silhouette is
    visible."""
    import numpy as np

    from tpurt.render.driver import build_job
    from tpurt.render.intersect import intersect_closest
    from tpurt.scene import load_scene_string

    scene = """
    Film "image" "integer xresolution" [8] "integer yresolution" [8]
    Camera "perspective" "float fov" [45]
    WorldBegin
    Material "matte" "color Kd" [.5 .5 .5]
    Translate 0 0 4
    Rotate 90 1 0 0
    Shape "hyperboloid" "point p1" [1 0 -1] "point p2" [1.5 0 1]
    WorldEnd
    """
    import jax.numpy as jnp

    job = build_job(load_scene_string(scene))
    geo = job.scene.geo
    n = 256
    rng = np.random.default_rng(8)
    o = np.tile([[0.0, 0.0, 0.0]], (n, 1)).astype(np.float32)
    dirs = np.stack([rng.uniform(-0.5, 0.5, n), rng.uniform(-0.5, 0.5, n),
                     np.ones(n)], -1)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    hit = intersect_closest(geo, jnp.asarray(o), jnp.asarray(dirs.astype(np.float32)),
                            jnp.full(n, np.inf, jnp.float32))
    prim = np.asarray(hit.prim)
    t = np.asarray(hit.t)
    got = prim >= 0
    assert got.sum() > 20, got.sum()
    # verify the implicit equation in OBJECT space for hit lanes
    qi = int(np.asarray(geo.quad_id)[prim[got][0]])
    w2o = np.asarray(geo.quad_w2o)[qi]
    ah, ch = np.asarray(geo.quad_params)[qi][6:8]
    p_w = o[got] + t[got][:, None] * dirs[got]
    p_o = (w2o[:3, :3] @ p_w.T).T + w2o[:3, 3]
    f = ah * (p_o[:, 0] ** 2 + p_o[:, 1] ** 2) - ch * p_o[:, 2] ** 2
    np.testing.assert_allclose(f, 1.0, atol=5e-3)


def test_all_quadrics_reintersection():
    """Shadow-acne sweep over every quadric type (shapes.cpp:154-544):
    rays re-spawned from offset hit points must not re-hit the same
    surface at tiny t."""
    import numpy as np

    import jax.numpy as jnp

    from tpurt.render.driver import build_job
    from tpurt.render.interaction import compute_interaction, offset_ray_origin
    from tpurt.render.intersect import intersect_closest
    from tpurt.render.sampling_warps import build_onb, to_world
    from tpurt.scene import load_scene_string

    shapes = {
        "sphere": 'Shape "sphere" "float radius" [1]',
        "cylinder": 'Shape "cylinder" "float radius" [1] "float zmin" [-1] "float zmax" [1]',
        "disk": 'Shape "disk" "float radius" [1.5]',
        "cone": 'Shape "cone" "float radius" [1] "float height" [1.5]',
        "paraboloid": 'Shape "paraboloid" "float radius" [1] "float zmax" [1]',
        "hyperboloid": 'Shape "hyperboloid" "point p1" [1 0 -1] "point p2" [1.4 0 1]',
    }
    rng = np.random.default_rng(12)
    for name, decl in shapes.items():
        scene = f"""
        Film "image" "integer xresolution" [4] "integer yresolution" [4]
        Camera "perspective"
        WorldBegin
        Material "matte" "color Kd" [.5 .5 .5]
        Translate 0 0 4
        Rotate 60 1 0.3 0
        {decl}
        WorldEnd
        """
        geo = build_job(load_scene_string(scene)).scene.geo
        n = 512
        o = jnp.zeros((n, 3), jnp.float32)
        dirs = np.stack([rng.uniform(-0.45, 0.45, n),
                         rng.uniform(-0.45, 0.45, n), np.ones(n)], -1)
        dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
        d = jnp.asarray(dirs.astype(np.float32))
        hit = intersect_closest(geo, o, d, jnp.full(n, np.inf, jnp.float32))
        got = np.asarray(hit.prim) >= 0
        assert got.sum() > 50, (name, got.sum())
        si = compute_interaction(geo, hit, o, d)
        # bounce in a random hemisphere direction around the normal
        t_, b_ = build_onb(si.ng)
        u1 = rng.uniform(0.05, 0.95, n)
        u2 = rng.uniform(0, 1, n)
        z = np.sqrt(u1)
        r = np.sqrt(1 - u1)
        local = jnp.asarray(np.stack([r * np.cos(2 * np.pi * u2),
                                      r * np.sin(2 * np.pi * u2), z],
                                     -1).astype(np.float32))
        w = to_world(t_, b_, si.ng, local)
        o2 = offset_ray_origin(si.p, si.ng, w)
        hit2 = intersect_closest(geo, o2, w, jnp.full(n, np.inf, jnp.float32))
        t2 = np.asarray(hit2.t)
        self_hit = got & np.isfinite(t2) & (t2 < 1e-3)
        assert self_hit.sum() == 0, (name, int(self_hit.sum()))


def test_intersect_mixed_matches_separate():
    """One fused traversal over a [closest; shadow] wavefront must agree
    with separate intersect_closest / intersect_any calls (per-lane
    any_hit mask in _wide_step_fns)."""
    from tpurt.render.intersect import intersect_mixed

    rng = np.random.default_rng(7)
    geo = DeviceGeometry.from_host(_scene_geo(_random_tri_scene(rng, 80, 5)))
    n = 128
    o = rng.uniform(-8, 8, (n, 3)).astype(np.float32)
    targets = rng.uniform(-5, 5, (n, 3)).astype(np.float32)
    d = targets - o
    d /= np.linalg.norm(d, axis=-1, keepdims=True)

    closest = intersect_closest(geo, o, d, 1e8)
    # shadow rays: half with long t_max, half ending before the hit
    t_sh = np.where(np.arange(n) % 2 == 0, 1e8,
                    np.asarray(closest.t) * 0.5).astype(np.float32)
    occ_sep = intersect_any(geo, o, d, jnp.asarray(t_sh))

    o2 = jnp.concatenate([jnp.asarray(o), jnp.asarray(o)], axis=0)
    d2 = jnp.concatenate([jnp.asarray(d), jnp.asarray(d)], axis=0)
    tm = jnp.concatenate([jnp.full(n, 1e8, jnp.float32),
                          jnp.asarray(t_sh)], axis=0)
    mask = jnp.concatenate([jnp.zeros(n, bool), jnp.ones(n, bool)])
    mixed = jax.jit(lambda o, d, t, m: intersect_mixed(geo, o, d, t, m))(
        o2, d2, tm, mask)

    # closest half: identical hits
    np.testing.assert_array_equal(np.asarray(mixed.prim[:n]),
                                  np.asarray(closest.prim))
    v = np.asarray(closest.valid)
    np.testing.assert_allclose(np.asarray(mixed.t[:n])[v],
                               np.asarray(closest.t)[v], rtol=1e-5)
    # shadow half: same occlusion verdicts
    np.testing.assert_array_equal(np.asarray(mixed.prim[n:] >= 0),
                                  np.asarray(occ_sep))
