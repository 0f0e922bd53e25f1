"""SAH kd-tree accelerator tests (geom/kdtree.py + the _kd_step_fns
traversal): builder invariants, fuzz agreement with the wide BVH, leaf
chaining at the depth cap, and any-hit semantics.

Reference analog: accelerators/kdtreeaccel.cpp:44-349 (build) and
:410-484 (traversal).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from tpurt.geom.kdtree import (SLOT_ABOVE, SLOT_AXIS, SLOT_BELOW, SLOT_CONT,
                               SLOT_SPLIT, build_kd_table, _build_python)
from tpurt.geom.wbvh import LEAF_K, REC, SLOT_KIND


def _random_tris(n, rng, spread=4.0):
    c = rng.uniform(-spread, spread, (n, 3)).astype(np.float32)
    v0 = c + rng.uniform(-0.4, 0.4, (n, 3)).astype(np.float32)
    v1 = c + rng.uniform(-0.4, 0.4, (n, 3)).astype(np.float32)
    v2 = c + rng.uniform(-0.4, 0.4, (n, 3)).astype(np.float32)
    return v0, v1, v2


def _geo_pair(v0, v1, v2, accel_params=None):
    """DeviceGeometry twins (bvh, kdtree) over the same triangle soup."""
    from tpurt.render.geometry_build import flatten_geometry
    from tpurt.render.intersect import DeviceGeometry
    from tpurt.scene.records import PrimitiveRecord, TriangleMeshRecord

    n = len(v0)
    P = np.concatenate([v0, v1, v2])
    idx = (np.arange(3 * n).reshape(3, n).T).astype(np.int32)
    rec = PrimitiveRecord(
        shape=TriangleMeshRecord(vertices=P.astype(np.float64), indices=idx),
        material=None)
    g = flatten_geometry([rec], lambda m: -1, lambda p, s: -1)
    return (DeviceGeometry.from_host(g),
            DeviceGeometry.from_host(g, accel="kdtree",
                                     accel_params=accel_params))


def test_builder_node_invariants():
    rng = np.random.default_rng(0)
    v0, v1, v2 = _random_tris(200, rng)
    tab, dtab, bounds, sdepth = build_kd_table(v0, v1, v2)
    assert dtab is None
    kind = tab[:, SLOT_KIND]
    is_leaf = kind > 0
    # interiors: children in range, split inside the scene bounds
    for r in np.nonzero(~is_leaf)[0]:
        ax = tab[r, SLOT_AXIS:SLOT_AXIS + 1].view(np.int32)[0]
        below = tab[r, SLOT_BELOW:SLOT_BELOW + 1].view(np.int32)[0]
        above = tab[r, SLOT_ABOVE:SLOT_ABOVE + 1].view(np.int32)[0]
        assert 0 <= ax < 3
        assert 0 < below < len(tab) and 0 < above < len(tab)
        assert bounds[0, ax] <= tab[r, SLOT_SPLIT] <= bounds[1, ax]
    # leaves: prim rows valid or -1; continuation links in range
    prim_lo = 9 * LEAF_K
    for r in np.nonzero(is_leaf)[0]:
        prims = tab[r, prim_lo:prim_lo + LEAF_K].view(np.int32)
        assert ((prims == -1) | ((prims >= 0) & (prims < 200))).all()
        cont = tab[r, SLOT_CONT:SLOT_CONT + 1].view(np.int32)[0]
        assert cont == -1 or (0 < cont < len(tab))
    # every triangle appears in at least one leaf
    seen = set()
    for r in np.nonzero(is_leaf)[0]:
        prims = tab[r, prim_lo:prim_lo + LEAF_K].view(np.int32)
        seen.update(int(p) for p in prims if p >= 0)
    assert seen == set(range(200))



def test_python_builder_matches_native():
    """The pure-Python fallback must produce the same splits as the
    native builder (same algorithm, so identical trees)."""
    from tpurt.native import build_kdtree_native

    rng = np.random.default_rng(3)
    v0, v1, v2 = _random_tris(60, rng)
    lo = np.nextafter(np.minimum(np.minimum(v0, v1), v2),
                      -np.inf).astype(np.float32)
    hi = np.nextafter(np.maximum(np.maximum(v0, v1), v2),
                      np.inf).astype(np.float32)
    nat = build_kdtree_native(lo, hi, 80, 1, 0.5, 12, 10)
    if nat is None:
        pytest.skip("native library unavailable")
    py = _build_python(lo.astype(np.float64), hi.astype(np.float64),
                       80, 1, 0.5, 12, 10)
    for a, b, name in zip(nat, py, ("split", "axis", "above", "off",
                                    "cnt", "indices", "bounds")):
        np.testing.assert_allclose(a, b, rtol=1e-6, err_msg=name)


def _closest(geo, o, d, t_max=1e8):
    from tpurt.render.intersect import intersect_closest

    h = intersect_closest(geo, jnp.asarray(o), jnp.asarray(d),
                          jnp.full((len(o),), t_max, jnp.float32))
    return (np.asarray(h.t), np.asarray(h.prim),
            np.asarray(h.b0), np.asarray(h.b1))


def test_kd_matches_bvh_closest_fuzz():
    """kd and BVH traversals share the triangle bundle test, so the
    closest hit must agree exactly on t (prims may differ only on exact
    t ties)."""
    rng = np.random.default_rng(1)
    v0, v1, v2 = _random_tris(300, rng)
    geo_b, geo_k = _geo_pair(v0, v1, v2)
    n = 512
    o = rng.uniform(-8, 8, (n, 3)).astype(np.float32)
    # aim at (perturbed) triangle centroids so most rays hit something
    tgt = ((v0 + v1 + v2) / 3)[rng.integers(0, len(v0), n)]
    tgt = tgt + rng.normal(scale=0.2, size=(n, 3)).astype(np.float32)
    d = (tgt - o).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    tb, pb, b0b, b1b = _closest(geo_b, o, d)
    tk, pk, b0k, b1k = _closest(geo_k, o, d)
    assert (pb >= 0).mean() > 0.3  # the fuzz actually hits things
    np.testing.assert_array_equal(pb >= 0, pk >= 0)
    np.testing.assert_array_equal(tb[pb >= 0], tk[pk >= 0])
    same = pb == pk
    np.testing.assert_array_equal(b0b[same], b0k[same])


def test_kd_any_hit_matches_bvh():
    from tpurt.render.intersect import intersect_any

    rng = np.random.default_rng(2)
    v0, v1, v2 = _random_tris(150, rng)
    geo_b, geo_k = _geo_pair(v0, v1, v2)
    n = 512
    o = rng.uniform(-8, 8, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    tgt = ((v0 + v1 + v2) / 3)[rng.integers(0, len(v0), n)]
    d = (tgt - o).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    t_max = rng.uniform(0.5, 20.0, n).astype(np.float32)
    occ_b = np.asarray(intersect_any(geo_b, jnp.asarray(o), jnp.asarray(d),
                                     jnp.asarray(t_max)))
    occ_k = np.asarray(intersect_any(geo_k, jnp.asarray(o), jnp.asarray(d),
                                     jnp.asarray(t_max)))
    assert occ_b.any() and not occ_b.all()
    np.testing.assert_array_equal(occ_b, occ_k)


def test_leaf_chaining_at_depth_cap():
    """maxdepth 1 forces leaves far beyond LEAF_K prims; the chained
    leaf rows must still find every hit."""
    from tpurt.scene.paramset import ParamSet

    rng = np.random.default_rng(4)
    v0, v1, v2 = _random_tris(100, rng, spread=1.0)
    ps = ParamSet()
    ps.add("integer", "maxdepth", [1])
    geo_b, geo_k = _geo_pair(v0, v1, v2, accel_params=ps)
    # the shallow tree really did chain: some leaf row links onward
    conts = np.ascontiguousarray(
        np.asarray(geo_k.knodes)[:, SLOT_CONT]).view(np.int32)
    assert (conts >= 0).any()
    n = 256
    o = rng.uniform(-4, 4, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    tb, pb, *_ = _closest(geo_b, o, d)
    tk, pk, *_ = _closest(geo_k, o, d)
    np.testing.assert_array_equal(pb >= 0, pk >= 0)
    np.testing.assert_array_equal(tb[pb >= 0], tk[pk >= 0])


def test_kd_motion_blur_lerps_leaves():
    """Animated meshes mirror vertex deltas onto the kd leaf layout;
    hits at time t must match the BVH motion path."""
    from tpurt.render.geometry_build import flatten_geometry
    from tpurt.render.intersect import DeviceGeometry, intersect_closest
    from tpurt.scene.records import PrimitiveRecord, TriangleMeshRecord

    rng = np.random.default_rng(5)
    v0, v1, v2 = _random_tris(40, rng)
    P = np.concatenate([v0, v1, v2]).astype(np.float64)
    idx = (np.arange(120).reshape(3, 40).T).astype(np.int32)
    rec = PrimitiveRecord(
        shape=TriangleMeshRecord(vertices=P, indices=idx),
        shape_end=TriangleMeshRecord(vertices=P + [0.5, 0.0, 0.0],
                                     indices=idx),
        material=None)
    g = flatten_geometry([rec], lambda m: -1, lambda p, s: -1)
    geo_b = DeviceGeometry.from_host(g)
    geo_k = DeviceGeometry.from_host(g, accel="kdtree")
    assert geo_k.knodes_delta is not None
    n = 256
    o = rng.uniform(-8, 8, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    time = rng.uniform(0, 1, n).astype(np.float32)
    hb = intersect_closest(geo_b, jnp.asarray(o), jnp.asarray(d),
                           jnp.full((n,), 1e8, jnp.float32),
                           time=jnp.asarray(time))
    hk = intersect_closest(geo_k, jnp.asarray(o), jnp.asarray(d),
                           jnp.full((n,), 1e8, jnp.float32),
                           time=jnp.asarray(time))
    pb, pk = np.asarray(hb.prim), np.asarray(hk.prim)
    np.testing.assert_array_equal(pb >= 0, pk >= 0)
    np.testing.assert_array_equal(np.asarray(hb.t)[pb >= 0],
                                  np.asarray(hk.t)[pk >= 0])
