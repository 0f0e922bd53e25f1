"""Native library parity tests: the C++ fast paths must agree with the
pure-Python reference implementations."""

import numpy as np
import pytest

from tpurt.native import build_bvh_native, gen_halton_perms_native, get_lib

pytestmark = pytest.mark.skipif(get_lib() is None,
                                reason="native toolchain unavailable")


def test_halton_perms_bit_exact_with_python():
    from tpurt.sampling import lowdiscrepancy as ld
    from tpurt.sampling.rng import PCG32, shuffle_inplace

    primes = ld.PRIMES[:40]  # python loop is slow; 40 bases is plenty
    native = gen_halton_perms_native(primes)
    rng = PCG32()
    off = 0
    for p in primes:
        p = int(p)
        seg = np.arange(p, dtype=np.uint16)
        shuffle_inplace(seg, rng)
        np.testing.assert_array_equal(native[off:off + p], seg, err_msg=f"base {p}")
        off += p


def test_native_bvh_is_valid_and_fast():
    from tpurt.geom.bvh import LinearBVH

    rng = np.random.default_rng(0)
    n = 5000
    lo = rng.uniform(-10, 10, (n, 3)).astype(np.float32)
    hi = lo + rng.uniform(0.01, 1.0, (n, 3)).astype(np.float32)
    nat = build_bvh_native(lo, hi, 1)
    assert nat is not None
    nb_lo, nb_hi, right, prim_off, n_prims, axis, order = nat
    bvh = LinearBVH(nb_lo, nb_hi, right, prim_off, n_prims, axis, order)
    # structural invariants
    assert sorted(order.tolist()) == list(range(n))
    assert (n_prims <= 1).all()
    n_leaves = int((n_prims == 1).sum())
    assert n_leaves == n
    # leaves contain their prims
    for i in range(0, bvh.n_nodes, 97):
        if n_prims[i] == 1:
            p = order[prim_off[i]]
            assert (lo[p] >= nb_lo[i] - 1e-3).all()
            assert (hi[p] <= nb_hi[i] + 1e-3).all()
    # children are inside parents and DFS layout holds
    for i in range(0, bvh.n_nodes, 53):
        if n_prims[i] == 0:
            for ch in (i + 1, right[i]):
                assert (nb_lo[ch] >= nb_lo[i] - 1e-3).all()
                assert (nb_hi[ch] <= nb_hi[i] + 1e-3).all()
            assert right[i] > i + 1


def test_native_bvh_traversal_matches_brute_force():
    """End-to-end: BVH from the native builder drives the device traversal
    to the same hits as brute force."""
    import jax
    import jax.numpy as jnp

    from tpurt.render.intersect import DeviceGeometry, intersect_closest, _intersect_prim
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from test_intersect import _scene_geo, _random_tri_scene

    rng = np.random.default_rng(7)
    geo = DeviceGeometry.from_host(_scene_geo(_random_tri_scene(rng, 60, 3)))
    n = 64
    o = rng.uniform(-8, 8, (n, 3)).astype(np.float32)
    t = (rng.uniform(-5, 5, (n, 3)) + rng.standard_normal((n, 3))).astype(np.float32)
    d = t - o
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    hit = intersect_closest(geo, jnp.asarray(o), jnp.asarray(d), 1e8)

    def brute_one(oo, dd):
        def body(pi, best):
            t_b, p_b = best
            h, tt, _, _ = _intersect_prim(geo, pi, oo, dd, t_b)
            better = h & (tt < t_b)
            return jnp.where(better, tt, t_b), jnp.where(better, pi, p_b)
        return jax.lax.fori_loop(0, geo.prim_type.shape[0], body,
                                 (jnp.float32(1e8), jnp.int32(-1)))

    bt, bp = jax.jit(jax.vmap(brute_one))(jnp.asarray(o), jnp.asarray(d))
    np.testing.assert_array_equal(np.asarray(hit.prim >= 0), np.asarray(bp >= 0))
    sel = np.asarray(bp >= 0)
    np.testing.assert_allclose(np.asarray(hit.t)[sel], np.asarray(bt)[sel],
                               rtol=1e-4)
