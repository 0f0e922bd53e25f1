"""Correctness tests for the Pallas kernel experiments (interpret mode on
CPU; on-chip the same kernel measured hit-agreement 1.0 vs the jnp path,
see tpurt/kernels/traverse.py)."""

import numpy as np
import jax.numpy as jnp
import pytest

from tpurt.geom.wbvh import WIDTH


@pytest.mark.skipif(WIDTH != 8, reason="kernel hardcodes 8-wide layout")
def test_pallas_traversal_matches_jnp_interpret():
    from tpurt.scene import load_scene_string
    from tpurt.render.driver import build_job
    from tpurt.render import intersect as ix
    from tpurt.kernels.traverse import BLOCK, traverse_closest_pallas

    scene = """
    Film "image" "integer xresolution" [16] "integer yresolution" [16]
    Camera "perspective" "float fov" [60]
    WorldBegin
    Material "matte" "color Kd" [.5 .5 .5]
    Shape "trianglemesh"
      "point P" [-10 -1 -10  10 -1 -10  10 -1 10  -10 -1 10
                 -1 -1 -1  1 -1 -1  0 1 0]
      "integer indices" [0 1 2 2 3 0 4 5 6]
    WorldEnd
    """
    job = build_job(load_scene_string(scene))
    geo = job.scene.geo

    n = BLOCK
    rng = np.random.default_rng(7)
    o = jnp.asarray(rng.uniform(-3, 3, (n, 3)).astype(np.float32))
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d = jnp.asarray(d)
    tm = jnp.full((n,), np.inf, jnp.float32)

    t0, p0, _, _ = ix._traverse_wide(geo, o, d, tm, any_hit=False)
    t1, p1, _, _ = traverse_closest_pallas(
        geo.wnodes, o, d, tm, stack_depth=geo.wstack_depth, interpret=True)
    t0, p0 = np.asarray(t0), np.asarray(p0)
    t1, p1 = np.asarray(t1), np.asarray(p1)
    assert ((p0 >= 0) == (p1 >= 0)).all()
    both = (p0 >= 0) & (p1 >= 0)
    assert (p0[both] == p1[both]).all()
    np.testing.assert_allclose(t0[both], t1[both], rtol=2e-5)
