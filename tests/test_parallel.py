"""Multi-device rendering tests on the virtual 8-device CPU mesh.

Reference analog: tests/parallel.cpp (ParallelFor atomic-counter
correctness) — here the contract is stronger: the sharded render must
produce the SAME image as the single-device render (the film psum replaces
the mutex merge), and the row-sharded RPF halo filter must match the
single-device filter."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpurt.parallel.mesh import make_mesh, render_sharded, rpf_filter_sharded
from tpurt.render.driver import render
from tpurt.rpf.filter import apply_rpf_filter
from tpurt.scene import load_scene_string

SCENE = """
Film "image" "integer xresolution" [32] "integer yresolution" [32]
Sampler "halton" "integer pixelsamples" [2]
Integrator "path" "integer maxdepth" [2]
Camera "perspective" "float fov" [60]
WorldBegin
AttributeBegin
  AreaLightSource "area" "color L" [10 10 10]
  Translate 0 3 4
  Shape "sphere" "float radius" [.5]
AttributeEnd
Material "matte" "color Kd" [.6 .5 .4]
Shape "trianglemesh" "point P" [-10 -1 -10  10 -1 -10  10 -1 10  -10 -1 10]
  "integer indices" [0 1 2 2 3 0]
Translate 0 0 4
Shape "sphere" "float radius" [1]
WorldEnd
"""


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs multiple devices")
def test_sharded_render_matches_single_device():
    sd = load_scene_string(SCENE)
    img1, _ = render(sd, progress=False)
    sd2 = load_scene_string(SCENE)
    img8, _ = render_sharded(sd2, mesh=make_mesh(len(jax.devices())))
    np.testing.assert_allclose(img8, img1, atol=2e-5)


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs multiple devices")
def test_sharded_rpf_filter_matches_single_device():
    rng = np.random.default_rng(0)
    n_dev = len(jax.devices())
    h, w, s = 2 * n_dev, 6, 2
    buf = np.zeros((h, w, s, 19), np.float32)
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    buf[..., 0] = xx[..., None] + rng.uniform(0, 1, (h, w, s))
    buf[..., 1] = yy[..., None] + rng.uniform(0, 1, (h, w, s))
    buf[..., 2:5] = rng.uniform(0, 2, (h, w, s, 3))
    buf[..., 5:7] = rng.uniform(0, 1, (h, w, s, 2))
    buf[..., 7:19] = 1.0 + 0.01 * rng.standard_normal((h, w, s, 12))

    single = np.asarray(apply_rpf_filter(jnp.asarray(buf), 5, pixel_chunk=32))
    mesh = make_mesh(n_dev)
    sharded = np.asarray(rpf_filter_sharded(mesh, jnp.asarray(buf), 5))
    np.testing.assert_allclose(sharded, single, atol=1e-4, rtol=1e-4)


@pytest.mark.skipif(len(jax.devices()) < 3, reason="needs >=3 devices")
def test_sharded_rpf_filter_ragged_rows_n3():
    """Non-power-of-two mesh (n=3) with a row count that does NOT divide
    it: the pad rows must not contaminate any neighborhood and the
    result must equal the single-device filter."""
    rng = np.random.default_rng(1)
    h, w, s = 7, 5, 2  # 7 rows over 3 devices -> pad to 9
    buf = np.zeros((h, w, s, 19), np.float32)
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    buf[..., 0] = xx[..., None] + rng.uniform(0, 1, (h, w, s))
    buf[..., 1] = yy[..., None] + rng.uniform(0, 1, (h, w, s))
    buf[..., 2:5] = rng.uniform(0, 2, (h, w, s, 3))
    buf[..., 5:7] = rng.uniform(0, 1, (h, w, s, 2))
    buf[..., 7:19] = 1.0 + 0.01 * rng.standard_normal((h, w, s, 12))

    single = np.asarray(apply_rpf_filter(jnp.asarray(buf), 3, pixel_chunk=32))
    sharded = np.asarray(rpf_filter_sharded(make_mesh(3), jnp.asarray(buf), 3))
    assert sharded.shape == single.shape
    np.testing.assert_allclose(sharded, single, atol=1e-4, rtol=1e-4)


@pytest.mark.skipif(len(jax.devices()) < 3, reason="needs >=3 devices")
def test_sharded_render_scatter_film_ragged_n3():
    """Row-sharded (reduce_scatter) film accumulation on a 3-device mesh
    whose film height does not divide it — must match the single-device
    image exactly like the psum path."""
    sd = load_scene_string(SCENE)
    img1, _ = render(sd, progress=False)
    sd2 = load_scene_string(SCENE)
    img3, _ = render_sharded(sd2, mesh=make_mesh(3), scatter_film=True)
    np.testing.assert_allclose(img3, img1, atol=2e-5)
