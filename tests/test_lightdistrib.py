"""Spatial light distribution tests (lightdistrib.cpp analog)."""

import jax.numpy as jnp
import numpy as np

from tpurt.render.driver import build_job, render
from tpurt.render.lights import choose_light
from tpurt.scene import load_scene_string

TWO_LIGHT_SCENE = """
Film "image" "integer xresolution" [24] "integer yresolution" [24]
Sampler "random" "integer pixelsamples" [{spp}]
Integrator "path" "integer maxdepth" [1]
  "string lightsamplestrategy" "{strategy}"
Camera "perspective" "float fov" [60]
WorldBegin
LightSource "point" "color I" [50 50 50] "point from" [-20 1 4]
LightSource "point" "color I" [0.5 0.5 0.5] "point from" [0.8 0.8 3]
Material "matte" "color Kd" [.6 .6 .6]
Shape "trianglemesh" "point P" [-2 -1 2  2 -1 2  2 -1 6  -2 -1 6]
  "integer indices" [0 1 2 2 3 0]
WorldEnd
"""


def test_spatial_grid_built_for_multi_light_scene():
    sd = load_scene_string(TWO_LIGHT_SCENE.format(spp=1, strategy="spatial"))
    lt = build_job(sd).scene.lights
    assert lt.spat_res > 1
    assert lt.spat_cdf.shape[0] == lt.spat_res ** 3
    # pmfs are normalized per voxel
    np.testing.assert_allclose(np.asarray(lt.spat_pmf).sum(-1), 1.0, atol=1e-5)
    # a voxel near the weak-but-close light prefers it more than the far
    # voxels do
    u = jnp.asarray(np.full(4, 0.99, np.float32))
    near_p = jnp.asarray(np.tile([[0.8, 0.8, 3.0]], (4, 1)).astype(np.float32))
    far_p = jnp.asarray(np.tile([[-19.0, 1.0, 4.0]], (4, 1)).astype(np.float32))
    _, pmf_near = choose_light(lt, u, "spatial", p=near_p)
    _, pmf_far = choose_light(lt, u, "spatial", p=far_p)
    # pmf of the chosen (high-u -> later CDF entry) light differs by region
    assert not np.allclose(np.asarray(pmf_near), np.asarray(pmf_far))


def test_spatial_strategy_unbiased_vs_uniform():
    imgs = {}
    for strategy in ("uniform", "power", "spatial"):
        sd = load_scene_string(TWO_LIGHT_SCENE.format(spp=64,
                                                      strategy=strategy))
        img, _ = render(sd, progress=False)
        assert np.isfinite(img).all(), strategy
        imgs[strategy] = img
    lit = imgs["uniform"].sum(-1) > 0.01
    for strategy in ("power", "spatial"):
        a = imgs[strategy][lit].mean()
        b = imgs["uniform"][lit].mean()
        assert abs(a - b) / b < 0.15, (strategy, a, b)
