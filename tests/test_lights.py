"""Light sampling tests: environment-map importance sampling consistency
(reference analog: lights/infinite.cpp + Distribution2D in sampling.h)."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from tpurt.io.exr import write_exr_rgb
from tpurt.render.driver import build_job
from tpurt.render.lights import env_le, env_pdf, env_sample
from tpurt.scene import load_scene_string


@pytest.fixture(scope="module")
def env_scene(tmp_path_factory):
    d = tmp_path_factory.mktemp("env")
    rng = np.random.default_rng(0)
    img = rng.uniform(0.05, 1.0, (16, 32, 3)).astype(np.float32)
    img[4:8, 10:16] *= 20.0  # a bright region to make importance matter
    path = str(d / "env.exr")
    write_exr_rgb(path, img, half=False)
    scene = f"""
    Film "image" "integer xresolution" [16] "integer yresolution" [16]
    Sampler "random" "integer pixelsamples" [4]
    Integrator "path" "integer maxdepth" [2]
    Camera "perspective" "float fov" [60]
    WorldBegin
    LightSource "infinite" "string mapname" "{path}"
    Material "matte" "color Kd" [.5 .5 .5]
    Translate 0 0 4
    Shape "sphere" "float radius" [1]
    WorldEnd
    """
    return load_scene_string(scene), img


def test_env_mc_integral_matches_direct_sum(env_scene):
    sd, img = env_scene
    job = build_job(sd)
    lt = job.scene.lights
    assert lt.env_light_row >= 0

    rng = np.random.default_rng(1)
    n = 20000
    u1 = jnp.asarray(rng.uniform(0, 1, n).astype(np.float32))
    u2 = jnp.asarray(rng.uniform(0, 1, n).astype(np.float32))
    wi, li, pdf = env_sample(lt, u1, u2)
    est = np.asarray(jnp.where(pdf[:, None] > 0, li / pdf[:, None], 0.0)).mean(0)

    he, we = img.shape[:2]
    theta = np.pi * (np.arange(he) + 0.5) / he
    dw = (np.pi / he) * (2 * np.pi / we)
    direct = (img * np.sin(theta)[:, None, None] * dw).sum((0, 1))
    np.testing.assert_allclose(est, direct, rtol=0.05)


def test_env_pdf_matches_sample_pdf(env_scene):
    sd, _ = env_scene
    lt = build_job(sd).scene.lights
    rng = np.random.default_rng(2)
    n = 512
    u1 = jnp.asarray(rng.uniform(0, 1, n).astype(np.float32))
    u2 = jnp.asarray(rng.uniform(0, 1, n).astype(np.float32))
    wi, _li, pdf = env_sample(lt, u1, u2)
    pdf2 = env_pdf(lt, wi)
    np.testing.assert_allclose(np.asarray(pdf), np.asarray(pdf2),
                               rtol=1e-3, atol=1e-5)


def test_env_le_lookup(env_scene):
    sd, img = env_scene
    lt = build_job(sd).scene.lights
    # direction through the center of texel (v=8.5/16, u=12.5/32)
    theta = np.pi * 8.5 / 16
    phi = 2 * np.pi * 12.5 / 32
    d = jnp.asarray([[np.sin(theta) * np.cos(phi),
                      np.sin(theta) * np.sin(phi),
                      np.cos(theta)]], dtype=jnp.float32)
    got = np.asarray(env_le(lt, d))[0]
    np.testing.assert_allclose(got, img[8, 12], rtol=1e-3)


def test_render_with_env_light(env_scene):
    sd, _ = env_scene
    from tpurt.render.driver import render

    img, _ = render(sd, progress=False)
    assert np.isfinite(img).all()
    assert img.mean() > 0.01  # lit from everywhere
    assert img.max() > img.mean()  # bright region visible
