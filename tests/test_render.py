"""End-to-end render tests: analytic scenes with closed-form answers.

Reference analog: tests/analytic_scenes.cpp — complete in-memory scenes
whose average radiance is known exactly (furnace tests), rendered across
sampler x integrator combinations and checked within a small delta
(CheckSceneAverage, analytic_scenes.cpp:53-65).
"""

import numpy as np
import pytest

from tpurt.scene import load_scene_string
from tpurt.render.driver import render


def _avg(img):
    return float(np.mean(img))


def _render_scene(text, **kw):
    sd = load_scene_string(text)
    img, job = render(sd, progress=False, **kw)
    assert np.isfinite(img).all(), "non-finite pixels"
    return img


# A diffuse sphere with Kd=0.5 lit by a point light of intensity I=pi placed
# at its center sees incident irradiance pi*I/(pi*r^2)... the classic pbrt
# furnace setup: point light I at distance d inside; with the camera seeing
# the sphere interior everywhere, radiance = Kd/pi * I / d^2.
FURNACE_POINT = """
Film "image" "integer xresolution" [32] "integer yresolution" [32]
Sampler "{sampler}" "integer pixelsamples" [{spp}]
Integrator "{integrator}"
Camera "perspective" "float fov" [45]
WorldBegin
LightSource "point" "color I" [3.1415926 3.1415926 3.1415926]
Material "matte" "color Kd" [.5 .5 .5] "float sigma" [0]
ReverseOrientation
Shape "sphere" "float radius" [1]
WorldEnd
"""


@pytest.mark.parametrize("sampler,spp", [("halton", 4), ("random", 8),
                                         ("stratified", 4), ("02sequence", 4)])
@pytest.mark.parametrize("integrator", ["path", "directlighting"])
def test_furnace_point_light_inside_sphere(sampler, spp, integrator):
    # camera at origin = light position; every ray hits the sphere interior
    # at distance 1, seeing direct L = Kd/pi * I / d^2 = 0.5; the path
    # integrator adds the interreflection series sum_{k=1..maxdepth} 0.5^k
    # (the classic furnace closed form, truncated at maxdepth=5).
    img = _render_scene(FURNACE_POINT.format(sampler=sampler, spp=spp,
                                             integrator=integrator))
    want = sum(0.5 ** k for k in range(1, 6)) if integrator == "path" else 0.5
    assert abs(_avg(img) - want) < 0.02, (_avg(img), want)


AREA_LIGHT_SCENE = """
Film "image" "integer xresolution" [32] "integer yresolution" [32]
Sampler "halton" "integer pixelsamples" [{spp}]
Integrator "{integrator}"
Camera "perspective" "float fov" [45]
WorldBegin
AttributeBegin
  AreaLightSource "area" "color L" [4 4 4] "bool twosided" "true"
  Translate 0 0 3
  Shape "sphere" "float radius" [1]
AttributeEnd
WorldEnd
"""


@pytest.mark.parametrize("integrator", ["path", "directlighting", "whitted"])
def test_area_light_seen_directly(integrator):
    # camera looks straight at an emissive sphere: pixels on the sphere
    # read L=4 exactly; the sphere subtends a known solid angle.
    img = _render_scene(AREA_LIGHT_SCENE.format(spp=4, integrator=integrator))
    # interior pixels read L exactly; silhouette pixels are partial-coverage
    # averages in (0, 4)
    hot = img[img[..., 0] > 3.9]
    assert len(hot) > 50
    np.testing.assert_allclose(hot, 4.0, rtol=1e-3)
    # background is black (no other lights)
    assert (img[0, 0] == 0).all()


INDIRECT_SCENE = """
Film "image" "integer xresolution" [32] "integer yresolution" [32]
Sampler "halton" "integer pixelsamples" [16]
Integrator "path" "integer maxdepth" [{depth}]
Camera "perspective" "float fov" [60]
WorldBegin
LightSource "point" "color I" [10 10 10] "point from" [0 3 4]
Material "matte" "color Kd" [.7 .7 .7]
Shape "trianglemesh" "point P" [-10 -1 -10  10 -1 -10  10 -1 10  -10 -1 10]
  "integer indices" [0 1 2 2 3 0]
Translate 0 0 4
Shape "sphere" "float radius" [1]
WorldEnd
"""


def test_indirect_bounces_add_energy():
    direct = _render_scene(INDIRECT_SCENE.format(depth=1))
    indirect = _render_scene(INDIRECT_SCENE.format(depth=5))
    assert _avg(indirect) > _avg(direct) * 1.01
    # energy conservation sanity: bounces can't explode
    assert _avg(indirect) < _avg(direct) * 2.0


def test_sphere_light_noise_decreases_with_spp():
    scene = """
    Film "image" "integer xresolution" [32] "integer yresolution" [32]
    Sampler "random" "integer pixelsamples" [{spp}]
    Integrator "path" "integer maxdepth" [1]
    Camera "perspective" "float fov" [60]
    WorldBegin
    AttributeBegin
      AreaLightSource "area" "color L" [20 20 20]
      Translate 0 4 4
      Shape "sphere" "float radius" [.5]
    AttributeEnd
    Material "matte" "color Kd" [.6 .6 .6]
    Translate 0 0 4
    Shape "sphere" "float radius" [1]
    WorldEnd
    """
    img4 = _render_scene(scene.format(spp=4))
    img64 = _render_scene(scene.format(spp=64))
    # means agree (unbiased), variance shrinks
    lit4 = img4[..., 0][img64[..., 0] > 0.01]
    lit64 = img64[..., 0][img64[..., 0] > 0.01]
    assert abs(lit4.mean() - lit64.mean()) / lit64.mean() < 0.35


def test_mirror_reflects_light_sphere():
    scene = """
    Film "image" "integer xresolution" [32] "integer yresolution" [32]
    Sampler "halton" "integer pixelsamples" [8]
    Integrator "path" "integer maxdepth" [3]
    Camera "perspective" "float fov" [40]
    WorldBegin
    AttributeBegin
      AreaLightSource "area" "color L" [5 5 5] "bool twosided" "true"
      Translate 0 8 0
      Shape "sphere" "float radius" [2]
    AttributeEnd
    Material "mirror" "color Kr" [.9 .9 .9]
    Translate 0 0 6
    Shape "sphere" "float radius" [2]
    WorldEnd
    """
    img = _render_scene(scene)
    # the mirror sphere shows a bright reflection of the light somewhere
    assert img.max() > 2.0
    assert _avg(img) > 0.001


def test_ao_integrator():
    scene = """
    Film "image" "integer xresolution" [32] "integer yresolution" [32]
    Sampler "random" "integer pixelsamples" [2]
    Integrator "ao" "integer nsamples" [8]
    Camera "perspective" "float fov" [60]
    WorldBegin
    Material "matte" "color Kd" [.5 .5 .5]
    Shape "trianglemesh" "point P" [-10 -1 -10  10 -1 -10  10 -1 10  -10 -1 10]
      "integer indices" [0 1 2 2 3 0]
    Translate 0 0 4
    Shape "sphere" "float radius" [1]
    WorldEnd
    """
    sd = load_scene_string(scene)
    img, _ = render(sd, progress=False)
    # open floor: ao ~ 1 away from the sphere, < 1 beside it, in [0,1]
    assert img.max() <= 1.0 + 1e-5
    assert img.max() > 0.9
    assert img.min() >= 0.0


def test_plastic_highlight():
    scene = """
    Film "image" "integer xresolution" [32] "integer yresolution" [32]
    Sampler "halton" "integer pixelsamples" [8]
    Integrator "path" "integer maxdepth" [2]
    Camera "perspective" "float fov" [45]
    WorldBegin
    AttributeBegin
      AreaLightSource "area" "color L" [30 30 30]
      Translate 3 3 1
      Shape "sphere" "float radius" [.3]
    AttributeEnd
    Material "plastic" "color Kd" [.2 .2 .6] "color Ks" [.7 .7 .7]
      "float roughness" [.05]
    Translate 0 0 4
    Shape "sphere" "float radius" [1]
    WorldEnd
    """
    img = _render_scene(scene)
    # specular highlight should be much brighter than the diffuse body
    body = np.median(img[img.sum(-1) > 0.01].reshape(-1))
    assert img.max() > 4 * body


MIX_SCENE = """
Film "image" "integer xresolution" [24] "integer yresolution" [24]
Sampler "halton" "integer pixelsamples" [8]
Integrator "path"
Camera "perspective" "float fov" [45]
WorldBegin
LightSource "point" "color I" [3.1415926 3.1415926 3.1415926]
MakeNamedMaterial "red" "string type" "matte" "color Kd" [1 0 0] "float sigma" [0]
MakeNamedMaterial "blue" "string type" "matte" "color Kd" [0 0 1] "float sigma" [0]
Material "mix" "string namedmaterial1" ["red"] "string namedmaterial2" ["blue"]
  "color amount" [{amt} {amt} {amt}]
ReverseOrientation
Shape "sphere" "float radius" [1]
WorldEnd
"""


def test_mix_material_blends_submaterials():
    # furnace closed form per channel with the blended albedo
    # Kd_blend = amt*red + (1-amt)*blue (materials/mix.cpp scaling):
    # radiance = sum_{k=1..maxdepth+1} Kd^k
    img = _render_scene(MIX_SCENE.format(amt=0.75))
    mean = img.reshape(-1, 3).mean(axis=0)
    want_r = sum(0.75 ** k for k in range(1, 6))
    want_b = sum(0.25 ** k for k in range(1, 6))
    assert abs(mean[0] - want_r) < 0.05, (mean, want_r)
    assert abs(mean[2] - want_b) < 0.02, (mean, want_b)
    assert mean[1] < 0.01, mean


def test_warm_render_cache_reuse_and_invalidation():
    """render() memoizes (job, traced step) per SceneDescription; a repeat
    render must give the identical image, and mutating the scene's params
    must invalidate the entry (tpurt/render/driver.py _RENDER_CACHE)."""
    from tpurt.render.driver import _RENDER_CACHE

    sd = load_scene_string(FURNACE_POINT.format(sampler="halton", spp=2,
                                                integrator="path"))
    img1, _ = render(sd, progress=False)
    key_count = len(_RENDER_CACHE)
    img2, _ = render(sd, progress=False)
    assert np.array_equal(np.asarray(img1), np.asarray(img2))
    assert len(_RENDER_CACHE) == key_count  # warm hit, no new entry

    # a param mutation must re-render (different spp -> different noise)
    sd.sampler_params.add("integer", "pixelsamples", [4])
    img3, _ = render(sd, progress=False)
    assert not np.array_equal(np.asarray(img1), np.asarray(img3))
    assert len(_RENDER_CACHE) <= 4  # bounded FIFO


def test_fuse_shadow_rays_bit_identical():
    """config.fuse_shadow_rays toggles between one mixed traversal and
    separate closest+any-hit calls; the images must be BIT-identical
    (same rays, same hits, different scheduling only)."""
    from tpurt.config import set_config

    scene = FURNACE_POINT.format(sampler="halton", spp=2,
                                 integrator="path")
    img_f = _render_scene(scene)
    set_config(fuse_shadow_rays=False)
    try:
        img_s = _render_scene(scene)
    finally:
        set_config(fuse_shadow_rays=True)
    assert np.array_equal(np.asarray(img_f), np.asarray(img_s))


def test_compact_bounces_matches_scan():
    """config.compact_bounces toggles the bounce-compacted wavefront
    driver (render.driver._render_compact) against the one-jit lax.scan
    formulation.  Same rays, same hits, same film contributions — only
    the film scatter-add ORDER differs (dead lanes bank early), so the
    images must agree to f32 accumulation rounding."""
    from tpurt.config import set_config

    scene = """
    Film "image" "integer xresolution" [32] "integer yresolution" [32]
    Sampler "halton" "integer pixelsamples" [4]
    Integrator "path" "integer maxdepth" [4]
    Camera "perspective" "float fov" [55]
    WorldBegin
    AttributeBegin
      AreaLightSource "area" "color L" [12 12 12]
      Translate 0 3 -4
      Shape "sphere" "float radius" [0.5]
    AttributeEnd
    Material "matte" "color Kd" [.6 .55 .5]
    Translate 0 0 -4
    Shape "sphere" "float radius" [1]
    Material "plastic" "color Kd" [.2 .3 .6] "float roughness" [.04]
    Translate 0 -1.3 0
    Shape "trianglemesh" "point P" [-5 0 -5  5 0 -5  5 0 5  -5 0 5]
      "integer indices" [0 1 2 2 3 0]
    WorldEnd
    """
    img_c = np.asarray(_render_scene(scene), np.float64)
    set_config(compact_bounces=False)
    try:
        img_s = np.asarray(_render_scene(scene), np.float64)
    finally:
        set_config(compact_bounces=True)
    mse = float(((img_c - img_s) ** 2).mean())
    assert mse < 1e-12, mse
    np.testing.assert_allclose(img_c, img_s, atol=1e-4)
