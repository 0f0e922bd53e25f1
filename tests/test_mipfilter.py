"""MIP texture filtering tests (core/mipmap.h trilinear Lookup analog)."""

import numpy as np

import jax.numpy as jnp

import tpurt.io as tio
from tpurt.render.driver import render
from tpurt.scene import load_scene_string


def _checker_file(tmp_path, n=64):
    img = np.indices((n, n)).sum(0) % 2
    img = np.repeat(img[..., None], 3, -1).astype(np.float32)
    p = str(tmp_path / "checker.exr")
    tio.write_image(p, img)
    return p


def test_trilinear_tiny_width_matches_level0(tmp_path):
    from tpurt.render.texeval import (
        _bilinear_sample,
        _load_image_pyramid,
        _trilinear_sample,
    )

    p = _checker_file(tmp_path)
    rng = np.random.default_rng(4)
    u = jnp.asarray(rng.random(256), jnp.float32)
    v = jnp.asarray(rng.random(256), jnp.float32)
    lvl0 = _load_image_pyramid(p, False)[0]
    a = np.asarray(_bilinear_sample(lvl0, u, v, "repeat"))
    b = np.asarray(_trilinear_sample(p, False, u, v,
                                     jnp.full(256, 1e-7, jnp.float32),
                                     "repeat"))
    np.testing.assert_allclose(b, a, atol=1e-5)
    # huge width -> the 1x1 top level = image mean
    c = np.asarray(_trilinear_sample(p, False, u, v,
                                     jnp.full(256, 10.0, jnp.float32),
                                     "repeat"))
    np.testing.assert_allclose(c, 0.5, atol=0.02)


def test_receding_plane_antialiases(tmp_path):
    """A high-frequency checker on a plane receding to the horizon: far
    rows must converge to the 0.5 gray mean instead of aliasing between
    black and white (footprint-driven MIP selection)."""
    p = _checker_file(tmp_path)
    scene = f"""
    Film "image" "integer xresolution" [48] "integer yresolution" [48]
    Sampler "random" "integer pixelsamples" [4]
    Integrator "path" "integer maxdepth" [2]
    LookAt 0 1.2 0  0 0.9 5  0 1 0
    Camera "perspective" "float fov" [50]
    WorldBegin
    LightSource "distant" "color L" [3.2 3.2 3.2] "point from" [0 5 0] "point to" [0 0 0]
    Texture "chk" "color" "imagemap" "string filename" "{p}"
      "float uscale" [8] "float vscale" [8]
    Material "matte" "texture Kd" "chk"
    Shape "trianglemesh" "integer indices" [0 1 2 0 2 3]
      "point P" [-60 0 0  60 0 0  60 0 300  -60 0 300]
      "float uv" [0 0  1 0  1 1  0 1]
    WorldEnd
    """
    img, _ = render(load_scene_string(scene), progress=False)
    assert np.isfinite(img).all()
    # far rows (near the horizon) should be smooth mid-gray
    far = img[22:26, 8:40, 0]
    assert far.mean() > 0.05
    rel_spread = far.std() / far.mean()
    assert rel_spread < 0.25, rel_spread
    # near rows keep detail: the checker contrast survives up close
    near = img[42:48, 8:40, 0]
    near_rel = near.std() / max(near.mean(), 1e-6)
    assert near_rel > rel_spread, (near_rel, rel_spread)


def test_ewa_blocked_matches_taps_oracle(tmp_path):
    """The blocked 16-texel-row EWA fetch (2 block gathers per window
    row) must reproduce the texel-at-a-time taps window exactly: same
    13x13 support, same elliptical-Gaussian weights, same degenerate
    centre-texel fallback — for every wrap mode, across in-range and
    wrapped/overshooting uv and isotropic through clamped-anisotropic
    footprints."""
    from tpurt.render.texeval import _ewa_level_blocked, _ewa_level_taps

    # non-square, non-power-of-16 level-0 so apron/stride math is honest
    rng = np.random.default_rng(7)
    img = rng.random((37, 53, 3)).astype(np.float32)
    p = str(tmp_path / "rand.exr")
    tio.write_image(p, img)

    n = 512
    u = jnp.asarray(rng.random(n) * 1.6 - 0.3, jnp.float32)  # overshoot
    v = jnp.asarray(rng.random(n) * 1.6 - 0.3, jnp.float32)
    # footprints from sub-texel to strongly anisotropic (aniso clamp hits)
    mag0 = rng.random(n) * 0.08
    mag1 = mag0 * (0.05 + rng.random(n))
    ang = rng.random(n) * np.pi
    dst0 = jnp.asarray(np.stack([np.cos(ang), np.sin(ang)], -1)
                       * mag0[:, None], jnp.float32)
    dst1 = jnp.asarray(np.stack([-np.sin(ang), np.cos(ang)], -1)
                       * mag1[:, None], jnp.float32)
    li = jnp.asarray(rng.integers(0, 3, n), jnp.int32)
    for wrap in ("repeat", "clamp", "black"):
        if wrap == "repeat":
            uw, vw = u, v
        else:
            # clamp exactness is only guaranteed within the apron;
            # black is exact everywhere but keep uv comparable
            uw = jnp.clip(u, -0.05, 1.05)
            vw = v
        a = np.asarray(_ewa_level_taps(p, False, uw, vw, dst0, dst1,
                                       li, wrap))
        b = np.asarray(_ewa_level_blocked(p, False, uw, vw, dst0, dst1,
                                          li, wrap))
        np.testing.assert_allclose(b, a, rtol=2e-5, atol=2e-6,
                                   err_msg=wrap)


def test_ewa_grazing_checker_beats_trilinear(tmp_path):
    """True ray differentials + EWA (camera.h GenerateRayDifferential +
    mipmap.h:56-63): at grazing incidence the footprint is strongly
    anisotropic — EWA must keep the same energy as the trilinear cone
    (no bias) while resolving MORE detail across the short axis (the
    isotropic cone over-blurs the direction that doesn't stretch)."""
    from tpurt.config import set_config

    p = _checker_file(tmp_path)
    scene = f"""
    Film "image" "integer xresolution" [48] "integer yresolution" [48]
    Sampler "random" "integer pixelsamples" [8]
    Integrator "path" "integer maxdepth" [2]
    LookAt 0 0.6 0  0 0.45 5  0 1 0
    Camera "perspective" "float fov" [50]
    WorldBegin
    LightSource "distant" "color L" [3.2 3.2 3.2] "point from" [0 5 0] "point to" [0 0 0]
    Texture "chk" "color" "imagemap" "string filename" "{p}"
      "float uscale" [6] "float vscale" [6]
    Material "matte" "texture Kd" "chk"
    Shape "trianglemesh" "integer indices" [0 1 2 0 2 3]
      "point P" [-60 0 0  60 0 0  60 0 300  -60 0 300]
      "float uv" [0 0  1 0  1 1  0 1]
    WorldEnd
    """
    try:
        set_config(texture_filter="ewa")
        img_ewa, _ = render(load_scene_string(scene), progress=False)
        set_config(texture_filter="trilinear")
        img_tri, _ = render(load_scene_string(scene), progress=False)
    finally:
        set_config(texture_filter="ewa")
    img_ewa = np.asarray(img_ewa)
    img_tri = np.asarray(img_tri)
    assert np.isfinite(img_ewa).all()
    # same energy (both unbiased estimates of the filtered texture)
    assert abs(img_ewa.mean() - img_tri.mean()) / img_tri.mean() < 0.05
    # far rows (safely below the horizon line, which sits near row 23
    # for this camera) stay smooth under EWA (no aliasing reintroduced)
    far = img_ewa[26:30, 8:40, 0]
    assert far.std() / max(far.mean(), 1e-6) < 0.35, (
        far.std(), far.mean())
    # mid-distance rows: EWA resolves more cross-axis detail than the
    # isotropic cone, i.e. HIGHER local contrast where trilinear blurs.
    # With the wide (maxanisotropy-8) pass the measured advantage is
    # ~1.24x; require a real margin, not just parity (tightened round 5)
    mid_e = img_ewa[34:44, 8:40, 0]
    mid_t = img_tri[34:44, 8:40, 0]
    assert mid_e.std() >= 1.1 * mid_t.std(), (mid_e.std(), mid_t.std())


def test_ewa_wide_matches_35tap_oracle(tmp_path):
    """The wide (high-anisotropy) EWA pass — K=4 oriented strip fetches
    ownership-partitioned along the major axis — must reproduce a 35x35
    static taps window exactly (35 taps bound the aniso-8 ellipse the way
    13 bound the 2.9-clamped one): same weights, same support, for every
    wrap mode, across 3:1 through 8:1 footprints at arbitrary angles and
    overshooting uv (clamp within the apron, like the 13x13 gate)."""
    from tpurt.render.texeval import _ewa_level_taps, _ewa_level_wide

    rng = np.random.default_rng(11)
    img = rng.random((37, 53, 3)).astype(np.float32)
    p = str(tmp_path / "rand.exr")
    tio.write_image(p, img)

    n = 96
    u = jnp.asarray(rng.random(n) * 1.6 - 0.3, jnp.float32)
    v = jnp.asarray(rng.random(n) * 1.6 - 0.3, jnp.float32)
    ang = rng.random(n) * np.pi
    minor_mag = (1.0 + rng.random(n)) / 53.0  # ~1-2 texels at level 0
    aniso = 3.0 + rng.random(n) * 5.0         # 3:1 .. 8:1
    dst0 = jnp.asarray(np.stack([np.cos(ang), np.sin(ang)], -1)
                       * (minor_mag * aniso)[:, None], jnp.float32)
    dst1 = jnp.asarray(np.stack([-np.sin(ang), np.cos(ang)], -1)
                       * minor_mag[:, None], jnp.float32)
    li = jnp.asarray(rng.integers(0, 2, n), jnp.int32)
    for wrap in ("repeat", "clamp", "black"):
        if wrap == "clamp":
            uw, vw = jnp.clip(u, -0.05, 1.05), jnp.clip(v, -0.05, 1.05)
        else:
            uw, vw = u, v
        a = np.asarray(_ewa_level_taps(p, False, uw, vw, dst0, dst1,
                                       li, wrap, taps=35))
        b = np.asarray(_ewa_level_wide(p, False, uw, vw, dst0, dst1,
                                       li, wrap))
        np.testing.assert_allclose(b, a, rtol=2e-5, atol=2e-6,
                                   err_msg=wrap)


def test_ewa_sample_honors_maxanisotropy(tmp_path):
    """An 8:1 grazing footprint across fine horizontal stripes: honoring
    "maxanisotropy" 8 (the reference default, imagemap.cpp:130) keeps the
    minor axis near one texel -> a fine MIP level -> the stripes survive;
    the old hard 2.9 clamp widened the minor ~3x -> level ~2 -> stripes
    average away to the 0.5 mean."""
    from tpurt.render.texeval import _ewa_sample

    stripes = np.zeros((64, 64, 3), np.float32)
    stripes[(np.arange(64) // 2) % 2 == 0, :, :] = 1.0  # period 4 in v
    p = str(tmp_path / "stripes.exr")
    tio.write_image(p, stripes)

    n = 64
    rng = np.random.default_rng(3)
    u = jnp.asarray(rng.random(n), jnp.float32)
    # stripe centres (bright rows): v texel in {0,1, 4,5, 8,9, ...}
    vt = (rng.integers(0, 16, n) * 4 + 0.5 + rng.integers(0, 2, n))
    v = jnp.asarray((vt + 0.0) / 64.0, jnp.float32)
    dst0 = jnp.asarray(np.stack([np.full(n, 12.0 / 64.0),
                                 np.zeros(n)], -1), jnp.float32)  # major u
    dst1 = jnp.asarray(np.stack([np.zeros(n),
                                 np.full(n, 1.0 / 64.0)], -1), jnp.float32)
    sharp = np.asarray(_ewa_sample(p, False, u, v, dst0, dst1, "repeat",
                                   max_aniso=8.0))
    blurred = np.asarray(_ewa_sample(p, False, u, v, dst0, dst1, "repeat",
                                     max_aniso=2.9))
    # bright-stripe lookups: the wide pass preserves contrast
    # measured: sharp 0.741 (level ~0.6 keeps the stripes), blurred 0.500
    # (level >= 2 averages them away entirely)
    assert sharp[:, 0].mean() > 0.70, sharp[:, 0].mean()
    assert blurred[:, 0].mean() < sharp[:, 0].mean() - 0.15, (
        sharp[:, 0].mean(), blurred[:, 0].mean())
