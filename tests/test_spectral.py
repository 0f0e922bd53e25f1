"""SampledSpectrum (60-bin) mode: conversion tables + spectral renders.

Reference analog: core/spectrum.{h,cpp} under PBRT_SAMPLED_SPECTRUM
(pbrt.h:126-130).
"""

import numpy as np
import pytest

from tpurt import spectrum_sampled as ss


def test_tables_from_upstream():
    t = ss.tables()
    # the reference tree is present in this environment, so the exact
    # upstream basis must load (the analytic fallback is for foreign envs)
    assert t.source == "upstream"
    assert t.basis_refl.shape == (7, 60)
    assert t.basis_illum.shape == (7, 60)
    assert np.isfinite(t.to_xyz).all()


def test_white_reflectance_is_flat():
    """FromRGB(1,1,1) reflectance must be near-flat (0.94-scaled white
    basis).  NOTE a reflectance-only XYZ->RGB round trip is red-shifted
    BY DESIGN (pbrt's XYZToRGB is the sRGB/D65 matrix; equal-energy E
    maps to ~(1.20, .95, .90)) — neutrality comes from the D65-shaped
    illuminant basis, tested below."""
    bins = ss.lift_refl_np(np.array([1.0, 1.0, 1.0]))
    assert bins.shape == (60,)
    assert bins.min() > 0.9 and bins.max() < 1.05


def test_full_pipeline_roundtrips():
    """reflectance x white illuminant -> XYZ -> RGB approximates the
    RGB-mode product albedo * L, the way a render composes the two
    promotions (pbrt's spectral mode agrees with RGB mode to a few %
    on RGB-defined scenes)."""
    rng = np.random.default_rng(0)
    rgb = rng.uniform(0.1, 0.9, (64, 3)).astype(np.float32)
    white_l = ss.lift_illum_np(np.array([1.0, 1.0, 1.0]))
    back = ss.bins_to_rgb_np(ss.lift_refl_np(rgb) * white_l)
    rel = np.abs(back - rgb) / np.maximum(rgb, 1e-3)
    assert np.median(rel) < 0.10, float(np.median(rel))
    assert rel.max() < 0.45, rel.max()


def test_illuminant_scale_matches_reference_y():
    """FromRGB(1,1,1) as an illuminant integrates to Y ~= 0.86445 * the
    white basis's luminance (spectrum.cpp:385)."""
    bins = ss.lift_illum_np(np.array([1.0, 1.0, 1.0]))
    y = ss.luminance_bins(bins)
    assert 0.7 < y < 1.15, y


def test_coeff7_matches_scalar_reference():
    """The vectorized 6-case select matches a literal scalar port of
    FromRGB's control flow."""
    def scalar(rgb):
        r, g, b = rgb
        c = np.zeros(7)
        if r <= g and r <= b:
            c[0] = r
            if g <= b:
                c[1], c[6] = g - r, b - g
            else:
                c[1], c[5] = b - r, g - b
        elif g <= r and g <= b:
            c[0] = g
            if r <= b:
                c[2], c[6] = r - g, b - r
            else:
                c[2], c[4] = b - g, r - b
        else:
            c[0] = b
            if r <= g:
                c[3], c[5] = r - b, g - r
            else:
                c[3], c[4] = g - b, r - g
        return c

    rng = np.random.default_rng(1)
    for rgb in rng.uniform(0, 1, (50, 3)):
        np.testing.assert_allclose(ss.rgb_to_coeff7(rgb), scalar(rgb),
                                   atol=1e-7)


def test_spd_to_bins_constant_and_linear():
    # constant SPD -> constant bins
    bins = ss.spd_to_bins([300.0, 800.0], [2.5, 2.5])
    np.testing.assert_allclose(bins, 2.5, rtol=1e-6)
    # linear SPD -> bin means of the line
    lam = np.array([400.0, 700.0])
    val = np.array([0.0, 1.0])
    bins = ss.spd_to_bins(lam, val)
    centers = ss.bin_centers()
    np.testing.assert_allclose(bins, (centers - 400.0) / 300.0, atol=1e-3)


def test_device_lift_matches_host():
    import jax.numpy as jnp

    rng = np.random.default_rng(2)
    rgb = rng.uniform(0, 1, (32, 3)).astype(np.float32)
    host = ss.lift_refl_np(rgb)
    dev = np.asarray(ss.lift_refl(jnp.asarray(rgb)))
    np.testing.assert_allclose(dev, host, rtol=2e-5, atol=2e-6)


@pytest.mark.parametrize("integ", ["path", "volpath", "bdpt"])
def test_spectral_render_matches_rgb_mode(integ):
    """A matte + area-light scene renders near-identically in RGB and
    sampled-spectrum mode (the reference's two compile modes agree to a
    few % on RGB-defined scenes)."""
    from tpurt.config import get_config, set_config
    from tpurt.render.driver import render
    from tpurt.scene import load_scene_string

    scene = f"""
    Film "image" "integer xresolution" [24] "integer yresolution" [24]
    Sampler "halton" "integer pixelsamples" [8]
    Integrator "{integ}" "integer maxdepth" [3]
    Camera "perspective" "float fov" [55]
    WorldBegin
    AttributeBegin
      AreaLightSource "area" "color L" [12 10 8]
      Translate 0 3 4
      Shape "sphere" "float radius" [0.5]
    AttributeEnd
    Material "matte" "color Kd" [.6 .4 .3]
    Translate 0 0 4
    Shape "sphere" "float radius" [1]
    Material "plastic" "color Kd" [.2 .5 .3] "color Ks" [.3 .3 .3]
    Translate 0 -1.6 0
    Shape "trianglemesh" "point P" [-8 0 -8  8 0 -8  8 0 8  -8 0 8]
      "integer indices" [0 1 2 2 3 0]
    WorldEnd
    """
    img_rgb, _ = render(load_scene_string(scene), progress=False)
    img_rgb = np.asarray(img_rgb)
    set_config(spectrum_mode="sampled")
    try:
        img_s, _ = render(load_scene_string(scene), progress=False)
        img_s = np.asarray(img_s)
    finally:
        set_config(spectrum_mode="rgb")
    assert np.isfinite(img_s).all()
    lit = img_rgb.max(-1) > 0.01
    # per-pixel agreement on lit pixels within the promotion error
    rel = (np.abs(img_s - img_rgb).mean(-1)[lit]
           / np.maximum(img_rgb.mean(-1)[lit], 1e-3))
    assert np.median(rel) < 0.10, float(np.median(rel))
    # mean energy shift: the Smits promotion bases are not exactly
    # energy-preserving (measured ~8% dimmer on this scene; pbrt's two
    # compile modes show the same few-% shift on RGB-defined scenes)
    assert abs(img_s[lit].mean() - img_rgb[lit].mean()) \
        / img_rgb[lit].mean() < 0.12


def test_spectral_volpath_medium():
    """volpath in sampled mode: 60-bin sigma promotion + channel
    sampling over all bins stays finite and near the RGB-mode image
    (homogeneous.cpp Sample with Spectrum::nSamples = 60)."""
    from tpurt.config import set_config
    from tpurt.render.driver import render
    from tpurt.scene import load_scene_string

    scene = """
    Film "image" "integer xresolution" [20] "integer yresolution" [20]
    Sampler "halton" "integer pixelsamples" [8]
    Integrator "volpath" "integer maxdepth" [4]
    Camera "perspective" "float fov" [55]
    WorldBegin
    MakeNamedMedium "fog" "string type" "homogeneous"
      "color sigma_a" [.2 .3 .4] "color sigma_s" [.6 .5 .4]
    AttributeBegin
      AreaLightSource "area" "color L" [15 14 12]
      Translate 0 3 4
      Shape "sphere" "float radius" [0.5]
    AttributeEnd
    AttributeBegin
      Material ""
      MediumInterface "fog" ""
      Translate 0 0 4
      Shape "sphere" "float radius" [1.5]
    AttributeEnd
    Material "matte" "color Kd" [.5 .5 .6]
    Translate 0 -1.6 0
    Shape "trianglemesh" "point P" [-8 0 -8  8 0 -8  8 0 8  -8 0 8]
      "integer indices" [0 1 2 2 3 0]
    WorldEnd
    """
    img_rgb, _ = render(load_scene_string(scene), progress=False)
    img_rgb = np.asarray(img_rgb)
    set_config(spectrum_mode="sampled")
    try:
        img_s, _ = render(load_scene_string(scene), progress=False)
        img_s = np.asarray(img_s)
    finally:
        set_config(spectrum_mode="rgb")
    assert np.isfinite(img_s).all()
    lit = img_rgb.max(-1) > 0.01
    assert lit.any()
    assert abs(img_s[lit].mean() - img_rgb[lit].mean()) \
        / img_rgb[lit].mean() < 0.15


def test_spectral_mlt_smoke():
    """MLT in sampled mode: the primary-sample-space chains evaluate
    spectral bdpt strategies (deposit converts to RGB splats before the
    luminance-normalized film write).  Finite image, mean near the
    RGB-mode MLT render."""
    from tpurt.config import set_config
    from tpurt.render.driver import render
    from tpurt.scene import load_scene_string

    scene = """
    Film "image" "integer xresolution" [16] "integer yresolution" [16]
    Sampler "halton" "integer pixelsamples" [8]
    Integrator "mlt" "integer maxdepth" [2]
      "integer mutationsperpixel" [16]
    Camera "perspective" "float fov" [55]
    WorldBegin
    AttributeBegin
      AreaLightSource "area" "color L" [12 10 8]
      Translate 0 3 4
      Shape "sphere" "float radius" [0.5]
    AttributeEnd
    Material "matte" "color Kd" [.6 .4 .3]
    Translate 0 0 4
    Shape "sphere" "float radius" [1]
    WorldEnd
    """
    img_rgb, _ = render(load_scene_string(scene), progress=False)
    img_rgb = np.asarray(img_rgb)
    set_config(spectrum_mode="sampled")
    try:
        img_s, _ = render(load_scene_string(scene), progress=False)
        img_s = np.asarray(img_s)
    finally:
        set_config(spectrum_mode="rgb")
    assert np.isfinite(img_s).all()
    assert img_s.mean() > 0
    # MLT is stochastic (chain bootstrap differs across modes through
    # the spectral luminances); compare total energy loosely
    assert abs(img_s.mean() - img_rgb.mean()) / img_rgb.mean() < 0.30


def test_spectral_sppm_smoke():
    """SPPM in sampled mode: 60-bin visible-point throughputs, photon
    betas, and tau accumulators; bins convert to RGB at the resolve
    (sppm.cpp:450-461).  Finite image, energy near the RGB-mode SPPM."""
    from tpurt.config import set_config
    from tpurt.render.driver import render
    from tpurt.scene import load_scene_string

    scene = """
    Film "image" "integer xresolution" [16] "integer yresolution" [16]
    Sampler "halton" "integer pixelsamples" [4]
    Integrator "sppm" "integer maxdepth" [3] "integer iterations" [4]
      "float radius" [0.5]
    Camera "perspective" "float fov" [55]
    WorldBegin
    AttributeBegin
      AreaLightSource "area" "color L" [12 10 8]
      Translate 0 3 4
      Shape "sphere" "float radius" [0.5]
    AttributeEnd
    Material "matte" "color Kd" [.6 .4 .3]
    Translate 0 0 4
    Shape "sphere" "float radius" [1]
    Material "matte" "color Kd" [.4 .5 .6]
    Translate 0 -1.6 0
    Shape "trianglemesh" "point P" [-8 0 -8  8 0 -8  8 0 8  -8 0 8]
      "integer indices" [0 1 2 2 3 0]
    WorldEnd
    """
    img_rgb, _ = render(load_scene_string(scene), progress=False)
    img_rgb = np.asarray(img_rgb)
    set_config(spectrum_mode="sampled")
    try:
        img_s, _ = render(load_scene_string(scene), progress=False)
        img_s = np.asarray(img_s)
    finally:
        set_config(spectrum_mode="rgb")
    assert np.isfinite(img_s).all()
    lit = img_rgb.max(-1) > 0.01
    assert lit.any()
    assert abs(img_s[lit].mean() - img_rgb[lit].mean()) \
        / img_rgb[lit].mean() < 0.15
