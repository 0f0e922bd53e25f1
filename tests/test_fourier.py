"""Fourier BSDF tests (reflection.cpp FourierBSDF + fourier.cpp Read):
file round-trip, Lambertian equivalence, sampling/pdf consistency."""

import numpy as np

import jax.numpy as jnp

from tpurt.render.fourier import (
    bake_fourier_table,
    fourier_f,
    fourier_pdf,
    fourier_sample,
    make_lambertian_table,
    read_bsdf_file,
    write_bsdf_file,
)

_YW = np.asarray([0.212671, 0.715160, 0.072169])


def test_bsdf_file_round_trip(tmp_path):
    t = make_lambertian_table(0.6, n_mu=16)
    p = str(tmp_path / "lambert.bsdf")
    write_bsdf_file(p, t)
    t2 = read_bsdf_file(p)
    assert t2.n_channels == 1 and t2.m_max == 1
    np.testing.assert_allclose(t2.mu, t.mu, atol=1e-7)
    np.testing.assert_allclose(t2.a0, t.a0, atol=1e-7)
    np.testing.assert_allclose(t2.cdf, t.cdf, atol=1e-6)
    np.testing.assert_array_equal(t2.m, t.m)
    np.testing.assert_allclose(t2.a, t.a, atol=1e-7)


def _dirs(rng, n, up=True):
    z = rng.uniform(0.1, 0.95, n) * (1 if up else -1)
    phi = rng.uniform(0, 2 * np.pi, n)
    r = np.sqrt(1 - z * z)
    return np.stack([r * np.cos(phi), r * np.sin(phi), z],
                    axis=-1).astype(np.float32)


def test_lambertian_table_evaluates_to_rho_over_pi():
    rho = 0.6
    tbl = bake_fourier_table(make_lambertian_table(rho, n_mu=48))
    rng = np.random.default_rng(2)
    n = 256
    wo = jnp.asarray(_dirs(rng, n, up=True))
    wi = jnp.asarray(_dirs(rng, n, up=True))  # reflection: both up
    f = np.asarray(fourier_f(tbl, 1.0, wo, wi))
    y = (f * _YW).sum(-1)
    np.testing.assert_allclose(y, rho / np.pi, rtol=0.03)  # n_mu=48: spline error < 3%
    # transmission pairs evaluate to ~0
    wi_dn = jnp.asarray(_dirs(rng, n, up=False))
    f2 = np.asarray(fourier_f(tbl, 1.0, wo, wi_dn))
    assert np.abs(f2).max() < 1e-3


def test_fourier_sampling_weights_and_pdf():
    """Sample/eval/pdf consistency: E[f |cos| / pdf] equals hemispherical
    reflectance, pdf(sample) matches the separately-evaluated pdf, and
    the pdf integrates to 1."""
    rho = 0.45
    tbl = bake_fourier_table(make_lambertian_table(rho, n_mu=48))
    rng = np.random.default_rng(7)
    n = 100_000
    wo1 = np.asarray([0.3, -0.2, 0.85])
    wo1 /= np.linalg.norm(wo1)
    wo = jnp.asarray(np.tile(wo1, (n, 1)), jnp.float32)
    u0 = jnp.asarray(rng.random(n), jnp.float32)
    u1 = jnp.asarray(rng.random(n), jnp.float32)
    wi, f, pdf = fourier_sample(tbl, 1.0, wo, u0, u1)
    wi_n, f_n, pdf_n = np.asarray(wi), np.asarray(f), np.asarray(pdf)
    ok = pdf_n > 0
    assert ok.mean() > 0.95
    y = (f_n * _YW).sum(-1)
    est = np.where(ok, y * np.abs(wi_n[:, 2]) / np.maximum(pdf_n, 1e-20), 0.0)
    np.testing.assert_allclose(est.mean(), rho, rtol=0.04)
    # pdf at sampled directions matches the standalone pdf evaluation
    pdf_e = np.asarray(fourier_pdf(tbl, wo, wi))
    sel = ok & (np.abs(wi_n[:, 2]) > 0.05)
    np.testing.assert_allclose(pdf_n[sel], pdf_e[sel], rtol=0.03, atol=2e-3)
    # pdf integrates to ~1 over the sphere
    z = 1 - 2 * rng.random(n)
    r = np.sqrt(np.maximum(0, 1 - z * z))
    ph = 2 * np.pi * rng.random(n)
    wi_u = jnp.asarray(np.stack([r * np.cos(ph), r * np.sin(ph), z], -1),
                       jnp.float32)
    vals = np.asarray(fourier_pdf(tbl, wo, wi_u))
    np.testing.assert_allclose(vals.mean() * 4 * np.pi, 1.0, rtol=0.05)


def test_fourier_material_renders(tmp_path):
    """End-to-end: a fourier material from a .bsdf file matches the matte
    render of the same reflectance."""
    from tpurt.render.driver import render
    from tpurt.scene import load_scene_string

    p = str(tmp_path / "lam.bsdf")
    write_bsdf_file(p, make_lambertian_table(0.6, n_mu=24))
    scene_t = """
    Film "image" "integer xresolution" [20] "integer yresolution" [20]
    Sampler "random" "integer pixelsamples" [32]
    Integrator "path" "integer maxdepth" [3]
    Camera "perspective" "float fov" [50]
    WorldBegin
    LightSource "point" "color I" [12 12 12] "point from" [2 3 1]
    {mat}
    Translate 0 0 4
    Shape "sphere" "float radius" [1]
    WorldEnd
    """
    img_f, _ = render(load_scene_string(scene_t.format(
        mat=f'Material "fourier" "string bsdffile" "{p}"')), progress=False)
    img_m, _ = render(load_scene_string(scene_t.format(
        mat='Material "matte" "color Kd" [.6 .6 .6]')), progress=False)
    assert np.isfinite(img_f).all()
    sel = img_m.mean(-1) > 0.05
    assert sel.sum() > 30
    np.testing.assert_allclose(img_f[sel].mean(), img_m[sel].mean(),
                               rtol=0.06)


def test_fourier_consistent_across_integrators(tmp_path):
    """Fourier materials must shade with the tabulated BSDF in every
    integrator (reference: FourierBSDF via ComputeScatteringFunctions,
    materials/fourier.cpp) — gates the round-2 ShadeCtx unification for
    bdpt/sppm/volpath like the hair test does for hair."""
    from tpurt.render.driver import render
    from tpurt.scene import load_scene_string

    p = str(tmp_path / "lam.bsdf")
    write_bsdf_file(p, make_lambertian_table(0.6, n_mu=24))
    scene_t = """
    Film "image" "integer xresolution" [20] "integer yresolution" [20]
    Sampler "random" "integer pixelsamples" [16]
    Integrator "{integ}" "integer maxdepth" [3]
    Camera "perspective" "float fov" [50]
    WorldBegin
    AttributeBegin
      AreaLightSource "area" "color L" [30 30 30]
      Translate 2 3 1
      Shape "sphere" "float radius" [0.4]
    AttributeEnd
    Material "fourier" "string bsdffile" "{p}"
    Translate 0 0 4
    Shape "sphere" "float radius" [1]
    WorldEnd
    """
    means = {}
    for integ in ("path", "volpath", "bdpt"):
        img, _ = render(load_scene_string(
            scene_t.format(integ=integ, p=p)), progress=False)
        img = np.asarray(img)
        assert np.isfinite(img).all(), integ
        means[integ] = float(img.mean())
    ref = means["path"]
    assert means["volpath"] == ref, (means,)
    assert abs(means["bdpt"] - ref) / ref < 0.30, (means,)
