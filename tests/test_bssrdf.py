"""Tabulated BSSRDF tests (core/bssrdf.cpp analog): Fresnel-moment fits
vs numeric integrals, diffusion-table invariants, radial sampling vs pdf,
Sw normalization, and SubsurfaceFromDiffuse round trip."""

import numpy as np

import jax.numpy as jnp

from tpurt.render.bssrdf import (
    BSSTable,
    bss_pdf_sr,
    bss_sample_sr,
    bss_sr,
    bss_sw,
    compute_beam_diffusion_table,
    fresnel_moment1,
    fresnel_moment2,
    get_medium_scattering_properties,
    subsurface_from_diffuse,
    _fr_dielectric_np,
)


def _moment_numeric(eta, power):
    # the pbrt fits approximate fm_k(eta) = int_0^1 Fr(mu; 1/eta) mu^k dmu
    # (verified against the polynomials; no (k+1) normalization)
    mu = np.linspace(0, 1, 20001)
    fr = _fr_dielectric_np(mu, 1.0, 1.0 / eta)
    return np.trapezoid(fr * mu ** power, mu)


def test_fresnel_moment_fits_match_numeric_integrals():
    for eta in (1.33, 1.5, 2.0, 1 / 1.33, 1 / 1.5):
        np.testing.assert_allclose(fresnel_moment1(eta),
                                   _moment_numeric(eta, 1), atol=0.012)
        np.testing.assert_allclose(fresnel_moment2(eta),
                                   _moment_numeric(eta, 2), atol=0.02)


def test_diffusion_table_invariants():
    t = compute_beam_diffusion_table(0.0, 1.33)
    assert t.profile.shape == (100, 64)
    assert (t.profile >= 0).all()
    # effective albedo monotone in single-scattering albedo, in [0, 1]
    assert (np.diff(t.rho_eff) >= -1e-7).all()
    assert t.rho_eff[0] == 0.0
    # at rho=1 the Catmull-Rom quadrature overshoots unity slightly
    # (~1.02, same as the reference's table); allow that margin
    assert t.rho_eff[-1] <= 1.03
    # caching returns the same object
    assert compute_beam_diffusion_table(0.0, 1.33) is t


def test_sample_sr_matches_pdf_sr():
    """Radii sampled by Sample_Sr land with density pdf_Sr * 2*pi*r (the
    polar-measure consistency Sample_Sp relies on), and that density
    integrates to one."""
    host = compute_beam_diffusion_table(0.0, 1.33)
    tbl = BSSTable(host)
    n = 200_000
    rng = np.random.default_rng(9)
    sigma_t = jnp.full(n, 4.0, jnp.float32)
    rho = jnp.full(n, 0.7, jnp.float32)
    u = jnp.asarray(rng.random(n), jnp.float32)
    r = np.asarray(bss_sample_sr(tbl, sigma_t, rho, u))
    assert (r > 0).all()
    pdf = np.asarray(bss_pdf_sr(tbl, sigma_t, rho, jnp.asarray(r)))
    dens = pdf * 2 * np.pi * r
    # histogram check on the bulk of the distribution
    qs = np.quantile(r, [0.1, 0.3, 0.5, 0.7, 0.9])
    for q in qs:
        w = 0.03 * q + 1e-4
        sel = np.abs(r - q) < w
        hist_dens = sel.mean() / (2 * w)
        np.testing.assert_allclose(hist_dens, dens[sel].mean(), rtol=0.1)
    # E[1/dens] over samples == support measure is noisy; instead check
    # normalization by quadrature on a grid
    rg = np.linspace(1e-4, np.asarray(r).max() * 1.2, 4000,
                     dtype=np.float32)
    pg = np.asarray(bss_pdf_sr(tbl, jnp.full(len(rg), 4.0, jnp.float32),
                               jnp.full(len(rg), 0.7, jnp.float32),
                               jnp.asarray(rg)))
    np.testing.assert_allclose(np.trapezoid(pg * 2 * np.pi * rg, rg), 1.0,
                               rtol=0.02)


def test_sr_scales_with_sigma_t():
    """Sr in world units: scaling sigma_t by k scales the profile by k^2
    at radius r/k (the similarity relation in Sr, bssrdf.cpp:229)."""
    tbl = BSSTable(compute_beam_diffusion_table(0.0, 1.33))
    r = jnp.asarray(np.linspace(0.05, 0.8, 32), jnp.float32)
    n = r.shape[0]
    s1 = jnp.full((n, 3), 2.0, jnp.float32)
    s2 = jnp.full((n, 3), 4.0, jnp.float32)
    rho = jnp.full((n, 3), 0.6, jnp.float32)
    a = np.asarray(bss_sr(tbl, s1, rho, r))
    b = np.asarray(bss_sr(tbl, s2, rho, r / 2.0))
    np.testing.assert_allclose(4.0 * a, b, rtol=1e-3, atol=1e-5)


def test_sw_normalizes_to_one():
    """Hemisphere integral of Sw * cos == 1 (the c = 1 - 2*FM1(1/eta)
    normalization, bssrdf.h:89-92)."""
    for eta in (1.33, 1.5):
        mu = np.linspace(0, 1, 8001, dtype=np.float32)
        sw = np.asarray(bss_sw(jnp.full(len(mu), eta, jnp.float32),
                               jnp.asarray(mu)))
        integral = 2 * np.pi * np.trapezoid(sw * mu, mu)
        np.testing.assert_allclose(integral, 1.0, atol=0.02)


def test_subsurface_from_diffuse_round_trip():
    t = compute_beam_diffusion_table(0.0, 1.33)
    rho_eff = np.array([0.2, 0.5, 0.8])
    mfp = np.array([1.0, 0.5, 0.25])
    sigma_a, sigma_s = subsurface_from_diffuse(t, rho_eff, mfp)
    # 1/mfp splits into sigma_s + sigma_a
    np.testing.assert_allclose(sigma_a + sigma_s, 1.0 / mfp, rtol=1e-5)
    # and the chosen albedo maps back to the requested rho_eff
    rho = sigma_s / (sigma_a + sigma_s)
    from tpurt.sampling.interpolation import catmull_rom_eval
    back = np.asarray(catmull_rom_eval(
        jnp.asarray(t.rho_samples, jnp.float32),
        jnp.asarray(t.rho_eff, jnp.float32),
        jnp.asarray(rho, jnp.float32)))
    np.testing.assert_allclose(back, rho_eff, atol=5e-3)


def test_presets_lookup():
    got = get_medium_scattering_properties("Wholemilk")
    assert got is not None
    sigma_a, sigma_ps = got
    np.testing.assert_allclose(sigma_ps, [2.55, 3.21, 3.77])
    np.testing.assert_allclose(sigma_a, [0.0011, 0.0024, 0.014])
    assert get_medium_scattering_properties("NotAThing") is None
