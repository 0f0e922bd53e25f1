"""Henyey-Greenstein phase function tests (src/tests/hg.cpp analog):
normalization, Sample_p/pdf agreement, and sampled-cosine distribution."""

import numpy as np
import pytest

import jax.numpy as jnp

from tpurt.render.integrator import _hg_phase, _hg_sample


@pytest.mark.parametrize("g", [-0.75, -0.3, 0.0, 0.3, 0.75])
def test_phase_normalizes_over_sphere(g):
    rng = np.random.default_rng(4)
    n = 200_000
    cos_t = 1 - 2 * rng.random(n)
    p = np.asarray(_hg_phase(jnp.asarray(cos_t, jnp.float32),
                             jnp.full(n, g, jnp.float32)))
    np.testing.assert_allclose(p.mean() * 4 * np.pi, 1.0, rtol=0.02)


@pytest.mark.parametrize("g", [-0.6, 0.0, 0.6])
def test_sample_p_returns_phase_value_and_matches_density(g):
    """HenyeyGreenstein::Sample_p returns p(wo, wi) and draws wi exactly
    from that density (hg.cpp TEST Sampling)."""
    rng = np.random.default_rng(9)
    n = 200_000
    d = jnp.asarray(np.tile([[0.0, 0.0, 1.0]], (n, 1)), jnp.float32)
    u1 = jnp.asarray(rng.random(n), jnp.float32)
    u2 = jnp.asarray(rng.random(n), jnp.float32)
    wi, ph = _hg_sample(d, jnp.full(n, g, jnp.float32), u1, u2)
    wi, ph = np.asarray(wi), np.asarray(ph)
    np.testing.assert_allclose(np.linalg.norm(wi, axis=-1), 1.0, atol=1e-5)
    cos_t = wi[:, 2]  # dot with the propagation direction
    # returned value equals the phase function at the sampled angle
    ph_eval = np.asarray(_hg_phase(jnp.asarray(cos_t),
                                   jnp.full(n, g, jnp.float32)))
    np.testing.assert_allclose(ph, ph_eval, rtol=2e-4, atol=1e-6)
    # cos-theta histogram matches the analytic marginal 2*pi*p(cos)
    bins = np.linspace(-1, 1, 21)
    hist, _ = np.histogram(cos_t, bins=bins, density=True)
    centers = 0.5 * (bins[:-1] + bins[1:])
    want = 2 * np.pi * np.asarray(_hg_phase(
        jnp.asarray(centers, jnp.float32),
        jnp.full(len(centers), g, jnp.float32)))
    sel = want > 0.02  # skip near-empty tail bins (MC noise)
    np.testing.assert_allclose(hist[sel], want[sel], rtol=0.08)


def test_mean_cosine_equals_g():
    """E[cos theta] under HG is exactly g (the definition of the
    asymmetry parameter)."""
    rng = np.random.default_rng(3)
    n = 400_000
    for g in (-0.4, 0.25, 0.7):
        d = jnp.asarray(np.tile([[0.0, 0.0, 1.0]], (n, 1)), jnp.float32)
        wi, _ = _hg_sample(d, jnp.full(n, g, jnp.float32),
                           jnp.asarray(rng.random(n), jnp.float32),
                           jnp.asarray(rng.random(n), jnp.float32))
        np.testing.assert_allclose(np.asarray(wi)[:, 2].mean(), g, atol=5e-3)
