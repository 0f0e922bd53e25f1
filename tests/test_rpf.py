"""RPF filter tests: JAX kernels vs the literal numpy oracle, plus
denoising behavior.  (The reference ships NO tests for src/custom —
SURVEY.md §4 — so these gates are new.)"""

import jax.numpy as jnp
import numpy as np
import pytest

import rpf_oracle as oracle
from tpurt.rpf.filter import (
    _cf_weights,
    _mutual_information,
    apply_rpf_filter,
)


def test_mutual_information_matches_oracle():
    rng = np.random.default_rng(0)
    n = 60
    # correlated + independent variables across the 19 columns
    base = rng.standard_normal(n)
    cols = np.zeros((n, 19), np.float32)
    for c in range(19):
        mix = (c % 4) / 4.0
        cols[:, c] = mix * base + (1 - mix) * rng.standard_normal(n)
    mask = jnp.ones((n, 1), jnp.float32)
    bins = max(1, int(np.sqrt(n)))
    got = np.asarray(_mutual_information(
        jnp.asarray(cols), mask, jnp.float32(n), jnp.int32(bins),
        bins + 1))
    from tpurt.rpf.filter import _PAIRS

    for k in range(0, 96, 7):  # spot-check a spread of pairs
        a, b = _PAIRS[k]
        want = oracle.mutual_information(cols[:, a].astype(np.float64),
                                         cols[:, b].astype(np.float64))
        np.testing.assert_allclose(got[k], want, rtol=1e-4, atol=1e-5)


def test_mutual_information_degenerate_constant():
    # constant column: reference dumps all mass in bin 0 -> MI = 0
    rng = np.random.default_rng(1)
    n = 25
    cols = np.zeros((n, 19), np.float32)
    cols[:, 7] = 1.0  # constant feature
    cols[:, 5] = rng.standard_normal(n)  # random param
    mask = jnp.ones((n, 1), jnp.float32)
    got = np.asarray(_mutual_information(
        jnp.asarray(cols), mask, jnp.float32(n), jnp.int32(5), 6))
    want = oracle.mutual_information(cols[:, 7].astype(np.float64),
                                     cols[:, 5].astype(np.float64))
    np.testing.assert_allclose(got[0], want, atol=1e-5)  # pair (7,5)


def test_cf_weights_match_oracle():
    rng = np.random.default_rng(2)
    n = 80
    nb = rng.standard_normal((n, 19)).astype(np.float32)
    # make color depend on features strongly, weakly on randoms
    nb[:, 2] = nb[:, 7] * 2 + 0.1 * rng.standard_normal(n)
    nb[:, 3] = nb[:, 8] + nb[:, 5] * 0.5
    mask = jnp.ones((n, 1), jnp.float32)
    bins = max(1, int(np.sqrt(n)))
    mi = _mutual_information(jnp.asarray(nb), mask, jnp.float32(n),
                             jnp.int32(bins), bins + 1)
    a_got, b_got, w_got = _cf_weights(mi)
    a_want, b_want, w_want = oracle.cf_weights(nb.astype(np.float64))
    np.testing.assert_allclose(np.asarray(a_got), a_want, rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(b_got), b_want, rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(float(w_got), w_want, rtol=2e-3)
    # structure: alpha in [0,1], beta in [0,1]
    assert np.all(np.asarray(a_got) >= -1e-6) and np.all(np.asarray(a_got) <= 1 + 1e-6)


def test_full_filter_matches_oracle():
    rng = np.random.default_rng(3)
    h, w, s = 6, 7, 4
    buf = np.zeros((h, w, s, 19), np.float32)
    # pFilm: absolute positions
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    buf[..., 0] = xx[..., None] + rng.uniform(0, 1, (h, w, s))
    buf[..., 1] = yy[..., None] + rng.uniform(0, 1, (h, w, s))
    # colors: smooth ramp + noise
    buf[..., 2:5] = (xx[..., None, None] / w
                     + 0.3 * rng.standard_normal((h, w, s, 3)))
    buf[..., 5:7] = rng.uniform(0, 1, (h, w, s, 2))  # lens randoms
    # features: two flat regions (simulating geometry)
    feat = np.where(xx[..., None, None] < w // 2, 1.0, -1.0)
    buf[..., 7:19] = feat + 0.01 * rng.standard_normal((h, w, s, 12))

    got = np.asarray(apply_rpf_filter(jnp.asarray(buf), 5, pixel_chunk=16))
    want = oracle.filter_buffer(buf.astype(np.float64), 5)
    # colors replaced; everything else untouched
    np.testing.assert_array_equal(got[..., 0:2], buf[..., 0:2])
    np.testing.assert_array_equal(got[..., 5:], buf[..., 5:])
    np.testing.assert_allclose(got[..., 2:5], want[..., 2:5],
                               rtol=5e-3, atol=5e-3)


def test_filter_denoises_random_param_noise():
    """A flat-geometry region whose color noise is DRIVEN BY the random
    parameters must get smoother while keeping its mean — the core RPF
    mechanism: high MI(color, random) drives W_r_c -> 1, which both ignores
    color distance (alpha -> 0) and widens sigma_c, so the bilateral
    averages the noise away (Sen & Darabi 2011 §4)."""
    rng = np.random.default_rng(4)
    h, w, s = 10, 10, 4
    buf = np.zeros((h, w, s, 19), np.float32)
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    buf[..., 0] = xx[..., None] + rng.uniform(0, 1, (h, w, s))
    buf[..., 1] = yy[..., None] + rng.uniform(0, 1, (h, w, s))
    r = rng.uniform(0, 1, (h, w, s, 2)).astype(np.float32)
    buf[..., 5:7] = r
    # color noise as a deterministic function of the random parameters
    buf[..., 2:5] = 1.0 + 0.8 * np.sin(2 * np.pi * r[..., :1]) \
        + 0.2 * np.cos(2 * np.pi * r[..., 1:2])
    # near-flat features with tiny noise: EXACTLY constant features give
    # sigma=0 and the reference's strict 3-sigma test admits no neighbors
    buf[..., 7:19] = 1.0 + 1e-4 * rng.standard_normal((h, w, s, 12))

    out = np.asarray(apply_rpf_filter(jnp.asarray(buf), 7, pixel_chunk=32))
    pre_var = buf[2:-2, 2:-2, :, 2:5].var()
    post_var = out[2:-2, 2:-2, :, 2:5].var()
    # NOTE on magnitude: with the reference's sigma_fc_seed = 0.002 on
    # z-NORMALIZED colors, the color term only admits near-identical
    # colors unless W_r_c ~ 1, and the sqrt(N)-bin histogram MI estimator
    # has a noise floor that caps W_r_c well below 1 (~0.64 here).  The
    # reference therefore smooths GENTLY (verified identical behavior via
    # the numpy oracle above); we assert direction + mean preservation.
    assert post_var < pre_var, (pre_var, post_var)
    np.testing.assert_allclose(out[..., 2:5].mean(), buf[..., 2:5].mean(),
                               rtol=0.05)
    # and the filter must actually have moved colors somewhere
    assert np.abs(out[..., 2:5] - buf[..., 2:5]).max() > 1e-4


def test_filter_preserves_feature_edges():
    """Samples across a feature discontinuity must not bleed: the 3-sigma
    clustering keeps the two sides apart."""
    rng = np.random.default_rng(5)
    h, w, s = 8, 8, 4
    buf = np.zeros((h, w, s, 19), np.float32)
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    buf[..., 0] = xx[..., None] + rng.uniform(0, 1, (h, w, s))
    buf[..., 1] = yy[..., None] + rng.uniform(0, 1, (h, w, s))
    left = xx < w // 2
    # left: color 0, right: color 10; tiny noise
    buf[..., 2:5] = np.where(left[..., None, None], 0.0, 10.0) \
        + 0.05 * rng.standard_normal((h, w, s, 3))
    buf[..., 5:7] = rng.uniform(0, 1, (h, w, s, 2))
    buf[..., 7:19] = np.where(left[..., None, None], 1.0, -1.0) \
        + 1e-4 * rng.standard_normal((h, w, s, 12))

    out = np.asarray(apply_rpf_filter(jnp.asarray(buf), 7, pixel_chunk=32))
    left_cols = out[:, : w // 2 - 1, :, 2:5]
    right_cols = out[:, w // 2 + 1:, :, 2:5]
    assert left_cols.max() < 1.0, left_cols.max()  # no bleed from the right
    assert right_cols.min() > 9.0, right_cols.min()


@pytest.mark.parametrize("fname,radius,params", [
    ("box", (0.5, 0.5), ()),
    ("gaussian", (2.0, 2.0), (2.0,)),
    ("mitchell", (2.0, 2.0), (1 / 3, 1 / 3)),
])
def test_structured_splat_matches_scatter(fname, radius, params):
    """splat_buffer's dense shifted-add formulation must reproduce the
    generic film.add_samples scatter path (same tap set, bounds drops,
    NaN scrub, maxsampleluminance clamp)."""
    from types import SimpleNamespace

    from tpurt.render.film import Film
    from tpurt.render.filters import Filter
    from tpurt.rpf.driver import splat_buffer

    rng = np.random.default_rng(11)
    h, w, s = 9, 13, 4
    film = Film(full_x=w, full_y=h, crop=(0, w, 0, h),
                filter=Filter(fname, radius, params), filename="t.exr",
                scale=1.0, diagonal_m=0.035, max_sample_luminance=3.0)
    buf = np.zeros((h, w, s, 19), np.float32)
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    buf[..., 0] = xx[..., None] + rng.uniform(0, 1, (h, w, s))
    buf[..., 1] = yy[..., None] + rng.uniform(0, 1, (h, w, s))
    buf[..., 2:5] = rng.uniform(0, 2, (h, w, s, 3))
    buf[0, 0, 0, 2] = np.nan          # NaN scrub path
    buf[1, 2, 1, 3] = np.inf          # inf scrub path
    buf[2, 3, 2, 2:5] = 50.0          # luminance-clamp path

    got = splat_buffer(SimpleNamespace(film=film), jnp.asarray(buf))

    flat = buf.reshape(-1, 19)
    state = film.add_samples(film.initial_state(),
                             jnp.asarray(flat[:, 0:2]),
                             jnp.asarray(flat[:, 2:5]),
                             jnp.ones(flat.shape[0], jnp.float32))
    want = film.to_image(state)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-6)


def test_mi_cap_subset_path(monkeypatch):
    """The MI-subset path for big boxes (full box-55 window would be a
    100+ MB/pixel one-hot; 26 GB OOM on v5e round 3).  Exercised here by
    lowering the cap so box 11 triggers it (a real box-55 compile takes
    minutes on the CPU backend; bench config3 covers it on chip).
    Output must stay finite and still denoise toward the pixel mean."""
    import tpurt.rpf.filter as F

    monkeypatch.setattr(F, "MI_MAX_SAMPLES", 64)
    F._filter_run_call.cache_clear()
    rng = np.random.default_rng(4)  # test_filter_denoises' construction
    h, w, s = 10, 10, 4
    buf = np.zeros((h, w, s, 19), np.float32)
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    buf[..., 0] = xx[..., None] + rng.uniform(0, 1, (h, w, s))
    buf[..., 1] = yy[..., None] + rng.uniform(0, 1, (h, w, s))
    r = rng.uniform(0, 1, (h, w, s, 2)).astype(np.float32)
    buf[..., 5:7] = r
    # color noise driven by the random lens parameter -> RPF removes it
    buf[..., 2:5] = 1.0 + 0.8 * np.sin(2 * np.pi * r[..., :1]) \
        + 0.2 * np.cos(2 * np.pi * r[..., 1:2])
    # near-constant features (EXACTLY constant would zero the pixel
    # f_std and the STRICT 3-sigma test would reject every neighbor)
    buf[..., 7:19] = 1.0 + 1e-4 * rng.standard_normal((h, w, s, 12))

    assert s + 11 * 11 * s > 64  # the lowered cap is actually hit
    try:
        out = np.asarray(F.apply_rpf_filter(jnp.asarray(buf), 11))
    finally:
        F._filter_run_call.cache_clear()  # drop the capped build
    assert np.isfinite(out).all()
    # gentle-smoothing contract, like test_filter_denoises_random_param
    # _noise: variance drops, mean preserved, colors actually moved
    assert out[..., 2:5].var() < buf[..., 2:5].var()
    np.testing.assert_allclose(out[..., 2:5].mean(), buf[..., 2:5].mean(),
                               rtol=0.05)
    assert np.abs(out[..., 2:5] - buf[..., 2:5]).max() > 1e-4
