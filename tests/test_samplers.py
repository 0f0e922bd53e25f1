"""Sampler tests (reference analog: tests/sampling.cpp)."""

import jax.numpy as jnp
import numpy as np
import pytest

from tpurt.sampling import lowdiscrepancy as ld
from tpurt.sampling.samplers import (
    HaltonSampler,
    RandomSampler,
    StratifiedSampler,
    ZeroTwoSequenceSampler,
    make_halton,
    make_sampler,
)
from tpurt.scene.paramset import ParamSet


def _ps(**kw):
    ps = ParamSet()
    for k, v in kw.items():
        t, n = k.split("_", 1)
        ps.add(t, n, v)
    return ps


def test_halton_dims01_are_in_pixel_offsets():
    """pixel + dim0/1 must reconstruct the absolute radical inverse of the
    full index over the sample raster (the GlobalSampler contract)."""
    s = make_halton(8, 64, 64)
    px = jnp.asarray(np.array([0, 5, 17, 63], np.int32))
    py = jnp.asarray(np.array([0, 9, 33, 63], np.int32))
    for si in range(4):
        sidx = jnp.full(4, si, jnp.int32)
        u0 = np.asarray(s.dim(px, py, sidx, 0))
        u1 = np.asarray(s.dim(px, py, sidx, 1))
        idx = np.asarray(s.index(px, py, sidx)).astype(np.uint64)
        # RI_2(index) * 64 = px + u0; RI_3(index) * 81 = py + u1
        np.testing.assert_allclose(
            ld.radical_inverse_np(0, idx) * 64, np.asarray(px) + u0, atol=2e-5)
        np.testing.assert_allclose(
            ld.radical_inverse_np(1, idx) * 81, np.asarray(py) + u1, atol=2e-4)
        assert np.all((u0 >= 0) & (u0 < 1)) and np.all((u1 >= 0) & (u1 < 1))


def test_halton_scrambled_dims_match_numpy_reference():
    # "pbrt" scramble mode: bit-exact vs the reference's PCG32 permutation
    # tables (the fast default "affine" mode is a different digit
    # permutation of the same Halton points; tested separately below)
    s = make_halton(8, 64, 64, scramble="pbrt")
    perms = ld.compute_radical_inverse_permutations()
    px = jnp.asarray(np.array([3, 10], np.int32))
    py = jnp.asarray(np.array([7, 20], np.int32))
    sidx = jnp.asarray(np.array([2, 5], np.int32))
    idx = np.asarray(s.index(px, py, sidx)).astype(np.uint64)
    for d in (2, 3, 4, 7, 20):
        got = np.asarray(s.dim(px, py, sidx, d))
        perm = ld.permutation_for_dimension(perms, d)
        want = ld.scrambled_radical_inverse_np(d, idx, perm)
        np.testing.assert_allclose(got, want, atol=2e-6)


def test_halton_affine_scramble_is_valid_permutation():
    """The default affine scramble must still be a proper scrambled
    radical inverse: values in [0,1), distinct per index, and equal to a
    numpy re-evaluation of pi(d) = (m*d + s) mod b digit scrambling."""
    from tpurt.sampling.samplers import (_affine_perm_params,
                                         _digits_needed)

    s = make_halton(8, 64, 64)
    px = jnp.asarray(np.array([3, 10, 63], np.int32))
    py = jnp.asarray(np.array([7, 20, 0], np.int32))
    sidx = jnp.asarray(np.array([2, 5, 7], np.int32))
    idx = np.asarray(s.index(px, py, sidx)).astype(np.int64)
    for d in (2, 3, 4, 7, 20):
        got = np.asarray(s.dim(px, py, sidx, d))
        base = int(ld.PRIMES[d])
        m, perm_s = _affine_perm_params(d, base)
        # numpy oracle with float64 accumulation
        a = idx.copy()
        acc = np.zeros(len(a))
        scale = 1.0 / base
        inv_base_n = np.ones(len(a))
        for _ in range(_digits_needed(base, int(a.max()) + 1)):
            digit = a % base
            pd = (m * digit + perm_s) % base
            act = a > 0
            acc = np.where(act, acc + pd * scale, acc)
            inv_base_n = np.where(act, inv_base_n / base, inv_base_n)
            scale /= base
            a //= base
        want = acc + inv_base_n * perm_s / (base - 1)
        np.testing.assert_allclose(got, want, atol=2e-6)
        assert np.all((got >= 0) & (got < 1))


def test_halton_distinct_samples_per_pixel():
    s = make_halton(16, 32, 32)
    px = jnp.zeros(16, jnp.int32) + 5
    py = jnp.zeros(16, jnp.int32) + 6
    sidx = jnp.arange(16, dtype=jnp.int32)
    fx, fy = s.film_offset(px, py, sidx)
    pts = np.stack([np.asarray(fx), np.asarray(fy)], -1)
    # all 16 points distinct and well spread (halton: low discrepancy)
    assert len(np.unique(pts.round(6), axis=0)) == 16
    assert abs(pts[:, 0].mean() - 0.5) < 0.15


@pytest.mark.parametrize("make", [
    lambda: RandomSampler(spp=16, seed=0, res_x=64),
    lambda: StratifiedSampler(spp=16, nx=4, ny=4, jitter=True, seed=0, res_x=64),
    lambda: ZeroTwoSequenceSampler(spp=16, seed=0, res_x=64),
    lambda: make_halton(16, 64, 64),
])
def test_sampler_uniformity(make):
    s = make()
    n_pix = 64
    px = jnp.asarray(np.repeat(np.arange(8, dtype=np.int32), 8 * 16) % 64)
    py = jnp.asarray(np.tile(np.repeat(np.arange(8, dtype=np.int32), 16), 8))
    sidx = jnp.asarray(np.tile(np.arange(16, dtype=np.int32), 64))
    for d in (0, 1, 2, 5):
        u = np.asarray(s.dim(px, py, sidx, d))
        assert np.all((u >= 0) & (u < 1)), (s.name, d)
        assert abs(u.mean() - 0.5) < 0.05, (s.name, d, u.mean())
        # rough equidistribution over 4 bins
        h, _ = np.histogram(u, bins=4, range=(0, 1))
        assert h.min() > len(u) / 4 * 0.5, (s.name, d, h)


def test_stratified_film_offsets_cover_strata():
    s = StratifiedSampler(spp=16, nx=4, ny=4, jitter=True, seed=0, res_x=64)
    px = jnp.zeros(16, jnp.int32)
    py = jnp.zeros(16, jnp.int32)
    sidx = jnp.arange(16, dtype=jnp.int32)
    fx, fy = s.film_offset(px, py, sidx)
    cells = set(zip((np.asarray(fx) * 4).astype(int).tolist(),
                    (np.asarray(fy) * 4).astype(int).tolist()))
    assert len(cells) == 16  # one sample in every stratum


def test_02sequence_stratification():
    s = ZeroTwoSequenceSampler(spp=16, seed=0, res_x=64)
    px = jnp.zeros(16, jnp.int32) + 3
    py = jnp.zeros(16, jnp.int32) + 4
    sidx = jnp.arange(16, dtype=jnp.int32)
    ux, uy = s.dim2(px, py, sidx, 0)
    ux, uy = np.asarray(ux), np.asarray(uy)
    # (0,2)-sequence: every 4x4 stratum contains exactly one of 16 points
    cells = set(zip((ux * 4).astype(int).tolist(), (uy * 4).astype(int).tolist()))
    assert len(cells) == 16
    # and every 16x1 / 1x16 stratum exactly one point
    assert len(set((ux * 16).astype(int).tolist())) == 16
    assert len(set((uy * 16).astype(int).tolist())) == 16


def test_make_sampler_dispatch():
    s = make_sampler("halton", _ps(integer_pixelsamples=[8]), 700, 700)
    assert s.spp == 8 and s.stride == 128 * 243
    s = make_sampler("random", _ps(integer_pixelsamples=[5]), 64, 64)
    assert s.spp == 5
    s = make_sampler("stratified", _ps(integer_xsamples=[3], integer_ysamples=[2]), 8, 8)
    assert s.spp == 6
    s = make_sampler("02sequence", _ps(integer_pixelsamples=[12]), 8, 8)
    assert s.spp == 16  # rounded to pow2
    s = make_sampler("bogus", ParamSet(), 8, 8)
    assert s.name == "halton"
