"""Catmull-Rom interpolation tests (core/interpolation.cpp analog):
weight partition-of-unity, node reproduction, integral consistency,
CDF-inversion sampling against histograms, invert round-trips."""

import numpy as np

import jax.numpy as jnp

from tpurt.sampling.interpolation import (
    catmull_rom_eval,
    catmull_rom_weights,
    catmull_rom_weights_np,
    integrate_catmull_rom_np,
    invert_catmull_rom,
    sample_catmull_rom_2d,
)


def test_weights_partition_of_unity_and_node_reproduction():
    nodes = np.array([0.0, 0.3, 0.7, 1.2, 2.0, 3.5], np.float32)
    vals = np.array([1.0, 2.0, 0.5, 3.0, 2.5, 0.1], np.float32)
    xs = np.linspace(0.0, 3.5, 101).astype(np.float32)
    ok, off, w = catmull_rom_weights(jnp.asarray(nodes), jnp.asarray(xs))
    ok, off, w = np.asarray(ok), np.asarray(off), np.asarray(w)
    assert ok.all()
    np.testing.assert_allclose(w.sum(-1), 1.0, atol=1e-5)
    # device weights match the host literal port
    for i, x in enumerate(xs):
        ok_h, off_h, w_h = catmull_rom_weights_np(nodes, float(x))
        assert ok_h and off_h == off[i]
        np.testing.assert_allclose(w[i], w_h, atol=1e-5)
    # interpolation through the weights reproduces node values
    at_nodes = catmull_rom_eval(jnp.asarray(nodes), jnp.asarray(vals),
                                jnp.asarray(nodes))
    np.testing.assert_allclose(np.asarray(at_nodes), vals, atol=1e-5)
    # out of bounds -> 0 weights
    ok2, _, w2 = catmull_rom_weights(jnp.asarray(nodes),
                                     jnp.asarray([-1.0, 4.0], np.float32))
    assert not np.asarray(ok2).any()
    assert (np.asarray(w2) == 0).all()


def test_integrate_matches_dense_quadrature():
    nodes = np.array([0.0, 0.5, 0.9, 1.5, 2.2, 3.0])
    vals = np.array([0.2, 1.0, 0.4, 2.0, 1.1, 0.6])
    total, cdf = integrate_catmull_rom_np(nodes, vals)
    xs = np.linspace(0, 3.0, 20001).astype(np.float32)
    ys = np.asarray(catmull_rom_eval(jnp.asarray(nodes, jnp.float32),
                                     jnp.asarray(vals, jnp.float32),
                                     jnp.asarray(xs)))
    np.testing.assert_allclose(total, np.trapezoid(ys, xs), rtol=1e-4)
    assert cdf[0] == 0 and abs(cdf[-1] - total) < 1e-12


def test_sample_catmull_rom_2d_histogram_matches_pdf():
    """Samples drawn by the 2D CDF-inversion land with the density the
    returned pdf claims (the property the BSSRDF/Fourier importance
    sampling relies on)."""
    rng = np.random.default_rng(5)
    nodes1 = np.linspace(0.0, 1.0, 5)
    nodes2 = np.linspace(0.0, 2.0, 9)
    # positive smooth table values
    vals = (1.0 + np.sin(nodes1[:, None] * 3 + 0.5)
            * np.cos(nodes2[None, :] * 2)) + 0.2
    _, cdf = integrate_catmull_rom_np(nodes2, vals)
    n = 200_000
    alpha = np.full(n, 0.63, np.float32)
    u = rng.random(n).astype(np.float32)
    x, fval, pdf = sample_catmull_rom_2d(
        jnp.asarray(nodes1, jnp.float32), jnp.asarray(nodes2, jnp.float32),
        jnp.asarray(vals, jnp.float32), jnp.asarray(cdf, jnp.float32),
        jnp.asarray(alpha), jnp.asarray(u))
    x, pdf = np.asarray(x), np.asarray(pdf)
    assert (pdf > 0).all()
    # histogram density vs mean pdf per bin
    bins = np.linspace(0, 2.0, 21)
    hist, _ = np.histogram(x, bins=bins, density=True)
    centers = 0.5 * (bins[:-1] + bins[1:])
    for c, hdens in zip(centers, hist):
        sel = np.abs(x - c) < 0.05
        if sel.sum() > 500:
            np.testing.assert_allclose(hdens, pdf[sel].mean(), rtol=0.08)
    # E[1/pdf] == support length iff pdf is a correctly normalized density
    np.testing.assert_allclose((1.0 / pdf).mean(), 2.0, rtol=0.02)


def test_invert_catmull_rom_round_trip():
    nodes = np.linspace(0.0, 1.0, 12).astype(np.float32)
    # monotone per-lane tables
    base = np.cumsum(0.1 + np.random.default_rng(3).random((64, 12)), axis=-1)
    base = base.astype(np.float32)
    xs = np.linspace(0.02, 0.98, 64).astype(np.float32)
    vals_at = np.asarray(
        catmull_rom_eval(jnp.asarray(nodes), jnp.asarray(base),
                         jnp.asarray(xs)))
    x_back = invert_catmull_rom(jnp.asarray(nodes), jnp.asarray(base),
                                jnp.asarray(vals_at))
    # the spline may be locally non-monotone between samples of monotone
    # data, so invert is only unique up to function value: check
    # eval(invert(u)) == u (the contract Sample_S relies on)
    vals_back = np.asarray(
        catmull_rom_eval(jnp.asarray(nodes), jnp.asarray(base), x_back))
    np.testing.assert_allclose(vals_back, vals_at, rtol=1e-4, atol=1e-3)
