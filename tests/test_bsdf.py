"""BSDF lobe-mixture tests.

Reference analog: tests/bsdfs.cpp (chi^2-style sampling-consistency checks
for Lambertian/microfacet variants, bsdfs.cpp:484-556).  Here each lobe
configuration is validated by comparing two independent Monte Carlo
estimates of the hemispherical(-spherical) albedo: one importance-sampled
through bsdf_sample (sum f |cos| / pdf) and one brute-force over uniform
sphere directions (4 pi mean f |cos|).  Agreement validates f, pdf, and
Sample_f jointly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpurt.render import bsdf as B


def _broadcast_lobes(lp_one, n):
    return jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a, (n,) + a.shape[1:]), lp_one)


def _lobes(n, **kw):
    lp = B.zero_lobes(1)
    upd = {}
    for k, v in kw.items():
        cur = getattr(lp, k)
        v = jnp.asarray(v, cur.dtype).reshape(cur.shape)
        upd[k] = v
    return _broadcast_lobes(lp._replace(**upd), n)


def _albedo_pair(lp, wo_z=0.7, n=1 << 17, seed=3):
    """(importance-sampled albedo, uniform-sphere albedo)."""
    rng = np.random.default_rng(seed)
    wo = jnp.broadcast_to(
        jnp.asarray([np.sqrt(1 - wo_z ** 2), 0.0, wo_z], jnp.float32),
        (n, 3))

    u_lobe = jnp.asarray(rng.uniform(size=n).astype(np.float32))
    u1 = jnp.asarray(rng.uniform(size=n).astype(np.float32))
    u2 = jnp.asarray(rng.uniform(size=n).astype(np.float32))
    wi, f, pdf, is_spec, _ = B.bsdf_sample(lp, wo, u_lobe, u1, u2)
    ok = pdf > 0
    est = jnp.where(ok[:, None], f * (jnp.abs(wi[:, 2])
                                      / jnp.maximum(pdf, 1e-20))[:, None], 0.0)
    imp = np.asarray(jnp.mean(est, axis=0))

    # uniform over the full sphere
    z = rng.uniform(-1, 1, n).astype(np.float32)
    phi = rng.uniform(0, 2 * np.pi, n).astype(np.float32)
    r = np.sqrt(np.maximum(0, 1 - z * z))
    wiu = jnp.asarray(np.stack([r * np.cos(phi), r * np.sin(phi), z], -1))
    fu = B.bsdf_f(lp, wo, wiu)
    uni = np.asarray(jnp.mean(fu * jnp.abs(wiu[:, 2:3]), axis=0)) * 4 * np.pi
    return imp, uni


N = 1 << 17


def test_rough_glass_consistency():
    lp = _lobes(N, ks=[1.0, 1.0, 1.0], kt_g=[1.0, 1.0, 1.0],
                alpha_x=0.3, alpha_y=0.3, t_alpha_x=0.3, t_alpha_y=0.3,
                eta=1.5)
    imp, uni = _albedo_pair(lp)
    # F*1 + (1-F)/eta^2 minus single-scatter GGX losses lands near 0.46
    assert np.all(imp > 0.3) and np.all(imp < 1.0), imp
    np.testing.assert_allclose(imp, uni, rtol=0.08)


def test_translucent_consistency():
    lp = _lobes(N, kd=[0.3, 0.3, 0.3], kd_t=[0.3, 0.3, 0.3],
                ks=[0.2, 0.2, 0.2], kt_g=[0.2, 0.2, 0.2],
                alpha_x=0.2, alpha_y=0.2, t_alpha_x=0.2, t_alpha_y=0.2)
    imp, uni = _albedo_pair(lp)
    np.testing.assert_allclose(imp, uni, rtol=0.06)


def test_disney_diffuse_clearcoat_consistency():
    lp = _lobes(N, kd=[0.4, 0.2, 0.1], retro=[0.4, 0.2, 0.1],
                sheen=[0.1, 0.1, 0.1], disney=True, metallic=0.0,
                r0=[0.04, 0.04, 0.04], d_rough=0.5,
                ks=[1.0, 1.0, 1.0], alpha_x=0.25, alpha_y=0.25,
                fresnel_kind=B.FRESNEL_DISNEY,
                cc=1.0, cc_gloss=0.05, eta=1.5)
    imp, uni = _albedo_pair(lp)
    np.testing.assert_allclose(imp, uni, rtol=0.08)


def test_disney_metallic_energy():
    # fully metallic: only the specular lobe, tinted by the base color
    lp = _lobes(N, disney=True, metallic=1.0, r0=[0.9, 0.6, 0.3],
                ks=[1.0, 1.0, 1.0], alpha_x=0.1, alpha_y=0.1,
                fresnel_kind=B.FRESNEL_DISNEY, eta=1.5)
    imp, uni = _albedo_pair(lp)
    np.testing.assert_allclose(imp, uni, rtol=0.08)
    # tint ordering follows R0
    assert imp[0] > imp[1] > imp[2], imp
    assert np.all(imp < 1.0)


def test_lambertian_transmission_flips_hemisphere():
    lp = _lobes(N, kd_t=[0.5, 0.5, 0.5])
    rng = np.random.default_rng(0)
    wo = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0], jnp.float32), (N, 3))
    u = [jnp.asarray(rng.uniform(size=N).astype(np.float32))
         for _ in range(3)]
    wi, f, pdf, is_spec, is_trans = B.bsdf_sample(lp, wo, *u)
    assert bool(jnp.all(wi[:, 2] < 0))
    assert bool(jnp.all(is_trans))
    # f/pdf ratio is the constant albedo: f = kd_t/pi, pdf = |cos|/pi
    est = float(jnp.mean(f[:, 0] * jnp.abs(wi[:, 2]) / pdf))
    np.testing.assert_allclose(est, 0.5, rtol=0.02)


def test_smooth_glass_unchanged():
    # regression: the 4->7 slot extension must not disturb smooth glass
    lp = _lobes(N, fs_kr=[1.0, 1.0, 1.0], kt=[1.0, 1.0, 1.0], eta=1.5)
    rng = np.random.default_rng(5)
    wo = jnp.broadcast_to(
        jnp.asarray([0.6, 0.0, 0.8], jnp.float32), (N, 3))
    u = [jnp.asarray(rng.uniform(size=N).astype(np.float32))
         for _ in range(3)]
    wi, f, pdf, is_spec, is_trans = B.bsdf_sample(lp, wo, *u)
    assert bool(jnp.all(is_spec))
    # energy: E[f |cos| / pdf] = F*1 + (1-F)/eta^2 — the transmitted part
    # carries the 1/eta^2 radiance compression (~0.47 at eta=1.5)
    est = float(jnp.mean(jnp.sum(f, -1) / 3.0 * jnp.abs(wi[:, 2])
                         / jnp.maximum(pdf, 1e-20)))
    assert 0.4 < est <= 1.01, est
