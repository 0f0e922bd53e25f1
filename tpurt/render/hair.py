"""Hair BSDF — the pbrt-v3.2 Marschner-style model, vectorized over lanes.

Reference analog: src/materials/hair.{h,cpp} (HairBSDF, pMax=3): a
longitudinal term Mp (von Mises-Fisher-like gaussian on the sphere), an
attenuation term Ap per internal path count p, and an azimuthal trimmed
logistic Np, summed over p = 0..2 plus a residual uniform p = 3 term
(hair.cpp f :264-326, Sample_f :355-450, Pdf :452-498).

The local frame convention matches the reference: x = fiber tangent
(dpdu), z = shading normal; wo.x = sin(thetaO).  All per-p branches are
unrolled selects (no lane divergence); the whole BSDF is pure VPU math —
no gathers beyond the one material-table row fetch.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

P_MAX = 3
SQRT_PI_OVER_8 = np.float32(0.626657069)
_PI = np.float32(np.pi)
# RGBSpectrum::y() luminance weights (spectrum.h:437)
_YW = np.asarray([0.212671, 0.715160, 0.072169], np.float32)


class HairParams(NamedTuple):
    """Per-lane hair BSDF parameters ((N,) / (N,3))."""

    h: jnp.ndarray  # (N,) offset across fiber width in [-1,1]
    eta: jnp.ndarray  # (N,)
    sigma_a: jnp.ndarray  # (N,3)
    beta_m: jnp.ndarray  # (N,)
    beta_n: jnp.ndarray  # (N,)
    alpha: jnp.ndarray  # (N,) scale tilt (degrees)


def _safe_sqrt(x):
    return jnp.sqrt(jnp.maximum(x, 0.0))


def _safe_asin(x):
    return jnp.arcsin(jnp.clip(x, -1.0, 1.0))


def _sqr(x):
    return x * x


def _i0(x):
    """Modified Bessel I0 by 10-term series (hair.cpp:63-76)."""
    val = jnp.zeros_like(x)
    x2i = jnp.ones_like(x)
    ifact = 1.0
    i4 = 1.0
    xx = x * x
    for i in range(10):
        if i > 1:
            ifact *= i
        val = val + x2i / (i4 * ifact * ifact)
        x2i = x2i * xx
        i4 *= 4.0
    return val


def _log_i0(x):
    """log I0 with the large-argument asymptote (hair.cpp:78-83)."""
    big = x + 0.5 * (-jnp.log(2.0 * _PI) + jnp.log(1.0 / jnp.maximum(x, 1e-12))
                     + 1.0 / (8.0 * jnp.maximum(x, 1e-12)))
    small = jnp.log(jnp.maximum(_i0(jnp.minimum(x, 12.0)), 1e-35))
    return jnp.where(x > 12.0, big, small)


def _mp(cos_ti, cos_to, sin_ti, sin_to, v):
    """Longitudinal scattering Mp (hair.cpp:51-61), numerically split at
    v = 0.1 like the reference."""
    v_small = jnp.clip(v, 1e-7, 0.1)  # clamped per branch to avoid inf
    v_big = jnp.maximum(v, 0.1)
    a_s = cos_ti * cos_to / v_small
    b_s = sin_ti * sin_to / v_small
    mp_small = jnp.exp(_log_i0(a_s) - b_s - 1.0 / v_small + 0.6931
                       + jnp.log(1.0 / (2.0 * v_small)))
    a_b = cos_ti * cos_to / v_big
    b_b = sin_ti * sin_to / v_big
    mp_big = (jnp.exp(-b_b) * _i0(a_b)) / (jnp.sinh(1.0 / v_big) * 2.0 * v_big)
    return jnp.where(v <= 0.1, mp_small, mp_big)


def _fr_dielectric_scalar(cos_i, eta):
    """FrDielectric for exterior incidence (core/reflection.cpp:47);
    cos_i >= 0, eta = interior/exterior ratio."""
    cos_i = jnp.clip(cos_i, 0.0, 1.0)
    sin_t = _safe_sqrt(1.0 - cos_i * cos_i) / eta
    total = sin_t >= 1.0
    cos_t = _safe_sqrt(1.0 - sin_t * sin_t)
    r_par = (eta * cos_i - cos_t) / jnp.maximum(eta * cos_i + cos_t, 1e-12)
    r_perp = (cos_i - eta * cos_t) / jnp.maximum(cos_i + eta * cos_t, 1e-12)
    fr = 0.5 * (r_par * r_par + r_perp * r_perp)
    return jnp.where(total, 1.0, fr)


def _derived(hp: HairParams):
    """Per-lane constants the reference precomputes in the HairBSDF ctor
    (hair.cpp:228-262): longitudinal variances v[p], azimuthal logistic
    scale s, and the 2^k alpha rotations."""
    bm = hp.beta_m
    v0 = _sqr(0.726 * bm + 0.812 * _sqr(bm) + 3.7 * bm ** 20)
    v = [v0, 0.25 * v0, 4.0 * v0, 4.0 * v0]
    bn = hp.beta_n
    s = SQRT_PI_OVER_8 * (0.265 * bn + 1.194 * _sqr(bn) + 5.372 * bn ** 22)
    rad = hp.alpha * (_PI / 180.0)
    sin2k = [jnp.sin(rad)]
    cos2k = [_safe_sqrt(1.0 - _sqr(sin2k[0]))]
    for i in range(1, 3):
        sin2k.append(2.0 * cos2k[i - 1] * sin2k[i - 1])
        cos2k.append(_sqr(cos2k[i - 1]) - _sqr(sin2k[i - 1]))
    return v, s, sin2k, cos2k


def _tilted(sin_to, cos_to, sin2k, cos2k, p: int):
    """Rotate (sinThetaO, cosThetaO) for hair-scale tilt at term p
    (hair.cpp:294-313)."""
    if p == 0:
        s = sin_to * cos2k[1] - cos_to * sin2k[1]
        c = cos_to * cos2k[1] + sin_to * sin2k[1]
    elif p == 1:
        s = sin_to * cos2k[0] + cos_to * sin2k[0]
        c = cos_to * cos2k[0] - sin_to * sin2k[0]
    elif p == 2:
        s = sin_to * cos2k[2] + cos_to * sin2k[2]
        c = cos_to * cos2k[2] - sin_to * sin2k[2]
    else:
        return sin_to, cos_to
    return s, jnp.abs(c)


def _ap(cos_to, eta, h, T):
    """Attenuation terms A_p (hair.cpp:85-104).  Returns 4 x (N,3)."""
    cos_go = _safe_sqrt(1.0 - h * h)
    f = _fr_dielectric_scalar(cos_to * cos_go, eta)[:, None]
    ap0 = jnp.broadcast_to(f, T.shape)
    ap1 = _sqr(1.0 - f) * T
    ap2 = ap1 * T * f
    ap3 = ap2 * T * f / jnp.maximum(1.0 - T * f, 1e-5)
    return [ap0, ap1, ap2, ap3]


def _phi_fn(p: int, gamma_o, gamma_t):
    return 2.0 * p * gamma_t - 2.0 * gamma_o + p * _PI


def _logistic(x, s):
    x = jnp.abs(x)
    e = jnp.exp(-x / s)
    return e / (s * _sqr(1.0 + e))


def _logistic_cdf(x, s):
    return 1.0 / (1.0 + jnp.exp(-x / s))


def _trimmed_logistic(x, s, a, b):
    return _logistic(x, s) / (_logistic_cdf(b, s) - _logistic_cdf(a, s))


def _np_term(phi, p: int, s, gamma_o, gamma_t):
    dphi = phi - _phi_fn(p, gamma_o, gamma_t)
    dphi = jnp.mod(dphi + _PI, 2.0 * _PI) - _PI
    return _trimmed_logistic(dphi, s, -_PI, _PI)


def _refraction_terms(hp: HairParams, sin_to, cos_to):
    """gammaT / transmittance T for the refracted internal path
    (hair.cpp:275-287)."""
    sin_tt = sin_to / hp.eta
    cos_tt = _safe_sqrt(1.0 - _sqr(sin_tt))
    etap = jnp.sqrt(jnp.maximum(_sqr(hp.eta) - _sqr(sin_to), 0.0)) \
        / jnp.maximum(cos_to, 1e-7)
    sin_gt = hp.h / jnp.maximum(etap, 1e-7)
    cos_gt = _safe_sqrt(1.0 - _sqr(sin_gt))
    gamma_t = _safe_asin(sin_gt)
    T = jnp.exp(-hp.sigma_a * (2.0 * cos_gt / jnp.maximum(cos_tt, 1e-7))[:, None])
    return gamma_t, T


def _wo_terms(w):
    sin_t = w[:, 0]
    cos_t = _safe_sqrt(1.0 - _sqr(sin_t))
    phi = jnp.arctan2(w[:, 2], w[:, 1])
    return sin_t, cos_t, phi


def hair_f(hp: HairParams, wo, wi):
    """HairBSDF::f (hair.cpp:264-326).  Returns (N,3); includes the
    1/|cos thetaI(z)| factor like the reference."""
    v, s, sin2k, cos2k = _derived(hp)
    sin_to, cos_to, phi_o = _wo_terms(wo)
    sin_ti, cos_ti, phi_i = _wo_terms(wi)
    gamma_o = _safe_asin(hp.h)
    gamma_t, T = _refraction_terms(hp, sin_to, cos_to)
    ap = _ap(cos_to, hp.eta, hp.h, T)
    phi = phi_i - phi_o
    fsum = jnp.zeros_like(T)
    for p in range(P_MAX):
        s_op, c_op = _tilted(sin_to, cos_to, sin2k, cos2k, p)
        mp = _mp(cos_ti, c_op, sin_ti, s_op, v[p])
        fsum = fsum + (mp * _np_term(phi, p, s, gamma_o, gamma_t))[:, None] * ap[p]
    mp_res = _mp(cos_ti, cos_to, sin_ti, sin_to, v[P_MAX])
    fsum = fsum + (mp_res / (2.0 * _PI))[:, None] * ap[P_MAX]
    abs_cos = jnp.abs(wi[:, 2])
    return jnp.where(abs_cos[:, None] > 0,
                     fsum / jnp.maximum(abs_cos, 1e-12)[:, None], fsum)


def _ap_pdf(hp: HairParams, cos_to):
    """ComputeApPdf (hair.cpp:328-353): luminance-normalized Ap."""
    sin_to = _safe_sqrt(1.0 - _sqr(cos_to))
    _, T = _refraction_terms(hp, sin_to, cos_to)
    ap = _ap(cos_to, hp.eta, hp.h, T)
    yw = jnp.asarray(_YW)
    ys = [jnp.sum(a * yw, axis=-1) for a in ap]
    total = jnp.maximum(ys[0] + ys[1] + ys[2] + ys[3], 1e-20)
    return [y / total for y in ys]


def hair_pdf(hp: HairParams, wo, wi):
    """HairBSDF::Pdf (hair.cpp:452-498)."""
    v, s, sin2k, cos2k = _derived(hp)
    sin_to, cos_to, phi_o = _wo_terms(wo)
    sin_ti, cos_ti, phi_i = _wo_terms(wi)
    gamma_o = _safe_asin(hp.h)
    gamma_t, _T = _refraction_terms(hp, sin_to, cos_to)
    ap_pdf = _ap_pdf(hp, cos_to)
    phi = phi_i - phi_o
    pdf = jnp.zeros_like(sin_to)
    for p in range(P_MAX):
        s_op, c_op = _tilted(sin_to, cos_to, sin2k, cos2k, p)
        mp = _mp(cos_ti, c_op, sin_ti, s_op, v[p])
        pdf = pdf + mp * ap_pdf[p] * _np_term(phi, p, s, gamma_o, gamma_t)
    mp_res = _mp(cos_ti, cos_to, sin_ti, sin_to, v[P_MAX])
    return pdf + mp_res * ap_pdf[P_MAX] / (2.0 * _PI)


def _compact_1_by_1(x):
    """Drop odd bits of a uint32, packing even bits low (lowdiscrepancy
    Morton decode used by DemuxFloat, hair.h:131-146)."""
    x = x & jnp.uint32(0x55555555)
    x = (x ^ (x >> 1)) & jnp.uint32(0x33333333)
    x = (x ^ (x >> 2)) & jnp.uint32(0x0F0F0F0F)
    x = (x ^ (x >> 4)) & jnp.uint32(0x00FF00FF)
    x = (x ^ (x >> 8)) & jnp.uint32(0x0000FFFF)
    return x


def demux_float(u):
    """DemuxFloat (hair.h:138): one uniform float -> two, by bit
    de-interleave of its 32-bit fixed-point representation."""
    bits = jnp.minimum(u * np.float32(2.0 ** 32),
                       np.float32(2.0 ** 32 - 1)).astype(jnp.uint32)
    a = _compact_1_by_1(bits)
    b = _compact_1_by_1(bits >> 1)
    scale = np.float32(1.0 / (1 << 16))
    return a.astype(jnp.float32) * scale, b.astype(jnp.float32) * scale


def _sample_trimmed_logistic(u, s, a, b):
    k = _logistic_cdf(b, s) - _logistic_cdf(a, s)
    x = -s * jnp.log(1.0 / jnp.maximum(u * k + _logistic_cdf(a, s), 1e-12)
                     - 1.0 + 1e-12)
    return jnp.clip(x, a, b)


def hair_sample(hp: HairParams, wo, u2a, u2b):
    """HairBSDF::Sample_f (hair.cpp:355-450).  u2a/u2b: two uniform dims
    (demuxed into four like the reference).  Returns (wi, f3, pdf)."""
    v, s, sin2k, cos2k = _derived(hp)
    sin_to, cos_to, phi_o = _wo_terms(wo)
    u0a, u0b = demux_float(u2a)
    u1a, u1b = demux_float(u2b)

    # select p from the Ap pdf by sequential subtraction (hair.cpp:366-371)
    ap_pdf = _ap_pdf(hp, cos_to)
    c0 = ap_pdf[0]
    c1 = c0 + ap_pdf[1]
    c2 = c1 + ap_pdf[2]
    p_idx = ((u0a >= c0).astype(jnp.int32) + (u0a >= c1).astype(jnp.int32)
             + (u0a >= c2).astype(jnp.int32))

    # tilt for the chosen p
    tilts = [_tilted(sin_to, cos_to, sin2k, cos2k, p) for p in range(4)]
    s_op = jnp.select([p_idx == p for p in range(4)], [t[0] for t in tilts])
    c_op = jnp.select([p_idx == p for p in range(4)], [t[1] for t in tilts])
    vp = jnp.select([p_idx == p for p in range(4)], v)

    # sample Mp for thetaI (hair.cpp:385-392)
    u1a = jnp.maximum(u1a, 1e-5)
    vp_c = jnp.maximum(vp, 1e-7)
    cos_theta = 1.0 + vp_c * jnp.log(u1a + (1.0 - u1a)
                                     * jnp.exp(-2.0 / vp_c))
    sin_theta = _safe_sqrt(1.0 - _sqr(cos_theta))
    cos_phi = jnp.cos(2.0 * _PI * u1b)
    sin_ti = -cos_theta * s_op + sin_theta * cos_phi * c_op
    cos_ti = _safe_sqrt(1.0 - _sqr(sin_ti))

    # sample Np for dphi (hair.cpp:394-404)
    gamma_o = _safe_asin(hp.h)
    gamma_t, _T = _refraction_terms(hp, sin_to, cos_to)
    phi_p = jnp.select([p_idx == p for p in range(4)],
                       [_phi_fn(p, gamma_o, gamma_t) for p in range(4)])
    dphi_lobe = phi_p + _sample_trimmed_logistic(u0b, s, -_PI, _PI)
    dphi = jnp.where(p_idx < P_MAX, dphi_lobe, 2.0 * _PI * u0b)

    phi_i = phi_o + dphi
    wi = jnp.stack([sin_ti, cos_ti * jnp.cos(phi_i),
                    cos_ti * jnp.sin(phi_i)], axis=-1)

    # pdf over all terms at the sampled direction (hair.cpp:412-446)
    pdf = jnp.zeros_like(sin_to)
    for p in range(P_MAX):
        s_p, c_p = tilts[p]
        mp = _mp(cos_ti, c_p, sin_ti, s_p, v[p])
        pdf = pdf + mp * ap_pdf[p] * _np_term(dphi, p, s, gamma_o, gamma_t)
    mp_res = _mp(cos_ti, cos_to, sin_ti, sin_to, v[P_MAX])
    pdf = pdf + mp_res * ap_pdf[P_MAX] / (2.0 * _PI)
    return wi, hair_f(hp, wo, wi), pdf


def sigma_a_from_concentration(ce, cp):
    """HairBSDF::SigmaAFromConcentration (hair.cpp:510-517)."""
    eu = np.asarray([0.419, 0.697, 1.37], np.float32)
    ph = np.asarray([0.187, 0.4, 1.05], np.float32)
    return ce * eu + cp * ph


def sigma_a_from_reflectance(c, beta_n):
    """HairBSDF::SigmaAFromReflectance (hair.cpp:519-527)."""
    c = np.clip(np.asarray(c, np.float64), 1e-5, 1.0)
    d = (5.969 - 0.215 * beta_n + 2.532 * beta_n ** 2 - 10.73 * beta_n ** 3
         + 5.574 * beta_n ** 4 + 0.245 * beta_n ** 5)
    return (np.log(c) / d) ** 2
