"""BSDF: a fixed four-slot lobe mixture evaluated in SoA registers.

Reference analog: core/reflection.{h,cpp} (BSDF aggregate of up to 8
virtual BxDFs, :164-218) and core/microfacet.{h,cpp}.  Instead of virtual
lobes, every lane carries the SAME four lobe slots with per-lane
parameters and activity masks — the "tagged union in registers" design
(SURVEY.md §2.3 reflection row).  Masked lanes cost a multiply, not a
branch, so there is no per-material divergence on the VPU:

  slot 0  DIFFUSE       Lambertian / Oren-Nayar (kd, A, B)
  slot 1  GLOSSY        microfacet GGX reflection (ks, alpha, Fresnel:
                        dielectric | conductor | Schlick)
  slot 2  SPEC_MIRROR   perfect specular reflection (kr, Fresnel noop/diel)
  slot 3  SPEC_FRESNEL  FresnelSpecular reflection+transmission (kr, kt, eta)

Material records map onto slots at scene build (materials_build.py):
matte -> 0; plastic -> 0+1; mirror -> 2; glass -> 3 (smooth) / 1 (rough);
metal -> 1 (conductor); uber -> 0+1+2+3; substrate -> 0+1 (Schlick).

Sampling follows BSDF::Sample_f's uniform-among-matching-lobes scheme
(reflection.cpp:714): u0 picks an active slot, the slot samples wi, pdf
averages all non-specular active slots, f sums all non-specular active
slots on the correct hemisphere.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from tpurt.render.sampling_warps import (
    INV_PI,
    cosine_sample_hemisphere,
)

F32_EPS = np.float32(1e-9)

FRESNEL_DIELECTRIC = 0
FRESNEL_CONDUCTOR = 1
FRESNEL_SCHLICK = 2
FRESNEL_NOOP = 3
FRESNEL_DISNEY = 4  # lerp(metallic, dielectric, FrSchlick(r0)) (disney.cpp:330)


class LobeParams(NamedTuple):
    """Per-lane BSDF parameters (all (N,) or (N,3)); local-frame shading.

    Seven lobe slots mirror the reference's BxDF stacks (reflection.h:314-
    560, disney.cpp): 0 diffuse reflection (Lambert/Oren-Nayar or Disney
    diffuse+retro+sheen+fakeSS), 1 glossy GGX reflection, 2 mirror,
    3 fresnel specular (smooth glass), 4 GGX microfacet transmission,
    5 Disney clearcoat (GTR1), 6 Lambertian transmission."""

    kd: jnp.ndarray  # (N,3) diffuse reflectance
    oren_a: jnp.ndarray  # (N,)
    oren_b: jnp.ndarray  # (N,)
    ks: jnp.ndarray  # (N,3) glossy reflectance scale
    alpha_x: jnp.ndarray  # (N,)
    alpha_y: jnp.ndarray  # (N,)
    fresnel_kind: jnp.ndarray  # (N,) int32
    eta: jnp.ndarray  # (N,) dielectric ior (glossy + fresnel-specular)
    eta3: jnp.ndarray  # (N,3) conductor eta
    k3: jnp.ndarray  # (N,3) conductor k
    kr: jnp.ndarray  # (N,3) mirror reflectance
    kt: jnp.ndarray  # (N,3) fresnel-specular transmittance
    fs_kr: jnp.ndarray  # (N,3) fresnel-specular reflectance
    kt_g: jnp.ndarray  # (N,3) microfacet transmission scale
    t_alpha_x: jnp.ndarray  # (N,) transmission distribution alphas
    t_alpha_y: jnp.ndarray  # (N,)
    cc: jnp.ndarray  # (N,) clearcoat weight
    cc_gloss: jnp.ndarray  # (N,) clearcoat GTR1 alpha
    kd_t: jnp.ndarray  # (N,3) lambertian transmission
    disney: jnp.ndarray  # (N,) bool: disney diffuse + separable G
    metallic: jnp.ndarray  # (N,) disney fresnel mix
    r0: jnp.ndarray  # (N,3) Schlick R0 color (disney fresnel)
    sheen: jnp.ndarray  # (N,3) disney sheen (weight premultiplied)
    retro: jnp.ndarray  # (N,3) disney retro-reflection color
    kd_ss: jnp.ndarray  # (N,3) disney fake-subsurface weight
    d_rough: jnp.ndarray  # (N,) raw disney roughness (retro/fakeSS)

    @property
    def active(self):
        """(N,7) bool lobe activity."""
        diff = (jnp.any(self.kd > 0, axis=-1)
                | jnp.any(self.retro > 0, axis=-1)
                | jnp.any(self.sheen > 0, axis=-1)
                | jnp.any(self.kd_ss > 0, axis=-1))
        return jnp.stack([
            diff,
            jnp.any(self.ks > 0, axis=-1),
            jnp.any(self.kr > 0, axis=-1),
            jnp.any(self.fs_kr > 0, axis=-1) | jnp.any(self.kt > 0, axis=-1),
            jnp.any(self.kt_g > 0, axis=-1),
            self.cc > 0,
            jnp.any(self.kd_t > 0, axis=-1),
        ], axis=-1)


N_SLOTS = 7
SLOT_DIFFUSE, SLOT_GLOSSY, SLOT_MIRROR, SLOT_FS, SLOT_GTRANS, \
    SLOT_CLEARCOAT, SLOT_DTRANS = range(N_SLOTS)


def zero_lobes(n: int, channels: int = 3) -> LobeParams:
    z3 = jnp.zeros((n, channels), jnp.float32)
    z1 = jnp.zeros((n,), jnp.float32)
    return LobeParams(
        kd=z3, oren_a=jnp.ones((n,), jnp.float32), oren_b=z1,
        ks=z3, alpha_x=z1 + 1e-3, alpha_y=z1 + 1e-3,
        fresnel_kind=jnp.zeros((n,), jnp.int32),
        eta=z1 + 1.5, eta3=z3 + 1.0, k3=z3,
        kr=z3, kt=z3, fs_kr=z3,
        kt_g=z3, t_alpha_x=z1 + 1e-3, t_alpha_y=z1 + 1e-3,
        cc=z1, cc_gloss=z1 + 0.1, kd_t=z3,
        disney=jnp.zeros((n,), bool), metallic=z1, r0=z3 + 0.04,
        sheen=z3, retro=z3, kd_ss=z3, d_rough=z1 + 0.5,
    )


# ---------------------------------------------------------------------------
# helpers (local frame: +z = shading normal)
# ---------------------------------------------------------------------------

def _cos_theta(w):
    return w[:, 2]


def _abs_cos_theta(w):
    return jnp.abs(w[:, 2])


def _same_hemisphere(a, b):
    return a[:, 2] * b[:, 2] > 0


def fr_dielectric(cos_i, eta_i, eta_t):
    """Fresnel reflectance, unpolarized dielectric (reflection.cpp
    FrDielectric), handling entering/exiting via cos sign."""
    cos_i = jnp.clip(cos_i, -1.0, 1.0)
    entering = cos_i > 0
    ei = jnp.where(entering, eta_i, eta_t)
    et = jnp.where(entering, eta_t, eta_i)
    ci = jnp.abs(cos_i)
    sin_t = ei / et * jnp.sqrt(jnp.maximum(0.0, 1.0 - ci * ci))
    tir = sin_t >= 1
    ct = jnp.sqrt(jnp.maximum(0.0, 1.0 - sin_t * sin_t))
    r_par = ((et * ci) - (ei * ct)) / jnp.maximum((et * ci) + (ei * ct), F32_EPS)
    r_perp = ((ei * ci) - (et * ct)) / jnp.maximum((ei * ci) + (et * ct), F32_EPS)
    f = 0.5 * (r_par * r_par + r_perp * r_perp)
    return jnp.where(tir, 1.0, f)


def fr_conductor(cos_i, eta, k):
    """Per-channel conductor Fresnel (reflection.cpp FrConductor); eta, k
    are (N,3); cos_i (N,)."""
    c = jnp.clip(jnp.abs(cos_i), 0.0, 1.0)[:, None]
    c2 = c * c
    s2 = 1.0 - c2
    e2 = eta * eta
    k2 = k * k
    t0 = e2 - k2 - s2
    a2b2 = jnp.sqrt(jnp.maximum(t0 * t0 + 4 * e2 * k2, 0.0))
    t1 = a2b2 + c2
    a = jnp.sqrt(jnp.maximum(0.5 * (a2b2 + t0), 0.0))
    t2 = 2.0 * a * c
    rs = (t1 - t2) / jnp.maximum(t1 + t2, F32_EPS)
    t3 = c2 * a2b2 + s2 * s2
    t4 = t2 * s2
    rp = rs * (t3 - t4) / jnp.maximum(t3 + t4, F32_EPS)
    return 0.5 * (rp + rs)


def _schlick(rs, cos_i):
    c = jnp.clip(1.0 - jnp.abs(cos_i), 0.0, 1.0)[:, None]
    return rs + (1.0 - rs) * (c ** 5)


def _fresnel(lp: LobeParams, cos_i):
    """Glossy-slot Fresnel dispatch as masked select (all kinds computed)."""
    fd = fr_dielectric(cos_i, jnp.ones_like(cos_i), lp.eta)[:, None] * jnp.ones_like(lp.ks)
    fc = fr_conductor(cos_i, lp.eta3, lp.k3)
    fs = _schlick(lp.ks, cos_i)
    fn = jnp.ones_like(fd)
    # DisneyFresnel (disney.cpp:327-341): metallic mix of dielectric and
    # Schlick with the tinted R0
    fdis = (1.0 - lp.metallic)[:, None] * fd \
        + lp.metallic[:, None] * _schlick(lp.r0, cos_i)
    k = lp.fresnel_kind[:, None]
    return jnp.where(k == FRESNEL_DIELECTRIC, fd,
                     jnp.where(k == FRESNEL_CONDUCTOR, fc,
                               jnp.where(k == FRESNEL_SCHLICK, fs,
                                         jnp.where(k == FRESNEL_DISNEY,
                                                   fdis, fn))))


def roughness_to_alpha(rough):
    """TrowbridgeReitzDistribution::RoughnessToAlpha (microfacet.h:83-89)."""
    rough = jnp.maximum(rough, 1e-3)
    x = jnp.log(rough)
    return (1.62142 + 0.819955 * x + 0.1734 * x * x
            + 0.0171201 * x ** 3 + 0.000640711 * x ** 4)


# -- GGX / TrowbridgeReitz ---------------------------------------------------

def _ggx_d(wh, ax, ay):
    c2 = wh[:, 2] * wh[:, 2]
    t = (wh[:, 0] * wh[:, 0]) / (ax * ax) + (wh[:, 1] * wh[:, 1]) / (ay * ay) + c2
    return jnp.where(t > 0, 1.0 / (np.pi * ax * ay * t * t), 0.0)


def _ggx_lambda(w, ax, ay):
    c = jnp.abs(w[:, 2])
    s2 = jnp.maximum(0.0, 1.0 - c * c)
    # project alpha onto the azimuth of w
    inv_c2 = jnp.where(c > F32_EPS, 1.0 / (c * c), 0.0)
    a2_tan2 = (w[:, 0] * w[:, 0] * ax * ax + w[:, 1] * w[:, 1] * ay * ay) * inv_c2
    lam = 0.5 * (-1.0 + jnp.sqrt(jnp.maximum(0.0, 1.0 + a2_tan2)))
    return jnp.where(c > F32_EPS, lam, 1e9)


def _ggx_g1(w, ax, ay):
    return 1.0 / (1.0 + _ggx_lambda(w, ax, ay))


def _ggx_g(wo, wi, ax, ay):
    return 1.0 / (1.0 + _ggx_lambda(wo, ax, ay) + _ggx_lambda(wi, ax, ay))


def _ggx_sample_vndf(wo, ax, ay, u1, u2):
    """Visible-NDF sampling (Heitz 2018 "Sampling the GGX Distribution of
    Visible Normals", JCGT — public method; the reference samples the same
    visible-normal distribution via slope space, microfacet.cpp
    TrowbridgeReitzSample).  wo may be in either hemisphere."""
    flip = wo[:, 2] < 0
    w = jnp.where(flip[:, None], -wo, wo)
    vh = jnp.stack([ax * w[:, 0], ay * w[:, 1], w[:, 2]], axis=-1)
    vh = vh / jnp.maximum(jnp.linalg.norm(vh, axis=-1, keepdims=True), F32_EPS)
    lensq = vh[:, 0] ** 2 + vh[:, 1] ** 2
    inv_len = 1.0 / jnp.sqrt(jnp.maximum(lensq, F32_EPS))
    t1 = jnp.where(
        (lensq > 1e-7)[:, None],
        jnp.stack([-vh[:, 1] * inv_len, vh[:, 0] * inv_len,
                   jnp.zeros_like(inv_len)], axis=-1),
        jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0], vh.dtype), vh.shape),
    )
    t2 = jnp.cross(vh, t1)
    r = jnp.sqrt(u1)
    phi = 2 * np.pi * u2
    p1 = r * jnp.cos(phi)
    p2 = r * jnp.sin(phi)
    s = 0.5 * (1.0 + vh[:, 2])
    p2 = (1.0 - s) * jnp.sqrt(jnp.maximum(0.0, 1.0 - p1 * p1)) + s * p2
    pz = jnp.sqrt(jnp.maximum(0.0, 1.0 - p1 * p1 - p2 * p2))
    nh = p1[:, None] * t1 + p2[:, None] * t2 + pz[:, None] * vh
    wh = jnp.stack([ax * nh[:, 0], ay * nh[:, 1],
                    jnp.maximum(nh[:, 2], 1e-6)], axis=-1)
    wh = wh / jnp.maximum(jnp.linalg.norm(wh, axis=-1, keepdims=True), F32_EPS)
    return jnp.where(flip[:, None], -wh, wh)


def _ggx_pdf_wh(wo, wh, ax, ay):
    """Visible-NDF pdf of wh given wo (microfacet Pdf with
    sampleVisibleArea)."""
    d = _ggx_d(wh, ax, ay)
    g1 = _ggx_g1(wo, ax, ay)
    return (d * g1 * jnp.abs(jnp.sum(wo * wh, axis=-1))
            / jnp.maximum(_abs_cos_theta(wo), F32_EPS))


# ---------------------------------------------------------------------------
# per-slot eval / pdf / sample
# ---------------------------------------------------------------------------

def _schlick_weight(cos_t):
    c = jnp.clip(1.0 - cos_t, 0.0, 1.0)
    return c ** 5


def _diffuse_f(lp: LobeParams, wo, wi):
    """Oren-Nayar with A=1,B=0 reducing to Lambertian (reflection.h:358),
    or — where lp.disney — the Disney diffuse stack: Burley diffuse +
    retro-reflection + sheen + fake subsurface (disney.cpp:92-228),
    folded into one additive cosine-sampled slot."""
    si = jnp.sqrt(jnp.maximum(0.0, 1.0 - wi[:, 2] ** 2))
    so = jnp.sqrt(jnp.maximum(0.0, 1.0 - wo[:, 2] ** 2))
    # cos(phi_i - phi_o) via normalized azimuth projections
    denom = jnp.maximum(si * so, F32_EPS)
    cos_dphi = jnp.clip((wi[:, 0] * wo[:, 0] + wi[:, 1] * wo[:, 1]) / denom,
                        -1.0, 1.0)
    max_cos = jnp.where((si > 1e-4) & (so > 1e-4), jnp.maximum(0.0, cos_dphi), 0.0)
    abs_ci = jnp.maximum(_abs_cos_theta(wi), F32_EPS)
    abs_co = jnp.maximum(_abs_cos_theta(wo), F32_EPS)
    sin_alpha = jnp.where(abs_ci > abs_co, so, si)
    tan_beta = jnp.where(abs_ci > abs_co, si / abs_ci, so / abs_co)
    scale = lp.oren_a + lp.oren_b * max_cos * sin_alpha * tan_beta
    f_on = lp.kd * (INV_PI * scale)[:, None]

    # --- disney variant ---
    fo = _schlick_weight(abs_co)
    fi = _schlick_weight(abs_ci)
    f_base = lp.kd * (INV_PI * (1.0 - fo / 2.0) * (1.0 - fi / 2.0))[:, None]
    wh = wo + wi
    wh_len = jnp.linalg.norm(wh, axis=-1)
    degen = wh_len < F32_EPS
    whn = wh / jnp.maximum(wh_len, F32_EPS)[:, None]
    cos_d = jnp.sum(wi * whn, axis=-1)
    rr = 2.0 * lp.d_rough * cos_d * cos_d
    f_retro = lp.retro * (INV_PI * rr
                          * (fo + fi + fo * fi * (rr - 1.0)))[:, None]
    f_sheen = lp.sheen * _schlick_weight(jnp.abs(cos_d))[:, None]
    fss90 = cos_d * cos_d * lp.d_rough
    fss = ((1.0 + fo * (fss90 - 1.0)) * (1.0 + fi * (fss90 - 1.0)))
    ss = 1.25 * (fss * (1.0 / jnp.maximum(abs_co + abs_ci, F32_EPS) - 0.5)
                 + 0.5)
    f_ss = lp.kd_ss * (INV_PI * ss)[:, None]
    f_dis = f_base + jnp.where(degen[:, None], 0.0,
                               f_retro + f_sheen + f_ss)
    return jnp.where(lp.disney[:, None], f_dis, f_on)


def _diffuse_pdf(wo, wi):
    return jnp.where(_same_hemisphere(wo, wi),
                     _abs_cos_theta(wi) * INV_PI, 0.0)


def _glossy_f(lp: LobeParams, wo, wi):
    """GGX microfacet reflection (reflection.cpp MicrofacetReflection::f)."""
    co = _abs_cos_theta(wo)
    ci = _abs_cos_theta(wi)
    wh = wo + wi
    wh_len = jnp.linalg.norm(wh, axis=-1, keepdims=True)
    degenerate = (ci < F32_EPS) | (co < F32_EPS) | (wh_len[:, 0] < F32_EPS)
    wh = wh / jnp.maximum(wh_len, F32_EPS)
    d = _ggx_d(wh, lp.alpha_x, lp.alpha_y)
    # Disney uses the separable Smith form G1*G1 (disney.cpp:352-357)
    g = jnp.where(lp.disney,
                  _ggx_g1(wo, lp.alpha_x, lp.alpha_y)
                  * _ggx_g1(wi, lp.alpha_x, lp.alpha_y),
                  _ggx_g(wo, wi, lp.alpha_x, lp.alpha_y))
    # Fresnel with cos at the half vector, oriented toward the normal
    wh_fwd = jnp.where(wh[:, 2:3] < 0, -wh, wh)
    f = _fresnel(lp, jnp.sum(wi * wh_fwd, axis=-1))
    ks = jnp.where((lp.fresnel_kind == FRESNEL_SCHLICK)[:, None],
                   jnp.ones_like(lp.ks), lp.ks)  # Schlick folds ks into F
    val = ks * f * (d * g / jnp.maximum(4.0 * ci * co, F32_EPS))[:, None]
    return jnp.where((degenerate | ~_same_hemisphere(wo, wi))[:, None], 0.0, val)


def _glossy_pdf(lp: LobeParams, wo, wi):
    wh = wo + wi
    wh_len = jnp.linalg.norm(wh, axis=-1, keepdims=True)
    wh = wh / jnp.maximum(wh_len, F32_EPS)
    pdf = _ggx_pdf_wh(wo, wh, lp.alpha_x, lp.alpha_y) / jnp.maximum(
        4.0 * jnp.abs(jnp.sum(wo * wh, axis=-1)), F32_EPS)
    return jnp.where(_same_hemisphere(wo, wi) & (wh_len[:, 0] > F32_EPS),
                     pdf, 0.0)


def _glossy_sample(lp: LobeParams, wo, u1, u2):
    wh = _ggx_sample_vndf(wo, lp.alpha_x, lp.alpha_y, u1, u2)
    wi = -wo + 2.0 * jnp.sum(wo * wh, axis=-1)[:, None] * wh
    return wi


def _refract(wo, cos_i, eta_rel):
    """Refract -wo about +/-z; returns (ok, wi).  eta_rel = eta_i/eta_t."""
    sin2_i = jnp.maximum(0.0, 1.0 - cos_i * cos_i)
    sin2_t = eta_rel * eta_rel * sin2_i
    ok = sin2_t < 1.0
    cos_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - sin2_t))
    # local frame: n = (0,0,±1) facing wo
    n_z = jnp.where(cos_i > 0, 1.0, -1.0)
    wi = jnp.stack([
        -wo[:, 0] * eta_rel,
        -wo[:, 1] * eta_rel,
        -cos_t * n_z,
    ], axis=-1)
    return ok, wi


# -- microfacet transmission (reflection.cpp:246-271, 431-460) ---------------

def _gtrans_eta(lp: LobeParams, wo):
    """etaB/etaA seen from wo's side (etaA=1 outside, etaB=lp.eta)."""
    return jnp.where(_cos_theta(wo) > 0, lp.eta, 1.0 / lp.eta)


def _gtrans_f(lp: LobeParams, wo, wi):
    co = _cos_theta(wo)
    ci = _cos_theta(wi)
    eta = _gtrans_eta(lp, wo)
    wh = wo + wi * eta[:, None]
    wh_len = jnp.linalg.norm(wh, axis=-1)
    wh = wh / jnp.maximum(wh_len, F32_EPS)[:, None]
    wh = jnp.where(wh[:, 2:3] < 0, -wh, wh)
    dwo = jnp.sum(wo * wh, axis=-1)
    dwi = jnp.sum(wi * wh, axis=-1)
    bad = (_same_hemisphere(wo, wi) | (jnp.abs(co) < F32_EPS)
           | (jnp.abs(ci) < F32_EPS) | (wh_len < F32_EPS)
           | (dwo * dwi > 0))
    fr = fr_dielectric(dwo, jnp.ones_like(dwo), lp.eta)
    d = _ggx_d(wh, lp.t_alpha_x, lp.t_alpha_y)
    g = _ggx_g(wo, wi, lp.t_alpha_x, lp.t_alpha_y)
    denom = dwo + eta * dwi
    factor = 1.0 / eta  # radiance transport (reflection.cpp:265)
    # ci*co < 0 for transmission: take |.| BEFORE the epsilon clamp
    den_abs = jnp.maximum(jnp.abs(ci * co) * denom * denom, F32_EPS)
    val = ((1.0 - fr)[:, None] * lp.kt_g
           * jnp.abs(d * g * eta * eta * dwi * dwo
                     * factor * factor / den_abs)[:, None])
    return jnp.where(bad[:, None], 0.0, val)


def _gtrans_pdf(lp: LobeParams, wo, wi):
    eta = _gtrans_eta(lp, wo)
    wh = wo + wi * eta[:, None]
    wh_len = jnp.linalg.norm(wh, axis=-1)
    wh = wh / jnp.maximum(wh_len, F32_EPS)[:, None]
    dwo = jnp.sum(wo * wh, axis=-1)
    dwi = jnp.sum(wi * wh, axis=-1)
    denom = dwo + eta * dwi
    dwh_dwi = jnp.abs(eta * eta * dwi) / jnp.maximum(denom * denom, F32_EPS)
    wh_fwd = jnp.where(wh[:, 2:3] < 0, -wh, wh)
    pdf = _ggx_pdf_wh(wo, wh_fwd, lp.t_alpha_x, lp.t_alpha_y) * dwh_dwi
    ok = (~_same_hemisphere(wo, wi)) & (wh_len > F32_EPS) & (dwo * dwi <= 0)
    return jnp.where(ok, pdf, 0.0)


def _gtrans_sample(lp: LobeParams, wo, u1, u2):
    """Sample wh from the VNDF and refract wo about it
    (MicrofacetTransmission::Sample_f).  Returns (ok, wi)."""
    wh = _ggx_sample_vndf(wo, lp.t_alpha_x, lp.t_alpha_y, u1, u2)
    cos_i = jnp.sum(wo * wh, axis=-1)
    eta_rel = jnp.where(_cos_theta(wo) > 0, 1.0 / lp.eta, lp.eta)
    sin2_t = eta_rel * eta_rel * jnp.maximum(0.0, 1.0 - cos_i * cos_i)
    ok = (cos_i > 0) & (sin2_t < 1.0)
    cos_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - sin2_t))
    wi = (-eta_rel[:, None] * wo
          + (eta_rel * cos_i - cos_t)[:, None] * wh)
    return ok, wi


# -- disney clearcoat (disney.cpp:230-318) ------------------------------------

def _gtr1(cos_t, alpha):
    # sign-flipped form of disney.cpp:248-252: for alpha<1 both (1-a2) and
    # -log(a2) are positive, so every factor is clamp-safe
    a2 = alpha * alpha
    num = 1.0 - a2
    den = (np.pi * jnp.maximum(-jnp.log(jnp.maximum(a2, F32_EPS)), F32_EPS)
           * jnp.maximum(1.0 + (a2 - 1.0) * cos_t * cos_t, F32_EPS))
    return num / den


def _smith_g_sep(cos_t, alpha):
    a2 = alpha * alpha
    c2 = cos_t * cos_t
    return 1.0 / jnp.maximum(cos_t + jnp.sqrt(a2 + c2 - a2 * c2), F32_EPS)


def _cc_f(lp: LobeParams, wo, wi):
    wh = wo + wi
    wh_len = jnp.linalg.norm(wh, axis=-1)
    wh = wh / jnp.maximum(wh_len, F32_EPS)[:, None]
    dr = _gtr1(_abs_cos_theta(wh), lp.cc_gloss)
    fr = 0.04 + 0.96 * _schlick_weight(jnp.sum(wo * wh, axis=-1))
    gr = (_smith_g_sep(_abs_cos_theta(wo), 0.25)
          * _smith_g_sep(_abs_cos_theta(wi), 0.25))
    val = lp.cc * gr * fr * dr / 4.0
    ok = _same_hemisphere(wo, wi) & (wh_len > F32_EPS)
    return jnp.where(ok, val, 0.0)[:, None] * jnp.ones_like(lp.kd)


def _cc_pdf(lp: LobeParams, wo, wi):
    wh = wo + wi
    wh_len = jnp.linalg.norm(wh, axis=-1)
    wh = wh / jnp.maximum(wh_len, F32_EPS)[:, None]
    dr = _gtr1(_abs_cos_theta(wh), lp.cc_gloss)
    pdf = (dr * _abs_cos_theta(wh)
           / jnp.maximum(4.0 * jnp.sum(wo * wh, axis=-1), F32_EPS))
    return jnp.where(_same_hemisphere(wo, wi) & (wh_len > F32_EPS), pdf, 0.0)


def _cc_sample(lp: LobeParams, wo, u1, u2):
    a2 = lp.cc_gloss * lp.cc_gloss
    cos_t = jnp.sqrt(jnp.maximum(
        0.0, (1.0 - jnp.power(jnp.maximum(a2, F32_EPS), 1.0 - u1))
        / jnp.maximum(1.0 - a2, F32_EPS)))
    sin_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_t * cos_t))
    phi = 2.0 * np.pi * u2
    wh = jnp.stack([sin_t * jnp.cos(phi), sin_t * jnp.sin(phi), cos_t],
                   axis=-1)
    wh = jnp.where(_same_hemisphere(wo, wh)[:, None], wh, -wh)
    wi = -wo + 2.0 * jnp.sum(wo * wh, axis=-1)[:, None] * wh
    return wi


# -- lambertian transmission (reflection.h:390, cpp:397-409) ------------------

def _dtrans_f(lp: LobeParams, wo, wi):
    return jnp.where((~_same_hemisphere(wo, wi))[:, None],
                     lp.kd_t * INV_PI, 0.0)


def _dtrans_pdf(wo, wi):
    return jnp.where(~_same_hemisphere(wo, wi),
                     _abs_cos_theta(wi) * INV_PI, 0.0)


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------

def bsdf_f(lp: LobeParams, wo, wi):
    """Sum of non-specular lobes on the correct hemisphere
    (BSDF::f, reflection.cpp:680)."""
    act = lp.active
    f = jnp.zeros_like(lp.kd)
    refl = _same_hemisphere(wo, wi)
    f += jnp.where((act[:, SLOT_DIFFUSE] & refl)[:, None],
                   _diffuse_f(lp, wo, wi), 0.0)
    f += jnp.where((act[:, SLOT_GLOSSY] & refl)[:, None],
                   _glossy_f(lp, wo, wi), 0.0)
    f += jnp.where(act[:, SLOT_GTRANS][:, None], _gtrans_f(lp, wo, wi), 0.0)
    f += jnp.where((act[:, SLOT_CLEARCOAT] & refl)[:, None],
                   _cc_f(lp, wo, wi), 0.0)
    f += jnp.where(act[:, SLOT_DTRANS][:, None], _dtrans_f(lp, wo, wi), 0.0)
    return f


def _smooth_pdf_sum(lp: LobeParams, wo, wi):
    """Sum of the non-specular lobes' pdfs (hemisphere-masked)."""
    act = lp.active
    return (jnp.where(act[:, SLOT_DIFFUSE], _diffuse_pdf(wo, wi), 0.0)
            + jnp.where(act[:, SLOT_GLOSSY], _glossy_pdf(lp, wo, wi), 0.0)
            + jnp.where(act[:, SLOT_GTRANS], _gtrans_pdf(lp, wo, wi), 0.0)
            + jnp.where(act[:, SLOT_CLEARCOAT], _cc_pdf(lp, wo, wi), 0.0)
            + jnp.where(act[:, SLOT_DTRANS], _dtrans_pdf(wo, wi), 0.0))


def bsdf_pdf(lp: LobeParams, wo, wi):
    """Average pdf over matching lobes (BSDF::Pdf); specular lobes
    contribute 0 but count toward the average, like the reference."""
    act = lp.active
    n_match = jnp.sum(act.astype(jnp.float32), axis=-1)
    pdf = _smooth_pdf_sum(lp, wo, wi)
    return jnp.where(n_match > 0, pdf / jnp.maximum(n_match, 1.0), 0.0)


def bsdf_sample(lp: LobeParams, wo, u_lobe, u1, u2):
    """Sample an outgoing direction.

    Returns (wi, f, pdf, is_specular, is_transmission).  Mirrors
    BSDF::Sample_f (reflection.cpp:714): uniform choice among active slots,
    slot-specific sampling, pdf averaged over active slots (specular slots
    keep their discrete pdf), f summed over non-specular slots.
    """
    act = lp.active
    n_match = jnp.sum(act.astype(jnp.int32), axis=-1)
    # pick the (u_lobe * n_match)-th active slot
    target = jnp.minimum((u_lobe * n_match.astype(jnp.float32)).astype(jnp.int32),
                         jnp.maximum(n_match - 1, 0))
    cum = jnp.cumsum(act.astype(jnp.int32), axis=-1) - act.astype(jnp.int32)
    chosen = jnp.argmax((cum == target[:, None]) & act, axis=-1)
    chosen = jnp.where(n_match > 0, chosen, -1)

    # --- candidate wi from each sampler (all computed, masked select) ---
    wi_diff = cosine_sample_hemisphere(u1, u2)
    wi_diff = jnp.where(wo[:, 2:3] < 0, wi_diff * jnp.asarray([1.0, 1.0, -1.0]),
                        wi_diff)
    wi_gloss = _glossy_sample(lp, wo, u1, u2)
    wi_mirror = jnp.stack([-wo[:, 0], -wo[:, 1], wo[:, 2]], axis=-1)

    # fresnel specular: choose reflect/transmit by F (FresnelSpecular,
    # reflection.h:314)
    cos_o = _cos_theta(wo)
    f_spec = fr_dielectric(cos_o, jnp.ones_like(cos_o), lp.eta)
    take_refl = u1 < f_spec
    eta_rel = jnp.where(cos_o > 0, 1.0 / lp.eta, lp.eta)
    t_ok, wi_trans = _refract(wo, cos_o, eta_rel)
    wi_fs = jnp.where(take_refl[:, None], wi_mirror, wi_trans)

    gt_ok, wi_gt = _gtrans_sample(lp, wo, u1, u2)
    wi_cc = _cc_sample(lp, wo, u1, u2)
    # lambertian transmission: wi_diff is on wo's side; flip to the far side
    wi_dt = wi_diff * jnp.asarray([1.0, 1.0, -1.0])

    wi = jnp.where((chosen == SLOT_DIFFUSE)[:, None], wi_diff,
         jnp.where((chosen == SLOT_GLOSSY)[:, None], wi_gloss,
         jnp.where((chosen == SLOT_MIRROR)[:, None], wi_mirror,
         jnp.where((chosen == SLOT_FS)[:, None], wi_fs,
         jnp.where((chosen == SLOT_GTRANS)[:, None], wi_gt,
         jnp.where((chosen == SLOT_CLEARCOAT)[:, None], wi_cc, wi_dt))))))

    abs_ci = jnp.maximum(_abs_cos_theta(wi), F32_EPS)

    # --- per-slot f and pdf for the chosen slot ---
    is_spec = (chosen == SLOT_MIRROR) | (chosen == SLOT_FS)
    n_match_f = jnp.maximum(n_match.astype(jnp.float32), 1.0)

    # smooth slots: f sums all non-specular; pdf averages them
    f_smooth = bsdf_f(lp, wo, wi)
    pdf_smooth = _smooth_pdf_sum(lp, wo, wi) / n_match_f

    # mirror slot (SpecularReflection::Sample_f): fresnel noop or dielectric
    fr_m = jnp.where(
        (lp.fresnel_kind == FRESNEL_NOOP)[:, None], 1.0,
        fr_dielectric(cos_o, jnp.ones_like(cos_o), lp.eta)[:, None])
    f_mirror = lp.kr * fr_m / abs_ci[:, None]
    pdf_mirror = 1.0 / n_match_f

    # fresnel-specular slot
    f_fs_refl = lp.fs_kr * f_spec[:, None] / abs_ci[:, None]
    # radiance transport scaling (etaI/etaT)^2 for transmission
    ft_scale = eta_rel * eta_rel
    f_fs_trans = (lp.kt * ((1.0 - f_spec) * ft_scale)[:, None]
                  / abs_ci[:, None])
    f_fs_trans = jnp.where(t_ok[:, None], f_fs_trans, 0.0)
    f_fs = jnp.where(take_refl[:, None], f_fs_refl, f_fs_trans)
    pdf_fs = jnp.where(take_refl, f_spec, 1.0 - f_spec) / n_match_f

    f = jnp.where((chosen == SLOT_MIRROR)[:, None], f_mirror,
        jnp.where((chosen == SLOT_FS)[:, None], f_fs, f_smooth))
    pdf = jnp.where(chosen == SLOT_MIRROR, pdf_mirror,
          jnp.where(chosen == SLOT_FS, pdf_fs, pdf_smooth))

    is_trans = (((chosen == SLOT_FS) & ~take_refl)
                | (chosen == SLOT_GTRANS)
                | ((chosen == SLOT_DTRANS)
                   & ~_same_hemisphere(wo, wi)))
    bad = (n_match == 0) | (pdf <= 0) | ((chosen == SLOT_GTRANS) & ~gt_ok)
    f = jnp.where(bad[:, None], 0.0, f)
    pdf = jnp.where(bad, 0.0, pdf)
    return wi, f, pdf, is_spec, is_trans
