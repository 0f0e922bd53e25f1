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


class LobeParams(NamedTuple):
    """Per-lane BSDF parameters (all (N,) or (N,3)); local-frame shading."""

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

    @property
    def active(self):
        """(N,4) bool lobe activity."""
        return jnp.stack([
            jnp.any(self.kd > 0, axis=-1),
            jnp.any(self.ks > 0, axis=-1),
            jnp.any(self.kr > 0, axis=-1),
            jnp.any(self.fs_kr > 0, axis=-1) | jnp.any(self.kt > 0, axis=-1),
        ], axis=-1)


def zero_lobes(n: int) -> LobeParams:
    z3 = jnp.zeros((n, 3), jnp.float32)
    z1 = jnp.zeros((n,), jnp.float32)
    return LobeParams(
        kd=z3, oren_a=jnp.ones((n,), jnp.float32), oren_b=z1,
        ks=z3, alpha_x=z1 + 1e-3, alpha_y=z1 + 1e-3,
        fresnel_kind=jnp.zeros((n,), jnp.int32),
        eta=z1 + 1.5, eta3=z3 + 1.0, k3=z3,
        kr=z3, kt=z3, fs_kr=z3,
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
    fd = fr_dielectric(cos_i, jnp.ones_like(cos_i), lp.eta)[:, None] * jnp.ones((1, 3))
    fc = fr_conductor(cos_i, lp.eta3, lp.k3)
    fs = _schlick(lp.ks, cos_i)
    fn = jnp.ones_like(fd)
    k = lp.fresnel_kind[:, None]
    return jnp.where(k == FRESNEL_DIELECTRIC, fd,
                     jnp.where(k == FRESNEL_CONDUCTOR, fc,
                               jnp.where(k == FRESNEL_SCHLICK, fs, fn)))


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

def _diffuse_f(lp: LobeParams, wo, wi):
    """Oren-Nayar with A=1,B=0 reducing to Lambertian (reflection.h:358)."""
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
    return lp.kd * (INV_PI * scale)[:, None]


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
    g = _ggx_g(wo, wi, lp.alpha_x, lp.alpha_y)
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


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------

def bsdf_f(lp: LobeParams, wo, wi):
    """Sum of non-specular lobes on the correct hemisphere
    (BSDF::f, reflection.cpp:680)."""
    act = lp.active
    f = jnp.zeros_like(lp.kd)
    refl = _same_hemisphere(wo, wi)
    f += jnp.where((act[:, 0] & refl)[:, None], _diffuse_f(lp, wo, wi), 0.0)
    f += jnp.where((act[:, 1] & refl)[:, None], _glossy_f(lp, wo, wi), 0.0)
    return f


def bsdf_pdf(lp: LobeParams, wo, wi):
    """Average pdf over matching lobes (BSDF::Pdf); specular lobes
    contribute 0 but count toward the average, like the reference."""
    act = lp.active
    n_match = jnp.sum(act.astype(jnp.float32), axis=-1)
    pdf = (jnp.where(act[:, 0], _diffuse_pdf(wo, wi), 0.0)
           + jnp.where(act[:, 1], _glossy_pdf(lp, wo, wi), 0.0))
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

    wi = jnp.where((chosen == 0)[:, None], wi_diff,
         jnp.where((chosen == 1)[:, None], wi_gloss,
         jnp.where((chosen == 2)[:, None], wi_mirror, wi_fs)))

    abs_ci = jnp.maximum(_abs_cos_theta(wi), F32_EPS)

    # --- per-slot f and pdf for the chosen slot ---
    is_spec = (chosen == 2) | (chosen == 3)
    n_match_f = jnp.maximum(n_match.astype(jnp.float32), 1.0)

    # smooth slots: f sums all non-specular; pdf averages them
    f_smooth = bsdf_f(lp, wo, wi)
    pdf_smooth = (jnp.where(act[:, 0], _diffuse_pdf(wo, wi), 0.0)
                  + jnp.where(act[:, 1], _glossy_pdf(lp, wo, wi), 0.0)) / n_match_f

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

    f = jnp.where((chosen == 2)[:, None], f_mirror,
        jnp.where((chosen == 3)[:, None], f_fs, f_smooth))
    pdf = jnp.where(chosen == 2, pdf_mirror,
          jnp.where(chosen == 3, pdf_fs, pdf_smooth))

    is_trans = (chosen == 3) & ~take_refl
    bad = (n_match == 0) | (pdf <= 0)
    f = jnp.where(bad[:, None], 0.0, f)
    pdf = jnp.where(bad, 0.0, pdf)
    return wi, f, pdf, is_spec, is_trans
