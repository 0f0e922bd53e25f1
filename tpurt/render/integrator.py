"""Wavefront integrators: path, directlighting, whitted, ao.

Reference analog: core/integrator.{h,cpp} (SamplerIntegrator tile loop
:228-339, UniformSampleOneLight :85, EstimateDirect :108) and
integrators/path.cpp:64 (Li).  The reference's per-ray recursion becomes a
lax.scan over bounces of one batched bounce body (intersect + shade + NEE
+ BSDF sample) over SoA lane buffers — one compiled body regardless of
max_depth, which keeps XLA compile time flat and lets the same code run
any depth.

MIS structure: pbrt's EstimateDirect draws a light sample AND a separate
BSDF sample per bounce (tracing an extra ray toward the light).  The
wavefront folds the BSDF-MIS term into the next bounce's emitted-light
hit: when the continued path ray lands on an emitter, its contribution is
weighted by PowerHeuristic(bsdf_pdf, light_pdf) — the standard wavefront
formulation (same MIS estimator family, one intersection per bounce).

Dimension schedule is static per bounce: camera dims 0-4 (pFilm, time,
pLens — GetCameraSample order, sampler.h:58), then 7 dims per bounce
(light-choice, uLight.xy, lobe-choice, uBSDF.xy, RR).  The RR dim is
consumed every bounce (the reference consumes it only when rrBeta puts it
at risk, path.cpp; unconditional consumption keeps the schedule static —
a pure shift of low-discrepancy dims, statistically immaterial).
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from tpurt.config import get_config
from tpurt.render.bsdf import bsdf_f, bsdf_pdf, bsdf_sample
from tpurt.render.interaction import (
    SurfaceInteraction,
    compute_interaction,
    offset_ray_origin,
)
from tpurt.render.intersect import (DeviceGeometry, Hit, intersect_any,
                                    intersect_closest, intersect_mixed)
from tpurt.render.lights import (
    LIGHT_INFINITE,
    LightTable,
    choose_light,
    pdf_li_from_hit,
    sample_li,
)
from tpurt.render.materials_build import fetch_lobes
from tpurt.render.sampling_warps import (
    build_onb,
    cosine_sample_hemisphere,
    dot,
    power_heuristic,
    to_local,
    to_world,
)

INF = jnp.float32(np.inf)
SHADOW_EPS = 1e-4  # pbrt ShadowEpsilon (pbrt.h:195)
DIMS_PER_BOUNCE = 7
CAMERA_DIMS = 5


class IntegratorConfig(NamedTuple):
    name: str = "path"
    max_depth: int = 5
    rr_threshold: float = 1.0
    light_strategy: str = "spatial"  # spatial|power|uniform (spatial->power)
    ao_samples: int = 64
    ao_cos_sample: bool = True
    direct_strategy: str = "all"  # directlighting: all|one
    capture_features: bool = False  # RPF per-sample feature capture
    # SampledSpectrum (60-bin) mode (pbrt.h:126-130): radiance/throughput
    # carry a 60-wide channel axis; RGB scene values promote through the
    # Smits bases at eval and radiance converts to RGB at the integrator
    # exit.  Static -> the RGB path compiles none of this.
    spectral: bool = False


class SceneData(NamedTuple):
    geo: DeviceGeometry
    lights: LightTable
    mt_table: jnp.ndarray
    mt_k3: jnp.ndarray
    mt_kinds: jnp.ndarray
    mt_mix: jnp.ndarray = None  # (M,2) mix sub-material rows (or None)
    # participating media (media/homogeneous.cpp + media/grid.cpp)
    med_sigma_t: jnp.ndarray = None  # (M,3)
    med_sigma_s: jnp.ndarray = None  # (M,3)
    med_g: jnp.ndarray = None  # (M,)
    camera_medium: int = -1
    has_media: bool = False
    # grid media: concatenated density lattices + per-medium metadata
    med_density: jnp.ndarray = None  # (D,) f32 flat
    med_grid_off: jnp.ndarray = None  # (M,) i32 offset into med_density
    med_grid_dims: jnp.ndarray = None  # (M,3) i32 (nx, ny, nz)
    med_w2m: jnp.ndarray = None  # (M,4,4) world->medium
    med_inv_maxd: jnp.ndarray = None  # (M,) 1/max(density)
    med_is_grid: jnp.ndarray = None  # (M,) bool
    has_grid_media: bool = False
    # hair material table (materials/hair.cpp): rows [sigma_a rgb, eta,
    # beta_m, beta_n, alpha]; None when the scene has no hair
    mt_hair: jnp.ndarray = None  # (M,7)
    has_hair: bool = False
    has_tangents: bool = False  # any mesh carries shading tangents
    # tabulated BSSRDF (core/bssrdf.cpp): per-material [sigma_t rgb,
    # rho rgb, eta] + diffusion-table index; tables stacked on axis 0
    mt_bss: jnp.ndarray = None  # (M,7)
    mt_bss_tix: jnp.ndarray = None  # (M,) i32, -1 = none
    bss_rho: jnp.ndarray = None  # (T,R) albedo nodes
    bss_radius: jnp.ndarray = None  # (T,S) optical radius nodes
    bss_profile: jnp.ndarray = None  # (T,R,S)
    bss_rhoeff: jnp.ndarray = None  # (T,R)
    bss_cdf: jnp.ndarray = None  # (T,R,S)
    has_bssrdf: bool = False
    n_bss_tables: int = 0
    # fourier tabulated BSDFs: baked tables (tuple of FourierTableDev
    # pytrees) + per-material table index
    fr_tables: tuple = ()
    mt_fourier_tix: jnp.ndarray = None  # (M,) i32, -1 = none
    fr_etas: tuple = ()  # static per-table eta
    has_fourier: bool = False
    # any null-material prims with a medium interface -> shadow rays walk
    # boundaries (VisibilityTester::Tr) instead of a single-segment Tr
    has_null_boundaries: bool = False
    # any material carries a bump texture -> interactions compute dpdu/dpdv
    has_bump: bool = False
    # any imagemap texture -> footprint-based MIP filtering
    has_texfilter: bool = False


from tpurt.pytrees import register_static_pytree  # noqa: E402

register_static_pytree(SceneData, [
    "geo", "lights", "mt_table", "mt_k3", "mt_kinds", "mt_mix",
    "med_sigma_t", "med_sigma_s", "med_g",
    "med_density", "med_grid_off", "med_grid_dims", "med_w2m",
    "med_inv_maxd", "med_is_grid", "mt_hair",
    "mt_bss", "mt_bss_tix", "bss_rho", "bss_radius", "bss_profile",
    "bss_rhoeff", "bss_cdf", "fr_tables", "mt_fourier_tix",
])


def _lift_illum_maybe(L, channels: int):
    """Promote RGB light radiance to the 60 bins when rendering
    spectrally.  LightSource/AreaLightSource RGB parameters promote
    through the ILLUMINANT basis (parser.cpp:878,942); envmap texels
    promote the same way at lookup (infinite.cpp:95)."""
    if channels == 3:
        return L
    from tpurt.spectrum_sampled import lift_illum

    return lift_illum(L)


def _lift_f_maybe(f, channels: int):
    """Promote an already-evaluated 3-channel BSDF value (the hair /
    fourier models evaluate 3-channel tables) to bins, without the 0.94
    reflectance scale (the value is a BSDF, not a parse-time color)."""
    if channels == 3:
        return f
    from tpurt.spectrum_sampled import lift_refl_raw

    return lift_refl_raw(f)


def _lift_refl_maybe(v, channels: int):
    """Promote an RGB scene PARAMETER (medium sigma_a/sigma_s etc.) to
    bins through the reflectance basis with the parse-time 0.94 scale
    (ParamSet RGB params default to SpectrumType::Reflectance)."""
    if channels == 3:
        return v
    from tpurt.spectrum_sampled import lift_refl

    return lift_refl(v)


def _to_rgb_maybe(L, cfg: "IntegratorConfig"):
    """Spectral radiance -> RGB at the integrator exit (the film stays
    3-channel; SampledSpectrum::ToXYZ + XYZToRGB fused, spectrum.h:315)."""
    if not cfg.spectral:
        return L
    from tpurt.spectrum_sampled import to_rgb_matrix

    return L @ to_rgb_matrix()


def _emitted(scene: SceneData, si: SurfaceInteraction):
    """Area-light radiance toward wo at a hit (DiffuseAreaLight::L,
    diffuse.h:58: twoSided || dot(n, w) > 0)."""
    lrow = jnp.where(si.valid,
                     scene.lights.prim_to_light[jnp.maximum(si.prim, 0)], -1)
    has = lrow >= 0
    lrow_c = jnp.maximum(lrow, 0)
    row = scene.lights.rows[lrow_c]  # one fused row gather
    L = row[:, 1:4]
    two_sided = row[:, 13] > 0
    emits = has & (two_sided | (dot(si.ng, si.wo) > 0))
    return jnp.where(emits[:, None], L, 0.0), lrow


def _infinite_L(lights: LightTable):
    """Constant-radiance part of the infinite lights (the env-mapped light,
    if any, is looked up per-direction via env_le)."""
    inf_mask = lights.kind == LIGHT_INFINITE
    if lights.env_light_row >= 0:
        inf_mask = inf_mask & (jnp.arange(lights.kind.shape[0])
                               != lights.env_light_row)
    return jnp.sum(jnp.where(inf_mask[:, None], lights.L, 0.0), axis=0), inf_mask


def _escape_radiance(lights: LightTable, inf_L, d):
    """Total infinite-light radiance for escaped rays along d."""
    L = jnp.broadcast_to(inf_L[None, :], (d.shape[0], 3))
    if lights.env_light_row >= 0:
        from tpurt.render.lights import env_le

        L = L + env_le(lights, d)
    return L


def _escape_pdf(lights: LightTable, d):
    """Sample_Li solid-angle pdf for escaped directions (for the MIS
    weight): env-importance pdf when mapped, else uniform sphere."""
    if lights.env_light_row >= 0:
        from tpurt.render.lights import env_pdf

        return env_pdf(lights, d)
    return jnp.full((d.shape[0],), 1.0 / (4 * np.pi), jnp.float32)


def _choice_pmf_at(scene: SceneData, lrow_c, strategy: str, n: int,
                   ref_p=None):
    lt = scene.lights
    if strategy == "spatial" and lt.spat_res > 1 and ref_p is not None:
        res = lt.spat_res
        v = jnp.clip(((ref_p - lt.spat_lo) * lt.spat_inv_extent * res)
                     .astype(jnp.int32), 0, res - 1)
        vox = (v[:, 2] * res + v[:, 1]) * res + v[:, 0]
        return lt.spat_pmf[vox, lrow_c]
    if strategy in ("power", "spatial"):
        return lt.power_pmf[lrow_c]
    return jnp.full((n,), 1.0 / lt.n_lights, jnp.float32)


def _shading_frame(si: SurfaceInteraction):
    """BSDF local frame (t, b): aligned to the shading tangent (dpdu /
    fiber direction) when the scene carries one, else the branchless ONB.
    The reference always builds frames from dpdu (interaction.cpp)."""
    if si.ss is not None:
        return si.ss, jnp.cross(si.ns, si.ss)
    return build_onb(si.ns)


def _hair_ctx(scene: SceneData, si: SurfaceInteraction, mrow=None):
    """(is_hair, HairParams) for hair-material lanes, or None when the
    scene has no hair (static, so non-hair scenes compile none of this).
    mrow: optional pre-gathered fused material rows (shared gather)."""
    if not scene.has_hair:
        return None
    from tpurt.render.hair import HairParams
    from tpurt.render.materials_build import C_HAIR0, C_KIND, MAT_HAIR

    if mrow is None:
        mrow = scene.mt_table[jnp.maximum(si.material_id, 0)]
    kind = jnp.where(si.material_id >= 0,
                     mrow[:, C_KIND].astype(jnp.int32), 0)
    is_hair = (kind == MAT_HAIR) & si.valid
    row = mrow[:, C_HAIR0:C_HAIR0 + 7]
    # offset across the fiber width from the curve v coordinate
    # (hair.cpp:165: h = -1 + 2 * uv[1])
    h = jnp.clip(-1.0 + 2.0 * si.uv[:, 1], -1.0, 1.0)
    hp = HairParams(h=h, eta=row[:, 3], sigma_a=row[:, 0:3],
                    beta_m=row[:, 4], beta_n=row[:, 5], alpha=row[:, 6])
    return is_hair, hp


def _fourier_ctx(scene: SceneData, si: SurfaceInteraction, mrow=None):
    """(is_fourier, table_idx) for fourier-material lanes, or None (static
    for non-fourier scenes)."""
    if not scene.has_fourier:
        return None
    from tpurt.render.materials_build import C_FTIX

    if mrow is None:
        mrow = scene.mt_table[jnp.maximum(si.material_id, 0)]
    tix = jnp.where(si.material_id >= 0,
                    mrow[:, C_FTIX].astype(jnp.int32), -1)
    return (tix >= 0) & si.valid, tix


def _fourier_f_pdf_multi(scene: SceneData, tix, wo_l, wi_l):
    from tpurt.render.fourier import fourier_f, fourier_pdf

    f = jnp.zeros((wo_l.shape[0], 3), jnp.float32)
    pdf = jnp.zeros(wo_l.shape[0], jnp.float32)
    for k, tbl in enumerate(scene.fr_tables):
        m = tix == k
        f = jnp.where(m[:, None], fourier_f(tbl, scene.fr_etas[k], wo_l, wi_l),
                      f)
        pdf = jnp.where(m, fourier_pdf(tbl, wo_l, wi_l), pdf)
    return f, pdf


class ShadeCtx(NamedTuple):
    """Full surface-shading context of a vertex: the masked lobe mixture
    PLUS the hair/fourier special-material contexts and the shading frame
    (hair azimuth needs the fiber-aligned frame — an arbitrary
    build_onb(ns) frame would rotate the fiber).  The optional members
    are None STATICALLY for scenes without the material, so e.g. non-hair
    scenes compile none of the hair model.  This is what the reference's
    ComputeScatteringFunctions hands every integrator (interaction.cpp;
    hair.cpp:527, fourier.cpp) — bdpt/sppm/mlt shade through this instead
    of a gray-matte stand-in."""

    lobes: Any
    t: jnp.ndarray  # (N, 3) shading tangent
    b: jnp.ndarray  # (N, 3) shading bitangent
    is_hair: Optional[jnp.ndarray] = None
    hair: Optional[Any] = None  # HairParams
    is_fourier: Optional[jnp.ndarray] = None
    fourier_tix: Optional[jnp.ndarray] = None


def make_shade_ctx(scene: SceneData, si: SurfaceInteraction,
                   texture_eval=None, channels: int = 3) -> ShadeCtx:
    overrides = texture_eval(si) if texture_eval is not None else None
    # ONE fused material-row gather shared by the lobe fetch and the
    # hair/fourier contexts
    mrow = scene.mt_table[jnp.maximum(si.material_id, 0)]
    lobes = fetch_lobes(scene.mt_table, si.material_id, overrides,
                        has_mix=scene.mt_mix is not None,
                        channels=channels, row=mrow)
    t, b = _shading_frame(si)
    hc = _hair_ctx(scene, si, mrow)
    fc = _fourier_ctx(scene, si, mrow)
    return ShadeCtx(
        lobes=lobes, t=t, b=b,
        is_hair=None if hc is None else hc[0],
        hair=None if hc is None else hc[1],
        is_fourier=None if fc is None else fc[0],
        fourier_tix=None if fc is None else fc[1])


def zero_shade_ctx(scene: SceneData, n: int, channels: int = 3) -> ShadeCtx:
    """All-dark context with the same pytree STRUCTURE as
    make_shade_ctx's output for this scene (endpoint vertices in scans
    must match the walk vertices' structure).  Every leaf is a DISTINCT
    buffer: callers donate states containing this tree, and XLA rejects
    donating one buffer twice."""
    from tpurt.render.bsdf import zero_lobes

    t = jnp.zeros((n, 3), jnp.float32).at[:, 0].set(1.0)
    b = jnp.zeros((n, 3), jnp.float32).at[:, 1].set(1.0)
    hc = fc = None
    if scene.has_hair:
        from tpurt.render.hair import HairParams

        z = jnp.zeros(n, jnp.float32)
        hc = (jnp.zeros(n, bool),
              HairParams(h=z, eta=z + 1.55, sigma_a=jnp.zeros((n, 3)),
                         beta_m=z + 0.3, beta_n=z + 0.3, alpha=z))
    if scene.has_fourier:
        fc = (jnp.zeros(n, bool), jnp.full(n, -1, jnp.int32))
    ctx = ShadeCtx(
        lobes=zero_lobes(n, channels=channels), t=t, b=b,
        is_hair=None if hc is None else hc[0],
        hair=None if hc is None else hc[1],
        is_fourier=None if fc is None else fc[0],
        fourier_tix=None if fc is None else fc[1])
    # zero_lobes shares its zero buffers across fields; materialize each
    # leaf separately (the +0 forces a fresh buffer per leaf)
    return jax.tree_util.tree_map(lambda a: a + 0, ctx)


def shade_f(scene: SceneData, ctx: ShadeCtx, ns, w_out, w_in,
            want_pdf: bool = False):
    """BSDF value (and optionally pdf) for world directions at a vertex,
    blending hair/fourier lanes (no cosine factor)."""
    nch = ctx.lobes.kd.shape[-1]
    wo_l = to_local(ctx.t, ctx.b, ns, w_out)
    wi_l = to_local(ctx.t, ctx.b, ns, w_in)
    f = bsdf_f(ctx.lobes, wo_l, wi_l)
    pdf = bsdf_pdf(ctx.lobes, wo_l, wi_l) if want_pdf else None
    if ctx.is_hair is not None:
        from tpurt.render.hair import hair_f, hair_pdf

        f = jnp.where(ctx.is_hair[:, None],
                      _lift_f_maybe(hair_f(ctx.hair, wo_l, wi_l), nch), f)
        if want_pdf:
            pdf = jnp.where(ctx.is_hair, hair_pdf(ctx.hair, wo_l, wi_l), pdf)
    if ctx.is_fourier is not None:
        ff, fpdf = _fourier_f_pdf_multi(scene, ctx.fourier_tix, wo_l, wi_l)
        f = jnp.where(ctx.is_fourier[:, None], _lift_f_maybe(ff, nch), f)
        if want_pdf:
            pdf = jnp.where(ctx.is_fourier, fpdf, pdf)
    return (f, pdf) if want_pdf else f


def shade_sample(scene: SceneData, ctx: ShadeCtx, ns, w_out,
                 u_lobe, u1, u2):
    """Sample a continuation direction at a vertex, blending hair/fourier
    lanes exactly as path_radiance does.  Returns
    (wi_world, f, pdf, is_spec, is_trans)."""
    nch = ctx.lobes.kd.shape[-1]
    wo_l = to_local(ctx.t, ctx.b, ns, w_out)
    wi_l, f, pdf, is_spec, is_trans = bsdf_sample(ctx.lobes, wo_l,
                                                  u_lobe, u1, u2)
    if ctx.is_hair is not None:
        from tpurt.render.hair import hair_sample

        wi_h, f_h, pdf_h = hair_sample(ctx.hair, wo_l, u1, u2)
        wi_l = jnp.where(ctx.is_hair[:, None], wi_h, wi_l)
        f = jnp.where(ctx.is_hair[:, None], _lift_f_maybe(f_h, nch), f)
        pdf = jnp.where(ctx.is_hair, pdf_h, pdf)
        is_spec = is_spec & ~ctx.is_hair
        is_trans = is_trans & ~ctx.is_hair
    if ctx.is_fourier is not None:
        from tpurt.render.fourier import fourier_sample

        is_f = ctx.is_fourier
        wi_f = jnp.zeros_like(wi_l)
        f_f = jnp.zeros((wi_l.shape[0], 3), jnp.float32)
        pdf_f = jnp.zeros_like(pdf)
        for k, tbl in enumerate(scene.fr_tables):
            mk = ctx.fourier_tix == k
            wi_k, fk, pk = fourier_sample(tbl, scene.fr_etas[k], wo_l,
                                          u1, u2)
            wi_f = jnp.where(mk[:, None], wi_k, wi_f)
            f_f = jnp.where(mk[:, None], fk, f_f)
            pdf_f = jnp.where(mk, pk, pdf_f)
        wi_l = jnp.where(is_f[:, None], wi_f, wi_l)
        f = jnp.where(is_f[:, None], _lift_f_maybe(f_f, nch), f)
        pdf = jnp.where(is_f, pdf_f, pdf)
        is_spec = is_spec & ~is_f
        is_trans = jnp.where(is_f, wi_l[:, 2] * wo_l[:, 2] < 0, is_trans)
    wi = to_world(ctx.t, ctx.b, ns, wi_l)
    return wi, f, pdf, is_spec, is_trans


def _nee_prepare(scene: SceneData, si: SurfaceInteraction, lobes, u_choice,
                 u_light, strategy: str, alive, hair_ctx=None,
                 fourier_ctx=None):
    """The light-sampling half of _nee: everything EXCEPT the occlusion
    trace.  Returns (contrib, o_sh, wi_sh, t_sh, usable) so the caller
    can fuse the shadow ray into a mixed traversal (intersect_mixed)
    and finish with _nee_resolve."""
    lt = scene.lights
    lidx, pmf = choose_light(lt, u_choice, strategy, p=si.p)
    ls = sample_li(lt, lidx, si.p, u_light)
    nch = lobes.kd.shape[-1]
    li = _lift_illum_maybe(ls.li, nch)

    t, b = _shading_frame(si)
    wo_l = to_local(t, b, si.ns, si.wo)
    wi_l = to_local(t, b, si.ns, ls.wi)
    f = bsdf_f(lobes, wo_l, wi_l) * jnp.abs(dot(ls.wi, si.ns))[:, None]
    scatter_pdf = bsdf_pdf(lobes, wo_l, wi_l)
    if hair_ctx is not None:
        from tpurt.render.hair import hair_f, hair_pdf

        is_hair, hp = hair_ctx
        hf = (_lift_f_maybe(hair_f(hp, wo_l, wi_l), nch)
              * jnp.abs(dot(ls.wi, si.ns))[:, None])
        f = jnp.where(is_hair[:, None], hf, f)
        scatter_pdf = jnp.where(is_hair, hair_pdf(hp, wo_l, wi_l),
                                scatter_pdf)
    if fourier_ctx is not None:
        is_f, ftix = fourier_ctx
        ff, fpdf = _fourier_f_pdf_multi(scene, ftix, wo_l, wi_l)
        f = jnp.where(is_f[:, None],
                      _lift_f_maybe(ff, nch)
                      * jnp.abs(dot(ls.wi, si.ns))[:, None], f)
        scatter_pdf = jnp.where(is_f, fpdf, scatter_pdf)

    usable = (alive & si.valid & (ls.pdf > 0)
              & jnp.any(ls.li > 0, axis=-1) & jnp.any(f > 0, axis=-1))

    # shadow ray: offset endpoints, shortened by ShadowEpsilon
    o_sh = offset_ray_origin(si.p, si.ng, ls.wi, si.p_eps)
    dist = jnp.linalg.norm(ls.p_light - o_sh, axis=-1)
    t_max = jnp.where(usable, dist * (1.0 - SHADOW_EPS) - 2e-3
                      * jnp.maximum(1.0, jnp.max(jnp.abs(ls.p_light), axis=-1)),
                      0.0)

    w = jnp.where(ls.is_delta, 1.0,
                  power_heuristic(1.0, ls.pdf, 1.0, scatter_pdf))
    contrib = f * li * (w / jnp.maximum(ls.pdf * pmf, 1e-20))[:, None]
    return contrib, o_sh, ls.wi, jnp.maximum(t_max, 0.0), usable


def _nee_resolve(contrib, usable, occluded):
    return jnp.where((usable & ~occluded)[:, None], contrib, 0.0)


def _nee(scene: SceneData, si: SurfaceInteraction, lobes, u_choice, u_light,
         strategy: str, alive, hair_ctx=None, fourier_ctx=None, time=None):
    """Next-event estimation: one light sample with MIS weighting
    (UniformSampleOneLight + the light half of EstimateDirect)."""
    contrib, o_sh, wi_sh, t_sh, usable = _nee_prepare(
        scene, si, lobes, u_choice, u_light, strategy, alive,
        hair_ctx=hair_ctx, fourier_ctx=fourier_ctx)
    occluded = intersect_any(scene.geo, o_sh, wi_sh, t_sh, time=time)
    return _nee_resolve(contrib, usable, occluded)


from typing import NamedTuple as _NT


class _BssTblView(_NT):
    rho: jnp.ndarray
    radius: jnp.ndarray
    profile: jnp.ndarray
    rho_eff: jnp.ndarray
    cdf: jnp.ndarray


def _bss_view(scene: SceneData, k: int) -> _BssTblView:
    return _BssTblView(scene.bss_rho[k], scene.bss_radius[k],
                       scene.bss_profile[k], scene.bss_rhoeff[k],
                       scene.bss_cdf[k])


def _bss_sample_sr_multi(scene, tix, sig_ch, rho_ch, u):
    from tpurt.render.bssrdf import bss_sample_sr

    out = jnp.full_like(u, -1.0)
    for k in range(scene.n_bss_tables):
        out = jnp.where(tix == k,
                        bss_sample_sr(_bss_view(scene, k), sig_ch, rho_ch, u),
                        out)
    return out


def _bss_pdf_sr_multi(scene, tix, sig_ch, rho_ch, r):
    from tpurt.render.bssrdf import bss_pdf_sr

    out = jnp.zeros_like(r)
    for k in range(scene.n_bss_tables):
        out = jnp.where(tix == k,
                        bss_pdf_sr(_bss_view(scene, k), sig_ch, rho_ch, r),
                        out)
    return out


def _bss_sr_multi(scene, tix, sigma_t, rho3, r):
    from tpurt.render.bssrdf import bss_sr

    out = jnp.zeros_like(sigma_t)
    for k in range(scene.n_bss_tables):
        out = jnp.where((tix == k)[:, None],
                        bss_sr(_bss_view(scene, k), sigma_t, rho3, r), out)
    return out


BSS_DIMS = 8  # extra sampler dims per bounce when the scene has BSSRDFs


# Max probe-chain steps per Sample_Sp segment (bssrdf.cpp:294-325 marches
# unboundedly).  Non-matching hits consume a step too, so the two-sheet
# geometry (4 same-material crossings + the floor) needs >5; 8 gives
# margin (K=12 measures identically — the historical two-sheet error was
# per-shape material records breaking the chain's identity match, fixed
# in scene/api.py; tests/test_cpp_parity.py::test_two_sheet_bssrdf_probe_bound
# now bounds it at 5% with 0.6% measured).
_BSS_PROBE_K = 8


def _bssrdf_hop(scene: SceneData, si, lobes, t, b, o, d, beta, L, alive,
                specular, prev_pdf, prev_p, is_spec, is_trans,
                sampler, px, py, sidx, sctx, d0, cfg, time=None):
    """The path integrator's subsurface hop (path.cpp:153-174): after a
    transmission sample on a BSSRDF material, importance-sample an exit
    point with Sample_Sp's three-axis probe scheme, weight by Sp/pdf, do
    one extra NEE through the Sw exit lobe, and continue with a
    cosine-sampled direction.

    The probe marches the FULL chord collecting every same-material
    crossing (bssrdf.cpp:294-325 IntersectionChain), chooses one
    uniformly and divides the pdf by nFound — bounded at _BSS_PROBE_K
    crossings per segment (deeper chains truncate into the
    'Subsurface/Probe chain budget exhausted' stat)."""
    from tpurt.render.bssrdf import bss_sw

    n = beta.shape[0]
    idx = jnp.maximum(si.material_id, 0)
    tix = jnp.where(si.material_id >= 0, scene.mt_bss_tix[idx], -1)
    # reference gate: sampled lobe carries BSDF_TRANSMISSION; for smooth
    # subsurface the FresnelSpecular lobe carries it on both branches
    gate = alive & (tix >= 0) & (is_trans | (is_spec & lobes.active[:, 3]))
    row = scene.mt_bss[idx]
    sigma_t = row[:, 0:3]
    rho3 = row[:, 3:6]
    eta = row[:, 6]

    u1 = sampler.dim_dyn(px, py, sidx, d0 + 7, sctx)
    u2a = sampler.dim_dyn(px, py, sidx, d0 + 8, sctx)
    u2b = sampler.dim_dyn(px, py, sidx, d0 + 9, sctx)

    # choose projection axis (Sample_Sp: 1/2 ns, 1/4 ss, 1/4 ts)
    ns = si.ns
    c1 = (u1 < 0.5)[:, None]
    c2 = ((u1 >= 0.5) & (u1 < 0.75))[:, None]
    vx = jnp.where(c1, t, jnp.where(c2, b, ns))
    vy = jnp.where(c1, b, jnp.where(c2, ns, t))
    vz = jnp.where(c1, ns, jnp.where(c2, t, b))
    u1r = jnp.where(u1 < 0.5, u1 * 2,
                    jnp.where(u1 < 0.75, (u1 - 0.5) * 4, (u1 - 0.75) * 4))
    ch = jnp.clip((u1r * 3).astype(jnp.int32), 0, 2)
    sig_ch = jnp.take_along_axis(sigma_t, ch[:, None], axis=-1)[:, 0]
    rho_ch = jnp.take_along_axis(rho3, ch[:, None], axis=-1)[:, 0]

    r = _bss_sample_sr_multi(scene, tix, sig_ch, rho_ch, u2a)
    r_max = _bss_sample_sr_multi(scene, tix, sig_ch, rho_ch,
                                 jnp.full(n, 0.999, jnp.float32))
    ok = gate & (r >= 0) & (r < r_max) & (sig_ch > 0)
    ell = 2.0 * jnp.sqrt(jnp.maximum(r_max * r_max - r * r, 0.0))
    phi = 2.0 * np.pi * u2b
    base = (si.p + r[:, None] * (vx * jnp.cos(phi)[:, None]
                                 + vy * jnp.sin(phi)[:, None])
            - 0.5 * ell[:, None] * vz)

    # IntersectionChain (bssrdf.cpp:294-325): march the full probe
    # segment collecting every same-material crossing (non-matching hits
    # are stepped through), then choose ONE uniformly and divide the pdf
    # by nFound.  _BSS_PROBE_K bounds the compiled march; deeper chains
    # are truncated (counted in the overflow stat).
    u_sel = u1r * 3.0 - ch.astype(jnp.float32)  # pbrt's thrice-remapped u1
    o_cur = base
    rem = jnp.where(ok, ell, 0.0)
    cand_t = []
    cand_prim = []
    cand_b0 = []
    cand_b1 = []
    cand_ok = []
    t_off = jnp.zeros(n, jnp.float32)
    exhausted = jnp.zeros(n, bool)
    for _k in range(_BSS_PROBE_K):
        h_k = intersect_closest(scene.geo, o_cur, vz, rem, time=time)
        valid_k = h_k.prim >= 0
        mat_k = scene.geo.material_id[jnp.maximum(h_k.prim, 0)]
        match_k = valid_k & (mat_k == si.material_id)
        cand_t.append(jnp.where(valid_k, t_off + h_k.t, INF))
        cand_prim.append(jnp.where(valid_k, h_k.prim, -1))
        cand_b0.append(h_k.b0)
        cand_b1.append(h_k.b1)
        cand_ok.append(match_k)
        # step past the hit (SpawnRayTo re-spawn; magnitude-relative
        # epsilon along the probe direction)
        p_k = o_cur + h_k.t[:, None] * vz
        eps = 1e-4 * jnp.maximum(1.0, jnp.max(jnp.abs(p_k), axis=-1))
        o_next = p_k + eps[:, None] * vz
        adv = jnp.where(valid_k, h_k.t + eps, rem)
        rem = jnp.maximum(rem - adv, 0.0)
        t_off = t_off + jnp.where(valid_k, adv, 0.0)
        o_cur = jnp.where(valid_k[:, None], o_next, o_cur)
        exhausted = valid_k & (rem > 0)
    _report_budget_overflow("Subsurface/Probe chain budget exhausted",
                            exhausted)
    match_m = jnp.stack(cand_ok, axis=0)  # (K, N)
    n_found = jnp.sum(match_m, axis=0).astype(jnp.int32)
    ok = ok & (n_found > 0)
    sel = jnp.clip((u_sel * n_found.astype(jnp.float32)).astype(jnp.int32),
                   0, jnp.maximum(n_found - 1, 0))
    # index of the sel-th matching candidate
    rank = jnp.cumsum(match_m.astype(jnp.int32), axis=0) - 1
    pick = match_m & (rank == sel[None, :])  # (K, N) one-hot

    def _sel(stk, fill):
        v = jnp.stack(stk, axis=0)
        return jnp.sum(jnp.where(pick, v, 0), axis=0) + jnp.where(
            jnp.any(pick, axis=0), 0, fill)

    hit = Hit(t=_sel(cand_t, INF),
              prim=jnp.sum(jnp.where(pick, jnp.stack(cand_prim, 0), 0),
                           axis=0) + jnp.where(jnp.any(pick, 0), 0, -1),
              b0=_sel(cand_b0, 0.0), b1=_sel(cand_b1, 0.0))
    pi_si = compute_interaction(scene.geo, hit, base, vz,
                                tangents=scene.has_tangents, time=time)
    ok = ok & pi_si.valid & (pi_si.material_id == si.material_id)

    # Pdf_Sp: all three axes x three channels (bssrdf.cpp:327-348)
    dvec = si.p - pi_si.p
    dl = to_local(t, b, ns, dvec)
    nl = to_local(t, b, ns, pi_si.ng)
    rproj = [jnp.sqrt(dl[:, 1] ** 2 + dl[:, 2] ** 2),
             jnp.sqrt(dl[:, 2] ** 2 + dl[:, 0] ** 2),
             jnp.sqrt(dl[:, 0] ** 2 + dl[:, 1] ** 2)]
    pdf_sp = jnp.zeros(n, jnp.float32)
    for ax, axp in ((0, 0.25), (1, 0.25), (2, 0.5)):
        for c in range(3):
            pdf_sp = pdf_sp + (_bss_pdf_sr_multi(
                scene, tix, sigma_t[:, c], rho3[:, c], rproj[ax])
                * jnp.abs(nl[:, ax]) * (axp / 3.0))
    pdf_sp = pdf_sp / jnp.maximum(n_found, 1).astype(jnp.float32)
    dist = jnp.linalg.norm(dvec, axis=-1)
    sp = _bss_sr_multi(scene, tix, sigma_t, rho3, dist)
    ok = ok & (pdf_sp > 0) & jnp.any(sp > 0, axis=-1)
    beta_b = beta * sp / jnp.maximum(pdf_sp, 1e-20)[:, None]

    # extra NEE at the exit point through the Sw lobe (path.cpp:163)
    lt = scene.lights
    uc = sampler.dim_dyn(px, py, sidx, d0 + 10, sctx)
    ul = jnp.stack([sampler.dim_dyn(px, py, sidx, d0 + 11, sctx),
                    sampler.dim_dyn(px, py, sidx, d0 + 12, sctx)], axis=-1)
    lidx, pmf = choose_light(lt, uc, cfg.light_strategy, p=pi_si.p)
    ls = sample_li(lt, lidx, pi_si.p, ul)
    cos_wi = dot(ls.wi, pi_si.ns)
    f_sw = bss_sw(eta, cos_wi) * eta * eta * jnp.abs(cos_wi)
    refl_ok = dot(ls.wi, pi_si.ng) * dot(pi_si.ns, pi_si.ng) > 0
    usable = (ok & refl_ok & (ls.pdf > 0) & (f_sw > 0)
              & jnp.any(ls.li > 0, axis=-1))
    o_sh = offset_ray_origin(pi_si.p, pi_si.ng, ls.wi)
    dist_l = jnp.linalg.norm(ls.p_light - o_sh, axis=-1)
    t_sh = jnp.where(usable, dist_l * (1.0 - SHADOW_EPS) - 2e-3
                     * jnp.maximum(1.0, jnp.max(jnp.abs(ls.p_light), axis=-1)),
                     0.0)
    occ = intersect_any(scene.geo, o_sh, ls.wi, jnp.maximum(t_sh, 0.0),
                        time=time)
    sc_pdf = jnp.maximum(cos_wi, 0.0) / np.pi
    w_mis = jnp.where(ls.is_delta, 1.0,
                      power_heuristic(1.0, ls.pdf, 1.0, sc_pdf))
    Ld = (f_sw * w_mis / jnp.maximum(ls.pdf * pmf, 1e-20))[:, None] * ls.li
    L = L + jnp.where((usable & ~occ)[:, None], beta_b * Ld, 0.0)

    # indirect continuation: cosine-sample the Sw lobe (path.cpp:167)
    u3a = sampler.dim_dyn(px, py, sidx, d0 + 13, sctx)
    u3b = sampler.dim_dyn(px, py, sidx, d0 + 14, sctx)
    from tpurt.render.sampling_warps import cosine_sample_hemisphere

    wi_l = cosine_sample_hemisphere(u3a, u3b)
    tp, bp = _shading_frame(pi_si)
    wi_w = to_world(tp, bp, pi_si.ns, wi_l)
    cos_c = jnp.maximum(wi_l[:, 2], 0.0)
    ok = ok & (cos_c > 1e-7)
    # f * |cos| / pdf with pdf = cos/pi -> Sw * eta^2 * pi
    beta_b = beta_b * (bss_sw(eta, cos_c) * eta * eta * np.pi)[:, None]

    g_ok = gate & ok
    alive = jnp.where(gate, g_ok, alive)
    beta = jnp.where(g_ok[:, None], beta_b, beta)
    o = jnp.where(g_ok[:, None], offset_ray_origin(pi_si.p, pi_si.ng, wi_w), o)
    d = jnp.where(g_ok[:, None], wi_w, d)
    prev_pdf = jnp.where(g_ok, jnp.maximum(cos_c / np.pi, 1e-20), prev_pdf)
    prev_p = jnp.where(g_ok[:, None], pi_si.p, prev_p)
    specular = jnp.where(gate, False, specular)
    return o, d, beta, L, alive, specular, prev_pdf, prev_p


def _tex_footprint(si, hit_t, camera):
    """Attach uv-space MIP filter widths from the isotropic ray-footprint
    model (world width ~= fp_base + t*fp_slope — the per-segment cone
    approximation used for non-camera bounces; camera hits get TRUE ray
    differentials via _tex_differentials)."""
    w_world = camera.fp_base + jnp.where(si.valid, hit_t, 0.0) * camera.fp_slope
    return si._replace(
        tex_wu=w_world / jnp.maximum(
            jnp.linalg.norm(si.dpdu, axis=-1), 1e-9),
        tex_wv=w_world / jnp.maximum(
            jnp.linalg.norm(si.dpdv, axis=-1), 1e-9))


def camera_ray_differentials(camera, sampler, p_film, p_lens, l_time, spp):
    """Camera rays offset one pixel in x and in y (the reference's
    Camera::GenerateRayDifferential default, camera.cpp:46-66 — the
    perspective closed form at perspective.cpp:95-135 equals this), with
    SamplerIntegrator's ScaleDifferentials(1/sqrt(spp)) applied
    (integrator.cpp:285)."""
    o, d, _ = camera.generate_rays(p_film, p_lens, l_time)
    dx = jnp.asarray([1.0, 0.0], jnp.float32)
    dy = jnp.asarray([0.0, 1.0], jnp.float32)
    rx_o, rx_d, _ = camera.generate_rays(p_film + dx, p_lens, l_time)
    ry_o, ry_d, _ = camera.generate_rays(p_film + dy, p_lens, l_time)
    s = 1.0 / np.sqrt(max(spp, 1))  # no floor: integrator.cpp:285
    return (o + (rx_o - o) * s, d + (rx_d - d) * s,
            o + (ry_o - o) * s, d + (ry_d - d) * s)


def _tex_differentials(si, rx_o, rx_d, ry_o, ry_d):
    """SurfaceInteraction::ComputeDifferentials (interaction.cpp:125-160):
    intersect the differential rays with the tangent plane at p, then
    solve [dpdu dpdv] @ (du, dv) = dpd{x,y} for the uv screen
    derivatives.  Uses the least-squares Gram-matrix solve (the reference
    drops the axis of largest |n| — same system, this form is
    better-conditioned for near-diagonal normals).  Returns
    (dst0, dst1, ok) with dst0 = (du/dx, dv/dx)."""
    n = si.ng
    d_plane = dot(n, si.p)

    def plane_hit(ro, rd):
        denom = dot(n, rd)
        t = (d_plane - dot(n, ro)) / jnp.where(denom == 0, 1e-9, denom)
        return ro + t[:, None] * rd, jnp.abs(denom) > 1e-9

    px, okx = plane_hit(rx_o, rx_d)
    py, oky = plane_hit(ry_o, ry_d)
    dpdx = px - si.p
    dpdy = py - si.p
    g11 = dot(si.dpdu, si.dpdu)
    g12 = dot(si.dpdu, si.dpdv)
    g22 = dot(si.dpdv, si.dpdv)
    det = g11 * g22 - g12 * g12
    ok = okx & oky & (jnp.abs(det) > 1e-18) & si.valid
    inv_det = 1.0 / jnp.where(jnp.abs(det) > 1e-18, det, 1.0)

    def solve(dp):
        b1 = dot(dp, si.dpdu)
        b2 = dot(dp, si.dpdv)
        return jnp.stack([(g22 * b1 - g12 * b2) * inv_det,
                          (g11 * b2 - g12 * b1) * inv_det], axis=-1)

    return solve(dpdx), solve(dpdy), ok


def _camera_setup(sampler, camera, px, py, sidx, crop_xy):
    # one lane context per wavefront: hoists the sampler's per-lane index
    # computation (for halton, the offsets[] gather) out of every dim call
    sctx = sampler.lane_ctx(px, py, sidx)
    fx, fy = sampler.film_offset(px, py, sidx, sctx)
    p_film = jnp.stack([px.astype(jnp.float32) + fx,
                        py.astype(jnp.float32) + fy], axis=-1)
    # shutter time (camera.h:72 CameraSample; sampler consumes the dim
    # whether or not the camera is animated, like GetCameraSample)
    u_time = sampler.dim(px, py, sidx, 2, sctx)
    time = (camera.shutter_open
            + u_time * (camera.shutter_close - camera.shutter_open))
    p_lens = jnp.stack([sampler.dim(px, py, sidx, 3, sctx),
                        sampler.dim(px, py, sidx, 4, sctx)], axis=-1)
    o, d, ray_w = camera.generate_rays(p_film, p_lens, time)
    p_film_crop = p_film - jnp.asarray(crop_xy, jnp.float32)
    return p_film, p_film_crop, p_lens, o, d, ray_w, sctx, time


def path_bounce_init(scene: SceneData, sampler, camera, px, py, sidx,
                     cfg: IntegratorConfig, crop_xy=(0, 0),
                     texture_eval=None) -> Dict[str, Any]:
    """Build the per-lane wavefront state for path tracing: camera setup +
    the bounce-0 closest hit.  EVERY leaf of the returned dict is per-lane
    (leading axis N), so a driver may COMPACT the wavefront between
    bounces by gathering rows (render.driver's bucket compaction)."""
    p_film, p_film_crop, p_lens, o, d, ray_w, sctx, l_time = _camera_setup(
        sampler, camera, px, py, sidx, crop_xy)
    nch = 60 if cfg.spectral else 3

    rx_o = rx_d = ry_o = ry_d = None
    use_ewa = scene.has_texfilter and get_config().texture_filter == "ewa"
    if use_ewa:
        rx_o, rx_d, ry_o, ry_d = camera_ray_differentials(
            camera, sampler, p_film, p_lens, l_time, sampler.spp)

    # all carries derived from lane data so they carry the same varying-axes
    # type as the body's outputs under shard_map
    v0 = px.astype(jnp.float32) * 0.0  # (n,) varying zero
    v03 = v0[:, None] * jnp.ones((1, 3), jnp.float32)
    v0c = v0[:, None] * jnp.ones((1, nch), jnp.float32)
    # bounce 0's closest runs before the bounce loop (the body shades the
    # carried hit, then traces the NEXT one fused with the shadow ray)
    hit0 = intersect_closest(scene.geo, o, d, v0 + INF, time=l_time)
    return dict(
        px=px, py=py, sidx=sidx, sctx=sctx, time=l_time,
        rx_o=rx_o, rx_d=rx_d, ry_o=ry_o, ry_d=ry_d,
        p_film=p_film, p_film_crop=p_film_crop, p_lens=p_lens, ray_w=ray_w,
        o=o, d=d, hit_t=hit0.t, hit_prim=hit0.prim, hit_b0=hit0.b0,
        hit_b1=hit0.b1, beta=v0c + 1.0, L=v0c, alive=px == px,
        specular=px != px, prev_pdf=v0 + 1.0, prev_p=o,
        eta_scale=v0 + 1.0, n0=v03, p0=v03, n1=v03, p1=v03)


def path_bounce_step(scene: SceneData, sampler, camera,
                     cfg: IntegratorConfig, state: Dict[str, Any], bounce,
                     texture_eval=None, specular_only: bool = False):
    """One shade-then-trace bounce over the lane-state dict (see
    path_bounce_init).  `bounce` is a traced int32 scalar, so one compiled
    executable per lane count serves every bounce.  Returns
    (state, n_alive).

    Shade-then-trace bounce structure: each call shades the hit CARRIED
    from the previous one, then issues the next bounce's closest ray
    together with this bounce's NEE shadow ray.  With fuse_shadow_rays
    they share ONE mixed traversal (per-lane any-hit; the gather engine
    amortizes with batch size and the schedule's fixed costs halve) —
    1 + (maxdepth+1) traversal calls per path instead of
    2*(maxdepth+1).  Results are bit-identical either way.
    """
    px, py, sidx = state["px"], state["py"], state["sidx"]
    sctx, l_time = state["sctx"], state["time"]
    rx_o, rx_d = state["rx_o"], state["rx_d"]
    ry_o, ry_d = state["ry_o"], state["ry_d"]
    n = px.shape[0]
    inf_L, _ = _infinite_L(scene.lights)
    has_inf = scene.lights.has_infinite
    uniform_strategy = cfg.light_strategy not in ("power", "spatial")
    nch = 60 if cfg.spectral else 3
    use_ewa = scene.has_texfilter and get_config().texture_filter == "ewa"
    fuse = get_config().fuse_shadow_rays

    (o, d, hit_t, hit_prim, hit_b0, hit_b1, beta, L, alive, specular,
     prev_pdf, prev_p, eta_scale, n0, p0, n1, p1) = (
        state["o"], state["d"], state["hit_t"], state["hit_prim"],
        state["hit_b0"], state["hit_b1"], state["beta"], state["L"],
        state["alive"], state["specular"], state["prev_pdf"],
        state["prev_p"], state["eta_scale"], state["n0"], state["p0"],
        state["n1"], state["p1"])

    hit = Hit(t=hit_t, prim=hit_prim, b0=hit_b0, b1=hit_b1)
    si = compute_interaction(scene.geo, hit, o, d,
                             tangents=scene.has_tangents,
                             dpduv=scene.has_bump or scene.has_texfilter,
                             time=l_time)
    if scene.has_texfilter:
        si = _tex_footprint(si, hit.t, camera)
    if use_ewa:
        # camera hits: TRUE ray differentials -> anisotropic EWA
        # derivative vectors; deeper bounces keep the isotropic cone
        # (the reference point-samples non-specular indirect lookups;
        # the cone is a strict quality superset)
        dd0, dd1, okd = _tex_differentials(si, rx_o, rx_d, ry_o, ry_d)
        use = ((bounce == 0) & okd)[:, None]
        zw = jnp.zeros_like(si.tex_wu)
        si = si._replace(
            tex_dst0=jnp.where(use, dd0,
                               jnp.stack([si.tex_wu, zw], -1)),
            tex_dst1=jnp.where(use, dd1,
                               jnp.stack([zw, si.tex_wv], -1)))
    if scene.has_bump and getattr(texture_eval, "bump", None) is not None:
        si = texture_eval.bump(si)

    if cfg.capture_features:
        # RPF captures the GEOMETRIC normal + hit point at bounces 0/1,
        # after the escape check (rpf.cpp:851-857 uses isect.n/isect.p)
        m0 = ((bounce == 0) & alive & si.valid)[:, None]
        m1 = ((bounce == 1) & alive & si.valid)[:, None]
        n0 = jnp.where(m0, si.ng, n0)
        p0 = jnp.where(m0, si.p, p0)
        n1 = jnp.where(m1, si.ng, n1)
        p1 = jnp.where(m1, si.p, p1)

    # ---- emitted light ----
    Le, lrow = _emitted(scene, si)
    Le = _lift_illum_maybe(Le, nch)
    lrow_c = jnp.maximum(lrow, 0)
    light_pdf = pdf_li_from_hit(scene.lights, lrow_c, prev_p, d, si.p, si.ng)
    pmf = _choice_pmf_at(scene, lrow_c, cfg.light_strategy, n, prev_p)
    w_mis = power_heuristic(1.0, prev_pdf, 1.0, light_pdf * pmf)
    w_emit = jnp.where((bounce == 0) | specular, 1.0, w_mis)
    L = L + jnp.where((alive & si.valid)[:, None],
                      beta * Le * w_emit[:, None], 0.0)

    # escaped rays -> infinite lights
    if has_inf:
        if uniform_strategy:
            pmf_inf = 1.0 / scene.lights.n_lights
        else:
            inf_mask = scene.lights.kind == LIGHT_INFINITE
            pmf_inf = jnp.sum(jnp.where(inf_mask, scene.lights.power_pmf, 0.0))
        w_mis_inf = power_heuristic(
            1.0, prev_pdf, 1.0, _escape_pdf(scene.lights, d) * pmf_inf)
        w_inf = jnp.where((bounce == 0) | specular, 1.0, w_mis_inf)
        Le_inf = _lift_illum_maybe(
            _escape_radiance(scene.lights, inf_L, d), nch)
        L = L + jnp.where((alive & ~si.valid)[:, None],
                          beta * Le_inf * w_inf[:, None], 0.0)

    alive = alive & si.valid & (bounce < cfg.max_depth)

    overrides = texture_eval(si) if texture_eval is not None else None
    mrow = scene.mt_table[jnp.maximum(si.material_id, 0)]
    lobes = fetch_lobes(scene.mt_table, si.material_id, overrides,
                        has_mix=scene.mt_mix is not None,
                        channels=nch, row=mrow)
    hair_ctx = _hair_ctx(scene, si, mrow)
    fourier_ctx = _fourier_ctx(scene, si, mrow)
    any_lobe = jnp.any(lobes.active, axis=-1)
    has_smooth = lobes.active[:, 0] | lobes.active[:, 1]
    if hair_ctx is not None:
        any_lobe = any_lobe | hair_ctx[0]
        has_smooth = has_smooth | hair_ctx[0]
    if fourier_ctx is not None:
        any_lobe = any_lobe | fourier_ctx[0]
        has_smooth = has_smooth | fourier_ctx[0]
    alive = alive & any_lobe

    # ---- NEE ----
    d0 = CAMERA_DIMS + bounce * (DIMS_PER_BOUNCE
                                 + (BSS_DIMS if scene.has_bssrdf else 0))
    u_choice = sampler.dim_dyn(px, py, sidx, d0, sctx)
    u_light = jnp.stack([sampler.dim_dyn(px, py, sidx, d0 + 1, sctx),
                         sampler.dim_dyn(px, py, sidx, d0 + 2, sctx)], axis=-1)
    nee_c, o_sh, wi_sh, t_sh, nee_ok = _nee_prepare(
        scene, si, lobes, u_choice, u_light, cfg.light_strategy,
        alive & has_smooth, hair_ctx, fourier_ctx)
    beta_nee = beta  # pre-continuation throughput scales the NEE term

    # ---- BSDF sampling ----
    u_lobe = sampler.dim_dyn(px, py, sidx, d0 + 3, sctx)
    u1 = sampler.dim_dyn(px, py, sidx, d0 + 4, sctx)
    u2 = sampler.dim_dyn(px, py, sidx, d0 + 5, sctx)
    t, b = _shading_frame(si)
    wo_l = to_local(t, b, si.ns, si.wo)
    wi_l, f, pdf, is_spec, is_trans = bsdf_sample(lobes, wo_l, u_lobe, u1, u2)
    if hair_ctx is not None:
        from tpurt.render.hair import hair_sample

        is_hair, hp = hair_ctx
        wi_h, f_h, pdf_h = hair_sample(hp, wo_l, u1, u2)
        wi_l = jnp.where(is_hair[:, None], wi_h, wi_l)
        f = jnp.where(is_hair[:, None], _lift_f_maybe(f_h, nch), f)
        pdf = jnp.where(is_hair, pdf_h, pdf)
        is_spec = is_spec & ~is_hair
        is_trans = is_trans & ~is_hair
    if fourier_ctx is not None:
        from tpurt.render.fourier import fourier_sample

        is_f, ftix = fourier_ctx
        wi_f = jnp.zeros_like(wi_l)
        f_f = jnp.zeros((n, 3), jnp.float32)
        pdf_f = jnp.zeros_like(pdf)
        for k, tbl in enumerate(scene.fr_tables):
            mk = ftix == k
            wi_k, fk, pk = fourier_sample(tbl, scene.fr_etas[k], wo_l,
                                          u1, u2)
            wi_f = jnp.where(mk[:, None], wi_k, wi_f)
            f_f = jnp.where(mk[:, None], fk, f_f)
            pdf_f = jnp.where(mk, pk, pdf_f)
        wi_l = jnp.where(is_f[:, None], wi_f, wi_l)
        f = jnp.where(is_f[:, None], _lift_f_maybe(f_f, nch), f)
        pdf = jnp.where(is_f, pdf_f, pdf)
        is_spec = is_spec & ~is_f
        is_trans = jnp.where(is_f, wi_l[:, 2] * wo_l[:, 2] < 0, is_trans)
    wi = to_world(t, b, si.ns, wi_l)

    ok = alive & (pdf > 0) & jnp.any(f > 0, axis=-1)
    if specular_only:
        ok = ok & is_spec
    beta = jnp.where(ok[:, None],
                     beta * f * (jnp.abs(dot(wi, si.ns))
                                 / jnp.maximum(pdf, 1e-20))[:, None], beta)
    # refraction radiance scaling bookkeeping (path.cpp etaScale)
    eta2 = jnp.where(dot(si.wo, si.ng) > 0, lobes.eta * lobes.eta,
                     1.0 / jnp.maximum(lobes.eta * lobes.eta, 1e-9))
    eta_scale = jnp.where(ok & is_spec & is_trans, eta_scale * eta2,
                          eta_scale)
    alive = ok
    specular = is_spec
    prev_pdf = jnp.maximum(pdf, 1e-20)
    prev_p = si.p
    o = offset_ray_origin(si.p, si.ng, wi, si.p_eps)
    d = wi

    # ---- subsurface hop (path.cpp:153-174) ----
    if scene.has_bssrdf and not specular_only:
        (o, d, beta, L, alive, specular, prev_pdf, prev_p) = _bssrdf_hop(
            scene, si, lobes, t, b, o, d, beta, L, alive, specular,
            prev_pdf, prev_p, is_spec, is_trans,
            sampler, px, py, sidx, sctx, d0, cfg, time=l_time)

    # ---- Russian roulette (path.cpp: bounces > 3) ----
    u_rr = sampler.dim_dyn(px, py, sidx, d0 + 6, sctx)
    rr_beta = jnp.max(beta, axis=-1) * eta_scale
    q = jnp.maximum(0.05, 1.0 - rr_beta)
    do_rr = (rr_beta < cfg.rr_threshold) & (bounce > 3) & alive
    killed = do_rr & (u_rr < q)
    alive = alive & ~killed
    beta = jnp.where((do_rr & ~killed)[:, None],
                     beta / jnp.maximum(1.0 - q, 1e-6)[:, None], beta)

    # ---- trace: next bounce's closest ray + this bounce's shadow ----
    t_next = jnp.where(alive, INF, 0.0)
    if fuse:
        o_f = jnp.concatenate([o, o_sh], axis=0)
        d_f = jnp.concatenate([d, wi_sh], axis=0)
        tm_f = jnp.concatenate([t_next, t_sh], axis=0)
        am_f = jnp.concatenate([jnp.zeros(n, bool), jnp.ones(n, bool)])
        tf = (jnp.concatenate([l_time, l_time], axis=0)
              if l_time is not None else None)
        h_f = intersect_mixed(scene.geo, o_f, d_f, tm_f, am_f, time=tf)
        occluded = h_f.prim[n:] >= 0
        hit_next = Hit(t=h_f.t[:n], prim=h_f.prim[:n],
                       b0=h_f.b0[:n], b1=h_f.b1[:n])
    else:
        occluded = intersect_any(scene.geo, o_sh, wi_sh, t_sh,
                                 time=l_time)
        hit_next = intersect_closest(scene.geo, o, d, t_next,
                                     time=l_time)
    L = L + beta_nee * _nee_resolve(nee_c, nee_ok, occluded)

    state = dict(state, o=o, d=d, hit_t=hit_next.t,
                 hit_prim=hit_next.prim, hit_b0=hit_next.b0,
                 hit_b1=hit_next.b1, beta=beta, L=L, alive=alive,
                 specular=specular, prev_pdf=prev_pdf, prev_p=prev_p,
                 eta_scale=eta_scale, n0=n0, p0=p0, n1=n1, p1=p1)
    return state, jnp.sum(alive)


def path_radiance(scene: SceneData, sampler, camera, px, py, sidx,
                  cfg: IntegratorConfig, crop_xy=(0, 0),
                  texture_eval=None, specular_only: bool = False
                  ) -> Dict[str, Any]:
    """Trace one wavefront of camera samples.  With specular_only=True this
    is the directlighting/whitted integrator (NEE + specular continuation);
    otherwise the full path integrator.

    px, py: (N,) global pixel coords; sidx: (N,) sample numbers.
    Thin lax.scan wrapper over path_bounce_init/path_bounce_step; the
    driver's compacted mode calls those directly instead so it can shrink
    the wavefront between bounces.
    """
    st0 = path_bounce_init(scene, sampler, camera, px, py, sidx, cfg,
                           crop_xy, texture_eval)

    def body(carry, bounce):
        return path_bounce_step(scene, sampler, camera, cfg, carry, bounce,
                                texture_eval=texture_eval,
                                specular_only=specular_only)

    carry, alive_hist = jax.lax.scan(
        body, st0, jnp.arange(cfg.max_depth + 1, dtype=jnp.int32))
    L = _to_rgb_maybe(carry["L"], cfg)
    # per-bounce survivor counts (Integrator/Path-length distribution
    # analog of the reference's STAT_INT_DISTRIBUTION "Path length");
    # the driver ignores this key, perf probes read it.
    out = {"p_film": carry["p_film_crop"], "L": L,
           "ray_weight": carry["ray_w"], "alive_per_bounce": alive_hist}
    if cfg.capture_features:
        out["features"] = {"n0": carry["n0"], "p0": carry["p0"],
                           "n1": carry["n1"], "p1": carry["p1"]}
        out["p_lens"] = carry["p_lens"]
    return out


def direct_radiance(scene, sampler, camera, px, py, sidx, cfg,
                    crop_xy=(0, 0), texture_eval=None):
    """DirectLightingIntegrator analog (directlighting.cpp): emitted + NEE,
    specular-only continuation up to max_depth."""
    return path_radiance(scene, sampler, camera, px, py, sidx, cfg,
                         crop_xy, texture_eval, specular_only=True)


def whitted_radiance(scene, sampler, camera, px, py, sidx, cfg,
                     crop_xy=(0, 0), texture_eval=None):
    """WhittedIntegrator analog (integrators/whitted.cpp)."""
    return path_radiance(scene, sampler, camera, px, py, sidx, cfg,
                         crop_xy, texture_eval, specular_only=True)


def ao_radiance(scene: SceneData, sampler, camera, px, py, sidx,
                cfg: IntegratorConfig, crop_xy=(0, 0), texture_eval=None):
    """AOIntegrator analog (integrators/ao.cpp): cosine-weighted visibility."""
    n = px.shape[0]
    p_film, p_film_crop, p_lens, o, d, ray_w, sctx, l_time = _camera_setup(
        sampler, camera, px, py, sidx, crop_xy)
    hit = intersect_closest(scene.geo, o, d, INF)
    si = compute_interaction(scene.geo, hit, o, d)
    # flip normal to the ray side (ao.cpp Faceforward(n, -ray.d))
    ns = jnp.where(dot(si.ns, si.wo)[:, None] < 0, -si.ns, si.ns)
    t, b = build_onb(ns)

    def ao_body(acc, k):
        u1 = sampler.dim_dyn(px, py, sidx, 5 + 2 * k, sctx)
        u2 = sampler.dim_dyn(px, py, sidx, 6 + 2 * k, sctx)
        if cfg.ao_cos_sample:
            w_l = cosine_sample_hemisphere(u1, u2)
            weight = jnp.ones((n,), jnp.float32)
        else:
            z = u1
            r = jnp.sqrt(jnp.maximum(0.0, 1 - z * z))
            phi = 2 * np.pi * u2
            w_l = jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)
            weight = 2.0 * w_l[:, 2]
        w = to_world(t, b, ns, w_l)
        o_sh = offset_ray_origin(si.p, si.ng, w, si.p_eps)
        occ = intersect_any(scene.geo, o_sh, w,
                            jnp.full((n,), 1e8, jnp.float32))
        return acc + jnp.where(si.valid & ~occ, weight, 0.0), None

    acc, _ = jax.lax.scan(ao_body, px.astype(jnp.float32) * 0.0,
                          jnp.arange(cfg.ao_samples, dtype=jnp.int32))
    L = jnp.repeat((acc / cfg.ao_samples)[:, None], 3, axis=-1)
    return {"p_film": p_film_crop, "L": L, "ray_weight": ray_w}




# ---------------------------------------------------------------------------
# volumetric path tracing (integrators/volpath.cpp + media/homogeneous.cpp)
# ---------------------------------------------------------------------------

DIMS_PER_BOUNCE_VOL = 9  # + medium channel/distance dims


def _hg_phase(cos_theta, g):
    """Henyey-Greenstein phase function (medium.h PhaseHG), taking the
    cosine between the PROPAGATION direction and wi (forward scattering
    peaks at +1 for g > 0; the reference's PhaseHG takes Dot(wo, wi)
    with wo reversed, hence its +2g term)."""
    denom = 1.0 + g * g - 2.0 * g * cos_theta
    return (1.0 - g * g) / (4.0 * np.pi * denom
                            * jnp.sqrt(jnp.maximum(denom, 1e-9)))


def _hg_sample(d, g, u1, u2):
    """Sample a scattered direction about propagation direction d
    (HenyeyGreenstein::Sample_p)."""
    g_safe = jnp.where(jnp.abs(g) < 1e-3, 1e-3, g)
    sqr = (1.0 - g * g) / (1.0 - g + 2.0 * g * u1)
    cos_hg = (1.0 + g * g - sqr * sqr) / (2.0 * g_safe)
    cos_theta = jnp.where(jnp.abs(g) < 1e-3, 1.0 - 2.0 * u1,
                          jnp.clip(cos_hg, -1.0, 1.0))
    sin_theta = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_theta * cos_theta))
    phi = 2.0 * np.pi * u2
    t, b = build_onb(d)
    local = jnp.stack([sin_theta * jnp.cos(phi), sin_theta * jnp.sin(phi),
                       cos_theta], axis=-1)
    return to_world(t, b, d, local), _hg_phase(cos_theta, g)


def _track_u(lane, bounce, step, salt: int):
    """Stateless uniform for the grid-tracking loops: fmix-style hash of
    (lane, bounce, step, salt).  The reference draws these from the
    sampler's 1D stream inside a data-dependent while loop (grid.cpp
    Sample/Tr) — a counter hash is the fixed-shape equivalent."""
    h = (lane.astype(jnp.uint32) * jnp.uint32(0x9E3779B1)
         ^ (bounce.astype(jnp.uint32) + jnp.uint32(salt)) * jnp.uint32(0x85EBCA77)
         ^ step.astype(jnp.uint32) * jnp.uint32(0xC2B2AE3D))
    h ^= h >> 16
    h *= jnp.uint32(0x7FEB352D)
    h ^= h >> 15
    h *= jnp.uint32(0x846CA68B)
    h ^= h >> 16
    return h.astype(jnp.float32) * jnp.float32(2 ** -32)


def _grid_density_at(scene: SceneData, med_c, p_med):
    """Trilinear density lookup in medium space (GridDensityMedium::Density
    / D, grid.h:74-107).  p_med: (N,3) in [0,1]^3."""
    dims = scene.med_grid_dims[med_c]  # (N,3) nx,ny,nz
    off = scene.med_grid_off[med_c]
    ps = p_med * dims.astype(jnp.float32) - 0.5
    pi = jnp.floor(ps).astype(jnp.int32)
    dl = ps - pi.astype(jnp.float32)

    def d_at(ix, iy, iz):
        inb = ((ix >= 0) & (ix < dims[:, 0]) & (iy >= 0) & (iy < dims[:, 1])
               & (iz >= 0) & (iz < dims[:, 2]))
        idx = off + (jnp.maximum(iz, 0) * dims[:, 1]
                     + jnp.maximum(iy, 0)) * dims[:, 0] + jnp.maximum(ix, 0)
        return jnp.where(inb, scene.med_density[
            jnp.clip(idx, 0, scene.med_density.shape[0] - 1)], 0.0)

    x, y, z = pi[:, 0], pi[:, 1], pi[:, 2]
    dx, dy, dz = dl[:, 0], dl[:, 1], dl[:, 2]
    d00 = d_at(x, y, z) * (1 - dx) + d_at(x + 1, y, z) * dx
    d10 = d_at(x, y + 1, z) * (1 - dx) + d_at(x + 1, y + 1, z) * dx
    d01 = d_at(x, y, z + 1) * (1 - dx) + d_at(x + 1, y, z + 1) * dx
    d11 = d_at(x, y + 1, z + 1) * (1 - dx) + d_at(x + 1, y + 1, z + 1) * dx
    return ((d00 * (1 - dy) + d10 * dy) * (1 - dz)
            + (d01 * (1 - dy) + d11 * dy) * dz)


def _grid_ray(scene: SceneData, med_c, o, d, t_max):
    """World ray -> medium space + [0,1]^3 slab clip.  Returns
    (o_m, d_m, t0, t1, hit_box)."""
    m = scene.med_w2m[med_c]  # (N,4,4)
    o_m = (jnp.einsum('nij,nj->ni', m[:, :3, :3], o) + m[:, :3, 3])
    d_m = jnp.einsum('nij,nj->ni', m[:, :3, :3], d)
    inv = 1.0 / jnp.where(jnp.abs(d_m) < 1e-12,
                          jnp.where(d_m < 0, -1e-12, 1e-12), d_m)
    ta = (0.0 - o_m) * inv
    tb = (1.0 - o_m) * inv
    t0 = jnp.max(jnp.minimum(ta, tb), axis=-1)
    t1 = jnp.min(jnp.maximum(ta, tb), axis=-1)
    t0 = jnp.maximum(t0, 0.0)
    t1 = jnp.minimum(t1, t_max)
    return o_m, d_m, t0, t1, t0 < t1


def _report_budget_overflow(name: str, overflow: "jnp.ndarray") -> None:
    """Count lanes that exhausted a compiled loop budget into STATS via a
    host callback (async; a few bytes per chunk).  A nonzero counter in
    the end-of-render stats means the corresponding config cap
    (config.shadow_walk_steps / grid_track_steps) should be raised for
    this scene."""
    import jax as _jax

    from tpurt.utils.stats import STATS as _STATS

    def _cb(c):
        n = int(c)
        if n:
            _STATS.counter(name, n)

    try:
        _jax.debug.callback(_cb, jnp.sum(overflow.astype(jnp.int32)))
    except Exception:  # pragma: no cover - callback-less backends
        pass


def _grid_sample_medium(scene: SceneData, med, lane, bounce, o, d, t_surf,
                        salt: int):
    """Delta tracking (GridDensityMedium::Sample, grid.cpp:60-96).
    Returns (scattered, t_scatter(world units), weight3)."""
    med_c = jnp.maximum(med, 0)
    sig_t = scene.med_sigma_t[med_c][:, 0]  # spectrally uniform (grid.h)
    sig_s3 = scene.med_sigma_s[med_c]
    inv_maxd = scene.med_inv_maxd[med_c]
    o_m, d_m, t0, t1, hit = _grid_ray(scene, med_c, o, d, t_surf)

    def body(k, carry):
        t, done, scattered = carry
        step = jnp.full(t.shape, k, jnp.uint32)
        u1 = _track_u(lane, bounce, step, salt)
        u2 = _track_u(lane, bounce, step, salt + 0x1234)
        t_new = t - jnp.log(jnp.maximum(1.0 - u1, 1e-20)) * inv_maxd \
            / jnp.maximum(sig_t, 1e-20)
        exited = t_new >= t1
        p = o_m + t_new[:, None] * d_m
        dens = _grid_density_at(scene, med_c, p)
        real = dens * inv_maxd > u2
        scattered = scattered | (~done & ~exited & real)
        # freeze t for lanes that were ALREADY done (a scattered lane's
        # collision distance must not keep advancing) and for exits
        t = jnp.where(done | exited, t, t_new)
        done = done | exited | real
        return t, done, scattered

    t, done, scattered = jax.lax.fori_loop(
        0, get_config().grid_track_steps, body,
        (t0, ~hit, jnp.zeros_like(hit)))
    _report_budget_overflow("Media/Grid tracking budget exhausted", ~done)
    w3 = jnp.where(scattered[:, None],
                   sig_s3 / jnp.maximum(sig_t, 1e-20)[:, None], 1.0)
    return scattered, t, w3


def _grid_tr(scene: SceneData, med, lane, bounce, o, d, dist, salt: int):
    """Ratio tracking (GridDensityMedium::Tr, grid.cpp:44-58) with the
    reference's low-Tr Russian roulette."""
    med_c = jnp.maximum(med, 0)
    sig_t = scene.med_sigma_t[med_c][:, 0]
    inv_maxd = scene.med_inv_maxd[med_c]
    o_m, d_m, t0, t1, hit = _grid_ray(scene, med_c, o, d, dist)

    def body(k, carry):
        t, tr, done = carry
        step = jnp.full(t.shape, k, jnp.uint32)
        u1 = _track_u(lane, bounce, step, salt)
        u2 = _track_u(lane, bounce, step, salt + 0x77)
        t_new = t - jnp.log(jnp.maximum(1.0 - u1, 1e-20)) * inv_maxd \
            / jnp.maximum(sig_t, 1e-20)
        exited = t_new >= t1
        p = o_m + t_new[:, None] * d_m
        dens = _grid_density_at(scene, med_c, p)
        tr_new = tr * (1.0 - jnp.maximum(0.0, dens * inv_maxd))
        # RR when Tr gets small (grid.cpp:49-55)
        small = tr_new < 1e-3
        killed = small & (u2 < 0.75)
        tr_new = jnp.where(small & ~killed, tr_new / 0.25, tr_new)
        tr = jnp.where(done | exited, tr, jnp.where(killed, 0.0, tr_new))
        done = done | exited | killed
        return jnp.where(done, t, t_new), tr, done

    _, tr, done = jax.lax.fori_loop(
        0, get_config().grid_track_steps, body,
        (t0, jnp.ones_like(t0), ~hit))
    _report_budget_overflow("Media/Grid tracking budget exhausted", ~done)
    return tr


def _sample_medium_distance(scene: SceneData, med, o, d, t_surf, u_ch,
                            u_dist, lane, bounce, nch: int,
                            salt: int = 0x6A1D):
    """Distance-sample the lane's current medium along [0, t_surf):
    homogeneous closed-form channel sampling (homogeneous.cpp Sample)
    with grid delta tracking for grid lanes (grid.cpp:60-96).

    Returns (scattered, t_min, thru, g_med): `scattered` excludes any
    aliveness mask (caller ANDs it); `t_min` is the vertex distance
    (scatter point or surface, capped 3.4e37); `thru` is the combined
    weight beta *= thru for IN-MEDIUM lanes (callers gate on med >= 0);
    `g_med` the HG asymmetry of the lane's medium."""
    in_med = med >= 0
    sig_t = _lift_refl_maybe(scene.med_sigma_t[jnp.maximum(med, 0)], nch)
    sig_s = _lift_refl_maybe(scene.med_sigma_s[jnp.maximum(med, 0)], nch)
    g_med = scene.med_g[jnp.maximum(med, 0)]
    ch = jnp.minimum((u_ch * nch).astype(jnp.int32), nch - 1)
    sig_ch = jnp.take_along_axis(sig_t, ch[:, None], axis=-1)[:, 0]
    dist = -jnp.log(jnp.maximum(1.0 - u_dist, 1e-20)) / jnp.maximum(
        sig_ch, 1e-20)
    scattered = in_med & (dist < t_surf) & (sig_ch > 0)
    t_min = jnp.minimum(jnp.minimum(dist, t_surf), 3.4e37)
    tr = jnp.exp(-sig_t * t_min[:, None])
    dens = jnp.where(scattered[:, None], sig_t * tr, tr)
    pdf_m = jnp.maximum(jnp.mean(dens, axis=-1), 1e-20)
    thru = jnp.where(scattered[:, None], tr * sig_s, tr) / pdf_m[:, None]
    if scene.has_grid_media:
        is_grid = scene.med_is_grid[jnp.maximum(med, 0)]
        scat_g, t_g, _w_g = _grid_sample_medium(
            scene, med, lane, bounce, o, d, t_surf, salt=salt)
        grid_lane = in_med & is_grid
        scattered = jnp.where(grid_lane, scat_g, scattered)
        t_min = jnp.where(grid_lane,
                          jnp.where(scat_g, t_g,
                                    jnp.minimum(t_surf, 3.4e37)), t_min)
        # spectral albedo as the PER-BIN ratio of the lifted sigmas (the
        # lift is linear, the ratio is not — promoting the RGB ratio
        # biases sampled-spectrum mode); in RGB mode this equals the raw
        # sigma_s/sigma_t ratio exactly
        albedo = sig_s / jnp.maximum(sig_t, 1e-20)
        thru = jnp.where(grid_lane[:, None],
                         jnp.where(scat_g[:, None], albedo, 1.0), thru)
    return scattered, t_min, thru, g_med


def _medium_tr(scene: SceneData, med, dist, o=None, d=None, lane=None,
               bounce=None, channels: int = 3):
    """Transmittance through the given medium ids over dist: Beer-Lambert
    for homogeneous media (homogeneous.cpp Tr), ratio tracking for grid
    media.  NOTE: single-segment — intervening interface crossings along
    shadow rays are not tracked yet (the reference's VisibilityTester::Tr
    walks them; documented v1 simplification)."""
    sig_t = _lift_refl_maybe(scene.med_sigma_t[jnp.maximum(med, 0)],
                             channels)
    tr = jnp.exp(-sig_t * jnp.minimum(dist, 3.4e37)[:, None])
    if scene.has_grid_media and o is not None:
        is_grid = scene.med_is_grid[jnp.maximum(med, 0)]
        tr_g = _grid_tr(scene, med, lane, bounce, o, d, dist, salt=0x51AD)
        tr = jnp.where(is_grid[:, None], tr_g[:, None], tr)
    return jnp.where((med >= 0)[:, None], tr, 1.0)


def _shadow_tr_walk(scene: SceneData, o, d, dist, med0, lane, bounce,
                    usable, time=None, channels: int = 3):
    """VisibilityTester::Tr (core/light.cpp:47-63): march the shadow
    segment through null-material interface boundaries, accumulating each
    sub-segment's medium transmittance; any real-material hit occludes.
    config.shadow_walk_steps crossings max (the reference walks
    unboundedly); lanes still inside geometry after that are treated as
    occluded (conservative) and counted in the overflow stat.  Returns
    (occluded, tr3)."""
    walk_steps = get_config().shadow_walk_steps
    n = o.shape[0]
    tr = jnp.ones((n, channels), jnp.float32)
    med = med0
    occ = jnp.zeros(n, bool)
    done = ~usable
    o_cur = o
    rem = jnp.maximum(dist, 0.0)
    for k in range(walk_steps):
        t_max = jnp.where(done, 0.0, rem)
        hit = intersect_closest(scene.geo, o_cur, d, t_max, time=time)
        hv = hit.prim >= 0
        prim_c = jnp.maximum(hit.prim, 0)
        # a "real" material blocks; Material "none" rows exist in the
        # table with kind MAT_NONE and pass through (light.cpp:52)
        from tpurt.render.materials_build import MAT_NONE

        mat = scene.geo.material_id[prim_c]
        blocker = (hv & (mat >= 0)
                   & (scene.mt_kinds[jnp.maximum(mat, 0)] != MAT_NONE)
                   & ~done)
        seg = jnp.where(hv, hit.t, rem)
        seg_tr = _medium_tr(scene, med, seg, o_cur, d, lane,
                            bounce * walk_steps + k, channels=channels)
        tr = tr * jnp.where(done[:, None], 1.0, seg_tr)
        occ = occ | blocker
        si_k = compute_interaction(scene.geo, hit, o_cur, d, time=time)
        entering = dot(d, si_k.ng) < 0
        med_next = jnp.where(entering, si_k.med_in, si_k.med_out)
        crossed = hv & ~blocker & ~done
        med = jnp.where(crossed, med_next, med)
        o_cur = jnp.where(crossed[:, None],
                          offset_ray_origin(si_k.p, si_k.ng, d, si_k.p_eps), o_cur)
        rem = jnp.where(crossed, jnp.maximum(rem - seg, 0.0), rem)
        done = done | ~hv | blocker
    _report_budget_overflow("Media/Shadow walk budget exhausted", ~done)
    occ = occ | ~done  # crossing budget exhausted
    return occ, tr


def volpath_radiance(scene: SceneData, sampler, camera, px, py, sidx,
                     cfg: IntegratorConfig, crop_xy=(0, 0),
                     texture_eval=None) -> Dict[str, Any]:
    """Volumetric path tracer: per bounce, sample the medium along the ray
    (homogeneous closed-form distance sampling); scatter in-medium with the
    HG phase function or shade the surface; pass through null-material
    interface boundaries updating the current medium.

    Deviations from volpath.cpp (documented): shadow-ray transmittance uses
    the vertex's current medium only (no interface walking), and null-
    boundary crossings consume a bounce (the reference's bounces-- retry
    does not fit a fixed scan).
    """
    if not scene.has_media:
        return path_radiance(scene, sampler, camera, px, py, sidx, cfg,
                             crop_xy, texture_eval)

    n = px.shape[0]
    p_film, p_film_crop, p_lens, o, d, ray_w, sctx, l_time = _camera_setup(
        sampler, camera, px, py, sidx, crop_xy)

    inf_L, _ = _infinite_L(scene.lights)
    has_inf = scene.lights.has_infinite
    uniform_strategy = cfg.light_strategy not in ("power", "spatial")
    nch = 60 if cfg.spectral else 3

    v0 = px.astype(jnp.float32) * 0.0
    v03 = v0[:, None] * jnp.ones((1, nch), jnp.float32)

    rx_o = rx_d = ry_o = ry_d = None
    use_ewa = scene.has_texfilter and get_config().texture_filter == "ewa"
    if use_ewa:
        rx_o, rx_d, ry_o, ry_d = camera_ray_differentials(
            camera, sampler, p_film, p_lens, l_time, sampler.spp)

    def nee_from(scene, si, shade, u_choice, u_light, alive, med, is_medium,
                 g_med, bounce):
        """NEE supporting both surface and in-medium vertices."""
        lt = scene.lights
        lidx, pmf = choose_light(lt, u_choice, cfg.light_strategy, p=si.p)
        ls = sample_li(lt, lidx, si.p, u_light)
        li = _lift_illum_maybe(ls.li, nch)
        # surface f / pdf through the full material context (hair/fourier)
        f_surf, pdf_surf = shade_f(scene, shade, si.ns, si.wo, ls.wi,
                                   want_pdf=True)
        f_surf = f_surf * jnp.abs(dot(ls.wi, si.ns))[:, None]
        # medium phase f / pdf (f == pdf for a normalized phase function)
        cos_t = dot(-si.wo, ls.wi)  # si.wo = -ray.d -> propagation = -wo
        ph = _hg_phase(cos_t, g_med)
        f_med = jnp.repeat(ph[:, None], nch, axis=-1)
        f = jnp.where(is_medium[:, None], f_med, f_surf)
        scatter_pdf = jnp.where(is_medium, ph, pdf_surf)

        usable = (alive & (ls.pdf > 0) & jnp.any(ls.li > 0, axis=-1)
                  & jnp.any(f > 0, axis=-1))
        o_sh = jnp.where(is_medium[:, None], si.p,
                         offset_ray_origin(si.p, si.ng, ls.wi, si.p_eps))
        dist = jnp.linalg.norm(ls.p_light - o_sh, axis=-1)
        t_max = jnp.where(usable, dist * (1.0 - SHADOW_EPS) - 2e-3
                          * jnp.maximum(1.0,
                                        jnp.max(jnp.abs(ls.p_light), axis=-1)),
                          0.0)
        lane = jnp.arange(o_sh.shape[0], dtype=jnp.uint32)
        if scene.has_null_boundaries:
            occluded, tr = _shadow_tr_walk(scene, o_sh, ls.wi,
                                           jnp.maximum(t_max, 0.0), med,
                                           lane, bounce, usable, time=l_time,
                                           channels=nch)
        else:
            occluded = intersect_any(scene.geo, o_sh, ls.wi,
                                     jnp.maximum(t_max, 0.0), time=l_time)
            tr = _medium_tr(scene, med, dist, o_sh, ls.wi, lane, bounce,
                            channels=nch)
        w = jnp.where(ls.is_delta, 1.0,
                      power_heuristic(1.0, ls.pdf, 1.0, scatter_pdf))
        contrib = f * li * tr * (w / jnp.maximum(ls.pdf * pmf, 1e-20))[:, None]
        return jnp.where((usable & ~occluded)[:, None], contrib, 0.0)

    def bounce_body(carry, bounce):
        (o, d, beta, L, alive, specular, prev_pdf, prev_p, med) = carry

        t_max = jnp.where(alive, INF, 0.0)
        hit = intersect_closest(scene.geo, o, d, t_max, time=l_time)
        si = compute_interaction(scene.geo, hit, o, d,
                                 tangents=scene.has_tangents,
                                 dpduv=scene.has_bump or scene.has_texfilter,
                                 time=l_time)
        if scene.has_texfilter:
            si = _tex_footprint(si, hit.t, camera)
        if use_ewa:
            # camera hits: TRUE ray differentials -> anisotropic EWA
            # derivative vectors; deeper bounces keep the isotropic cone
            # (the reference point-samples non-specular indirect lookups;
            # the cone is a strict quality superset)
            dd0, dd1, okd = _tex_differentials(si, rx_o, rx_d, ry_o, ry_d)
            use = ((bounce == 0) & okd)[:, None]
            zw = jnp.zeros_like(si.tex_wu)
            si = si._replace(
                tex_dst0=jnp.where(use, dd0,
                                   jnp.stack([si.tex_wu, zw], -1)),
                tex_dst1=jnp.where(use, dd1,
                                   jnp.stack([zw, si.tex_wv], -1)))
        if scene.has_bump and getattr(texture_eval, "bump", None) is not None:
            si = texture_eval.bump(si)
        t_surf = jnp.where(si.valid, hit.t, INF)

        d0 = CAMERA_DIMS + bounce * DIMS_PER_BOUNCE_VOL
        # ---- medium sampling (homogeneous.cpp Sample) ----
        # sampled mode: sigma promote through the parse-time reflectance
        # basis, and the distance-sampling channel draws over all bins
        # (homogeneous.cpp Sample picks channel in [0, Spectrum::nSamples))
        u_ch = sampler.dim_dyn(px, py, sidx, d0, sctx)
        u_dist = sampler.dim_dyn(px, py, sidx, d0 + 1, sctx)
        in_med = med >= 0
        scattered, t_min, thru, g_med = _sample_medium_distance(
            scene, med, o, d, t_surf, u_ch, u_dist,
            jnp.arange(n, dtype=jnp.uint32), bounce, nch)
        sampled_med = alive & scattered
        beta = jnp.where((alive & in_med)[:, None], beta * thru, beta)

        # ---- emitted at surfaces (only when the surface was reached) ----
        reach_surf = alive & si.valid & ~sampled_med
        Le, lrow = _emitted(scene, si)
        Le = _lift_illum_maybe(Le, nch)
        lrow_c = jnp.maximum(lrow, 0)
        light_pdf = pdf_li_from_hit(scene.lights, lrow_c, prev_p, d, si.p,
                                    si.ng)
        pmf = _choice_pmf_at(scene, lrow_c, cfg.light_strategy, n, prev_p)
        w_mis = power_heuristic(1.0, prev_pdf, 1.0, light_pdf * pmf)
        w_emit = jnp.where((bounce == 0) | specular, 1.0, w_mis)
        L = L + jnp.where(reach_surf[:, None], beta * Le * w_emit[:, None], 0.0)
        if has_inf:
            if uniform_strategy:
                pmf_inf = 1.0 / scene.lights.n_lights
            else:
                inf_mask = scene.lights.kind == LIGHT_INFINITE
                pmf_inf = jnp.sum(jnp.where(inf_mask, scene.lights.power_pmf,
                                            0.0))
            w_mis_inf = power_heuristic(
                1.0, prev_pdf, 1.0, _escape_pdf(scene.lights, d) * pmf_inf)
            w_inf = jnp.where((bounce == 0) | specular, 1.0, w_mis_inf)
            Le_inf = _lift_illum_maybe(
                _escape_radiance(scene.lights, inf_L, d), nch)
            L = L + jnp.where((alive & ~si.valid & ~sampled_med)[:, None],
                              beta * Le_inf * w_inf[:, None], 0.0)

        alive = alive & (si.valid | sampled_med) & (bounce < cfg.max_depth)

        # medium-interaction point
        p_med = o + t_min[:, None] * d
        si_eff = si._replace(
            p=jnp.where(sampled_med[:, None], p_med, si.p),
            wo=jnp.where(sampled_med[:, None], -d, si.wo),
        )

        shade = make_shade_ctx(scene, si, texture_eval, channels=nch)
        any_lobe = jnp.any(shade.lobes.active, axis=-1)
        if shade.is_hair is not None:
            any_lobe = any_lobe | shade.is_hair
        if shade.is_fourier is not None:
            any_lobe = any_lobe | shade.is_fourier
        # null-material boundary: pass through + switch media (media ids
        # carried on the fused shade row — no extra per-prim gathers)
        null_boundary = (alive & si.valid & ~sampled_med & ~any_lobe
                         & ((si.med_in >= 0) | (si.med_out >= 0)))
        entering = dot(d, si.ng) < 0
        new_med = jnp.where(entering, si.med_in, si.med_out)
        med = jnp.where(null_boundary, new_med, med)

        alive_shade = alive & (sampled_med | (si.valid & any_lobe))

        # ---- NEE ----
        u_choice = sampler.dim_dyn(px, py, sidx, d0 + 2, sctx)
        u_light = jnp.stack([sampler.dim_dyn(px, py, sidx, d0 + 3, sctx),
                             sampler.dim_dyn(px, py, sidx, d0 + 4, sctx)], axis=-1)
        Ld = nee_from(scene, si_eff, shade, u_choice, u_light, alive_shade,
                      med, sampled_med, g_med, bounce)
        L = L + beta * Ld

        # ---- continuation: phase sample (medium) or BSDF sample ----
        u_lobe = sampler.dim_dyn(px, py, sidx, d0 + 5, sctx)
        u1 = sampler.dim_dyn(px, py, sidx, d0 + 6, sctx)
        u2 = sampler.dim_dyn(px, py, sidx, d0 + 7, sctx)
        wi_surf, f, pdf, is_spec, is_trans = shade_sample(
            scene, shade, si.ns, si.wo, u_lobe, u1, u2)
        wi_med, _ph = _hg_sample(d, g_med, u1, u2)
        wi = jnp.where(sampled_med[:, None], wi_med, wi_surf)

        ok_surf = (pdf > 0) & jnp.any(f > 0, axis=-1)
        thru_surf = f * (jnp.abs(dot(wi_surf, si.ns))
                         / jnp.maximum(pdf, 1e-20))[:, None]
        # phase: f/pdf == 1
        thru_c = jnp.where(sampled_med[:, None], 1.0, thru_surf)
        ok = alive_shade & (sampled_med | ok_surf) | (null_boundary)
        beta = jnp.where((alive_shade & ~sampled_med & ok_surf)[:, None],
                         beta * thru_surf, beta)
        specular = jnp.where(sampled_med, False,
                             jnp.where(null_boundary, specular, is_spec))
        prev_pdf = jnp.where(sampled_med, _ph,
                             jnp.where(null_boundary, prev_pdf,
                                       jnp.maximum(pdf, 1e-20)))
        prev_p_old = prev_p
        prev_p = si_eff.p
        # null boundary keeps direction; medium scatter from p_med
        d_new = jnp.where(null_boundary[:, None], d, wi)
        o_new = jnp.where(sampled_med[:, None], p_med,
                          offset_ray_origin(si.p, si.ng, d_new, si.p_eps))
        alive = (alive_shade & (sampled_med | ok_surf)) | null_boundary
        o = o_new
        d = d_new
        # pass-through boundaries are not path vertices (volpath.cpp's
        # bounces-- retry): keep the previous REAL vertex's MIS state
        prev_p = jnp.where(null_boundary[:, None], prev_p_old, prev_p)

        # transmission through a surface switches media too
        surf_trans = alive & ~sampled_med & ~null_boundary & is_trans
        med = jnp.where(surf_trans, new_med, med)

        # ---- Russian roulette ----
        u_rr = sampler.dim_dyn(px, py, sidx, d0 + 8, sctx)
        rr_beta = jnp.max(beta, axis=-1)
        q = jnp.maximum(0.05, 1.0 - rr_beta)
        do_rr = (rr_beta < cfg.rr_threshold) & (bounce > 3) & alive
        killed = do_rr & (u_rr < q)
        alive = alive & ~killed
        beta = jnp.where((do_rr & ~killed)[:, None],
                         beta / jnp.maximum(1.0 - q, 1e-6)[:, None], beta)

        return (o, d, beta, L, alive, specular, prev_pdf, prev_p, med), None

    med0 = jnp.full((n,), scene.camera_medium, jnp.int32) + v0.astype(jnp.int32)
    # specular starts True: emitter hits reached only through pass-through
    # boundaries keep full weight (the bounce==0 test covers the direct case)
    init = (o, d, v03 + 1.0, v03, px == px, px == px, v0 + 1.0, o, med0)
    carry, _ = jax.lax.scan(bounce_body, init,
                            jnp.arange(cfg.max_depth + 1, dtype=jnp.int32))
    return {"p_film": p_film_crop, "L": _to_rgb_maybe(carry[3], cfg),
            "ray_weight": ray_w}


RADIANCE_FNS = {
    "path": path_radiance,
    "volpath": volpath_radiance,
    "rpf": path_radiance,  # rpf = path + sample capture + filter pass
    "directlighting": direct_radiance,
    "whitted": whitted_radiance,
    "ao": ao_radiance,
}
