"""Lights: SoA light table + batched Sample_Li / Pdf_Li / Le.

Reference analog: core/light.h (Light, Sample_Li + VisibilityTester
:68-104), src/lights/* (point/spot/distant/diffuse-area/infinite), and the
shape solid-angle sampling in shapes/sphere.cpp Sample / triangle.cpp
Sample.  Like the reference (api.cpp:1330-1400), every emissive primitive
becomes its OWN area light (one DiffuseAreaLight per triangle/sphere).

All sampling is masked-select over light types — no virtual dispatch.
The infinite light supports constant radiance and environment maps with
2D-CDF importance sampling (`env_li`/`env_le`/`env_pdf`), matching
lights/infinite.cpp:118-188.
"""

from __future__ import annotations

import dataclasses
import logging
from typing import List, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from tpurt.geom.transform import Transform
from tpurt.render.geometry_build import GeometryArrays, PT_SPHERE, PT_TRIANGLE
from tpurt.render.sampling_warps import (
    build_onb,
    concentric_sample_disk,
    cosine_sample_hemisphere,
    dot,
    normalize,
    to_world,
    uniform_cone_pdf,
    uniform_sample_cone,
    uniform_sample_sphere,
    uniform_sample_triangle,
)
from tpurt.scene.records import LightRecord, PrimitiveRecord

log = logging.getLogger("tpurt.render")

LIGHT_POINT = 0
LIGHT_SPOT = 1
LIGHT_DISTANT = 2
LIGHT_AREA_TRI = 3
LIGHT_AREA_SPHERE = 4
LIGHT_INFINITE = 5
LIGHT_PROJECTION = 6
LIGHT_GONIO = 7

DELTA_LIGHTS = (LIGHT_POINT, LIGHT_SPOT, LIGHT_DISTANT,
                LIGHT_PROJECTION, LIGHT_GONIO)


class LightTable(NamedTuple):
    """Pytree of light arrays.  (L,) rows; one per light."""

    kind: jnp.ndarray  # (L,) i32
    L: jnp.ndarray  # (L,3) radiance / intensity (scaled)
    p0: jnp.ndarray  # (L,3) position (point/spot) / direction (distant)
    p1: jnp.ndarray  # (L,3) spot axis (normalized)
    params: jnp.ndarray  # (L,4): [cosTotal, cosFalloff, radius, two_sided]
    # area-light geometry (world space)
    tri_v0: jnp.ndarray  # (L,3)
    tri_v1: jnp.ndarray
    tri_v2: jnp.ndarray
    prim: jnp.ndarray  # (L,) i32 owning primitive (-1 for non-area)
    # fused per-light record for per-lane lookups (ONE row gather):
    # [0] kind, [1:4] L, [4:7] p0, [7:10] p1, [10:14] params,
    # [14:23] tri_v0/v1/v2, [23] prim (kind/prim as exact small-int f32)
    rows: jnp.ndarray
    prim_to_light: jnp.ndarray  # (P,) i32: light row per primitive (-1)
    power_pmf: jnp.ndarray  # (L,) light-choice pmf (power heuristic strategy)
    power_cdf: jnp.ndarray  # (L,)
    world_radius: jnp.ndarray  # scalar
    world_center: jnp.ndarray  # (3,) scene bound center (Sample_Le disks)
    # environment map for ONE infinite light (lights/infinite.cpp):
    # equirect radiance + the 2D luminance*sin(theta) sampling distribution
    env_map: jnp.ndarray  # (He, We, 3) f32 (1x1 black when absent)
    env_cond_cdf: jnp.ndarray  # (He, We+1) conditional CDFs over u
    env_cond_int: jnp.ndarray  # (He,) row integrals
    env_marg_cdf: jnp.ndarray  # (He+1,) marginal CDF over v
    env_w2l: jnp.ndarray  # (4,4) world-to-light rotation
    env_l2w: jnp.ndarray  # (4,4)
    # spatial light distribution (lightdistrib.h:100 SpatialLightDistribution)
    spat_cdf: jnp.ndarray  # (V, L+1) per-voxel light CDFs (V=1 disabled)
    spat_pmf: jnp.ndarray  # (V, L)
    spat_lo: jnp.ndarray  # (3,) world bounds for voxel lookup
    spat_inv_extent: jnp.ndarray  # (3,)
    n_lights: int
    has_infinite: bool
    env_light_row: int = -1  # row index of the envmap infinite light
    spat_res: int = 1  # voxels per axis (1 = fall back to power pmf)
    # projection / goniometric delta lights (lights/projection.cpp,
    # goniometric.cpp): pooled image pixels + per-light transform and
    # projection constants
    img_pool: jnp.ndarray = None  # (D,3) f32
    img_off: jnp.ndarray = None  # (L,) i32 offset into img_pool
    img_wh: jnp.ndarray = None  # (L,2) i32 (w,h); (0,0) = no image
    w2l: jnp.ndarray = None  # (L,4,4) world-to-light
    proj: jnp.ndarray = None  # (L,8): x0,y0,x1,y1,invTanAng,hither,cosTotal,_
    has_lightmaps: bool = False

    @property
    def num(self):
        return self.n_lights


from tpurt.pytrees import register_static_pytree  # noqa: E402

register_static_pytree(LightTable, [
    "kind", "L", "p0", "p1", "params", "tri_v0", "tri_v1", "tri_v2",
    "prim", "rows", "prim_to_light", "power_pmf", "power_cdf",
    "world_radius",
    "world_center",
    "env_map", "env_cond_cdf", "env_cond_int", "env_marg_cdf",
    "env_w2l", "env_l2w", "spat_cdf", "spat_pmf", "spat_lo",
    "spat_inv_extent", "img_pool", "img_off", "img_wh", "w2l", "proj",
])


def build_light_table(
    scene_lights: List[LightRecord],
    geo: GeometryArrays,
    area_records: List,  # indexed by arealight_id: (L(3,), scale(3,), two_sided)
) -> LightTable:
    """Assemble the light table: explicit LightSource records + one area
    light per emissive primitive."""
    kinds, Ls, p0s, p1s, params, tv0, tv1, tv2, prim_ids = ([] for _ in range(9))

    world_lo, world_hi = geo.world_lo, geo.world_hi
    center = 0.5 * (world_lo + world_hi)
    world_radius = float(np.linalg.norm(world_hi - center)) or 1.0

    w2l_rows: List = []
    proj_rows: List = []
    img_rows: List = []

    def add(kind, L, p0=(0, 0, 0), p1=(0, 0, 1), par=(0, 0, 0, 0),
            v0=(0, 0, 0), v1=(0, 0, 0), v2=(0, 0, 0), prim=-1,
            w2l=None, projp=None, img=None):
        kinds.append(kind)
        Ls.append(np.asarray(L, np.float64) * np.ones(3))
        p0s.append(np.asarray(p0, np.float64))
        p1s.append(np.asarray(p1, np.float64))
        params.append(np.asarray(par, np.float64))
        tv0.append(np.asarray(v0, np.float64))
        tv1.append(np.asarray(v1, np.float64))
        tv2.append(np.asarray(v2, np.float64))
        prim_ids.append(prim)
        w2l_rows.append(np.eye(4, dtype=np.float32) if w2l is None else w2l)
        proj_rows.append(np.zeros(8, np.float32) if projp is None
                         else np.asarray(projp, np.float32))
        img_rows.append(img)

    prim_to_light = np.full(geo.n_prims, -1, np.int32)
    env_img = None
    env_w2l = np.eye(4, dtype=np.float32)
    env_l2w = np.eye(4, dtype=np.float32)
    env_row = -1

    has_infinite = False
    for lr in scene_lights:
        ps = lr.params
        l2w = lr.light_to_world
        scale = ps.find_one_spectrum("scale", 1.0)
        if lr.kind == "point":
            I = ps.find_one_spectrum("I", 1.0) * scale
            frm = l2w.apply_point(ps.find_one_point3("from", [0, 0, 0]))
            add(LIGHT_POINT, I, p0=frm)
        elif lr.kind == "spot":
            I = ps.find_one_spectrum("I", 1.0) * scale
            cone = ps.find_one_float("coneangle", 30.0)
            delta = ps.find_one_float("conedeltaangle", 5.0)
            frm = ps.find_one_point3("from", [0, 0, 0])
            to = ps.find_one_point3("to", [0, 0, 1])
            wfrm = l2w.apply_point(frm)
            wto = l2w.apply_point(to)
            axis = wto - wfrm
            axis = axis / np.linalg.norm(axis)
            add(LIGHT_SPOT, I, p0=wfrm, p1=axis,
                par=(np.cos(np.deg2rad(cone)),
                     np.cos(np.deg2rad(cone - delta)), 0, 0))
        elif lr.kind == "distant":
            L = ps.find_one_spectrum("L", 1.0) * scale
            frm = l2w.apply_point(ps.find_one_point3("from", [0, 0, 0]))
            to = l2w.apply_point(ps.find_one_point3("to", [0, 0, 1]))
            w = frm - to
            w = w / np.linalg.norm(w)
            add(LIGHT_DISTANT, L, p0=w)
        elif lr.kind in ("infinite", "exinfinite"):
            L = ps.find_one_spectrum("L", 1.0) * scale
            mapname = ps.find_one_filename("mapname", "")
            if mapname and env_img is None:
                try:
                    from tpurt.io.image import read_image

                    env_img = (read_image(mapname).astype(np.float64)
                               * L.reshape(1, 1, 3)).astype(np.float32)
                    env_w2l = l2w.m_inv.astype(np.float32)
                    env_l2w = l2w.m.astype(np.float32)
                    env_row = len(kinds)
                    L = env_img.reshape(-1, 3).mean(axis=0)  # for power pmf
                except (OSError, ValueError) as e:
                    log.error("infinite light map %s unreadable: %s", mapname, e)
            elif mapname:
                log.warning("only one environment-mapped infinite light is "
                            "importance-sampled; %s uses its mean", mapname)
            add(LIGHT_INFINITE, L)
            has_infinite = True
        elif lr.kind in ("projection", "goniometric"):
            I = ps.find_one_spectrum("I", 1.0) * scale
            frm = l2w.apply_point([0, 0, 0])
            mapname = ps.find_one_filename("mapname", "")
            img = None
            if mapname:
                try:
                    from tpurt.io import read_image

                    img = np.asarray(read_image(mapname),
                                     np.float32)[..., :3]
                except (OSError, ValueError) as e:
                    log.error('%s light map "%s" unreadable: %s', lr.kind,
                              mapname, e)
            w2l_m = l2w.inverse().m.astype(np.float32)
            if lr.kind == "projection":
                # screen window + cone from the image aspect + fov
                # (projection.cpp:59-74)
                fov = ps.find_one_float("fov", 45.0)
                aspect = (img.shape[1] / img.shape[0]
                          if img is not None else 1.0)
                if aspect > 1:
                    x0, x1, y0, y1 = -aspect, aspect, -1.0, 1.0
                else:
                    x0, x1, y0, y1 = -1.0, 1.0, -1 / aspect, 1 / aspect
                inv_tan = 1.0 / np.tan(np.deg2rad(fov) / 2)
                cos_total = 1.0 / np.sqrt((x1 / inv_tan) ** 2
                                          + (y1 / inv_tan) ** 2 + 1.0)
                add(LIGHT_PROJECTION, I, p0=frm, w2l=w2l_m, img=img,
                    projp=(x0, y0, x1, y1, inv_tan, 1e-3, cos_total, 0.0))
            else:
                add(LIGHT_GONIO, I, p0=frm, w2l=w2l_m, img=img)
        else:
            log.warning('light "%s" unknown', lr.kind)

    # area lights: one per emissive flattened primitive (BVH order)
    n_area = 0
    for row in range(geo.n_prims):
        al = geo.arealight_id[row]
        if al < 0:
            continue
        L = np.asarray(area_records[al][0]) * np.asarray(area_records[al][1])
        two_sided = float(area_records[al][2])
        if geo.prim_type[row] == PT_TRIANGLE:
            add(LIGHT_AREA_TRI, L,
                v0=geo.tri_v0[row], v1=geo.tri_v1[row], v2=geo.tri_v2[row],
                par=(0, 0, 0, two_sided), prim=row)
        elif geo.prim_type[row] == PT_SPHERE:
            qi = geo.quad_id[row]
            c = geo.quad_o2w[qi][:3, 3]
            r = geo.quad_params[qi][0]
            add(LIGHT_AREA_SPHERE, L, p0=c, par=(0, 0, r, two_sided), prim=row)
        else:
            log.warning("area light on unsupported shape type %d",
                        int(geo.prim_type[row]))
            continue
        prim_to_light[row] = len(kinds) - 1
        n_area += 1

    n = len(kinds)
    if n == 0:
        log.warning("no lights in scene")
        add(LIGHT_POINT, [0.0, 0.0, 0.0])
        n = 1

    kind_a = np.asarray(kinds, np.int32)
    L_a = np.stack(Ls).astype(np.float32)
    # power pmf (lightdistrib "power"): ~ luminance * area factor
    power = L_a.mean(axis=-1).astype(np.float64).copy()
    for i in range(n):
        if kind_a[i] == LIGHT_AREA_TRI:
            e1 = tv1[i] - tv0[i]
            e2 = tv2[i] - tv0[i]
            power[i] *= 0.5 * np.linalg.norm(np.cross(e1, e2)) * np.pi
        elif kind_a[i] == LIGHT_AREA_SPHERE:
            power[i] *= 4 * np.pi * params[i][2] ** 2 * np.pi
        elif kind_a[i] == LIGHT_INFINITE:
            power[i] *= np.pi * world_radius ** 2
        elif kind_a[i] == LIGHT_PROJECTION:
            # I * avg(map) * 2pi(1 - cosTotalWidth) (projection.cpp Power)
            avg = (img_rows[i].mean() if img_rows[i] is not None else 1.0)
            power[i] *= avg * 2 * np.pi * (1.0 - proj_rows[i][6])
        elif kind_a[i] == LIGHT_GONIO:
            avg = (img_rows[i].mean() if img_rows[i] is not None else 1.0)
            power[i] *= avg * 4 * np.pi
    total = power.sum()
    pmf = (power / total) if total > 0 else np.full(n, 1.0 / n)

    if env_img is None:
        env_img = np.zeros((1, 1, 3), np.float32)
    cond_cdf, cond_int, marg_cdf = _build_env_distribution(env_img)

    # pool projection/gonio images into one flat pixel array
    img_off = np.zeros(n, np.int32)
    img_wh = np.zeros((n, 2), np.int32)
    pool_parts = []
    off = 0
    for i, im in enumerate(img_rows):
        if im is None:
            continue
        h, w = im.shape[:2]
        img_off[i] = off
        img_wh[i] = (w, h)
        pool_parts.append(im.reshape(-1, 3))
        off += h * w
    img_pool = (np.concatenate(pool_parts).astype(np.float32)
                if pool_parts else np.zeros((1, 3), np.float32))
    has_lightmaps = bool(((kind_a == LIGHT_PROJECTION)
                          | (kind_a == LIGHT_GONIO)).any())

    spat = _build_spatial_distribution(
        kind_a, np.stack(p0s), power, np.asarray(world_lo),
        np.asarray(world_hi))

    # fused per-light row (ONE gather per per-lane light lookup; the TPU
    # gather engine is row-count bound): [0] kind, [1:4] L, [4:7] p0,
    # [7:10] p1, [10:14] params, [14:23] tri_v0/v1/v2, [23] prim.
    # kind/prim ride as exact small-int floats (|prim| < 2^24).
    rows_a = np.concatenate([
        kind_a.astype(np.float32)[:, None],
        L_a.astype(np.float32),
        np.stack(p0s).astype(np.float32),
        np.stack(p1s).astype(np.float32),
        np.stack(params).astype(np.float32)[:, :4],
        np.stack(tv0).astype(np.float32),
        np.stack(tv1).astype(np.float32),
        np.stack(tv2).astype(np.float32),
        np.asarray(prim_ids, np.float32)[:, None],
    ], axis=1)
    return LightTable(
        kind=jnp.asarray(kind_a),
        L=jnp.asarray(L_a),
        p0=jnp.asarray(np.stack(p0s).astype(np.float32)),
        p1=jnp.asarray(np.stack(p1s).astype(np.float32)),
        params=jnp.asarray(np.stack(params).astype(np.float32)),
        tri_v0=jnp.asarray(np.stack(tv0).astype(np.float32)),
        tri_v1=jnp.asarray(np.stack(tv1).astype(np.float32)),
        tri_v2=jnp.asarray(np.stack(tv2).astype(np.float32)),
        prim=jnp.asarray(np.asarray(prim_ids, np.int32)),
        rows=jnp.asarray(rows_a),
        prim_to_light=jnp.asarray(prim_to_light),
        power_pmf=jnp.asarray(pmf.astype(np.float32)),
        power_cdf=jnp.asarray(np.cumsum(pmf).astype(np.float32)),
        world_radius=jnp.float32(world_radius),
        world_center=jnp.asarray(np.asarray(center, np.float32)),
        env_map=jnp.asarray(env_img),
        env_cond_cdf=jnp.asarray(cond_cdf),
        env_cond_int=jnp.asarray(cond_int),
        env_marg_cdf=jnp.asarray(marg_cdf),
        env_w2l=jnp.asarray(env_w2l),
        env_l2w=jnp.asarray(env_l2w),
        spat_cdf=jnp.asarray(spat[0]),
        spat_pmf=jnp.asarray(spat[1]),
        spat_lo=jnp.asarray(spat[2]),
        spat_inv_extent=jnp.asarray(spat[3]),
        spat_res=spat[4],
        n_lights=n,
        has_infinite=has_infinite,
        env_light_row=env_row,
        img_pool=jnp.asarray(img_pool),
        img_off=jnp.asarray(img_off),
        img_wh=jnp.asarray(img_wh),
        w2l=jnp.asarray(np.stack(w2l_rows)),
        proj=jnp.asarray(np.stack(proj_rows)),
        has_lightmaps=has_lightmaps,
    )


def _build_spatial_distribution(kinds, positions, power, world_lo, world_hi,
                                res: int = 8, max_table: int = 1 << 22):
    """Per-voxel light-choice distributions over a res^3 grid
    (SpatialLightDistribution, lightdistrib.cpp).  The per-voxel weight is
    an analytic power/distance^2 estimate from the voxel center rather
    than the reference's sampled Monte-Carlo estimate — same structure,
    cheaper eager build (documented deviation)."""
    n = len(kinds)
    if n <= 1 or n * res ** 3 > max_table:
        return (np.zeros((1, n + 1), np.float32), np.zeros((1, n), np.float32),
                np.zeros(3, np.float32), np.ones(3, np.float32), 1)
    lo = np.asarray(world_lo, np.float64)
    hi = np.asarray(world_hi, np.float64)
    extent = np.maximum(hi - lo, 1e-6)
    ax = (np.arange(res) + 0.5) / res
    cz, cy, cx = np.meshgrid(ax, ax, ax, indexing="ij")
    centers = np.stack([cx, cy, cz], -1).reshape(-1, 3) * extent + lo  # (V,3)
    voxel_r2 = float(np.sum((extent / res / 2) ** 2))
    positional = np.isin(kinds, (LIGHT_POINT, LIGHT_SPOT, LIGHT_AREA_TRI,
                                 LIGHT_AREA_SPHERE))
    d2 = np.sum((centers[:, None, :] - positions[None, :, :]) ** 2, -1)
    w = np.where(positional[None, :],
                 power[None, :] / np.maximum(d2, voxel_r2),
                 power[None, :] / max(np.sum(extent ** 2), 1e-6))
    w = np.maximum(w, 0.0)
    tot = w.sum(axis=1, keepdims=True)
    pmf = np.where(tot > 0, w / np.where(tot == 0, 1, tot), 1.0 / n)
    cdf = np.zeros((len(centers), n + 1))
    cdf[:, 1:] = np.cumsum(pmf, axis=1)
    return (cdf.astype(np.float32), pmf.astype(np.float32),
            lo.astype(np.float32), (1.0 / extent).astype(np.float32), res)


def _build_env_distribution(img: np.ndarray):
    """Distribution2D over luminance * sin(theta)
    (infinite.cpp ctor + core/sampling.h Distribution2D)."""
    he, we = img.shape[:2]
    lum = (0.212671 * img[..., 0] + 0.715160 * img[..., 1]
           + 0.072169 * img[..., 2]).astype(np.float64)
    sin_t = np.sin(np.pi * (np.arange(he) + 0.5) / he)
    f = lum * sin_t[:, None]
    cond_int = f.sum(axis=1) / we
    cond_cdf = np.zeros((he, we + 1))
    cond_cdf[:, 1:] = np.cumsum(f, axis=1) / we
    safe = np.where(cond_int > 0, cond_int, 1.0)[:, None]
    cond_cdf = np.where(cond_int[:, None] > 0, cond_cdf / safe,
                        np.linspace(0, 1, we + 1)[None, :])
    marg_int = cond_int.sum() / he
    marg_cdf = np.zeros(he + 1)
    marg_cdf[1:] = np.cumsum(cond_int) / he
    marg_cdf = (marg_cdf / marg_int if marg_int > 0
                else np.linspace(0, 1, he + 1))
    return (cond_cdf.astype(np.float32), cond_int.astype(np.float32),
            marg_cdf.astype(np.float32))


class LightSample(NamedTuple):
    wi: jnp.ndarray  # (N,3)
    li: jnp.ndarray  # (N,3) incident radiance (no visibility)
    pdf: jnp.ndarray  # (N,) solid-angle pdf (w.r.t. the chosen light)
    p_light: jnp.ndarray  # (N,3) point on light (for shadow ray)
    light_idx: jnp.ndarray  # (N,) i32
    choice_pmf: jnp.ndarray  # (N,) pmf of having chosen this light
    is_delta: jnp.ndarray  # (N,) bool


def choose_light(lt: LightTable, u: jnp.ndarray, strategy: str = "uniform",
                 p=None):
    """Light selection (lightdistrib.h strategies: uniform / power /
    spatial).  'spatial' uses the per-voxel distributions when the grid was
    built (multi-light scenes), else degrades to 'power'."""
    if strategy == "uniform" or lt.n_lights == 1:
        idx = jnp.minimum((u * lt.n_lights).astype(jnp.int32), lt.n_lights - 1)
        pmf = jnp.full(u.shape, 1.0 / lt.n_lights, jnp.float32)
        return idx, pmf
    if strategy == "spatial" and lt.spat_res > 1 and p is not None:
        res = lt.spat_res
        v = jnp.clip(((p - lt.spat_lo) * lt.spat_inv_extent * res)
                     .astype(jnp.int32), 0, res - 1)
        vox = (v[:, 2] * res + v[:, 1]) * res + v[:, 0]
        rows_cdf = lt.spat_cdf[vox]  # (N, L+1)
        lane = jnp.arange(u.shape[0])
        idx = jnp.clip(
            jax.vmap(lambda r, uu: jnp.searchsorted(r, uu, side="right"))(
                rows_cdf, u) - 1, 0, lt.n_lights - 1).astype(jnp.int32)
        return idx, lt.spat_pmf[vox, idx]
    # power: CDF inversion
    idx = jnp.searchsorted(lt.power_cdf, u, side="right").astype(jnp.int32)
    idx = jnp.minimum(idx, lt.n_lights - 1)
    return idx, lt.power_pmf[idx]


def sample_li(lt: LightTable, idx: jnp.ndarray, ref_p: jnp.ndarray,
              u2: jnp.ndarray) -> LightSample:
    """Batched Sample_Li for the chosen lights (masked over types)."""
    row = lt.rows[idx]  # ONE fused row gather (gather engine is
    kind = row[:, 0].astype(jnp.int32)  # row-count bound)
    L = row[:, 1:4]
    p0 = row[:, 4:7]
    p1 = row[:, 7:10]
    par = row[:, 10:14]
    u, v = u2[:, 0], u2[:, 1]
    wr = lt.world_radius

    # --- point / spot ---
    to_l = p0 - ref_p
    dist2 = jnp.maximum(jnp.sum(to_l * to_l, axis=-1), 1e-12)
    wi_point = to_l / jnp.sqrt(dist2)[:, None]
    li_point = L / dist2[:, None]
    # spot falloff (spot.cpp Falloff)
    cos_t = dot(-wi_point, p1)
    cos_total, cos_fall = par[:, 0], par[:, 1]
    delta = jnp.clip((cos_t - cos_total)
                     / jnp.maximum(cos_fall - cos_total, 1e-6), 0.0, 1.0)
    falloff = jnp.where(cos_t < cos_total, 0.0,
                        jnp.where(cos_t > cos_fall, 1.0, (delta ** 2) ** 2))
    li_spot = li_point * falloff[:, None]

    # --- projection / goniometric (delta position + direction-dependent
    # intensity; projection.cpp Projection, goniometric.h Scale) ---
    li_pg = li_point
    if lt.has_lightmaps:
        w2l = lt.w2l[idx]
        pr = lt.proj[idx]
        w = -wi_point  # direction FROM the light
        wl = jnp.einsum("nij,nj->ni", w2l[:, :3, :3], w)

        def pool_lookup(s, t, valid):
            wh = lt.img_wh[idx]
            has_img = wh[:, 0] > 0
            fx = jnp.clip(s, 0.0, 1.0) * (wh[:, 0] - 1).astype(jnp.float32)
            fy = jnp.clip(t, 0.0, 1.0) * (wh[:, 1] - 1).astype(jnp.float32)
            x0_ = jnp.clip(fx.astype(jnp.int32), 0,
                           jnp.maximum(wh[:, 0] - 2, 0))
            y0_ = jnp.clip(fy.astype(jnp.int32), 0,
                           jnp.maximum(wh[:, 1] - 2, 0))
            dx = fx - x0_
            dy = fy - y0_
            base = lt.img_off[idx]

            def px(xx, yy):
                i = base + jnp.minimum(yy, wh[:, 1] - 1) * wh[:, 0] \
                    + jnp.minimum(xx, wh[:, 0] - 1)
                return lt.img_pool[jnp.clip(i, 0,
                                            lt.img_pool.shape[0] - 1)]

            v = ((1 - dx)[:, None] * ((1 - dy)[:, None] * px(x0_, y0_)
                                      + dy[:, None] * px(x0_, y0_ + 1))
                 + dx[:, None] * ((1 - dy)[:, None] * px(x0_ + 1, y0_)
                                  + dy[:, None] * px(x0_ + 1, y0_ + 1)))
            v = jnp.where(has_img[:, None], v, 1.0)
            return jnp.where(valid[:, None], v, 0.0)

        # projection: perspective-project wl onto the screen window
        zc = jnp.maximum(wl[:, 2], 1e-12)
        sx = wl[:, 0] * pr[:, 4] / zc
        sy = wl[:, 1] * pr[:, 4] / zc
        in_front = wl[:, 2] >= pr[:, 5]
        inside = ((sx >= pr[:, 0]) & (sx <= pr[:, 2])
                  & (sy >= pr[:, 1]) & (sy <= pr[:, 3]))
        s_p = (sx - pr[:, 0]) / jnp.maximum(pr[:, 2] - pr[:, 0], 1e-9)
        t_p = (sy - pr[:, 1]) / jnp.maximum(pr[:, 3] - pr[:, 1], 1e-9)
        f_proj = pool_lookup(s_p, t_p, in_front & inside)

        # goniometric: spherical lookup with the reference's y/z swap
        wn = wl / jnp.maximum(jnp.linalg.norm(wl, axis=-1, keepdims=True),
                              1e-12)
        wx, wy, wz = wn[:, 0], wn[:, 2], wn[:, 1]  # swap y <-> z
        theta = jnp.arccos(jnp.clip(wz, -1.0, 1.0))
        phi = jnp.arctan2(wy, wx)
        phi = jnp.where(phi < 0, phi + 2 * np.pi, phi)
        f_gonio = pool_lookup(phi / (2 * np.pi), theta / np.pi,
                              jnp.ones_like(in_front))
        factor = jnp.where((kind == LIGHT_PROJECTION)[:, None], f_proj,
                           f_gonio)
        li_pg = li_point * factor

    # --- distant ---
    wi_dist = p0
    p_dist = ref_p + wi_dist * (2.0 * wr)

    # --- area triangle (uniform by area; triangle.cpp Sample) ---
    b0, b1 = uniform_sample_triangle(u, v)
    tv0, tv1, tv2 = row[:, 14:17], row[:, 17:20], row[:, 20:23]
    p_tri = b0[:, None] * tv0 + b1[:, None] * tv1 + (1 - b0 - b1)[:, None] * tv2
    n_tri = jnp.cross(tv1 - tv0, tv2 - tv0)
    area_tri = 0.5 * jnp.linalg.norm(n_tri, axis=-1)
    n_tri = normalize(n_tri)
    to_tri = p_tri - ref_p
    d2_tri = jnp.maximum(jnp.sum(to_tri * to_tri, axis=-1), 1e-12)
    wi_tri = to_tri / jnp.sqrt(d2_tri)[:, None]
    cos_l_tri = jnp.abs(dot(n_tri, -wi_tri))
    pdf_tri = d2_tri / jnp.maximum(cos_l_tri * area_tri, 1e-12)
    two_sided = par[:, 3] > 0
    emits_tri = two_sided | (dot(n_tri, -wi_tri) > 0)
    li_tri = jnp.where(emits_tri[:, None], L, 0.0)

    # --- area sphere (cone sampling outside; sphere.cpp Sample(ref)) ---
    c = p0
    r = par[:, 2]
    to_c = c - ref_p
    dc2 = jnp.maximum(jnp.sum(to_c * to_c, axis=-1), 1e-12)
    dc = jnp.sqrt(dc2)
    outside = dc2 > r * r * (1.0 + 1e-4)
    # cone frame toward the sphere center
    wz = to_c / dc[:, None]
    tx, ty = build_onb(wz)
    sin2_max = jnp.clip(r * r / dc2, 0.0, 1.0)
    cos_max = jnp.sqrt(jnp.maximum(0.0, 1.0 - sin2_max))
    wi_cone_local = uniform_sample_cone(u, v, cos_max)
    wi_sph = to_world(tx, ty, wz, wi_cone_local)
    # project to the sphere surface: nearest intersection distance
    cos_theta = wi_cone_local[:, 2]
    ds = dc * cos_theta - jnp.sqrt(jnp.maximum(
        r * r - dc2 * (1.0 - cos_theta * cos_theta), 0.0))
    p_sph = ref_p + ds[:, None] * wi_sph
    # snap to the surface
    p_sph = c + r[:, None] * normalize(p_sph - c)
    pdf_sph_out = uniform_cone_pdf(cos_max)
    # inside: uniform over sphere area
    dir_in = uniform_sample_sphere(u, v)
    p_in = c + r[:, None] * dir_in
    to_in = p_in - ref_p
    d2_in = jnp.maximum(jnp.sum(to_in * to_in, axis=-1), 1e-12)
    wi_in = to_in / jnp.sqrt(d2_in)[:, None]
    cos_in = jnp.abs(dot(dir_in, -wi_in))
    pdf_in = d2_in / jnp.maximum(
        cos_in * 4 * np.pi * r * r, 1e-12)
    wi_sphere = jnp.where(outside[:, None], wi_sph, wi_in)
    p_sphere = jnp.where(outside[:, None], p_sph, p_in)
    pdf_sphere = jnp.where(outside, pdf_sph_out, pdf_in)
    n_sphere = normalize(p_sphere - c)
    emits_sph = (par[:, 3] > 0) | (dot(n_sphere, -wi_sphere) > 0)
    li_sphere = jnp.where(emits_sph[:, None], L, 0.0)

    # --- infinite: envmap 2D-CDF importance sampling when a map exists,
    # else uniform sphere over constant radiance (infinite.cpp Sample_Li) ---
    if lt.env_light_row >= 0:
        wi_inf, li_env, pdf_inf = env_sample(lt, u, v)
        li_inf = li_env
    else:
        wi_inf = uniform_sample_sphere(u, v)
        pdf_inf = jnp.full(u.shape, 1.0 / (4 * np.pi), jnp.float32)
        li_inf = L
    p_inf = ref_p + wi_inf * (2.0 * wr)

    def sel(k):
        return (kind == k)[:, None]

    pg = sel(LIGHT_PROJECTION) | sel(LIGHT_GONIO)
    wi = jnp.where(sel(LIGHT_POINT) | sel(LIGHT_SPOT) | pg, wi_point,
         jnp.where(sel(LIGHT_DISTANT), wi_dist,
         jnp.where(sel(LIGHT_AREA_TRI), wi_tri,
         jnp.where(sel(LIGHT_AREA_SPHERE), wi_sphere, wi_inf))))
    li = jnp.where(sel(LIGHT_POINT), li_point,
         jnp.where(sel(LIGHT_SPOT), li_spot,
         jnp.where(pg, li_pg,
         jnp.where(sel(LIGHT_DISTANT), L,
         jnp.where(sel(LIGHT_AREA_TRI), li_tri,
         jnp.where(sel(LIGHT_AREA_SPHERE), li_sphere, li_inf))))))
    pdf = jnp.where(kind == LIGHT_AREA_TRI, pdf_tri,
          jnp.where(kind == LIGHT_AREA_SPHERE, pdf_sphere,
          jnp.where(kind == LIGHT_INFINITE, pdf_inf, 1.0)))
    p_light = jnp.where(sel(LIGHT_POINT) | sel(LIGHT_SPOT) | pg, p0,
              jnp.where(sel(LIGHT_DISTANT), p_dist,
              jnp.where(sel(LIGHT_AREA_TRI), p_tri,
              jnp.where(sel(LIGHT_AREA_SPHERE), p_sphere, p_inf))))
    is_delta = ((kind == LIGHT_POINT) | (kind == LIGHT_SPOT)
                | (kind == LIGHT_DISTANT) | (kind == LIGHT_PROJECTION)
                | (kind == LIGHT_GONIO))

    return LightSample(wi=wi, li=li, pdf=pdf, p_light=p_light,
                       light_idx=idx, choice_pmf=jnp.ones_like(pdf),
                       is_delta=is_delta)


def pdf_li_from_hit(lt: LightTable, light_idx: jnp.ndarray,
                    ref_p: jnp.ndarray, wi: jnp.ndarray,
                    p_hit: jnp.ndarray, ng_hit: jnp.ndarray) -> jnp.ndarray:
    """Solid-angle pdf that Sample_Li would have generated wi from ref_p —
    used for the MIS weight when a BSDF-sampled ray lands on a light
    (DiffuseAreaLight::Pdf_Li -> shape Pdf(ref, wi))."""
    row = lt.rows[light_idx]  # one fused row gather
    kind = row[:, 0].astype(jnp.int32)
    par = row[:, 10:14]

    to_hit = p_hit - ref_p
    d2 = jnp.maximum(jnp.sum(to_hit * to_hit, axis=-1), 1e-12)
    cos_l = jnp.abs(dot(ng_hit, -wi))

    # triangle: area pdf -> solid angle
    tv0 = row[:, 14:17]
    tv1 = row[:, 17:20]
    tv2 = row[:, 20:23]
    area_tri = 0.5 * jnp.linalg.norm(jnp.cross(tv1 - tv0, tv2 - tv0), axis=-1)
    pdf_tri = d2 / jnp.maximum(cos_l * area_tri, 1e-12)

    # sphere: cone pdf from ref (outside) or area pdf (inside)
    c = row[:, 4:7]
    r = par[:, 2]
    to_c = c - ref_p
    dc2 = jnp.maximum(jnp.sum(to_c * to_c, axis=-1), 1e-12)
    outside = dc2 > r * r * (1.0 + 1e-4)
    sin2_max = jnp.clip(r * r / dc2, 0.0, 1.0)
    cos_max = jnp.sqrt(jnp.maximum(0.0, 1.0 - sin2_max))
    pdf_cone = uniform_cone_pdf(cos_max)
    pdf_area = d2 / jnp.maximum(cos_l * 4 * np.pi * r * r, 1e-12)
    pdf_sph = jnp.where(outside, pdf_cone, pdf_area)

    if lt.env_light_row >= 0:
        pdf_inf = env_pdf(lt, wi)
    else:
        pdf_inf = jnp.full(d2.shape, 1.0 / (4 * np.pi), jnp.float32)

    return jnp.where(kind == LIGHT_AREA_TRI, pdf_tri,
           jnp.where(kind == LIGHT_AREA_SPHERE, pdf_sph,
           jnp.where(kind == LIGHT_INFINITE, pdf_inf, 0.0)))


# ---------------------------------------------------------------------------
# environment map (infinite.cpp): direction <-> (u,v), sampling, pdf, Le
# ---------------------------------------------------------------------------

def _env_dir_to_uv(lt: LightTable, d):
    m = lt.env_w2l
    x = m[0, 0] * d[:, 0] + m[0, 1] * d[:, 1] + m[0, 2] * d[:, 2]
    y = m[1, 0] * d[:, 0] + m[1, 1] * d[:, 1] + m[1, 2] * d[:, 2]
    z = m[2, 0] * d[:, 0] + m[2, 1] * d[:, 1] + m[2, 2] * d[:, 2]
    theta = jnp.arccos(jnp.clip(z, -1.0, 1.0))
    phi = jnp.arctan2(y, x)
    phi = jnp.where(phi < 0, phi + 2 * np.pi, phi)
    return phi * (0.5 / np.pi), theta * (1.0 / np.pi), theta


def _cdf_invert(cdf, u):
    """Continuous inversion of a (n+1,) CDF: returns (index, fraction,
    pdf) like Distribution1D::SampleContinuous."""
    n = cdf.shape[0] - 1
    i = jnp.clip(jnp.searchsorted(cdf, u, side="right") - 1, 0, n - 1)
    lo = cdf[i]
    hi = cdf[i + 1]
    du = jnp.where(hi > lo, (u - lo) / jnp.maximum(hi - lo, 1e-20), 0.0)
    pdf = (hi - lo) * n
    return i, du, pdf


def env_sample(lt: LightTable, u1, u2):
    """Sample the environment map: returns (wi, Li, solid-angle pdf)."""
    he, we = lt.env_map.shape[:2]
    vi, dv, pdf_v = _cdf_invert(lt.env_marg_cdf, u2)
    rows = lt.env_cond_cdf[vi]  # (N, we+1)
    nn = rows.shape[0]
    # per-lane row CDF inversion
    ui = jnp.clip(
        jax.vmap(lambda r, uu: jnp.searchsorted(r, uu, side="right"))(rows, u1)
        - 1, 0, we - 1)
    lane = jnp.arange(nn)
    lo = rows[lane, ui]
    hi = rows[lane, ui + 1]
    du = jnp.where(hi > lo, (u1 - lo) / jnp.maximum(hi - lo, 1e-20), 0.0)
    pdf_u = (hi - lo) * we
    uu = (ui.astype(jnp.float32) + du) / we
    vv = (vi.astype(jnp.float32) + dv) / he
    theta = vv * np.pi
    phi = uu * 2 * np.pi
    sin_t = jnp.sin(theta)
    wl = jnp.stack([sin_t * jnp.cos(phi), sin_t * jnp.sin(phi),
                    jnp.cos(theta)], axis=-1)
    m = lt.env_l2w
    wi = jnp.stack([
        m[0, 0] * wl[:, 0] + m[0, 1] * wl[:, 1] + m[0, 2] * wl[:, 2],
        m[1, 0] * wl[:, 0] + m[1, 1] * wl[:, 1] + m[1, 2] * wl[:, 2],
        m[2, 0] * wl[:, 0] + m[2, 1] * wl[:, 1] + m[2, 2] * wl[:, 2],
    ], axis=-1)
    li = lt.env_map[jnp.clip(vi, 0, he - 1), jnp.clip(ui, 0, we - 1)]
    pdf = jnp.where(sin_t > 1e-7,
                    pdf_u * pdf_v / (2.0 * np.pi * np.pi * sin_t), 0.0)
    return wi, li, pdf


def env_pdf(lt: LightTable, wi):
    """Solid-angle pdf of env_sample producing wi (infinite.cpp Pdf_Li)."""
    he, we = lt.env_map.shape[:2]
    uu, vv, theta = _env_dir_to_uv(lt, wi)
    ui = jnp.clip((uu * we).astype(jnp.int32), 0, we - 1)
    vi = jnp.clip((vv * he).astype(jnp.int32), 0, he - 1)
    pdf_v = (lt.env_marg_cdf[vi + 1] - lt.env_marg_cdf[vi]) * he
    lane_rows = lt.env_cond_cdf[vi]
    n = lane_rows.shape[0]
    lane = jnp.arange(n)
    pdf_u = (lane_rows[lane, ui + 1] - lane_rows[lane, ui]) * we
    sin_t = jnp.sin(theta)
    return jnp.where(sin_t > 1e-7,
                     pdf_u * pdf_v / (2.0 * np.pi * np.pi * sin_t), 0.0)


def env_le(lt: LightTable, d):
    """Escaped-ray radiance from the environment map (infinite.cpp Le),
    bilinear-filtered."""
    he, we = lt.env_map.shape[:2]
    uu, vv, _ = _env_dir_to_uv(lt, d)
    x = uu * we - 0.5
    y = vv * he - 0.5
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = (x - x0)[:, None]
    fy = (y - y0)[:, None]

    def fetch(xi, yi):
        return lt.env_map[jnp.clip(yi, 0, he - 1), jnp.mod(xi, we)]

    c00 = fetch(x0, y0)
    c10 = fetch(x0 + 1, y0)
    c01 = fetch(x0, y0 + 1)
    c11 = fetch(x0 + 1, y0 + 1)
    return ((c00 * (1 - fx) + c10 * fx) * (1 - fy)
            + (c01 * (1 - fx) + c11 * fx) * fy)


# ---------------------------------------------------------------------------
# emission sampling (Sample_Le / Pdf_Le) — bidirectional transport support
# Reference analog: light.h:75 Sample_Le/Pdf_Le and the per-type
# implementations (point.cpp:58, spot.cpp:87, distant.cpp:55,
# diffuse.cpp:92, infinite.cpp:129).
# ---------------------------------------------------------------------------

class LeSample(NamedTuple):
    p: jnp.ndarray        # (N,3) point on the light (ray origin)
    n: jnp.ndarray        # (N,3) light normal at p (emission side)
    d: jnp.ndarray        # (N,3) emitted ray direction
    le: jnp.ndarray       # (N,3) emitted radiance / intensity
    pdf_pos: jnp.ndarray  # (N,) area pdf of p
    pdf_dir: jnp.ndarray  # (N,) solid-angle pdf of d (given p)
    is_delta_pos: jnp.ndarray  # (N,) point-like light (pdf_pos is a delta)
    is_infinite: jnp.ndarray   # (N,)


def sample_le(lt: LightTable, idx: jnp.ndarray, u1, u2, u3, u4) -> LeSample:
    """Batched Sample_Le for the chosen light rows; (u1,u2) sample the
    position, (u3,u4) the direction (pbrt's two 2D samples)."""
    row = lt.rows[idx]  # one fused row gather
    kind = row[:, 0].astype(jnp.int32)
    L = row[:, 1:4]
    p0 = row[:, 4:7]
    p1 = row[:, 7:10]
    par = row[:, 10:14]
    wr = lt.world_radius
    wc = lt.world_center
    n_lanes = idx.shape[0]
    two_sided = par[:, 3] > 0

    # --- point: uniform sphere direction (point.cpp:58) ---
    d_sph = uniform_sample_sphere(u3, u4)
    pdfdir_point = jnp.full((n_lanes,), 1.0 / (4 * np.pi), jnp.float32)

    # --- spot: uniform cone about the axis (spot.cpp:87) ---
    cos_total = par[:, 0]
    d_cone_l = uniform_sample_cone(u3, u4, cos_total)
    tx, ty = build_onb(p1)
    d_spot = to_world(tx, ty, p1, d_cone_l)
    # falloff at the sampled direction
    cos_t = dot(d_spot, p1)
    cos_fall = par[:, 1]
    delta_f = jnp.clip((cos_t - cos_total)
                       / jnp.maximum(cos_fall - cos_total, 1e-6), 0.0, 1.0)
    falloff = jnp.where(cos_t < cos_total, 0.0,
                        jnp.where(cos_t > cos_fall, 1.0, (delta_f ** 2) ** 2))
    pdfdir_spot = uniform_cone_pdf(cos_total)

    # --- distant: disk of world radius perpendicular to the direction
    # (distant.cpp:55); p0 points TOWARD the light, emission goes -p0 ---
    d_dist = -p0
    txd, tyd = build_onb(d_dist)
    cdx, cdy = concentric_sample_disk(u1, u2)
    p_disk = (wc + wr * (cdx[:, None] * txd + cdy[:, None] * tyd)
              - wr * d_dist)
    pdfpos_disk = jnp.full((n_lanes,), 1.0 / (np.pi * wr * wr), jnp.float32)

    # --- area triangle: uniform by area + cosine hemisphere (diffuse.cpp:92)
    b0, b1 = uniform_sample_triangle(u1, u2)
    tv0, tv1, tv2 = row[:, 14:17], row[:, 17:20], row[:, 20:23]
    p_tri = b0[:, None] * tv0 + b1[:, None] * tv1 + (1 - b0 - b1)[:, None] * tv2
    n_cross = jnp.cross(tv1 - tv0, tv2 - tv0)
    area_tri = 0.5 * jnp.linalg.norm(n_cross, axis=-1)
    n_tri = normalize(n_cross)
    # cosine hemisphere; two-sided: u3 picks the side then is remapped
    # (diffuse.cpp:100-110)
    u3_t = jnp.where(two_sided, jnp.minimum(u3 * 2.0, 0.9999994)
                     % 1.0, u3)
    flip = two_sided & (u3 >= 0.5)
    w_local = cosine_sample_hemisphere(u3_t, u4)
    pdfdir_cos = jnp.maximum(w_local[:, 2], 0.0) / np.pi
    pdfdir_cos = jnp.where(two_sided, 0.5 * pdfdir_cos, pdfdir_cos)
    ttx, tty = build_onb(n_tri)
    d_tri = to_world(ttx, tty, n_tri, w_local)
    d_tri = jnp.where(flip[:, None], -d_tri, d_tri)
    n_emit_tri = jnp.where(flip[:, None], -n_tri, n_tri)
    pdfpos_tri = 1.0 / jnp.maximum(area_tri, 1e-12)

    # --- area sphere: uniform area + cosine hemisphere ---
    c = p0
    r = par[:, 2]
    n_sph = uniform_sample_sphere(u1, u2)
    p_sph = c + r[:, None] * n_sph
    stx, sty = build_onb(n_sph)
    d_sphl = to_world(stx, sty, n_sph, w_local)
    d_sphl = jnp.where(flip[:, None], -d_sphl, d_sphl)
    n_emit_sph = jnp.where(flip[:, None], -n_sph, n_sph)
    pdfpos_sph = 1.0 / jnp.maximum(4 * np.pi * r * r, 1e-12)

    # --- infinite: direction from the env distribution (or uniform),
    # position on a world-radius disk behind it (infinite.cpp:129) ---
    if lt.env_light_row >= 0:
        wi_env, le_env, pdf_env = env_sample(lt, u3, u4)
        d_inf = -wi_env
        le_inf = le_env
        pdfdir_inf = pdf_env
    else:
        d_inf = -uniform_sample_sphere(u3, u4)
        le_inf = L
        pdfdir_inf = jnp.full((n_lanes,), 1.0 / (4 * np.pi), jnp.float32)
    txi, tyi = build_onb(d_inf)
    p_inf = (wc + wr * (cdx[:, None] * txi + cdy[:, None] * tyi)
             - wr * d_inf)

    def sel(k):
        return (kind == k)[:, None]

    is_point = (kind == LIGHT_POINT) | (kind == LIGHT_SPOT)
    p = jnp.where(is_point[:, None], p0,
        jnp.where(sel(LIGHT_DISTANT), p_disk,
        jnp.where(sel(LIGHT_AREA_TRI), p_tri,
        jnp.where(sel(LIGHT_AREA_SPHERE), p_sph, p_inf))))
    d = jnp.where(sel(LIGHT_POINT), d_sph,
        jnp.where(sel(LIGHT_SPOT), d_spot,
        jnp.where(sel(LIGHT_DISTANT), d_dist,
        jnp.where(sel(LIGHT_AREA_TRI), d_tri,
        jnp.where(sel(LIGHT_AREA_SPHERE), d_sphl, d_inf)))))
    n = jnp.where(sel(LIGHT_AREA_TRI), n_emit_tri,
        jnp.where(sel(LIGHT_AREA_SPHERE), n_emit_sph, d))
    le = jnp.where(sel(LIGHT_SPOT), L * falloff[:, None],
         jnp.where(sel(LIGHT_INFINITE), le_inf, L))
    pdf_pos = jnp.where(is_point, 1.0,
              jnp.where(kind == LIGHT_AREA_TRI, pdfpos_tri,
              jnp.where(kind == LIGHT_AREA_SPHERE, pdfpos_sph,
                        pdfpos_disk)))
    pdf_dir = jnp.where(kind == LIGHT_POINT, pdfdir_point,
              jnp.where(kind == LIGHT_SPOT, pdfdir_spot,
              jnp.where(kind == LIGHT_DISTANT, 1.0,
              jnp.where(kind == LIGHT_INFINITE, pdfdir_inf, pdfdir_cos))))
    return LeSample(p=p, n=n, d=d, le=le, pdf_pos=pdf_pos, pdf_dir=pdf_dir,
                    is_delta_pos=is_point | (kind == LIGHT_DISTANT),
                    is_infinite=kind == LIGHT_INFINITE)


def pdf_le(lt: LightTable, idx: jnp.ndarray, p: jnp.ndarray, n: jnp.ndarray,
           d: jnp.ndarray):
    """(pdf_pos, pdf_dir) that Sample_Le would give for an emitted ray
    (p, d) with light normal n at p (Pdf_Le per type)."""
    row = lt.rows[idx]  # one fused row gather
    kind = row[:, 0].astype(jnp.int32)
    par = row[:, 10:14]
    wr = lt.world_radius
    r = par[:, 2]
    two_sided = par[:, 3] > 0

    tv0, tv1, tv2 = row[:, 14:17], row[:, 17:20], row[:, 20:23]
    area_tri = 0.5 * jnp.linalg.norm(jnp.cross(tv1 - tv0, tv2 - tv0), axis=-1)
    cosl = dot(n, d)
    pdfdir_cos = jnp.where(two_sided, 0.5 * jnp.abs(cosl) / np.pi,
                           jnp.maximum(cosl, 0.0) / np.pi)

    cos_total = par[:, 0]
    pdf_pos = jnp.where(kind == LIGHT_AREA_TRI,
                        1.0 / jnp.maximum(area_tri, 1e-12),
              jnp.where(kind == LIGHT_AREA_SPHERE,
                        1.0 / jnp.maximum(4 * np.pi * r * r, 1e-12),
              jnp.where((kind == LIGHT_DISTANT) | (kind == LIGHT_INFINITE),
                        1.0 / (np.pi * wr * wr), 1.0)))
    if lt.env_light_row >= 0:
        pdfdir_inf = env_pdf(lt, -d)
    else:
        pdfdir_inf = jnp.full(cosl.shape, 1.0 / (4 * np.pi), jnp.float32)
    pdf_dir = jnp.where(kind == LIGHT_POINT, 1.0 / (4 * np.pi),
              jnp.where(kind == LIGHT_SPOT, uniform_cone_pdf(cos_total),
              jnp.where(kind == LIGHT_DISTANT, 1.0,
              jnp.where(kind == LIGHT_INFINITE, pdfdir_inf, pdfdir_cos))))
    return pdf_pos, pdf_dir


def light_normal_at(lt: LightTable, idx: jnp.ndarray, p: jnp.ndarray):
    """Geometric normal of the light's surface at a point p on it (area
    lights; delta/infinite rows return an arbitrary unit vector — their
    emission pdfs never use it)."""
    row = lt.rows[idx]  # one fused row gather
    kind = row[:, 0].astype(jnp.int32)
    tv0, tv1, tv2 = row[:, 14:17], row[:, 17:20], row[:, 20:23]
    n_tri = normalize(jnp.cross(tv1 - tv0, tv2 - tv0))
    n_sph = normalize(p - row[:, 4:7])
    n = jnp.where((kind == LIGHT_AREA_TRI)[:, None], n_tri,
        jnp.where((kind == LIGHT_AREA_SPHERE)[:, None], n_sph, 0.0))
    fallback = jnp.zeros_like(p).at[:, 2].set(1.0)
    return jnp.where((kind == LIGHT_AREA_TRI)[:, None]
                     | (kind == LIGHT_AREA_SPHERE)[:, None], n, fallback)
