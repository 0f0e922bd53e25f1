"""Stochastic progressive photon mapping — wavefront TPU formulation.

Reference analog: integrators/sppm.{h,cpp}.  The reference keeps an
`SPPMPixel` per pixel (radius, Ld, visible point, Phi/M atomics, N, tau;
sppm.cpp:63-87) and, per iteration, runs (1) a camera pass that stops at
the first diffuse vertex and stores a visible point, (2) a spatial hash
grid build over visible points (linked lists under a CAS loop,
sppm.cpp:240-300), (3) a photon pass that walks light paths and splats
photon contributions onto nearby visible points via atomic adds
(sppm.cpp:304-414), and (4) the radius/tau statistics update
(sppm.cpp:417-445).

TPU design — no atomics, no linked lists, no per-pixel recursion:

* SPPMPixels is a struct-of-arrays over the (flattened) film: every field
  is a dense (P,) / (P,3) tensor living in HBM; the per-iteration update
  is a pure function.
* The camera pass is the same wavefront bounce-scan as the path
  integrator (stream of lanes, `lax.scan` over depth); "stop at the first
  diffuse vertex" becomes a `vp_taken` mask + one extra MIS emission-probe
  bounce, which replaces EstimateDirect's BSDF-sampled half with the
  standard path-MIS continuation estimator (same expectation).
* The grid is rebuilt per iteration as a hash-sorted (cell-hash, vp)
  entry list: pairs are expanded (27 candidate cells per VP bound the
  ±radius window) and sorted by hash; each photon locates its cell's run
  with two searchsorteds and walks it under a `fori_loop` whose traced
  upper bound is the max bucket occupancy — an exact, deterministic,
  atomics-free replacement for the reference's compare-exchange linked
  lists with the same adaptive cost.
* The photon pass walks light subpaths (Sample_Le; power distribution,
  like ComputeLightPowerDistribution at sppm.cpp:120) driven by the
  radical-inverse sequence of the photon's global Halton index
  (sppm.cpp:316-330), then deposits every recorded photon hit onto the
  ≤C visible points of its grid cell with masked scatter-adds — the
  AtomicFloat Phi / atomic M of the reference become `.at[].add`s.

Deviations from the reference (documented, all estimator-neutral):
  - EstimateDirect's BSDF half -> path-MIS emission probe (see above).
  - BSDF lobe selection consumes its own radical-inverse dimension (the
    reference remaps u[0]); photon dims advance 4/bounce instead of 3.
"""

from __future__ import annotations

import logging
import time
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from tpurt.config import get_config

from tpurt.render.film import FilmState
from tpurt.render.integrator import (CAMERA_DIMS, DIMS_PER_BOUNCE, INF,
                                     SceneData, _camera_setup, _choice_pmf_at,
                                     _emitted, _escape_pdf, _escape_radiance,
                                     _infinite_L, _lift_illum_maybe, _nee,
                                     make_shade_ctx, shade_f, shade_sample,
                                     zero_shade_ctx)
from tpurt.render.integrator import _nee_prepare, _nee_resolve
from tpurt.render.interaction import compute_interaction, offset_ray_origin
from tpurt.render.intersect import (Hit, intersect_any, intersect_closest,
                                    intersect_mixed)
from tpurt.render.lights import choose_light, pdf_li_from_hit, sample_le
from tpurt.render.sampling_warps import dot, power_heuristic
from tpurt.sampling import lowdiscrepancy as ld
from tpurt.sampling.samplers import (ONE_MINUS_EPS, _digits_needed,
                                     _radical_inverse, make_halton)
from tpurt.utils.stats import STATS, ProgressReporter

log = logging.getLogger("tpurt.render")


def _lum(c):
    """Spectrum::y(): RGB weights (spectrum.h:440) or the CIE-Y bin
    quadrature in sampled mode (spectrum.h:315)."""
    if c.shape[-1] != 3:
        from tpurt.spectrum_sampled import luminance_bins

        return luminance_bins(c)
    return (0.212671 * c[..., 0] + 0.715160 * c[..., 1]
            + 0.072169 * c[..., 2])


# ---------------------------------------------------------------------------
# per-pixel SoA state (SPPMPixel, sppm.cpp:63-87)
# ---------------------------------------------------------------------------

class SPPMPixels(NamedTuple):
    radius: jnp.ndarray    # (P,)
    Ld: jnp.ndarray        # (P,3) accumulated direct light (sum over iters)
    N: jnp.ndarray         # (P,)  accumulated photon count (gamma-weighted)
    tau: jnp.ndarray       # (P,3)
    Phi: jnp.ndarray       # (P,3) this-iteration photon sum
    M: jnp.ndarray         # (P,)  this-iteration photon count
    vp_valid: jnp.ndarray  # (P,) bool
    vp_p: jnp.ndarray      # (P,3)
    vp_wo: jnp.ndarray     # (P,3) world-space
    vp_ns: jnp.ndarray     # (P,3) shading normal (local BSDF frame)
    vp_beta: jnp.ndarray   # (P,3)
    vp_shade: object       # ShadeCtx, each leaf (P, ...) — full material
                           # context incl. hair/fourier


def _init_pixels(n_pix: int, initial_radius: float,
                 scene: SceneData = None, nch: int = 3) -> SPPMPixels:
    # distinct buffers per field: the state is donated into the jitted
    # passes, and XLA rejects donating one buffer twice.  scene supplies
    # the static material-context structure (hair/fourier present or
    # not); None means neither.  nch: color channels (60 in sampled-
    # spectrum mode; positions/normals stay 3-vectors).
    if scene is None:
        scene = type("_NoMat", (), {"has_hair": False,
                                    "has_fourier": False})()
    z3 = lambda: jnp.zeros((n_pix, 3), jnp.float32)
    zc = lambda: jnp.zeros((n_pix, nch), jnp.float32)
    z1 = lambda: jnp.zeros((n_pix,), jnp.float32)
    return SPPMPixels(
        radius=z1() + initial_radius, Ld=zc(), N=z1(), tau=zc(), Phi=zc(),
        M=z1(), vp_valid=jnp.zeros((n_pix,), bool), vp_p=z3(), vp_wo=z3(),
        vp_ns=z3(), vp_beta=zc(),
        vp_shade=zero_shade_ctx(scene, n_pix, channels=nch))


# ---------------------------------------------------------------------------
# camera pass (sppm.cpp:135-236)
# ---------------------------------------------------------------------------

def _camera_chunk(scene: SceneData, camera, smplr, px, py, sidx, mask,
                  max_depth: int, texture_eval, nch: int = 3):
    """One wavefront of camera paths: returns per-lane direct light and
    the visible point (first diffuse vertex, or glossy at the last
    bounce; sppm.cpp:203-214), plus one MIS emission-probe bounce."""
    n = px.shape[0]
    _, _, _, o, d, ray_w, sctx, l_time = _camera_setup(smplr, camera, px,
                                                       py, sidx, (0, 0))
    inf_L, _ = _infinite_L(scene.lights)
    has_inf = scene.lights.has_infinite

    zsh = zero_shade_ctx(scene, n, channels=nch)
    v0 = px.astype(jnp.float32) * 0.0
    v03 = v0[:, None] * jnp.ones((1, 3), jnp.float32)
    v0c = v0[:, None] * jnp.ones((1, nch), jnp.float32)

    # shade-then-trace with the fused shadow+closest traversal, exactly
    # like path_radiance (see integrator.py); bit-identical either way
    fuse = get_config().fuse_shadow_rays

    def bounce_body(carry, bounce):
        (o, d, hit_t, hit_prim, hit_b0, hit_b1, beta, Ld, alive, specular,
         prev_pdf, prev_p, vp_taken, probe, vp) = carry

        hit = Hit(t=hit_t, prim=hit_prim, b0=hit_b0, b1=hit_b1)
        si = compute_interaction(scene.geo, hit, o, d,
                                 tangents=scene.has_tangents, time=l_time)

        # emitted light with path-MIS weights (depth0/specular -> 1);
        # sppm accumulates into Ld, not L (sppm.cpp:195-200)
        Le, lrow = _emitted(scene, si)
        Le = _lift_illum_maybe(Le, nch)
        lrow_c = jnp.maximum(lrow, 0)
        light_pdf = pdf_li_from_hit(scene.lights, lrow_c, prev_p, d,
                                    si.p, si.ng)
        pmf = _choice_pmf_at(scene, lrow_c, "uniform", n, prev_p)
        w_mis = power_heuristic(1.0, prev_pdf, 1.0, light_pdf * pmf)
        w_emit = jnp.where((bounce == 0) | specular, 1.0, w_mis)
        # at the extra scan step past max_depth only probe lanes may still
        # collect emission (reference truncates plain paths at maxDepth)
        emit_ok = alive & ((bounce < max_depth) | probe)
        Ld = Ld + jnp.where((emit_ok & si.valid)[:, None],
                            beta * Le * w_emit[:, None], 0.0)
        if has_inf:
            pmf_inf = 1.0 / scene.lights.n_lights
            w_inf = jnp.where(
                (bounce == 0) | specular, 1.0,
                power_heuristic(1.0, prev_pdf, 1.0,
                                _escape_pdf(scene.lights, d) * pmf_inf))
            Le_inf = _lift_illum_maybe(
                _escape_radiance(scene.lights, inf_L, d), nch)
            Ld = Ld + jnp.where((emit_ok & ~si.valid)[:, None],
                                beta * Le_inf * w_inf[:, None], 0.0)

        # probe lanes accumulated their emission above and stop here
        alive = alive & si.valid & ~probe & (bounce < max_depth)

        shade = make_shade_ctx(scene, si, texture_eval, channels=nch)
        act = shade.lobes.active
        any_lobe = jnp.any(act, axis=-1)
        is_diffuse = act[:, 0]
        is_glossy = act[:, 1]
        # hair/fourier count as glossy components (HairBSDF/FourierBSDF
        # are BSDF_GLOSSY in the reference)
        if shade.is_hair is not None:
            any_lobe = any_lobe | shade.is_hair
            is_glossy = is_glossy | shade.is_hair
        if shade.is_fourier is not None:
            any_lobe = any_lobe | shade.is_fourier
            is_glossy = is_glossy | shade.is_fourier
        alive = alive & any_lobe

        # visible-point storage rule (sppm.cpp:203-214): first diffuse
        # vertex, or glossy at the final camera bounce
        store = alive & ~vp_taken & (is_diffuse
                                     | (is_glossy & (bounce == max_depth - 1)))
        s3 = store[:, None]
        vp = dict(
            valid=vp['valid'] | store,
            p=jnp.where(s3, si.p, vp['p']),
            wo=jnp.where(s3, si.wo, vp['wo']),
            ns=jnp.where(s3, si.ns, vp['ns']),
            beta=jnp.where(s3, beta, vp['beta']),
            shade=jax.tree_util.tree_map(
                lambda new, old: jnp.where(
                    s3 if new.ndim == 2 else store, new, old),
                shade, vp['shade']),
        )
        vp_taken = vp_taken | store

        # NEE at every vertex (UniformSampleOneLight, sppm.cpp:201)
        d0 = CAMERA_DIMS + bounce * DIMS_PER_BOUNCE
        u_choice = smplr.dim_dyn(px, py, sidx, d0, sctx)
        u_light = jnp.stack([smplr.dim_dyn(px, py, sidx, d0 + 1, sctx),
                             smplr.dim_dyn(px, py, sidx, d0 + 2, sctx)],
                            axis=-1)
        has_smooth = is_diffuse | is_glossy
        hair_ctx = (None if shade.is_hair is None
                    else (shade.is_hair, shade.hair))
        fourier_ctx = (None if shade.is_fourier is None
                       else (shade.is_fourier, shade.fourier_tix))
        nee_c, o_sh, wi_sh, t_sh, nee_ok = _nee_prepare(
            scene, si, shade.lobes, u_choice, u_light, "uniform",
            alive & has_smooth, hair_ctx=hair_ctx, fourier_ctx=fourier_ctx)
        beta_nee = beta

        # BSDF continuation; stored lanes continue exactly one more bounce
        # as the MIS emission probe
        u_lobe = smplr.dim_dyn(px, py, sidx, d0 + 3, sctx)
        u1 = smplr.dim_dyn(px, py, sidx, d0 + 4, sctx)
        u2 = smplr.dim_dyn(px, py, sidx, d0 + 5, sctx)
        wi, f, pdf, is_spec, _ = shade_sample(scene, shade, si.ns, si.wo,
                                              u_lobe, u1, u2)
        ok = alive & (pdf > 0) & jnp.any(f > 0, axis=-1)
        beta = jnp.where(ok[:, None],
                         beta * f * (jnp.abs(dot(wi, si.ns))
                                     / jnp.maximum(pdf, 1e-20))[:, None],
                         beta)
        alive = ok
        probe = store & ok
        specular = is_spec
        prev_pdf = jnp.maximum(pdf, 1e-20)
        prev_p = si.p
        o = offset_ray_origin(si.p, si.ng, wi, si.p_eps)
        d = wi

        # beta-threshold termination (sppm.cpp:225-230), skipped on probes
        u_rr = smplr.dim_dyn(px, py, sidx, d0 + 6, sctx)
        y = _lum(beta)
        do_rr = alive & ~probe & (y < 0.25)
        q = jnp.minimum(1.0, y)
        killed = do_rr & (u_rr > q)
        alive = alive & ~killed
        beta = jnp.where((do_rr & ~killed)[:, None],
                         beta / jnp.maximum(q, 1e-6)[:, None], beta)

        # trace: next closest + this bounce's shadow (fused or separate)
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
        Ld = Ld + beta_nee * _nee_resolve(nee_c, nee_ok, occluded)

        return (o, d, hit_next.t, hit_next.prim, hit_next.b0, hit_next.b1,
                beta, Ld, alive, specular, prev_pdf, prev_p,
                vp_taken, probe, vp), None

    vp0 = dict(valid=px != px, p=v03, wo=v03, ns=v03, beta=v0c, shade=zsh)
    alive0 = (px == px) & mask
    hit0 = intersect_closest(scene.geo, o, d,
                             jnp.where(alive0, INF, 0.0), time=l_time)
    init = (o, d, hit0.t, hit0.prim, hit0.b0, hit0.b1,
            v0c + ray_w[:, None], v0c, alive0,
            px != px, v0 + 1.0, o, px != px, px != px, vp0)
    carry, _ = jax.lax.scan(bounce_body, init,
                            jnp.arange(max_depth + 1, dtype=jnp.int32))
    Ld, vp = carry[7], carry[14]
    return Ld, vp


# ---------------------------------------------------------------------------
# grid (sppm.cpp:240-300)
# ---------------------------------------------------------------------------

def _to_grid(p, lo, diag, res):
    """ToGrid (sppm.cpp:92-101): traced bounds/resolution."""
    pg = (p - lo) / jnp.maximum(diag, 1e-20)
    pi = (res.astype(jnp.float32) * pg).astype(jnp.int32)
    inb = jnp.all((pi >= 0) & (pi < res), axis=-1)
    return jnp.clip(pi, 0, res - 1), inb


def _cell_hash(c, hash_size: int):
    """hash() (sppm.cpp:103-107) with uint32 wraparound semantics."""
    x = c[..., 0].astype(jnp.uint32) * jnp.uint32(73856093)
    y = c[..., 1].astype(jnp.uint32) * jnp.uint32(19349663)
    z = c[..., 2].astype(jnp.uint32) * jnp.uint32(83492791)
    return ((x ^ y ^ z) % jnp.uint32(hash_size)).astype(jnp.int32)


def _build_grid(vp_p, vp_valid, radius, hash_size: int):
    """Sorted (cell-hash, vp-index) entry list — an exact CSR replacement
    for the reference's per-cell CAS linked lists: expand each VP to the
    ≤27 cells its ±radius window can overlap, sort pairs by hash; photons
    locate their cell's run with two searchsorteds.  Returns (es_keys,
    es_vals, lo, diag, res, max_occupancy)."""
    n = vp_p.shape[0]
    big = jnp.float32(3e37)
    lo = jnp.min(jnp.where(vp_valid[:, None], vp_p - radius[:, None], big),
                 axis=0)
    hi = jnp.max(jnp.where(vp_valid[:, None], vp_p + radius[:, None], -big),
                 axis=0)
    any_vp = jnp.any(vp_valid)
    lo = jnp.where(any_vp, lo, 0.0)
    hi = jnp.where(any_vp, hi, 1.0)
    diag = jnp.maximum(hi - lo, 1e-20)
    max_r = jnp.max(jnp.where(vp_valid, radius, 0.0))
    max_diag = jnp.max(diag)
    base_res = jnp.maximum(
        (max_diag / jnp.maximum(max_r, 1e-20)).astype(jnp.int32), 1)
    res = jnp.maximum((base_res.astype(jnp.float32) * diag
                       / max_diag).astype(jnp.int32), 1)

    cmin, _ = _to_grid(vp_p - radius[:, None], lo, diag, res)
    cmax, _ = _to_grid(vp_p + radius[:, None], lo, diag, res)

    # 27 candidate offsets bound the span (cell size >= max radius, so the
    # 2r window overlaps at most 3 cells per axis)
    offs = jnp.asarray([(i, j, k) for i in range(3) for j in range(3)
                        for k in range(3)], jnp.int32)  # (27,3)
    cells = cmin[:, None, :] + offs[None, :, :]  # (P,27,3)
    ok = vp_valid[:, None] & jnp.all(cells <= cmax[:, None, :], axis=-1)
    h = _cell_hash(cells, hash_size)  # (P,27)
    key = jnp.where(ok, h, hash_size).ravel()
    val = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[:, None],
                           (n, 27)).ravel()
    order = jnp.argsort(key)
    ks = key[order]
    vs = val[order]
    left = jnp.searchsorted(ks, ks, side="left").astype(jnp.int32)
    right = jnp.searchsorted(ks, ks, side="right").astype(jnp.int32)
    live = ks < hash_size
    max_occ = jnp.max(jnp.where(live, right - left, 0))
    return ks, vs, lo, diag, res, max_occ


# ---------------------------------------------------------------------------
# photon pass (sppm.cpp:304-414)
# ---------------------------------------------------------------------------

def _ri_dyn(a, base, n_digits: int):
    """Unscrambled radical inverse with a traced base (photon dims inside
    the bounce scan; RadicalInverse at sppm.cpp:316)."""
    basef = base.astype(jnp.float32)
    inv = 1.0 / basef
    acc = a.astype(jnp.float32) * 0.0
    scale = acc + inv

    def body(_, carry):
        a, acc, scale = carry
        acc = acc + (a % base).astype(jnp.float32) * scale
        return a // base, acc, scale * inv

    _, acc, _ = jax.lax.fori_loop(0, n_digits, body, (a, acc, scale))
    return jnp.minimum(acc, ONE_MINUS_EPS)


def _photon_chunk(scene: SceneData, pix: SPPMPixels, es_keys, es_vals,
                  max_occ, lo, diag, res, hidx, mask, max_depth: int,
                  hash_size: int, texture_eval, primes_dev, nch: int = 3):
    """Trace one wavefront of photons from their global Halton indices and
    deposit every bounce>0 surface hit onto the visible points of its grid
    cell.  Returns (Phi_add, M_add) as full-film tensors."""
    n = hidx.shape[0]

    # light selection + Sample_Le from radical-inverse dims 0..4
    # (sppm.cpp:313-330; the power distribution mirrors
    # ComputeLightPowerDistribution)
    u = [_radical_inverse(hidx, int(ld.PRIMES[d])) for d in range(5)]
    lidx, lpmf = choose_light(scene.lights, u[0], "power")
    le = sample_le(scene.lights, lidx, u[1], u[2], u[3], u[4])
    ok0 = mask & (le.pdf_pos > 0) & (le.pdf_dir > 0) & jnp.any(le.le > 0, -1)
    beta0 = (_lift_illum_maybe(le.le, nch)
             * (jnp.abs(dot(le.n, le.d))
                / jnp.maximum(lpmf * le.pdf_pos * le.pdf_dir,
                              1e-20))[:, None])
    ok0 = ok0 & jnp.any(beta0 > 0, axis=-1)
    o0 = jnp.where(le.is_delta_pos[:, None] | le.is_infinite[:, None],
                   le.p, offset_ray_origin(le.p, le.n, le.d))

    n_digits = _digits_needed(17, 1 << 31)

    def pstep(carry, b):
        o, d, beta, alive = carry
        t_max = jnp.where(alive, INF, 0.0)
        hit = intersect_closest(scene.geo, o, d, t_max)
        si = compute_interaction(scene.geo, hit, o, d)
        valid = alive & si.valid
        rec = dict(p=si.p, wi=-d, beta=beta, valid=valid & (b > 0))

        shade = make_shade_ctx(scene, si, texture_eval, channels=nch)
        d0 = 6 + 4 * b
        u_lobe = _ri_dyn(hidx, primes_dev[d0], n_digits)
        u1 = _ri_dyn(hidx, primes_dev[d0 + 1], n_digits)
        u2 = _ri_dyn(hidx, primes_dev[d0 + 2], n_digits)
        u_rr = _ri_dyn(hidx, primes_dev[d0 + 3], n_digits)

        wi, f, pdf, _, _ = shade_sample(scene, shade, si.ns, si.wo,
                                        u_lobe, u1, u2)
        ok = valid & (pdf > 0) & jnp.any(f > 0, axis=-1)
        bnew = beta * f * (jnp.abs(dot(wi, si.ns))
                           / jnp.maximum(pdf, 1e-20))[:, None]
        # photon Russian roulette (sppm.cpp:405-408)
        q = jnp.maximum(0.0, 1.0 - _lum(bnew)
                        / jnp.maximum(_lum(beta), 1e-20))
        killed = u_rr < q
        beta = jnp.where((ok & ~killed)[:, None],
                         bnew / jnp.maximum(1.0 - q, 1e-6)[:, None], beta)
        alive = ok & ~killed
        o = offset_ray_origin(si.p, si.ng, wi, si.p_eps)
        return (o, wi, beta, alive), rec

    init = (o0, le.d, beta0, ok0)
    _, recs = jax.lax.scan(pstep, init,
                           jnp.arange(max_depth, dtype=jnp.int32))

    # ---- deposit (sppm.cpp:346-375): flatten (depth, lane) ----
    p = recs['p'].reshape(-1, 3)
    wi = recs['wi'].reshape(-1, 3)
    beta = recs['beta'].reshape(-1, nch)
    valid = recs['valid'].reshape(-1)
    cell, inb = _to_grid(p, lo, diag, res)
    valid = valid & inb
    h = jnp.where(valid, _cell_hash(cell, hash_size), hash_size)
    start = jnp.searchsorted(es_keys, h, side="left").astype(jnp.int32)
    end = jnp.searchsorted(es_keys, h, side="right").astype(jnp.int32)
    n_entries = es_vals.shape[0]

    n_pix = pix.radius.shape[0]
    Phi_add = jnp.zeros((n_pix, nch), jnp.float32)
    M_add = jnp.zeros((n_pix,), jnp.float32)

    def slot_body(c, carry):
        Phi_add, M_add = carry
        idx = jnp.clip(start + c, 0, n_entries - 1)
        vp = es_vals[idx]
        ok = valid & (start + c < end) & (vp >= 0)
        vpc = jnp.maximum(vp, 0)
        dp = p - pix.vp_p[vpc]
        d2 = jnp.sum(dp * dp, axis=-1)
        r = pix.radius[vpc]
        ok = ok & (d2 <= r * r) & pix.vp_valid[vpc]
        ns = pix.vp_ns[vpc]
        ctx = jax.tree_util.tree_map(lambda a: a[vpc], pix.vp_shade)
        f = shade_f(scene, ctx, ns, pix.vp_wo[vpc], wi)
        phi = jnp.where(ok[:, None], beta * f, 0.0)
        # masked lanes target row 0 with a zero payload
        row = jnp.where(ok, vpc, 0)
        Phi_add = Phi_add.at[row].add(phi)
        M_add = M_add.at[row].add(ok.astype(jnp.float32))
        return Phi_add, M_add

    # traced upper bound (max bucket occupancy) -> lowers to a while_loop;
    # cost adapts to the actual grid density like the reference's lists
    Phi_add, M_add = jax.lax.fori_loop(0, max_occ, slot_body,
                                       (Phi_add, M_add))
    return Phi_add, M_add


# ---------------------------------------------------------------------------
# statistics update (sppm.cpp:417-445)
# ---------------------------------------------------------------------------

def _update_pixels(pix: SPPMPixels) -> SPPMPixels:
    gamma = jnp.float32(2.0 / 3.0)
    has = pix.M > 0
    n_new = pix.N + gamma * pix.M
    r_new = pix.radius * jnp.sqrt(n_new / jnp.maximum(pix.N + pix.M, 1e-20))
    ratio = (r_new * r_new) / jnp.maximum(pix.radius * pix.radius, 1e-20)
    tau = jnp.where(has[:, None],
                    (pix.tau + pix.vp_beta * pix.Phi) * ratio[:, None],
                    pix.tau)
    return pix._replace(
        radius=jnp.where(has, r_new, pix.radius),
        N=jnp.where(has, n_new, pix.N),
        tau=tau,
        Phi=jnp.zeros_like(pix.Phi),
        M=jnp.zeros_like(pix.M),
        vp_valid=jnp.zeros_like(pix.vp_valid),
        vp_beta=jnp.zeros_like(pix.vp_beta),
    )


# ---------------------------------------------------------------------------
# driver (SPPMIntegrator::Render, sppm.cpp:112-505)
# ---------------------------------------------------------------------------

def render_sppm(sd, quick: bool = False, crop_override=None,
                return_state: bool = False):
    """The full SPPM pipeline.  Parameters per CreateSPPMIntegrator
    (sppm.cpp:507-519): iterations (64; /16 under quick like
    PbrtOptions.quickRender), maxdepth 5, photonsperiteration -1 -> film
    area, radius 1."""
    from tpurt.render.driver import build_job, _chunk_lanes

    job = build_job(sd, quick=quick, crop_override=crop_override)
    nch = 60 if job.cfg.spectral else 3
    ps = sd.integrator_params
    n_iters = ps.find_one_int("iterations",
                              ps.find_one_int("numiterations", 64))
    if quick:
        n_iters = max(1, n_iters // 16)
    max_depth = ps.find_one_int("maxdepth", 5)
    init_radius = ps.find_one_float("radius", 1.0)
    film = job.film
    n_pix = film.width * film.height
    n_photons = ps.find_one_int("photonsperiteration", -1)
    if n_photons <= 0:
        n_photons = n_pix
    hash_size = n_pix

    # SPPM drives the camera pass with its own Halton sampler over
    # iterations (sppm.cpp:125); the scene's Sampler directive is unused.
    smplr = make_halton(max(n_iters, 1), film.full_x, film.full_y)
    primes_dev = jnp.asarray(ld.PRIMES.astype(np.int32))

    chunk = min(get_config().wavefront_size, 1 << 20)
    x0, _, y0, _ = film.crop

    @partial(jax.jit, static_argnums=(7,), donate_argnums=(6,))
    def cam_step(scene, camera, smplr, px, py, sidx, pix, _max_depth,
                 lane_pix, mask):
        Ld, vp = _camera_chunk(scene, camera, smplr, px, py, sidx, mask,
                               _max_depth, job.texture_eval, nch=nch)
        row = jnp.where(mask, lane_pix, n_pix)  # sacrificial row
        pad = lambda a: jnp.concatenate(
            [a, jnp.zeros((1,) + a.shape[1:], a.dtype)], axis=0)
        set_at = lambda full, v: pad(full).at[row].set(v)[:n_pix]
        add_at = lambda full, v: pad(full).at[row].add(v)[:n_pix]
        return pix._replace(
            Ld=add_at(pix.Ld, Ld),
            vp_valid=set_at(pix.vp_valid, vp['valid'] & mask),
            vp_p=set_at(pix.vp_p, vp['p']),
            vp_wo=set_at(pix.vp_wo, vp['wo']),
            vp_ns=set_at(pix.vp_ns, vp['ns']),
            vp_beta=set_at(pix.vp_beta, vp['beta']),
            vp_shade=jax.tree_util.tree_map(
                lambda full, v: set_at(full, v), pix.vp_shade, vp['shade']),
        )

    grid_fn = jax.jit(partial(_build_grid, hash_size=hash_size))

    @partial(jax.jit, static_argnums=(9,), donate_argnums=(1,))
    def photon_step(scene, pix, es_keys, es_vals, max_occ, lo, diag, res,
                    hidx, _max_depth, mask):
        Phi_add, M_add = _photon_chunk(
            scene, pix, es_keys, es_vals, max_occ, lo, diag, res, hidx,
            mask, _max_depth, hash_size, job.texture_eval, primes_dev,
            nch=nch)
        return pix._replace(Phi=pix.Phi + Phi_add, M=pix.M + M_add)

    update_fn = jax.jit(_update_pixels, donate_argnums=(0,))

    pix = _init_pixels(n_pix, init_radius, scene=job.scene, nch=nch)
    w = film.width
    reporter = ProgressReporter(2 * n_iters, "Rendering (sppm)")
    t0 = time.time()
    # fixed-shape lane batches shared by every iteration
    cam_batches = [(np.asarray(px), np.asarray(py), np.asarray(m))
                   for px, py, _s, m in _chunk_lanes(film, 1, min(chunk,
                                                                  n_pix))]
    phot_chunk = min(chunk, n_photons)
    for it in range(n_iters):
        sidx = None
        for px, py, mask in cam_batches:
            sidx = np.full(px.shape, it, np.int32)
            lane_pix = ((py - y0) * w + (px - x0)).astype(np.int32)
            pix = cam_step(job.scene, job.camera, smplr, jnp.asarray(px),
                           jnp.asarray(py), jnp.asarray(sidx), pix,
                           max_depth, jnp.asarray(lane_pix),
                           jnp.asarray(mask))
        reporter.update(1)

        es_keys, es_vals, lo, diag, res, max_occ = grid_fn(
            pix.vp_p, pix.vp_valid, pix.radius)

        base = it * n_photons
        for c0 in range(0, n_photons, phot_chunk):
            idx = base + c0 + np.arange(phot_chunk)
            mask = (c0 + np.arange(phot_chunk)) < n_photons
            pix = photon_step(job.scene, pix, es_keys, es_vals, max_occ,
                              lo, diag, res,
                              jnp.asarray(idx.astype(np.int32)), max_depth,
                              jnp.asarray(mask))
        pix = update_fn(pix)
        reporter.update(1)

    jax.block_until_ready(pix.tau)
    reporter.done_report()
    STATS.counter("SPPM/Photon paths followed", n_iters * n_photons)
    STATS.phase_times["Render (sppm)"] += time.time() - t0

    # resolve (sppm.cpp:450-461): L = Ld/nIters + tau/(Np pi r^2);
    # sampled-spectrum bins convert to RGB here (the film is 3-channel)
    np_total = float(n_iters) * float(n_photons)
    L = (pix.Ld / n_iters
         + pix.tau / (np_total * np.pi
                      * jnp.maximum(pix.radius, 1e-20)[:, None] ** 2))
    if nch != 3:
        from tpurt.spectrum_sampled import to_rgb_matrix

        L = L @ to_rgb_matrix()
    img_dev = L.reshape(film.height, film.width, 3)
    state = FilmState(rgb=jnp.zeros_like(img_dev),
                      weight=jnp.zeros((film.height, film.width),
                                       jnp.float32),
                      splat=img_dev)
    img = film.to_image(state, splat_scale=1.0)
    if return_state:
        return img, job, state
    return img, job
