"""Device texture evaluation over batched hit buffers.

Reference analog: src/textures/* Evaluate() methods, core/texture.cpp
(TextureMapping2D, Perlin Noise/FBm/Turbulence) and core/mipmap.h.
TextureRecords form a static DAG, so evaluation unrolls at trace time into
pure jnp ops over the (N,) hit lanes; per-material results are blended by
material-id masks (materials_build.fetch_lobes overrides).

Image maps currently sample the top MIP level bilinearly (ray
differentials / EWA are a later round; the pyramid is built and kept).
Noise is Ken Perlin's improved noise with the canonical permutation —
identical to the reference's Noise() (texture.cpp Grad/NoiseWeight).
"""

from __future__ import annotations

import logging
from functools import lru_cache
from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np

from tpurt.scene.records import TextureRecord

log = logging.getLogger("tpurt.render")

# Ken Perlin's canonical permutation (public domain reference noise).
_PERM = np.array([
    151, 160, 137, 91, 90, 15, 131, 13, 201, 95, 96, 53, 194, 233, 7, 225,
    140, 36, 103, 30, 69, 142, 8, 99, 37, 240, 21, 10, 23, 190, 6, 148,
    247, 120, 234, 75, 0, 26, 197, 62, 94, 252, 219, 203, 117, 35, 11, 32,
    57, 177, 33, 88, 237, 149, 56, 87, 174, 20, 125, 136, 171, 168, 68, 175,
    74, 165, 71, 134, 139, 48, 27, 166, 77, 146, 158, 231, 83, 111, 229, 122,
    60, 211, 133, 230, 220, 105, 92, 41, 55, 46, 245, 40, 244, 102, 143, 54,
    65, 25, 63, 161, 1, 216, 80, 73, 209, 76, 132, 187, 208, 89, 18, 169,
    200, 196, 135, 130, 116, 188, 159, 86, 164, 100, 109, 198, 173, 186, 3, 64,
    52, 217, 226, 250, 124, 123, 5, 202, 38, 147, 118, 126, 255, 82, 85, 212,
    207, 206, 59, 227, 47, 16, 58, 17, 182, 189, 28, 42, 223, 183, 170, 213,
    119, 248, 152, 2, 44, 154, 163, 70, 221, 153, 101, 155, 167, 43, 172, 9,
    129, 22, 39, 253, 19, 98, 108, 110, 79, 113, 224, 232, 178, 185, 112, 104,
    218, 246, 97, 228, 251, 34, 242, 193, 238, 210, 144, 12, 191, 179, 162, 241,
    81, 51, 145, 235, 249, 14, 239, 107, 49, 192, 214, 31, 181, 199, 106, 157,
    184, 84, 204, 176, 115, 121, 50, 45, 127, 4, 150, 254, 138, 236, 205, 93,
    222, 114, 67, 29, 24, 72, 243, 141, 128, 195, 78, 66, 215, 61, 156, 180,
], np.int32)
_PERM2 = np.concatenate([_PERM, _PERM])


def _grad(h, x, y, z):
    h = h & 15
    u = jnp.where(h < 8, x, y)
    v = jnp.where(h < 4, y, jnp.where((h == 12) | (h == 14), x, z))
    return (jnp.where(h & 1, -u, u) + jnp.where(h & 2, -v, v))


def perlin_noise(p: jnp.ndarray) -> jnp.ndarray:
    """Improved Perlin noise at (N,3) points, in [-1, 1]."""
    perm = jnp.asarray(_PERM2)
    pi = jnp.floor(p).astype(jnp.int32) & 255
    pf = p - jnp.floor(p)
    x, y, z = pf[:, 0], pf[:, 1], pf[:, 2]

    def fade(t):
        return t * t * t * (t * (t * 6.0 - 15.0) + 10.0)

    u, v, w = fade(x), fade(y), fade(z)
    ix, iy, iz = pi[:, 0], pi[:, 1], pi[:, 2]
    a = perm[ix] + iy
    aa = perm[a] + iz
    ab = perm[a + 1] + iz
    b = perm[ix + 1] + iy
    ba = perm[b] + iz
    bb = perm[b + 1] + iz

    def lerp(t, a, b):
        return a + t * (b - a)

    return lerp(w,
                lerp(v, lerp(u, _grad(perm[aa], x, y, z),
                             _grad(perm[ba], x - 1, y, z)),
                     lerp(u, _grad(perm[ab], x, y - 1, z),
                          _grad(perm[bb], x - 1, y - 1, z))),
                lerp(v, lerp(u, _grad(perm[aa + 1], x, y, z - 1),
                             _grad(perm[ba + 1], x - 1, y, z - 1)),
                     lerp(u, _grad(perm[ab + 1], x, y - 1, z - 1),
                          _grad(perm[bb + 1], x - 1, y - 1, z - 1))))


def fbm(p, octaves: int, omega: float):
    """Fractional Brownian motion (texture.cpp FBm, fixed octave count —
    the reference clamps octaves by ray differentials; we use all)."""
    total = jnp.zeros(p.shape[0], jnp.float32)
    lam, o = 1.0, 1.0
    for _ in range(max(1, octaves)):
        total = total + o * perlin_noise(p * lam)
        lam *= 1.99
        o *= omega
    return total


def turbulence(p, octaves: int, omega: float):
    total = jnp.zeros(p.shape[0], jnp.float32)
    lam, o = 1.0, 1.0
    for _ in range(max(1, octaves)):
        total = total + o * jnp.abs(perlin_noise(p * lam))
        lam *= 1.99
        o *= omega
    return total


@lru_cache(maxsize=64)
def _load_image_pyramid(filename: str, gamma: bool):
    """MIPMap pyramid (mipmap.h): level 0 = full res, box-downsampled."""
    from tpurt.io.image import inverse_gamma_correct, read_image

    img = read_image(filename)
    if gamma and not filename.lower().endswith((".exr", ".pfm")):
        pass  # read_image already linearizes 8-bit formats
    levels = [img.astype(np.float32)]
    cur = levels[0]
    while max(cur.shape[0], cur.shape[1]) > 1:
        h2 = max(1, cur.shape[0] // 2)
        w2 = max(1, cur.shape[1] // 2)
        cur = cur[: h2 * 2, : w2 * 2].reshape(h2, 2, w2, 2, 3).mean((1, 3))
        levels.append(cur.astype(np.float32))
    return levels


@lru_cache(maxsize=64)
def _load_image_pyramid_flat(filename: str, gamma: bool):
    """Pyramid packed into one flat (D,3) array + static per-level
    (offset, w, h) — a per-lane MIP lookup is then one gather per tap."""
    levels = _load_image_pyramid(filename, gamma)
    offs, ws, hs, parts = [], [], [], []
    off = 0
    for lv in levels:
        h, w = lv.shape[:2]
        offs.append(off)
        ws.append(w)
        hs.append(h)
        parts.append(lv.reshape(-1, 3))
        off += h * w
    return (np.concatenate(parts).astype(np.float32),
            np.asarray(offs, np.int32), np.asarray(ws, np.int32),
            np.asarray(hs, np.int32))


def _trilinear_sample(filename: str, gamma: bool, u, v, width, wrap: str):
    """MIPMap::Lookup(st, width) trilinear (mipmap.h:Lookup): pick the
    level whose texel spacing matches the uv-space filter width and blend
    the two nearest levels.  width: (N,) per-lane."""
    flat_np, offs_np, ws_np, hs_np = _load_image_pyramid_flat(filename, gamma)
    flat = jnp.asarray(flat_np)
    offs = jnp.asarray(offs_np)
    ws = jnp.asarray(ws_np)
    hs = jnp.asarray(hs_np)
    n_levels = len(offs_np)
    lvl = (n_levels - 1) + jnp.log2(jnp.maximum(width, 1e-8))
    lvl = jnp.clip(lvl, 0.0, n_levels - 1)
    l0 = jnp.floor(lvl).astype(jnp.int32)
    dl = lvl - l0.astype(jnp.float32)

    def sample_level(li):
        w_l = ws[li]
        h_l = hs[li]
        off = offs[li]
        x = u * w_l.astype(jnp.float32) - 0.5
        y = v * h_l.astype(jnp.float32) - 0.5
        x0 = jnp.floor(x).astype(jnp.int32)
        y0 = jnp.floor(y).astype(jnp.int32)
        fx = (x - x0)[:, None]
        fy = (y - y0)[:, None]

        def wrapc(i, nn):
            if wrap == "repeat":
                return jnp.mod(i, nn)
            return jnp.clip(i, 0, nn - 1)

        def fetch(xi, yi):
            idx = off + wrapc(yi, h_l) * w_l + wrapc(xi, w_l)
            val = flat[jnp.clip(idx, 0, flat.shape[0] - 1)]
            if wrap == "black":
                ok = (xi >= 0) & (xi < w_l) & (yi >= 0) & (yi < h_l)
                val = jnp.where(ok[:, None], val, 0.0)
            return val

        top = fetch(x0, y0) * (1 - fx) + fetch(x0 + 1, y0) * fx
        bot = fetch(x0, y0 + 1) * (1 - fx) + fetch(x0 + 1, y0 + 1) * fx
        return top * (1 - fy) + bot * fy

    s0 = sample_level(l0)
    s1 = sample_level(jnp.minimum(l0 + 1, n_levels - 1))
    return s0 * (1 - dl)[:, None] + s1 * dl[:, None]


# Static (taps x taps) gather window per level, with the max anisotropy
# chosen so the window PROVABLY bounds the clamped ellipse: the level
# choice puts the minor axis in [1, 2) texels at the floor level, so the
# major half-axis is < 2 * MAX_ANISO texels, and the EWA +1-texel
# widening makes the worst-case half-extent sqrt((2*aniso)^2 + 1).
# TAPS//2 >= that requires aniso <= sqrt((TAPS//2)^2 - 1)/2 = 2.96 for
# 13 taps — no silent filter truncation (mipmap.h's dynamic loop can't
# be expressed with static shapes; we trade its aniso-8 ceiling for a
# provable window instead of renormalizing away a clipped ellipse).
_EWA_MAX_ANISO = 2.9
_EWA_TAPS = 13


# Blocked EWA layout: each pyramid level is re-stored as 2D blocks of
# 4 rows x 16 cols (768 B — the TPU gather engine charges per fetched
# row and is measured FLAT in row width through 768 B, tools/probe.py)
# with a 16-texel wrap-resolved apron on every side, so any 13x13 tap
# window lands inside a static 4x2 block neighborhood.  One EWA level
# is then EIGHT 768-byte block gathers instead of 169 texel gathers,
# with bit-identical tap weights (measured 3.3x end-to-end at the
# 16-texel-row stage already; the 4x16 stage roughly triples the
# gather-row savings again).
_EWA_BLOCK = 16   # cols per block
_EWA_VBLOCK = 4   # rows per block
_EWA_APRON = 16   # wrap-resolved apron texels on each side


def _pack_blocked(levels, wrap: str, vb: int, hb: int):
    """Re-pack pyramid levels as (nb, vb, hb, 3) blocks with a
    wrap-resolved apron of _EWA_APRON texels on every side.  Returns
    (blocks (NB, vb, hb, 3) f32, boffs (L,), nbx (L,), nby (L,),
    ws (L,), hs (L,))."""
    boffs, nbxs, nbys, ws, hs, parts = [], [], [], [], [], []
    boff = 0
    for lv in levels:
        h, w = lv.shape[:2]
        w_pad = -((w + 2 * _EWA_APRON) // -hb) * hb
        h_pad = -((h + 2 * _EWA_APRON) // -vb) * vb
        cols = np.arange(w_pad, dtype=np.int64) - _EWA_APRON
        rows = np.arange(h_pad, dtype=np.int64) - _EWA_APRON
        if wrap == "repeat":
            src_c = np.mod(cols, w)
            src_r = np.mod(rows, h)
        else:  # clamp and black both store the clamped texel; black
            # zeroes the WEIGHT at runtime exactly like the taps path
            src_c = np.clip(cols, 0, w - 1)
            src_r = np.clip(rows, 0, h - 1)
        padded = lv[src_r][:, src_c, :]
        if wrap == "black":
            padded = padded.copy()
            padded[(rows < 0) | (rows >= h), :, :] = 0.0
            padded[:, (cols < 0) | (cols >= w), :] = 0.0
        nby = h_pad // vb
        nbx = w_pad // hb
        parts.append(padded.reshape(nby, vb, nbx, hb, 3)
                     .transpose(0, 2, 1, 3, 4)
                     .reshape(nby * nbx, vb, hb, 3))
        boffs.append(boff)
        nbxs.append(nbx)
        nbys.append(nby)
        ws.append(w)
        hs.append(h)
        boff += nby * nbx
    return (np.concatenate(parts).astype(np.float32),
            np.asarray(boffs, np.int32), np.asarray(nbxs, np.int32),
            np.asarray(nbys, np.int32),
            np.asarray(ws, np.int32), np.asarray(hs, np.int32))


@lru_cache(maxsize=64)
def _load_image_pyramid_blocked(filename: str, gamma: bool, wrap: str):
    """Pyramid re-packed for the blocked EWA fetch: returns
    (blocks (NB, 4, 16, 3) f32, boffs (L,), nbx (L,), ws (L,), hs (L,)).
    Both wrap axes are baked into the apron texels: padded texel
    (q, p) stores source (resolve(q - APRON), resolve(p - APRON))."""
    levels = _load_image_pyramid(filename, gamma)
    blocks, boffs, nbxs, _nbys, ws, hs = _pack_blocked(
        levels, wrap, _EWA_VBLOCK, _EWA_BLOCK)
    return blocks, boffs, nbxs, ws, hs


@lru_cache(maxsize=64)
def _load_image_pyramid_blocked_both(filename: str, gamma: bool, wrap: str):
    """Both block orientations for the wide (high-anisotropy) EWA pass,
    concatenated in ONE texel buffer of 64-texel blocks: R-blocks
    (4 rows x 16 cols, index t = r*16 + c) first, then C-blocks
    (16 rows x 4 cols, t = r*4 + c).  A strip of 8 R-blocks covers
    16r x 32c; 8 C-blocks cover 32r x 16c — the per-lane choice keeps
    the fetch footprint matched to the major-axis orientation."""
    levels = _load_image_pyramid(filename, gamma)
    br, boffs_r, nbx_r, nby_r, ws, hs = _pack_blocked(
        levels, wrap, _EWA_VBLOCK, _EWA_BLOCK)
    bc, boffs_c, nbx_c, nby_c, _, _ = _pack_blocked(
        levels, wrap, _EWA_BLOCK, _EWA_VBLOCK)
    n_r = br.shape[0]
    blocks = np.concatenate([br.reshape(n_r, 64, 3),
                             bc.reshape(bc.shape[0], 64, 3)])
    return (blocks, boffs_r, nbx_r, nby_r,
            boffs_c + np.int32(n_r), nbx_c, nby_c, ws, hs)


def _ewa_level(filename: str, gamma: bool, u, v, dst0, dst1, li, wrap: str):
    from tpurt.config import get_config

    impl = (_ewa_level_blocked if get_config().ewa_blocked
            else _ewa_level_taps)
    return impl(filename, gamma, u, v, dst0, dst1, li, wrap)


def _ewa_level_blocked(filename: str, gamma: bool, u, v, dst0, dst1, li,
                       wrap: str):
    """Blocked-gather EWA at one MIP level: same tap weights as
    _ewa_level_taps (the window mask reproduces its exact 13x13
    support), fetched as a static 4x2 neighborhood of 4x16-texel blocks
    (8 gathers of 768 B).

    Exactness: identical tap weights and texels for repeat (u, v are
    wrapped by floor first — an exact identity, the window and its
    texels shift together) and for black (out-of-image taps carry zero
    weight in both paths).  For clamp, identical while the window start
    stays within the 16-texel apron (|overshoot| <= ~10 texels outside
    [0,1] uv); beyond that the taps oracle (ewa_blocked=False) is the
    reference behavior."""
    if wrap == "repeat":
        u = u - jnp.floor(u)
        v = v - jnp.floor(v)
    blocks_np, boffs_np, nbx_np, ws_np, hs_np = \
        _load_image_pyramid_blocked(filename, gamma, wrap)
    flat_np, offs_np, _, _ = _load_image_pyramid_flat(filename, gamma)
    blocks = jnp.asarray(blocks_np)
    flat = jnp.asarray(flat_np)
    offs = jnp.asarray(offs_np)
    boffs = jnp.asarray(boffs_np)
    nbx = jnp.asarray(nbx_np)
    ws = jnp.asarray(ws_np)
    hs = jnp.asarray(hs_np)
    w_l = ws[li].astype(jnp.float32)
    h_l = hs[li].astype(jnp.float32)
    wi_i = ws[li]
    hi_i = hs[li]
    su = u * w_l - 0.5
    sv = v * h_l - 0.5
    d0u = dst0[:, 0] * w_l
    d0v = dst0[:, 1] * h_l
    d1u = dst1[:, 0] * w_l
    d1v = dst1[:, 1] * h_l
    A = d0v * d0v + d1v * d1v + 1.0
    B = -2.0 * (d0u * d0v + d1u * d1v)
    C = d0u * d0u + d1u * d1u + 1.0
    inv_f = 1.0 / (A * C - B * B * 0.25)
    A = (A * inv_f)[:, None, None]
    B = (B * inv_f)[:, None, None]
    C = (C * inv_f)[:, None, None]

    iu0 = jnp.round(su).astype(jnp.int32) - _EWA_TAPS // 2
    iv0 = jnp.round(sv).astype(jnp.int32) - _EWA_TAPS // 2
    hb0 = (iu0 + _EWA_APRON) // _EWA_BLOCK   # first col-block of 2
    vb0 = (iv0 + _EWA_APRON) // _EWA_VBLOCK  # first row-block of 4
    # unwrapped source-texel coordinates covered by the fetched blocks
    cols = (hb0[:, None] * _EWA_BLOCK - _EWA_APRON
            + jnp.arange(2 * _EWA_BLOCK, dtype=jnp.int32)[None, :])
    rows = (vb0[:, None] * _EWA_VBLOCK - _EWA_APRON
            + jnp.arange(4 * _EWA_VBLOCK, dtype=jnp.int32)[None, :])
    uu = (cols.astype(jnp.float32) - su[:, None])[:, None, :]
    vv = (rows.astype(jnp.float32) - sv[:, None])[:, :, None]
    inwin = ((cols >= iu0[:, None])
             & (cols < (iu0 + _EWA_TAPS)[:, None]))[:, None, :] \
        & ((rows >= iv0[:, None])
           & (rows < (iv0 + _EWA_TAPS)[:, None]))[:, :, None]
    if wrap == "black":
        inwin = (inwin & ((cols >= 0) & (cols < wi_i[:, None]))[:, None, :]
                 & ((rows >= 0) & (rows < hi_i[:, None]))[:, :, None])
    r2 = A * uu * uu + B * uu * vv + C * vv * vv
    exp_m2 = np.float32(np.exp(-2.0))
    w = jnp.where(inwin & (r2 < 1.0),
                  jnp.exp(-2.0 * jnp.minimum(r2, 1.0)) - exp_m2, 0.0)
    # 8 block gathers -> a (N, 16, 32, 3) strip covering the window
    base = boffs[li] + vb0 * nbx[li] + hb0
    vrows = []
    for dvb in range(4):
        left = blocks[base + dvb * nbx[li]]
        right = blocks[base + dvb * nbx[li] + 1]
        vrows.append(jnp.concatenate([left, right], axis=2))
    strip = jnp.concatenate(vrows, axis=1)
    acc = jnp.einsum("nrk,nrkc->nc", w, strip)
    wsum = jnp.sum(w, axis=(1, 2))
    # degenerate ellipses (sub-texel): fall back to the centre texel
    ok = wsum > 1e-8
    off = offs[li]
    if wrap == "repeat":
        cx = jnp.mod(jnp.round(su).astype(jnp.int32), wi_i)
        cy = jnp.mod(jnp.round(sv).astype(jnp.int32), hi_i)
    else:
        cx = jnp.clip(jnp.round(su).astype(jnp.int32), 0, wi_i - 1)
        cy = jnp.clip(jnp.round(sv).astype(jnp.int32), 0, hi_i - 1)
    centre = flat[jnp.clip(off + cy * wi_i + cx, 0, flat.shape[0] - 1)]
    return jnp.where(ok[:, None], acc / jnp.maximum(wsum, 1e-8)[:, None],
                     centre)


def _ewa_level_taps(filename: str, gamma: bool, u, v, dst0, dst1, li,
                    wrap: str, taps: int = _EWA_TAPS):
    """EWA filter at one MIP level (MIPMap::EWA, mipmap.h): elliptical
    Gaussian weights over a STATIC tap window centred at (u, v).  `taps`
    can be raised (tests only — the loop unrolls taps^2 gathers) to make
    this the oracle for the wide high-anisotropy pass: 35 taps bound the
    aniso-8 ellipse the same way 13 bound the 2.9-clamped one."""
    flat_np, offs_np, ws_np, hs_np = _load_image_pyramid_flat(filename, gamma)
    flat = jnp.asarray(flat_np)
    offs = jnp.asarray(offs_np)
    ws = jnp.asarray(ws_np)
    hs = jnp.asarray(hs_np)
    w_l = ws[li].astype(jnp.float32)
    h_l = hs[li].astype(jnp.float32)
    off = offs[li]
    wi_i = ws[li]
    hi_i = hs[li]
    # to texel coordinates at this level
    su = u * w_l - 0.5
    sv = v * h_l - 0.5
    d0u = dst0[:, 0] * w_l
    d0v = dst0[:, 1] * h_l
    d1u = dst1[:, 0] * w_l
    d1v = dst1[:, 1] * h_l
    # ellipse coefficients (mipmap.h EWA)
    A = d0v * d0v + d1v * d1v + 1.0
    B = -2.0 * (d0u * d0v + d1u * d1v)
    C = d0u * d0u + d1u * d1u + 1.0
    inv_f = 1.0 / (A * C - B * B * 0.25)
    A = A * inv_f
    B = B * inv_f
    C = C * inv_f

    iu0 = jnp.round(su).astype(jnp.int32) - taps // 2
    iv0 = jnp.round(sv).astype(jnp.int32) - taps // 2
    acc = jnp.zeros((u.shape[0], 3), jnp.float32)
    wsum = jnp.zeros(u.shape[0], jnp.float32)
    exp_m2 = np.float32(np.exp(-2.0))
    for dv in range(taps):
        for du in range(taps):
            ti = iu0 + du
            tj = iv0 + dv
            uu = ti.astype(jnp.float32) - su
            vv = tj.astype(jnp.float32) - sv
            r2 = A * uu * uu + B * uu * vv + C * vv * vv
            inside = r2 < 1.0
            w = jnp.where(inside,
                          jnp.exp(-2.0 * jnp.minimum(r2, 1.0)) - exp_m2, 0.0)
            if wrap == "repeat":
                xi = jnp.mod(ti, wi_i)
                yi = jnp.mod(tj, hi_i)
            else:
                xi = jnp.clip(ti, 0, wi_i - 1)
                yi = jnp.clip(tj, 0, hi_i - 1)
            idx = off + yi * wi_i + xi
            val = flat[jnp.clip(idx, 0, flat.shape[0] - 1)]
            if wrap == "black":
                okb = (ti >= 0) & (ti < wi_i) & (tj >= 0) & (tj < hi_i)
                w = jnp.where(okb, w, 0.0)
            acc = acc + w[:, None] * val
            wsum = wsum + w
    # degenerate ellipses (sub-texel): fall back to the centre texel
    ok = wsum > 1e-8
    if wrap == "repeat":
        cx = jnp.mod(jnp.round(su).astype(jnp.int32), wi_i)
        cy = jnp.mod(jnp.round(sv).astype(jnp.int32), hi_i)
    else:
        cx = jnp.clip(jnp.round(su).astype(jnp.int32), 0, wi_i - 1)
        cy = jnp.clip(jnp.round(sv).astype(jnp.int32), 0, hi_i - 1)
    centre = flat[jnp.clip(off + cy * wi_i + cx, 0, flat.shape[0] - 1)]
    return jnp.where(ok[:, None], acc / jnp.maximum(wsum, 1e-8)[:, None],
                     centre)


# Wide (high-anisotropy) EWA: K oriented strip fetches marching along the
# major axis.  Each strip is 8 block gathers (like the 13x13 window) in
# the orientation matched to the major direction (R-blocks 16r x 32c for
# mostly-horizontal ellipses, C-blocks 32r x 16c for mostly-vertical);
# strips OWN disjoint along-axis segments of the tap plane, so the summed
# weights equal one big static window exactly (no tap is counted twice,
# and the coverage bound below shows none is lost).
#
# Coverage: the level choice puts the clamped minor in [1, 2) texels at
# the floor level, so the +1-widened support is within perp <= sqrt(5)
# ~ 2.24 of the major line and within |along| <= L = sqrt(major^2+1)
# <= sqrt(257) ~ 16.04 for aniso 8.  With K = 4 segments of half-length
# L/K <= 4.2 and the dominant component of the unit major direction
# >= 1/sqrt(2), a strip centred on its segment midpoint needs, around
# that centre, at most 4.2 + 2.3 = 6.5 texels along the dominant axis
# (strip gives +-8) and 4.2/sqrt(2) + 2.3 = 5.3 across it (strip gives
# +-6 after block-grid alignment): every owned tap is fetched.
_EWA_WIDE_ANISO = 8.0   # the reference's "maxanisotropy" default
_EWA_WIDE_K = 4         # strips per level
_EWA_WIDE_FRAC = 8      # budget: at most n/FRAC lanes take the wide pass


def _report_tex_overflow(name: str, count) -> None:
    import jax as _jax

    from tpurt.utils.stats import STATS as _STATS

    def _cb(c):
        n = int(c)
        if n:
            _STATS.counter(name, n)

    try:
        _jax.debug.callback(_cb, count)
    except Exception:  # pragma: no cover - callback-less backends
        pass


def _ewa_level_wide(filename: str, gamma: bool, u, v, dst_major, dst_minor,
                    li, wrap: str):
    """One MIP level of the wide EWA pass: K=4 oriented strips of 8 block
    gathers each, ownership-partitioned along the major axis; same tap
    weights as a (2*ceil(sqrt((2*aniso)^2+1))+1)^2 static taps window
    (the taps oracle with taps=35 for aniso 8)."""
    if wrap == "repeat":
        u = u - jnp.floor(u)
        v = v - jnp.floor(v)
    (blocks_np, boffs_r_np, nbx_r_np, nby_r_np, boffs_c_np, nbx_c_np,
     nby_c_np, ws_np, hs_np) = \
        _load_image_pyramid_blocked_both(filename, gamma, wrap)
    flat_np, offs_np, _, _ = _load_image_pyramid_flat(filename, gamma)
    blocks = jnp.asarray(blocks_np)
    flat = jnp.asarray(flat_np)
    offs = jnp.asarray(offs_np)
    boffs_r = jnp.asarray(boffs_r_np)[li]
    nbx_r = jnp.asarray(nbx_r_np)[li]
    nby_r = jnp.asarray(nby_r_np)[li]
    boffs_c = jnp.asarray(boffs_c_np)[li]
    nbx_c = jnp.asarray(nbx_c_np)[li]
    nby_c = jnp.asarray(nby_c_np)[li]
    wi_i = jnp.asarray(ws_np)[li]
    hi_i = jnp.asarray(hs_np)[li]
    w_l = wi_i.astype(jnp.float32)
    h_l = hi_i.astype(jnp.float32)
    su = u * w_l - 0.5
    sv = v * h_l - 0.5
    d0u = dst_major[:, 0] * w_l
    d0v = dst_major[:, 1] * h_l
    d1u = dst_minor[:, 0] * w_l
    d1v = dst_minor[:, 1] * h_l
    A = d0v * d0v + d1v * d1v + 1.0
    B = -2.0 * (d0u * d0v + d1u * d1v)
    C = d0u * d0u + d1u * d1u + 1.0
    inv_f = 1.0 / (A * C - B * B * 0.25)
    An = (A * inv_f)[:, None]
    Bn = (B * inv_f)[:, None]
    Cn = (C * inv_f)[:, None]

    maj_len = jnp.sqrt(jnp.maximum(d0u * d0u + d0v * d0v, 1e-12))
    dir_u = d0u / maj_len
    dir_v = d0v / maj_len
    l_half = jnp.sqrt(maj_len * maj_len + 1.0) + 0.5
    horiz = jnp.abs(dir_u) >= jnp.abs(dir_v)

    t64 = jnp.arange(64, dtype=jnp.int32)
    # in-block texel coordinates per layout
    r_row, r_col = t64 // 16, t64 % 16   # R: 4r x 16c
    c_row, c_col = t64 // 4, t64 % 4     # C: 16r x 4c

    exp_m2 = np.float32(np.exp(-2.0))
    acc = jnp.zeros((u.shape[0], 3), jnp.float32)
    wsum = jnp.zeros(u.shape[0], jnp.float32)
    k_arr = _EWA_WIDE_K
    # ownership boundaries (projection onto the major direction)
    bounds = [(-np.float32(1e9) if k == 0 else
               l_half * (2.0 * k / k_arr - 1.0)) for k in range(k_arr)]
    bounds.append(jnp.full_like(l_half, 1e9))
    for k in range(k_arr):
        off = l_half * ((2.0 * k + 1.0) / k_arr - 1.0)
        scx = jnp.round(su + dir_u * off).astype(jnp.int32)
        scy = jnp.round(sv + dir_v * off).astype(jnp.int32)
        if wrap == "repeat":
            wx = jnp.mod(scx, wi_i)
            wy = jnp.mod(scy, hi_i)
            dx = (scx - wx).astype(jnp.float32)
            dy = (scy - wy).astype(jnp.float32)
        else:
            # apron-safe clip: blocks exist for centres in
            # [-(APRON-8), w-1+(APRON-8)]; beyond that clamp-mode taps
            # are lost (same apron caveat as the 13x13 blocked path),
            # while black-mode taps out there carry zero weight anyway
            wx = jnp.clip(scx, -8, jnp.maximum(wi_i + 7, -8))
            wy = jnp.clip(scy, -8, jnp.maximum(hi_i + 7, -8))
            dx = jnp.zeros_like(su)
            dy = jnp.zeros_like(sv)
        # R-layout strip: 4 vblocks x 2 hblocks (16r x 32c)
        hb0_r = jnp.clip((wx - 8 + _EWA_APRON) // _EWA_BLOCK,
                         0, jnp.maximum(nbx_r - 2, 0))
        vb0_r = jnp.clip((wy - 6 + _EWA_APRON) // _EWA_VBLOCK,
                         0, jnp.maximum(nby_r - 4, 0))
        # C-layout strip: 2 vblocks x 4 hblocks (32r x 16c)
        hb0_c = jnp.clip((wx - 6 + _EWA_APRON) // _EWA_VBLOCK,
                         0, jnp.maximum(nbx_c - 4, 0))
        vb0_c = jnp.clip((wy - 8 + _EWA_APRON) // _EWA_BLOCK,
                         0, jnp.maximum(nby_c - 2, 0))
        for j in range(8):
            dvb_r, dhb_r = j // 2, j % 2
            dvb_c, dhb_c = j // 4, j % 4
            bid_r = boffs_r + (vb0_r + dvb_r) * nbx_r + hb0_r + dhb_r
            bid_c = boffs_c + (vb0_c + dvb_c) * nbx_c + hb0_c + dhb_c
            bid = jnp.where(horiz, bid_r, bid_c)
            texels = blocks[bid]  # (N, 64, 3)
            col_r = ((hb0_r + dhb_r) * _EWA_BLOCK - _EWA_APRON)[:, None] \
                + r_col[None, :]
            row_r = ((vb0_r + dvb_r) * _EWA_VBLOCK - _EWA_APRON)[:, None] \
                + r_row[None, :]
            col_c = ((hb0_c + dhb_c) * _EWA_VBLOCK - _EWA_APRON)[:, None] \
                + c_col[None, :]
            row_c = ((vb0_c + dvb_c) * _EWA_BLOCK - _EWA_APRON)[:, None] \
                + c_row[None, :]
            col = jnp.where(horiz[:, None], col_r, col_c)
            row = jnp.where(horiz[:, None], row_r, row_c)
            uu = col.astype(jnp.float32) + dx[:, None] - su[:, None]
            vv = row.astype(jnp.float32) + dy[:, None] - sv[:, None]
            proj = uu * dir_u[:, None] + vv * dir_v[:, None]
            own = (proj >= (bounds[k][:, None] if k else bounds[k])) \
                & (proj < bounds[k + 1][:, None])
            r2 = An * uu * uu + Bn * uu * vv + Cn * vv * vv
            w = jnp.where(own & (r2 < 1.0),
                          jnp.exp(-2.0 * jnp.minimum(r2, 1.0)) - exp_m2,
                          0.0)
            if wrap == "black":
                inimg = ((col >= 0) & (col < wi_i[:, None])
                         & (row >= 0) & (row < hi_i[:, None]))
                w = jnp.where(inimg, w, 0.0)
            acc = acc + jnp.einsum("nk,nkc->nc", w, texels)
            wsum = wsum + jnp.sum(w, axis=1)
    ok = wsum > 1e-8
    off0 = offs[li]
    if wrap == "repeat":
        cx = jnp.mod(jnp.round(su).astype(jnp.int32), wi_i)
        cy = jnp.mod(jnp.round(sv).astype(jnp.int32), hi_i)
    else:
        cx = jnp.clip(jnp.round(su).astype(jnp.int32), 0, wi_i - 1)
        cy = jnp.clip(jnp.round(sv).astype(jnp.int32), 0, hi_i - 1)
    centre = flat[jnp.clip(off0 + cy * wi_i + cx, 0, flat.shape[0] - 1)]
    return jnp.where(ok[:, None], acc / jnp.maximum(wsum, 1e-8)[:, None],
                     centre)


def _ewa_sample_wide(filename: str, gamma: bool, u, v, major_v, minor_v,
                     wrap: str, clamp_aniso: float):
    """Level choice + two-level blend for the wide pass: the minor axis
    is widened only to `clamp_aniso` (<= 8), giving the finer MIP level
    the reference's maxanisotropy=8 default implies (imagemap.cpp:130,
    mipmap.h EWA clamp)."""
    flat_np, offs_np, _, _ = _load_image_pyramid_flat(filename, gamma)
    n_levels = len(offs_np)
    major = jnp.sqrt(jnp.maximum(major_v[:, 0] ** 2 + major_v[:, 1] ** 2,
                                 1e-24))
    minor = jnp.sqrt(jnp.maximum(minor_v[:, 0] ** 2 + minor_v[:, 1] ** 2,
                                 1e-24))
    scale = jnp.where(minor * clamp_aniso < major,
                      major / (minor * clamp_aniso), 1.0)
    minor_v = minor_v * scale[:, None]
    minor = minor * scale
    lod = jnp.clip((n_levels - 1) + jnp.log2(jnp.maximum(minor, 1e-8)),
                   0.0, n_levels - 1)
    li = jnp.floor(lod).astype(jnp.int32)
    dl = lod - li.astype(jnp.float32)
    s0 = _ewa_level_wide(filename, gamma, u, v, major_v, minor_v, li, wrap)
    s1 = _ewa_level_wide(filename, gamma, u, v, major_v, minor_v,
                         jnp.minimum(li + 1, n_levels - 1), wrap)
    return s0 * (1 - dl)[:, None] + s1 * dl[:, None]


def _ewa_sample(filename: str, gamma: bool, u, v, dst0, dst1, wrap: str,
                max_aniso: float = 8.0):
    """MIPMap::Lookup(st, dst0, dst1) (mipmap.h:56-63 + EWA): order the
    axes, clamp anisotropy, pick the level from the MINOR axis, blend two
    EWA evaluations.

    Anisotropy tiers: every lane runs the provably-bounded 13x13 blocked
    window at a min(maxanisotropy, 2.9) clamp; when the texture's
    maxanisotropy exceeds 2.9 (the reference default is 8,
    imagemap.cpp:130), lanes whose raw footprint ratio exceeds 2.9 are
    compacted (up to n/_EWA_WIDE_FRAC of the batch) into the wide pass —
    exact EWA at the aniso-8 level via oriented strip fetches.  Lanes
    beyond the budget keep the 2.9-clamped result (over-blurred along the
    major axis only) and are counted in the
    "Texture/EWA wide-pass budget exceeded" stat."""
    from tpurt.config import get_config

    flat_np, offs_np, _, _ = _load_image_pyramid_flat(filename, gamma)
    n_levels = len(offs_np)
    l0_sq = jnp.sum(dst0 * dst0, axis=-1)
    l1_sq = jnp.sum(dst1 * dst1, axis=-1)
    swap = l0_sq < l1_sq
    major_v = jnp.where(swap[:, None], dst1, dst0)
    minor_raw_v = jnp.where(swap[:, None], dst0, dst1)
    major = jnp.sqrt(jnp.maximum(major_v[:, 0] ** 2 + major_v[:, 1] ** 2,
                                 1e-24))
    minor_raw = jnp.sqrt(jnp.maximum(minor_raw_v[:, 0] ** 2
                                     + minor_raw_v[:, 1] ** 2, 1e-24))
    tier1_aniso = min(float(max_aniso), _EWA_MAX_ANISO)
    scale = jnp.where(minor_raw * tier1_aniso < major,
                      major / (minor_raw * tier1_aniso), 1.0)
    minor_v = minor_raw_v * scale[:, None]
    minor = minor_raw * scale
    lod = jnp.clip((n_levels - 1) + jnp.log2(jnp.maximum(minor, 1e-8)),
                   0.0, n_levels - 1)
    li = jnp.floor(lod).astype(jnp.int32)
    dl = lod - li.astype(jnp.float32)
    s0 = _ewa_level(filename, gamma, u, v, major_v, minor_v, li, wrap)
    s1 = _ewa_level(filename, gamma, u, v, major_v, minor_v,
                    jnp.minimum(li + 1, n_levels - 1), wrap)
    res = s0 * (1 - dl)[:, None] + s1 * dl[:, None]

    if (float(max_aniso) <= _EWA_MAX_ANISO
            or not get_config().ewa_blocked):
        # the taps fallback stays at the 2.9 clamp (a 35x35 static taps
        # loop would unroll 1225 gathers; the blocked path is the
        # production default, the taps path the small-window oracle)
        return res

    n = u.shape[0]
    budget = int(max(min(n, 128), n // _EWA_WIDE_FRAC))
    need = major / jnp.maximum(minor_raw, 1e-12)
    hi = need > _EWA_MAX_ANISO
    order = jnp.argsort(jnp.where(hi, 0, 1))
    sel = order[:budget]
    valid = hi[sel]
    wide = _ewa_sample_wide(
        filename, gamma, u[sel], v[sel], major_v[sel], minor_raw_v[sel],
        wrap, min(float(max_aniso), _EWA_WIDE_ANISO))
    res = res.at[sel].set(jnp.where(valid[:, None], wide, res[sel]))
    _report_tex_overflow("Texture/EWA wide-pass budget exceeded",
                         jnp.sum(hi) - jnp.sum(valid))
    return res


@lru_cache(maxsize=32)
def _load_ptex(filename: str):
    """Load a Ptex file into flat device-friendly arrays: (texels (T, 3)
    f32, face_offset (F,) i64, face_ru (F,), face_rv (F,)).  Single-channel
    files replicate to gray (fromResult, ptex.cpp:113-135)."""
    from tpurt.io.ptex import read_ptex

    data = read_ptex(filename)
    offs = np.zeros(data.nfaces, np.int64)
    rus = np.zeros(data.nfaces, np.int32)
    rvs = np.zeros(data.nfaces, np.int32)
    parts = []
    t = 0
    for i, face in enumerate(data.faces):
        rv, ru, nc = face.shape
        if nc == 1:
            face = np.repeat(face, 3, axis=2)
        elif nc == 2:
            face = np.concatenate([face, face[:, :, :1]], axis=2)
        offs[i], rus[i], rvs[i] = t, ru, rv
        parts.append(face[:, :, :3].reshape(-1, 3))
        t += ru * rv
    return (np.concatenate(parts).astype(np.float32), offs, rus, rvs)


def _ptex_sample(filename: str, gamma: float, face_index, u, v):
    """Per-face bilinear lookup at level 0 with clamped face-local uv.
    The reference filters with Ptex's f_bspline kernel over the ray
    footprint (ptex.cpp:146-151); tpurt's deviation is bilinear at the
    stored res with border clamp (no cross-face adjacency filtering).
    Gamma is applied AFTER filtering to values in [0, 1], like
    ptex.cpp:154-158."""
    texels, offs, rus, rvs = _load_ptex(filename)
    tex = jnp.asarray(texels)
    fi = jnp.clip(face_index, 0, len(offs) - 1)
    off = jnp.take(jnp.asarray(offs), fi)
    ru = jnp.take(jnp.asarray(rus), fi)
    rv = jnp.take(jnp.asarray(rvs), fi)
    x = jnp.clip(u, 0.0, 1.0) * ru.astype(jnp.float32) - 0.5
    y = jnp.clip(v, 0.0, 1.0) * rv.astype(jnp.float32) - 0.5
    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, ru - 1)
    y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, rv - 1)
    x1 = jnp.minimum(x0 + 1, ru - 1)
    y1 = jnp.minimum(y0 + 1, rv - 1)
    fx = jnp.clip(x - x0.astype(jnp.float32), 0.0, 1.0)[:, None]
    fy = jnp.clip(y - y0.astype(jnp.float32), 0.0, 1.0)[:, None]

    def fetch(xi, yi):
        return jnp.take(tex, off + yi.astype(jnp.int64) * ru + xi, axis=0)

    out = ((1 - fx) * (1 - fy) * fetch(x0, y0)
           + fx * (1 - fy) * fetch(x1, y0)
           + (1 - fx) * fy * fetch(x0, y1)
           + fx * fy * fetch(x1, y1))
    if gamma != 1.0:
        out = jnp.where((out >= 0) & (out <= 1),
                        jnp.power(jnp.maximum(out, 1e-10), gamma), out)
    return out


def _apply_mapping2d(mapping: Dict, si):
    """TextureMapping2D::Map (texture.h:51-133)."""
    typ = mapping.get("type", "uv")
    if typ == "uv":
        u = si.uv[:, 0] * mapping["uscale"] + mapping["udelta"]
        v = si.uv[:, 1] * mapping["vscale"] + mapping["vdelta"]
        return u, v
    if typ == "planar":
        v1 = jnp.asarray(mapping["v1"], jnp.float32)
        v2 = jnp.asarray(mapping["v2"], jnp.float32)
        u = jnp.sum(si.p * v1, -1) + mapping["udelta"]
        v = jnp.sum(si.p * v2, -1) + mapping["vdelta"]
        return u, v
    if typ == "spherical":
        d = si.p / jnp.maximum(jnp.linalg.norm(si.p, axis=-1, keepdims=True), 1e-9)
        theta = jnp.arccos(jnp.clip(d[:, 2], -1, 1))
        phi = jnp.arctan2(d[:, 1], d[:, 0])
        phi = jnp.where(phi < 0, phi + 2 * np.pi, phi)
        return theta / np.pi, phi / (2 * np.pi)
    if typ == "cylindrical":
        phi = jnp.arctan2(si.p[:, 1], si.p[:, 0])
        phi = jnp.where(phi < 0, phi + 2 * np.pi, phi)
        return phi / (2 * np.pi), si.p[:, 2]
    raise ValueError(typ)


def _tex_p(rec: TextureRecord, si):
    """World -> texture-space point for 3D/noise textures."""
    if rec.world_to_texture is None:
        return si.p
    m = jnp.asarray(rec.world_to_texture.m.astype(np.float32))
    x, y, z = si.p[:, 0], si.p[:, 1], si.p[:, 2]
    return jnp.stack([
        m[0, 0] * x + m[0, 1] * y + m[0, 2] * z + m[0, 3],
        m[1, 0] * x + m[1, 1] * y + m[1, 2] * z + m[1, 3],
        m[2, 0] * x + m[2, 1] * y + m[2, 2] * z + m[2, 3],
    ], axis=-1)


def _eval_slot(slot, si, want3: bool):
    """A ('constant', v) | ('texture', rec) slot -> (N,) or (N,3)."""
    kind, val = slot
    n = si.p.shape[0]
    if kind == "constant":
        arr = jnp.asarray(np.asarray(val, np.float32))
        if want3:
            return jnp.broadcast_to(arr * jnp.ones(3, jnp.float32), (n, 3))
        return jnp.full((n,), float(np.asarray(val).reshape(-1)[0]), jnp.float32)
    return eval_texture(val, si, want3)


def _bilinear_sample(level: np.ndarray, u, v, wrap: str):
    h, w = level.shape[:2]
    img = jnp.asarray(level)
    x = u * w - 0.5
    y = v * h - 0.5
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = x - x0
    fy = y - y0

    def wrapc(i, n):
        if wrap == "repeat":
            return jnp.mod(i, n)
        if wrap == "clamp":
            return jnp.clip(i, 0, n - 1)
        return i  # black handled below

    def fetch(xi, yi):
        val = img[wrapc(yi, h), wrapc(xi, w)]
        if wrap == "black":
            ok = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
            val = jnp.where(ok[:, None], val, 0.0)
        return val

    c00 = fetch(x0, y0)
    c10 = fetch(x0 + 1, y0)
    c01 = fetch(x0, y0 + 1)
    c11 = fetch(x0 + 1, y0 + 1)
    top = c00 * (1 - fx)[:, None] + c10 * fx[:, None]
    bot = c01 * (1 - fx)[:, None] + c11 * fx[:, None]
    return top * (1 - fy)[:, None] + bot * fy[:, None]


def eval_texture(rec: TextureRecord, si, want3: bool):
    """Evaluate a TextureRecord over the hit lanes."""
    n = si.p.shape[0]
    prm = rec.params
    name = rec.name

    def as_out(x):
        if want3 and x.ndim == 1:
            return jnp.repeat(x[:, None], 3, axis=-1)
        if not want3 and x.ndim == 2:
            return x.mean(-1)
        return x

    if name == "constant":
        v = np.asarray(prm["value"], np.float32)
        if want3:
            return jnp.broadcast_to(jnp.asarray(v * np.ones(3, np.float32)),
                                    (n, 3))
        return jnp.full((n,), float(v.reshape(-1)[0]), jnp.float32)
    if name == "scale":
        return as_out(_eval_slot(prm["tex1"], si, want3)
                      * _eval_slot(prm["tex2"], si, want3))
    if name == "mix":
        amt = _eval_slot(prm["amount"], si, False)
        t1 = _eval_slot(prm["tex1"], si, want3)
        t2 = _eval_slot(prm["tex2"], si, want3)
        a = amt[:, None] if want3 else amt
        return t1 * (1 - a) + t2 * a
    if name == "bilerp":
        u, v = _apply_mapping2d(prm["mapping"], si)
        v00 = _eval_slot(prm["v00"], si, want3)
        v01 = _eval_slot(prm["v01"], si, want3)
        v10 = _eval_slot(prm["v10"], si, want3)
        v11 = _eval_slot(prm["v11"], si, want3)
        uu = u[:, None] if want3 else u
        vv = v[:, None] if want3 else v
        return ((1 - uu) * (1 - vv) * v00 + (1 - uu) * vv * v01
                + uu * (1 - vv) * v10 + uu * vv * v11)
    if name == "uv":
        u, v = _apply_mapping2d(prm["mapping"], si)
        rgb = jnp.stack([u - jnp.floor(u), v - jnp.floor(v),
                         jnp.zeros_like(u)], axis=-1)
        return as_out(rgb)
    if name == "checkerboard":
        tex1 = _eval_slot(prm["tex1"], si, want3)
        tex2 = _eval_slot(prm["tex2"], si, want3)
        if prm["dimension"] == 2:
            u, v = _apply_mapping2d(prm["mapping"], si)
            even = (jnp.floor(u) + jnp.floor(v)).astype(jnp.int32) % 2 == 0
        else:
            p = _tex_p(rec, si)
            even = (jnp.floor(p[:, 0]) + jnp.floor(p[:, 1])
                    + jnp.floor(p[:, 2])).astype(jnp.int32) % 2 == 0
        m = even[:, None] if want3 else even
        point = jnp.where(m, tex1, tex2)
        have_diff = (getattr(si, "tex_dst0", None) is not None
                     or getattr(si, "tex_wu", None) is not None)
        if (prm["dimension"] == 2 and have_diff
                and prm.get("aamode", "closedform") == "closedform"):
            # Closed-form box-filtered checker (checkerboard.cpp:101-140):
            # filter extent (ds, dt) in checker uv; if it spans a check
            # boundary, blend tex1/tex2 by the box-filtered area of the
            # step function via its integral bumpInt.
            mp = prm["mapping"]
            if mp.get("type", "uv") == "uv":
                su_s = abs(mp.get("uscale", 1.0))
                sv_s = abs(mp.get("vscale", 1.0))
            else:
                su_s = sv_s = 1.0  # tex_dst covers the uv mapping only
            if getattr(si, "tex_dst0", None) is not None:
                ds = jnp.maximum(jnp.abs(si.tex_dst0[:, 0]),
                                 jnp.abs(si.tex_dst1[:, 0])) * su_s
                dt_ = jnp.maximum(jnp.abs(si.tex_dst0[:, 1]),
                                  jnp.abs(si.tex_dst1[:, 1])) * sv_s
            else:
                ds = si.tex_wu * su_s
                dt_ = si.tex_wv * sv_s
            ds = jnp.maximum(ds, 1e-8)
            dt_ = jnp.maximum(dt_, 1e-8)
            s_lo, s_hi = u - ds, u + ds
            t_lo, t_hi = v - dt_, v + dt_
            one_check = ((jnp.floor(s_lo) == jnp.floor(s_hi))
                         & (jnp.floor(t_lo) == jnp.floor(t_hi)))

            def bump_int(x):
                return (jnp.floor(x / 2) + 2 * jnp.maximum(
                    x / 2 - jnp.floor(x / 2) - 0.5, 0.0))

            sint = (bump_int(s_hi) - bump_int(s_lo)) / (2 * ds)
            tint = (bump_int(t_hi) - bump_int(t_lo)) / (2 * dt_)
            area2 = sint + tint - 2 * sint * tint
            area2 = jnp.where((ds > 1) | (dt_ > 1), 0.5, area2)
            a = area2[:, None] if want3 else area2
            filtered = tex1 * (1 - a) + tex2 * a
            oc = one_check[:, None] if want3 else one_check
            return jnp.where(oc, point, filtered)
        return point
    if name == "dots":
        u, v = _apply_mapping2d(prm["mapping"], si)
        # pbrt's dots: per-cell noise decides presence + center
        su, sv = jnp.floor(u + 0.5), jnp.floor(v + 0.5)
        cell = jnp.stack([su + 0.5, sv + 0.5, jnp.zeros_like(su)], -1)
        has_dot = perlin_noise(cell) > 0
        cx = su + 0.35 * perlin_noise(cell + jnp.asarray([1.5, 2.8, 0.0]))
        cy = sv + 0.35 * perlin_noise(cell + jnp.asarray([4.5, 9.8, 0.0]))
        inside = has_dot & ((u - cx) ** 2 + (v - cy) ** 2 < 0.35 * 0.35)
        t1 = _eval_slot(prm["inside"], si, want3)
        t2 = _eval_slot(prm["outside"], si, want3)
        m = inside[:, None] if want3 else inside
        return jnp.where(m, t1, t2)
    if name == "ptex":
        fname = prm["filename"]
        if not fname:
            return as_out(jnp.zeros((n,), jnp.float32))
        try:
            _load_ptex(fname)
        except (OSError, ValueError, RuntimeError) as e:
            # degrade to mid-gray so the render stays diagnosable (the
            # reference's Ptex library errors out at creation instead;
            # the parse-time warning in render/textures.py points here)
            log.error("ptex %s unreadable (rendering 0.5 gray): %s",
                      fname, e)
            return as_out(jnp.full((n,), 0.5, jnp.float32))
        fi = (si.face_index if si.face_index is not None
              else jnp.zeros((n,), jnp.int32))
        rgb = _ptex_sample(fname, float(prm.get("gamma", 2.2)),
                           fi, si.uv[:, 0], si.uv[:, 1])
        return as_out(rgb)
    if name == "imagemap":
        fname = prm["filename"]
        if not fname:
            return as_out(jnp.zeros((n,), jnp.float32))
        try:
            pyr = _load_image_pyramid(fname, prm.get("gamma", False))
        except (OSError, ValueError) as e:
            log.error("imagemap %s unreadable: %s", fname, e)
            return as_out(jnp.zeros((n,), jnp.float32))
        u, v = _apply_mapping2d(prm["mapping"], si)
        wrap = prm.get("wrap", "repeat")
        mp = prm["mapping"]
        su = abs(mp.get("uscale", 1.0)) if mp.get("type", "uv") == "uv" else 1.0
        sv = abs(mp.get("vscale", 1.0)) if mp.get("type", "uv") == "uv" else 1.0
        if getattr(si, "tex_dst0", None) is not None:
            # anisotropic EWA from true ray differentials (camera hits) /
            # the isotropic cone (indirect); mapping scales stretch the
            # derivative vectors in uv space
            sc = jnp.asarray([su, sv], jnp.float32)
            rgb = _ewa_sample(fname, prm.get("gamma", False), u, v,
                              si.tex_dst0 * sc, si.tex_dst1 * sc, wrap,
                              max_aniso=float(prm.get("maxanisotropy",
                                                      8.0)))
        elif getattr(si, "tex_wu", None) is not None:
            # trilinear MIP filtering from the ray-footprint width
            width = jnp.maximum(si.tex_wu * su, si.tex_wv * sv)
            rgb = _trilinear_sample(fname, prm.get("gamma", False), u, v,
                                    width, wrap)
        else:
            rgb = _bilinear_sample(pyr[0], u, v, wrap)
        rgb = rgb * prm.get("scale", 1.0)
        return as_out(rgb)
    if name == "fbm":
        p = _tex_p(rec, si)
        return as_out(fbm(p, prm["octaves"], prm["roughness"]))
    if name == "wrinkled":
        p = _tex_p(rec, si)
        return as_out(turbulence(p, prm["octaves"], prm["roughness"]))
    if name == "windy":
        p = _tex_p(rec, si)
        strength = fbm(0.1 * p, 3, 0.5)
        height = fbm(p, 6, 0.5)
        return as_out(jnp.abs(strength) * height)
    if name == "marble":
        p = _tex_p(rec, si) * prm["scale"]
        marble = p[:, 1] + prm["variation"] * fbm(p, prm["octaves"],
                                                  prm["roughness"])
        t = 0.5 + 0.5 * jnp.sin(marble)
        # pbrt's marble spline; a simple warm ramp keeps the look
        c1 = jnp.asarray([0.58, 0.58, 0.6])
        c2 = jnp.asarray([0.88, 0.85, 0.82])
        rgb = c1 * (1 - t[:, None]) + c2 * t[:, None]
        return as_out(rgb)
    log.warning("texture %s not evaluable; returning 0", name)
    return as_out(jnp.zeros((n,), jnp.float32))


def make_bump_eval(mt):
    """Material::Bump (material.cpp:50-87) as a wavefront pass: evaluate
    the displacement texture at uv, uv+du, uv+dv and rebuild the shading
    normal from the displaced dpdu/dpdv.  No ray differentials yet, so
    the offsets use the reference's constant fallback (du = .0005).
    Returns None when no material carries a bump texture."""
    recs = []
    for i, r in enumerate(mt.records):
        if r is None:
            continue
        s = r.slots.get("bumpmap")
        if isinstance(s, tuple) and s[0] == "texture":
            recs.append((i, s[1]))
    if not recs:
        return None

    def apply(si):
        if si.dpdu is None:
            return si
        du = jnp.float32(5e-4)
        ns = si.ns
        ns_new = ns
        for mat_idx, rec in recs:
            disp = eval_texture(rec, si, False)
            si_u = si._replace(uv=si.uv + jnp.asarray([5e-4, 0.0], jnp.float32),
                               p=si.p + du * si.dpdu)
            si_v = si._replace(uv=si.uv + jnp.asarray([0.0, 5e-4], jnp.float32),
                               p=si.p + du * si.dpdv)
            ud = eval_texture(rec, si_u, False)
            vd = eval_texture(rec, si_v, False)
            dpdu2 = si.dpdu + ((ud - disp) / du)[:, None] * ns
            dpdv2 = si.dpdv + ((vd - disp) / du)[:, None] * ns
            n2 = jnp.cross(dpdu2, dpdv2)
            n2 = n2 / jnp.maximum(
                jnp.linalg.norm(n2, axis=-1, keepdims=True), 1e-12)
            # keep the original orientation (Faceforward in Bump)
            flip = jnp.sum(n2 * ns, axis=-1) < 0
            n2 = jnp.where(flip[:, None], -n2, n2)
            m = (si.material_id == mat_idx) & si.valid
            ns_new = jnp.where(m[:, None], n2, ns_new)
        ss = si.ss
        if ss is not None:
            s_perp = ss - jnp.sum(ss * ns_new, axis=-1, keepdims=True) * ns_new
            ss = s_perp / jnp.maximum(
                jnp.linalg.norm(s_perp, axis=-1, keepdims=True), 1e-12)
        return si._replace(ns=ns_new, ss=ss)

    return apply


class TexEval:
    """Per-wavefront texture callback bundle: __call__ produces the
    fetch_lobes overrides; .bump (optional) perturbs shading normals."""

    def __init__(self, overrides_fn, bump_fn):
        self._fn = overrides_fn
        self.bump = bump_fn

    def __call__(self, si):
        return self._fn(si) if self._fn is not None else None


def make_texture_eval(mt, mt_table_dev):
    """Build the per-wavefront texture-override callback for fetch_lobes.

    mt: MaterialTable (host).  Returns None when no material has textured
    slots or bump maps (the common case costs nothing)."""
    bump = make_bump_eval(mt)
    if not mt.textured:
        return TexEval(None, bump) if bump is not None else None

    from tpurt.render.materials_build import (
        C_KD0, C_KR0, C_KS0, C_KT0, C_ROUGH, C_SIGMA,
    )

    col3 = {"Kd": C_KD0, "Ks": C_KS0, "Kr": C_KR0, "Kt": C_KT0,
            "reflect": C_KD0, "transmit": C_KT0, "opacity": None,
            "eta": None, "k": None}
    col1 = {"roughness": C_ROUGH, "sigma": C_SIGMA}

    def evaluate(si):
        overrides = {}
        mat_id = si.material_id
        idx = jnp.maximum(mat_id, 0)
        for mat_idx, slot in mt.textured:
            rec = mt.records[mat_idx].slots[slot]
            if not (isinstance(rec, tuple) and rec[0] == "texture"):
                continue
            want3 = slot in col3
            val = eval_texture(rec[1], si, want3)
            if slot not in overrides:
                if want3 and col3.get(slot) is not None:
                    c = col3[slot]
                    overrides[slot] = mt_table_dev[idx][:, c:c + 3]
                elif not want3 and slot in col1:
                    overrides[slot] = mt_table_dev[idx][:, col1[slot]]
                else:
                    continue  # slot not overridable yet (eta3/k/opacity)
            m = (mat_id == mat_idx)
            overrides[slot] = jnp.where(m[:, None] if want3 else m, val,
                                        overrides[slot])
        return overrides

    return TexEval(evaluate, bump)
