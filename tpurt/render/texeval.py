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


@lru_cache(maxsize=64)
def _load_image_pyramid_blocked(filename: str, gamma: bool, wrap: str):
    """Pyramid re-packed for the blocked EWA fetch: returns
    (blocks (NB, 4, 16, 3) f32, boffs (L,), nbx (L,), ws (L,), hs (L,)).
    Both wrap axes are baked into the apron texels: padded texel
    (q, p) stores source (resolve(q - APRON), resolve(p - APRON))."""
    levels = _load_image_pyramid(filename, gamma)
    boffs, nbxs, ws, hs, parts = [], [], [], [], []
    boff = 0
    for lv in levels:
        h, w = lv.shape[:2]
        w_pad = -((w + 2 * _EWA_APRON) // -_EWA_BLOCK) * _EWA_BLOCK
        h_pad = -((h + 2 * _EWA_APRON) // -_EWA_VBLOCK) * _EWA_VBLOCK
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
        nby = h_pad // _EWA_VBLOCK
        nbx = w_pad // _EWA_BLOCK
        parts.append(padded.reshape(nby, _EWA_VBLOCK, nbx, _EWA_BLOCK, 3)
                     .transpose(0, 2, 1, 3, 4)
                     .reshape(nby * nbx, _EWA_VBLOCK, _EWA_BLOCK, 3))
        boffs.append(boff)
        nbxs.append(nbx)
        ws.append(w)
        hs.append(h)
        boff += nby * nbx
    return (np.concatenate(parts).astype(np.float32),
            np.asarray(boffs, np.int32), np.asarray(nbxs, np.int32),
            np.asarray(ws, np.int32), np.asarray(hs, np.int32))


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
                    wrap: str):
    """EWA filter at one MIP level (MIPMap::EWA, mipmap.h): elliptical
    Gaussian weights over a STATIC tap window centred at (u, v)."""
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

    iu0 = jnp.round(su).astype(jnp.int32) - _EWA_TAPS // 2
    iv0 = jnp.round(sv).astype(jnp.int32) - _EWA_TAPS // 2
    acc = jnp.zeros((u.shape[0], 3), jnp.float32)
    wsum = jnp.zeros(u.shape[0], jnp.float32)
    exp_m2 = np.float32(np.exp(-2.0))
    for dv in range(_EWA_TAPS):
        for du in range(_EWA_TAPS):
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


def _ewa_sample(filename: str, gamma: bool, u, v, dst0, dst1, wrap: str):
    """MIPMap::Lookup(st, dst0, dst1) (mipmap.h:56-63 + EWA): order the
    axes, clamp anisotropy, pick the level from the MINOR axis, blend two
    EWA evaluations."""
    flat_np, offs_np, _, _ = _load_image_pyramid_flat(filename, gamma)
    n_levels = len(offs_np)
    l0_sq = jnp.sum(dst0 * dst0, axis=-1)
    l1_sq = jnp.sum(dst1 * dst1, axis=-1)
    swap = l0_sq < l1_sq
    major_v = jnp.where(swap[:, None], dst1, dst0)
    minor_v = jnp.where(swap[:, None], dst0, dst1)
    major = jnp.sqrt(jnp.maximum(major_v[:, 0] ** 2 + major_v[:, 1] ** 2,
                                 1e-24))
    minor = jnp.sqrt(jnp.maximum(minor_v[:, 0] ** 2 + minor_v[:, 1] ** 2,
                                 1e-24))
    scale = jnp.where(minor * _EWA_MAX_ANISO < major,
                      major / (minor * _EWA_MAX_ANISO), 1.0)
    minor_v = minor_v * scale[:, None]
    minor = minor * scale
    lod = jnp.clip((n_levels - 1) + jnp.log2(jnp.maximum(minor, 1e-8)),
                   0.0, n_levels - 1)
    li = jnp.floor(lod).astype(jnp.int32)
    dl = lod - li.astype(jnp.float32)
    s0 = _ewa_level(filename, gamma, u, v, major_v, minor_v, li, wrap)
    s1 = _ewa_level(filename, gamma, u, v, major_v, minor_v,
                    jnp.minimum(li + 1, n_levels - 1), wrap)
    return s0 * (1 - dl)[:, None] + s1 * dl[:, None]


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
            log.error("ptex %s unreadable: %s", fname, e)
            return as_out(jnp.zeros((n,), jnp.float32))
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
                              si.tex_dst0 * sc, si.tex_dst1 * sc, wrap)
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
