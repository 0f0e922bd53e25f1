"""Hosek-Wilkie sky model for `imgtool makesky` parity.

The reference's makesky (src/tools/imgtool.cpp:87-190) evaluates the
SPECTRAL Hosek-Wilkie model (vendored upstream at
src/ext/ArHosekSkyModel.c — public code by Hosek & Wilkie, (c) 2012-13,
3-clause BSD) at nine wavelengths {630,680,710, 500,530,560, 460,480,490}
including the solar disc, and averages triples into RGB.

This module re-implements the published model in numpy and reads the
NUMERICAL DATASETS (quintic-bezier control points over albedo x
turbidity x elevation, the solar-radiance piecewise polynomials, and the
limb-darkening coefficients) from the upstream data header when a
pbrt-v3 source tree is reachable ($TPURT_PBRT_SRC or /root/reference),
caching them as .npz.  Without the datasets, imgtool falls back to the
Preetham model (documented deviation).

Formulas mirrored from the upstream reference implementation:
  - CookConfiguration / CookRadianceConfiguration: quintic bezier in
    cbrt(2*elevation/pi), bilinear in (albedo, turbidity)
    (ArHosekSkyModel.c:147-289).
  - GetRadianceInternal: the 9-coefficient sky dome term (:291-305).
  - solar_radiance_internal2: piecewise-cubic direct solar radiance
    (45 pieces in cbrt-elevation, 4th-order, :658-697) x 5th-order
    limb darkening in the sample cosine (:770-795); solar radius
    0.255 degrees (:316).
"""

from __future__ import annotations

import os
import re

import numpy as np

_WLS = np.arange(320.0, 721.0, 40.0)  # 11 bands
_PIECES = 45
_ORDER = 4
_SOLAR_RADIUS = np.deg2rad(0.51) / 2.0

# the nine sample wavelengths makesky uses (imgtool.cpp:143)
MAKESKY_LAMBDA = np.array(
    [630.0, 680.0, 710.0, 500.0, 530.0, 560.0, 460.0, 480.0, 490.0])


def _find_data_header():
    cands = []
    envp = os.environ.get("TPURT_PBRT_SRC")
    if envp:
        cands.append(os.path.join(envp, "ext",
                                  "ArHosekSkyModelData_Spectral.h"))
    cands.append("/root/reference/src/ext/ArHosekSkyModelData_Spectral.h")
    for c in cands:
        if os.path.isfile(c):
            return c
    return None


def load_datasets():
    """Returns dict with 'config' (11, 2*10*6*9), 'rad' (11, 2*10*6),
    'solar' (11, 10*45*4), 'limb' (11, 6) — or None when the upstream
    data header is unavailable."""
    cache_dir = os.environ.get("TPURT_CACHE",
                               os.path.expanduser("~/.cache/tpurt"))
    cache = os.path.join(cache_dir, "hosek_spectral_v1.npz")
    if os.path.exists(cache):
        z = np.load(cache)
        return {k: z[k] for k in ("config", "rad", "solar", "limb")}
    hdr = _find_data_header()
    if hdr is None:
        return None
    text = open(hdr).read()

    num_re = re.compile(r"[-+]?(?:\d+\.?\d*|\.\d+)(?:[eE][-+]?\d+)?")

    def arr(name, n):
        m = re.search(r"double\s+%s\[\]\s*=\s*\{(.*?)\};" % name, text,
                      re.S)
        if m is None:
            raise ValueError(f"{name} not found in {hdr}")
        body = re.sub(r"//[^\n]*", "", m.group(1))  # strip // comments
        v = np.array([float(x) for x in num_re.findall(body)])
        if v.size != n:
            raise ValueError(f"{name}: {v.size} != {n}")
        return v

    out = {
        "config": np.stack([arr(f"dataset{int(w)}", 2 * 10 * 6 * 9)
                            for w in _WLS]),
        "rad": np.stack([arr(f"datasetRad{int(w)}", 2 * 10 * 6)
                         for w in _WLS]),
        "solar": np.stack([arr(f"solarDataset{int(w)}", 10 * _PIECES
                               * _ORDER) for w in _WLS]),
        "limb": np.stack([arr(f"limbDarkeningDataset{int(w)}", 6)
                          for w in _WLS]),
    }
    os.makedirs(cache_dir, exist_ok=True)
    np.savez_compressed(cache, **out)
    return out


def _bezier5(ctrl, x):
    """Quintic bezier over 6 control points; ctrl (..., 6, K)."""
    b = np.array([1.0, 5.0, 10.0, 10.0, 5.0, 1.0])
    w = np.array([b[k] * (1 - x) ** (5 - k) * x ** k for k in range(6)])
    return np.tensordot(w, ctrl, axes=([0], [-2])) if ctrl.ndim == 2 \
        else (w[:, None] * ctrl).sum(-2)


def _cook(dataset, n_coef, turbidity, albedo, elevation):
    """CookConfiguration/CookRadianceConfiguration: dataset flattened
    [2 albedos][10 turbidities][6 ctrl][n_coef]."""
    d = dataset.reshape(2, 10, 6, n_coef)
    it = int(turbidity)
    rem = turbidity - it
    x = (elevation / (np.pi / 2.0)) ** (1.0 / 3.0)
    cfg = ((1 - albedo) * (1 - rem) * _bezier5(d[0, it - 1], x)
           + albedo * (1 - rem) * _bezier5(d[1, it - 1], x))
    if it < 10:
        cfg = cfg + ((1 - albedo) * rem * _bezier5(d[0, it], x)
                     + albedo * rem * _bezier5(d[1, it], x))
    return cfg


class HosekSkyState:
    """arhosekskymodelstate_alloc_init analog: per-band 9-coefficient
    configs + radiance scales for one (elevation, turbidity, albedo)."""

    def __init__(self, data, solar_elevation, turbidity, albedo):
        self.data = data
        self.turbidity = float(turbidity)
        self.elevation = float(solar_elevation)
        self.configs = np.stack([
            _cook(data["config"][i], 9, turbidity, albedo, solar_elevation)
            for i in range(11)])  # (11, 9)
        self.radiances = np.array([
            _cook(data["rad"][i], 1, turbidity, albedo,
                  solar_elevation)[0] for i in range(11)])

    # -- sky dome -----------------------------------------------------
    def _radiance_internal(self, wl_i, theta, gamma):
        c = self.configs[wl_i]
        cg = np.cos(gamma)
        expm = np.exp(c[4] * gamma)
        raym = cg * cg
        miem = (1.0 + cg * cg) / np.power(
            1.0 + c[8] * c[8] - 2.0 * c[8] * cg, 1.5)
        zenith = np.sqrt(np.maximum(np.cos(theta), 0.0))
        return ((1.0 + c[0] * np.exp(c[1] / (np.cos(theta) + 0.01)))
                * (c[2] + c[3] * expm + c[5] * raym + c[6] * miem
                   + c[7] * zenith))

    def sky_radiance(self, theta, gamma, wavelength):
        low = int((wavelength - 320.0) / 40.0)
        if low < 0 or low >= 11:
            return np.zeros_like(theta)
        interp = ((wavelength - 320.0) / 40.0) % 1.0
        val = (self._radiance_internal(low, theta, gamma)
               * self.radiances[low])
        if interp < 1e-6 or low + 1 >= 11:
            return val
        val2 = (self._radiance_internal(low + 1, theta, gamma)
                * self.radiances[low + 1])
        return (1 - interp) * val + interp * val2

    # -- solar disc ---------------------------------------------------
    def _sr_internal(self, turb_i, wl_i, elevation):
        """Piecewise polynomial direct solar radiance
        (arhosekskymodel_sr_internal)."""
        sol = self.data["solar"][wl_i].reshape(10, _PIECES, _ORDER)
        pos = np.minimum(
            ((2.0 * elevation / np.pi) ** (1.0 / 3.0)
             * _PIECES).astype(np.int64), 44)
        break_x = (pos / _PIECES) ** 3.0 * (np.pi * 0.5)
        x = elevation - break_x
        # coefs read BACKWARD from order*(pos+1)-1: res = sum coefs[-1-i] x^i
        c = sol[turb_i][pos]  # (..., 4) in forward order
        res = np.zeros_like(x)
        for i in range(_ORDER):
            res = res + (x ** i) * c[..., _ORDER - 1 - i]
        return res

    def solar_disc_radiance(self, elevation, gamma, wavelength):
        sol_rad_sin = np.sin(_SOLAR_RADIUS)
        ar2 = 1.0 / (sol_rad_sin * sol_rad_sin)
        singamma = np.sin(gamma)
        sc2 = np.maximum(1.0 - ar2 * singamma * singamma, 0.0)
        sample_cos = np.sqrt(sc2)

        turb_low = int(self.turbidity) - 1
        turb_frac = self.turbidity - (turb_low + 1)
        if turb_low == 9:
            turb_low, turb_frac = 8, 1.0
        wl_low = int((wavelength - 320.0) / 40.0)
        wl_frac = (wavelength % 40.0) / 40.0
        if wl_low == 10:
            wl_low, wl_frac = 9, 1.0

        dr = ((1 - turb_frac)
              * ((1 - wl_frac) * self._sr_internal(turb_low, wl_low,
                                                   elevation)
                 + wl_frac * self._sr_internal(turb_low, wl_low + 1,
                                               elevation))
              + turb_frac
              * ((1 - wl_frac) * self._sr_internal(turb_low + 1, wl_low,
                                                   elevation)
                 + wl_frac * self._sr_internal(turb_low + 1, wl_low + 1,
                                               elevation)))
        ld = ((1 - wl_frac) * self.data["limb"][wl_low]
              + wl_frac * self.data["limb"][wl_low + 1])
        darkening = np.zeros_like(sample_cos)
        for i in range(6):
            darkening = darkening + ld[i] * sample_cos ** i
        return np.where(sample_cos > 0.0, dr * darkening, 0.0)

    def solar_radiance(self, theta, gamma, wavelength):
        """arhosekskymodel_solar_radiance: disc + in-scattered sky."""
        return (self.solar_disc_radiance((np.pi / 2.0) - theta, gamma,
                                         wavelength)
                + self.sky_radiance(theta, gamma, wavelength))


def make_sky_image(resolution: int, elevation: float, turbidity: float,
                   albedo: float):
    """The makesky pixel loop (imgtool.cpp:155-185): lat-long sky image
    (nTheta x 2nTheta, RGB) from nine wavelength evaluations, or None
    when the datasets are unavailable."""
    data = load_datasets()
    if data is None:
        return None
    state = HosekSkyState(data, elevation, turbidity, albedo)
    n_theta = resolution
    n_phi = 2 * n_theta
    img = np.zeros((n_theta, n_phi, 3), np.float32)
    sun_dir = np.array([0.0, np.sin(elevation), np.cos(elevation)])
    t = np.arange(n_theta)
    theta = (t + 0.5) / n_theta * np.pi
    sky_rows = theta <= np.pi / 2.0
    phi = (np.arange(n_phi) + 0.5) / n_phi * 2.0 * np.pi
    for ti in np.nonzero(sky_rows)[0]:
        th = theta[ti]
        v = np.stack([np.cos(phi) * np.sin(th),
                      np.full_like(phi, np.cos(th)),
                      np.sin(phi) * np.sin(th)], axis=-1)
        gamma = np.arccos(np.clip(v @ sun_dir, -1.0, 1.0))
        for c, lam in enumerate(MAKESKY_LAMBDA):
            img[ti, :, c // 3] += (
                state.solar_radiance(np.full_like(gamma, th), gamma, lam)
                / 3.0).astype(np.float32)
    return img
