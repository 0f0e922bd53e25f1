"""SampledSpectrum (60-bin) rendering mode: bin layout, RGB<->spectrum
conversions, and the CIE integration used by the spectral pipeline.

Reference analog: core/spectrum.{h,cpp} with PBRT_SAMPLED_SPECTRUM
(pbrt.h:126-130): Spectrum = SampledSpectrum — 60 uniform bins over
[400, 700) nm (spectrum.h:48-50).  RGB scene parameters are promoted to
smooth spectra through the Smits-style 7-basis piecewise-linear
combination (SampledSpectrum::FromRGB, spectrum.cpp:310-385, with the
0.94 reflectance / 0.86445 illuminant scales), SPD samples are
bin-averaged (AverageSpectrumSamples, spectrum.cpp:40-65), and radiance
converts to XYZ against the bin-averaged CIE curves at the film
(SampledSpectrum::ToXYZ / Init, spectrum.h:315-340).

TPU design: nothing in the wavefront branches per channel — a spectrum
is just a (..., C) axis with C = 60 instead of 3.  RGB -> spectrum
promotion is expressed as a (N, 7) coefficient matrix (the six min-
ordering cases become masked selects) times a static (7, C) basis —
one small matmul that XLA places on the MXU.  The numeric basis/CIE
tables are read AS DATA from an upstream pbrt-v3 source tree (same
stance as the Sobol direction numbers) and cached as .npz; without a
tree, an analytic fallback basis is synthesized from the CIE fits
(documented deviation — scene colors will promote slightly differently).
"""

from __future__ import annotations

import logging
import os
import re

import numpy as np

from tpurt.spectrum import (
    CIE_Y_INTEGRAL,
    XYZ_TO_RGB,
    cie_x,
    cie_y,
    cie_z,
)

log = logging.getLogger("tpurt.spectrum")

N_BINS = 60
LAMBDA_START = 400.0
LAMBDA_END = 700.0

_BASIS_NAMES = [
    "RGB2SpectLambda",
    "RGBRefl2SpectWhite", "RGBRefl2SpectCyan", "RGBRefl2SpectMagenta",
    "RGBRefl2SpectYellow", "RGBRefl2SpectRed", "RGBRefl2SpectGreen",
    "RGBRefl2SpectBlue",
    "RGBIllum2SpectWhite", "RGBIllum2SpectCyan", "RGBIllum2SpectMagenta",
    "RGBIllum2SpectYellow", "RGBIllum2SpectRed", "RGBIllum2SpectGreen",
    "RGBIllum2SpectBlue",
]


def _cache_dir() -> str:
    d = os.environ.get("TPURT_CACHE",
                       os.path.expanduser("~/.cache/tpurt"))
    os.makedirs(d, exist_ok=True)
    return d


def _extract_float_array(text: str, name: str):
    """Parse `const Float NAME[...] = { ... };` from C++ source text."""
    m = re.search(r"Float\s+" + re.escape(name) + r"\s*\[[^\]]*\]\s*=\s*\{"
                  r"([^}]*)\}", text, re.S)
    if not m:
        return None
    vals = re.findall(r"[-+]?(?:\d+\.?\d*|\.\d+)(?:[eE][-+]?\d+)?",
                      m.group(1))
    return np.array([float(v) for v in vals], np.float64)


def _load_upstream_tables():
    """RGB->spectrum basis + CIE curves from an upstream pbrt-v3 tree
    (numeric data only), cached as npz."""
    cache = os.path.join(_cache_dir(), "spectral_tables_v1.npz")
    if os.path.isfile(cache):
        z = np.load(cache)
        return {k: z[k] for k in z.files}
    roots = [os.environ.get("TPURT_PBRT_SRC"), "/root/reference/src"]
    for root in roots:
        if not root:
            continue
        src = os.path.join(root, "core", "spectrum.cpp")
        if not os.path.isfile(src):
            continue
        text = open(src, errors="replace").read()
        out = {}
        ok = True
        for name in _BASIS_NAMES + ["CIE_lambda", "CIE_X", "CIE_Y", "CIE_Z"]:
            arr = _extract_float_array(text, name)
            if arr is None:
                ok = False
                break
            out[name] = arr
        if ok:
            np.savez(cache, **out)
            return out
    return None


def _average_samples(lam: np.ndarray, val: np.ndarray,
                     l0: float, l1: float) -> float:
    """AverageSpectrumSamples (spectrum.cpp:40-65): mean of the
    piecewise-linear SPD over [l0, l1] with constant end extension."""
    lam = np.asarray(lam, np.float64)
    val = np.asarray(val, np.float64)
    if len(lam) == 1 or l1 <= lam[0]:
        return float(val[0])
    if l0 >= lam[-1]:
        return float(val[-1])
    s = 0.0
    if l0 < lam[0]:
        s += val[0] * (lam[0] - l0)
    if l1 > lam[-1]:
        s += val[-1] * (l1 - lam[-1])
    i = int(np.searchsorted(lam, l0, side="right") - 1)
    i = max(i, 0)

    def interp(w, j):
        t = (w - lam[j]) / (lam[j + 1] - lam[j])
        return (1 - t) * val[j] + t * val[j + 1]

    while i + 1 < len(lam) and l1 >= lam[i]:
        s0 = max(l0, lam[i])
        s1 = min(l1, lam[i + 1])
        if s1 > s0:
            s += 0.5 * (interp(s0, i) + interp(s1, i)) * (s1 - s0)
        i += 1
    return s / (l1 - l0)


def spd_to_bins(lambdas, values) -> np.ndarray:
    """Resample a (sorted or unsorted) piecewise-linear SPD into the 60
    bins (SampledSpectrum::FromSampled, spectrum.h:295-313)."""
    lam = np.asarray(lambdas, np.float64)
    val = np.asarray(values, np.float64)
    order = np.argsort(lam)
    lam, val = lam[order], val[order]
    out = np.empty(N_BINS)
    for i in range(N_BINS):
        l0 = LAMBDA_START + (LAMBDA_END - LAMBDA_START) * i / N_BINS
        l1 = LAMBDA_START + (LAMBDA_END - LAMBDA_START) * (i + 1) / N_BINS
        out[i] = _average_samples(lam, val, l0, l1)
    return out


class SpectralTables:
    """Static conversion tables for the sampled mode (built once)."""

    def __init__(self):
        up = _load_upstream_tables()
        if up is not None:
            lam32 = up["RGB2SpectLambda"]
            self.basis_refl = np.stack([
                spd_to_bins(lam32, up["RGBRefl2Spect" + n]) for n in
                ("White", "Cyan", "Magenta", "Yellow", "Red", "Green",
                 "Blue")])  # (7, 60)
            self.basis_illum = np.stack([
                spd_to_bins(lam32, up["RGBIllum2Spect" + n]) for n in
                ("White", "Cyan", "Magenta", "Yellow", "Red", "Green",
                 "Blue")])
            self.cie_bins = np.stack([
                spd_to_bins(up["CIE_lambda"], up["CIE_" + a])
                for a in "XYZ"], axis=1)  # (60, 3)
            self.source = "upstream"
        else:
            log.warning("sampled-spectrum mode: upstream basis tables "
                        "unavailable; synthesizing an analytic basis "
                        "(RGB promotion will deviate from the reference)")
            grid = bin_centers()
            cx, cy, cz = cie_x(grid), cie_y(grid), cie_z(grid)
            self.cie_bins = np.stack([cx, cy, cz], axis=1)
            # crude smooth basis: white flat; primaries/secondaries from
            # normalized CIE lobes
            def nz(a):
                return a / max(a.max(), 1e-9)
            r, g, b = nz(cx * (grid > 560)), nz(cy), nz(cz)
            white = np.ones(N_BINS)
            self.basis_refl = np.stack([white, 1 - r, 1 - g, 1 - b,
                                        r, g, b])
            self.basis_illum = self.basis_refl.copy()
            self.source = "analytic-fallback"
        scale = (LAMBDA_END - LAMBDA_START) / (CIE_Y_INTEGRAL * N_BINS)
        #: (60, 3) matrix: xyz = bins @ to_xyz (SampledSpectrum::ToXYZ)
        self.to_xyz = (self.cie_bins * scale).astype(np.float32)
        self.to_rgb = (self.to_xyz @ XYZ_TO_RGB.T).astype(np.float32)
        self.basis_refl = self.basis_refl.astype(np.float32)
        self.basis_illum = self.basis_illum.astype(np.float32)
        #: (60,) bin luminance weights: y = bins @ y_weight
        self.y_weight = self.to_xyz[:, 1]


_TABLES = None


def tables() -> SpectralTables:
    global _TABLES
    if _TABLES is None:
        _TABLES = SpectralTables()
    return _TABLES


def bin_centers() -> np.ndarray:
    e = np.linspace(LAMBDA_START, LAMBDA_END, N_BINS + 1)
    return 0.5 * (e[:-1] + e[1:])


def rgb_to_coeff7(rgb):
    """The six min-ordering cases of SampledSpectrum::FromRGB as a
    (..., 7) coefficient stack [white, cyan, magenta, yellow, red,
    green, blue].  Works on numpy or jnp arrays (shape (..., 3))."""
    xp = np if isinstance(rgb, np.ndarray) else __import__("jax.numpy",
                                                           fromlist=["x"])
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    z = xp.zeros_like(r)
    c_w, c_c, c_m, c_y = z, z, z, z
    c_r, c_g, c_b = z, z, z
    m_r = (r <= g) & (r <= b)                    # r is min
    m_g = ~m_r & (g <= r) & (g <= b)             # g is min
    m_b = ~m_r & ~m_g                            # b is min
    # r min
    gb = g <= b
    c_w = xp.where(m_r, r, c_w)
    c_c = xp.where(m_r, xp.where(gb, g - r, b - r), c_c)
    c_b = xp.where(m_r & gb, b - g, c_b)
    c_g = xp.where(m_r & ~gb, g - b, c_g)
    # g min
    rb = r <= b
    c_w = xp.where(m_g, g, c_w)
    c_m = xp.where(m_g, xp.where(rb, r - g, b - g), c_m)
    c_b = xp.where(m_g & rb, b - r, c_b)
    c_r = xp.where(m_g & ~rb, r - b, c_r)
    # b min
    rg = r <= g
    c_w = xp.where(m_b, b, c_w)
    c_y = xp.where(m_b, xp.where(rg, r - b, g - b), c_y)
    c_g = xp.where(m_b & rg, g - r, c_g)
    c_r = xp.where(m_b & ~rg, r - g, c_r)
    return xp.stack([c_w, c_c, c_m, c_y, c_r, c_g, c_b], axis=-1)


def lift_refl_np(rgb: np.ndarray) -> np.ndarray:
    """RGB reflectance -> (..., 60) bins (host/build-time path)."""
    t = tables()
    c7 = rgb_to_coeff7(np.asarray(rgb, np.float32))
    return np.maximum(c7 @ t.basis_refl * np.float32(0.94), 0.0)


def lift_illum_np(rgb: np.ndarray) -> np.ndarray:
    """RGB illuminant -> (..., 60) bins (host/build-time path)."""
    t = tables()
    c7 = rgb_to_coeff7(np.asarray(rgb, np.float32))
    return np.maximum(c7 @ t.basis_illum * np.float32(0.86445), 0.0)


def lift_refl(rgb):
    """Device lift: (..., 3) -> (..., 60) via one (7, 60) matmul."""
    import jax.numpy as jnp

    t = tables()
    c7 = rgb_to_coeff7(rgb)
    return jnp.maximum(c7 @ jnp.asarray(t.basis_refl) * 0.94, 0.0)


def lift_illum(rgb):
    import jax.numpy as jnp

    t = tables()
    c7 = rgb_to_coeff7(rgb)
    return jnp.maximum(c7 @ jnp.asarray(t.basis_illum) * 0.86445, 0.0)


def lift_refl_raw(rgb):
    """Device lift WITHOUT the 0.94 reflectance scale: for already-
    evaluated BSDF values f (hair/fourier/BSSRDF models that evaluate
    3-channel tables) where the scale would lose energy relative to the
    RGB-mode result."""
    import jax.numpy as jnp

    t = tables()
    c7 = rgb_to_coeff7(rgb)
    return jnp.maximum(c7 @ jnp.asarray(t.basis_refl), 0.0)


def to_rgb_matrix():
    """(60, 3) radiance -> RGB matrix (ToXYZ + XYZToRGB fused) as a
    device array."""
    import jax.numpy as jnp

    return jnp.asarray(tables().to_rgb)


def bins_to_xyz(bins):
    """(..., 60) -> (..., 3) XYZ (device or host)."""
    t = tables()
    if isinstance(bins, np.ndarray):
        return bins @ t.to_xyz
    import jax.numpy as jnp

    return bins @ jnp.asarray(t.to_xyz)


def bins_to_rgb_np(bins: np.ndarray) -> np.ndarray:
    t = tables()
    return np.asarray(bins, np.float32) @ t.to_xyz @ XYZ_TO_RGB.T.astype(
        np.float32)


def luminance_bins(bins):
    """Spectrum.y() analog: (..., 60) -> (...,)."""
    t = tables()
    if isinstance(bins, np.ndarray):
        return bins @ t.y_weight
    import jax.numpy as jnp

    return bins @ jnp.asarray(t.y_weight)


def blackbody_bins(temperature: float, scale: float = 1.0) -> np.ndarray:
    """Normalized Planck SPD in bins (BlackbodyNormalized,
    spectrum.cpp:230-240)."""
    from tpurt.spectrum import _planck

    grid = np.arange(360.0, 831.0)
    v = _planck(grid, temperature)
    lam_max = 2.8977721e-3 / temperature * 1e9
    v = v / max(_planck(np.array([lam_max]), temperature)[0], 1e-30)
    return spd_to_bins(grid, v * scale)
