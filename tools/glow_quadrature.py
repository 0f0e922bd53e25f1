"""Closed-form (f64 quadrature) ground truth for the bdpt fog-glow gate.

Scene (tests/test_bdpt.py GLOW_SCENE): pinhole camera at the origin looking
down +z with fov 60 over a square film, a point light I = 20 at (0, 0, 4),
and a global homogeneous medium sigma_s = 0.3, sigma_a = 0.01 (sigma_t =
0.31), Henyey-Greenstein g = 0.4.  No surfaces.

Depth-1 (single-scatter) radiance along a camera ray with direction d is

    L(d) = Int_0^inf  e^{-sigma_t t} sigma_s p_HG(cos theta(t))
                      e^{-sigma_t r(t)} I / r(t)^2  dt,

with r(t) the distance from the scatter point to the light and theta the
angle between the propagation direction and the direction to the light.
The 1/r^2 singularity is removed with the equiangular substitution
t - t0 = D tan(phi) (t0 = closest-approach parameter, D = perpendicular
distance to the light): dt / r^2 = dphi / D.  The film average is taken in
polar screen coordinates, whose rho drho measure absorbs the remaining
integrable 1/rho singularity of the central ray that passes through the
light (a cartesian pixel grid converges O(h) and reads ~0.4% low at
256x256 — the polar mean is stable to 5 digits across resolutions).

Usage:  python tools/glow_quadrature.py
Output: 0.255749 (256x256 film nodes, 1025 phi nodes)
        0.255754 (512x512, 4097)  <- GLOW_DEPTH1_TRUTH

This is the absolute oracle for test_bdpt_fog_glow_depth1_truth; the same
number also arbitrates the volpath-vs-bdpt discrepancy documented in
test_bdpt_fog_glow_matches_volpath (volpath's delta-light NEE from medium
vertices is an infinite-variance estimator; bdpt's MIS mixture is not).
"""

import numpy as np

SIGMA_T, SIGMA_S, G, INTENSITY = 0.31, 0.30, 0.4, 20.0
LIGHT_Z = 4.0


def radiance_depth1(d: np.ndarray, n_phi: int) -> np.ndarray:
    """Single-scatter radiance for (N,3) unit directions, equiangular
    Simpson with n_phi nodes (n_phi odd)."""
    t0 = d[:, 2] * LIGHT_Z
    dp = np.sqrt(np.maximum(LIGHT_Z * LIGHT_Z - t0 ** 2, 1e-18))
    lo = -np.arctan2(t0, dp)
    hi = np.pi / 2 - 1e-8
    u = np.linspace(0.0, 1.0, n_phi)[None, :]
    phi = lo[:, None] + (hi - lo[:, None]) * u
    t = t0[:, None] + dp[:, None] * np.tan(phi)
    r = dp[:, None] / np.cos(phi)
    cosp = (t0[:, None] - t) / r  # cos(propagation, to-light)
    den = 1 + G * G - 2 * G * cosp
    hg = (1 - G * G) / (4 * np.pi * den * np.sqrt(den))
    f = (np.exp(-SIGMA_T * t) * SIGMA_S * hg
         * np.exp(-SIGMA_T * r) * INTENSITY / dp[:, None])
    w = np.ones(n_phi)
    w[1:-1:2] = 4
    w[2:-1:2] = 2
    h = (hi - lo) / (n_phi - 1)
    return h / 3 * (f @ w)


def film_mean(n_polar: int, n_rho: int, n_phi: int) -> float:
    """Average depth-1 radiance over the square film in polar screen
    coordinates (screen window [-1,1]^2, fov 60 -> tan 30 deg scale)."""
    tanf = np.tan(np.radians(30.0))
    phis = (np.arange(n_polar) + 0.5) / n_polar * 2 * np.pi
    total = 0.0
    for ph in phis:
        c, s = np.cos(ph), np.sin(ph)
        rho_max = min(1 / abs(c) if abs(c) > 1e-12 else 9e9,
                      1 / abs(s) if abs(s) > 1e-12 else 9e9)
        rho = (np.arange(n_rho) + 0.5) / n_rho * rho_max
        d = np.stack([rho * c * tanf, rho * s * tanf,
                      np.ones_like(rho)], -1)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        total += (np.sum(radiance_depth1(d, n_phi) * rho)
                  * (rho_max / n_rho) * (2 * np.pi / n_polar))
    return total / 4.0  # film area


if __name__ == "__main__":
    print("256x256x1025:", film_mean(256, 256, 1025))
    print("512x512x4097:", film_mean(512, 512, 4097))
