"""Realistic camera lens system.

Reference analog: cameras/realistic.cpp — a lens description is a table of
spherical interfaces [curvature radius, thickness, ior, aperture diameter]
in mm (ctor :50-99 converts to meters and halves the aperture).  Rays from
the film are traced element-by-element with refraction at each interface
(TraceLensesFromFilm :100-152); the rear element's thickness is adjusted
via the thick-lens approximation to hit the focus distance (FocusThickLens
:458-474); and the exit pupil is pre-bounded over 64 radial film zones by
Monte Carlo (BoundExitPupil :534-571) so GenerateRay (:679-714) samples
only the useful rear-element region.

TPU split: all precomputation (file parse, focusing, exit-pupil bounds)
runs host-side in vectorized numpy at camera build; per-ray tracing on
device is the same element loop unrolled statically over the (small, fixed)
element list inside the jitted ray-gen, with a vignette mask instead of
early returns.
"""

from __future__ import annotations

import logging
from typing import NamedTuple, Tuple

import numpy as np

log = logging.getLogger("tpurt.render")


class LensSystem(NamedTuple):
    elements: np.ndarray  # (M,4): curvature radius, thickness, eta, ap radius (meters)
    exit_pupil: np.ndarray  # (64,4): x0,y0,x1,y1 bounds on the rear element
    rear_z: float  # LensRearZ(): z of the rear element (camera space, +z)
    diagonal: float  # film diagonal (m)


def load_lens_file(path: str, aperture_diameter_mm: float) -> np.ndarray:
    """Parse the pbrt lens .dat format: whitespace rows of 4 floats, '#'
    comments; mm -> m, aperture diameter -> radius (realistic.cpp:58-71)."""
    vals = []
    with open(path) as f:
        for line in f:
            line = line.split("#", 1)[0].strip()
            if line:
                vals.extend(float(t) for t in line.split())
    if len(vals) % 4:
        raise ValueError(f"lens file {path}: element count not divisible by 4")
    el = np.asarray(vals, np.float64).reshape(-1, 4)
    for i in range(len(el)):
        if el[i, 0] == 0:  # aperture stop row
            if aperture_diameter_mm > el[i, 3]:
                log.warning("aperture diameter %f > max %f; clamping",
                            aperture_diameter_mm, el[i, 3])
            else:
                el[i, 3] = aperture_diameter_mm
    out = el.copy()
    out[:, 0] *= 0.001
    out[:, 1] *= 0.001
    out[:, 3] *= 0.001 / 2.0
    return out


def _refract_np(wi, n, eta_rel):
    """Refract unit wi about unit n (wi on n's side); eta_rel = etaI/etaT.
    Returns (ok, wt) — geometry.h Refract."""
    cos_i = np.sum(n * wi, axis=-1)
    sin2_i = np.maximum(0.0, 1.0 - cos_i * cos_i)
    sin2_t = eta_rel * eta_rel * sin2_i
    ok = sin2_t < 1.0
    cos_t = np.sqrt(np.maximum(0.0, 1.0 - sin2_t))
    wt = (-wi * eta_rel[..., None]
          + (eta_rel * cos_i - cos_t)[..., None] * n)
    return ok, wt


def trace_from_film_np(el: np.ndarray, o, d) -> Tuple[np.ndarray, np.ndarray,
                                                      np.ndarray]:
    """Vectorized TraceLensesFromFilm (realistic.cpp:100-152) over (N,3)
    rays already in LENS space (z flipped).  Returns (ok, o_out, d_out)."""
    o = np.array(o, np.float64, copy=True)
    d = np.array(d, np.float64, copy=True)
    ok = np.ones(o.shape[0], bool)
    element_z = 0.0
    for i in range(len(el) - 1, -1, -1):
        radius, thickness, eta, ap = el[i]
        element_z -= thickness
        is_stop = radius == 0
        if is_stop:
            live = ok & (d[:, 2] < 0)
            t = np.where(live, (element_z - o[:, 2])
                         / np.where(d[:, 2] == 0, -1e-9, d[:, 2]), 0.0)
            ok = live & (t >= 0)
            n = None
        else:
            z_center = element_z + radius
            oc = o - np.asarray([0.0, 0.0, z_center])
            a = np.sum(d * d, axis=-1)
            b = 2.0 * np.sum(d * oc, axis=-1)
            c = np.sum(oc * oc, axis=-1) - radius * radius
            disc = b * b - 4 * a * c
            has = disc >= 0
            sq = np.sqrt(np.maximum(disc, 0.0))
            q = -0.5 * (b + np.where(b < 0, -sq, sq))
            t0 = q / np.where(a == 0, 1e-30, a)
            t1 = c / np.where(q == 0, 1e-30, q)
            closer = (d[:, 2] > 0) ^ (radius < 0)
            t = np.where(closer, np.minimum(t0, t1), np.maximum(t0, t1))
            ok = ok & has & (t >= 0)
            p = o + t[:, None] * d
            n = p - np.asarray([0.0, 0.0, z_center])
            n /= np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-30)
            # face toward -d
            flip = np.sum(n * -d, axis=-1) < 0
            n = np.where(flip[:, None], -n, n)
        p_hit = o + t[:, None] * d
        r2 = p_hit[:, 0] ** 2 + p_hit[:, 1] ** 2
        ok = ok & (r2 <= ap * ap)
        o = np.where(ok[:, None], p_hit, o)
        if not is_stop:
            eta_i = eta
            eta_t = el[i - 1, 2] if (i > 0 and el[i - 1, 2] != 0) else 1.0
            dn = d / np.maximum(np.linalg.norm(d, axis=-1, keepdims=True),
                                1e-30)
            rok, wt = _refract_np(-dn, n, np.full(o.shape[0],
                                                  eta_i / eta_t))
            ok = ok & rok
            d = np.where(ok[:, None], wt, d)
    return ok, o, d


def _trace_from_scene_np(el: np.ndarray, o, d):
    """TraceLensesFromScene (realistic.cpp:175-224), lens space."""
    o = np.array(o, np.float64, copy=True)
    d = np.array(d, np.float64, copy=True)
    ok = np.ones(o.shape[0], bool)
    element_z = -float(np.sum(el[:, 1]))  # -LensFrontZ
    for i in range(len(el)):
        radius, thickness, eta, ap = el[i]
        is_stop = radius == 0
        if is_stop:
            t = (element_z - o[:, 2]) / np.where(d[:, 2] == 0, 1e-30,
                                                 d[:, 2])
            n = None
        else:
            z_center = element_z + radius
            oc = o - np.asarray([0.0, 0.0, z_center])
            a = np.sum(d * d, axis=-1)
            b = 2.0 * np.sum(d * oc, axis=-1)
            c = np.sum(oc * oc, axis=-1) - radius * radius
            disc = b * b - 4 * a * c
            has = disc >= 0
            sq = np.sqrt(np.maximum(disc, 0.0))
            q = -0.5 * (b + np.where(b < 0, -sq, sq))
            t0 = q / np.where(a == 0, 1e-30, a)
            t1 = c / np.where(q == 0, 1e-30, q)
            closer = (d[:, 2] > 0) ^ (radius < 0)
            t = np.where(closer, np.minimum(t0, t1), np.maximum(t0, t1))
            ok = ok & has & (t >= 0)
            p = o + t[:, None] * d
            n = p - np.asarray([0.0, 0.0, z_center])
            n /= np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-30)
            flip = np.sum(n * -d, axis=-1) < 0
            n = np.where(flip[:, None], -n, n)
        p_hit = o + t[:, None] * d
        r2 = p_hit[:, 0] ** 2 + p_hit[:, 1] ** 2
        ok = ok & (r2 <= ap * ap)
        o = np.where(ok[:, None], p_hit, o)
        if not is_stop:
            eta_i = el[i - 1, 2] if (i > 0 and el[i - 1, 2] != 0) else 1.0
            eta_t = eta if eta != 0 else 1.0
            dn = d / np.maximum(np.linalg.norm(d, axis=-1, keepdims=True),
                                1e-30)
            rok, wt = _refract_np(-dn, n, np.full(o.shape[0],
                                                  eta_i / eta_t))
            ok = ok & rok
            d = np.where(ok[:, None], wt, d)
        element_z += thickness
    return ok, o, d


def _cardinal_points(o_in_x, o_out, d_out):
    """ComputeCardinalPoints (realistic.cpp:427-434): (pz, fz)."""
    tf = -o_out[0] / d_out[0]
    fz = -(o_out[2] + tf * d_out[2])
    tp = (o_in_x - o_out[0]) / d_out[0]
    pz = -(o_out[2] + tp * d_out[2])
    return pz, fz


def focus_thick_lens(el: np.ndarray, focus_distance: float,
                     diagonal: float) -> float:
    """FocusThickLens (realistic.cpp:458-474): returns the rear element
    thickness that focuses at focus_distance."""
    x = 0.001 * diagonal
    front_z = float(np.sum(el[:, 1]))
    rear_z = float(el[-1, 1])

    def to_cam(o, d):  # lens space -> camera space (flip z)
        oc, dc = o.copy(), d.copy()
        oc[2] = -oc[2]
        dc[2] = -dc[2]
        return oc, dc

    # scene-side parallel ray -> film (cardinal points of film side)
    o = np.asarray([[x, 0.0, -(front_z + 1.0)]])  # lens space (z flipped)
    d = np.asarray([[0.0, 0.0, 1.0]])
    ok, oo, dd = _trace_from_scene_np(el, o, d)
    if not ok[0]:
        raise ValueError("cannot trace scene->film ray for focusing")
    pz0, fz0 = _cardinal_points(x, *to_cam(oo[0], dd[0]))
    # film-side parallel ray -> scene
    o = np.asarray([[x, 0.0, -(rear_z - 1.0)]])
    d = np.asarray([[0.0, 0.0, -1.0]])
    ok, oo, dd = trace_from_film_np(el, o, d)
    if not ok[0]:
        raise ValueError("cannot trace film->scene ray for focusing")
    pz1, fz1 = _cardinal_points(x, *to_cam(oo[0], dd[0]))

    f = fz0 - pz0
    z = -focus_distance
    c = (pz1 - z - pz0) * (pz1 - z - 4 * f - pz0)
    if c <= 0:
        raise ValueError("focus distance too short for this lens")
    delta = 0.5 * (pz1 - z + pz0 - np.sqrt(c))
    return float(el[-1, 1] + delta)


def bound_exit_pupil(el: np.ndarray, film_x0: float, film_x1: float,
                     n_samples: int = 1 << 18) -> np.ndarray:
    """BoundExitPupil (realistic.cpp:534-571), vectorized.  Returns
    [x0, y0, x1, y1] on the rear element plane."""
    rear_radius = float(el[-1, 3])
    rear_z = float(el[-1, 1])
    lim = 1.5 * rear_radius
    i = np.arange(n_samples)
    fx = film_x0 + (i + 0.5) / n_samples * (film_x1 - film_x0)
    # Hammersley points over the projected rear bounds
    u0 = (i + 0.5) / n_samples
    u1 = _radical_inverse2(i)
    px = -lim + 2 * lim * u0
    py = -lim + 2 * lim * u1
    o = np.stack([fx, np.zeros(n_samples), np.zeros(n_samples)], -1)
    target = np.stack([px, py, np.full(n_samples, -rear_z)], -1)
    # lens space: film at z=0, elements toward -z (camera z flipped)
    d = target - o
    ok, _, _ = trace_from_film_np(el, o, d)
    if not ok.any():
        return np.asarray([-lim, -lim, lim, lim])
    b = np.asarray([px[ok].min(), py[ok].min(), px[ok].max(), py[ok].max()])
    expand = 2.0 * np.sqrt((2 * lim) ** 2 * 2) / np.sqrt(n_samples)
    return b + np.asarray([-expand, -expand, expand, expand])


def _radical_inverse2(i: np.ndarray) -> np.ndarray:
    v = i.astype(np.uint32)
    v = ((v >> 16) | (v << 16)) & 0xFFFFFFFF
    v = (((v & 0x00FF00FF) << 8) | ((v & 0xFF00FF00) >> 8)) & 0xFFFFFFFF
    v = (((v & 0x0F0F0F0F) << 4) | ((v & 0xF0F0F0F0) >> 4)) & 0xFFFFFFFF
    v = (((v & 0x33333333) << 2) | ((v & 0xCCCCCCCC) >> 2)) & 0xFFFFFFFF
    v = (((v & 0x55555555) << 1) | ((v & 0xAAAAAAAA) >> 1)) & 0xFFFFFFFF
    return v.astype(np.float64) * (1.0 / (1 << 32))


def build_lens_system(path: str, aperture_diameter_mm: float,
                      focus_distance: float, diagonal_m: float,
                      n_zones: int = 64) -> LensSystem:
    el = load_lens_file(path, aperture_diameter_mm)
    el[-1, 1] = focus_thick_lens(el, focus_distance, diagonal_m)
    bounds = np.zeros((n_zones, 4))
    half_diag = diagonal_m / 2.0
    for i in range(n_zones):
        r0 = i / n_zones * half_diag
        r1 = (i + 1) / n_zones * half_diag
        bounds[i] = bound_exit_pupil(el, r0, r1)
    return LensSystem(elements=el.astype(np.float32),
                      exit_pupil=bounds.astype(np.float32),
                      rear_z=float(el[-1, 1]), diagonal=diagonal_m)
