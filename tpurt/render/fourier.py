"""Fourier-basis tabulated BSDF (layered-material .bsdf files).

Reference analog: materials/fourier.cpp (FourierBSDFTable::Read :106,
SCATFUN v1 format), core/reflection.cpp FourierBSDF::{f :312, Sample_f
:533, Pdf :613} and core/interpolation.cpp {Fourier :348, SampleFourier
:363}.

TPU design: the file's ragged per-(muO, muI)-cell Fourier series (CSR
coefficient storage, variable order m) is a poor fit for fixed-shape
gathers, but the azimuthal series is LINEAR in its coefficients — so at
load time each cell's series is baked onto a dense phi in [0, pi] grid
(values + cumulative integral).  Catmull-Rom interpolation over
(muI, muO) then commutes with the series evaluation: interpolating baked
cell values with the same 4x4 spline weights reproduces the reference's
interpolate-coefficients-then-evaluate result exactly, up to the phi
discretization (error O(dphi^2), ~1e-6 at 512 nodes for smooth tables).
Sampling inverts the interpolated cumulative table with a bisection whose
reported pdf is the density actually sampled, so importance weights stay
consistent.  The zenith (muI) dimension uses the reference's exact
SampleCatmullRom2D on the file's own a0/cdf tables.
"""

from __future__ import annotations

import dataclasses
import logging
import struct
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from tpurt.sampling.interpolation import (
    catmull_rom_weights,
    sample_catmull_rom_2d,
)

log = logging.getLogger("tpurt.render")

N_PHI = 512  # baked azimuth nodes over [0, pi]


@dataclasses.dataclass
class FourierTableHost:
    """Parsed SCATFUN v1 table (FourierBSDFTable, reflection.h:130)."""

    eta: float
    m_max: int
    n_channels: int
    mu: np.ndarray  # (nMu,)
    cdf: np.ndarray  # (nMu, nMu) [muO, muI]
    a0: np.ndarray  # (nMu, nMu)
    m: np.ndarray  # (nMu, nMu) int
    a_offset: np.ndarray  # (nMu, nMu) int
    a: np.ndarray  # (nCoeffs,) flat coefficients


def read_bsdf_file(path: str) -> FourierTableHost:
    """FourierBSDFTable::Read (fourier.cpp:106-204)."""
    with open(path, "rb") as f:
        data = f.read()
    if data[:8] != b"SCATFUN\x01":
        raise ValueError(f"{path}: not a SCATFUN v1 file")
    (flags, n_mu, n_coeffs, m_max, n_channels, n_bases,
     _u0, _u1, _u2) = struct.unpack("<9i", data[8:44])
    (eta,) = struct.unpack("<f", data[44:48])
    # 4 more unused ints pad the header to 64 bytes
    if flags != 1 or n_channels not in (1, 3) or n_bases != 1:
        raise ValueError(f"{path}: unsupported SCATFUN variant "
                         f"(flags={flags} channels={n_channels} "
                         f"bases={n_bases})")
    off = 64
    mu = np.frombuffer(data, np.float32, n_mu, off)
    off += 4 * n_mu
    cdf = np.frombuffer(data, np.float32, n_mu * n_mu, off).reshape(n_mu, n_mu)
    off += 4 * n_mu * n_mu
    ol = np.frombuffer(data, np.int32, n_mu * n_mu * 2, off).reshape(-1, 2)
    off += 8 * n_mu * n_mu
    a = np.frombuffer(data, np.float32, n_coeffs, off)
    a_offset = ol[:, 0].reshape(n_mu, n_mu)
    m = ol[:, 1].reshape(n_mu, n_mu)
    a0 = np.where(m > 0, a[np.clip(a_offset, 0, len(a) - 1)], 0.0)
    return FourierTableHost(eta=float(eta), m_max=int(m_max),
                            n_channels=int(n_channels),
                            mu=mu.astype(np.float64), cdf=cdf.copy(),
                            a0=a0.astype(np.float32), m=m, a_offset=a_offset,
                            a=a)


def write_bsdf_file(path: str, tbl: FourierTableHost) -> None:
    """Inverse of read_bsdf_file (test/tooling helper; the reference has
    no writer)."""
    n_mu = len(tbl.mu)
    with open(path, "wb") as f:
        f.write(b"SCATFUN\x01")
        f.write(struct.pack("<9i", 1, n_mu, len(tbl.a), tbl.m_max,
                            tbl.n_channels, 1, 0, 0, 0))
        f.write(struct.pack("<f", tbl.eta))
        f.write(struct.pack("<4i", 0, 0, 0, 0))
        f.write(np.asarray(tbl.mu, np.float32).tobytes())
        f.write(np.asarray(tbl.cdf, np.float32).tobytes())
        ol = np.stack([tbl.a_offset.ravel(), tbl.m.ravel()], axis=-1)
        f.write(np.asarray(ol, np.int32).tobytes())
        f.write(np.asarray(tbl.a, np.float32).tobytes())


class FourierTableDev(NamedTuple):
    """Baked device tables (one .bsdf file)."""

    mu: jnp.ndarray  # (nMu,)
    a0: jnp.ndarray  # (nMu, nMu) [muO, muI]
    cdf: jnp.ndarray  # (nMu, nMu)
    values: jnp.ndarray  # (nMu, nMu, N_PHI, 3) series on the phi grid
    vcdf: jnp.ndarray  # (nMu, nMu, N_PHI) cumulative integral of channel 0


def bake_fourier_table(host: FourierTableHost, n_phi: int = N_PHI
                       ) -> FourierTableDev:
    """Evaluate every cell's Fourier series on the phi grid and integrate
    the luminance channel (the linear-in-coefficients baking described in
    the module docstring)."""
    n_mu = len(host.mu)
    phi = np.linspace(0.0, np.pi, n_phi)
    values = np.zeros((n_mu, n_mu, n_phi, 3), np.float32)
    for o in range(n_mu):
        for i in range(n_mu):
            mm = int(host.m[o, i])
            if mm <= 0:
                continue
            base = int(host.a_offset[o, i])
            ks = np.arange(mm)
            cosk = np.cos(np.outer(phi, ks))  # (n_phi, m)
            for c in range(host.n_channels):
                coeffs = host.a[base + c * mm: base + (c + 1) * mm]
                values[o, i, :, c] = cosk @ coeffs
    if host.n_channels == 1:
        values[..., 1] = values[..., 0]
        values[..., 2] = values[..., 0]
    y = np.maximum(values[..., 0], 0.0)
    dphi = phi[1] - phi[0]
    vcdf = np.concatenate([
        np.zeros((n_mu, n_mu, 1), np.float32),
        np.cumsum(0.5 * (y[..., 1:] + y[..., :-1]) * dphi, axis=-1)
    ], axis=-1).astype(np.float32)
    return FourierTableDev(
        mu=jnp.asarray(host.mu, jnp.float32),
        a0=jnp.asarray(host.a0, jnp.float32),
        cdf=jnp.asarray(host.cdf, jnp.float32),
        values=jnp.asarray(values),
        vcdf=jnp.asarray(vcdf),
    )


def _mu_weights(tbl: FourierTableDev, x):
    ok, off, w = catmull_rom_weights(tbl.mu, x)
    rows = jnp.clip(off[:, None] + jnp.arange(4)[None, :], 0,
                    tbl.mu.shape[0] - 1)
    return ok, rows, w


def _interp_cells(tbl: FourierTableDev, rows_i, w_i, rows_o, w_o, kidx, ch):
    """sum_{o,i} w_o w_i values[o_cell, i_cell, kidx, ch]; kidx (N,)."""
    v = tbl.values[rows_o[:, :, None], rows_i[:, None, :],
                   kidx[:, None, None], ch]  # (N,4,4)
    return jnp.einsum("no,noi,ni->n", w_o, v, w_i)


def _interp_vcdf(tbl: FourierTableDev, rows_i, w_i, rows_o, w_o, kidx):
    v = tbl.vcdf[rows_o[:, :, None], rows_i[:, None, :], kidx[:, None, None]]
    return jnp.einsum("no,noi,ni->n", w_o, v, w_i)


def _phi_series(tbl: FourierTableDev, rows_i, w_i, rows_o, w_o, phi, ch):
    """Interpolated series value at arbitrary phi in [0, pi] (linear
    between baked nodes)."""
    fk = phi / np.pi * (N_PHI - 1)
    k0 = jnp.clip(fk.astype(jnp.int32), 0, N_PHI - 2)
    t = fk - k0.astype(jnp.float32)
    v0 = _interp_cells(tbl, rows_i, w_i, rows_o, w_o, k0, ch)
    v1 = _interp_cells(tbl, rows_i, w_i, rows_o, w_o, k0 + 1, ch)
    return v0 * (1.0 - t) + v1 * t


def _cos_dphi(wi_neg, wo):
    """CosDPhi(-wi, wo) (reflection.h): cosine of the azimuth difference."""
    num = wi_neg[:, 0] * wo[:, 0] + wi_neg[:, 1] * wo[:, 1]
    den = jnp.sqrt((wi_neg[:, 0] ** 2 + wi_neg[:, 1] ** 2)
                   * (wo[:, 0] ** 2 + wo[:, 1] ** 2))
    return jnp.clip(num / jnp.maximum(den, 1e-12), -1.0, 1.0)


def _angles(wo, wi):
    mu_i = -wi[:, 2]
    mu_o = wo[:, 2]
    phi = jnp.arccos(_cos_dphi(-wi, wo))
    return mu_i, mu_o, phi


def _scale(tbl_eta, mu_i, mu_o):
    s = jnp.where(jnp.abs(mu_i) > 1e-9, 1.0 / jnp.maximum(jnp.abs(mu_i),
                                                          1e-9), 0.0)
    # adjoint eta^2 factor for radiance transport (reflection.cpp:352)
    eta = jnp.where(mu_i > 0, 1.0 / tbl_eta, tbl_eta)
    return jnp.where(mu_i * mu_o > 0, s * eta * eta, s)


def fourier_f(tbl: FourierTableDev, eta: float, wo, wi):
    """FourierBSDF::f (reflection.cpp:312): (N,3) rgb."""
    mu_i, mu_o, phi = _angles(wo, wi)
    ok_i, rows_i, w_i = _mu_weights(tbl, mu_i)
    ok_o, rows_o, w_o = _mu_weights(tbl, mu_o)
    Y = jnp.maximum(_phi_series(tbl, rows_i, w_i, rows_o, w_o, phi, 0), 0.0)
    R = _phi_series(tbl, rows_i, w_i, rows_o, w_o, phi, 1)
    B = _phi_series(tbl, rows_i, w_i, rows_o, w_o, phi, 2)
    G = 1.39829 * Y - 0.100913 * B - 0.297375 * R
    s = _scale(eta, mu_i, mu_o)
    rgb = jnp.stack([R * s, G * s, B * s], axis=-1)
    return jnp.where((ok_i & ok_o)[:, None], jnp.maximum(rgb, 0.0), 0.0)


def fourier_pdf(tbl: FourierTableDev, wo, wi):
    """FourierBSDF::Pdf (reflection.cpp:613): Y / (sum_o w_o rho_o)."""
    mu_i, mu_o, phi = _angles(wo, wi)
    ok_i, rows_i, w_i = _mu_weights(tbl, mu_i)
    ok_o, rows_o, w_o = _mu_weights(tbl, mu_o)
    Y = _phi_series(tbl, rows_i, w_i, rows_o, w_o, phi, 0)
    n_mu = tbl.mu.shape[0]
    rho = jnp.sum(tbl.cdf[rows_o, n_mu - 1] * w_o, axis=-1) * 2.0 * np.pi
    return jnp.where(ok_i & ok_o & (rho > 0) & (Y > 0),
                     Y / jnp.maximum(rho, 1e-20), 0.0)


def fourier_sample(tbl: FourierTableDev, eta: float, wo, u0, u1):
    """FourierBSDF::Sample_f (reflection.cpp:533): returns (wi, f3, pdf).
    The zenith angle uses the reference's exact SampleCatmullRom2D on the
    file's (a0, cdf) tables; the azimuth inverts the baked cumulative
    series."""
    mu_o = wo[:, 2]
    mu_i, _f0, pdf_mu = sample_catmull_rom_2d(tbl.mu, tbl.mu, tbl.a0,
                                              tbl.cdf, mu_o, u1)
    ok_i, rows_i, w_i = _mu_weights(tbl, mu_i)
    ok_o, rows_o, w_o = _mu_weights(tbl, mu_o)

    # sample phi in [0, pi] from the interpolated cumulative table, with
    # the reference's side flip (SampleFourier, interpolation.cpp:363)
    flip = u0 >= 0.5
    u = jnp.where(flip, 1.0 - 2.0 * (u0 - 0.5), 2.0 * u0)
    total = _interp_vcdf(tbl, rows_i, w_i, rows_o, w_o,
                         jnp.full_like(rows_i[:, 0], N_PHI - 1))
    target = u * total
    lo = jnp.zeros_like(rows_i[:, 0])
    hi = jnp.full_like(rows_i[:, 0], N_PHI - 1)
    for _ in range(10):  # log2(512) + 1
        mid = (lo + hi + 1) // 2
        below = _interp_vcdf(tbl, rows_i, w_i, rows_o, w_o, mid) <= target
        lo = jnp.where(below, mid, lo)
        hi = jnp.where(below, hi, mid - 1)
    k = jnp.clip(lo, 0, N_PHI - 2)
    c0 = _interp_vcdf(tbl, rows_i, w_i, rows_o, w_o, k)
    c1 = _interp_vcdf(tbl, rows_i, w_i, rows_o, w_o, k + 1)
    t = jnp.clip((target - c0) / jnp.maximum(c1 - c0, 1e-20), 0.0, 1.0)
    dphi_grid = np.pi / (N_PHI - 1)
    phi_half = (k.astype(jnp.float32) + t) * dphi_grid
    y_phi = jnp.maximum(
        _phi_series(tbl, rows_i, w_i, rows_o, w_o, phi_half, 0), 0.0)
    # density over the full circle: y / (2 * total)
    pdf_phi = jnp.where(total > 0, y_phi / jnp.maximum(2.0 * total, 1e-20),
                        0.0)
    phi = jnp.where(flip, 2.0 * np.pi - phi_half, phi_half)

    # construct wi (reflection.cpp:583-599)
    sin2_i = jnp.maximum(1.0 - mu_i * mu_i, 0.0)
    sin2_o = jnp.maximum(1.0 - mu_o * mu_o, 0.0)
    norm = jnp.sqrt(sin2_i / jnp.maximum(sin2_o, 1e-20))
    norm = jnp.where(jnp.isfinite(norm), norm, 0.0)
    sp = jnp.sin(phi)
    cp = jnp.cos(phi)
    wi = -jnp.stack([norm * (cp * wo[:, 0] - sp * wo[:, 1]),
                     norm * (sp * wo[:, 0] + cp * wo[:, 1]),
                     mu_i], axis=-1)
    wi = wi / jnp.maximum(jnp.linalg.norm(wi, axis=-1, keepdims=True), 1e-12)

    Y = y_phi
    R = _phi_series(tbl, rows_i, w_i, rows_o, w_o, phi_half, 1)
    B = _phi_series(tbl, rows_i, w_i, rows_o, w_o, phi_half, 2)
    G = 1.39829 * Y - 0.100913 * B - 0.297375 * R
    s = _scale(eta, mu_i, mu_o)
    f3 = jnp.maximum(jnp.stack([R * s, G * s, B * s], axis=-1), 0.0)
    pdf = jnp.where(ok_i & ok_o, jnp.maximum(pdf_mu, 0.0) * pdf_phi, 0.0)
    return wi, jnp.where((ok_i & ok_o)[:, None], f3, 0.0), pdf


def make_lambertian_table(rho: float = 0.5, n_mu: int = 24
                          ) -> FourierTableHost:
    """Synthetic single-order table representing a Lambertian BRDF with
    reflectance rho (for tests and the bsdf-file tool): the stored series
    value is f * |muI| = rho/pi * |muI| for opposite-hemisphere pairs."""
    from tpurt.sampling.interpolation import integrate_catmull_rom_np

    mu = np.cos(np.linspace(np.pi, 0.0, n_mu))
    mu[0], mu[-1] = -1.0, 1.0
    a0 = np.zeros((n_mu, n_mu), np.float32)
    coeffs = []
    offsets = np.zeros((n_mu, n_mu), np.int32)
    orders = np.zeros((n_mu, n_mu), np.int32)
    for o in range(n_mu):
        for i in range(n_mu):
            if mu[o] * mu[i] < 0:  # reflection pair
                val = rho / np.pi * abs(mu[i])
                offsets[o, i] = len(coeffs)
                orders[o, i] = 1
                coeffs.append(val)
                a0[o, i] = val
    # cdf rows: integral of a0 over muI for each muO row
    _, cdf = integrate_catmull_rom_np(mu, a0.astype(np.float64))
    return FourierTableHost(eta=1.0, m_max=1, n_channels=1,
                            mu=mu, cdf=cdf.astype(np.float32), a0=a0,
                            m=orders, a_offset=offsets,
                            a=np.asarray(coeffs, np.float32))
