"""Catmull-Rom spline interpolation / integration / sampling.

Reference analog: core/interpolation.{h,cpp} (CatmullRom :39,
CatmullRomWeights :61, SampleCatmullRom2D :172, IntegrateCatmullRom :260,
InvertCatmullRom :288).  Consumers: the Fourier BSDF (reflection.cpp:312)
and the tabulated BSSRDF (bssrdf.cpp).

Two implementations live here:
- numpy host versions (table precompute at scene build); loops allowed.
- jnp device versions, vectorized over lanes: interval search is
  jnp.searchsorted over the static node vector, and the reference's
  Newton-bisection solvers run a FIXED 24-iteration fori_loop (bisection
  alone halves the bracket 24x ~ 6e-8, tighter than the reference's 1e-6
  stop), which is the XLA-friendly form of its data-dependent while loop.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_NEWTON_ITERS = 24


# ---------------------------------------------------------------------------
# host (numpy) versions
# ---------------------------------------------------------------------------

def catmull_rom_weights_np(nodes: np.ndarray, x: float):
    """CatmullRomWeights (interpolation.cpp:61).  Returns (ok, offset,
    w[4])."""
    n = len(nodes)
    if not (x >= nodes[0] and x <= nodes[-1]):
        return False, 0, np.zeros(4)
    idx = np.searchsorted(nodes, x, side="right") - 1
    idx = min(max(idx, 0), n - 2)
    w = np.zeros(4)
    x0, x1 = nodes[idx], nodes[idx + 1]
    t = (x - x0) / (x1 - x0)
    t2, t3 = t * t, t * t * t
    w[1] = 2 * t3 - 3 * t2 + 1
    w[2] = -2 * t3 + 3 * t2
    if idx > 0:
        w0 = (t3 - 2 * t2 + t) * (x1 - x0) / (x1 - nodes[idx - 1])
        w[0] = -w0
        w[2] += w0
    else:
        w0 = t3 - 2 * t2 + t
        w[1] -= w0
        w[2] += w0
    if idx + 2 < n:
        w3 = (t3 - t2) * (x1 - x0) / (nodes[idx + 2] - x0)
        w[1] -= w3
        w[3] = w3
    else:
        w3 = t3 - t2
        w[1] -= w3
        w[2] += w3
    return True, idx - 1, w


def integrate_catmull_rom_np(x: np.ndarray, values: np.ndarray):
    """IntegrateCatmullRom (interpolation.cpp:260).  values may be (..., n);
    integrates the last axis.  Returns (sum, cdf) with cdf.shape ==
    values.shape."""
    x = np.asarray(x, np.float64)
    v = np.asarray(values, np.float64)
    n = x.shape[-1]
    cdf = np.zeros_like(v)
    total = np.zeros(v.shape[:-1])
    for i in range(n - 1):
        x0, x1 = x[i], x[i + 1]
        f0, f1 = v[..., i], v[..., i + 1]
        width = x1 - x0
        if i > 0:
            d0 = width * (f1 - v[..., i - 1]) / (x1 - x[i - 1])
        else:
            d0 = f1 - f0
        if i + 2 < n:
            d1 = width * (v[..., i + 2] - f0) / (x[i + 2] - x0)
        else:
            d1 = f1 - f0
        total = total + ((d0 - d1) * (1.0 / 12.0) + (f0 + f1) * 0.5) * width
        cdf[..., i + 1] = total
    return total, cdf


# ---------------------------------------------------------------------------
# device (jnp) versions
# ---------------------------------------------------------------------------

def _find_interval(nodes, x):
    """FindInterval: last i with nodes[i] <= x, clamped to [0, n-2]."""
    idx = jnp.searchsorted(nodes, x, side="right") - 1
    return jnp.clip(idx, 0, nodes.shape[0] - 2)


def catmull_rom_weights(nodes: jnp.ndarray, x: jnp.ndarray):
    """Vectorized CatmullRomWeights: nodes (S,) static, x (N,).
    Returns (ok (N,), offset (N,), w (N,4)) where w rows address
    nodes[offset .. offset+3] (clamp gathers; out-of-range rows have
    weight 0)."""
    n = nodes.shape[0]
    ok = (x >= nodes[0]) & (x <= nodes[-1])
    idx = _find_interval(nodes, x)
    x0 = nodes[idx]
    x1 = nodes[idx + 1]
    t = (x - x0) / jnp.maximum(x1 - x0, 1e-20)
    t2 = t * t
    t3 = t2 * t
    w1 = 2 * t3 - 3 * t2 + 1
    w2 = -2 * t3 + 3 * t2
    base = t3 - 2 * t2 + t
    has_prev = idx > 0
    xm1 = nodes[jnp.maximum(idx - 1, 0)]
    w0p = base * (x1 - x0) / jnp.maximum(x1 - xm1, 1e-20)
    w0 = jnp.where(has_prev, -w0p, 0.0)
    w1 = jnp.where(has_prev, w1, w1 - base)
    w2 = w2 + jnp.where(has_prev, w0p, base)
    last = t3 - t2
    has_next = idx + 2 < n
    xp2 = nodes[jnp.minimum(idx + 2, n - 1)]
    w3n = last * (x1 - x0) / jnp.maximum(xp2 - x0, 1e-20)
    w3 = jnp.where(has_next, w3n, 0.0)
    w1 = w1 - jnp.where(has_next, w3n, last)
    w2 = w2 + jnp.where(has_next, 0.0, last)
    w = jnp.stack([w0, w1, w2, w3], axis=-1)
    return ok, idx - 1, jnp.where(ok[:, None], w, 0.0)


def _segment_derivs(f0, f1, fm1, fp2, x0, x1, xm1, xp2, has_prev, has_next):
    width = x1 - x0
    d0 = jnp.where(has_prev,
                   width * (f1 - fm1) / jnp.maximum(x1 - xm1, 1e-20),
                   f1 - f0)
    d1 = jnp.where(has_next,
                   width * (fp2 - f0) / jnp.maximum(xp2 - x0, 1e-20),
                   f1 - f0)
    return d0, d1


def _invert_segment_integral(u, f0, f1, d0, d1):
    """The fixed-iteration Newton-bisection inverting the definite
    integral of one Hermite segment (interpolation.cpp:127-160); u is the
    target integral value normalized by the segment width."""
    t0 = jnp.where(jnp.abs(f0 - f1) > 1e-12,
                   (f0 - jnp.sqrt(jnp.maximum(
                       f0 * f0 + 2.0 * u * (f1 - f0), 0.0)))
                   / jnp.where(jnp.abs(f0 - f1) > 1e-12, f0 - f1, 1.0),
                   u / jnp.maximum(f0, 1e-20))

    def body(_, carry):
        t, a, b = carry
        t = jnp.where((t > a) & (t < b), t, 0.5 * (a + b))
        Fhat = t * (f0 + t * (0.5 * d0 + t * ((1.0 / 3.0) * (-2 * d0 - d1)
                                              + f1 - f0
                                              + t * (0.25 * (d0 + d1)
                                                     + 0.5 * (f0 - f1)))))
        fhat = f0 + t * (d0 + t * (-2 * d0 - d1 + 3 * (f1 - f0)
                                   + t * (d0 + d1 + 2 * (f0 - f1))))
        lo = Fhat - u < 0
        a = jnp.where(lo, t, a)
        b = jnp.where(lo, b, t)
        t = t - (Fhat - u) / jnp.where(jnp.abs(fhat) > 1e-20, fhat,
                                       jnp.where(fhat >= 0, 1e-20, -1e-20))
        return t, a, b

    t, a, b = jax.lax.fori_loop(0, _NEWTON_ITERS, body,
                                (t0, jnp.zeros_like(u), jnp.ones_like(u)))
    t = jnp.where((t > a) & (t < b), t, 0.5 * (a + b))
    fhat = f0 + t * (d0 + t * (-2 * d0 - d1 + 3 * (f1 - f0)
                               + t * (d0 + d1 + 2 * (f0 - f1))))
    return t, fhat


def sample_catmull_rom_2d(nodes1: jnp.ndarray, nodes2: jnp.ndarray,
                          values: jnp.ndarray, cdf: jnp.ndarray,
                          alpha: jnp.ndarray, u: jnp.ndarray):
    """SampleCatmullRom2D (interpolation.cpp:172), vectorized.

    nodes1 (S1,), nodes2 (S2,), values/cdf (S1, S2) static tables;
    alpha (N,) first-axis coordinate, u (N,) uniforms.
    Returns (x (N,), fval (N,), pdf (N,))."""
    s2 = nodes2.shape[0]
    ok, off1, w1 = catmull_rom_weights(nodes1, alpha)

    rows = jnp.clip(off1[:, None] + jnp.arange(4)[None, :], 0,
                    nodes1.shape[0] - 1)  # (N,4)

    def interp(tbl, idx):
        # sum_i w1[i] * tbl[rows[i], idx]; idx (N,) int
        g = tbl[rows, jnp.clip(idx, 0, s2 - 1)[:, None]]  # (N,4)
        return jnp.sum(g * w1, axis=-1)

    maximum = interp(cdf, jnp.full_like(off1, s2 - 1))
    us = u * maximum

    # binary search for the interval with interp(cdf, i) <= us
    lo = jnp.zeros_like(off1)
    hi = jnp.full_like(off1, s2 - 1)
    for _ in range(int(np.ceil(np.log2(max(s2, 2)))) + 1):
        mid = (lo + hi + 1) // 2
        below = interp(cdf, mid) <= us
        lo = jnp.where(below, mid, lo)
        hi = jnp.where(below, hi, mid - 1)
    idx = jnp.clip(lo, 0, s2 - 2)

    f0 = interp(values, idx)
    f1 = interp(values, idx + 1)
    x0 = nodes2[idx]
    x1 = nodes2[idx + 1]
    width = x1 - x0
    fm1 = interp(values, idx - 1)
    fp2 = interp(values, idx + 2)
    xm1 = nodes2[jnp.maximum(idx - 1, 0)]
    xp2 = nodes2[jnp.minimum(idx + 2, s2 - 1)]
    d0, d1 = _segment_derivs(f0, f1, fm1, fp2, x0, x1, xm1, xp2,
                             idx > 0, idx + 2 < s2)
    u_seg = (us - interp(cdf, idx)) / jnp.maximum(width, 1e-20)
    t, fhat = _invert_segment_integral(u_seg, f0, f1, d0, d1)
    x = x0 + width * t
    pdf = jnp.where(ok & (maximum > 0), fhat / jnp.maximum(maximum, 1e-20),
                    0.0)
    return jnp.where(ok, x, 0.0), jnp.where(ok, fhat, 0.0), pdf


def catmull_rom_eval(nodes: jnp.ndarray, values: jnp.ndarray,
                     x: jnp.ndarray):
    """CatmullRom 1D eval (interpolation.cpp:39), vectorized; values may
    be (S,) or (N, S) per-lane tables."""
    n = nodes.shape[0]
    ok = (x >= nodes[0]) & (x <= nodes[-1])
    idx = _find_interval(nodes, x)

    def val(i):
        i = jnp.clip(i, 0, n - 1)
        if values.ndim == 1:
            return values[i]
        return jnp.take_along_axis(values, i[:, None], axis=-1)[:, 0]

    x0 = nodes[idx]
    x1 = nodes[idx + 1]
    f0 = val(idx)
    f1 = val(idx + 1)
    xm1 = nodes[jnp.maximum(idx - 1, 0)]
    xp2 = nodes[jnp.minimum(idx + 2, n - 1)]
    d0, d1 = _segment_derivs(f0, f1, val(idx - 1), val(idx + 2),
                             x0, x1, xm1, xp2, idx > 0, idx + 2 < n)
    t = (x - x0) / jnp.maximum(x1 - x0, 1e-20)
    t2 = t * t
    t3 = t2 * t
    out = ((2 * t3 - 3 * t2 + 1) * f0 + (-2 * t3 + 3 * t2) * f1
           + (t3 - 2 * t2 + t) * d0 + (t3 - t2) * d1)
    return jnp.where(ok, out, 0.0)


def invert_catmull_rom(nodes: jnp.ndarray, values: jnp.ndarray,
                       u: jnp.ndarray):
    """InvertCatmullRom (interpolation.cpp:288): solve spline(x) == u for
    monotone per-lane value tables values (N, S)."""
    n = nodes.shape[0]
    v0 = values[:, 0]
    vl = values[:, -1]
    # interval search on the per-lane monotone values
    lo = jnp.zeros(values.shape[0], jnp.int32)
    hi = jnp.full(values.shape[0], n - 1, jnp.int32)
    for _ in range(int(np.ceil(np.log2(max(n, 2)))) + 1):
        mid = (lo + hi + 1) // 2
        below = jnp.take_along_axis(values, jnp.clip(mid, 0, n - 1)[:, None],
                                    axis=-1)[:, 0] <= u
        lo = jnp.where(below, mid, lo)
        hi = jnp.where(below, hi, mid - 1)
    idx = jnp.clip(lo, 0, n - 2)

    def val(i):
        return jnp.take_along_axis(values, jnp.clip(i, 0, n - 1)[:, None],
                                   axis=-1)[:, 0]

    x0 = nodes[idx]
    x1 = nodes[idx + 1]
    f0 = val(idx)
    f1 = val(idx + 1)
    xm1 = nodes[jnp.maximum(idx - 1, 0)]
    xp2 = nodes[jnp.minimum(idx + 2, n - 1)]
    d0, d1 = _segment_derivs(f0, f1, val(idx - 1), val(idx + 2),
                             x0, x1, xm1, xp2, idx > 0, idx + 2 < n)

    def body(_, carry):
        t, a, b = carry
        t = jnp.where((t > a) & (t < b), t, 0.5 * (a + b))
        t2 = t * t
        t3 = t2 * t
        Fhat = ((2 * t3 - 3 * t2 + 1) * f0 + (-2 * t3 + 3 * t2) * f1
                + (t3 - 2 * t2 + t) * d0 + (t3 - t2) * d1)
        fhat = ((6 * t2 - 6 * t) * f0 + (-6 * t2 + 6 * t) * f1
                + (3 * t2 - 4 * t + 1) * d0 + (3 * t2 - 2 * t) * d1)
        lo_m = Fhat - u < 0
        a = jnp.where(lo_m, t, a)
        b = jnp.where(lo_m, b, t)
        t = t - (Fhat - u) / jnp.where(jnp.abs(fhat) > 1e-20, fhat,
                                       jnp.where(fhat >= 0, 1e-20, -1e-20))
        return t, a, b

    half = jnp.full_like(u, 0.5)
    t, a, b = jax.lax.fori_loop(0, _NEWTON_ITERS, body,
                                (half, jnp.zeros_like(u), jnp.ones_like(u)))
    t = jnp.where((t > a) & (t < b), t, 0.5 * (a + b))
    x = x0 + t * (x1 - x0)
    return jnp.where(u <= v0, nodes[0], jnp.where(u >= vl, nodes[-1], x))
