"""Reconstruction filters, evaluated directly on device.

Reference analog: core/filter.h + src/filters/* (box/triangle/gaussian/
mitchell/sinc).  The reference precomputes a 16x16 filter table
(film.h:90); we evaluate the filter analytically per stamped pixel — same
cost class on the VPU and slightly more accurate.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Tuple

import jax.numpy as jnp
import numpy as np

from tpurt.scene.paramset import ParamSet


class Filter(NamedTuple):
    name: str
    radius: Tuple[float, float]
    params: Tuple[float, ...] = ()

    def evaluate(self, dx: jnp.ndarray, dy: jnp.ndarray) -> jnp.ndarray:
        """Filter weight at offset (dx, dy) from the sample position."""
        rx, ry = self.radius
        if self.name == "box":
            return jnp.ones_like(dx)
        if self.name == "triangle":
            return (jnp.maximum(0.0, rx - jnp.abs(dx))
                    * jnp.maximum(0.0, ry - jnp.abs(dy)))
        if self.name == "gaussian":
            alpha = self.params[0]
            expx = np.exp(-alpha * rx * rx)
            expy = np.exp(-alpha * ry * ry)
            gx = jnp.maximum(0.0, jnp.exp(-alpha * dx * dx) - expx)
            gy = jnp.maximum(0.0, jnp.exp(-alpha * dy * dy) - expy)
            return gx * gy
        if self.name == "mitchell":
            b, c = self.params
            return (_mitchell_1d(dx / rx, b, c)
                    * _mitchell_1d(dy / ry, b, c))
        if self.name == "sinc":
            tau = self.params[0]
            return (_windowed_sinc(dx, rx, tau)
                    * _windowed_sinc(dy, ry, tau))
        raise ValueError(self.name)


def _mitchell_1d(x, b, c):
    x = jnp.abs(2.0 * x)
    x2, x3 = x * x, x * x * x
    inner = ((12 - 9 * b - 6 * c) * x3 + (-18 + 12 * b + 6 * c) * x2
             + (6 - 2 * b)) * (1.0 / 6.0)
    outer = ((-b - 6 * c) * x3 + (6 * b + 30 * c) * x2
             + (-12 * b - 48 * c) * x + (8 * b + 24 * c)) * (1.0 / 6.0)
    return jnp.where(x > 1, jnp.where(x < 2, outer, 0.0), inner)


def _sinc(x):
    x = jnp.abs(x)
    return jnp.where(x < 1e-5, 1.0, jnp.sin(np.pi * x) / (np.pi * x))


def _windowed_sinc(x, radius, tau):
    xa = jnp.abs(x)
    lanczos = _sinc(x / tau)
    return jnp.where(xa > radius, 0.0, _sinc(x) * lanczos)


def make_filter(name: str, ps: ParamSet) -> Filter:
    """MakeFilter dispatch (api.cpp :839-858) with reference defaults."""
    if name == "box":
        rx = ps.find_one_float("xwidth", 0.5)
        ry = ps.find_one_float("ywidth", 0.5)
        return Filter("box", (rx, ry))
    if name == "triangle":
        rx = ps.find_one_float("xwidth", 2.0)
        ry = ps.find_one_float("ywidth", 2.0)
        return Filter("triangle", (rx, ry))
    if name == "gaussian":
        rx = ps.find_one_float("xwidth", 2.0)
        ry = ps.find_one_float("ywidth", 2.0)
        alpha = ps.find_one_float("alpha", 2.0)
        return Filter("gaussian", (rx, ry), (alpha,))
    if name == "mitchell":
        rx = ps.find_one_float("xwidth", 2.0)
        ry = ps.find_one_float("ywidth", 2.0)
        b = ps.find_one_float("B", 1.0 / 3.0)
        c = ps.find_one_float("C", 1.0 / 3.0)
        return Filter("mitchell", (rx, ry), (b, c))
    if name in ("sinc", "lanczossinc"):
        rx = ps.find_one_float("xwidth", 4.0)
        ry = ps.find_one_float("ywidth", 4.0)
        tau = ps.find_one_float("tau", 3.0)
        return Filter("sinc", (rx, ry), (tau,))
    raise ValueError(f'filter "{name}" unknown')
