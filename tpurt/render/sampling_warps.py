"""Monte-Carlo warps shared by BSDFs and lights.

Reference analog: core/sampling.{h,cpp} (concentric disk, cosine
hemisphere, uniform cone/sphere/triangle warps + their pdfs).
All batched-elementwise over (N,) lanes.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

INV_PI = np.float32(1.0 / np.pi)
INV_2PI = np.float32(1.0 / (2 * np.pi))
INV_4PI = np.float32(1.0 / (4 * np.pi))


def concentric_sample_disk(u1, u2):
    ux = 2.0 * u1 - 1.0
    uy = 2.0 * u2 - 1.0
    zero = (ux == 0) & (uy == 0)
    use_x = jnp.abs(ux) > jnp.abs(uy)
    r = jnp.where(use_x, ux, uy)
    theta = jnp.where(
        use_x,
        (np.pi / 4) * (uy / jnp.where(ux == 0, 1.0, ux)),
        (np.pi / 2) - (np.pi / 4) * (ux / jnp.where(uy == 0, 1.0, uy)),
    )
    x = jnp.where(zero, 0.0, r * jnp.cos(theta))
    y = jnp.where(zero, 0.0, r * jnp.sin(theta))
    return x, y


def cosine_sample_hemisphere(u1, u2):
    """(N,) pair -> (N,3) direction in local (+z up) frame."""
    x, y = concentric_sample_disk(u1, u2)
    z = jnp.sqrt(jnp.maximum(0.0, 1.0 - x * x - y * y))
    return jnp.stack([x, y, z], axis=-1)


def uniform_sample_sphere(u1, u2):
    z = 1.0 - 2.0 * u1
    r = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    phi = 2 * np.pi * u2
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)


def uniform_sample_cone(u1, u2, cos_theta_max):
    cos_t = (1.0 - u1) + u1 * cos_theta_max
    sin_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_t * cos_t))
    phi = u2 * 2 * np.pi
    return jnp.stack([jnp.cos(phi) * sin_t, jnp.sin(phi) * sin_t, cos_t],
                     axis=-1)


def uniform_cone_pdf(cos_theta_max):
    return 1.0 / (2 * np.pi * jnp.maximum(1.0 - cos_theta_max, 1e-9))


def uniform_sample_triangle(u1, u2):
    """Barycentrics (b0, b1) (sampling.cpp UniformSampleTriangle)."""
    su0 = jnp.sqrt(u1)
    return 1.0 - su0, u2 * su0


def power_heuristic(nf, f_pdf, ng, g_pdf):
    """beta=2 power heuristic (integrator.cpp PowerHeuristic)."""
    f = nf * f_pdf
    g = ng * g_pdf
    return jnp.where(f * f + g * g > 0, (f * f) / (f * f + g * g), 0.0)


def build_onb(n: jnp.ndarray):
    """Branchless orthonormal basis from unit normals (Duff et al. 2017,
    'Building an Orthonormal Basis, Revisited', JCGT — public method).
    n: (N,3) -> (t, b) each (N,3).  Used where the reference builds its
    shading frame from dpdu (interaction.h); isotropic lobes only need a
    consistent frame."""
    z = n[:, 2]
    sign = jnp.where(z >= 0, 1.0, -1.0)
    a = -1.0 / (sign + z)
    b = n[:, 0] * n[:, 1] * a
    t = jnp.stack([1.0 + sign * n[:, 0] * n[:, 0] * a, sign * b,
                   -sign * n[:, 0]], axis=-1)
    bt = jnp.stack([b, sign + n[:, 1] * n[:, 1] * a, -n[:, 1]], axis=-1)
    return t, bt


def to_local(t, b, n, v):
    """World (N,3) -> local shading frame coordinates."""
    return jnp.stack([
        jnp.sum(v * t, axis=-1),
        jnp.sum(v * b, axis=-1),
        jnp.sum(v * n, axis=-1),
    ], axis=-1)


def to_world(t, b, n, v):
    return (v[:, 0:1] * t + v[:, 1:2] * b + v[:, 2:3] * n)


def dot(a, b):
    return jnp.sum(a * b, axis=-1)


def normalize(v):
    return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-20)


def reflect(wo, n):
    return -wo + 2.0 * dot(wo, n)[:, None] * n


def face_forward(n, v):
    return jnp.where(dot(n, v)[:, None] < 0, -n, n)
