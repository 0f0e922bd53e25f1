"""Device intersection: watertight triangles, analytic quadrics, and
stack-based BVH traversal — pure-JAX reference path.

Reference analog: shapes/triangle.cpp:188-350 (watertight permute+shear
intersect), shapes/sphere.cpp / cylinder.cpp / disk.cpp (quadric solves),
accelerators/bvh.cpp:662-738 (iterative traversal with a 64-deep node
stack, precomputed invDir, near-child-first ordering).

Design: one scalar-ray traversal written with lax.while_loop and a
register-resident stack, vmapped over the wavefront.  XLA compiles this to
a lockstep masked loop over ray lanes; the Pallas kernel in tpurt.kernels
is the tuned TPU variant of the same algorithm.  All geometry tables are
gathered by index from HBM.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from tpurt.render.geometry_build import (
    GeometryArrays,
    PT_CONE,
    PT_CYLINDER,
    PT_DISK,
    PT_PARABOLOID,
    PT_SPHERE,
    PT_TRIANGLE,
)

STACK_DEPTH = 64
INF = jnp.float32(np.inf)

# machine gamma for conservative box tests (pbrt gamma(3))
_GAMMA3 = 3.0 * np.finfo(np.float32).eps * 0.5 / (1 - 3 * np.finfo(np.float32).eps * 0.5)
_BOX_T_SCALE = jnp.float32(1.0 + 2.0 * _GAMMA3)


class DeviceGeometry(NamedTuple):
    """Pytree of device arrays mirroring GeometryArrays."""

    bvh_lo: jnp.ndarray
    bvh_hi: jnp.ndarray
    bvh_right: jnp.ndarray
    bvh_prim_off: jnp.ndarray
    bvh_nprims: jnp.ndarray
    bvh_axis: jnp.ndarray
    prim_type: jnp.ndarray
    material_id: jnp.ndarray
    arealight_id: jnp.ndarray
    flags: jnp.ndarray
    tri_v0: jnp.ndarray
    tri_v1: jnp.ndarray
    tri_v2: jnp.ndarray
    tri_vi: jnp.ndarray
    vert_n: jnp.ndarray
    vert_uv: jnp.ndarray
    vert_s: jnp.ndarray
    quad_id: jnp.ndarray
    quad_w2o: jnp.ndarray
    quad_o2w: jnp.ndarray
    quad_params: jnp.ndarray

    @staticmethod
    def from_host(g: GeometryArrays) -> "DeviceGeometry":
        f = jnp.asarray
        return DeviceGeometry(
            bvh_lo=f(g.bvh.bounds_lo), bvh_hi=f(g.bvh.bounds_hi),
            bvh_right=f(g.bvh.right_child), bvh_prim_off=f(g.bvh.prim_offset),
            bvh_nprims=f(g.bvh.n_prims), bvh_axis=f(g.bvh.axis),
            prim_type=f(g.prim_type), material_id=f(g.material_id),
            arealight_id=f(g.arealight_id), flags=f(g.flags),
            tri_v0=f(g.tri_v0), tri_v1=f(g.tri_v1), tri_v2=f(g.tri_v2),
            tri_vi=f(g.tri_vi), vert_n=f(g.vert_n), vert_uv=f(g.vert_uv),
            vert_s=f(g.vert_s), quad_id=f(g.quad_id),
            quad_w2o=f(g.quad_w2o), quad_o2w=f(g.quad_o2w),
            quad_params=f(g.quad_params),
        )


class Hit(NamedTuple):
    """Closest-hit record (SoA over rays)."""

    t: jnp.ndarray  # hit distance (inf if miss)
    prim: jnp.ndarray  # primitive index (-1 if miss)
    b0: jnp.ndarray  # triangle barycentric 0 / quadric u
    b1: jnp.ndarray  # triangle barycentric 1 / quadric v

    @property
    def valid(self) -> jnp.ndarray:
        return self.prim >= 0


# ---------------------------------------------------------------------------
# primitive intersections (scalar ray, scalar prim; vmapped by callers)
# ---------------------------------------------------------------------------

def ray_triangle(o, d, t_max, v0, v1, v2):
    """Watertight ray-triangle test (permute + shear + edge functions).
    Returns (hit, t, b0, b1)."""
    # translate so the ray origin is at the coordinate origin
    p0t = v0 - o
    p1t = v1 - o
    p2t = v2 - o
    # permute so |d_z| is the largest component
    kz = jnp.argmax(jnp.abs(d))
    kx = (kz + 1) % 3
    ky = (kx + 1) % 3
    dp = jnp.stack([d[kx], d[ky], d[kz]])
    p0t = jnp.stack([p0t[kx], p0t[ky], p0t[kz]])
    p1t = jnp.stack([p1t[kx], p1t[ky], p1t[kz]])
    p2t = jnp.stack([p2t[kx], p2t[ky], p2t[kz]])
    # shear to align the ray with +z
    sx = -dp[0] / dp[2]
    sy = -dp[1] / dp[2]
    sz = 1.0 / dp[2]
    x0 = p0t[0] + sx * p0t[2]
    y0 = p0t[1] + sy * p0t[2]
    x1 = p1t[0] + sx * p1t[2]
    y1 = p1t[1] + sy * p1t[2]
    x2 = p2t[0] + sx * p2t[2]
    y2 = p2t[1] + sy * p2t[2]
    # edge functions
    e0 = x1 * y2 - y1 * x2
    e1 = x2 * y0 - y2 * x0
    e2 = x0 * y1 - y0 * x1
    same_sign = ((e0 >= 0) & (e1 >= 0) & (e2 >= 0)) | (
        (e0 <= 0) & (e1 <= 0) & (e2 <= 0)
    )
    det = e0 + e1 + e2
    z0 = sz * p0t[2]
    z1 = sz * p1t[2]
    z2 = sz * p2t[2]
    t_scaled = e0 * z0 + e1 * z1 + e2 * z2
    # sign-consistent depth test without dividing
    neg_det = det < 0
    t_ok = jnp.where(
        neg_det,
        (t_scaled <= 0) & (t_scaled > t_max * det),
        (t_scaled >= 0) & (t_scaled < t_max * det),
    )
    hit = same_sign & (det != 0) & t_ok
    inv_det = jnp.where(det != 0, 1.0 / det, 0.0)
    t = t_scaled * inv_det
    b0 = e0 * inv_det
    b1 = e1 * inv_det
    return hit, jnp.where(hit, t, INF), b0, b1


def _dot3(a, b):
    """3-vector dot as elementwise FMAs (same MXU-avoidance rationale as
    _xform_point)."""
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def _xform_point(m, p):
    """Elementwise 3x3+translate apply.  Deliberately NOT a matmul: under
    vmap a (N,3)x(3,3) dot lands on the MXU, where f32 inputs default to a
    bf16 pass on TPU (~1e-2 relative error — measured); elementwise FMAs
    stay on the VPU at full f32."""
    return jnp.stack([
        m[0, 0] * p[0] + m[0, 1] * p[1] + m[0, 2] * p[2] + m[0, 3],
        m[1, 0] * p[0] + m[1, 1] * p[1] + m[1, 2] * p[2] + m[1, 3],
        m[2, 0] * p[0] + m[2, 1] * p[1] + m[2, 2] * p[2] + m[2, 3],
    ])


def _xform_vector(m, v):
    return jnp.stack([
        m[0, 0] * v[0] + m[0, 1] * v[1] + m[0, 2] * v[2],
        m[1, 0] * v[0] + m[1, 1] * v[1] + m[1, 2] * v[2],
        m[2, 0] * v[0] + m[2, 1] * v[1] + m[2, 2] * v[2],
    ])


def _quadratic(a, b, c):
    """Numerically stable quadratic; returns (has_roots, t0, t1), t0<=t1."""
    disc = b * b - 4.0 * a * c
    return _roots_from_disc(a, b, disc)


def _quadratic_radial(a, b, r, v_perp_sq):
    """Quadratic for |o + t d|^2 = r^2 style circle/sphere solves, with the
    cancellation-free discriminant 4a(r-l)(r+l) where l is the distance of
    the origin's perpendicular foot from the center (the f32-robust form;
    the reference gets robustness from EFloat doubles instead, efloat.h:48)."""
    l = jnp.sqrt(jnp.maximum(v_perp_sq, 0.0))
    disc = 4.0 * a * (r - l) * (r + l)
    return _roots_from_disc(a, b, disc)


def _roots_from_disc(a, b, disc):
    ok = disc >= 0
    sqrt_d = jnp.sqrt(jnp.maximum(disc, 0.0))
    q = jnp.where(b < 0, -0.5 * (b - sqrt_d), -0.5 * (b + sqrt_d))
    q = jnp.where(q == 0, 1e-20, q)
    t0 = q / a
    # second root via c/q with c recovered as (b^2 - disc) / 4a
    t1 = ((b * b - disc) / (4.0 * a)) / q
    return ok, jnp.minimum(t0, t1), jnp.maximum(t0, t1)


def ray_quadric(o, d, t_max, kind, w2o, params):
    """Analytic quadric intersect in object space.  kind is a traced int32
    (PT_* code); params = [radius, zmin, zmax, phimax, height, inner_r, _, _].
    Returns (hit, t, u, v)."""
    oo = _xform_point(w2o, o)
    od = _xform_vector(w2o, d)
    radius, zmin, zmax, phimax, height, inner_r = (
        params[0], params[1], params[2], params[3], params[4], params[5])

    def clip_phi_z(t, check_z=True):
        p = oo + t * od
        phi = jnp.arctan2(p[1], p[0])
        phi = jnp.where(phi < 0, phi + 2 * np.pi, phi)
        ok = (phi <= phimax) & (t > 0) & (t < t_max)
        if check_z:
            ok &= (p[2] >= zmin) & (p[2] <= zmax)
        return ok, p, phi

    def sphere_case(_):
        a = _dot3(od, od)
        b = 2.0 * _dot3(oo, od)
        v = oo - (b / (2.0 * a)) * od  # perpendicular foot from center
        has, t0, t1 = _quadratic_radial(a, b, radius, _dot3(v, v))

        def test(t):
            p = oo + t * od
            # reproject for precision (pbrt refines pHit to the surface)
            p = p * (radius / jnp.linalg.norm(p))
            phi = jnp.arctan2(p[1], p[0])
            phi = jnp.where(phi < 0, phi + 2 * np.pi, phi)
            full = (zmin <= -radius) & (zmax >= radius) & (phimax >= 2 * np.pi - 1e-6)
            ok = full | ((p[2] >= zmin) & (p[2] <= zmax) & (phi <= phimax))
            ok &= (t > 1e-7) & (t < t_max)
            return ok, p, phi

        ok0, p0, phi0 = test(t0)
        ok1, p1, phi1 = test(t1)
        use1 = ~ok0 & ok1
        hit = has & (ok0 | ok1)
        t = jnp.where(use1, t1, t0)
        p = jnp.where(use1, p1, p0)
        phi = jnp.where(use1, phi1, phi0)
        u = phi / phimax
        zc = jnp.clip(p[2] / radius, -1.0, 1.0)
        theta = jnp.arccos(zc)
        theta_min = jnp.arccos(jnp.clip(zmax / radius, -1, 1))
        theta_max = jnp.arccos(jnp.clip(zmin / radius, -1, 1))
        v = (theta - theta_min) / jnp.maximum(theta_max - theta_min, 1e-12)
        return hit, jnp.where(hit, t, INF), u, v

    def cylinder_case(_):
        a = od[0] * od[0] + od[1] * od[1]
        a = jnp.where(a == 0, 1e-20, a)
        b = 2.0 * (oo[0] * od[0] + oo[1] * od[1])
        vx = oo[0] - (b / (2.0 * a)) * od[0]
        vy = oo[1] - (b / (2.0 * a)) * od[1]
        has, t0, t1 = _quadratic_radial(a, b, radius, vx * vx + vy * vy)
        ok0, p0, phi0 = clip_phi_z(t0)
        ok1, p1, phi1 = clip_phi_z(t1)
        use1 = ~ok0 & ok1
        hit = has & (ok0 | ok1)
        t = jnp.where(use1, t1, t0)
        p = jnp.where(use1, p1, p0)
        phi = jnp.where(use1, phi1, phi0)
        u = phi / phimax
        v = (p[2] - zmin) / jnp.maximum(zmax - zmin, 1e-12)
        return hit, jnp.where(hit, t, INF), u, v

    def disk_case(_):
        t = (height - oo[2]) / jnp.where(od[2] != 0, od[2], 1e-20)
        p = oo + t * od
        r2 = p[0] * p[0] + p[1] * p[1]
        phi = jnp.arctan2(p[1], p[0])
        phi = jnp.where(phi < 0, phi + 2 * np.pi, phi)
        hit = ((od[2] != 0) & (t > 1e-7) & (t < t_max)
               & (r2 <= radius * radius) & (r2 >= inner_r * inner_r)
               & (phi <= phimax))
        r_hit = jnp.sqrt(jnp.maximum(r2, 0.0))
        u = phi / phimax
        v = (radius - r_hit) / jnp.maximum(radius - inner_r, 1e-12)
        return hit, jnp.where(hit, t, INF), u, v

    def cone_case(_):
        # x^2 + y^2 = ((h - z) r / h)^2, z in [0, h]; zmax holds h.
        h = zmax
        k = (radius / h) ** 2
        a = od[0] ** 2 + od[1] ** 2 - k * od[2] ** 2
        b = 2 * (oo[0] * od[0] + oo[1] * od[1] - k * od[2] * (oo[2] - h))
        c = oo[0] ** 2 + oo[1] ** 2 - k * (oo[2] - h) ** 2
        has, t0, t1 = _quadratic(a, b, c)

        def test(t):
            p = oo + t * od
            phi = jnp.arctan2(p[1], p[0])
            phi = jnp.where(phi < 0, phi + 2 * np.pi, phi)
            ok = (t > 1e-7) & (t < t_max) & (p[2] >= 0) & (p[2] <= h) & (phi <= phimax)
            return ok, p, phi

        ok0, p0, phi0 = test(t0)
        ok1, p1, phi1 = test(t1)
        use1 = ~ok0 & ok1
        hit = has & (ok0 | ok1)
        t = jnp.where(use1, t1, t0)
        p = jnp.where(use1, p1, p0)
        phi = jnp.where(use1, phi1, phi0)
        return hit, jnp.where(hit, t, INF), phi / phimax, p[2] / h

    def paraboloid_case(_):
        # z = zmax * (x^2 + y^2) / r^2, z in [zmin, zmax]
        k = zmax / (radius * radius)
        a = k * (od[0] ** 2 + od[1] ** 2)
        b = 2 * k * (oo[0] * od[0] + oo[1] * od[1]) - od[2]
        c = k * (oo[0] ** 2 + oo[1] ** 2) - oo[2]
        has, t0, t1 = _quadratic(jnp.where(a != 0, a, 1e-20), b, c)
        ok0, p0, phi0 = clip_phi_z(t0)
        ok1, p1, phi1 = clip_phi_z(t1)
        use1 = ~ok0 & ok1
        hit = has & (ok0 | ok1)
        t = jnp.where(use1, t1, t0)
        p = jnp.where(use1, p1, p0)
        phi = jnp.where(use1, phi1, phi0)
        v = (p[2] - zmin) / jnp.maximum(zmax - zmin, 1e-12)
        return hit, jnp.where(hit, t, INF), phi / phimax, v

    def miss_case(_):
        return jnp.bool_(False), INF, jnp.float32(0), jnp.float32(0)

    idx = jnp.clip(kind - PT_SPHERE, 0, 4)
    return jax.lax.switch(
        idx,
        [sphere_case, cylinder_case, disk_case, cone_case, paraboloid_case],
        None,
    )


def _intersect_prim(geo: DeviceGeometry, pi, o, d, t_max):
    """Dispatch one primitive by type. Returns (hit, t, b0, b1)."""
    ptype = geo.prim_type[pi]

    def tri(_):
        return ray_triangle(o, d, t_max, geo.tri_v0[pi], geo.tri_v1[pi],
                            geo.tri_v2[pi])

    def quad(_):
        qi = geo.quad_id[pi]
        return ray_quadric(o, d, t_max, ptype, geo.quad_w2o[qi],
                           geo.quad_params[qi])

    return jax.lax.cond(ptype == PT_TRIANGLE, tri, quad, None)


# ---------------------------------------------------------------------------
# BVH traversal
# ---------------------------------------------------------------------------

def _slab_test(lo, hi, o, inv_d, t_max):
    """Conservative ray/AABB test (bvh.cpp Bounds3::IntersectP with the
    gamma-scaled tMax)."""
    t0 = (lo - o) * inv_d
    t1 = (hi - o) * inv_d
    t_near = jnp.max(jnp.minimum(t0, t1))
    t_far = jnp.min(jnp.maximum(t0, t1)) * _BOX_T_SCALE
    return (t_near <= t_far) & (t_far > 0) & (t_near < t_max)


def _traverse_one(geo: DeviceGeometry, o, d, t_max, any_hit: bool):
    """Scalar-ray BVH traversal; vmapped by the public entry points."""
    inv_d = jnp.where(d != 0, 1.0 / d, jnp.where(d >= 0, INF, -INF))
    dir_neg = inv_d < 0

    # carries derived from ray data so their varying-axes types match the
    # loop body under shard_map (plain constants would be unvarying)
    vz_f = jnp.asarray(t_max, jnp.float32) * 0.0
    vz_i = vz_f.astype(jnp.int32)
    stack = jnp.zeros(STACK_DEPTH, dtype=jnp.int32) + vz_i
    # state: stack, sp, best (t, prim, b0, b1)
    init = (stack, jnp.int32(1) + vz_i, jnp.asarray(t_max, jnp.float32),
            jnp.int32(-1) + vz_i, vz_f, vz_f)

    def cond(state):
        _, sp, _, prim, _, _ = state
        alive = sp > 0
        if any_hit:
            alive &= prim < 0
        return alive

    def body(state):
        stack, sp, t_best, prim_best, b0_best, b1_best = state
        sp = sp - 1
        node = stack[sp]
        hit_box = _slab_test(geo.bvh_lo[node], geo.bvh_hi[node], o, inv_d, t_best)
        n_prims = geo.bvh_nprims[node]
        is_leaf = n_prims > 0

        def visit_leaf(carry):
            stack, sp, t_best, prim_best, b0_best, b1_best = carry
            off = geo.bvh_prim_off[node]

            def leaf_body(k, c):
                t_b, p_b, b0_b, b1_b = c
                pi = off + k
                h, t, b0, b1 = _intersect_prim(geo, pi, o, d, t_b)
                better = h & (t < t_b)
                return (
                    jnp.where(better, t, t_b),
                    jnp.where(better, pi, p_b),
                    jnp.where(better, b0, b0_b),
                    jnp.where(better, b1, b1_b),
                )

            t_best, prim_best, b0_best, b1_best = jax.lax.fori_loop(
                0, n_prims, leaf_body, (t_best, prim_best, b0_best, b1_best)
            )
            return stack, sp, t_best, prim_best, b0_best, b1_best

        def visit_interior(carry):
            stack, sp, t_best, prim_best, b0_best, b1_best = carry
            axis = geo.bvh_axis[node]
            near_first = ~dir_neg[axis]
            c0 = node + 1
            c1 = geo.bvh_right[node]
            near = jnp.where(near_first, c0, c1)
            far = jnp.where(near_first, c1, c0)
            stack = stack.at[sp].set(far)
            stack = stack.at[sp + 1].set(near)
            return stack, sp + 2, t_best, prim_best, b0_best, b1_best

        def skip(carry):
            return carry

        carry = (stack, sp, t_best, prim_best, b0_best, b1_best)
        carry = jax.lax.cond(
            hit_box,
            lambda c: jax.lax.cond(is_leaf, visit_leaf, visit_interior, c),
            skip,
            carry,
        )
        return carry

    stack, sp, t, prim, b0, b1 = jax.lax.while_loop(cond, body, init)
    return t, prim, b0, b1


def intersect_closest(geo: DeviceGeometry, o, d, t_max) -> Hit:
    """Closest-hit intersection for a wavefront of rays.
    o, d: (N, 3); t_max: scalar or (N,).  Returns Hit of (N,) arrays."""
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), o.shape[:1])
    t, prim, b0, b1 = jax.vmap(
        lambda oo, dd, tm: _traverse_one(geo, oo, dd, tm, any_hit=False)
    )(o, d, t_max)
    return Hit(t=t, prim=jnp.where(jnp.isfinite(t), prim, -1), b0=b0, b1=b1)


def intersect_any(geo: DeviceGeometry, o, d, t_max) -> jnp.ndarray:
    """Shadow-ray predicate: does anything lie along the ray before t_max?"""
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), o.shape[:1])
    _, prim, _, _ = jax.vmap(
        lambda oo, dd, tm: _traverse_one(geo, oo, dd, tm, any_hit=True)
    )(o, d, t_max)
    return prim >= 0
