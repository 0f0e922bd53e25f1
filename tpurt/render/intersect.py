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
    """Pytree of device arrays mirroring GeometryArrays.

    The traversal hot path reads exactly ONE packed table row per step —
    random gathers are latency-bound on TPU (measured ~58us per gather
    round regardless of field count), so the leaf triangle is FUSED into
    its node record and interior/leaf share one 64-byte row:

    nodes_packed (M, 16) f32:
        interior: [0:3]=bounds lo, [3:6]=bounds hi,
                  [12]=bitcast i32 right_child, [13]=bitcast i32 axis,
                  [15]=0
        leaf:     [0:9]=triangle v0,v1,v2,
                  [12]=bitcast i32 prim row, [15]=1
        (the BVH holds triangles only, one per leaf; quadrics are tested
        in a gather-free vectorized pass over static rows)
    prims_packed (P, 16) f32 (brute-force oracle path + leaf fallback):
        [0:9] tri v0,v1,v2; [9] bitcast i32 prim_type;
        [10] bitcast i32 quad_id
    """

    nodes_packed: jnp.ndarray
    prims_packed: jnp.ndarray
    # unpacked shading-time tables
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
    # media interface per prim (-1 = vacuum)
    medium_inside: jnp.ndarray = None
    medium_outside: jnp.ndarray = None

    n_tris: int = 0
    n_quads: int = 0

    @staticmethod
    def from_host(g: GeometryArrays) -> "DeviceGeometry":
        f = jnp.asarray
        assert (g.bvh.n_prims <= 1).all(), "traversal expects 1-prim leaves"
        m = g.bvh.n_nodes
        nodes = np.zeros((m, 16), np.float32)
        leaf = g.bvh.n_prims > 0
        interior = ~leaf
        nodes[interior, 0:3] = g.bvh.bounds_lo[interior]
        nodes[interior, 3:6] = g.bvh.bounds_hi[interior]
        # leaf rows carry the triangle itself (prim rows are already in
        # BVH-leaf order, so the leaf's prim row == its prim_offset)
        pi = np.minimum(g.bvh.prim_offset[leaf], len(g.prim_type) - 1)
        nodes[leaf, 0:3] = g.tri_v0[pi]
        nodes[leaf, 3:6] = g.tri_v1[pi]
        nodes[leaf, 6:9] = g.tri_v2[pi]
        meta_a = np.where(leaf, g.bvh.prim_offset,
                          g.bvh.right_child).astype(np.int32)
        nodes[:, 12] = meta_a.view(np.float32)
        nodes[:, 13] = g.bvh.axis.astype(np.int32).view(np.float32)
        nodes[:, 15] = leaf.astype(np.float32)

        p = len(g.prim_type)
        prims = np.zeros((p, 16), np.float32)
        prims[:, 0:3] = g.tri_v0
        prims[:, 3:6] = g.tri_v1
        prims[:, 6:9] = g.tri_v2
        prims[:, 9] = g.prim_type.astype(np.int32).view(np.float32)
        prims[:, 10] = np.maximum(g.quad_id, 0).astype(np.int32).view(np.float32)

        return DeviceGeometry(
            n_tris=g.n_tris, n_quads=g.n_quads,
            nodes_packed=f(nodes), prims_packed=f(prims),
            prim_type=f(g.prim_type), material_id=f(g.material_id),
            arealight_id=f(g.arealight_id), flags=f(g.flags),
            tri_v0=f(g.tri_v0), tri_v1=f(g.tri_v1), tri_v2=f(g.tri_v2),
            tri_vi=f(g.tri_vi), vert_n=f(g.vert_n), vert_uv=f(g.vert_uv),
            vert_s=f(g.vert_s), quad_id=f(g.quad_id),
            quad_w2o=f(g.quad_w2o), quad_o2w=f(g.quad_o2w),
            quad_params=f(g.quad_params),
            medium_inside=f(g.medium_inside if g.medium_inside is not None
                            else np.full(p, -1, np.int32)),
            medium_outside=f(g.medium_outside if g.medium_outside is not None
                             else np.full(p, -1, np.int32)),
        )


from tpurt.pytrees import register_static_pytree  # noqa: E402

register_static_pytree(
    DeviceGeometry,
    [f for f in DeviceGeometry._fields if f not in ("n_tris", "n_quads")],
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
    """Dispatch one primitive by type. Returns (hit, t, b0, b1).

    Branch-free: both the triangle and quadric tests run and a select picks
    the live one.  A lax.cond here looks cheaper but is poison under vmap:
    batching the predicate turns the cond into select_n over every value
    the branches CLOSE OVER — including the whole geometry tables, which
    materializes (lanes x prims x 3) intermediates (observed 1.5 TB at a
    1M-lane wavefront)."""
    rec = geo.prims_packed[pi]  # ONE contiguous gather
    ptype = jax.lax.bitcast_convert_type(rec[9], jnp.int32)
    ht, tt, b0t, b1t = ray_triangle(o, d, t_max, rec[0:3], rec[3:6], rec[6:9])
    if geo.quad_w2o.shape[0] == 1 and geo.quad_params.shape[0] == 1:
        # triangle-only scene (quad table is the padding row): statically
        # skip the quadric path and its gathers
        return ht, tt, b0t, b1t
    qi = jax.lax.bitcast_convert_type(rec[10], jnp.int32)
    hq, tq, uq, vq = ray_quadric(o, d, t_max, ptype, geo.quad_w2o[qi],
                                 geo.quad_params[qi])
    is_tri = ptype == PT_TRIANGLE
    return (jnp.where(is_tri, ht, hq), jnp.where(is_tri, tt, tq),
            jnp.where(is_tri, b0t, uq), jnp.where(is_tri, b1t, vq))


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


def _ray_triangle_batch(o, d, t_max, v0, v1, v2):
    """Batched watertight triangle test: all args (N, ...) — the hand-
    batched twin of ray_triangle (vmapping the scalar form through the
    traversal while_loop faults the TPU runtime at >16k lanes)."""
    # dimension permutation as elementwise selects on COLUMN vectors —
    # take_along_axis over the minor axis scalarizes into cross-lane
    # shuffles on TPU (measured ~15x slowdown of the whole traversal)
    ax = jnp.abs(d[:, 0])
    ay = jnp.abs(d[:, 1])
    az = jnp.abs(d[:, 2])
    use2 = (az >= ax) & (az >= ay)  # kz = 2 -> (kx,ky,kz) = (0,1,2)
    use1 = ~use2 & (ay >= ax)       # kz = 1 -> (2,0,1)
    # else kz = 0 -> (1,2,0)

    def permute(v):
        x = jnp.where(use2, v[:, 0], jnp.where(use1, v[:, 2], v[:, 1]))
        y = jnp.where(use2, v[:, 1], jnp.where(use1, v[:, 0], v[:, 2]))
        z = jnp.where(use2, v[:, 2], jnp.where(use1, v[:, 1], v[:, 0]))
        return x, y, z

    dpx, dpy, dpz = permute(d)
    p0x, p0y, p0z = permute(v0 - o)
    p1x, p1y, p1z = permute(v1 - o)
    p2x, p2y, p2z = permute(v2 - o)
    sx = -dpx / dpz
    sy = -dpy / dpz
    sz = 1.0 / dpz
    x0 = p0x + sx * p0z
    y0 = p0y + sy * p0z
    x1 = p1x + sx * p1z
    y1 = p1y + sy * p1z
    x2 = p2x + sx * p2z
    y2 = p2y + sy * p2z
    e0 = x1 * y2 - y1 * x2
    e1 = x2 * y0 - y2 * x0
    e2 = x0 * y1 - y0 * x1
    same_sign = ((e0 >= 0) & (e1 >= 0) & (e2 >= 0)) | (
        (e0 <= 0) & (e1 <= 0) & (e2 <= 0))
    det = e0 + e1 + e2
    t_scaled = e0 * sz * p0z + e1 * sz * p1z + e2 * sz * p2z
    neg_det = det < 0
    t_ok = jnp.where(neg_det,
                     (t_scaled <= 0) & (t_scaled > t_max * det),
                     (t_scaled >= 0) & (t_scaled < t_max * det))
    hit = same_sign & (det != 0) & t_ok
    inv_det = jnp.where(det != 0, 1.0 / det, 0.0)
    return hit, jnp.where(hit, t_scaled * inv_det, INF), e0 * inv_det, e1 * inv_det


def _slab_test_batch(lo, hi, o, inv_d, t_max):
    t0 = (lo - o) * inv_d
    t1 = (hi - o) * inv_d
    t_near = jnp.max(jnp.minimum(t0, t1), axis=-1)
    t_far = jnp.min(jnp.maximum(t0, t1), axis=-1) * _BOX_T_SCALE
    return (t_near <= t_far) & (t_far > 0) & (t_near < t_max)


def _traverse_batch(geo: DeviceGeometry, o, d, t_max, any_hit: bool):
    """Hand-batched BVH traversal over (N,) ray lanes: one fused-record
    gather per step, explicit per-lane stacks, everything masked by the
    per-lane alive flag (no vmap)."""
    n = o.shape[0]
    inv_d = jnp.where(d != 0, 1.0 / d, jnp.where(d >= 0, INF, -INF))
    dir_neg = inv_d < 0
    stack = jnp.zeros((n, STACK_DEPTH), jnp.int32)
    init = (stack, jnp.ones(n, jnp.int32),
            jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,)),
            jnp.full(n, -1, jnp.int32), jnp.zeros(n, jnp.float32),
            jnp.zeros(n, jnp.float32))

    # Per-lane stack access via one-hot masks over the (static) depth axis:
    # dynamic indexing of the minor dim scalarizes into cross-lane shuffles
    # on TPU, while these are plain (N, 64) elementwise ops on the VPU.
    depth_iota = jnp.arange(STACK_DEPTH, dtype=jnp.int32)[None, :]

    def stack_read(stk, sp):
        oh = depth_iota == sp[:, None]
        return jnp.sum(jnp.where(oh, stk, 0), axis=1)

    def stack_write(stk, sp, val, mask):
        oh = (depth_iota == sp[:, None]) & mask[:, None]
        return jnp.where(oh, val[:, None], stk)

    def alive_of(sp, prim):
        a = sp > 0
        if any_hit:
            a &= prim < 0
        return a

    def cond(state):
        _, sp, _, prim, _, _ = state
        return jnp.any(alive_of(sp, prim))

    def body(state):
        stack, sp, t_best, prim_best, b0_best, b1_best = state
        alive = alive_of(sp, prim_best)
        sp1 = jnp.maximum(sp - 1, 0)
        node = stack_read(stack, sp1)
        rec = geo.nodes_packed[node]  # (N, 16): the ONE gather per step
        meta_a = jax.lax.bitcast_convert_type(rec[:, 12], jnp.int32)
        axis = jax.lax.bitcast_convert_type(rec[:, 13], jnp.int32)
        is_leaf = rec[:, 15] > 0

        h, t, b0, b1 = _ray_triangle_batch(o, d, t_best, rec[:, 0:3],
                                           rec[:, 3:6], rec[:, 6:9])
        better = alive & is_leaf & h & (t < t_best)
        t_best = jnp.where(better, t, t_best)
        prim_best = jnp.where(better, meta_a, prim_best)
        b0_best = jnp.where(better, b0, b0_best)
        b1_best = jnp.where(better, b1, b1_best)

        hit_box = _slab_test_batch(rec[:, 0:3], rec[:, 3:6], o, inv_d, t_best)
        push = alive & hit_box & ~is_leaf
        neg_axis = jnp.where(axis == 0, dir_neg[:, 0],
                             jnp.where(axis == 1, dir_neg[:, 1],
                                       dir_neg[:, 2]))
        near_first = ~neg_axis
        c0 = node + 1
        c1 = meta_a
        near = jnp.where(near_first, c0, c1)
        far = jnp.where(near_first, c1, c0)
        stack = stack_write(stack, sp1, far, push)
        stack = stack_write(stack, sp1 + 1, near, push)
        sp = jnp.where(alive, jnp.where(push, sp1 + 2, sp1), sp)
        return stack, sp, t_best, prim_best, b0_best, b1_best

    _, _, t, prim, b0, b1 = jax.lax.while_loop(cond, body, init)
    return t, prim, b0, b1


def _traverse_one(geo: DeviceGeometry, o, d, t_max, any_hit: bool):
    """Scalar-ray BVH traversal (kept for reference/tests; production paths
    use _traverse_batch)."""
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
        # Branch-free node step: exactly ONE gather (the fused 64B record),
        # then both the interior box test and the leaf triangle test run
        # masked — a lax.cond here would select_n the whole geometry table
        # under vmap (see _intersect_prim's note).
        stack, sp, t_best, prim_best, b0_best, b1_best = state
        sp1 = sp - 1
        node = stack[sp1]
        rec = geo.nodes_packed[node]
        meta_a = jax.lax.bitcast_convert_type(rec[12], jnp.int32)
        axis = jax.lax.bitcast_convert_type(rec[13], jnp.int32)
        is_leaf = rec[15] > 0

        # --- leaf: fused triangle test (1 prim per leaf by construction) ---
        h, t, b0, b1 = ray_triangle(o, d, t_best, rec[0:3], rec[3:6],
                                    rec[6:9])
        better = is_leaf & h & (t < t_best)
        t_best = jnp.where(better, t, t_best)
        prim_best = jnp.where(better, meta_a, prim_best)
        b0_best = jnp.where(better, b0, b0_best)
        b1_best = jnp.where(better, b1, b1_best)

        # --- interior: masked child pushes, near child on top ---
        hit_box = _slab_test(rec[0:3], rec[3:6], o, inv_d, t_best)
        push = hit_box & ~is_leaf
        near_first = ~dir_neg[axis]
        c0 = node + 1
        c1 = meta_a
        near = jnp.where(near_first, c0, c1)
        far = jnp.where(near_first, c1, c0)
        stack = stack.at[sp1].set(jnp.where(push, far, stack[sp1]))
        stack = stack.at[sp1 + 1].set(jnp.where(push, near, stack[sp1 + 1]))
        sp = jnp.where(push, sp1 + 2, sp1)
        return stack, sp, t_best, prim_best, b0_best, b1_best

    stack, sp, t, prim, b0, b1 = jax.lax.while_loop(cond, body, init)
    return t, prim, b0, b1


def _quadric_pass(geo: DeviceGeometry, o, d, t, prim, b0, b1):
    """Test every quadric primitive against the whole wavefront.

    Quadric parameters are STATIC rows (slices, not gathers), each test is
    a fully-vectorized elementwise pass — the transcendental-heavy quadric
    math runs n_quads times total instead of inside every traversal step."""
    n_tris = geo.n_tris

    def test_row(q, carry):
        t, prim, b0, b1 = carry
        kind = geo.prim_type[n_tris + q]
        qi = geo.quad_id[n_tris + q]
        w2o = geo.quad_w2o[qi]
        params = geo.quad_params[qi]
        h, tq, u, v = jax.vmap(
            lambda oo, dd, tb: ray_quadric(oo, dd, tb, kind, w2o, params)
        )(o, d, t)
        better = h & (tq < t)
        return (jnp.where(better, tq, t),
                jnp.where(better, n_tris + q, prim),
                jnp.where(better, u, b0),
                jnp.where(better, v, b1))

    if geo.n_quads <= 16:
        carry = (t, prim, b0, b1)
        for q in range(geo.n_quads):
            carry = test_row(q, carry)
        return carry
    return jax.lax.fori_loop(0, geo.n_quads, test_row, (t, prim, b0, b1))


def intersect_closest(geo: DeviceGeometry, o, d, t_max) -> Hit:
    """Closest-hit intersection for a wavefront of rays.
    o, d: (N, 3); t_max: scalar or (N,).  Returns Hit of (N,) arrays."""
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), o.shape[:1])
    t, prim, b0, b1 = _traverse_batch(geo, o, d, t_max, any_hit=False)
    if geo.n_quads:
        t, prim, b0, b1 = _quadric_pass(geo, o, d, t, prim, b0, b1)
    return Hit(t=t, prim=jnp.where(jnp.isfinite(t), prim, -1), b0=b0, b1=b1)


def intersect_any(geo: DeviceGeometry, o, d, t_max) -> jnp.ndarray:
    """Shadow-ray predicate: does anything lie along the ray before t_max?"""
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), o.shape[:1])
    occ = jnp.zeros(o.shape[:1], bool)
    if geo.n_quads:
        inf = jnp.full(o.shape[:1], np.inf, jnp.float32)
        tq, pq, _, _ = _quadric_pass(
            geo, o, d, inf, jnp.full(o.shape[:1], -1, jnp.int32),
            jnp.zeros(o.shape[:1]), jnp.zeros(o.shape[:1]))
        occ = (pq >= 0) & (tq < t_max)
        # already-occluded lanes skip the tree walk (t_max = 0)
        t_max = jnp.where(occ, 0.0, t_max)
    _, prim, _, _ = _traverse_batch(geo, o, d, t_max, any_hit=True)
    return occ | (prim >= 0)
