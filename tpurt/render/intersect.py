"""Device intersection: watertight triangles, analytic quadrics, and
wide-BVH traversal over SoA ray wavefronts.

Reference analog: shapes/triangle.cpp:188-350 (watertight permute+shear
intersect), shapes/sphere.cpp / cylinder.cpp / disk.cpp (quadric solves),
accelerators/bvh.cpp:662-738 (iterative traversal with a 64-deep node
stack, precomputed invDir, near-child-first ordering).

TPU design (all hand-batched jnp, no vmap-through-while):
- 8-wide BVH with 12-triangle fused leaf bundles, ONE 512-byte record
  gather (jnp.take) per lockstep step — random-gather wall-clock is
  independent of row width here, so traversal is step-count bound and
  wide nodes/bundles cut steps ~5x vs the binary tree (tpurt.geom.wbvh).
- descent goes straight to the nearest hit child; other hit children are
  pushed far-to-near via one-hot writes into per-lane (N, S) stacks.
- two-phase straggler compaction: a few full-width lockstep steps kill
  most lanes (big shallow leaves), then survivors are compacted 16:1
  with jnp.nonzero(size=...) and finished at narrow width.
- quadrics are tested OUTSIDE the tree in a gather-free vectorized pass
  (their transform/params rows are static slices).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from tpurt.render.geometry_build import (
    FLAG_HAS_TANGENTS,
    GeometryArrays,
    PT_CONE,
    PT_CYLINDER,
    PT_DISK,
    PT_PARABOLOID,
    PT_SPHERE,
    PT_TRIANGLE,
)

INF = jnp.float32(np.inf)

# machine gamma for conservative box tests (pbrt gamma(3))
_GAMMA3 = 3.0 * np.finfo(np.float32).eps * 0.5 / (1 - 3 * np.finfo(np.float32).eps * 0.5)
_BOX_T_SCALE = jnp.float32(1.0 + 2.0 * _GAMMA3)


class DeviceGeometry(NamedTuple):
    """Pytree of device arrays mirroring GeometryArrays.

    The traversal hot path reads exactly ONE packed table row per step.
    Measured on this TPU: a random row gather costs the same wall-clock
    for 64 B as for 512 B rows (jnp.take, ~13 ns/lane/step at 2^17
    lanes), so traversal is STEP-COUNT bound and the tree is an 8-wide
    BVH with up to 12 triangles fused per leaf, one 512-byte record per
    step (tpurt.geom.wbvh has the record layout).

    wnodes (M, 128) f32: the wide-BVH record table (interior 8-child
        nodes and 12-triangle leaf bundles share the table; slot 126 is
        the kind flag).  Quadrics are tested in a gather-free vectorized
        pass over static rows, outside the tree.
    prims_packed (P, 16) f32 (brute-force oracle path):
        [0:9] tri v0,v1,v2; [9] bitcast i32 prim_type;
        [10] bitcast i32 quad_id
    """

    wnodes: jnp.ndarray
    prims_packed: jnp.ndarray
    # fused per-prim shading record, ONE 128-byte row gather per
    # interaction (the 18 separate small-row gathers this replaces each
    # cost the same ~13-28 ns/lane as one wide row — the gather engine
    # is row-count bound, not byte bound).  (P, 32) f32:
    #   [0] flags [1] ptype [2] material_id [3] arealight_id
    #   [4] quad_id [5] medium_inside [6] medium_outside   (bitcast i32)
    #   triangles: [7:16] v0,v1,v2  [16:25] n0,n1,n2 (vi-resolved)
    #              [25:31] uv0,uv1,uv2
    #   quadrics:  [7:19] w2o rows 0..2 (3x4 affine)  [19:27] params[0:8]
    shade_rows: jnp.ndarray
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
    # motion blur (animated meshes): per-leaf vertex deltas mirrored onto
    # the wide-node layout, plus per-prim deltas for shading; None for
    # static scenes (the check is a static pytree-structure property)
    wnodes_delta: jnp.ndarray = None
    tri_dv0: jnp.ndarray = None
    tri_dv1: jnp.ndarray = None
    tri_dv2: jnp.ndarray = None
    vert_dn: jnp.ndarray = None
    # animated quadrics: per-quadric endpoint TRS packs + flags (None for
    # scenes without quadric motion — static pytree property)
    quad_trs: jnp.ndarray = None  # (Q, 2, 16)
    quad_animated: jnp.ndarray = None  # (Q,)
    # fused motion deltas for shading ((P, 18): dv0,dv1,dv2, dn0,dn1,dn2
    # vi-resolved) and fused shading tangents ((P, 9): s0,s1,s2); None
    # when the scene has no motion / no tangents (static property)
    shade_delta: jnp.ndarray = None
    shade_s: jnp.ndarray = None

    # ray-traced curves: a SECOND wide-BVH over pre-split Bezier spans,
    # run as a statically-gated extra pass (zero cost for curve-free
    # scenes).  cnodes shares the interior layout with wnodes; leaves
    # inline WIDTH spans (wbvh.build_curve_table).  cnodes_aux carries
    # ribbon frame normals, present only for ribbon scenes.
    cnodes: jnp.ndarray = None
    cnodes_aux: jnp.ndarray = None

    # kd-tree accelerator (Accelerator "kdtree"): packed node/leaf table
    # (geom/kdtree.py layout; leaves share the BVH fused-triangle bundle
    # format) + the root clip bounds.  None under the default wide BVH.
    knodes: jnp.ndarray = None
    knodes_delta: jnp.ndarray = None
    kbounds: jnp.ndarray = None  # (2, 3)

    n_tris: int = 0
    n_quads: int = 0
    n_curves: int = 0
    wstack_depth: int = 64
    cstack_depth: int = 64
    kstack_depth: int = 32
    accel: str = "bvh"

    @staticmethod
    def from_host(g: GeometryArrays, accel: str = "bvh",
                  accel_params=None) -> "DeviceGeometry":
        from tpurt.geom.wbvh import WIDTH, build_wide_table

        f = jnp.asarray
        assert (g.bvh.n_prims <= 1).all(), "collapse expects 1-prim leaves"
        if g.has_motion:
            wnodes, wdelta, wdepth = build_wide_table(
                g.bvh, g.tri_v0, g.tri_v1, g.tri_v2,
                g.tri_e0, g.tri_e1, g.tri_e2)
        else:
            wnodes, wdelta, wdepth = build_wide_table(
                g.bvh, g.tri_v0, g.tri_v1, g.tri_v2)
        # worst-case stack residency: (W-1) pushes per interior level
        need = max(8, (wdepth - 1) * (WIDTH - 1) + 2)
        sdepth = 8
        while sdepth < min(need, 192):
            sdepth *= 2

        knodes = kdelta = kbounds = None
        kdepth = 32
        if accel == "kdtree":
            from tpurt.geom.kdtree import build_kd_table

            nt = g.n_tris
            p = accel_params
            kw = dict(
                isect_cost=p.find_one_int("intersectcost", 80) if p else 80,
                trav_cost=p.find_one_int("traversalcost", 1) if p else 1,
                empty_bonus=p.find_one_float("emptybonus", 0.5) if p else 0.5,
                max_prims=(p.find_one_int("maxprims", 0) or None) if p
                else None,
                max_depth=p.find_one_int("maxdepth", -1) if p else -1,
            )
            if g.has_motion:
                knodes, kdelta, kbounds, kdepth = build_kd_table(
                    g.tri_v0[:nt], g.tri_v1[:nt], g.tri_v2[:nt],
                    g.tri_e0[:nt], g.tri_e1[:nt], g.tri_e2[:nt], **kw)
            else:
                knodes, kdelta, kbounds, kdepth = build_kd_table(
                    g.tri_v0[:nt], g.tri_v1[:nt], g.tri_v2[:nt], **kw)

        p = len(g.prim_type)
        prims = np.zeros((p, 16), np.float32)
        prims[:, 0:3] = g.tri_v0
        prims[:, 3:6] = g.tri_v1
        prims[:, 6:9] = g.tri_v2
        prims[:, 9] = g.prim_type.astype(np.int32).view(np.float32)
        prims[:, 10] = np.maximum(g.quad_id, 0).astype(np.int32).view(np.float32)

        # fused shading record (layout documented on the field above)
        med_in = (g.medium_inside if g.medium_inside is not None
                  else np.full(p, -1, np.int32))
        med_out = (g.medium_outside if g.medium_outside is not None
                   else np.full(p, -1, np.int32))
        ints = np.stack([g.flags, g.prim_type, g.material_id,
                         g.arealight_id, g.quad_id, med_in, med_out],
                        axis=1).astype(np.int32)
        rows = np.zeros((p, 32), np.float32)
        rows[:, 0:7] = ints.view(np.float32)
        nt = g.n_tris
        if nt:
            if g.face_id is not None:  # ptex face ids (slot 31, tris only)
                rows[:nt, 31] = g.face_id[:nt].astype(np.int32).view(
                    np.float32)
            vi = g.tri_vi[:nt]
            rows[:nt, 7:10] = g.tri_v0[:nt]
            rows[:nt, 10:13] = g.tri_v1[:nt]
            rows[:nt, 13:16] = g.tri_v2[:nt]
            if len(g.vert_n):
                rows[:nt, 16:25] = g.vert_n[vi].reshape(nt, 9)
                rows[:nt, 25:31] = g.vert_uv[vi].reshape(nt, 6)
        if g.n_quads:
            nq = nt + g.n_quads
            qi = np.maximum(g.quad_id[nt:nq], 0)
            rows[nt:nq, 7:19] = g.quad_w2o[qi][:, :3, :].reshape(-1, 12)
            rows[nt:nq, 19:27] = g.quad_params[qi][:, :8]
        cnodes = caux = None
        cdepth = 64
        if g.n_curves:
            from tpurt.geom.wbvh import build_curve_table

            base = g.n_tris + g.n_quads
            cnodes, caux, cd = build_curve_table(
                g.curve_bvh, g.curve_cp, g.curve_w, g.curve_aux, base,
                g.has_ribbons)
            need_c = max(8, (cd - 1) * (WIDTH - 1) + 2)
            cdepth = 8
            while cdepth < min(need_c, 192):
                cdepth *= 2
            # curve shade rows: [7:19] span cp, [19:21] w0,w1,
            # [21:23] u0,u1, [23] subtype (bitcast i32), [24:30] ribbon
            # n0,n1, [30] normalAngle, [31] invSinNormalAngle
            ce = base + g.n_curves
            rows[base:ce, 7:19] = g.curve_cp
            rows[base:ce, 19:21] = g.curve_w
            rows[base:ce, 21:23] = g.curve_u
            rows[base:ce, 23] = g.curve_subtype.astype(np.int32).view(
                np.float32)
            rows[base:ce, 24:32] = g.curve_aux
        shade_delta = None
        if g.has_motion:
            shade_delta = np.zeros((p, 18), np.float32)
            shade_delta[:, 0:3] = g.tri_e0 - g.tri_v0
            shade_delta[:, 3:6] = g.tri_e1 - g.tri_v1
            shade_delta[:, 6:9] = g.tri_e2 - g.tri_v2
            if nt and len(g.vert_n):
                shade_delta[:nt, 9:18] = (
                    (g.vert_ne - g.vert_n)[g.tri_vi[:nt]].reshape(nt, 9))
        shade_s = None
        if nt and len(g.vert_s) and (g.flags & FLAG_HAS_TANGENTS).any():
            shade_s = np.zeros((p, 9), np.float32)
            shade_s[:nt] = g.vert_s[g.tri_vi[:nt]].reshape(nt, 9)

        return DeviceGeometry(
            n_tris=g.n_tris, n_quads=g.n_quads, n_curves=g.n_curves,
            wstack_depth=sdepth, cstack_depth=cdepth,
            kstack_depth=kdepth, accel=accel if knodes is not None else "bvh",
            knodes=f(knodes) if knodes is not None else None,
            knodes_delta=f(kdelta) if kdelta is not None else None,
            kbounds=f(kbounds) if kbounds is not None else None,
            cnodes=f(cnodes) if cnodes is not None else None,
            cnodes_aux=f(caux) if caux is not None else None,
            wnodes=f(wnodes), prims_packed=f(prims),
            shade_rows=f(rows),
            shade_delta=f(shade_delta) if shade_delta is not None else None,
            shade_s=f(shade_s) if shade_s is not None else None,
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
            wnodes_delta=f(wdelta) if wdelta is not None else None,
            quad_trs=(f(g.quad_trs) if g.quad_trs is not None else None),
            quad_animated=(f(g.quad_animated)
                           if g.quad_animated is not None else None),
            tri_dv0=f(g.tri_e0 - g.tri_v0) if g.has_motion else None,
            tri_dv1=f(g.tri_e1 - g.tri_v1) if g.has_motion else None,
            tri_dv2=f(g.tri_e2 - g.tri_v2) if g.has_motion else None,
            vert_dn=f(g.vert_ne - g.vert_n) if g.has_motion else None,
        )


from tpurt.pytrees import register_static_pytree  # noqa: E402

register_static_pytree(
    DeviceGeometry,
    [f for f in DeviceGeometry._fields
     if f not in ("n_tris", "n_quads", "n_curves",
                  "wstack_depth", "cstack_depth", "kstack_depth", "accel")],
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


def _veltkamp_split(x):
    """Exact f32 hi/lo split (Dekker): x == hi + lo, hi has <=12 mantissa
    bits.  Pure f32 ops, safe under XLA (no reassociation of these)."""
    c = jnp.float32(4097.0) * x  # 2^12 + 1
    hi = c - (c - x)
    return hi, x - hi


def _two_prod(x, y):
    """(p, e) with p = fl(x*y) and x*y == p + e exactly (Dekker)."""
    p = x * y
    xh, xl = _veltkamp_split(x)
    yh, yl = _veltkamp_split(y)
    e = ((xh * yh - p) + xh * yl + xl * yh) + xl * yl
    return p, e


def _disc_compensated(a, b, c):
    """b^2 - 4ac evaluated in double-float (~48-bit) precision — the f32
    analog of the reference's double-precision discriminant
    (efloat.h:270, pbrt.h:421), so grazing hit/miss decisions match the
    C++ binary instead of flipping at sphere/cylinder silhouettes."""
    p1, e1 = _two_prod(b, b)
    p2, e2 = _two_prod(4.0 * a, c)  # 4*a is exact in binary fp
    s = p1 - p2
    bb = s - p1  # Knuth two-sum error term for p1 + (-p2)
    err = (p1 - (s - bb)) + ((-p2) - bb)
    comp = s + (err + (e1 - e2))
    # the Veltkamp split's 4097*x overflows to inf past ~8.3e34 and the
    # compensation turns into inf-inf NaN, flipping grazing hits into
    # silent misses; magnitudes that large (|x| > 8e34 in b, 4a, or c)
    # only arise from enormous world coordinates where 24-bit precision
    # is the best available anyway — fall back to the plain f32 form
    thr = jnp.float32(8.0e34)
    huge = ((jnp.abs(b) > thr) | (jnp.abs(4.0 * a) > thr)
            | (jnp.abs(c) > thr))
    return jnp.where(huge, b * b - 4.0 * a * c, comp)


def _quadratic(a, b, c):
    """Numerically stable quadratic; returns (has_roots, t0, t1), t0<=t1."""
    disc = _disc_compensated(a, b, c)
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
        c = _dot3(oo, oo) - radius * radius
        has, t0, t1 = _quadratic(a, b, c)

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
        c = oo[0] * oo[0] + oo[1] * oo[1] - radius * radius
        has, t0, t1 = _quadratic(a, b, c)
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

    def hyperboloid_case(_):
        # ah (x^2+y^2) - ch z^2 = 1 (hyperboloid.cpp:89-93), phi measured
        # against the z-interpolated profile point (:107-111)
        ah, ch = params[6], params[7]
        hp1 = params[8:11]
        hp2 = params[11:14]
        a = ah * (od[0] ** 2 + od[1] ** 2) - ch * od[2] ** 2
        b = 2.0 * (ah * (od[0] * oo[0] + od[1] * oo[1]) - ch * od[2] * oo[2])
        c = ah * (oo[0] ** 2 + oo[1] ** 2) - ch * oo[2] ** 2 - 1.0
        has, t0, t1 = _quadratic(jnp.where(a != 0, a, 1e-20), b, c)

        def test(t):
            p = oo + t * od
            vv = (p[2] - hp1[2]) / jnp.where(
                jnp.abs(hp2[2] - hp1[2]) > 1e-12, hp2[2] - hp1[2], 1e-12)
            pr = (1 - vv) * hp1 + vv * hp2
            phi = jnp.arctan2(pr[0] * p[1] - p[0] * pr[1],
                              p[0] * pr[0] + p[1] * pr[1])
            phi = jnp.where(phi < 0, phi + 2 * np.pi, phi)
            ok = ((t > 1e-7) & (t < t_max) & (p[2] >= zmin) & (p[2] <= zmax)
                  & (phi <= phimax))
            return ok, p, phi, vv

        ok0, p0, phi0, v0 = test(t0)
        ok1, p1, phi1, v1 = test(t1)
        use1 = ~ok0 & ok1
        hit = has & (ok0 | ok1)
        t = jnp.where(use1, t1, t0)
        phi = jnp.where(use1, phi1, phi0)
        v = jnp.where(use1, v1, v0)
        return hit, jnp.where(hit, t, INF), phi / phimax, v

    def miss_case(_):
        return jnp.bool_(False), INF, jnp.float32(0), jnp.float32(0)

    idx = jnp.clip(kind - PT_SPHERE, 0, 5)
    return jax.lax.switch(
        idx,
        [sphere_case, cylinder_case, disk_case, cone_case, paraboloid_case,
         hyperboloid_case],
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
# Wide-BVH traversal (8 children / 12-triangle leaf bundles, one 512 B
# record gather per step; tpurt.geom.wbvh documents the record layout)
# ---------------------------------------------------------------------------

from tpurt.geom.wbvh import LEAF_K, SLOT_KIND, WIDTH  # noqa: E402

def _batcher_network(n: int):
    """Batcher odd-even merge sorting network for n = 2^k elements
    (19 comparators at n=8, 63 at n=16)."""
    pairs = []
    p = 1
    while p < n:
        k = p
        while k >= 1:
            for j in range(k % p, n - k, 2 * k):
                for i in range(0, min(k, n - j - k)):
                    if (i + j) // (2 * p) == (i + j + k) // (2 * p):
                        pairs.append((i + j, i + j + k))
            k //= 2
        p *= 2
    return tuple(pairs)


_SORT8 = _batcher_network(WIDTH)


def _tri_bundle_test(o, d, t_max, rec, drec=None, time=None):
    """Watertight test of the LEAF_K triangles fused in a leaf record.
    o, d: (N, 3); t_max: (N,); rec: (N, 128).  Returns (hit, t, b0, b1)
    each (N, LEAF_K); NaN vertex pads never hit.  With drec/time (motion
    blur) the vertices are lerped to the ray's time first.

    The dimension permutation is done with elementwise selects on column
    slices — take_along_axis over the minor axis scalarizes into
    cross-lane shuffles on TPU (measured ~15x traversal slowdown)."""
    K = LEAF_K
    v = [rec[:, i * K:(i + 1) * K] for i in range(9)]  # v0x..v2z, (N, K)
    if drec is not None:
        v = [vi + time[:, None] * drec[:, i * K:(i + 1) * K]
             for i, vi in enumerate(v)]
    ax, ay, az = jnp.abs(d[:, 0]), jnp.abs(d[:, 1]), jnp.abs(d[:, 2])
    use2 = ((az >= ax) & (az >= ay))[:, None]  # kz=2 -> (x,y,z)
    use1 = (~use2) & ((ay >= ax))[:, None]     # kz=1 -> (z,x,y)
    # else kz=0 -> (y,z,x)

    def permute(x, y, z):
        px = jnp.where(use2, x, jnp.where(use1, z, y))
        py = jnp.where(use2, y, jnp.where(use1, x, z))
        pz = jnp.where(use2, z, jnp.where(use1, y, x))
        return px, py, pz

    dpx, dpy, dpz = permute(d[:, 0:1], d[:, 1:2], d[:, 2:3])  # (N, 1)
    p0x, p0y, p0z = permute(v[0] - o[:, 0:1], v[1] - o[:, 1:2],
                            v[2] - o[:, 2:3])
    p1x, p1y, p1z = permute(v[3] - o[:, 0:1], v[4] - o[:, 1:2],
                            v[5] - o[:, 2:3])
    p2x, p2y, p2z = permute(v[6] - o[:, 0:1], v[7] - o[:, 1:2],
                            v[8] - o[:, 2:3])
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
    t_scaled = (e0 * p0z + e1 * p1z + e2 * p2z) * sz
    tm = t_max[:, None]
    t_ok = jnp.where(det < 0,
                     (t_scaled <= 0) & (t_scaled > tm * det),
                     (t_scaled >= 0) & (t_scaled < tm * det))
    hit = same_sign & (det != 0) & t_ok
    inv_det = jnp.where(det != 0, 1.0 / det, 0.0)
    return (hit, jnp.where(hit, t_scaled * inv_det, INF),
            e0 * inv_det, e1 * inv_det)


def _curve_blossom_weights() -> np.ndarray:
    """Constant (2^CURVE_LEAF_SUBDIV, 4, 4) blossom weights turning a
    span's 4 control points into each uniform sub-segment's 4 control
    points (BlossomBezier over [j/K, (j+1)/K]; curve.cpp:43-53)."""
    from tpurt.render.geometry_build import CURVE_LEAF_SUBDIV

    k = 1 << CURVE_LEAF_SUBDIV

    def bw(u1, u2, u3):
        e1 = u1 + u2 + u3
        e2 = u1 * u2 + u1 * u3 + u2 * u3
        e3 = u1 * u2 * u3
        return [1 - e1 + e2 - e3, e1 - 2 * e2 + 3 * e3, e2 - 3 * e3, e3]

    out = np.zeros((k, 4, 4), np.float64)
    for j in range(k):
        a, b = j / k, (j + 1) / k
        out[j] = [bw(a, a, a), bw(a, a, b), bw(a, b, b), bw(b, b, b)]
    return out


_CURVE_W = _curve_blossom_weights()


def _curve_bundle_test(o, d, t_max, rec, aux=None):
    """Test the WIDTH curve spans fused in a curve leaf record.

    Vectorized form of the reference's per-ray curve recursion
    (curve.cpp:139-374): each span's 4 control points are projected to
    the per-(lane, span) ray coordinate system (LookAt frame,
    curve.cpp:162-174), subdivided 2^CURVE_LEAF_SUBDIV ways with constant
    blossom weights (build-time pre-splitting guarantees this fixed
    unroll reaches the reference's width/20 refinement depth), and each
    sub-segment runs the depth-0 width test (curve.cpp:289-373).

    o, d: (N, 3); t_max: (N,); rec: (N, REC); aux: (N, 8*WIDTH) ribbon
    frame normals or None.  Returns (hit, t, s, v) each (N, WIDTH) where
    s is the span-local curve parameter (shading maps it to the global u
    via the shade row's span u-range).  NaN control-point pads never
    pass any comparison, so absent slots can't hit.

    Deviation (documented): within one span, overlapping sub-segment
    hits resolve to the CLOSEST; the reference keeps the last one in
    u-order because its recursion never shrinks tMax (curve.cpp:282-287
    with zMax fixed at :273).  Differs only when a single span crosses
    the ray twice."""
    W_ = WIDTH
    c = [rec[:, i * W_:(i + 1) * W_] for i in range(12)]  # (N, W) each
    w0 = rec[:, 12 * W_:13 * W_]
    w1 = rec[:, 13 * W_:14 * W_]

    ox, oy, oz = o[:, 0:1], o[:, 1:2], o[:, 2:3]
    dxx, dyy, dzz = d[:, 0:1], d[:, 1:2], d[:, 2:3]
    dl = jnp.sqrt(dxx * dxx + dyy * dyy + dzz * dzz)
    hx, hy, hz = dxx / dl, dyy / dl, dzz / dl

    # "up" = cross(d, cp3-cp0) orients the frame so the curve is roughly
    # parallel to x (minimal y extent); degenerate -> CoordinateSystem(d)
    v30x = c[9] - c[0]
    v30y = c[10] - c[1]
    v30z = c[11] - c[2]
    ux = dyy * v30z - dzz * v30y
    uy = dzz * v30x - dxx * v30z
    uz = dxx * v30y - dyy * v30x
    deg = (ux * ux + uy * uy + uz * uz) < 1e-18
    pick = jnp.abs(dxx) > jnp.abs(dyy)
    altx = jnp.where(pick, -dzz, jnp.zeros_like(dzz))
    alty = jnp.where(pick, jnp.zeros_like(dzz), dzz)
    altz = jnp.where(pick, dxx, -dyy)
    ux = jnp.where(deg, altx, ux)
    uy = jnp.where(deg, alty, uy)
    uz = jnp.where(deg, altz, uz)
    # x = normalize(cross(up, dhat)); y = cross(dhat, x)  (LookAt basis)
    xx = uy * hz - uz * hy
    xy = uz * hx - ux * hz
    xz = ux * hy - uy * hx
    xl = jnp.maximum(jnp.sqrt(xx * xx + xy * xy + xz * xz), 1e-20)
    xx, xy, xz = xx / xl, xy / xl, xz / xl
    yx = hy * xz - hz * xy
    yy = hz * xx - hx * xz
    yz = hx * xy - hy * xx

    # project the 4 control points into the ray frame
    rx, ry, rz = [], [], []
    for i in range(4):
        qx = c[3 * i] - ox
        qy = c[3 * i + 1] - oy
        qz = c[3 * i + 2] - oz
        rx.append(qx * xx + qy * xy + qz * xz)
        ry.append(qx * yx + qy * yy + qz * yz)
        rz.append(qx * hx + qy * hy + qz * hz)

    z_lim = dl * t_max[:, None]
    if aux is not None:
        n0x, n0y, n0z = aux[:, 0:W_], aux[:, W_:2 * W_], aux[:, 2 * W_:3 * W_]
        n1x, n1y, n1z = (aux[:, 3 * W_:4 * W_], aux[:, 4 * W_:5 * W_],
                         aux[:, 5 * W_:6 * W_])
        ang = aux[:, 6 * W_:7 * W_]
        inv_sin = aux[:, 7 * W_:8 * W_]
        has_n = (n0x * n0x + n0y * n0y + n0z * n0z) > 0.5

    t_best = jnp.full_like(w0, INF)
    s_best = jnp.zeros_like(w0)
    v_best = jnp.zeros_like(w0)
    n_sub = _CURVE_W.shape[0]
    for j in range(n_sub):
        wj = _CURVE_W[j]
        a, b = j / n_sub, (j + 1) / n_sub
        sx = [sum(float(wj[k, m]) * rx[m] for m in range(4)) for k in range(4)]
        sy = [sum(float(wj[k, m]) * ry[m] for m in range(4)) for k in range(4)]
        sz = [sum(float(wj[k, m]) * rz[m] for m in range(4)) for k in range(4)]

        # endpoint tangent-perpendicular culling (curve.cpp:294-301)
        e_ok0 = (sy[1] - sy[0]) * (-sy[0]) + sx[0] * (sx[0] - sx[1]) >= 0
        e_ok1 = (sy[2] - sy[3]) * (-sy[3]) + sx[3] * (sx[3] - sx[2]) >= 0
        # closest-point parameter on the chord (curve.cpp:303-307)
        cdx = sx[3] - sx[0]
        cdy = sy[3] - sy[0]
        denom = cdx * cdx + cdy * cdy
        den_ok = denom > 0
        wp = -(sx[0] * cdx + sy[0] * cdy) / jnp.where(den_ok, denom, 1.0)
        s = jnp.clip(a + (b - a) * wp, a, b)  # span-local u (clamped)
        hw = w0 + (w1 - w0) * s  # span-end widths pre-lerped at build
        if aux is not None:
            # ribbon: scale width by the projection of the slerped frame
            # normal onto the ray (curve.cpp:313-321)
            small = ang < 1e-4
            s0 = jnp.where(small, 1.0 - s,
                           jnp.sin((1.0 - s) * ang) * inv_sin)
            s1 = jnp.where(small, s, jnp.sin(s * ang) * inv_sin)
            nhx = s0 * n0x + s1 * n1x
            nhy = s0 * n0y + s1 * n1y
            nhz = s0 * n0z + s1 * n1z
            proj = jnp.abs(nhx * dxx + nhy * dyy + nhz * dzz) / dl
            hw = jnp.where(has_n, hw * proj, hw)

        # evaluate the sub-segment at clamp(wp, 0, 1) with derivative
        ww = jnp.clip(wp, 0.0, 1.0)
        c1x = [sx[i] + ww * (sx[i + 1] - sx[i]) for i in range(3)]
        c1y = [sy[i] + ww * (sy[i + 1] - sy[i]) for i in range(3)]
        c1z = [sz[i] + ww * (sz[i + 1] - sz[i]) for i in range(3)]
        c2x = [c1x[i] + ww * (c1x[i + 1] - c1x[i]) for i in range(2)]
        c2y = [c1y[i] + ww * (c1y[i + 1] - c1y[i]) for i in range(2)]
        c2z = [c1z[i] + ww * (c1z[i + 1] - c1z[i]) for i in range(2)]
        pcx = c2x[0] + ww * (c2x[1] - c2x[0])
        pcy = c2y[0] + ww * (c2y[1] - c2y[0])
        pcz = c2z[0] + ww * (c2z[1] - c2z[0])
        dvx = c2x[1] - c2x[0]
        dvy = c2y[1] - c2y[0]
        dv0 = (dvx * dvx + dvy * dvy) == 0  # EvalBezier fallback (:71-77)
        dvx = jnp.where(dv0, sx[3] - sx[0], dvx)
        dvy = jnp.where(dv0, sy[3] - sy[0], dvy)

        dist2 = pcx * pcx + pcy * pcy
        ok = (e_ok0 & e_ok1 & den_ok
              & (dist2 <= hw * hw * 0.25)
              & (pcz > 0) & (pcz < z_lim))
        t_j = pcz / dl
        dist = jnp.sqrt(dist2)
        edge_f = dvx * (-pcy) + pcx * dvy
        v_j = jnp.where(edge_f > 0, 0.5 + dist / jnp.maximum(hw, 1e-20),
                        0.5 - dist / jnp.maximum(hw, 1e-20))
        better = ok & (t_j < t_best)
        t_best = jnp.where(better, t_j, t_best)
        s_best = jnp.where(better, s, s_best)
        v_best = jnp.where(better, v_j, v_best)

    hit = jnp.isfinite(t_best)
    return hit, t_best, s_best, v_best


def _box8_test(rec, o, inv_d, t_max):
    """Slab tests of the 8 child boxes in an interior record.
    Returns (hit, t_near) each (N, 8); NaN boxes (invalid children)
    never hit."""
    W = WIDTH
    b = [rec[:, i * W:(i + 1) * W] for i in range(6)]  # lox loy loz hix hiy hiz
    t_near = jnp.full(rec.shape[:1] + (W,), -INF)
    t_far = jnp.full(rec.shape[:1] + (W,), INF)
    for a in range(3):
        t0 = (b[a] - o[:, a:a + 1]) * inv_d[:, a:a + 1]
        t1 = (b[3 + a] - o[:, a:a + 1]) * inv_d[:, a:a + 1]
        t_near = jnp.maximum(t_near, jnp.minimum(t0, t1))
        t_far = jnp.minimum(t_far, jnp.maximum(t0, t1))
    t_far = t_far * _BOX_T_SCALE
    hit = (t_near <= t_far) & (t_far > 0) & (t_near < t_max[:, None])
    return hit, t_near


# Traversal schedule: full-width lockstep steps while more than
# n/COMPACT_DIV lanes are live, then ONE compaction of the survivors
# run to completion at n/COMPACT_DIV width.  Chosen by the in-jit
# schedule shootout (tools/probe.py schedule, killeroo center-chunk
# shuffled primaries, 2^17 lanes, dispatch excluded):
#   fixed phase-1 + rung ladder (round-2 prod)  100.2 ms (1328 trips)
#   full-width to completion                     73.4 ms (48 trips)
#   fwhile > n/32 + one compact-to-completion    37.2 ms
#   fwhile > n/8  + one compact-to-completion    34.6 ms  <- this
# The per-step cost is gather-engine bound (1.51 ms/full-width step at
# 2^17 lanes; the node-row gather is 13-28 ns/row), so the schedule
# minimizes total gathered rows: full width only while occupancy is
# high, one narrow completion for the straggler tail.
COMPACT_DIV = 8


def _wide_step_fns(geo: DeviceGeometry, o, d, inv_d, any_hit: bool,
                   time=None, tree: str = "tri"):
    """Build the traversal (cond, body) closures over a fixed ray set.
    State: (cur, sp, stack, t_best, prim_best, b0_best, b1_best) — all
    sized to o's lane count, so the same closures serve the full-width
    and compacted phases.

    Per step: ONE jnp.take row gather of the current node record, then
    masked leaf (12 fused triangles) and interior (8 child boxes, sorted
    near-first by a fixed comparator network) paths.  Descent goes
    straight to the nearest hit child (no stack round-trip); the other
    hit children are pushed far-to-near.  Per-lane stacks are accessed
    via one-hot masks over the static depth axis (dynamic minor-axis
    indexing scalarizes on TPU).

    tree="curve" walks the curve-span table instead: same interior
    layout (shared _box8_test + stack machinery), leaf test =
    _curve_bundle_test, b0/b1 = span-local parameter s and width
    coordinate v."""
    curve = tree == "curve"
    S = geo.cstack_depth if curve else geo.wstack_depth
    nodes = geo.cnodes if curve else geo.wnodes
    nodes_aux = geo.cnodes_aux if curve else None
    nodes_delta = None if curve else geo.wnodes_delta
    leaf_k = WIDTH if curve else LEAF_K
    prim_lo = 14 * WIDTH if curve else 9 * LEAF_K
    iota_s = jnp.arange(S, dtype=jnp.int32)[None, :]
    iota_k = jnp.arange(leaf_k, dtype=jnp.int32)[None, :]

    def cond(state):
        return jnp.any(state[0] >= 0)

    def body(state):
        cur, sp, stack, t_best, prim_best, b0_best, b1_best = state
        live = cur >= 0
        rec = jnp.take(nodes, jnp.maximum(cur, 0), axis=0)  # (N, REC)
        is_leaf = rec[:, SLOT_KIND] > 0

        # --- leaf: test the fused primitive bundle, keep the closest ---
        if curve:
            arec = (jnp.take(nodes_aux, jnp.maximum(cur, 0), axis=0)
                    if nodes_aux is not None else None)
            h, t, b0, b1 = _curve_bundle_test(o, d, t_best, rec, arec)
        elif nodes_delta is not None and time is not None:
            drec = jnp.take(nodes_delta, jnp.maximum(cur, 0), axis=0)
            h, t, b0, b1 = _tri_bundle_test(o, d, t_best, rec, drec, time)
        else:
            h, t, b0, b1 = _tri_bundle_test(o, d, t_best, rec)
        tk = jnp.where(h, t, INF)
        t_min = jnp.min(tk, axis=1)
        kbest = jnp.argmin(tk, axis=1)
        ohk = iota_k == kbest[:, None]
        prim_rows = jax.lax.bitcast_convert_type(
            rec[:, prim_lo:prim_lo + leaf_k], jnp.int32)
        better = live & is_leaf & (t_min < t_best)
        t_best = jnp.where(better, t_min, t_best)
        prim_best = jnp.where(
            better, jnp.sum(jnp.where(ohk, prim_rows, 0), axis=1), prim_best)
        b0_best = jnp.where(
            better, jnp.sum(jnp.where(ohk, b0, 0.0), axis=1), b0_best)
        b1_best = jnp.where(
            better, jnp.sum(jnp.where(ohk, b1, 0.0), axis=1), b1_best)

        # --- interior: box tests + near-first ordering ---
        hit8, t_near = _box8_test(rec, o, inv_d, t_best)
        meta = jax.lax.bitcast_convert_type(
            rec[:, 6 * WIDTH:7 * WIDTH], jnp.int32)
        keys = [jnp.where(hit8[:, k], t_near[:, k], INF) for k in range(WIDTH)]
        vals = [meta[:, k] for k in range(WIDTH)]
        for i, j in _SORT8:
            swap = keys[i] > keys[j]
            keys[i], keys[j] = (jnp.where(swap, keys[j], keys[i]),
                                jnp.where(swap, keys[i], keys[j]))
            vals[i], vals[j] = (jnp.where(swap, vals[j], vals[i]),
                                jnp.where(swap, vals[i], vals[j]))
        n_hit = jnp.sum(hit8, axis=1).astype(jnp.int32)
        descend = live & ~is_leaf & (n_hit > 0)

        # push hit children 1..n_hit-1 far-to-near above the old top
        for k in range(1, WIDTH):
            wmask = descend & (k < n_hit)
            pos = sp + n_hit - 1 - k
            oh = (iota_s == pos[:, None]) & wmask[:, None]
            stack = jnp.where(oh, vals[k][:, None], stack)
        sp = jnp.where(descend, sp + jnp.maximum(n_hit - 1, 0), sp)

        # next node: nearest hit child, else pop, else done
        pop = live & ~descend & (sp > 0)
        sp_top = jnp.maximum(sp - 1, 0)
        top = jnp.sum(jnp.where(iota_s == sp_top[:, None], stack, 0), axis=1)
        nxt = jnp.where(descend, vals[0], jnp.where(pop, top, -1))
        # any_hit may be a static bool (whole wavefront) or a per-lane
        # (N,) mask (mixed closest+shadow wavefronts: one fused
        # traversal amortizes the gather batch + schedule fixed costs)
        if isinstance(any_hit, bool):
            if any_hit:
                nxt = jnp.where(prim_best >= 0, -1, nxt)
        else:
            nxt = jnp.where(any_hit & (prim_best >= 0), -1, nxt)
        sp = jnp.where(pop, sp - 1, sp)
        cur = jnp.where(live, nxt, cur)
        return cur, sp, stack, t_best, prim_best, b0_best, b1_best

    return cond, body


def _kd_step_fns(geo: DeviceGeometry, o, d, inv_d, any_hit: bool,
                 time=None):
    """kd-tree traversal (cond, body) closures (KdTreeAccel::Intersect,
    kdtreeaccel.cpp:410-484, vectorized over ray lanes): binary descent
    with a per-lane (node, tMin, tMax) interval stack, near child first,
    far child pushed with the clipped interval.  Leaf rows reuse the
    BVH's fused-triangle bundle test; oversized leaves walk their
    continuation chain before popping.  State (last 4 slots match the
    wide-BVH convention): (cur, sp, st_node, st_tmin, st_tmax, tmin,
    tmax, t_best, prim_best, b0_best, b1_best)."""
    from tpurt.geom.kdtree import (SLOT_ABOVE, SLOT_AXIS, SLOT_BELOW,
                                   SLOT_CONT, SLOT_SPLIT)

    nodes = geo.knodes
    nodes_delta = geo.knodes_delta
    S = geo.kstack_depth
    iota_s = jnp.arange(S, dtype=jnp.int32)[None, :]
    iota_k = jnp.arange(LEAF_K, dtype=jnp.int32)[None, :]
    prim_lo = 9 * LEAF_K

    def cond(state):
        return jnp.any(state[0] >= 0)

    def body(state):
        (cur, sp, stn, stmin, stmax, tmin, tmax,
         t_best, prim_best, b0_best, b1_best) = state
        live = cur >= 0
        rec = jnp.take(nodes, jnp.maximum(cur, 0), axis=0)
        is_leaf = rec[:, SLOT_KIND] > 0

        # --- leaf: fused triangle bundle (shared with the BVH table) ---
        if nodes_delta is not None and time is not None:
            drec = jnp.take(nodes_delta, jnp.maximum(cur, 0), axis=0)
            h, t, b0, b1 = _tri_bundle_test(o, d, t_best, rec, drec, time)
        else:
            h, t, b0, b1 = _tri_bundle_test(o, d, t_best, rec)
        tk = jnp.where(h, t, INF)
        t_min_leaf = jnp.min(tk, axis=1)
        kbest = jnp.argmin(tk, axis=1)
        ohk = iota_k == kbest[:, None]
        prim_rows = jax.lax.bitcast_convert_type(
            rec[:, prim_lo:prim_lo + LEAF_K], jnp.int32)
        better = live & is_leaf & (t_min_leaf < t_best)
        t_best = jnp.where(better, t_min_leaf, t_best)
        prim_best = jnp.where(
            better, jnp.sum(jnp.where(ohk, prim_rows, 0), axis=1), prim_best)
        b0_best = jnp.where(
            better, jnp.sum(jnp.where(ohk, b0, 0.0), axis=1), b0_best)
        b1_best = jnp.where(
            better, jnp.sum(jnp.where(ohk, b1, 0.0), axis=1), b1_best)
        cont = jax.lax.bitcast_convert_type(rec[:, SLOT_CONT], jnp.int32)

        # --- interior: split-plane interval descent ---
        split = rec[:, SLOT_SPLIT]
        axis = jax.lax.bitcast_convert_type(rec[:, SLOT_AXIS], jnp.int32)
        below = jax.lax.bitcast_convert_type(rec[:, SLOT_BELOW], jnp.int32)
        above = jax.lax.bitcast_convert_type(rec[:, SLOT_ABOVE], jnp.int32)
        oh_ax = axis[:, None] == jnp.arange(3, dtype=jnp.int32)[None, :]
        o_a = jnp.sum(jnp.where(oh_ax, o, 0.0), axis=1)
        d_a = jnp.sum(jnp.where(oh_ax, d, 0.0), axis=1)
        inv_a = jnp.sum(jnp.where(oh_ax, inv_d, 0.0), axis=1)
        tplane = (split - o_a) * inv_a
        below_first = (o_a < split) | ((o_a == split) & (d_a <= 0))
        near = jnp.where(below_first, below, above)
        far = jnp.where(below_first, above, below)
        # a popped cell past the current best can't improve: pop again
        dead = tmin > t_best
        no_far = (tplane > tmax) | (tplane <= 0)
        no_near = tplane < tmin
        nxt_int = jnp.where(no_far | ~no_near, near, far)
        push = live & ~is_leaf & ~dead & ~no_far & ~no_near

        # push the far child's (node, tplane, tmax) interval
        oh_sp = (iota_s == sp[:, None]) & push[:, None]
        stn = jnp.where(oh_sp, far[:, None], stn)
        stmin = jnp.where(oh_sp, tplane[:, None], stmin)
        stmax = jnp.where(oh_sp, tmax[:, None], stmax)
        sp_pushed = jnp.where(push, sp + 1, sp)

        # pop values (read before the sp update; pushes and pops are
        # mutually exclusive per lane)
        pop_req = live & ((is_leaf & (cont < 0)) | (~is_leaf & dead))
        can_pop = pop_req & (sp > 0)
        sp_top = jnp.maximum(sp - 1, 0)
        oh_top = iota_s == sp_top[:, None]
        top_n = jnp.sum(jnp.where(oh_top, stn, 0), axis=1)
        top_tmin = jnp.sum(jnp.where(oh_top, stmin, 0.0), axis=1)
        top_tmax = jnp.sum(jnp.where(oh_top, stmax, 0.0), axis=1)

        descend = live & ~is_leaf & ~dead
        nxt = jnp.where(descend, nxt_int,
                        jnp.where(is_leaf & (cont >= 0), cont,
                                  jnp.where(can_pop, top_n, -1)))
        tmin = jnp.where(can_pop, top_tmin, tmin)
        tmax = jnp.where(can_pop, top_tmax,
                         jnp.where(push, tplane, tmax))
        sp = jnp.where(can_pop, sp - 1, sp_pushed)
        if isinstance(any_hit, bool):
            if any_hit:
                nxt = jnp.where(prim_best >= 0, -1, nxt)
        else:
            nxt = jnp.where(any_hit & (prim_best >= 0), -1, nxt)
        cur = jnp.where(live, nxt, cur)
        return (cur, sp, stn, stmin, stmax, tmin, tmax,
                t_best, prim_best, b0_best, b1_best)

    return cond, body


def _kd_init_state(geo: DeviceGeometry, o, d, inv_d, t_max):
    """Root-bounds clip (Bounds3::IntersectP) + initial kd state."""
    n = o.shape[0]
    S = geo.kstack_depth
    t0 = (geo.kbounds[0][None, :] - o) * inv_d
    t1 = (geo.kbounds[1][None, :] - o) * inv_d
    tnear = jnp.max(jnp.minimum(t0, t1), axis=1)
    tfar = jnp.min(jnp.maximum(t0, t1), axis=1) * _BOX_T_SCALE
    tmin = jnp.maximum(tnear, 0.0)
    tmax = jnp.minimum(tfar, t_max)
    cur = jnp.where((t_max > 0) & (tmin <= tmax), 0, -1).astype(jnp.int32)
    return (cur, jnp.zeros(n, jnp.int32),
            jnp.zeros((n, S), jnp.int32), jnp.zeros((n, S), jnp.float32),
            jnp.zeros((n, S), jnp.float32), tmin, tmax,
            t_max, jnp.full(n, -1, jnp.int32),
            jnp.zeros(n, jnp.float32), jnp.zeros(n, jnp.float32))


def _spread3(x):
    """Spread the low 10 bits of x so consecutive bits land 3 apart
    (Morton interleave building block)."""
    x = (x | (x << 16)) & np.uint32(0x030000FF)
    x = (x | (x << 8)) & np.uint32(0x0300F00F)
    x = (x | (x << 4)) & np.uint32(0x030C30C3)
    x = (x | (x << 2)) & np.uint32(0x09249249)
    return x


def _coherence_key(geo: DeviceGeometry, o, d):
    """Sort key grouping rays that traverse similarly: direction octant
    (major) then Morton cell of the origin within the scene bounds.
    Coherent batches finish the lockstep phase in fewer steps and reuse
    node-record gather rows across adjacent lanes (measured on killeroo:
    8.3 Mrays/s coherent vs 2.9 shuffled at 2^17 lanes)."""
    root = geo.wnodes[0]
    lo = jnp.stack([jnp.nanmin(root[a * WIDTH:(a + 1) * WIDTH])
                    for a in range(3)])
    hi = jnp.stack([jnp.nanmax(root[(3 + a) * WIDTH:(4 + a) * WIDTH])
                    for a in range(3)])
    ext = jnp.maximum(hi - lo, 1e-6)
    q = jnp.clip((o - lo) / ext * 63.0, 0.0, 63.0).astype(jnp.uint32)
    morton = (_spread3(q[:, 0]) | (_spread3(q[:, 1]) << 1)
              | (_spread3(q[:, 2]) << 2))  # 18 bits
    octant = ((d[:, 0] < 0).astype(jnp.uint32) * 4
              + (d[:, 1] < 0).astype(jnp.uint32) * 2
              + (d[:, 2] < 0).astype(jnp.uint32))
    return ((octant << 18) | morton).astype(jnp.int32)


# Ray reordering is OFF by default: measured on the real chip (round 2,
# killeroo shuffled primaries at 2^17 lanes), sorting by this key was a
# small LOSS — closest-hit 67.2 -> 69.0 ms (0.97x), any-hit 37.9 ->
# 47.0 ms (0.81x).  The 2.9-vs-8.3 Mrays/s coherent-vs-shuffled gap is
# not recoverable by a 64-cell Morton + octant sort; sequential-pixel
# primaries share near-identical traversal SEQUENCES, which the sort
# cannot reconstruct.  Kept (reorder=True) for future A/Bs.
REORDER_MIN_LANES = 1 << 62


def _traverse_wide(geo: DeviceGeometry, o, d, t_max, any_hit,
                   time=None, reorder: bool = None, tree: str = "tri"):
    """Wide-BVH traversal over (N,) ray lanes: optional coherence sort,
    full-width lockstep steps while occupancy exceeds n/COMPACT_DIV,
    then one straggler compaction run to completion (gather surviving
    lanes into a narrow wavefront, finish, scatter back).

    any_hit: static bool for a uniform wavefront, or a per-lane (N,)
    bool mask for mixed closest+shadow wavefronts."""
    n = o.shape[0]
    if reorder is None:
        reorder = n >= REORDER_MIN_LANES
    if reorder:
        perm = jnp.argsort(_coherence_key(geo, o, d))
        o = jnp.take(o, perm, axis=0)
        d = jnp.take(d, perm, axis=0)
        t_max = jnp.take(jnp.broadcast_to(
            jnp.asarray(t_max, jnp.float32), (n,)), perm, axis=0)
        if time is not None:
            time = jnp.take(time, perm, axis=0)
        if not isinstance(any_hit, bool):
            any_hit = jnp.take(any_hit, perm, axis=0)
        t, prim, b0, b1 = _traverse_wide(geo, o, d, t_max, any_hit,
                                         time=time, reorder=False,
                                         tree=tree)
        unscatter = lambda a: jnp.zeros_like(a).at[perm].set(a)
        return unscatter(t), unscatter(prim), unscatter(b0), unscatter(b1)
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    inv_d = jnp.where(d != 0, 1.0 / d, jnp.where(d >= 0, INF, -INF))

    kd = tree == "tri" and geo.accel == "kdtree"
    if kd:
        state = _kd_init_state(geo, o, d, inv_d, t_max)
        step_fns = lambda g, oo, dd, ii, ah, tt, _tr: _kd_step_fns(
            g, oo, dd, ii, ah, tt)
    else:
        S = geo.cstack_depth if tree == "curve" else geo.wstack_depth
        cur = jnp.where(t_max > 0, 0, -1).astype(jnp.int32)
        state = (cur, jnp.zeros(n, jnp.int32), jnp.zeros((n, S), jnp.int32),
                 t_max, jnp.full(n, -1, jnp.int32),
                 jnp.zeros(n, jnp.float32), jnp.zeros(n, jnp.float32))
        step_fns = _wide_step_fns

    cond, body = step_fns(geo, o, d, inv_d, any_hit, time, tree)

    if n // COMPACT_DIV < 1024:
        # narrow wavefronts gain nothing from compaction: run to completion
        *_, t, prim, b0, b1 = jax.lax.while_loop(cond, body, state)
        return t, prim, b0, b1

    # Occupancy-driven two-phase schedule (replaces the round-2 fixed
    # phase-1 + compaction ladder; see tools/probe.py schedule).  Measured
    # in-jit on killeroo center-chunk shuffled primaries at 2^17 lanes
    # (excluding the ~27 ms tunnel dispatch): the old ladder cost 100 ms
    # (its run-to-completion tail looped an n/64-wide compact_run inside
    # an outer while -> 1328 while trips); full-width-to-completion cost
    # 73 ms (48 trips x 1.53 ms/step, gather-engine bound); this
    # schedule costs 34.6 ms with identical hits.
    #
    # phase 1: full-width lockstep while more than n/COMPACT_DIV lanes
    # are live.  A mostly-dead wavefront (late bounces, masked shadow
    # rays: t_max=0 -> cur=-1) exits immediately, so dead lanes never
    # pay full-width steps.
    lim = n // COMPACT_DIV
    state = jax.lax.while_loop(
        lambda st: jnp.sum(st[0] >= 0) > lim, body, state)

    # phase 2: ONE compaction of the <= n/COMPACT_DIV survivors, run to
    # completion at the narrow width.  Capacity cannot overflow (phase 1
    # guarantees survivors <= lim) and lanes never revive, so no outer
    # retry loop is needed.  Fill slots replay lane 0 redundantly; their
    # scatter writes back lane 0's own (identical) result.
    c = max(lim, 1024)
    (idxc,) = jnp.nonzero(state[0] >= 0, size=c, fill_value=0)
    sub_rays = tuple(jnp.take(a, idxc, axis=0) for a in (o, d, inv_d))
    sub = tuple(jnp.take(a, idxc, axis=0) for a in state)
    sub_time = (jnp.take(time, idxc, axis=0) if time is not None
                else None)
    sub_any = (any_hit if isinstance(any_hit, bool)
               else jnp.take(any_hit, idxc, axis=0))
    sub_cond, sub_body = step_fns(geo, *sub_rays, sub_any, sub_time, tree)
    sub = jax.lax.while_loop(sub_cond, sub_body, sub)
    state = tuple(a.at[idxc].set(s) for a, s in zip(state, sub))
    *_, t, prim, b0, b1 = state
    return t, prim, b0, b1


def interp_quad_transform(trs_pair, dt):
    """Interpolate a decomposed TRS endpoint pair at per-lane dt
    (AnimatedTransform::Interpolate, transform.cpp:467-500) and return
    (o2w, w2o) as (N, 4, 4) matrices.  trs_pair: (2, 16) shared rows or
    (N, 2, 16) per-lane rows of [t(3), quat wxyz(4), S(9)]; dt: (N,).
    dt follows the mesh-motion convention: the shutter time IS the
    interpolation parameter."""
    dt = jnp.clip(dt, 0.0, 1.0)
    if trs_pair.ndim == 2:
        trs_pair = jnp.broadcast_to(trs_pair,
                                    (dt.shape[0],) + trs_pair.shape)
    t0, t1 = trs_pair[:, 0, 0:3], trs_pair[:, 1, 0:3]
    q0, q1 = trs_pair[:, 0, 3:7], trs_pair[:, 1, 3:7]
    s0 = trs_pair[:, 0, 7:16].reshape(-1, 3, 3)
    s1 = trs_pair[:, 1, 7:16].reshape(-1, 3, 3)
    trans = (1 - dt)[:, None] * t0 + dt[:, None] * t1
    smat = ((1 - dt)[:, None, None] * s0 + dt[:, None, None] * s1)
    cos_t = jnp.sum(q0 * q1, axis=-1)
    q1 = jnp.where(cos_t[:, None] < 0, -q1, q1)
    cos_t = jnp.abs(cos_t)
    theta = jnp.arccos(jnp.clip(cos_t, -1.0, 1.0))
    sin_t = jnp.maximum(jnp.sin(theta), 1e-9)
    w0 = jnp.where(cos_t > 0.9995, 1 - dt, jnp.sin((1 - dt) * theta) / sin_t)
    w1 = jnp.where(cos_t > 0.9995, dt, jnp.sin(dt * theta) / sin_t)
    q = w0[:, None] * q0 + w1[:, None] * q1
    q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)
    w, x, y, z = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    r = jnp.stack([
        jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - z * w),
                   2 * (x * z + y * w)], -1),
        jnp.stack([2 * (x * y + z * w), 1 - 2 * (x * x + z * z),
                   2 * (y * z - x * w)], -1),
        jnp.stack([2 * (x * z - y * w), 2 * (y * z + x * w),
                   1 - 2 * (x * x + y * y)], -1),
    ], axis=-2)  # (N, 3, 3)
    rs = jnp.einsum("nij,njk->nik", r, smat)
    o2w = jnp.concatenate([rs, trans[:, :, None]], axis=-1)  # (N,3,4)
    # inverse: x_obj = S^-1 R^T (x - T)
    s_inv = jnp.linalg.inv(smat)
    rt = jnp.swapaxes(r, -1, -2)
    inv_rs = jnp.einsum("nij,njk->nik", s_inv, rt)
    inv_t = -jnp.einsum("nij,nj->ni", inv_rs, trans)
    w2o = jnp.concatenate([inv_rs, inv_t[:, :, None]], axis=-1)
    pad = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 0.0, 1.0]),
                           (o2w.shape[0], 1, 4))
    return (jnp.concatenate([o2w, pad], axis=1),
            jnp.concatenate([w2o, pad], axis=1))


def _quadric_pass(geo: DeviceGeometry, o, d, t, prim, b0, b1, time=None):
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
        if geo.quad_trs is not None and time is not None:
            _, w2o_t = interp_quad_transform(geo.quad_trs[qi], time)
            anim = geo.quad_animated[qi]
            w2o_l = jnp.where(anim, w2o_t,
                              jnp.broadcast_to(w2o, w2o_t.shape))
            h, tq, u, v = jax.vmap(
                lambda oo, dd, tb, ww: ray_quadric(oo, dd, tb, kind, ww,
                                                   params)
            )(o, d, t, w2o_l)
        else:
            h, tq, u, v = jax.vmap(
                lambda oo, dd, tb: ray_quadric(oo, dd, tb, kind, w2o,
                                               params)
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


def intersect_closest(geo: DeviceGeometry, o, d, t_max, time=None) -> Hit:
    """Closest-hit intersection for a wavefront of rays.
    o, d: (N, 3); t_max: scalar or (N,).  time: per-lane shutter time for
    motion-blurred scenes (ignored for static geometry)."""
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), o.shape[:1])
    t, prim, b0, b1 = _traverse_wide(geo, o, d, t_max, any_hit=False,
                                     time=time)
    if geo.n_quads:
        t, prim, b0, b1 = _quadric_pass(geo, o, d, t, prim, b0, b1,
                                        time=time)
    if geo.n_curves:
        t, prim, b0, b1 = _curve_pass(geo, o, d, t, prim, b0, b1,
                                      any_hit=False)
    return Hit(t=t, prim=jnp.where(jnp.isfinite(t), prim, -1), b0=b0, b1=b1)


def _curve_pass(geo: DeviceGeometry, o, d, t, prim, b0, b1, any_hit):
    """Second statically-gated traversal over the curve-span tree; the
    current best t doubles as the entry t_max so farther curve subtrees
    are culled.  b0/b1 for curve hits are (span-local s, width v)."""
    tc, pc, sc, vc = _traverse_wide(geo, o, d, t, any_hit, tree="curve")
    better = (pc >= 0) & (tc < t)
    return (jnp.where(better, tc, t), jnp.where(better, pc, prim),
            jnp.where(better, sc, b0), jnp.where(better, vc, b1))


def intersect_mixed(geo: DeviceGeometry, o, d, t_max, anyhit_mask,
                    time=None) -> Hit:
    """ONE traversal over a mixed wavefront: lanes with anyhit_mask=True
    terminate on the first hit (shadow semantics: prim >= 0 means
    occluded), the rest return the closest hit.  Fusing the NEE shadow
    rays with the next bounce's closest rays doubles the gather batch
    and halves the per-call schedule fixed costs (the gather engine
    amortizes with batch size: 28 ns/row at 8k lanes vs 13 ns at 2^17)."""
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), o.shape[:1])
    t, prim, b0, b1 = _traverse_wide(geo, o, d, t_max,
                                     any_hit=anyhit_mask, time=time)
    if geo.n_quads:
        t, prim, b0, b1 = _quadric_pass(geo, o, d, t, prim, b0, b1,
                                        time=time)
    if geo.n_curves:
        t, prim, b0, b1 = _curve_pass(geo, o, d, t, prim, b0, b1,
                                      any_hit=anyhit_mask)
    return Hit(t=t, prim=jnp.where(jnp.isfinite(t), prim, -1), b0=b0, b1=b1)


def intersect_any(geo: DeviceGeometry, o, d, t_max, time=None) -> jnp.ndarray:
    """Shadow-ray predicate: does anything lie along the ray before t_max?"""
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), o.shape[:1])
    occ = jnp.zeros(o.shape[:1], bool)
    if geo.n_quads:
        inf = jnp.full(o.shape[:1], np.inf, jnp.float32)
        tq, pq, _, _ = _quadric_pass(
            geo, o, d, inf, jnp.full(o.shape[:1], -1, jnp.int32),
            jnp.zeros(o.shape[:1]), jnp.zeros(o.shape[:1]), time=time)
        occ = (pq >= 0) & (tq < t_max)
        # already-occluded lanes skip the tree walk (t_max = 0)
        t_max = jnp.where(occ, 0.0, t_max)
    _, prim, _, _ = _traverse_wide(geo, o, d, t_max, any_hit=True,
                                   time=time)
    occ = occ | (prim >= 0)
    if geo.n_curves:
        t_max = jnp.where(occ, 0.0, t_max)
        _, primc, _, _ = _traverse_wide(geo, o, d, t_max, any_hit=True,
                                        tree="curve")
        occ = occ | (primc >= 0)
    return occ
