"""Surface interactions: hit records -> shading-ready SoA buffers.

Reference analog: core/interaction.{h,cpp} (SurfaceInteraction :117,
shading frame setup, SpawnRay offset) and the per-shape uv/dpdu math in
shapes/triangle.cpp:355-470 and shapes/sphere.cpp.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from tpurt.render.geometry_build import (
    CURVE_CYLINDER,
    CURVE_RIBBON,
    FLAG_HAS_NORMALS,
    FLAG_HAS_UV,
    FLAG_REVERSE_ORIENTATION,
    FLAG_XFORM_SWAPS_HANDEDNESS,
    PT_CURVE,
    PT_TRIANGLE,
)
from tpurt.render.intersect import DeviceGeometry, Hit
from tpurt.render.sampling_warps import dot, face_forward, normalize

F32_EPS = np.float32(1e-12)


class SurfaceInteraction(NamedTuple):
    """(N,) SoA surface interaction."""

    p: jnp.ndarray  # (N,3) hit point
    ng: jnp.ndarray  # (N,3) geometric normal (oriented per pbrt rules)
    ns: jnp.ndarray  # (N,3) shading normal
    uv: jnp.ndarray  # (N,2)
    wo: jnp.ndarray  # (N,3)
    material_id: jnp.ndarray  # (N,) i32
    arealight_id: jnp.ndarray  # (N,) i32
    prim: jnp.ndarray  # (N,) i32
    valid: jnp.ndarray  # (N,) bool
    # shading tangent (dpdu analog): None unless the scene carries mesh
    # tangents (curves/hair); shading then aligns frames to it
    ss: jnp.ndarray = None  # (N,3) or None
    # uv-parameterization derivatives (triangle.cpp:160-190); None unless
    # the scene needs them (bump mapping / texture filtering)
    dpdu: jnp.ndarray = None  # (N,3)
    dpdv: jnp.ndarray = None  # (N,3)
    # uv-space ray-footprint widths for MIP selection (None = top level)
    tex_wu: jnp.ndarray = None  # (N,)
    tex_wv: jnp.ndarray = None  # (N,)
    # uv-space screen-derivative vectors (du/dx, dv/dx) and (du/dy, dv/dy)
    # from TRUE camera ray differentials (interaction.cpp
    # ComputeDifferentials); present only on texture-filtering scenes —
    # imagemap lookups then use anisotropic EWA instead of trilinear
    tex_dst0: jnp.ndarray = None  # (N,2)
    tex_dst1: jnp.ndarray = None  # (N,2)
    # media interface of the hit prim (-1 = vacuum/unset), carried from
    # the fused shade row so volpath needs no extra per-prim gathers
    med_in: jnp.ndarray = None  # (N,) i32
    med_out: jnp.ndarray = None  # (N,) i32
    # per-lane spawn-offset floor: curve hits sit ON the span's axis
    # plane and carry pError = 2*hitWidth (curve.cpp:342), so spawned
    # rays must clear the tube; None for curve-free scenes
    p_eps: jnp.ndarray = None  # (N,)
    # ptex source face id (triangle.cpp faceIndices; 0 when absent)
    face_index: jnp.ndarray = None  # (N,) i32


def compute_interaction(geo: DeviceGeometry, hit: Hit, o, d,
                        tangents: bool = False,
                        dpduv: bool = False,
                        time=None) -> SurfaceInteraction:
    """Build shading data for each lane from its Hit.  Invalid lanes get
    benign values (ns=+z) and valid=False.  With tangents=True (static;
    scenes whose meshes carry shading tangents, e.g. tessellated curves)
    the interpolated per-vertex tangent is Gram-Schmidt-orthogonalized
    against ns and returned as ss."""
    import jax

    n = hit.t.shape[0]
    prim = jnp.maximum(hit.prim, 0)
    valid = hit.prim >= 0
    t = jnp.where(valid, hit.t, 1.0)
    p_ray = o + t[:, None] * d

    # ONE fused 128-byte row gather replaces the 18 small-row gathers
    # this function used to issue: the TPU gather engine is row-count
    # bound (~13-28 ns/lane/row regardless of row bytes <= 512 B), so
    # per-bounce interaction cost is now one row, not eighteen.
    rows = geo.shade_rows[prim]  # (N, 32)
    ints = jax.lax.bitcast_convert_type(rows[:, 0:7], jnp.int32)
    flags = ints[:, 0]
    ptype = ints[:, 1]
    material_id = ints[:, 2]
    arealight_id = ints[:, 3]
    med_in = ints[:, 5]
    med_out = ints[:, 6]
    is_tri = ptype == PT_TRIANGLE
    # ptex face id rides slot 31 for triangles (curves store invSin there)
    face_index = jnp.where(
        is_tri & valid,
        jax.lax.bitcast_convert_type(rows[:, 31], jnp.int32), 0)

    # --- triangle attributes (lerped to the ray time for motion blur) ---
    v0 = rows[:, 7:10]
    v1 = rows[:, 10:13]
    v2 = rows[:, 13:16]
    n0 = rows[:, 16:19]
    n1 = rows[:, 19:22]
    n2 = rows[:, 22:25]
    motion = time is not None and geo.shade_delta is not None
    if motion:
        drows = geo.shade_delta[prim]  # (N, 18)
        tt = time[:, None]
        v0 = v0 + tt * drows[:, 0:3]
        v1 = v1 + tt * drows[:, 3:6]
        v2 = v2 + tt * drows[:, 6:9]
        n0 = n0 + tt * drows[:, 9:12]
        n1 = n1 + tt * drows[:, 12:15]
        n2 = n2 + tt * drows[:, 15:18]
    b0 = hit.b0
    b1 = hit.b1
    b2 = 1.0 - b0 - b1
    p_tri = b0[:, None] * v0 + b1[:, None] * v1 + b2[:, None] * v2
    # geometric normal from the winding (triangle.cpp: dp02 x dp12)
    ng_tri = normalize(jnp.cross(v0 - v2, v1 - v2))
    has_n = (flags & FLAG_HAS_NORMALS) != 0
    ns_interp = b0[:, None] * n0 + b1[:, None] * n1 + b2[:, None] * n2
    ns_len = jnp.linalg.norm(ns_interp, axis=-1, keepdims=True)
    ns_ok = has_n & (ns_len[:, 0] > F32_EPS)
    ns_tri = jnp.where(ns_ok[:, None], ns_interp / jnp.maximum(ns_len, F32_EPS),
                       ng_tri)
    # orient ng toward ns when shading normals exist (triangle.cpp:438)
    ng_tri = jnp.where(ns_ok[:, None], face_forward(ng_tri, ns_tri), ng_tri)
    has_uv = (flags & FLAG_HAS_UV) != 0
    uv0 = rows[:, 25:27]
    uv1 = rows[:, 27:29]
    uv2 = rows[:, 29:31]
    # default uvs (0,0),(1,0),(1,1) (triangle.cpp GetUVs)
    duv0 = jnp.asarray([0.0, 0.0], jnp.float32)
    duv1 = jnp.asarray([1.0, 0.0], jnp.float32)
    duv2 = jnp.asarray([1.0, 1.0], jnp.float32)
    uv_tri = jnp.where(
        has_uv[:, None],
        b0[:, None] * uv0 + b1[:, None] * uv1 + b2[:, None] * uv2,
        b0[:, None] * duv0 + b1[:, None] * duv1 + b2[:, None] * duv2,
    )

    # --- quadric attributes (normal from object-space gradient) ---
    # w2o is the affine 3x4 top of the matrix (the reference's quadric
    # CTMs are affine; the projective row was never read here)
    w2o = rows[:, 7:19].reshape(n, 3, 4)
    params = rows[:, 19:27]
    if geo.quad_trs is not None and time is not None:
        from tpurt.render.intersect import interp_quad_transform

        qi = jnp.maximum(ints[:, 4], 0)
        _, w2o_t = interp_quad_transform(geo.quad_trs[qi], time)
        anim = geo.quad_animated[qi][:, None, None]
        w2o = jnp.where(anim, w2o_t[:, :3, :], w2o)

    def xp(m, pnt):
        x, y, z = pnt[:, 0], pnt[:, 1], pnt[:, 2]
        return jnp.stack([
            m[:, 0, 0] * x + m[:, 0, 1] * y + m[:, 0, 2] * z + m[:, 0, 3],
            m[:, 1, 0] * x + m[:, 1, 1] * y + m[:, 1, 2] * z + m[:, 1, 3],
            m[:, 2, 0] * x + m[:, 2, 1] * y + m[:, 2, 2] * z + m[:, 2, 3],
        ], axis=-1)

    def xn(m_inv, nrm):
        # normals transform by the inverse transpose: n' = n @ m_inv
        x, y, z = nrm[:, 0], nrm[:, 1], nrm[:, 2]
        return jnp.stack([
            m_inv[:, 0, 0] * x + m_inv[:, 1, 0] * y + m_inv[:, 2, 0] * z,
            m_inv[:, 0, 1] * x + m_inv[:, 1, 1] * y + m_inv[:, 2, 1] * z,
            m_inv[:, 0, 2] * x + m_inv[:, 1, 2] * y + m_inv[:, 2, 2] * z,
        ], axis=-1)

    p_obj = xp(w2o, p_ray)
    # object-space gradients per quadric type
    radius = params[:, 0]
    zmin, zmax = params[:, 1], params[:, 2]
    grad_sphere = p_obj
    grad_cyl = jnp.stack([p_obj[:, 0], p_obj[:, 1],
                          jnp.zeros_like(radius)], axis=-1)
    grad_disk = jnp.stack([jnp.zeros_like(radius), jnp.zeros_like(radius),
                           jnp.ones_like(radius)], axis=-1)
    h = jnp.maximum(zmax, F32_EPS)
    k_cone = (radius / h) ** 2
    grad_cone = jnp.stack([p_obj[:, 0], p_obj[:, 1],
                           k_cone * (h - p_obj[:, 2])], axis=-1)
    k_par = zmax / jnp.maximum(radius * radius, F32_EPS)
    grad_par = jnp.stack([2 * k_par * p_obj[:, 0], 2 * k_par * p_obj[:, 1],
                          -jnp.ones_like(radius)], axis=-1)
    # hyperboloid: grad of ah(x^2+y^2) - ch z^2 - 1
    ah_h, ch_h = params[:, 6], params[:, 7]
    grad_hyp = jnp.stack([2 * ah_h * p_obj[:, 0], 2 * ah_h * p_obj[:, 1],
                          -2 * ch_h * p_obj[:, 2]], axis=-1)
    ptype_q = ptype - 1  # 0 sphere 1 cyl 2 disk 3 cone 4 parab 5 hyperboloid
    grad = jnp.where((ptype_q == 0)[:, None], grad_sphere,
           jnp.where((ptype_q == 1)[:, None], grad_cyl,
           jnp.where((ptype_q == 2)[:, None], grad_disk,
           jnp.where((ptype_q == 3)[:, None], grad_cone,
           jnp.where((ptype_q == 4)[:, None], grad_par, grad_hyp)))))
    ng_quad = normalize(xn(w2o, grad))
    uv_quad = jnp.stack([hit.b0, hit.b1], axis=-1)

    # --- ray-traced curves (statically gated: zero cost without them) ---
    curve_vals = None
    if geo.n_curves:
        curve_vals = _curve_shading(rows, ints, hit, d)

    p = jnp.where(is_tri[:, None], p_tri, p_ray)
    ng = jnp.where(is_tri[:, None], ng_tri, ng_quad)
    ns = jnp.where(is_tri[:, None], ns_tri, ng_quad)
    uv = jnp.where(is_tri[:, None], uv_tri, uv_quad)
    p_eps = None
    if curve_vals is not None:
        is_crv = (ptype == PT_CURVE)[:, None]
        ng = jnp.where(is_crv, curve_vals["n"], ng)
        ns = jnp.where(is_crv, curve_vals["n"], ns)
        uv = jnp.where(is_crv, curve_vals["uv"], uv)
        p_eps = jnp.where(is_crv[:, 0] & valid, curve_vals["p_eps"], 0.0)

    # reverse orientation ^ transform swaps handedness flips both normals
    # (shape.h:97, interaction.cpp SurfaceInteraction ctor)
    ro = (flags & FLAG_REVERSE_ORIENTATION) != 0
    sh = (flags & FLAG_XFORM_SWAPS_HANDEDNESS) != 0
    flip = ro ^ sh
    ng = jnp.where(flip[:, None], -ng, ng)
    ns = jnp.where(flip[:, None], -ns, ns)

    wo = normalize(-d)
    safe = valid[:, None]
    up = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0], jnp.float32), ng.shape)
    ss = None
    if tangents:
        from tpurt.render.geometry_build import FLAG_HAS_TANGENTS

        from tpurt.render.sampling_warps import build_onb

        t_def, _ = build_onb(ns)
        if geo.shade_s is not None:
            has_s = (flags & FLAG_HAS_TANGENTS) != 0
            srow = geo.shade_s[prim]  # (N, 9) vi-resolved tangents
            s_interp = (b0[:, None] * srow[:, 0:3]
                        + b1[:, None] * srow[:, 3:6]
                        + b2[:, None] * srow[:, 6:9])
            # orthogonalize against the shading normal
            s_perp = s_interp - jnp.sum(s_interp * ns, axis=-1,
                                        keepdims=True) * ns
            s_len = jnp.linalg.norm(s_perp, axis=-1, keepdims=True)
            s_ok = has_s & is_tri & (s_len[:, 0] > 1e-6)
            ss = jnp.where((s_ok & valid)[:, None],
                           s_perp / jnp.maximum(s_len, F32_EPS), t_def)
        else:
            ss = t_def
        if curve_vals is not None:
            # curve lanes: fiber tangent = dpdu, orthogonalized vs ns
            ct = curve_vals["dpdu"]
            ct = ct - jnp.sum(ct * ns, axis=-1, keepdims=True) * ns
            ctl = jnp.linalg.norm(ct, axis=-1, keepdims=True)
            c_ok = (ptype == PT_CURVE) & valid & (ctl[:, 0] > 1e-9)
            ss = jnp.where(c_ok[:, None], ct / jnp.maximum(ctl, F32_EPS), ss)
    dpdu = dpdv = None
    if dpduv:
        # triangle uv-parameterization derivatives (triangle.cpp:160-190)
        duv02 = jnp.where(has_uv[:, None], uv0 - uv2, duv0 - duv2)
        duv12 = jnp.where(has_uv[:, None], uv1 - uv2, duv1 - duv2)
        dp02 = v0 - v2
        dp12 = v1 - v2
        det = duv02[:, 0] * duv12[:, 1] - duv02[:, 1] * duv12[:, 0]
        inv = 1.0 / jnp.where(jnp.abs(det) < 1e-9, 1.0, det)
        dpdu_t = (duv12[:, 1:2] * dp02 - duv02[:, 1:2] * dp12) * inv[:, None]
        dpdv_t = (-duv12[:, 0:1] * dp02 + duv02[:, 0:1] * dp12) * inv[:, None]
        from tpurt.render.sampling_warps import build_onb as _onb

        t_f, b_f = _onb(ns)
        degen = jnp.abs(det) < 1e-9
        dpdu_t = jnp.where(degen[:, None], t_f, dpdu_t)
        dpdv_t = jnp.where(degen[:, None], b_f, dpdv_t)
        # quadrics: ONB tangents scaled by the local size so bump
        # displacement-to-size ratios stay sane (sphere dpdu ~ 2 pi r)
        r_q = jnp.maximum(params[:, 0], 1e-3)
        dpdu_q = t_f * (2 * np.pi * r_q)[:, None]
        dpdv_q = b_f * (np.pi * r_q)[:, None]
        dpdu = jnp.where(is_tri[:, None], dpdu_t, dpdu_q)
        dpdv = jnp.where(is_tri[:, None], dpdv_t, dpdv_q)
        if curve_vals is not None:
            is_crv = (ptype == PT_CURVE)[:, None]
            dpdu = jnp.where(is_crv, curve_vals["dpdu"], dpdu)
            dpdv = jnp.where(is_crv, curve_vals["dpdv"], dpdv)

    return SurfaceInteraction(
        p=jnp.where(safe, p, 0.0),
        ng=jnp.where(safe, ng, up),
        ns=jnp.where(safe, ns, up),
        uv=jnp.where(safe, uv, 0.0),
        wo=wo,
        material_id=jnp.where(valid, material_id, -1),
        arealight_id=jnp.where(valid, arealight_id, -1),
        prim=hit.prim,
        valid=valid,
        med_in=jnp.where(valid, med_in, -1),
        med_out=jnp.where(valid, med_out, -1),
        p_eps=p_eps,
        face_index=face_index,
        ss=ss,
        dpdu=dpdu,
        dpdv=dpdv,
    )


def _curve_shading(rows, ints, hit, d):
    """Curve shading quantities from the fused shade row + (s, v) =
    (hit.b0, hit.b1): span-local parameter and width coordinate.

    Mirrors the tHit!=nullptr tail of Curve::recursiveIntersect
    (curve.cpp:309-369): dpdu from the Bezier derivative (rescaled from
    the stored span to the segment parameterization, same direction and
    the reference's magnitude), dpdv per curve subtype, and the
    geometric normal = normalize(cross(dpdu, dpdv)) (the reference's
    SurfaceInteraction ctor).  The ray-plane frame is rebuilt exactly as
    the leaf test builds it (curve.cpp:162-174)."""
    import jax

    n = rows.shape[0]
    s = hit.b0
    v = hit.b1
    cp = rows[:, 7:19].reshape(n, 4, 3)
    w0, w1 = rows[:, 19], rows[:, 20]
    u0, u1 = rows[:, 21], rows[:, 22]
    sub = jax.lax.bitcast_convert_type(rows[:, 23], jnp.int32)
    u_global = u0 + s * (u1 - u0)
    hw = w0 + (w1 - w0) * s

    # span Bezier derivative at s; EvalBezier degenerate fallback
    # (curve.cpp:71-77)
    ss_ = s[:, None]
    c1 = [cp[:, i] + ss_ * (cp[:, i + 1] - cp[:, i]) for i in range(3)]
    c2 = [c1[i] + ss_ * (c1[i + 1] - c1[i]) for i in range(2)]
    deriv = 3.0 * (c2[1] - c2[0])
    degen = (jnp.sum(deriv * deriv, axis=-1, keepdims=True) <= 0)
    v30 = cp[:, 3] - cp[:, 0]
    deriv = jnp.where(degen, v30, deriv)
    dpdu = deriv / jnp.maximum((u1 - u0), 1e-9)[:, None]

    # ray-plane frame (LookAt basis, curve.cpp:162-174)
    dhat = normalize(d)
    up = jnp.cross(d, v30)
    deg_up = (jnp.sum(up * up, axis=-1, keepdims=True) < 1e-18)
    pick = (jnp.abs(d[:, 0]) > jnp.abs(d[:, 1]))[:, None]
    zeros = jnp.zeros_like(d[:, 0:1])
    alt = jnp.where(pick,
                    jnp.concatenate([-d[:, 2:3], zeros, d[:, 0:1]], -1),
                    jnp.concatenate([zeros, d[:, 2:3], -d[:, 1:2]], -1))
    up = jnp.where(deg_up, alt, up)
    x_axis = normalize(jnp.cross(up, dhat))
    y_axis = jnp.cross(dhat, x_axis)

    # ribbon: slerped frame normal scales the width and sets dpdv
    # (curve.cpp:313-321, :351-352)
    n0 = rows[:, 24:27]
    n1 = rows[:, 27:30]
    ang = rows[:, 30]
    inv_sin = rows[:, 31]
    small = (ang < 1e-4)[:, None]
    s0 = jnp.where(small, (1.0 - s)[:, None],
                   jnp.sin((1.0 - s)[:, None] * ang[:, None]) * inv_sin[:, None])
    s1 = jnp.where(small, s[:, None],
                   jnp.sin(s[:, None] * ang[:, None]) * inv_sin[:, None])
    nhit = s0 * n0 + s1 * n1
    hw_rib = hw * jnp.abs(jnp.sum(nhit * dhat, axis=-1))
    dpdv_rib = normalize(jnp.cross(nhit, dpdu)) * hw_rib[:, None]

    # flat / cylinder: dpdv ⟂ dpdu in the ray plane, rotated for the
    # cylindrical appearance (curve.cpp:354-365)
    dpu_x = jnp.sum(dpdu * x_axis, axis=-1)
    dpu_y = jnp.sum(dpdu * y_axis, axis=-1)
    dpu_z = jnp.sum(dpdu * dhat, axis=-1)
    pl = jnp.maximum(jnp.sqrt(dpu_x * dpu_x + dpu_y * dpu_y), 1e-12)
    dvx = -dpu_y / pl * hw
    dvy = dpu_x / pl * hw
    dvz = jnp.zeros_like(dvx)
    # cylinder: Rodrigues rotation of (dvx,dvy,0) about the plane dpdu
    # by -theta, theta = Lerp(v, -90, 90) degrees (curve.cpp:359-363)
    theta = jnp.deg2rad(-90.0 + v * 180.0)
    phi = -theta
    al = jnp.maximum(jnp.sqrt(dpu_x ** 2 + dpu_y ** 2 + dpu_z ** 2), 1e-12)
    ax, ay, az = dpu_x / al, dpu_y / al, dpu_z / al
    cphi, sphi = jnp.cos(phi), jnp.sin(phi)
    adw = ax * dvx + ay * dvy  # a . w  (dvz = 0)
    rx = dvx * cphi + (ay * dvz - az * dvy) * sphi + ax * adw * (1 - cphi)
    ry = dvy * cphi + (az * dvx - ax * dvz) * sphi + ay * adw * (1 - cphi)
    rz = dvz * cphi + (ax * dvy - ay * dvx) * sphi + az * adw * (1 - cphi)
    is_cyl = (sub == CURVE_CYLINDER)
    pvx = jnp.where(is_cyl, rx, dvx)
    pvy = jnp.where(is_cyl, ry, dvy)
    pvz = jnp.where(is_cyl, rz, dvz)
    dpdv_fc = (pvx[:, None] * x_axis + pvy[:, None] * y_axis
               + pvz[:, None] * dhat)
    is_rib = (sub == CURVE_RIBBON)[:, None]
    dpdv = jnp.where(is_rib, dpdv_rib, dpdv_fc)
    nrm = normalize(jnp.cross(dpdu, dpdv))
    uv = jnp.stack([u_global, v], axis=-1)
    # spawn-offset magnitude: OffsetRayOrigin's d = Dot(Abs(n), pError)
    # with pError = (2*hitWidth,)*3 (interaction.h:51, curve.cpp:342);
    # ribbons use the projected width like the reference
    hw_eff = jnp.where(sub == CURVE_RIBBON, hw_rib, hw)
    p_eps = 2.0 * hw_eff * jnp.sum(jnp.abs(nrm), axis=-1)
    return {"n": nrm, "uv": uv, "dpdu": dpdu, "dpdv": dpdv, "p_eps": p_eps}


def offset_ray_origin(p, ng, w, eps_min=None):
    """Offset a spawned ray's origin along the geometric normal to escape
    self-intersection.  The reference computes exact error bounds
    (interaction.h:51 OffsetRayOrigin + EFloat); in f32 we use a
    magnitude-relative epsilon, validated by the reintersection tests.
    eps_min (N,), when given, floors the offset — curve hits sit on the
    span axis plane and need pError = 2*hitWidth (si.p_eps)."""
    scale = jnp.maximum(1.0, jnp.max(jnp.abs(p), axis=-1))
    eps = (2e-4 * scale)[:, None]
    if eps_min is not None:
        eps = jnp.maximum(eps, eps_min[:, None])
    sign = jnp.where(dot(ng, w)[:, None] >= 0, 1.0, -1.0)
    return p + sign * eps * ng
