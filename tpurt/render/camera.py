"""Cameras: batched ray generation on device.

Reference analog: core/camera.{h,cpp} (Camera/ProjectiveCamera),
cameras/perspective.cpp (thin-lens GenerateRay :79-93), orthographic.cpp,
environment.cpp.  A camera is a NamedTuple of precomputed transforms; ray
generation maps (N,2) film points + (N,2) lens points to (N,3) origins and
directions, all elementwise (no MXU — see intersect._xform_point).

Screen-window convention: pbrt's default screen window spans [-1,1] in the
narrower image axis, scaled by aspect in the wider one (camera.h:84
ProjectiveCamera ctor).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from tpurt.geom import transform as xf
from tpurt.scene.paramset import ParamSet


def _xform_point_batch(m, p):
    # p: (N, 3); returns (N, 3); elementwise to stay off the MXU
    x, y, z = p[:, 0], p[:, 1], p[:, 2]
    w = m[3, 0] * x + m[3, 1] * y + m[3, 2] * z + m[3, 3]
    out = jnp.stack([
        m[0, 0] * x + m[0, 1] * y + m[0, 2] * z + m[0, 3],
        m[1, 0] * x + m[1, 1] * y + m[1, 2] * z + m[1, 3],
        m[2, 0] * x + m[2, 1] * y + m[2, 2] * z + m[2, 3],
    ], axis=-1)
    return out / w[:, None]


def _xform_vector_batch(m, v):
    x, y, z = v[:, 0], v[:, 1], v[:, 2]
    return jnp.stack([
        m[0, 0] * x + m[0, 1] * y + m[0, 2] * z,
        m[1, 0] * x + m[1, 1] * y + m[1, 2] * z,
        m[2, 0] * x + m[2, 1] * y + m[2, 2] * z,
    ], axis=-1)


def concentric_sample_disk(u: jnp.ndarray) -> jnp.ndarray:
    """Shirley-Chiu concentric disk warp (sampling.cpp ConcentricSampleDisk)."""
    u_off = 2.0 * u - 1.0
    ux, uy = u_off[:, 0], u_off[:, 1]
    zero = (ux == 0) & (uy == 0)
    use_x = jnp.abs(ux) > jnp.abs(uy)
    r = jnp.where(use_x, ux, uy)
    theta = jnp.where(
        use_x,
        (np.pi / 4) * (uy / jnp.where(ux == 0, 1.0, ux)),
        (np.pi / 2) - (np.pi / 4) * (ux / jnp.where(uy == 0, 1.0, uy)),
    )
    pt = jnp.stack([r * jnp.cos(theta), r * jnp.sin(theta)], axis=-1)
    return jnp.where(zero[:, None], 0.0, pt)


class Camera(NamedTuple):
    kind: str  # perspective | orthographic | environment | realistic
    camera_to_world: jnp.ndarray  # (4,4)
    raster_to_camera: jnp.ndarray  # (4,4)
    lens_radius: float
    focal_distance: float
    shutter_open: float
    shutter_close: float
    res_x: int
    res_y: int
    # realistic-camera state (cameras/realistic.cpp); lens_el is a static
    # tuple of (curvature radius, thickness, eta, aperture radius) rows so
    # the per-element trace unrolls with concrete constants under jit
    lens_el: tuple = ()
    exit_pupil: jnp.ndarray = None  # (Z,4) x0,y0,x1,y1 rear-element bounds
    rear_z: float = 0.0
    diagonal_m: float = 0.035
    simple_weighting: bool = True
    epb0_area: float = 1.0
    # animated camera-to-world (AnimatedTransform, transform.h:412):
    # decomposed endpoint pair; static cameras leave animated=False
    anim_t: jnp.ndarray = None  # (2,3) translations
    anim_q: jnp.ndarray = None  # (2,4) rotations (w,x,y,z)
    anim_s: jnp.ndarray = None  # (2,3,3) scale factors
    time0: float = 0.0
    time1: float = 1.0
    animated: bool = False
    # isotropic ray-footprint model for texture MIP selection:
    # world-space filter width at distance t ~= fp_base + t * fp_slope
    fp_base: float = 0.0
    fp_slope: float = 0.0

    def _interp_c2w(self, time):
        """Per-lane T-lerp / quaternion-slerp / S-lerp composition
        (AnimatedTransform::Interpolate, transform.cpp:467-500)."""
        dt = jnp.clip((time - self.time0)
                      / max(self.time1 - self.time0, 1e-9), 0.0, 1.0)
        trans = (1 - dt)[:, None] * self.anim_t[0] + dt[:, None] * self.anim_t[1]
        s = ((1 - dt)[:, None, None] * self.anim_s[0]
             + dt[:, None, None] * self.anim_s[1])
        q0, q1 = self.anim_q[0], self.anim_q[1]
        cos_t = jnp.sum(q0 * q1)
        q1 = jnp.where(cos_t < 0, -q1, q1)
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
        ], axis=-2)  # (N,3,3)
        return jnp.einsum("nij,njk->nik", r, s), trans

    def generate_rays(self, p_film: jnp.ndarray, p_lens: jnp.ndarray,
                      time: jnp.ndarray = None):
        """p_film: (N,2) raster-space points; p_lens: (N,2) in [0,1)^2.
        Returns (o, d, weight) with o,d (N,3) world-space; d normalized.
        Mirrors PerspectiveCamera::GenerateRay (perspective.cpp:79-93)."""
        n = p_film.shape[0]
        p_raster = jnp.concatenate(
            [p_film, jnp.zeros((n, 1), p_film.dtype)], axis=-1)
        p_cam = _xform_point_batch(self.raster_to_camera, p_raster)

        if self.kind == "perspective":
            d = p_cam / jnp.linalg.norm(p_cam, axis=-1, keepdims=True)
            o = jnp.zeros_like(d)
        elif self.kind == "orthographic":
            o = p_cam
            d = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0], p_cam.dtype),
                                 p_cam.shape)
        elif self.kind == "environment":
            # equirectangular: theta over height, phi over width
            theta = np.pi * p_film[:, 1] / self.res_y
            phi = 2 * np.pi * p_film[:, 0] / self.res_x
            d = jnp.stack([jnp.sin(theta) * jnp.cos(phi), jnp.cos(theta),
                           jnp.sin(theta) * jnp.sin(phi)], axis=-1)
            o = jnp.zeros_like(d)
        elif self.kind == "realistic":
            return self._generate_rays_realistic(p_film, p_lens)
        else:
            raise ValueError(self.kind)

        if self.lens_radius > 0 and self.kind in ("perspective", "orthographic"):
            p_disk = self.lens_radius * concentric_sample_disk(p_lens)
            ft = self.focal_distance / jnp.where(d[:, 2] == 0, 1e-9, d[:, 2])
            p_focus = o + ft[:, None] * d
            o = jnp.concatenate([p_disk, jnp.zeros((n, 1), p_disk.dtype)], -1)
            d = p_focus - o
            d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)

        if self.animated and time is not None:
            rs, trans = self._interp_c2w(time)
            o_w = jnp.einsum("nij,nj->ni", rs, o) + trans
            d_w = jnp.einsum("nij,nj->ni", rs, d)
        else:
            o_w = _xform_point_batch(self.camera_to_world, o)
            d_w = _xform_vector_batch(self.camera_to_world, d)
        d_w = d_w / jnp.linalg.norm(d_w, axis=-1, keepdims=True)
        return o_w, d_w, jnp.ones(n, p_film.dtype)

    def _generate_rays_realistic(self, p_film, p_lens):
        """RealisticCamera::GenerateRay (realistic.cpp:679-714): film point
        -> exit-pupil sample on the rear element -> element-by-element
        trace (statically unrolled); vignetted lanes get weight 0."""
        n = p_film.shape[0]
        aspect = self.res_y / self.res_x
        ext_x = float(np.sqrt(self.diagonal_m ** 2 / (1 + aspect * aspect)))
        ext_y = aspect * ext_x
        sx = p_film[:, 0] / self.res_x
        sy = p_film[:, 1] / self.res_y
        pfx = -(-ext_x / 2 + sx * ext_x)  # pFilm.x = -physical.x
        pfy = -ext_y / 2 + sy * ext_y

        # exit pupil sample (SampleExitPupil, realistic.cpp:613-633)
        r_film = jnp.sqrt(pfx * pfx + pfy * pfy)
        zones = self.exit_pupil.shape[0]
        r_idx = jnp.minimum((r_film / (self.diagonal_m / 2)
                             * zones).astype(jnp.int32), zones - 1)
        b = self.exit_pupil[r_idx]  # (N,4)
        area = jnp.maximum((b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1]), 0.0)
        lx = b[:, 0] + p_lens[:, 0] * (b[:, 2] - b[:, 0])
        ly = b[:, 1] + p_lens[:, 1] * (b[:, 3] - b[:, 1])
        sin_t = jnp.where(r_film > 0, pfy / jnp.maximum(r_film, 1e-20), 0.0)
        cos_t = jnp.where(r_film > 0, pfx / jnp.maximum(r_film, 1e-20), 1.0)
        prx = cos_t * lx - sin_t * ly
        pry = sin_t * lx + cos_t * ly

        # lens space: film at z=0, rear element at z=-rear_z
        o = jnp.stack([pfx, pfy, jnp.zeros_like(pfx)], axis=-1)
        d = jnp.stack([prx - pfx, pry - pfy,
                       jnp.full_like(pfx, -self.rear_z)], axis=-1)
        cos4 = (self.rear_z ** 2 / jnp.maximum(
            jnp.sum(d * d, axis=-1), 1e-30)) ** 2

        ok, o, d = _trace_lenses_from_film(self.lens_el, o, d)

        # lens -> camera space (flip z) -> world
        flip = jnp.asarray([1.0, 1.0, -1.0], jnp.float32)
        o_w = _xform_point_batch(self.camera_to_world, o * flip)
        d_w = _xform_vector_batch(self.camera_to_world, d * flip)
        d_w = d_w / jnp.maximum(
            jnp.linalg.norm(d_w, axis=-1, keepdims=True), 1e-30)
        if self.simple_weighting:
            w = cos4 * area / max(self.epb0_area, 1e-20)
        else:
            w = ((self.shutter_close - self.shutter_open) * cos4 * area
                 / (self.rear_z * self.rear_z))
        return o_w, d_w, jnp.where(ok, w, 0.0).astype(p_film.dtype)


def _trace_lenses_from_film(lens_el: tuple, o, d):
    """TraceLensesFromFilm (realistic.cpp:100-152) on (N,3) lens-space ray
    batches; the element loop unrolls statically (lens_el rows are python
    floats)."""
    ok = jnp.ones(o.shape[0], bool)
    element_z = 0.0
    m = len(lens_el)
    for i in range(m - 1, -1, -1):
        radius, thickness, eta, ap = lens_el[i]
        element_z -= thickness
        if radius == 0:  # aperture stop plane
            live = ok & (d[:, 2] < 0)
            t = (element_z - o[:, 2]) / jnp.where(d[:, 2] == 0, -1e-9,
                                                  d[:, 2])
            ok = live & (t >= 0)
            n = None
        else:
            z_center = element_z + radius
            oc = o - jnp.asarray([0.0, 0.0, z_center], jnp.float32)
            a = jnp.sum(d * d, axis=-1)
            bq = 2.0 * jnp.sum(d * oc, axis=-1)
            c = jnp.sum(oc * oc, axis=-1) - radius * radius
            disc = bq * bq - 4 * a * c
            has = disc >= 0
            sq = jnp.sqrt(jnp.maximum(disc, 0.0))
            q = -0.5 * (bq + jnp.where(bq < 0, -sq, sq))
            t0 = q / jnp.where(a == 0, 1e-30, a)
            t1 = c / jnp.where(q == 0, 1e-30, q)
            closer = (d[:, 2] > 0) ^ (radius < 0)
            t = jnp.where(closer, jnp.minimum(t0, t1), jnp.maximum(t0, t1))
            ok = ok & has & (t >= 0)
            p = o + t[:, None] * d
            n = p - jnp.asarray([0.0, 0.0, z_center], jnp.float32)
            n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True),
                                1e-30)
            n = jnp.where((jnp.sum(n * -d, axis=-1) < 0)[:, None], -n, n)
        p_hit = o + t[:, None] * d
        r2 = p_hit[:, 0] ** 2 + p_hit[:, 1] ** 2
        ok = ok & (r2 <= ap * ap)
        o = jnp.where(ok[:, None], p_hit, o)
        if radius != 0:
            eta_i = eta
            eta_t = (lens_el[i - 1][2]
                     if (i > 0 and lens_el[i - 1][2] != 0) else 1.0)
            dn = d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True),
                                 1e-30)
            cos_i = jnp.sum(n * -dn, axis=-1)
            eta_rel = eta_i / eta_t
            sin2_t = eta_rel * eta_rel * jnp.maximum(0.0, 1.0 - cos_i ** 2)
            r_ok = sin2_t < 1.0
            cos_tt = jnp.sqrt(jnp.maximum(0.0, 1.0 - sin2_t))
            wt = dn * eta_rel + (eta_rel * cos_i - cos_tt)[:, None] * n
            ok = ok & r_ok
            d = jnp.where(ok[:, None], wt, d)
    return ok, o, d


from tpurt.pytrees import register_static_pytree  # noqa: E402

register_static_pytree(Camera, ["camera_to_world", "raster_to_camera",
                                "exit_pupil", "anim_t", "anim_q", "anim_s"])


def _screen_window(res_x: int, res_y: int, ps: ParamSet):
    aspect = res_x / res_y
    if aspect > 1:
        default = [-aspect, aspect, -1.0, 1.0]
    else:
        default = [-1.0, 1.0, -1.0 / aspect, 1.0 / aspect]
    sw = ps.find_float_array("screenwindow")
    if sw is not None and len(sw) == 4:
        return [float(v) for v in sw]
    return default


def _raster_to_screen_to_camera(camera_to_screen: xf.Transform, sw,
                                res_x: int, res_y: int) -> np.ndarray:
    x0, x1, y0, y1 = sw
    screen_to_raster = (
        xf.scale(res_x, res_y, 1.0)
        * xf.scale(1.0 / (x1 - x0), 1.0 / (y0 - y1), 1.0)
        * xf.translate([-x0, -y1, 0.0])
    )
    raster_to_screen = screen_to_raster.inverse()
    raster_to_camera = camera_to_screen.inverse() * raster_to_screen
    return raster_to_camera.m.astype(np.float32)


def make_camera(name: str, ps: ParamSet, camera_to_world: xf.Transform,
                res_x: int, res_y: int,
                diagonal_m: float = 0.035,
                camera_to_world_end: xf.Transform = None,
                transform_times=(0.0, 1.0)) -> Camera:
    """MakeCamera dispatch (api.cpp :786-815) with reference defaults."""
    shutter_open = ps.find_one_float("shutteropen", 0.0)
    shutter_close = ps.find_one_float("shutterclose", 1.0)
    anim_t = anim_q = anim_s = None
    animated = camera_to_world_end is not None
    if animated:
        t0, q0, s0 = xf.decompose_trs(camera_to_world.m)
        t1, q1, s1 = xf.decompose_trs(camera_to_world_end.m)
        anim_t = jnp.asarray(np.stack([t0, t1]).astype(np.float32))
        anim_q = jnp.asarray(np.stack([q0, q1]).astype(np.float32))
        anim_s = jnp.asarray(np.stack([s0, s1]).astype(np.float32))
    lens_radius = ps.find_one_float("lensradius", 0.0)
    focal_distance = ps.find_one_float("focaldistance", 1e6)
    sw = _screen_window(res_x, res_y, ps)
    lens_el = ()
    exit_pupil = jnp.zeros((1, 4), jnp.float32)
    rear_z = 0.0
    simple_weighting = True
    epb0_area = 1.0

    if name == "realistic":
        import logging

        slog = logging.getLogger("tpurt.scene")
        lensfile = ps.find_one_string("lensfile", "")
        try:
            if not lensfile:
                raise ValueError('realistic camera needs "string lensfile"')
            from tpurt.render.lenses import build_lens_system

            ls = build_lens_system(
                lensfile,
                ps.find_one_float("aperturediameter", 1.0),
                ps.find_one_float("focusdistance", 10.0),
                diagonal_m)
            lens_el = tuple(tuple(float(v) for v in row)
                            for row in ls.elements)
            exit_pupil = jnp.asarray(ls.exit_pupil)
            rear_z = ls.rear_z
            b0 = ls.exit_pupil[0]
            epb0_area = float(max((b0[2] - b0[0]) * (b0[3] - b0[1]), 1e-20))
            simple_weighting = ps.find_one_bool("simpleweighting", True)
            cam_to_screen = xf.Transform()
        except (OSError, ValueError) as e:
            slog.warning("realistic camera unavailable (%s); "
                         "using perspective fov=45", e)
            cam_to_screen = xf.perspective(45.0, 1e-2, 1000.0)
            name = "perspective"
            lens_el = ()
    elif name == "perspective":
        fov = ps.find_one_float("fov", 90.0)
        half_fov = ps.find_one_float("halffov", -1.0)
        if half_fov > 0:
            fov = 2 * half_fov
        cam_to_screen = xf.perspective(fov, 1e-2, 1000.0)
    elif name == "orthographic":
        cam_to_screen = xf.orthographic(0.0, 1.0)
    elif name in ("environment",):
        cam_to_screen = xf.Transform()
    else:
        raise ValueError(f'camera "{name}" unknown')

    r2c_np = _raster_to_screen_to_camera(cam_to_screen, sw, res_x, res_y)

    def _thru(px, py):
        v = r2c_np.astype(np.float64) @ np.array([px, py, 0.0, 1.0])
        return v[:3] / (v[3] if abs(v[3]) > 1e-12 else 1.0)

    fp_base = fp_slope = 0.0
    pa = _thru(res_x / 2, res_y / 2)
    pb = _thru(res_x / 2 + 1, res_y / 2 + 1)
    if name == "perspective":
        d0 = pa / max(np.linalg.norm(pa), 1e-12)
        d1 = pb / max(np.linalg.norm(pb), 1e-12)
        fp_slope = float(np.arccos(np.clip(d0 @ d1, -1, 1)) / np.sqrt(2))
    elif name == "orthographic":
        fp_base = float(np.linalg.norm((pb - pa)[:2]) / np.sqrt(2))
    elif name == "environment":
        fp_slope = float(np.pi / res_y)

    return Camera(
        kind=name,
        camera_to_world=jnp.asarray(camera_to_world.m.astype(np.float32)),
        raster_to_camera=jnp.asarray(r2c_np),
        lens_radius=lens_radius,
        focal_distance=focal_distance,
        shutter_open=shutter_open,
        shutter_close=shutter_close,
        res_x=res_x,
        res_y=res_y,
        lens_el=lens_el,
        exit_pupil=exit_pupil,
        rear_z=rear_z,
        diagonal_m=diagonal_m,
        simple_weighting=simple_weighting,
        epb0_area=epb0_area,
        anim_t=anim_t,
        anim_q=anim_q,
        anim_s=anim_s,
        time0=float(transform_times[0]),
        time1=float(transform_times[1]),
        animated=animated,
        fp_base=fp_base,
        fp_slope=fp_slope,
    )


# ---------------------------------------------------------------------------
# camera importance (We / Pdf_We / Sample_Wi) — bidirectional transport
# Reference analog: perspective.cpp:150-239 (PerspectiveCamera::We,
# Pdf_We, Sample_Wi).  Perspective only (bdpt falls back for others).
# ---------------------------------------------------------------------------

def camera_screen_area(cam: Camera) -> jnp.ndarray:
    """Area A of the screen window on the z=1 camera plane."""
    corners = jnp.asarray([[0.0, 0.0, 0.0],
                           [float(cam.res_x), float(cam.res_y), 0.0]],
                          jnp.float32)
    pc = _xform_point_batch(cam.raster_to_camera, corners)
    pc = pc / pc[:, 2:3]
    return jnp.abs((pc[1, 0] - pc[0, 0]) * (pc[1, 1] - pc[0, 1]))


def _camera_frame(cam: Camera):
    c2w = cam.camera_to_world
    o_w = _xform_point_batch(c2w, jnp.zeros((1, 3), jnp.float32))[0]
    fwd = _xform_vector_batch(c2w, jnp.asarray([[0.0, 0.0, 1.0]],
                                               jnp.float32))[0]
    return o_w, fwd / jnp.linalg.norm(fwd)


def camera_we(cam: Camera, o: jnp.ndarray, d: jnp.ndarray):
    """Importance We(ray) and its raster point.  o, d: (N,3) world.
    Returns (we (N,), p_raster (N,2), valid (N,))."""
    w2c = jnp.linalg.inv(cam.camera_to_world)
    camera_to_raster = jnp.linalg.inv(cam.raster_to_camera)
    d_c = _xform_vector_batch(w2c, d)
    o_c = _xform_point_batch(w2c, o)
    cos_t = d_c[:, 2] / jnp.linalg.norm(d_c, axis=-1)
    focus = jnp.where(cam.lens_radius > 0, cam.focal_distance, 1.0)
    t = focus / jnp.where(cos_t == 0, 1e-9, d_c[:, 2])
    p_focus = o_c + t[:, None] * d_c
    p_raster3 = _xform_point_batch(camera_to_raster, p_focus)
    inside = ((p_raster3[:, 0] >= 0) & (p_raster3[:, 0] < cam.res_x)
              & (p_raster3[:, 1] >= 0) & (p_raster3[:, 1] < cam.res_y))
    valid = (cos_t > 0) & inside
    lens_area = (np.pi * cam.lens_radius ** 2
                 if cam.lens_radius > 0 else 1.0)
    a = camera_screen_area(cam)
    cos4 = jnp.maximum(cos_t, 1e-9) ** 4
    we = jnp.where(valid, 1.0 / (a * lens_area * cos4), 0.0)
    return we, p_raster3[:, :2], valid


def camera_pdf_we(cam: Camera, d: jnp.ndarray):
    """(pdf_pos, pdf_dir) of GenerateRay producing direction d (world)."""
    w2c = jnp.linalg.inv(cam.camera_to_world)
    d_c = _xform_vector_batch(w2c, d)
    cos_t = d_c[:, 2] / jnp.maximum(jnp.linalg.norm(d_c, axis=-1), 1e-12)
    lens_area = (np.pi * cam.lens_radius ** 2
                 if cam.lens_radius > 0 else 1.0)
    a = camera_screen_area(cam)
    pdf_dir = jnp.where(cos_t > 0,
                        1.0 / (a * jnp.maximum(cos_t, 1e-9) ** 3), 0.0)
    pdf_pos = jnp.full(d.shape[:1], 1.0 / lens_area, jnp.float32)
    return pdf_pos, pdf_dir


def camera_sample_wi(cam: Camera, ref_p: jnp.ndarray, u_lens: jnp.ndarray):
    """Sample a direction from ref_p to the camera (t=1 strategies).
    Returns (wi (N,3), pdf (N,), we (N,), p_raster (N,2), p_lens_w (N,3),
    cam_fwd (3,))."""
    o_w, fwd = _camera_frame(cam)
    if cam.lens_radius > 0:
        p_disk = cam.lens_radius * concentric_sample_disk(u_lens)
        p_lens_c = jnp.concatenate(
            [p_disk, jnp.zeros((p_disk.shape[0], 1), jnp.float32)], axis=-1)
        p_lens_w = _xform_point_batch(cam.camera_to_world, p_lens_c)
        lens_area = np.pi * cam.lens_radius ** 2
    else:
        p_lens_w = jnp.broadcast_to(o_w[None, :], ref_p.shape)
        lens_area = 1.0
    to_cam = p_lens_w - ref_p
    dist = jnp.maximum(jnp.linalg.norm(to_cam, axis=-1), 1e-9)
    wi = to_cam / dist[:, None]
    cos_lens = jnp.abs(jnp.sum(wi * fwd[None, :], axis=-1))
    pdf = (dist * dist) / jnp.maximum(cos_lens * lens_area, 1e-12)
    we, p_raster, valid = camera_we(cam, p_lens_w, -wi)
    pdf = jnp.where(valid, pdf, 0.0)
    return wi, pdf, we, p_raster, p_lens_w, fwd
