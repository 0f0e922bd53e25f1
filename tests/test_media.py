"""Participating media tests (reference analog: media/homogeneous.cpp +
integrators/volpath.cpp)."""

import numpy as np
import pytest

from tpurt.render.driver import render
from tpurt.scene import load_scene_string


def test_absorbing_fog_attenuates_beer_lambert():
    """Camera in a purely absorbing medium sees an emitter at distance 3
    attenuated by exp(-sigma_a * d).  (Absorption-only media terminate the
    medium-scatter paths with sigma_s = 0, so the surviving surface paths
    estimate Le * Tr, like the reference.)"""
    sigma_a = 0.2
    scene = f"""
    Film "image" "integer xresolution" [24] "integer yresolution" [24]
    Sampler "random" "integer pixelsamples" [64]
    Integrator "volpath" "integer maxdepth" [2]
    MakeNamedMedium "fog" "string type" "homogeneous"
      "rgb sigma_a" [{sigma_a} {sigma_a} {sigma_a}] "rgb sigma_s" [0 0 0]
    MediumInterface "" "fog"
    Camera "perspective" "float fov" [30]
    WorldBegin
    AttributeBegin
      AreaLightSource "area" "color L" [4 4 4] "bool twosided" "true"
      Translate 0 0 3
      Shape "sphere" "float radius" [1]
    AttributeEnd
    WorldEnd
    """
    img, _ = render(load_scene_string(scene), progress=False)
    assert np.isfinite(img).all()
    # pixels on the sphere: expected 4 * exp(-0.2 * 2) (sphere front at z=2)
    hot = img[..., 0][img[..., 0] > 1.0]
    want = 4.0 * np.exp(-sigma_a * 2.0)
    assert len(hot) > 30
    np.testing.assert_allclose(hot.mean(), want, rtol=0.08)


def test_volpath_without_media_matches_path():
    scene_t = """
    Film "image" "integer xresolution" [24] "integer yresolution" [24]
    Sampler "halton" "integer pixelsamples" [4]
    Integrator "{integ}" "integer maxdepth" [3]
    Camera "perspective" "float fov" [60]
    WorldBegin
    LightSource "point" "color I" [10 10 10] "point from" [0 3 4]
    Material "matte" "color Kd" [.6 .6 .6]
    Translate 0 0 4
    Shape "sphere" "float radius" [1]
    WorldEnd
    """
    img_p, _ = render(load_scene_string(scene_t.format(integ="path")),
                      progress=False)
    img_v, _ = render(load_scene_string(scene_t.format(integ="volpath")),
                      progress=False)
    np.testing.assert_allclose(img_v, img_p, atol=1e-5)


def test_scattering_fog_glows():
    """A scattering medium around a point light produces in-scattered
    radiance on camera rays that hit nothing."""
    scene = """
    Film "image" "integer xresolution" [24] "integer yresolution" [24]
    Sampler "random" "integer pixelsamples" [16]
    Integrator "volpath" "integer maxdepth" [3]
    MakeNamedMedium "fog" "string type" "homogeneous"
      "rgb sigma_a" [0.01 0.01 0.01] "rgb sigma_s" [0.3 0.3 0.3] "float g" [0]
    MediumInterface "" "fog"
    Camera "perspective" "float fov" [60]
    WorldBegin
    LightSource "point" "color I" [20 20 20] "point from" [0 0 4]
    WorldEnd
    """
    img, _ = render(load_scene_string(scene), progress=False)
    assert np.isfinite(img).all()
    # no surfaces at all: radiance comes ONLY from in-scattering
    assert img.mean() > 0.01, img.mean()


def _grid_scene_string(density, p0, p1, sig_a, sig_s, extra=""):
    nz, ny, nx = density.shape
    dens = " ".join("%g" % v for v in density.ravel())
    return f"""
    Film "image" "integer xresolution" [8] "integer yresolution" [8]
    Sampler "random" "integer pixelsamples" [1]
    Integrator "volpath" "integer maxdepth" [3]
    MakeNamedMedium "smoke" "string type" "heterogeneous"
      "integer nx" [{nx}] "integer ny" [{ny}] "integer nz" [{nz}]
      "float density" [{dens}]
      "point p0" [{p0[0]} {p0[1]} {p0[2]}] "point p1" [{p1[0]} {p1[1]} {p1[2]}]
      "rgb sigma_a" [{sig_a} {sig_a} {sig_a}]
      "rgb sigma_s" [{sig_s} {sig_s} {sig_s}]
    {extra}
    Camera "perspective" "float fov" [40]
    WorldBegin
    LightSource "point" "color I" [1 1 1] "point from" [0 5 0]
    WorldEnd
    """


def _trilerp_oracle(density_zyx, p_med):
    """Literal GridDensityMedium::Density (grid.h:74-107): trilinear with
    out-of-bounds grid samples treated as 0."""
    nz, ny, nx = density_zyx.shape
    ps = p_med * np.array([nx, ny, nz]) - 0.5
    pi = np.floor(ps).astype(int)
    d = ps - pi
    out = 0.0
    for dz in (0, 1):
        for dy in (0, 1):
            for dx in (0, 1):
                ix, iy, iz = pi[0] + dx, pi[1] + dy, pi[2] + dz
                w = ((d[0] if dx else 1 - d[0])
                     * (d[1] if dy else 1 - d[1])
                     * (d[2] if dz else 1 - d[2]))
                if 0 <= ix < nx and 0 <= iy < ny and 0 <= iz < nz:
                    out += w * density_zyx[iz, iy, ix]
    return out


def test_grid_density_matches_trilinear_oracle():
    import jax.numpy as jnp

    from tpurt.render.driver import build_job
    from tpurt.render.integrator import _grid_density_at

    rng = np.random.default_rng(7)
    density = rng.uniform(0.0, 2.0, (3, 4, 5)).astype(np.float32)
    sd = load_scene_string(_grid_scene_string(
        density, (-1, -1, 0), (1, 1, 4), 0.3, 0.2))
    scene = build_job(sd).scene
    pts = rng.uniform(-0.1, 1.1, (64, 3)).astype(np.float32)
    med = jnp.zeros(64, jnp.int32)
    got = np.asarray(_grid_density_at(scene, med, jnp.asarray(pts)))
    want = np.array([_trilerp_oracle(density, p) for p in pts])
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-6)


def test_grid_tr_matches_quadrature():
    """Ratio tracking is an unbiased estimator of exp(-∫ sigma_t·density):
    the lane-averaged Tr must converge to midpoint-rule quadrature of the
    trilinear field (GridDensityMedium::Tr, grid.cpp:44-58)."""
    import jax.numpy as jnp

    from tpurt.render.driver import build_job
    from tpurt.render.integrator import _grid_sample_medium, _grid_tr

    rng = np.random.default_rng(3)
    density = rng.uniform(0.2, 1.8, (4, 4, 4)).astype(np.float32)
    sig_a, sig_s = 0.5, 0.0
    p0, p1 = np.array([-1.0, -1.0, 0.0]), np.array([1.0, 1.0, 4.0])
    sd = load_scene_string(_grid_scene_string(density, p0, p1, sig_a, sig_s))
    scene = build_job(sd).scene

    o_w = np.array([0.15, -0.3, -1.0])
    d_w = np.array([0.05, 0.02, 1.0])
    d_w /= np.linalg.norm(d_w)
    dist = 8.0
    # quadrature in medium space (w2m is affine => same t parameter)
    ts = np.linspace(0.0, dist, 4001)
    mid = 0.5 * (ts[:-1] + ts[1:])
    tau = 0.0
    for t in mid:
        pm = (o_w + t * d_w - p0) / (p1 - p0)
        if np.all((pm >= 0) & (pm <= 1)):
            tau += _trilerp_oracle(density, pm) * (ts[1] - ts[0])
    want = np.exp(-(sig_a + sig_s) * tau)

    n = 16384
    lane = jnp.arange(n, dtype=jnp.uint32)
    med = jnp.zeros(n, jnp.int32)
    o = jnp.tile(jnp.asarray(o_w, jnp.float32), (n, 1))
    d = jnp.tile(jnp.asarray(d_w, jnp.float32), (n, 1))
    dvec = jnp.full(n, dist, jnp.float32)
    tr = np.asarray(_grid_tr(scene, med, lane, jnp.uint32(0), o, d, dvec,
                             salt=0xABCD))
    np.testing.assert_allclose(tr.mean(), want, rtol=0.05)

    # delta tracking: P(no real collision) == Tr for an absorbing medium
    scat, _t, _w = _grid_sample_medium(scene, med, lane, jnp.uint32(1), o, d,
                                       dvec, salt=0x99)
    np.testing.assert_allclose(1.0 - np.asarray(scat).mean(), want, rtol=0.05)


def test_grid_scatter_distance_distribution():
    """Delta tracking must return the FIRST real-collision distance, not
    keep advancing after it: for a uniform grid the scattered distances
    follow the truncated exponential (regression for the post-update
    done-gate bug that drifted t toward the box exit)."""
    import jax.numpy as jnp

    from tpurt.render.driver import build_job
    from tpurt.render.integrator import _grid_sample_medium

    sigma = 1.0
    density = np.ones((2, 2, 2), np.float32)
    sd = load_scene_string(_grid_scene_string(
        density, (-1, -1, 0), (1, 1, 2), sigma, 0.0))
    scene = build_job(sd).scene
    n = 40_000
    lane = jnp.arange(n, dtype=jnp.uint32)
    med = jnp.zeros(n, jnp.int32)
    o = jnp.tile(jnp.asarray([0.0, 0.0, -1.0], jnp.float32), (n, 1))
    d = jnp.tile(jnp.asarray([0.0, 0.0, 1.0], jnp.float32), (n, 1))
    scat, t, _w = _grid_sample_medium(scene, med, lane, jnp.uint32(0), o, d,
                                      jnp.full(n, 10.0, jnp.float32),
                                      salt=0x77)
    scat, t = np.asarray(scat), np.asarray(t)
    # slab spans ray t in [1, 3]; interior (away from trilinear edge
    # falloff) the collision pdf is sigma*exp(-sigma*(t-1))
    ts = t[scat] - 1.0
    inner = ts[(ts > 0.25) & (ts < 1.6)]
    assert len(inner) > 5000
    # conditional mean of Exp(1) truncated to [0.25, 1.6] is ~0.80
    np.testing.assert_allclose(inner.mean(), 0.806, atol=0.05)
    # and nothing piles up at the exit face
    assert (ts > 1.9).mean() < 0.05


def test_grid_absorbing_render_attenuates():
    """End-to-end: emitter seen through a uniform-density grid volume
    matches Beer-Lambert (the grid analog of the homogeneous fog test)."""
    sigma_a = 0.2
    density = np.ones((8, 4, 4), np.float32)
    extra = 'MediumInterface "" "smoke"'
    scene = f"""
    Film "image" "integer xresolution" [24] "integer yresolution" [24]
    Sampler "random" "integer pixelsamples" [64]
    Integrator "volpath" "integer maxdepth" [2]
    MakeNamedMedium "smoke" "string type" "heterogeneous"
      "integer nx" [4] "integer ny" [4] "integer nz" [8]
      "float density" [{" ".join("1" for _ in range(128))}]
      "point p0" [-5 -5 0] "point p1" [5 5 2]
      "rgb sigma_a" [{sigma_a} {sigma_a} {sigma_a}] "rgb sigma_s" [0 0 0]
    {extra}
    Camera "perspective" "float fov" [30]
    WorldBegin
    AttributeBegin
      AreaLightSource "area" "color L" [4 4 4] "bool twosided" "true"
      Translate 0 0 3
      Shape "sphere" "float radius" [1]
    AttributeEnd
    WorldEnd
    """
    img, _ = render(load_scene_string(scene), progress=False)
    assert np.isfinite(img).all()
    hot = img[..., 0][img[..., 0] > 1.0]
    want = 4.0 * np.exp(-sigma_a * 2.0)
    assert len(hot) > 30
    np.testing.assert_allclose(hot.mean(), want, rtol=0.12)


def test_shadow_ray_walks_interfaces():
    """A null-material smoke sphere between a lit wall and the light must
    ATTENUATE shadow rays, not occlude them (VisibilityTester::Tr walks
    boundaries, light.cpp:47-63).  Camera and light sit at the origin, so
    center pixels see the wall through the sphere twice (camera chord +
    shadow chord)."""
    sigma = 0.4
    tmpl = """
    Film "image" "integer xresolution" [21] "integer yresolution" [21]
    Sampler "random" "integer pixelsamples" [128]
    Integrator "volpath" "integer maxdepth" [6]
    MakeNamedMedium "smoke" "string type" "homogeneous"
      "rgb sigma_a" [{s} {s} {s}] "rgb sigma_s" [0 0 0]
    Camera "perspective" "float fov" [40]
    WorldBegin
    LightSource "point" "color I" [40 40 40] "point from" [0 0 0]
    {blob}
    Material "matte" "color Kd" [.6 .6 .6]
    Shape "trianglemesh" "integer indices" [0 1 2 0 2 3]
      "point P" [-3 -3 6  3 -3 6  3 3 6  -3 3 6]
    WorldEnd
    """
    blob = """
    AttributeBegin
      Material "none"
      MediumInterface "smoke" ""
      Translate 0 0 3
      Shape "sphere" "float radius" [0.6]
    AttributeEnd
    """
    img_s, _ = render(load_scene_string(tmpl.format(s=sigma, blob=blob)),
                      progress=False)
    img_0, _ = render(load_scene_string(tmpl.format(s=sigma, blob="")),
                      progress=False)
    assert np.isfinite(img_s).all()
    c = 10  # center pixel: chord = 2*0.6 through the sphere, both ways
    ratio_c = img_s[c, c, 0] / img_0[c, c, 0]
    want = np.exp(-sigma * 1.2) ** 2
    # the camera leg is a survival-indicator estimator: high variance,
    # hence the 128 spp and the loose tolerance
    np.testing.assert_allclose(ratio_c, want, atol=0.12)
    # corner rays miss the sphere entirely: unattenuated
    ratio_e = img_s[0, 0, 0] / img_0[0, 0, 0]
    np.testing.assert_allclose(ratio_e, 1.0, atol=0.05)


def test_medium_interface_crossing():
    """A null-material sphere bounding a fog volume: rays attenuate only
    inside it."""
    scene = """
    Film "image" "integer xresolution" [24] "integer yresolution" [24]
    Sampler "random" "integer pixelsamples" [32]
    Integrator "volpath" "integer maxdepth" [4]
    MakeNamedMedium "smoke" "string type" "homogeneous"
      "rgb sigma_a" [0.4 0.4 0.4] "rgb sigma_s" [0 0 0]
    Camera "perspective" "float fov" [40]
    WorldBegin
    AttributeBegin
      AreaLightSource "area" "color L" [4 4 4] "bool twosided" "true"
      Translate 0 0 6
      Shape "sphere" "float radius" [1]
    AttributeEnd
    AttributeBegin
      Material "none"
      MediumInterface "smoke" ""
      Translate 0 0 3
      Shape "sphere" "float radius" [1]
    AttributeEnd
    WorldEnd
    """
    img, _ = render(load_scene_string(scene), progress=False)
    assert np.isfinite(img).all()
    hot = img[..., 0][img[..., 0] > 0.5]
    assert len(hot) > 20
    # center rays pass through 2 units of smoke: 4*exp(-0.8) ~ 1.8;
    # the emitter is visible but dimmed below 4
    assert hot.mean() < 3.6
    assert hot.mean() > 1.0
