"""RPF render driver: sampling pass -> feature buffers -> joint bilateral
filter -> film splat.

Reference analog: custom/rpf.cpp Render (:737-805): FillSampleFilm ->
visualizeSF feature dumps -> ApplyRPFFilter per box size ({7}; the
multi-scale {55,35,17,7} schedule is available via box_sizes) -> splat all
filtered samples through the film filter -> WriteImage.
"""

from __future__ import annotations

import logging
import os
import time
from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from tpurt.render.driver import build_job, _chunk_lanes
from tpurt.render.integrator import path_radiance
from tpurt.rpf.filter import COL, SD_LEN, apply_rpf_filter

log = logging.getLogger("tpurt.rpf")

DEFAULT_BOX_SIZES = (7,)  # rpf.cpp:767 (multi-scale list commented out there)


def fill_sample_buffer(job, chunk: Optional[int] = None,
                       cached_trace=None):
    """FillSampleFilm analog: path-trace every (pixel, sample) lane with
    feature capture, assembling the (H, W, S, 19) sample buffer.

    The buffer stays DEVICE-RESIDENT: _chunk_lanes enumerates lane ids
    sequentially in exactly the buffer's pixel-major row order, so each
    traced chunk lands as one dynamic_update_slice into a donated device
    buffer.  (The previous host-side assembly shipped every chunk through
    the axon tunnel at ~15 MB/s — half the whole RPF pipeline's time.)"""
    film = job.film
    spp = job.sampler.spp
    h, w = film.height, film.width
    x0, _, y0, _ = film.crop
    cfg = job.cfg._replace(capture_features=True,
                           light_strategy="uniform")  # rpf.cpp Li passes a
    # null light distribution to UniformSampleOneLight -> uniform choice

    if chunk is None:
        from tpurt.config import get_config

        chunk = min(get_config().wavefront_size, h * w * spp)
        chunk = max(8, (chunk // 8) * 8)

    if cached_trace is not None:
        trace = cached_trace
    else:
        @partial(jax.jit, donate_argnums=(7,))
        def trace(scene, camera, smplr, px, py, sidx, start, buf):
            out = path_radiance(scene, smplr, camera, px, py, sidx, cfg,
                                crop_xy=(x0, y0),
                                texture_eval=job.texture_eval)
            f = out["features"]
            # SampleData layout (sd.h:40-59)
            rows = jnp.concatenate([
                out["p_film"],  # 0:2 (crop-space raster coords)
                out["L"],  # 2:5
                out["p_lens"],  # 5:7
                f["n0"], f["p0"], f["n1"], f["p1"],  # 7:19
            ], axis=-1)
            return jax.lax.dynamic_update_slice(buf, rows, (start, 0))

    total = h * w * spp
    n_chunks = -(-total // chunk)
    # rows beyond `total` absorb the final chunk's padding lanes
    buf = jnp.zeros((n_chunks * chunk, SD_LEN), jnp.float32)
    done = 0
    for i, (px, py, sidx, mask) in enumerate(_chunk_lanes(film, spp, chunk)):
        buf = trace(job.scene, job.camera, job.sampler,
                    jnp.asarray(px), jnp.asarray(py), jnp.asarray(sidx),
                    jnp.int32(i * chunk), buf)
        done += int(mask.sum())
        log.info("sampling pass: %d/%d", done, total)
    return buf[:total].reshape(h, w, spp, SD_LEN), trace


def visualize_sf(buffer: np.ndarray, filename: str) -> None:
    """visualizeSF analog (rpf.cpp:37-101): write the six averaged,
    max-normalized feature-buffer debug EXRs."""
    from tpurt.io.exr import write_exr_rgb

    base = os.path.splitext(filename)[0]
    mean = buffer.mean(axis=2)  # (H, W, 19)

    def norm(img):
        m = np.abs(img).max()
        return (img / m if m > 0 else img).astype(np.float32)

    def rgb2(v2):
        return np.concatenate([v2, np.zeros_like(v2[..., :1])], axis=-1)

    write_exr_rgb(base + "_I0_Normal.exr", norm(mean[..., 7:10]))
    write_exr_rgb(base + "_I1_Normal.exr", norm(mean[..., 13:16]))
    write_exr_rgb(base + "_I0_Position.exr", norm(mean[..., 10:13]))
    write_exr_rgb(base + "_I1_Position.exr", norm(mean[..., 16:19]))
    write_exr_rgb(base + "_Film_Position.exr", norm(rgb2(mean[..., 0:2])))
    write_exr_rgb(base + "_Lens_Position.exr", norm(rgb2(mean[..., 5:7])))


def splat_buffer(job, buffer: jnp.ndarray):
    """Splat (filtered) samples to the film through the reconstruction
    filter (rpf.cpp:779-794 uses FilmTile::AddSample over the full bounds).

    The buffer is PIXEL-MAJOR: sample (y, x, s) was generated inside pixel
    (y, x), so its filter stamp can only land on pixels within
    R = ceil(r + 0.5) of its own.  That turns the generic scatter-add
    (film.add_samples — measured 3.8 s of the 18.8 s RPF frame on the v5e:
    TPU scatters serialize) into (2R+1)^2 DENSE shifted adds: for each
    window offset, evaluate the filter at every sample, reduce over spp,
    and add the (H, W, 3) plane into the film at that offset.  Matches
    film.add_samples' tap-window semantics exactly (same ceil(dx-r)+i tap
    set, same bounds drops, same maxsampleluminance clamp)."""
    film = job.film
    h, w, s, _ = buffer.shape
    rx, ry = film.filter.radius
    kx = max(1, int(np.ceil(2 * rx - 1e-6)))
    ky = max(1, int(np.ceil(2 * ry - 1e-6)))
    # dx in [X-0.5, X+0.5) and taps ceil(dx-r)+i (i<kx) bound the stamp to
    # own-pixel +/- ceil(r + 0.5) columns (see bound proof in test_rpf.py)
    Rx = int(np.ceil(rx + 0.5))
    Ry = int(np.ceil(ry + 0.5))

    @jax.jit
    def splat(buf):
        dx = buf[..., 0] - 0.5  # (H, W, S) continuous raster coords
        dy = buf[..., 1] - 0.5
        L = jnp.nan_to_num(buf[..., COL], nan=0.0, posinf=0.0, neginf=0.0)
        if np.isfinite(film.max_sample_luminance):
            y = (0.212671 * L[..., 0] + 0.715160 * L[..., 1]
                 + 0.072169 * L[..., 2])
            sc = jnp.where(y > film.max_sample_luminance,
                           film.max_sample_luminance / jnp.maximum(y, 1e-20),
                           1.0)
            L = L * sc[..., None]
        finite = jnp.isfinite(dx) & jnp.isfinite(dy)
        x0 = jnp.ceil(dx - rx).astype(jnp.int32)
        y0 = jnp.ceil(dy - ry).astype(jnp.int32)
        X = jnp.arange(w, dtype=jnp.int32)[None, :, None]
        Y = jnp.arange(h, dtype=jnp.int32)[:, None, None]
        rgb = jnp.zeros((h, w, 3), jnp.float32)
        wsum = jnp.zeros((h, w), jnp.float32)
        for dj in range(-Ry, Ry + 1):
            for di in range(-Rx, Rx + 1):
                px = X + di
                py = Y + dj
                fw = film.filter.evaluate(px.astype(jnp.float32) - dx,
                                          py.astype(jnp.float32) - dy)
                intap = ((px >= x0) & (px < x0 + kx)
                         & (py >= y0) & (py < y0 + ky) & finite)
                fwm = jnp.where(intap, fw, 0.0)  # (H, W, S)
                c = jnp.sum(L * fwm[..., None], axis=2)  # (H, W, 3)
                ws = jnp.sum(fwm, axis=2)
                a0, a1 = max(0, dj), h + min(0, dj)
                b0, b1 = max(0, di), w + min(0, di)
                rgb = rgb.at[a0:a1, b0:b1].add(
                    c[a0 - dj:a1 - dj, b0 - di:b1 - di])
                wsum = wsum.at[a0:a1, b0:b1].add(
                    ws[a0 - dj:a1 - dj, b0 - di:b1 - di])
        return rgb, wsum

    rgb, wsum = splat(buffer)
    from tpurt.render.film import FilmState

    state = FilmState(rgb=rgb, weight=wsum,
                      splat=jnp.zeros((h, w, 3), jnp.float32))
    return film.to_image(state)


def render_rpf(sd, quick: bool = False, crop_override=None,
               box_sizes: Sequence[int] = DEFAULT_BOX_SIZES,
               write_feature_exrs: bool = True,
               return_buffers: bool = False):
    """The full RPF pipeline."""
    from tpurt.render.driver import _cache_job_step, _cached_job_step

    # warm-frame cache (see render.driver): repeat frames of the same
    # scene skip scene flatten + BVH build and the sampling pass's
    # jaxpr re-trace
    job, cached_trace = _cached_job_step(sd, quick, crop_override,
                                         tag="rpf")
    t0 = time.time()
    buffer, trace = fill_sample_buffer(job, cached_trace=cached_trace)
    if cached_trace is None:
        _cache_job_step(sd, quick, crop_override, job, trace, tag="rpf")
    jax.block_until_ready(buffer)
    sampling_time = time.time() - t0
    log.info("sampling pass: %.2fs", sampling_time)

    if write_feature_exrs:
        try:
            # the one host copy in the pipeline; feature dumps only
            visualize_sf(np.asarray(buffer), job.film.filename)
        except OSError as e:
            log.error("feature EXR dump failed: %s", e)

    t0 = time.time()
    buf = buffer
    for box in box_sizes:
        buf = apply_rpf_filter(buf, box)
        jax.block_until_ready(buf)
        log.info("RPF filter pass (box %d) done", box)
    filter_time = time.time() - t0
    log.info("RPF filter: %.2fs", filter_time)

    img = splat_buffer(job, buf)
    if return_buffers:
        return img, job, {"raw_buffer": np.asarray(buffer),
                          "filtered_buffer": np.asarray(buf),
                          "filter_time": filter_time,
                          "sampling_time": sampling_time}
    return img, job, {"filter_time": filter_time,
                      "sampling_time": sampling_time}
