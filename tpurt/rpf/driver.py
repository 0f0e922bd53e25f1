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
    filter (rpf.cpp:779-794 uses FilmTile::AddSample over the full bounds)."""
    film = job.film
    h, w, s, _ = buffer.shape
    flat = buffer.reshape(-1, SD_LEN)

    @partial(jax.jit, donate_argnums=(1,))
    def add(rows, state):
        return film.add_samples(state, rows[:, 0:2], rows[:, 2:5],
                                jnp.ones(rows.shape[0], jnp.float32))

    state = film.initial_state()
    chunk = 1 << 20
    for start in range(0, flat.shape[0], chunk):
        state = add(jnp.asarray(flat[start:start + chunk]), state)
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
