"""Benchmark harness — prints ONE JSON line for the driver.

Metric (BASELINE.json): "Mrays/sec + RPF denoise ms/frame at 8 spp on
killeroo; MSE/SSIM parity".  The reference publishes no numbers
(BASELINE.md), so vs_baseline is measured against the north-star target:
>= 10x the *estimated* multithreaded-CPU wall-clock for render+RPF at
8 spp on killeroo-simple.  Until the C++ baseline can be built and timed
(its vendored submodules are not checked out in this snapshot),
vs_baseline reports our wall-clock ratio vs a conservative single-chip
target budget of 60 s for the full 700x700x8spp render+RPF frame.

Usage: python bench.py [--quick] [--scene PATH]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene",
                    default="/root/reference/scenes/killeroo-simple.pbrt")
    ap.add_argument("--quick", action="store_true",
                    help="crop to a small window (fast smoke benchmark)")
    ap.add_argument("--spp", type=int, default=0, help="override spp")
    ap.add_argument("--no-rpf", action="store_true")
    args = ap.parse_args()

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.expanduser(os.environ.get("TPURT_CACHE", "~/.cache/tpurt"))
        + "/jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import numpy as np

    from tpurt.scene import load_scene
    from tpurt.render.driver import build_job, render

    sd = load_scene(args.scene)
    if args.spp:
        sd.sampler_params.add("integer", "pixelsamples", [args.spp])
    crop = (0.4, 0.6, 0.4, 0.6) if args.quick else None

    # --- render pass (path) ---
    job = build_job(sd, crop_override=crop)
    spp = job.sampler.spp
    w, h = job.film.width, job.film.height
    cam_rays = w * h * spp
    # warm-up/compile on a tiny crop is skipped: measure wall-clock incl.
    # one compile, then a second timed run with the cache warm.
    t0 = time.time()
    img, job = render(sd, progress=False, crop_override=crop)
    t_first = time.time() - t0
    t0 = time.time()
    img, job = render(sd, progress=False, crop_override=crop)
    t_render = time.time() - t0

    # rays traced ~= camera rays * (avg path length); report camera Mrays/s
    # like the reference's `Integrator/Camera rays traced` stat
    mrays = cam_rays / t_render / 1e6

    result = {
        "metric": "killeroo camera Mrays/s (path, %dspp, %dx%d)" % (spp, w, h),
        "value": round(mrays, 3),
        "unit": "Mrays/s",
    }

    # --- RPF pass ---
    if not args.no_rpf:
        from tpurt.rpf.driver import render_rpf

        sd_rpf = load_scene(args.scene)
        sd_rpf.integrator_name = "rpf"
        if args.spp:
            sd_rpf.sampler_params.add("integer", "pixelsamples", [args.spp])
        # steady-state timing like the render pass: first run compiles
        # (the axon PJRT plugin does not serve the persistent compile
        # cache), second run measures — the C++ baseline's timings would
        # not include compilation either
        t0 = time.time()
        render_rpf(sd_rpf, crop_override=crop, write_feature_exrs=False)
        t_rpf_cold = time.time() - t0
        t0 = time.time()
        _img2, _job2, extras = render_rpf(
            sd_rpf, crop_override=crop, write_feature_exrs=False)
        t_total_rpf = time.time() - t0
        result["rpf_filter_ms"] = round(extras["filter_time"] * 1000.0, 1)
        result["rpf_sampling_s"] = round(extras["sampling_time"], 2)
        result["rpf_total_s"] = round(t_total_rpf, 2)
        result["rpf_compile_s"] = round(max(t_rpf_cold - t_total_rpf, 0.0), 2)

    result["render_s"] = round(t_render, 2)
    result["compile_s"] = round(max(t_first - t_render, 0.0), 2)
    # north-star budget: 60 s for ONE denoised frame (render+RPF) on one
    # chip ~= 10x a ~10 min multithreaded CPU estimate (BASELINE.md).
    # The RPF frame total (feature-capturing sampling pass + filter) IS
    # that pipeline; without --no-rpf the plain path render above is
    # reported separately as the Mrays/s metric, not double-counted.
    budget = 60.0 * (cam_rays / (700 * 700 * 8))
    total = (result.get("rpf_total_s", 0.0) if not args.no_rpf
             else t_render)
    result["vs_baseline"] = round(budget / max(total, 1e-9), 3)
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
