"""Benchmark harness — prints ONE JSON line for the driver.

Metric (BASELINE.json): "Mrays/sec + RPF denoise ms/frame at 8 spp on
killeroo; MSE/SSIM parity".  vs_baseline is MEASURED against the actual
C++ reference binary, shim-built from /root/reference via refbuild/
(round 2): on this box's CPU (all cores, `--nthreads` default) the
reference renders killeroo-simple (path, halton 8spp, 700x700) in 73.0 s
and completes the sample.pbrt RPF frame (sampling + filter, NaN-guarded
harness — the stock binary crashes in its own filter) in 150.7 s.
vs_baseline = reference RPF-frame wall-clock / tpurt RPF-frame wall-clock
on one TPU chip (or render wall-clock ratio with --no-rpf).  Pixel parity
vs the same binary: killeroo MSE 2.7e-4 (relative 6.5e-8).

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
    # Measured C++ reference wall-clocks on this box (BASELINE.md, round 2;
    # refbuild/ rebuilds the binary to re-measure).  Scaled by ray count so
    # --quick/--spp runs stay comparable.
    scale = cam_rays / (700 * 700 * 8)
    if args.no_rpf:
        ref_s, total = 73.0 * scale, t_render
    else:
        ref_s, total = 150.7 * scale, result.get("rpf_total_s", 0.0)
    result["ref_cpu_s"] = round(ref_s, 2)
    result["vs_baseline"] = round(ref_s / max(total, 1e-9), 3)
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
