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


def _ssim(a, b):
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__)), "tools"))
    from imgtool import ssim

    return float(ssim(a, b))


def config3_multiscale(scene_path: str) -> dict:
    """BASELINE.json config 3: 4 spp + multi-scale RPF {55,35,17,7}
    vs a 64 spp path reference (box list: rpf.cpp:767)."""
    import numpy as np

    from tpurt.scene import load_scene
    from tpurt.render.driver import render
    from tpurt.rpf.driver import render_rpf

    sd = load_scene(scene_path)
    sd.sampler_params.add("integer", "pixelsamples", [64])
    ref64, _ = render(sd, progress=False)
    ref64 = np.asarray(ref64, np.float64)

    sd4 = load_scene(scene_path)
    sd4.integrator_name = "rpf"
    sd4.sampler_params.add("integer", "pixelsamples", [4])
    t0 = time.time()
    img, _, extras = render_rpf(sd4, box_sizes=(55, 35, 17, 7),
                                write_feature_exrs=False)
    t_frame = time.time() - t0
    img = np.asarray(img, np.float64)

    sdp = load_scene(scene_path)
    sdp.sampler_params.add("integer", "pixelsamples", [4])
    raw4, _ = render(sdp, progress=False)
    raw4 = np.asarray(raw4, np.float64)

    def mse(a, b):
        return float(((a - b) ** 2).mean())

    return {
        "rpf4_vs_64spp_mse": round(mse(img, ref64), 6),
        "rpf4_vs_64spp_ssim": round(_ssim(img, ref64), 6),
        "path4_vs_64spp_mse": round(mse(raw4, ref64), 6),
        "path4_vs_64spp_ssim": round(_ssim(raw4, ref64), 6),
        "rpf4_multiscale_frame_s": round(t_frame, 2),
    }


def config4_sampler_sweep(scene_path: str) -> dict:
    """BASELINE.json config 4: random/stratified/halton RPF feature
    parity — the feature-capturing RPF pipeline must run and denoise
    under each sampler factory (api.cpp:817-837)."""
    import numpy as np

    from tpurt.scene import load_scene
    from tpurt.rpf.driver import render_rpf

    out = {}
    for sampler in ("random", "stratified", "halton"):
        sd = load_scene(scene_path)
        sd.integrator_name = "rpf"
        sd.sampler_name = sampler
        t0 = time.time()
        img, _, extras = render_rpf(sd, write_feature_exrs=False)
        dt = time.time() - t0
        img = np.asarray(img, np.float64)
        assert np.isfinite(img).all(), f"{sampler}: non-finite RPF output"
        out[f"rpf_{sampler}_frame_s"] = round(dt, 2)
        out[f"rpf_{sampler}_mean"] = round(float(img.mean()), 5)
    return out


_TEXTURED_SCENE = """
LookAt 0 2.5 6  0 0.5 0  0 1 0
Camera "perspective" "float fov" [45]
Film "image" "integer xresolution" [700] "integer yresolution" [700]
  "string filename" "direct_textured.exr"
Sampler "halton" "integer pixelsamples" [8]
Integrator "directlighting" "integer maxdepth" [5]
WorldBegin
AttributeBegin
  AreaLightSource "area" "color L" [18 17 14]
  Translate -2 4 2
  Shape "sphere" "float radius" [0.4]
AttributeEnd
LightSource "distant" "color L" [.6 .7 .9] "point from" [3 6 4]
Texture "checks" "spectrum" "checkerboard"
  "float uscale" [16] "float vscale" [16]
  "color tex1" [.9 .9 .9] "color tex2" [.15 .2 .3]
Material "matte" "texture Kd" "checks"
Shape "trianglemesh" "point P" [-8 0 -8  8 0 -8  8 0 8  -8 0 8]
  "float uv" [0 0 1 0 1 1 0 1] "integer indices" [0 1 2 2 3 0]
Texture "grid" "spectrum" "imagemap" "string filename" "{texpng}"
Material "plastic" "texture Kd" "grid" "color Ks" [.3 .3 .3]
  "float roughness" [.02]
Translate 0 1 0
Shape "sphere" "float radius" [1]
WorldEnd
"""


def config5_direct_textured() -> dict:
    """BASELINE.json config 5: direct-lighting + textured scene render
    time (directlighting.cpp + imagemap.cpp)."""
    import tempfile

    import numpy as np

    from tpurt.scene import load_scene_string
    from tpurt.render.driver import render
    import tpurt.io as tio

    tmp = tempfile.mkdtemp(prefix="tpurt_bench5_")
    # procedural color-grid texture for the imagemap path
    yy, xx = np.mgrid[0:256, 0:256]
    tex = np.stack([(xx // 32 % 2).astype(np.float32),
                    (yy // 32 % 2).astype(np.float32),
                    ((xx + yy) // 32 % 2).astype(np.float32)], -1)
    tex = 0.2 + 0.7 * tex
    texpng = os.path.join(tmp, "grid.png")
    tio.write_image(texpng, tex)
    sd = load_scene_string(_TEXTURED_SCENE.format(texpng=texpng),
                           base_dir=tmp)
    img, _ = render(sd, progress=False)  # compile
    t0 = time.time()
    img, _ = render(sd, progress=False)
    dt = time.time() - t0
    img = np.asarray(img, np.float64)
    assert np.isfinite(img).all() and img.mean() > 0
    return {"direct_textured_render_s": round(dt, 2),
            "direct_textured_mean": round(float(img.mean()), 5)}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene",
                    default="/root/reference/scenes/killeroo-simple.pbrt")
    ap.add_argument("--quick", action="store_true",
                    help="crop to a small window (fast smoke benchmark)")
    ap.add_argument("--spp", type=int, default=0, help="override spp")
    ap.add_argument("--no-rpf", action="store_true")
    ap.add_argument("--configs", default="",
                    help="comma list from {3,4,5}: also run BASELINE.json "
                         "configs 3 (multi-scale RPF), 4 (sampler sweep), "
                         "5 (direct+textured); slower")
    ap.add_argument("--profile", metavar="DIR", default="",
                    help="after timing, re-render once under "
                         "jax.profiler.trace and write the device trace "
                         "artifact to DIR (TensorBoard/Perfetto)")
    ap.add_argument("--no-cold2", action="store_true",
                    help="skip the fresh-process compile-cache probe "
                         "(cold2_compile_s)")
    ap.add_argument("--child-cold", action="store_true",
                    help=argparse.SUPPRESS)
    args = ap.parse_args()

    if args.child_cold:
        # fresh-process probe: how much compile does a SECOND process pay
        # for the same render step with the persistent cache populated?
        from tpurt.config import enable_compile_cache

        enable_compile_cache()
        from tpurt.scene import load_scene
        from tpurt.render.driver import render

        sd = load_scene(args.scene)
        t0 = time.time()
        render(sd, progress=False)
        t_first = time.time() - t0
        t0 = time.time()
        render(sd, progress=False)
        t_second = time.time() - t0
        print(json.dumps({"cold2_first_s": round(t_first, 2),
                          "cold2_render_s": round(t_second, 2),
                          "cold2_compile_s": round(t_first - t_second, 2)}),
              flush=True)
        return 0

    # Dead-tunnel watchdog: with the axon site hook active, a dead TPU
    # tunnel makes the first device touch HANG (it does not raise).
    # Emit a diagnosable JSON line and exit instead of hanging the
    # driver's bench step forever.
    import threading

    _init_ok = threading.Event()
    _t0 = time.time()

    def _watchdog():
        limit = float(os.environ.get("TPURT_BENCH_INIT_TIMEOUT", "900"))
        if not _init_ok.wait(limit):
            print(json.dumps({
                "metric": "killeroo camera Mrays/s (path)",
                "value": 0.0, "unit": "Mrays/s",
                "error": "TPU backend unavailable (device init exceeded "
                         f"{limit:.0f}s; axon tunnel down?)"}), flush=True)
            os._exit(3)

    threading.Thread(target=_watchdog, daemon=True).start()

    import jax

    from tpurt.config import enable_compile_cache

    # shared persistent XLA cache (measured working across processes on
    # the axon tunnel: 3.5 s -> 0.5 s recompile on a toy jit); the CLI
    # uses the same directory via enable_compile_cache
    enable_compile_cache()
    jax.devices()  # force backend init under the watchdog
    _init_ok.set()

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
    # one compile, then THREE timed steady-state runs (median + spread;
    # round-4 review: a median-of-1 bench can't tell noise from
    # regression).
    t0 = time.time()
    img, job = render(sd, progress=False, crop_override=crop)
    t_first = time.time() - t0
    runs = []
    for _ in range(3):
        t0 = time.time()
        img, job = render(sd, progress=False, crop_override=crop)
        runs.append(time.time() - t0)
    t_render = sorted(runs)[1]

    if args.profile:
        # untimed third render under the profiler (tracing adds overhead,
        # so the artifact render is separate from the timed one)
        with jax.profiler.trace(args.profile):
            render(sd, progress=False, crop_override=crop)

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
        # cache), then THREE timed runs (median) — the C++ baseline's
        # timings would not include compilation either
        t0 = time.time()
        render_rpf(sd_rpf, crop_override=crop, write_feature_exrs=False)
        t_rpf_cold = time.time() - t0
        rpf_runs, filt_runs, samp_runs = [], [], []
        for _ in range(3):
            t0 = time.time()
            _img2, _job2, extras = render_rpf(
                sd_rpf, crop_override=crop, write_feature_exrs=False)
            rpf_runs.append(time.time() - t0)
            filt_runs.append(extras["filter_time"])
            samp_runs.append(extras["sampling_time"])
        t_total_rpf = sorted(rpf_runs)[1]
        result["rpf_filter_ms"] = round(sorted(filt_runs)[1] * 1000.0, 1)
        result["rpf_sampling_s"] = round(sorted(samp_runs)[1], 2)
        result["rpf_total_s"] = round(t_total_rpf, 2)
        result["rpf_total_s_runs"] = [round(t, 2) for t in rpf_runs]
        result["rpf_compile_s"] = round(max(t_rpf_cold - t_total_rpf, 0.0), 2)

    result["render_s"] = round(t_render, 2)
    result["render_s_runs"] = [round(t, 2) for t in runs]
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
    # print the headline line IMMEDIATELY so a failure in the optional
    # configs below can't lose it (the driver reads the last line)
    print(json.dumps(result), flush=True)

    if not args.no_cold2:
        # round-4 review item: does the persistent compile cache serve the
        # REAL render executable to a fresh process?  Spawn a child that
        # renders the same scene once and report its compile seconds.
        import subprocess

        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--scene", args.scene, "--child-cold"],
                capture_output=True, text=True, timeout=1200)
            last = [ln for ln in proc.stdout.splitlines()
                    if ln.startswith("{")][-1]
            result.update(json.loads(last))
        except Exception as e:
            result["cold2_error"] = f"{type(e).__name__}: {e}"[:200]
        print(json.dumps(result), flush=True)

    sample_scene = os.path.join(os.path.dirname(args.scene), "sample.pbrt")
    wanted = {c.strip() for c in args.configs.split(",") if c.strip()}
    for key, fn in (("3", lambda: config3_multiscale(sample_scene)),
                    ("4", lambda: config4_sampler_sweep(sample_scene)),
                    ("5", config5_direct_textured)):
        if key in wanted:
            try:
                result.update(fn())
            except Exception as e:  # keep the other configs running
                import traceback

                traceback.print_exc()
                result[f"config{key}_error"] = f"{type(e).__name__}: {e}"[:200]
            print(json.dumps(result), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
