"""pbrt-compatible command line.

Reference analog: main/pbrt.cpp:76-139 — flag parsing into Options,
pbrtInit, per-file parse+render, pbrtCleanup.
"""

from __future__ import annotations

import argparse
import logging
import sys


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        prog="tpurt",
        description="TPU-native pbrt renderer with RPF denoising "
                    "(capabilities of pbrt-v3 + Integrator \"rpf\")",
    )
    ap.add_argument("scenes", nargs="*", help=".pbrt scene files (- = stdin)")
    ap.add_argument("--outfile", "-o", help="override Film filename")
    ap.add_argument("--quick", action="store_true",
                    help="quarter resolution, 1 spp (pbrt --quick)")
    ap.add_argument("--quiet", action="store_true")
    ap.add_argument("--verbose", "-v", action="store_true")
    ap.add_argument("--cropwindow", nargs=4, type=float, metavar=("X0", "X1", "Y0", "Y1"))
    ap.add_argument("--nthreads", type=int, default=0,
                    help="accepted for pbrt CLI compatibility (parallelism "
                         "is device-wide on TPU)")
    ap.add_argument("--cpu", action="store_true", help="force the CPU backend")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--cat", action="store_true",
                    help="print the parsed scene as canonical pbrt "
                         "statements and exit (pbrt --cat)")
    ap.add_argument("--toply", action="store_true",
                    help="like --cat, but dump big triangle meshes to PLY "
                         "files (pbrt --toply)")
    ap.add_argument("--spectrum", choices=("rgb", "sampled"), default="rgb",
                    help="spectral representation: rgb (RGBSpectrum, the "
                         "reference default) or sampled (60-bin "
                         "SampledSpectrum, pbrt.h PBRT_SAMPLED_SPECTRUM)")
    ap.add_argument("--profile", metavar="DIR", default="",
                    help="write a jax.profiler device trace of the render "
                         "to DIR (view with TensorBoard / Perfetto; the "
                         "sampling-profiler analog of pbrt's "
                         "--profile/ProfilePhase, core/stats.cpp:254)")
    args = ap.parse_args(argv)

    from tpurt.config import enable_compile_cache

    enable_compile_cache()

    if args.cat or args.toply:
        import os

        from tpurt.scene.catapi import PrintingAPI
        from tpurt.scene.parser import parse_file

        for path in args.scenes:
            # PLY files land in the CWD like the reference's mesh_%05d.ply
            api = PrintingAPI(to_ply=args.toply, ply_dir=".")
            parse_file(path, api)
        return 0

    if args.cpu:
        import os

        os.environ["JAX_PLATFORMS"] = "cpu"
        os.environ["JAX_PLATFORM_NAME"] = "cpu"

    logging.basicConfig(
        level=(logging.WARNING if args.quiet
               else logging.DEBUG if args.verbose else logging.INFO),
        format="%(levelname).1s %(name)s: %(message)s",
    )
    log = logging.getLogger("tpurt")

    if not args.scenes:
        ap.print_usage()
        print("error: no scene files given", file=sys.stderr)
        return 1

    if args.spectrum != "rgb":
        from tpurt.config import set_config

        set_config(spectrum_mode=args.spectrum)

    from tpurt.scene import load_scene
    from tpurt.render.driver import render

    import contextlib

    if args.profile:
        log.info("profiling to %s", args.profile)

    for path in args.scenes:
        log.info("parsing %s", path)
        sd = load_scene(path)
        crop = args.cropwindow
        # one trace context per scene (trace contexts are not reentrant)
        prof = (jax.profiler.trace(args.profile) if args.profile
                else contextlib.nullcontext())
        with prof:
            if sd.integrator_name == "rpf":
                from tpurt.rpf.driver import render_rpf

                img, job, _extras = render_rpf(sd, quick=args.quick,
                                               crop_override=crop)
            elif sd.integrator_name == "mlt":
                from tpurt.render.mlt import render_mlt

                img, job = render_mlt(sd, quick=args.quick,
                                      crop_override=crop)
            else:
                img, job = render(sd, quick=args.quick, crop_override=crop)
        out = args.outfile or job.film.filename
        from tpurt.io.image import write_image

        write_image(out, img)
        log.info("wrote %s (%dx%d)", out, img.shape[1], img.shape[0])
        if not args.quiet:
            from tpurt.utils.stats import print_stats

            print_stats()
    return 0


if __name__ == "__main__":
    sys.exit(main())
