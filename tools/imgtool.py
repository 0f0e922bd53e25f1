"""imgtool — image utilities, including the parity metric.

Reference analog: tools/imgtool.cpp (subcommands assemble/cat/convert/
diff/info/makesky, :770-780).  ``diff`` is the reference's own parity
tool: summed absolute/squared error + MSE and an optional difference image
(imgtool.cpp:333-420, mse at :394).  Adds ``ssim`` (not in the reference;
the north-star metric names MSE/SSIM).
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tpurt.io.image import gamma_correct, read_image, write_image  # noqa: E402


def cmd_info(args) -> int:
    for f in args.files:
        img = read_image(f)
        print(f"{f}: {img.shape[1]} x {img.shape[0]}")
        print(f"  min: {img.min(axis=(0, 1))}")
        print(f"  max: {img.max(axis=(0, 1))}")
        print(f"  avg: {img.mean(axis=(0, 1))}")
        ok = np.isfinite(img)
        if not ok.all():
            print(f"  WARNING: {(~ok).sum()} non-finite values")
    return 0


def cmd_cat(args) -> int:
    img = read_image(args.file)
    h, w = img.shape[:2]
    for y in range(h):
        for x in range(w):
            r, g, b = img[y, x]
            print(f"({x}, {y}): ({r}, {g}, {b})")
    return 0


def cmd_diff(args) -> int:
    a = read_image(args.image)
    b = read_image(args.reference)
    if a.shape != b.shape:
        print(f"images differ in resolution: {a.shape} vs {b.shape}",
              file=sys.stderr)
        return 1
    d = a.astype(np.float64) - b.astype(np.float64)
    sum_abs = np.abs(d).sum()
    sum_sq = (d * d).sum()
    mse = (d * d).mean()
    # tolerance on summed relative difference like --difftol
    denom = np.abs(b).sum()
    rel = 100.0 * sum_abs / denom if denom > 0 else 0.0
    print(f"images differ:\n\tabsolute error sum: {sum_abs:.6g}\n"
          f"\tsquared error sum: {sum_sq:.6g}\n\tMSE: {mse:.6g}\n"
          f"\trelative difference: {rel:.4f}%")
    if args.ssim:
        print(f"\tSSIM: {ssim(a, b):.6f}")
    if args.outfile:
        write_image(args.outfile, np.abs(d).astype(np.float32))
    return 0 if rel <= args.difftol else 1


def ssim(a: np.ndarray, b: np.ndarray, sigma: float = 1.5) -> float:
    """Mean SSIM over channels (Wang et al. 2004), gaussian-windowed via
    separable filtering; data range from the reference image."""
    from math import ceil

    def blur(x):
        r = int(ceil(3 * sigma))
        t = np.arange(-r, r + 1)
        k = np.exp(-0.5 * (t / sigma) ** 2)
        k /= k.sum()
        out = np.apply_along_axis(
            lambda m: np.convolve(m, k, mode="same"), 0, x)
        return np.apply_along_axis(
            lambda m: np.convolve(m, k, mode="same"), 1, out)

    dr = max(float(b.max() - b.min()), 1e-6)
    c1 = (0.01 * dr) ** 2
    c2 = (0.03 * dr) ** 2
    vals = []
    for c in range(a.shape[-1]):
        x, y = a[..., c].astype(np.float64), b[..., c].astype(np.float64)
        mx, my = blur(x), blur(y)
        vx = blur(x * x) - mx * mx
        vy = blur(y * y) - my * my
        vxy = blur(x * y) - mx * my
        s = ((2 * mx * my + c1) * (2 * vxy + c2)) / (
            (mx * mx + my * my + c1) * (vx + vy + c2))
        vals.append(s.mean())
    return float(np.mean(vals))


def cmd_convert(args) -> int:
    img = read_image(args.infile)
    img = img * args.scale
    if args.tonemap:
        # simple Reinhard-style maxY tonemap (imgtool convert --tonemap)
        y = 0.212671 * img[..., 0] + 0.715160 * img[..., 1] + 0.072169 * img[..., 2]
        scale = (1 + y / (args.maxluminance ** 2)) / (1 + y)
        img = img * scale[..., None]
    if args.flipy:
        img = img[::-1]
    write_image(args.outfile, img.astype(np.float32))
    return 0


def cmd_assemble(args) -> int:
    """Assemble crop renders into one image: later files overwrite where
    they have nonzero filter weight (imgtool assemble for --cropwindow)."""
    out = None
    for f in args.files:
        img = read_image(f)
        if out is None:
            out = img.copy()
        else:
            m = (img != 0).any(axis=-1, keepdims=True)
            out = np.where(m, img, out)
    write_image(args.outfile, out)
    return 0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="imgtool")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("info")
    p.add_argument("files", nargs="+")
    p.set_defaults(fn=cmd_info)

    p = sub.add_parser("cat")
    p.add_argument("file")
    p.set_defaults(fn=cmd_cat)

    p = sub.add_parser("diff")
    p.add_argument("image")
    p.add_argument("reference")
    p.add_argument("--outfile", "-o")
    p.add_argument("--difftol", type=float, default=0.0,
                   help="percent relative-difference tolerance")
    p.add_argument("--ssim", action="store_true")
    p.set_defaults(fn=cmd_diff)

    p = sub.add_parser("convert")
    p.add_argument("infile")
    p.add_argument("outfile")
    p.add_argument("--scale", type=float, default=1.0)
    p.add_argument("--tonemap", action="store_true")
    p.add_argument("--maxluminance", type=float, default=1.0)
    p.add_argument("--bloom", action="store_true")
    p.add_argument("--bloomlevel", type=float, default=np.inf)
    p.add_argument("--flipy", action="store_true")
    p.set_defaults(fn=cmd_convert)

    p = sub.add_parser("assemble")
    p.add_argument("files", nargs="+")
    p.add_argument("--outfile", "-o", required=True)
    p.set_defaults(fn=cmd_assemble)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
