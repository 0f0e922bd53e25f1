"""cyhair2pbrt — Cem Yuksel .hair files to pbrt curves.

Reference analog: tools/cyhair2pbrt.cpp (489 LoC): reads the binary HAIR
format (segments/points/thickness/transparency/color arrays + defaults)
and emits one pbrt "curve" shape per strand as cubic bezier segments
fitted through the polyline points.
"""

from __future__ import annotations

import argparse
import struct
import sys

HAS_SEGMENTS = 1
HAS_POINTS = 2
HAS_THICKNESS = 4
HAS_TRANSPARENCY = 8
HAS_COLOR = 16


def read_hair(path):
    with open(path, "rb") as f:
        magic = f.read(4)
        if magic != b"HAIR":
            raise ValueError(f"{path}: not a cyhair file")
        n_strands, n_points, flags, d_segments = struct.unpack("<IIII", f.read(16))
        d_thickness, d_transparency = struct.unpack("<ff", f.read(8))
        d_color = struct.unpack("<fff", f.read(12))
        f.read(88)  # info string
        segments = None
        if flags & HAS_SEGMENTS:
            segments = struct.unpack(f"<{n_strands}H", f.read(2 * n_strands))
        if not flags & HAS_POINTS:
            raise ValueError("hair file has no points")
        pts = struct.unpack(f"<{3 * n_points}f", f.read(12 * n_points))
        thickness = None
        if flags & HAS_THICKNESS:
            thickness = struct.unpack(f"<{n_points}f", f.read(4 * n_points))
    return dict(n_strands=n_strands, n_points=n_points,
                segments=segments, d_segments=d_segments,
                points=pts, thickness=thickness, d_thickness=d_thickness,
                color=d_color)


def convert(path, out, radius_scale=1.0):
    h = read_hair(path)
    pts = h["points"]
    w = out.write
    w("# converted by tpurt cyhair2pbrt\n")
    c = h["color"]
    w(f'Material "hair" "color color" [{c[0]} {c[1]} {c[2]}]\n')
    off = 0
    for s in range(h["n_strands"]):
        nseg = h["segments"][s] if h["segments"] else h["d_segments"]
        npts = nseg + 1
        strand = [pts[3 * (off + i): 3 * (off + i) + 3] for i in range(npts)]
        if h["thickness"]:
            r0 = h["thickness"][off] * radius_scale
            r1 = h["thickness"][off + npts - 1] * radius_scale
        else:
            r0 = r1 = h["d_thickness"] * radius_scale
        # polyline -> chained cubic beziers with C1-ish tangent handles
        # (the reference fits one bezier per polyline segment)
        for i in range(nseg):
            p0 = strand[i]
            p3 = strand[i + 1]
            prev = strand[i - 1] if i > 0 else p0
            nxt = strand[i + 2] if i + 2 < npts else p3
            p1 = tuple(p0[k] + (p3[k] - prev[k]) / 6.0 for k in range(3))
            p2 = tuple(p3[k] - (nxt[k] - p0[k]) / 6.0 for k in range(3))
            f0 = i / nseg
            f1 = (i + 1) / nseg
            w('Shape "curve" "string type" "cylinder" "point P" [')
            for p in (p0, p1, p2, p3):
                w(f"{p[0]} {p[1]} {p[2]} ")
            w(f'] "float width0" [{r0 + (r1 - r0) * f0}] '
              f'"float width1" [{r0 + (r1 - r0) * f1}]\n')
        off += npts
    return h["n_strands"]


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="cyhair2pbrt")
    ap.add_argument("hair")
    ap.add_argument("pbrt", nargs="?")
    ap.add_argument("--radius-scale", type=float, default=1.0)
    args = ap.parse_args(argv)
    if args.pbrt:
        with open(args.pbrt, "w") as f:
            n = convert(args.hair, f, args.radius_scale)
    else:
        n = convert(args.hair, sys.stdout, args.radius_scale)
    print(f"converted {n} strands", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
