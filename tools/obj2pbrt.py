"""obj2pbrt — Wavefront OBJ to pbrt scene converter.

Reference analog: tools/obj2pbrt.cpp (1,594 LoC tinyobj-based converter):
parses OBJ + MTL, emits named materials and trianglemesh shapes grouped by
material, preserving normals and uvs.
"""

from __future__ import annotations

import argparse
import os
import sys
from collections import defaultdict


def parse_mtl(path):
    mats = {}
    cur = None
    try:
        f = open(path)
    except OSError:
        return mats
    with f:
        for line in f:
            parts = line.split()
            if not parts or parts[0].startswith("#"):
                continue
            if parts[0] == "newmtl":
                cur = parts[1]
                mats[cur] = {}
            elif cur is not None:
                mats[cur][parts[0].lower()] = parts[1:]
    return mats


def mtl_to_pbrt(name, m):
    """Map an MTL definition onto a pbrt material (obj2pbrt.cpp's mapping:
    illum/Kd/Ks/d -> matte/plastic/uber/translucent)."""
    kd = [float(x) for x in m.get("kd", ["0.5", "0.5", "0.5"])[:3]]
    ks = [float(x) for x in m.get("ks", ["0", "0", "0"])[:3]]
    ns = float(m.get("ns", ["10"])[0])
    d = float(m.get("d", ["1"])[0])
    rough = max(1e-3, 1.0 - min(ns, 1000.0) / 1000.0)
    out = [f'MakeNamedMaterial "{name}"']
    if d < 1:
        out.append('  "string type" "translucent"')
        out.append(f'  "rgb Kd" [{kd[0]} {kd[1]} {kd[2]}]')
        out.append(f'  "rgb transmit" [{1-d} {1-d} {1-d}]')
    elif max(ks) > 0:
        out.append('  "string type" "plastic"')
        out.append(f'  "rgb Kd" [{kd[0]} {kd[1]} {kd[2]}]')
        out.append(f'  "rgb Ks" [{ks[0]} {ks[1]} {ks[2]}]')
        out.append(f'  "float roughness" [{rough}]')
    else:
        out.append('  "string type" "matte"')
        out.append(f'  "rgb Kd" [{kd[0]} {kd[1]} {kd[2]}]')
    if "map_kd" in m:
        out.append(f'  # diffuse texture: {m["map_kd"][0]} '
                   '(bind via Texture/imagemap)')
    return "\n".join(out)


def convert(obj_path, out, default_material="matte"):
    verts, norms, uvs = [], [], []
    # per-material face lists of (v, vt, vn) index triples
    by_mat = defaultdict(list)
    cur_mat = ""
    mtl = {}

    base = os.path.dirname(os.path.abspath(obj_path))
    with open(obj_path) as f:
        for line in f:
            parts = line.split()
            if not parts or parts[0].startswith("#"):
                continue
            tag = parts[0]
            if tag == "v":
                verts.append(tuple(float(x) for x in parts[1:4]))
            elif tag == "vn":
                norms.append(tuple(float(x) for x in parts[1:4]))
            elif tag == "vt":
                uvs.append(tuple(float(x) for x in parts[1:3]))
            elif tag == "mtllib":
                mtl.update(parse_mtl(os.path.join(base, parts[1])))
            elif tag == "usemtl":
                cur_mat = parts[1]
            elif tag == "f":
                corners = []
                for c in parts[1:]:
                    sub = c.split("/")
                    vi = int(sub[0])
                    ti = int(sub[1]) if len(sub) > 1 and sub[1] else 0
                    ni = int(sub[2]) if len(sub) > 2 and sub[2] else 0
                    corners.append((vi, ti, ni))
                for k in range(1, len(corners) - 1):  # fan triangulation
                    by_mat[cur_mat].append(
                        (corners[0], corners[k], corners[k + 1]))

    def fix(i, n):
        return i - 1 if i > 0 else n + i

    w = out.write
    w("# converted by tpurt obj2pbrt\n")
    for name, m in mtl.items():
        w(mtl_to_pbrt(name, m) + "\n")
    w("\n")
    for mat, faces in by_mat.items():
        # build a compact per-group vertex set keyed by (v, vt, vn)
        remap = {}
        P, N, UV, idx = [], [], [], []
        has_n = any(c[2] for f3 in faces for c in f3)
        has_uv = any(c[1] for f3 in faces for c in f3)
        for f3 in faces:
            for c in f3:
                if c not in remap:
                    remap[c] = len(P)
                    P.append(verts[fix(c[0], len(verts))])
                    if has_uv:
                        UV.append(uvs[fix(c[1], len(uvs))] if c[1] else (0, 0))
                    if has_n:
                        N.append(norms[fix(c[2], len(norms))] if c[2]
                                 else (0, 0, 1))
                idx.append(remap[c])
        w("AttributeBegin\n")
        if mat and mat in mtl:
            w(f'NamedMaterial "{mat}"\n')
        elif mat:
            w(f'Material "{default_material}"\n')
        w('Shape "trianglemesh"\n')
        w('  "point P" [' + " ".join(f"{x} {y} {z}" for x, y, z in P) + "]\n")
        if has_n:
            w('  "normal N" [' + " ".join(f"{x} {y} {z}" for x, y, z in N) + "]\n")
        if has_uv:
            w('  "float uv" [' + " ".join(f"{u} {v}" for u, v in UV) + "]\n")
        w('  "integer indices" [' + " ".join(map(str, idx)) + "]\n")
        w("AttributeEnd\n")


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="obj2pbrt")
    ap.add_argument("obj")
    ap.add_argument("pbrt", nargs="?", help="output (stdout if omitted)")
    args = ap.parse_args(argv)
    if args.pbrt:
        with open(args.pbrt, "w") as f:
            convert(args.obj, f)
    else:
        convert(args.obj, sys.stdout)
    return 0


if __name__ == "__main__":
    sys.exit(main())
