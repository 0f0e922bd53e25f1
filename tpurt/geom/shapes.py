"""Shape factories: pbrt Shape directives -> host-side geometry records.

Reference analog: src/shapes/* Create*Shape factories dispatched from
api.cpp MakeShapes (:427-534).  Triangle meshes are flattened to world
space at creation (triangle.cpp mesh ctor); quadrics keep their transform
pair and are intersected analytically on device.  Tessellating shapes
(heightfield, loopsubdiv, nurbs) become triangle meshes host-side.
"""

from __future__ import annotations

import logging
from typing import List, Optional

import numpy as np

from tpurt.geom.transform import Transform
from tpurt.scene.paramset import ParamSet
from tpurt.scene.records import QuadricRecord, TriangleMeshRecord

log = logging.getLogger("tpurt.scene")


def make_shapes(name: str, object_to_world: Transform, reverse_orientation: bool,
                params: ParamSet) -> List[object]:
    if name == "trianglemesh":
        return _create_triangle_mesh(object_to_world, params)
    if name == "plymesh":
        return _create_ply_mesh(object_to_world, params)
    if name == "heightfield":
        return _create_heightfield(object_to_world, params)
    if name == "loopsubdiv":
        return _create_loop_subdiv(object_to_world, params)
    if name in ("sphere", "cylinder", "disk", "cone", "paraboloid", "hyperboloid"):
        return _create_quadric(name, object_to_world, params)
    log.warning('shape "%s" unknown or not yet supported', name)
    return []


# -- quadrics ----------------------------------------------------------------

def _create_quadric(kind: str, o2w: Transform, ps: ParamSet) -> List[QuadricRecord]:
    if kind == "sphere":
        radius = ps.find_one_float("radius", 1.0)
        zmin = ps.find_one_float("zmin", -radius)
        zmax = ps.find_one_float("zmax", radius)
        phimax = ps.find_one_float("phimax", 360.0)
        return [QuadricRecord("sphere", o2w, radius=radius, z_min=zmin,
                              z_max=zmax, phi_max=phimax)]
    if kind == "cylinder":
        radius = ps.find_one_float("radius", 1.0)
        zmin = ps.find_one_float("zmin", -1.0)
        zmax = ps.find_one_float("zmax", 1.0)
        phimax = ps.find_one_float("phimax", 360.0)
        return [QuadricRecord("cylinder", o2w, radius=radius, z_min=zmin,
                              z_max=zmax, phi_max=phimax)]
    if kind == "disk":
        return [QuadricRecord(
            "disk", o2w,
            radius=ps.find_one_float("radius", 1.0),
            height=ps.find_one_float("height", 0.0),
            inner_radius=ps.find_one_float("innerradius", 0.0),
            phi_max=ps.find_one_float("phimax", 360.0),
        )]
    if kind == "cone":
        return [QuadricRecord(
            "cone", o2w,
            radius=ps.find_one_float("radius", 1.0),
            z_min=0.0,
            z_max=ps.find_one_float("height", 1.0),
            phi_max=ps.find_one_float("phimax", 360.0),
        )]
    if kind == "paraboloid":
        return [QuadricRecord(
            "paraboloid", o2w,
            radius=ps.find_one_float("radius", 1.0),
            z_min=ps.find_one_float("zmin", 0.0),
            z_max=ps.find_one_float("zmax", 1.0),
            phi_max=ps.find_one_float("phimax", 360.0),
        )]
    if kind == "hyperboloid":
        return [QuadricRecord(
            "hyperboloid", o2w,
            p1=ps.find_one_point3("p1", [0, 0, 0]),
            p2=ps.find_one_point3("p2", [1, 1, 1]),
            phi_max=ps.find_one_float("phimax", 360.0),
        )]
    raise AssertionError(kind)


# -- triangle meshes -----------------------------------------------------------

def _mesh_from_arrays(o2w: Transform, P, indices, N=None, UV=None, S=None
                      ) -> List[TriangleMeshRecord]:
    P = np.asarray(P, dtype=np.float64).reshape(-1, 3)
    indices = np.asarray(indices, dtype=np.int64).reshape(-1, 3)
    if indices.size and (indices.min() < 0 or indices.max() >= len(P)):
        log.error("trianglemesh has out of-bounds vertex index; discarding")
        return []
    world_P = o2w.apply_point(P)
    world_N = None
    if N is not None:
        n = o2w.apply_normal(np.asarray(N, dtype=np.float64).reshape(-1, 3))
        norm = np.linalg.norm(n, axis=-1, keepdims=True)
        world_N = n / np.where(norm > 0, norm, 1.0)
    world_S = None
    if S is not None:
        world_S = o2w.apply_vector(np.asarray(S, dtype=np.float64).reshape(-1, 3))
    uv = np.asarray(UV, dtype=np.float64).reshape(-1, 2) if UV is not None else None
    return [TriangleMeshRecord(
        vertices=world_P.astype(np.float32),
        indices=indices.astype(np.int32),
        normals=None if world_N is None else world_N.astype(np.float32),
        uvs=None if uv is None else uv.astype(np.float32),
        tangents=None if world_S is None else world_S.astype(np.float32),
    )]


def _create_triangle_mesh(o2w: Transform, ps: ParamSet) -> List[TriangleMeshRecord]:
    indices = ps.find_int_array("indices")
    P = ps.find_point3_array("P")
    if indices is None:
        log.error("vertex indices \"indices\" not provided with trianglemesh")
        return []
    if P is None:
        log.error("vertex positions \"P\" not provided with trianglemesh")
        return []
    if len(indices) % 3:
        log.error("number of vertex indices not multiple of 3; discarding")
        return []
    uv = ps.find_point2_array("uv")
    if uv is None:
        uv = ps.find_point2_array("st")
    if uv is not None and len(uv) != len(P):
        log.error("number of uvs != number of vertices; discarding uvs")
        uv = None
    N = ps.find_normal3_array("N")
    if N is not None and len(N) != len(P):
        log.error("number of normals != number of vertices; discarding normals")
        N = None
    S = ps.find_vector3_array("S")
    if S is not None and len(S) != len(P):
        S = None
    return _mesh_from_arrays(o2w, P, indices, N, uv, S)


def _create_heightfield(o2w: Transform, ps: ParamSet) -> List[TriangleMeshRecord]:
    """Grid of z values -> triangle mesh (shapes/heightfield.cpp)."""
    nu = ps.find_one_int("nu", -1)
    nv = ps.find_one_int("nv", -1)
    Pz = ps.find_float_array("Pz")
    if nu <= 0 or nv <= 0 or Pz is None or len(Pz) != nu * nv:
        log.error("heightfield requires nu, nv and nu*nv Pz values")
        return []
    u = np.arange(nu) / (nu - 1)
    v = np.arange(nv) / (nv - 1)
    uu, vv = np.meshgrid(u, v, indexing="xy")
    P = np.stack([uu.ravel(), vv.ravel(), np.asarray(Pz)], axis=-1)
    uvs = np.stack([uu.ravel(), vv.ravel()], axis=-1)
    idx = []
    for y in range(nv - 1):
        for x in range(nu - 1):
            vi = y * nu + x
            idx.append([vi, vi + 1, vi + nu + 1])
            idx.append([vi, vi + nu + 1, vi + nu])
    return _mesh_from_arrays(o2w, P, np.asarray(idx), UV=uvs)


def _create_loop_subdiv(o2w: Transform, ps: ParamSet) -> List[TriangleMeshRecord]:
    """Loop subdivision surface -> triangle mesh (shapes/loopsubdiv.cpp).
    Simplified scheme: standard Loop weights on closed meshes, crease-free;
    boundary vertices use the 1/8,3/4,1/8 boundary rule."""
    levels = ps.find_one_int("levels", ps.find_one_int("nlevels", 3))
    indices = ps.find_int_array("indices")
    P = ps.find_point3_array("P")
    if indices is None or P is None:
        log.error("loopsubdiv requires indices and P")
        return []
    V = P.copy()
    F = np.asarray(indices, dtype=np.int64).reshape(-1, 3)
    for _ in range(levels):
        V, F = _loop_subdivide_once(V, F)
    # Limit-surface normals via vertex averaging of face normals.
    fn = np.cross(V[F[:, 1]] - V[F[:, 0]], V[F[:, 2]] - V[F[:, 0]])
    vn = np.zeros_like(V)
    for k in range(3):
        np.add.at(vn, F[:, k], fn)
    ln = np.linalg.norm(vn, axis=-1, keepdims=True)
    vn = vn / np.where(ln > 0, ln, 1.0)
    return _mesh_from_arrays(o2w, V, F, N=vn)


def _loop_subdivide_once(V: np.ndarray, F: np.ndarray):
    nV = len(V)
    # Edge midpoint vertices.
    edges = {}
    edge_faces = {}
    for fi, f in enumerate(F):
        for k in range(3):
            e = (min(f[k], f[(k + 1) % 3]), max(f[k], f[(k + 1) % 3]))
            edges.setdefault(e, len(edges))
            edge_faces.setdefault(e, []).append((fi, f[(k + 2) % 3]))
    # New edge-vertex positions.
    EV = np.zeros((len(edges), 3))
    for e, ei in edges.items():
        opp = edge_faces[e]
        if len(opp) == 2:
            EV[ei] = 0.375 * (V[e[0]] + V[e[1]]) + 0.125 * (V[opp[0][1]] + V[opp[1][1]])
        else:  # boundary edge
            EV[ei] = 0.5 * (V[e[0]] + V[e[1]])
    # Even (old) vertex positions.
    from collections import defaultdict

    neighbors = defaultdict(set)
    boundary_nb = defaultdict(set)
    for e, opp in edge_faces.items():
        neighbors[e[0]].add(e[1])
        neighbors[e[1]].add(e[0])
        if len(opp) == 1:
            boundary_nb[e[0]].add(e[1])
            boundary_nb[e[1]].add(e[0])
    NV = V.copy()
    for v in range(nV):
        nb = neighbors[v]
        if not nb:
            continue
        if v in boundary_nb and boundary_nb[v]:
            b = list(boundary_nb[v])
            if len(b) >= 2:
                NV[v] = 0.75 * V[v] + 0.125 * (V[b[0]] + V[b[1]])
            continue
        n = len(nb)
        beta = (0.1875 if n == 3 else 3.0 / (8.0 * n))
        NV[v] = (1 - n * beta) * V[v] + beta * sum(V[u] for u in nb)
    # New faces: 4 per old face.
    newF = []
    for f in F:
        m = [edges[(min(f[k], f[(k + 1) % 3]), max(f[k], f[(k + 1) % 3]))] + nV
             for k in range(3)]
        newF += [[f[0], m[0], m[2]], [f[1], m[1], m[0]],
                 [f[2], m[2], m[1]], [m[0], m[1], m[2]]]
    return np.concatenate([NV, EV]), np.asarray(newF, dtype=np.int64)


# -- PLY ------------------------------------------------------------------------

def _create_ply_mesh(o2w: Transform, ps: ParamSet) -> List[TriangleMeshRecord]:
    filename = ps.find_one_filename("filename", "")
    if not filename:
        log.error("plymesh requires \"filename\"")
        return []
    try:
        P, N, UV, F = read_ply(filename)
    except (OSError, ValueError) as e:
        log.error("PLY read failed for %s: %s", filename, e)
        return []
    return _mesh_from_arrays(o2w, P, F, N=N, UV=UV)


_PLY_DTYPES = {
    "char": "i1", "int8": "i1", "uchar": "u1", "uint8": "u1",
    "short": "i2", "int16": "i2", "ushort": "u2", "uint16": "u2",
    "int": "i4", "int32": "i4", "uint": "u4", "uint32": "u4",
    "float": "f4", "float32": "f4", "double": "f8", "float64": "f8",
}


def read_ply(path: str):
    """Minimal PLY reader (ascii / binary little/big endian) for vertex
    x/y/z[/nx/ny/nz][/u/v or s/t] + face vertex_indices.  Reference analog:
    the vendored rply loader used by shapes/plymesh.cpp."""
    with open(path, "rb") as f:
        if f.readline().strip() != b"ply":
            raise ValueError("not a PLY file")
        fmt = None
        elements = []  # (name, count, [(prop_name, dtype) or ('list', idx_t, val_t, name)])
        while True:
            line = f.readline()
            if not line:
                raise ValueError("unexpected EOF in header")
            parts = line.decode("ascii", "replace").split()
            if not parts:
                continue
            if parts[0] == "comment":
                continue
            if parts[0] == "format":
                fmt = parts[1]
            elif parts[0] == "element":
                elements.append((parts[1], int(parts[2]), []))
            elif parts[0] == "property":
                if parts[1] == "list":
                    elements[-1][2].append(("list", parts[2], parts[3], parts[4]))
                else:
                    elements[-1][2].append((parts[2], parts[1]))  # (name, type)
            elif parts[0] == "end_header":
                break
        endian = {"binary_little_endian": "<", "binary_big_endian": ">"}.get(fmt)
        P = N = UV = None
        faces = []
        for name, count, props in elements:
            if name == "vertex":
                scalar_props = [(pn, pt) for pn, pt in props if pn != "list"]
                if endian:
                    dt = np.dtype([(pn, endian + _PLY_DTYPES[pt]) for pn, pt in scalar_props])
                    data = np.frombuffer(f.read(dt.itemsize * count), dtype=dt)
                else:
                    rows = [f.readline().split() for _ in range(count)]
                    data = {pn: np.array([float(r[i]) for r in rows])
                            for i, (pn, _pt) in enumerate(scalar_props)}
                def col(n):
                    try:
                        return np.asarray(data[n], dtype=np.float64)
                    except (KeyError, ValueError):
                        return None
                x, y, z = col("x"), col("y"), col("z")
                if x is None:
                    raise ValueError("PLY vertex element lacks x/y/z")
                P = np.stack([x, y, z], axis=-1)
                if col("nx") is not None:
                    N = np.stack([col("nx"), col("ny"), col("nz")], axis=-1)
                for ua, va in (("u", "v"), ("s", "t"), ("texture_u", "texture_v")):
                    if col(ua) is not None and col(va) is not None:
                        UV = np.stack([col(ua), col(va)], axis=-1)
                        break
            elif name == "face":
                list_prop = next((p for p in props if p[0] == "list"), None)
                if list_prop is None:
                    raise ValueError("PLY face element lacks a list property")
                _tag, idx_t, val_t, _pn = list_prop
                if endian:
                    idt = np.dtype(endian + _PLY_DTYPES[idx_t])
                    vdt = np.dtype(endian + _PLY_DTYPES[val_t])
                    for _ in range(count):
                        (n,) = np.frombuffer(f.read(idt.itemsize), dtype=idt)
                        vs = np.frombuffer(f.read(vdt.itemsize * int(n)), dtype=vdt)
                        for k in range(1, int(n) - 1):  # fan-triangulate
                            faces.append([vs[0], vs[k], vs[k + 1]])
                else:
                    for _ in range(count):
                        row = f.readline().split()
                        n = int(row[0])
                        vs = [int(v) for v in row[1 : 1 + n]]
                        for k in range(1, n - 1):
                            faces.append([vs[0], vs[k], vs[k + 1]])
            else:
                # skip unknown elements
                if endian:
                    scalar_props = [(pn, pt) for pn, pt in props if pn != "list"]
                    if len(scalar_props) == len(props):
                        size = sum(np.dtype(_PLY_DTYPES[pt]).itemsize for _, pt in scalar_props)
                        f.read(size * count)
                    else:
                        raise ValueError("cannot skip PLY element with list property")
                else:
                    for _ in range(count):
                        f.readline()
        if P is None:
            raise ValueError("PLY file has no vertex element")
        return P, N, UV, np.asarray(faces, dtype=np.int64)
