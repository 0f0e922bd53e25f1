"""Material table build: MaterialRecords -> device SoA + per-lane lobe fetch.

Reference analog: the Material::ComputeScatteringFunctions factories
(src/materials/*) that arena-allocate BxDF stacks per intersection.  Here
every distinct MaterialRecord becomes one row of an SoA parameter table;
shading gathers the row by material id and maps it onto the fixed 4-slot
lobe mixture (tpurt.render.bsdf).  Textured slots are evaluated per
material record over the hit buffer (records are static, so the texture
DAG unrolls at trace time) and blended in by material-id mask.
"""

from __future__ import annotations

import dataclasses
import logging
from typing import Dict, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from tpurt.render.bsdf import (
    FRESNEL_CONDUCTOR,
    FRESNEL_DIELECTRIC,
    FRESNEL_NOOP,
    FRESNEL_SCHLICK,
    LobeParams,
    roughness_to_alpha,
    zero_lobes,
)
from tpurt.scene.records import MaterialRecord

log = logging.getLogger("tpurt.render")

# columns of the constant-parameter table
_N_COLS = 22
(C_KD0, C_KD1, C_KD2, C_KS0, C_KS1, C_KS2, C_KR0, C_KR1, C_KR2,
 C_KT0, C_KT1, C_KT2, C_ROUGH, C_UROUGH, C_VROUGH, C_ETA, C_SIGMA,
 C_ETA30, C_ETA31, C_ETA32, C_REMAP, C_FRESNEL) = range(_N_COLS)


@dataclasses.dataclass
class MaterialTable:
    """Host-side table + the record list (for textured slots)."""

    table: np.ndarray  # (M, _N_COLS) f32 constants
    k3: np.ndarray  # (M, 3) conductor k
    kinds: np.ndarray  # (M,) int32 material kind
    records: List[Optional[MaterialRecord]]
    textured: List[Tuple[int, str]]  # (mat_index, slot) needing texture eval

    def n(self) -> int:
        return len(self.kinds)


MAT_NONE = 0
MAT_MATTE = 1
MAT_PLASTIC = 2
MAT_MIRROR = 3
MAT_GLASS = 4
MAT_METAL = 5
MAT_UBER = 6
MAT_SUBSTRATE = 7
MAT_TRANSLUCENT = 8
_KIND_CODES = {
    "matte": MAT_MATTE, "plastic": MAT_PLASTIC, "mirror": MAT_MIRROR,
    "glass": MAT_GLASS, "metal": MAT_METAL, "uber": MAT_UBER,
    "substrate": MAT_SUBSTRATE, "translucent": MAT_TRANSLUCENT,
    # not yet shaded natively; mapped to nearest supported kind
    "mix": MAT_MATTE, "fourier": MAT_MATTE, "disney": MAT_UBER,
    "subsurface": MAT_GLASS, "kdsubsurface": MAT_MATTE, "hair": MAT_MATTE,
    "metal_": MAT_METAL,
}


def _const(slot, default):
    if slot is None:
        return None
    kind, val = slot
    if kind == "constant":
        return np.asarray(val, dtype=np.float64)
    return None  # textured


def build_material_table(materials: List[Optional[MaterialRecord]]) -> MaterialTable:
    """Deduplicated list (index == material id) -> table."""
    m = len(materials)
    table = np.zeros((max(m, 1), _N_COLS), np.float32)
    k3 = np.zeros((max(m, 1), 3), np.float32)
    kinds = np.zeros(max(m, 1), np.int32)
    textured: List[Tuple[int, str]] = []

    for i, rec in enumerate(materials):
        if rec is None:
            kinds[i] = MAT_NONE
            continue
        kind = _KIND_CODES.get(rec.name)
        if kind is None:
            log.warning('material "%s" not shadeable; using matte', rec.name)
            kind = MAT_MATTE
        kinds[i] = kind
        s = rec.slots

        def put3(slot_name, cols, default):
            v = _const(s.get(slot_name), default)
            if v is None and slot_name in s:
                textured.append((i, slot_name))
                v = np.asarray(default, dtype=np.float64)
            elif v is None:
                v = np.asarray(default, dtype=np.float64)
            v = np.asarray(v, dtype=np.float64) * np.ones(3)
            for k, c in enumerate(cols):
                table[i, c] = v[k]

        def put1(slot_name, col, default):
            v = _const(s.get(slot_name), default)
            if v is None and slot_name in s:
                textured.append((i, slot_name))
                v = default
            elif v is None:
                v = default
            table[i, col] = float(np.asarray(v).reshape(-1)[0])

        put3("Kd", (C_KD0, C_KD1, C_KD2), 0.0)
        put3("Ks", (C_KS0, C_KS1, C_KS2), 0.0)
        put3("Kr", (C_KR0, C_KR1, C_KR2), 0.0)
        put3("Kt", (C_KT0, C_KT1, C_KT2), 0.0)
        put1("roughness", C_ROUGH, 0.1)
        put1("uroughness", C_UROUGH, -1.0)
        put1("vroughness", C_VROUGH, -1.0)
        put1("sigma", C_SIGMA, 0.0)
        put1("eta", C_ETA, 1.5)
        table[i, C_REMAP] = float(_const(s.get("remaproughness"), True) in (True, 1.0))

        if kind == MAT_METAL:
            eta3 = _const(s.get("eta"), None)
            kk = _const(s.get("k"), None)
            from tpurt.render.materials import COPPER_ETA_RGB, COPPER_K_RGB

            eta3 = COPPER_ETA_RGB if eta3 is None else np.asarray(eta3) * np.ones(3)
            kk = COPPER_K_RGB if kk is None else np.asarray(kk) * np.ones(3)
            table[i, C_ETA30:C_ETA30 + 3] = eta3
            k3[i] = kk
            table[i, C_FRESNEL] = FRESNEL_CONDUCTOR
        elif kind == MAT_SUBSTRATE:
            table[i, C_FRESNEL] = FRESNEL_SCHLICK
        elif kind == MAT_MIRROR:
            table[i, C_FRESNEL] = FRESNEL_NOOP
        else:
            table[i, C_FRESNEL] = FRESNEL_DIELECTRIC
        if kind == MAT_METAL and "roughness" in s and _const(s["roughness"], None) is None:
            pass  # textured roughness recorded above
        if kind == MAT_METAL:
            # metal default roughness is 0.01 (metal.cpp)
            if "roughness" in s and _const(s["roughness"], None) is not None:
                table[i, C_ROUGH] = float(np.asarray(_const(s["roughness"], 0.01)).reshape(-1)[0])
    if textured:
        log.info("materials with textured slots: %s", textured)
    return MaterialTable(table=table, k3=k3, kinds=kinds,
                         records=list(materials), textured=textured)


class MaterialIndexer:
    """Deduplicates MaterialRecords during scene flattening."""

    def __init__(self):
        self.materials: List[Optional[MaterialRecord]] = []
        self._ids: Dict[int, int] = {}

    def __call__(self, rec: Optional[MaterialRecord]) -> int:
        if rec is None:
            key = -1
        else:
            key = id(rec)
        if key in self._ids:
            return self._ids[key]
        idx = len(self.materials)
        self.materials.append(rec)
        self._ids[key] = idx
        return idx


def fetch_lobes(mt_table: jnp.ndarray, mt_k3: jnp.ndarray,
                mt_kinds: jnp.ndarray, mat_id: jnp.ndarray,
                texture_overrides: Optional[dict] = None) -> LobeParams:
    """Gather per-lane lobe parameters from the material table.

    mat_id: (N,) int32 (-1 = no material -> all lobes inactive).
    texture_overrides: {slot_name: (N,...) array} blended in by the caller
    after texture evaluation.
    """
    n = mat_id.shape[0]
    idx = jnp.maximum(mat_id, 0)
    row = mt_table[idx]
    kind = jnp.where(mat_id >= 0, mt_kinds[idx], MAT_NONE)

    kd = row[:, C_KD0:C_KD0 + 3]
    ks = row[:, C_KS0:C_KS0 + 3]
    kr = row[:, C_KR0:C_KR0 + 3]
    kt = row[:, C_KT0:C_KT0 + 3]
    rough = row[:, C_ROUGH]
    urough = row[:, C_UROUGH]
    vrough = row[:, C_VROUGH]
    sigma = row[:, C_SIGMA]
    eta = row[:, C_ETA]
    eta3 = row[:, C_ETA30:C_ETA30 + 3]
    remap = row[:, C_REMAP] > 0
    fresnel_kind = row[:, C_FRESNEL].astype(jnp.int32)
    k3 = mt_k3[idx]

    if texture_overrides:
        ov = texture_overrides
        kd = ov.get("Kd", kd)
        ks = ov.get("Ks", ks)
        kr = ov.get("Kr", kr)
        kt = ov.get("Kt", kt)
        rough = ov.get("roughness", rough)
        sigma = ov.get("sigma", sigma)
        eta = ov.get("eta", eta)

    # roughness -> alpha (per-axis when u/v given)
    ur = jnp.where(urough >= 0, urough, rough)
    vr = jnp.where(vrough >= 0, vrough, rough)
    ax = jnp.where(remap, roughness_to_alpha(ur), jnp.maximum(ur, 1e-3))
    ay = jnp.where(remap, roughness_to_alpha(vr), jnp.maximum(vr, 1e-3))

    # Oren-Nayar A/B from sigma degrees (reflection.h:364-372)
    sig_rad = jnp.deg2rad(jnp.maximum(sigma, 0.0))
    s2 = sig_rad * sig_rad
    oren_a = 1.0 - s2 / (2.0 * (s2 + 0.33))
    oren_b = 0.45 * s2 / (s2 + 0.09)

    z3 = jnp.zeros((n, 3), jnp.float32)

    def by_kind(code, val, other):
        return jnp.where((kind == code)[:, None], val, other)

    # map material kinds onto lobe slots
    lobe_kd = jnp.where(((kind == MAT_MATTE) | (kind == MAT_PLASTIC)
                         | (kind == MAT_UBER) | (kind == MAT_SUBSTRATE)
                         | (kind == MAT_TRANSLUCENT))[:, None], kd, z3)
    lobe_ks = jnp.where(((kind == MAT_PLASTIC) | (kind == MAT_UBER)
                         | (kind == MAT_SUBSTRATE)
                         | (kind == MAT_TRANSLUCENT))[:, None], ks, z3)
    # metal's glossy slot carries ks=1 with conductor fresnel
    lobe_ks = by_kind(MAT_METAL, jnp.ones((n, 3), jnp.float32), lobe_ks)
    # smooth glass -> fresnel-specular slot; rough glass -> glossy (later)
    lobe_fs_kr = by_kind(MAT_GLASS, kr, z3)
    lobe_kt = by_kind(MAT_GLASS, kt, z3)
    lobe_kt = by_kind(MAT_UBER, kt, lobe_kt)
    lobe_fs_kr = by_kind(MAT_UBER, z3, lobe_fs_kr)  # uber Kt w/o matching Kr
    lobe_kr = by_kind(MAT_MIRROR, kr, z3)
    lobe_kr = by_kind(MAT_UBER, kr, lobe_kr)

    # substrate folds ks into the Schlick Rs (glossy fresnel)
    lobe_ks = jnp.where(((kind == MAT_SUBSTRATE) & (fresnel_kind == FRESNEL_SCHLICK))[:, None],
                        ks, lobe_ks)

    return LobeParams(
        kd=lobe_kd,
        oren_a=jnp.where(kind == MAT_MATTE, oren_a, jnp.ones((n,), jnp.float32)),
        oren_b=jnp.where(kind == MAT_MATTE, oren_b, jnp.zeros((n,), jnp.float32)),
        ks=lobe_ks,
        alpha_x=ax, alpha_y=ay,
        fresnel_kind=fresnel_kind,
        eta=eta, eta3=eta3, k3=k3,
        kr=lobe_kr, kt=lobe_kt, fs_kr=lobe_fs_kr,
    )
