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
    FRESNEL_DISNEY,
    FRESNEL_NOOP,
    FRESNEL_SCHLICK,
    LobeParams,
    roughness_to_alpha,
    zero_lobes,
)
from tpurt.scene.records import MaterialRecord

log = logging.getLogger("tpurt.render")

# columns of the constant-parameter table
_N_COLS = 39
(C_KD0, C_KD1, C_KD2, C_KS0, C_KS1, C_KS2, C_KR0, C_KR1, C_KR2,
 C_KT0, C_KT1, C_KT2, C_ROUGH, C_UROUGH, C_VROUGH, C_ETA, C_SIGMA,
 C_ETA30, C_ETA31, C_ETA32, C_REMAP, C_FRESNEL,
 C_TR0, C_TR1, C_TR2, C_TT0, C_TT1, C_TT2,  # translucent reflect/transmit
 C_METALLIC, C_SPECTRANS, C_ANISO, C_SHEEN, C_SHEENTINT, C_CC, C_CCGLOSS,
 C_SPECTINT, C_FLAT, C_DIFFTRANS, C_THIN) = range(_N_COLS)

# fused-row extension columns appended on DEVICE (driver.build_job):
# kind, conductor k3, mix sub-ids, hair params, fourier table index —
# one row gather serves fetch_lobes + the hair/fourier contexts (the
# TPU gather engine is row-count bound).  Ints ride as exact small
# floats.
C_KIND = _N_COLS            # 39
C_FK30 = _N_COLS + 1        # 40:43 conductor k
C_MIX0 = _N_COLS + 4        # 43:45 mix sub-material rows (-1 = none)
C_HAIR0 = _N_COLS + 6       # 45:52 [sigma_a rgb, eta, beta_m, beta_n, alpha]
C_FTIX = _N_COLS + 13       # 52 fourier table index (-1 = none)
N_FUSED_COLS = _N_COLS + 14  # 53


def fuse_material_rows(mt: "MaterialTable") -> np.ndarray:
    """Host-side: append the side-table columns onto the constant table
    (layout above); the device mt_table carries the fused rows."""
    m = mt.table.shape[0]
    kind_col = mt.kinds.astype(np.float32)[:, None]
    mix_cols = (mt.mix.astype(np.float32) if mt.has_mix
                else np.full((m, 2), -1.0, np.float32))
    hair_cols = (mt.hair.astype(np.float32) if mt.has_hair
                 else np.zeros((m, 7), np.float32))
    ftix_col = (mt.fourier_tix.astype(np.float32)[:, None]
                if mt.fourier_tix is not None
                else np.full((m, 1), -1.0, np.float32))
    return np.concatenate([mt.table, kind_col,
                           mt.k3.astype(np.float32), mix_cols, hair_cols,
                           ftix_col], axis=1)


@dataclasses.dataclass
class MaterialTable:
    """Host-side table + the record list (for textured slots)."""

    table: np.ndarray  # (M, _N_COLS) f32 constants
    k3: np.ndarray  # (M, 3) conductor k
    kinds: np.ndarray  # (M,) int32 material kind
    records: List[Optional[MaterialRecord]]
    textured: List[Tuple[int, str]]  # (mat_index, slot) needing texture eval
    mix: np.ndarray = None  # (M, 2) int32 sub-material rows for mix
    has_mix: bool = False
    # hair columns [sigma_a rgb, eta, beta_m, beta_n, alpha] (hair.cpp
    # CreateHairMaterial defaults); rows for non-hair materials are zero
    hair: np.ndarray = None  # (M, 7) f32
    has_hair: bool = False
    # tabulated-BSSRDF columns [sigma_t rgb, rho rgb, eta] + per-row
    # diffusion-table index (-1 = no BSSRDF); tables indexed by distinct
    # (g, eta) pairs (core/bssrdf.cpp ComputeBeamDiffusionBSSRDF)
    bss: np.ndarray = None  # (M, 7) f32
    bss_tix: np.ndarray = None  # (M,) int32
    bss_tables: list = None  # [BSSRDFTableHost]
    has_bssrdf: bool = False
    # fourier materials: per-row baked table index (-1 = none)
    fourier_tix: np.ndarray = None  # (M,) int32
    fourier_tables: list = None  # [FourierTableDev]
    fourier_etas: list = None  # [float]
    has_fourier: bool = False

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
MAT_DISNEY = 9
MAT_MIX = 10
MAT_HAIR = 11
MAT_FOURIER = 12
_KIND_CODES = {
    "matte": MAT_MATTE, "plastic": MAT_PLASTIC, "mirror": MAT_MIRROR,
    "glass": MAT_GLASS, "metal": MAT_METAL, "uber": MAT_UBER,
    "substrate": MAT_SUBSTRATE, "translucent": MAT_TRANSLUCENT,
    "disney": MAT_DISNEY, "mix": MAT_MIX, "hair": MAT_HAIR,
    # subsurface materials: glass-like surface lobes (subsurface.cpp
    # ComputeScatteringFunctions) + the tabulated BSSRDF hop
    "subsurface": MAT_GLASS, "kdsubsurface": MAT_GLASS,
    "fourier": MAT_FOURIER,
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
    """Deduplicated list (index == material id) -> table.  Mix materials
    (materials/mix.cpp) pull their resolved sub-records into extra rows;
    fetch_lobes blends the two rows' lobe parameters by "amount"."""
    materials = list(materials)
    mix_pairs = {}
    i = 0
    while i < len(materials):  # appended sub-records may be mix too
        rec = materials[i]
        if rec is not None and rec.name == "mix" and i not in mix_pairs:
            subs = []
            for slot in ("submaterial1", "submaterial2"):
                sub = rec.slots.get(slot, (None, None))[1]
                if sub is None:
                    subs.append(-1)
                    continue
                for j, e in enumerate(materials):
                    if e is sub:
                        subs.append(j)
                        break
                else:
                    materials.append(sub)
                    subs.append(len(materials) - 1)
            mix_pairs[i] = tuple(subs)
        i += 1

    m = len(materials)
    table = np.zeros((max(m, 1), _N_COLS), np.float32)
    k3 = np.zeros((max(m, 1), 3), np.float32)
    kinds = np.zeros(max(m, 1), np.int32)
    hair = np.zeros((max(m, 1), 7), np.float32)
    bss = np.zeros((max(m, 1), 7), np.float32)
    bss_tix = np.full(max(m, 1), -1, np.int32)
    bss_tables: List = []
    bss_keys: Dict[Tuple[float, float], int] = {}
    fourier_tix = np.full(max(m, 1), -1, np.int32)
    fourier_tables: List = []
    fourier_etas: List = []
    fourier_keys: Dict[str, int] = {}
    mix = np.full((max(m, 1), 2), -1, np.int32)
    for i, (s1, s2) in mix_pairs.items():
        mix[i] = (s1, s2)
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
        put3("reflect", (C_TR0, C_TR1, C_TR2), 0.5)
        put3("transmit", (C_TT0, C_TT1, C_TT2), 0.5)
        # disney extras (disney.cpp:589-643 defaults)
        put1("metallic", C_METALLIC, 0.0)
        put1("spectrans", C_SPECTRANS, 0.0)
        put1("anisotropic", C_ANISO, 0.0)
        put1("sheen", C_SHEEN, 0.0)
        put1("sheentint", C_SHEENTINT, 0.5)
        put1("clearcoat", C_CC, 0.0)
        put1("clearcoatgloss", C_CCGLOSS, 1.0)
        put1("speculartint", C_SPECTINT, 0.0)
        put1("flatness", C_FLAT, 0.0)
        put1("difftrans", C_DIFFTRANS, 1.0)
        table[i, C_THIN] = float(_const(s.get("thin"), False) in (True, 1.0))
        table[i, C_REMAP] = float(_const(s.get("remaproughness"), True) in (True, 1.0))
        if kind == MAT_MIX:
            # mix "amount" rides the (otherwise translucent-only) C_TR cols
            put3("amount", (C_TR0, C_TR1, C_TR2), 0.5)

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
        elif kind == MAT_DISNEY:
            table[i, C_FRESNEL] = FRESNEL_DISNEY
        else:
            table[i, C_FRESNEL] = FRESNEL_DIELECTRIC
        if kind in (MAT_HAIR, MAT_FOURIER):
            # integrators without a dedicated hair/fourier path (volpath,
            # bdpt, mlt, sppm) shade these rows through the lobe mixture:
            # give them the old matte-gray fallback so they are not black
            # (path/direct REPLACE f/pdf for these lanes, so the fallback
            # lobe never double-counts there)
            table[i, C_KD0:C_KD0 + 3] = 0.5

        if kind == MAT_HAIR:
            # resolve sigma_a per CreateHairMaterial precedence
            # (hair.cpp:151-166); textured hair params fall back to their
            # constant defaults with a warning
            from tpurt.render.hair import (
                sigma_a_from_concentration,
                sigma_a_from_reflectance,
            )

            def hconst(key, default):
                v = _const(s.get(key), None)
                if v is None and key in s:
                    log.warning('hair: textured "%s" not supported; '
                                'using default %g', key, default)
                if v is None:
                    return None
                return np.asarray(v, np.float64)

            bn = hconst("beta_n", 0.3)
            bn = 0.3 if bn is None else float(bn.reshape(-1)[0])
            sa = hconst("sigma_a", 0.0)
            if sa is not None:
                sa = np.clip(sa * np.ones(3), 0.0, None)
            elif hconst("color", 0.0) is not None:
                sa = sigma_a_from_reflectance(
                    np.clip(hconst("color", 0.0) * np.ones(3), 0.0, 1.0), bn)
            elif "eumelanin" in s or "pheomelanin" in s:
                ce = hconst("eumelanin", 0.0)
                cp = hconst("pheomelanin", 0.0)
                sa = sigma_a_from_concentration(
                    max(0.0, 0.0 if ce is None else float(ce)),
                    max(0.0, 0.0 if cp is None else float(cp)))
            else:
                sa = sigma_a_from_concentration(1.3, 0.0)
            for key, col, default in (("eta", 3, 1.55), ("beta_m", 4, 0.3),
                                      ("alpha", 6, 2.0)):
                v = hconst(key, default)
                hair[i, col] = default if v is None else float(v.reshape(-1)[0])
            hair[i, 0:3] = sa
            hair[i, 5] = bn

        if kind == MAT_FOURIER:
            fname = s.get("bsdffile", ("constant", ""))[1]
            if fname in fourier_keys:
                fourier_tix[i] = fourier_keys[fname]
            elif fname:
                try:
                    from tpurt.render.fourier import (
                        bake_fourier_table,
                        read_bsdf_file,
                    )

                    host = read_bsdf_file(fname)
                    fourier_keys[fname] = len(fourier_tables)
                    fourier_tix[i] = len(fourier_tables)
                    fourier_tables.append(bake_fourier_table(host))
                    fourier_etas.append(host.eta)
                except (OSError, ValueError) as e:
                    # unreadable table -> black material, like the
                    # reference's failed Read (fourier.cpp:206-210)
                    log.error('fourier material: %s', e)
            else:
                log.error("fourier material: no bsdffile given")

        if rec.name in ("subsurface", "kdsubsurface"):
            # resolve the diffusion profile + per-channel coefficients
            # (subsurface.cpp:55-58, kdsubsurface.cpp ComputeScattering)
            from tpurt.render.bssrdf import (
                compute_beam_diffusion_table,
                subsurface_from_diffuse,
            )

            def bconst(key, default):
                v = _const(s.get(key), None)
                if v is None and key in s:
                    log.warning('%s: textured "%s" not supported; using '
                                'default', rec.name, key)
                    return np.asarray(default, np.float64)
                return (np.asarray(default, np.float64) if v is None
                        else np.asarray(v, np.float64))

            g_b = float(bconst("g", 0.0).reshape(-1)[0])
            eta_b = float(bconst("eta", 1.33).reshape(-1)[0])
            key = (round(g_b, 6), round(eta_b, 6))
            if key not in bss_keys:
                bss_keys[key] = len(bss_tables)
                bss_tables.append(compute_beam_diffusion_table(g_b, eta_b))
            tix = bss_keys[key]
            tbl_h = bss_tables[tix]
            if rec.name == "subsurface":
                scale_b = float(bconst("scale", 1.0).reshape(-1)[0])
                sig_a_b = np.clip(bconst("sigma_a",
                                         [0.0011, 0.0024, 0.014])
                                  * np.ones(3), 0, None) * scale_b
                sig_s_b = np.clip(bconst("sigma_s", [2.55, 3.21, 3.77])
                                  * np.ones(3), 0, None) * scale_b
            else:
                kd_b = np.clip(bconst("Kd", 0.5) * np.ones(3), 0.0, 1.0)
                mfp_b = bconst("mfp", 1.0) * np.ones(3)
                sig_a_b, sig_s_b = subsurface_from_diffuse(tbl_h, kd_b, mfp_b)
            sig_t_b = sig_a_b + sig_s_b
            rho_b = np.where(sig_t_b > 0, sig_s_b / np.maximum(sig_t_b, 1e-20),
                             0.0)
            bss[i, 0:3] = sig_t_b
            bss[i, 3:6] = rho_b
            bss[i, 6] = eta_b
            bss_tix[i] = tix

        if kind == MAT_METAL and "roughness" in s and _const(s["roughness"], None) is None:
            pass  # textured roughness recorded above
        if kind == MAT_METAL:
            # metal default roughness is 0.01 (metal.cpp)
            if "roughness" in s and _const(s["roughness"], None) is not None:
                table[i, C_ROUGH] = float(np.asarray(_const(s["roughness"], 0.01)).reshape(-1)[0])
    if textured:
        log.info("materials with textured slots: %s", textured)
    return MaterialTable(table=table, k3=k3, kinds=kinds,
                         records=list(materials), textured=textured,
                         mix=mix, has_mix=bool(mix_pairs),
                         hair=hair, has_hair=bool((kinds == MAT_HAIR).any()),
                         bss=bss, bss_tix=bss_tix, bss_tables=bss_tables,
                         has_bssrdf=bool(bss_tables),
                         fourier_tix=fourier_tix,
                         fourier_tables=fourier_tables,
                         fourier_etas=fourier_etas,
                         has_fourier=bool(fourier_tables))


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


_LOBE_COLOR_FIELDS = ("kd", "ks", "eta3", "k3", "kr", "kt", "fs_kr",
                      "kt_g", "kd_t", "r0", "sheen", "retro", "kd_ss")


def _lift_lobeparams(lp: LobeParams) -> LobeParams:
    """Promote every RGB color field to the 60-bin SampledSpectrum
    (the per-lane analog of ParamSet::FindOneSpectrum promoting RGB
    parameters through SampledSpectrum::FromRGB at scene build,
    spectrum.cpp:310-385; conductor eta/k given as RGB promote through
    the same reflectance basis, matching what the reference does with
    RGB "eta"/"k" material parameters)."""
    from tpurt.spectrum_sampled import lift_refl

    return lp._replace(**{f: lift_refl(getattr(lp, f))
                          for f in _LOBE_COLOR_FIELDS})


def fetch_lobes(mt_table: jnp.ndarray, mat_id: jnp.ndarray,
                texture_overrides: Optional[dict] = None,
                has_mix: bool = False,
                channels: int = 3,
                row: Optional[jnp.ndarray] = None) -> LobeParams:
    """Gather per-lane lobe parameters from the FUSED material table
    (one row per lane; see fuse_material_rows for the layout).

    mat_id: (N,) int32 (-1 = no material -> all lobes inactive).
    texture_overrides: {slot_name: (N,...) array} blended in by the caller
    after texture evaluation.
    has_mix (static): when True, MAT_MIX lanes blend the two
    sub-materials' lobe parameters by the "amount" color (materials/
    mix.cpp scales each sub-BSDF by amt / 1-amt; the parameter-space blend
    here is exact for the linear scale fields and picks the dominant side
    for distribution shapes — documented approximation).
    row: optional pre-gathered (N, N_FUSED_COLS) rows (callers that also
    need the hair/fourier context share ONE gather).
    """
    idx = jnp.maximum(mat_id, 0)
    if row is None:
        row = mt_table[idx]
    lp = _fetch_lobes_one(row, mat_id, texture_overrides)
    if not has_mix:
        return _lift_lobeparams(lp) if channels != 3 else lp
    kind = jnp.where(mat_id >= 0, row[:, C_KIND].astype(jnp.int32),
                     MAT_NONE)
    is_mix = kind == MAT_MIX
    sub = row[:, C_MIX0:C_MIX0 + 2].astype(jnp.int32)  # (N,2)
    id1 = jnp.where(is_mix, jnp.maximum(sub[:, 0], 0), idx)
    id2 = jnp.where(is_mix, jnp.maximum(sub[:, 1], 0), idx)
    lp1 = _fetch_lobes_one(mt_table[id1], id1, None)
    lp2 = _fetch_lobes_one(mt_table[id2], id2, None)
    amt3 = jnp.clip(row[:, C_TR0:C_TR0 + 3], 0.0, 1.0)
    amt1 = jnp.mean(amt3, axis=-1)
    take1 = amt1 >= 0.5
    linear = ("kd", "ks", "kr", "kt", "fs_kr", "kt_g", "kd_t",
              "sheen", "retro", "kd_ss", "r0")
    blended = {}
    for f in LobeParams._fields:
        a, b = getattr(lp1, f), getattr(lp2, f)
        if f in linear:
            blended[f] = amt3 * a + (1.0 - amt3) * b
        elif f == "cc":
            blended[f] = amt1 * a + (1.0 - amt1) * b
        elif a.ndim == 2:
            blended[f] = jnp.where(take1[:, None], a, b)
        else:
            blended[f] = jnp.where(take1, a, b)
    mixed = LobeParams(**blended)
    out = {}
    for f in LobeParams._fields:
        a, b = getattr(mixed, f), getattr(lp, f)
        m = is_mix[:, None] if a.ndim == 2 else is_mix
        out[f] = jnp.where(m, a, b)
    lp = LobeParams(**out)
    return _lift_lobeparams(lp) if channels != 3 else lp


def _fetch_lobes_one(row: jnp.ndarray, mat_id: jnp.ndarray,
                     texture_overrides: Optional[dict] = None) -> LobeParams:
    """row: pre-gathered (N, N_FUSED_COLS) fused material rows."""
    n = mat_id.shape[0]
    kind = jnp.where(mat_id >= 0, row[:, C_KIND].astype(jnp.int32),
                     MAT_NONE)

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
    k3 = row[:, C_FK30:C_FK30 + 3]

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
    # hair/fourier expose their gray fallback Kd here so integrators
    # without the dedicated paths (volpath/bdpt/mlt/sppm) shade them as
    # matte; path/direct REPLACE f/pdf for those lanes, no double count
    lobe_kd = jnp.where(((kind == MAT_MATTE) | (kind == MAT_PLASTIC)
                         | (kind == MAT_UBER) | (kind == MAT_SUBSTRATE)
                         | (kind == MAT_HAIR) | (kind == MAT_FOURIER))
                        [:, None], kd, z3)
    lobe_ks = jnp.where(((kind == MAT_PLASTIC) | (kind == MAT_UBER)
                         | (kind == MAT_SUBSTRATE))[:, None], ks, z3)
    # metal's glossy slot carries ks=1 with conductor fresnel
    lobe_ks = by_kind(MAT_METAL, jnp.ones((n, 3), jnp.float32), lobe_ks)
    lobe_kt = by_kind(MAT_UBER, kt, z3)
    lobe_kr = by_kind(MAT_MIRROR, kr, z3)
    lobe_kr = by_kind(MAT_UBER, kr, lobe_kr)

    z1 = jnp.zeros((n,), jnp.float32)
    lobe_kt_g = z3
    lobe_kd_t = z3
    t_ax, t_ay = ax, ay

    # glass: smooth -> fresnel-specular; rough -> GGX reflection +
    # microfacet transmission (glass.cpp: isSpecular when u/v rough == 0)
    glass_rough = (kind == MAT_GLASS) & ((urough > 0) | (vrough > 0))
    glass_smooth = (kind == MAT_GLASS) & ~glass_rough
    lobe_fs_kr = jnp.where(glass_smooth[:, None], kr, z3)
    lobe_kt = jnp.where(glass_smooth[:, None], kt, lobe_kt)
    lobe_ks = jnp.where(glass_rough[:, None], kr, lobe_ks)
    lobe_kt_g = jnp.where(glass_rough[:, None], kt, lobe_kt_g)

    # translucent (translucent.cpp): reflect/transmit split both the
    # diffuse and glossy components
    trefl = row[:, C_TR0:C_TR0 + 3]
    ttrans = row[:, C_TT0:C_TT0 + 3]
    is_tl = kind == MAT_TRANSLUCENT
    lobe_kd = jnp.where(is_tl[:, None], trefl * kd, lobe_kd)
    lobe_kd_t = jnp.where(is_tl[:, None], ttrans * kd, lobe_kd_t)
    lobe_ks = jnp.where(is_tl[:, None], trefl * ks, lobe_ks)
    lobe_kt_g = jnp.where(is_tl[:, None], ttrans * ks, lobe_kt_g)

    # substrate folds ks into the Schlick Rs (glossy fresnel)
    lobe_ks = jnp.where(((kind == MAT_SUBSTRATE) & (fresnel_kind == FRESNEL_SCHLICK))[:, None],
                        ks, lobe_ks)

    # ---- disney (disney.cpp ComputeScatteringFunctions :474-587) ----
    is_dis = kind == MAT_DISNEY
    metallic = jnp.where(is_dis, row[:, C_METALLIC], 0.0)
    strans = row[:, C_SPECTRANS]
    thin = row[:, C_THIN] > 0
    dw = (1.0 - metallic) * (1.0 - strans)  # diffuseWeight
    dt = row[:, C_DIFFTRANS] / 2.0
    lum = (0.212671 * kd[:, 0] + 0.715160 * kd[:, 1] + 0.072169 * kd[:, 2])
    ctint = jnp.where(lum[:, None] > 0, kd / jnp.maximum(lum, 1e-9)[:, None],
                      jnp.ones_like(kd))
    sheen_w = row[:, C_SHEEN]
    csheen = ((1.0 - row[:, C_SHEENTINT])[:, None]
              + row[:, C_SHEENTINT][:, None] * ctint)
    flat = row[:, C_FLAT]
    d_kd_w = jnp.where(thin, (1.0 - flat) * (1.0 - dt), 1.0)
    lobe_kd = jnp.where(is_dis[:, None], (dw * d_kd_w)[:, None] * kd, lobe_kd)
    kd_ss = jnp.where((is_dis & thin)[:, None],
                      (dw * flat * (1.0 - dt))[:, None] * kd, z3)
    retro = jnp.where(is_dis[:, None], dw[:, None] * kd, z3)
    sheen = jnp.where(is_dis[:, None], (dw * sheen_w)[:, None] * csheen, z3)
    lobe_kd_t = jnp.where((is_dis & thin)[:, None], dt[:, None] * kd,
                          lobe_kd_t)
    # specular: white scale, disney fresnel (R0 tinted), disney alphas
    lobe_ks = jnp.where(is_dis[:, None], jnp.ones((n, 3), jnp.float32),
                        lobe_ks)
    spec_tint = row[:, C_SPECTINT]
    r0_eta = ((eta - 1.0) ** 2) / jnp.maximum((eta + 1.0) ** 2, 1e-9)
    cspec0 = ((1.0 - metallic)[:, None] * r0_eta[:, None]
              * ((1.0 - spec_tint)[:, None] + spec_tint[:, None] * ctint)
              + metallic[:, None] * kd)
    aspect = jnp.sqrt(jnp.maximum(1.0 - row[:, C_ANISO] * 0.9, 1e-6))
    d_ax = jnp.maximum(0.001, rough * rough / aspect)
    d_ay = jnp.maximum(0.001, rough * rough * aspect)
    ax = jnp.where(is_dis, d_ax, ax)
    ay = jnp.where(is_dis, d_ay, ay)
    # transmission: strans*sqrt(c); thin scales roughness by IOR
    lobe_kt_g = jnp.where(is_dis[:, None],
                          strans[:, None] * jnp.sqrt(jnp.maximum(kd, 0.0)),
                          lobe_kt_g)
    rscaled = (0.65 * eta - 0.35) * rough
    t_ax = jnp.where(is_dis,
                     jnp.where(thin,
                               jnp.maximum(0.001, rscaled * rscaled / aspect),
                               d_ax), t_ax)
    t_ay = jnp.where(is_dis,
                     jnp.where(thin,
                               jnp.maximum(0.001, rscaled * rscaled * aspect),
                               d_ay), t_ay)
    cc = jnp.where(is_dis, row[:, C_CC], 0.0)
    ccg = row[:, C_CCGLOSS]
    cc_gloss = jnp.maximum(0.1 * (1.0 - ccg) + 0.001 * ccg, 1e-4)

    return LobeParams(
        kd=lobe_kd,
        oren_a=jnp.where(kind == MAT_MATTE, oren_a, jnp.ones((n,), jnp.float32)),
        oren_b=jnp.where(kind == MAT_MATTE, oren_b, jnp.zeros((n,), jnp.float32)),
        ks=lobe_ks,
        alpha_x=ax, alpha_y=ay,
        fresnel_kind=fresnel_kind,
        eta=eta, eta3=eta3, k3=k3,
        kr=lobe_kr, kt=lobe_kt, fs_kr=lobe_fs_kr,
        kt_g=lobe_kt_g, t_alpha_x=t_ax, t_alpha_y=t_ay,
        cc=cc, cc_gloss=cc_gloss, kd_t=lobe_kd_t,
        disney=is_dis, metallic=metallic, r0=cspec0,
        sheen=sheen, retro=retro, kd_ss=kd_ss,
        d_rough=jnp.where(is_dis, rough, z1 + 0.5),
    )
