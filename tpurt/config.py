"""Global configuration for tpurt.

The reference's three config tiers (CLI flags -> Options, the .pbrt scene
file, compile-time #defines; SURVEY.md §5) map here to: argparse in
tpurt.cli, the scene grammar in tpurt.scene, and this frozen dataclass for
the "compile-time" choices (dtype, wavefront sizes, device mesh).

Reference analog: core/pbrt.h:157-185 (Float/Options).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class Config:
    # Device compute dtype.  The reference uses float unless
    # PBRT_FLOAT_AS_DOUBLE (pbrt.h:157-161); RPF stats are double (sd.h:21).
    # On TPU we default to f32 everywhere; f64 parity mode needs
    # jax.config.update("jax_enable_x64", True) before any tracing.
    dtype: str = "float32"

    # Number of rays processed per wavefront megabatch.  Round-3 on-chip
    # A/B (tools/tpu_batch.sh probe6): 2^18 renders killeroo in 8.0 s
    # pipelined vs 9.3+ s at 2^17 — the bigger batch amortizes the
    # per-call schedule overhead and the gather engine keeps scaling.
    # One md=5 step at 2^18 is ~650 ms, well under the ~30 s axon
    # watchdog that kills long device calls.
    wavefront_size: int = 1 << 18

    # BVH build options (reference: bvh.cpp:740-760 CreateBVHAccelerator).
    bvh_max_prims_per_leaf: int = 4
    bvh_split_method: str = "sah"  # sah | middle | equal

    # Stack depth for the device BVH traversal (reference uses a 64-deep
    # nodesToVisit stack, bvh.cpp:670).
    bvh_stack_depth: int = 64

    # Use Pallas kernels when running on real TPU; pure-JAX fallbacks are
    # always available (and used on CPU, e.g. the virtual-mesh tests).
    use_pallas: bool = True

    # Device mesh axes for multi-chip rendering: pixels rows are data-
    # parallel over "rows"; samples-per-pixel can be split over "spp".
    mesh_axes: Tuple[str, ...] = ("rows",)

    # Russian-roulette / integrator defaults live in the per-integrator
    # ParamSets; nothing here.

    # Deterministic-scatter mode: film accumulation uses sorted segment
    # sums (bitwise deterministic) instead of jnp scatter-add.
    deterministic_film: bool = True

    # Shadow-ray medium-interface walk: max null-material boundary
    # crossings per shadow segment (the reference walks unboundedly,
    # core/light.cpp:47-63; each crossing costs one traversal of the
    # whole wavefront, so this is a compiled loop bound).  Lanes still
    # inside geometry after the budget are treated as occluded and
    # counted in the "Media/Shadow walk budget exhausted" stat — raise
    # this if that counter is nonzero for a scene.
    shadow_walk_steps: int = 4

    # Spectral representation: "rgb" (the reference's default
    # RGBSpectrum pipeline) or "sampled" (SampledSpectrum 60-bin mode,
    # pbrt.h:126-130 PBRT_SAMPLED_SPECTRUM).  Sampled mode carries a
    # (..., 60) channel axis through path/volpath/whitted/
    # directlighting/bdpt/mlt/sppm; rpf stays RGB by design parity
    # (the reference's SampleData is 3-double RGB, custom/sd.h:43);
    # ao is colorless.
    spectrum_mode: str = "rgb"

    # Fuse each bounce's NEE shadow ray with the next bounce's closest
    # ray into ONE mixed traversal (per-lane any-hit).  Bit-identical
    # results either way (pinned by test); round-3 on-chip A/B (probe8):
    # the fused 2n-lane mixed traversal measures 0.83x the separate
    # closest+any calls (73.5 ms vs 61.1 ms at 2^17) — the any-hit rays
    # terminate much earlier, and fusing them into the closest-hit loop
    # makes them pay its full step count.  Default OFF.
    fuse_shadow_rays: bool = False

    # Curve geometry mode: "raytrace" intersects cubic Bezier spans
    # analytically on device (the reference's recursive-splitting
    # semantics, shapes/curve.cpp:188-374, with the data-dependent
    # refinement moved to build-time pre-splitting); "tessellate" is the
    # round-1/2 behavior (host-side ribbons/tubes through the triangle
    # kernels), kept as the A/B fallback.
    curve_mode: str = "raytrace"

    # Imagemap filtering mode: "ewa" attaches true camera-ray
    # differentials and filters anisotropically (mipmap.h EWA);
    # "trilinear" keeps the isotropic footprint-cone + trilinear MIP
    # (round-1 behavior, and the A/B baseline).
    texture_filter: str = "ewa"

    # EWA gather layout: True fetches 4x16-texel blocks (768 B) from a
    # padded pyramid — 8 block gathers per level instead of 169
    # single-texel gathers (the gather engine charges per fetched row,
    # measured flat in row width through 768 B); measured 3.9x on chip
    # at 2^17 lanes.  False is the round-2 texel-at-a-time window, kept
    # as the A/B + parity oracle (tests/test_mipfilter.py pins equality).
    ewa_blocked: bool = True

    # Bounce-compacted wavefront (render.driver._render_compact): shrink
    # the lane array between bounces as paths terminate instead of
    # paying full-width masked traversals every bounce (measured: the
    # killeroo step is traversal-floor-bound while survivors collapse
    # 1.0->0.42->0.15->0.06).  False falls back to the one-jit lax.scan
    # step (the formulation the sharded/multi-chip path always uses).
    compact_bounces: bool = True

    # RPF bilateral sigma seed (rpf.cpp:533 hardcodes 0.002, a near-no-op
    # on the reference's own scenes — see BASELINE.md).  Raising it makes
    # the filter actually denoise; the strong-filter parity gate drives
    # BOTH sides at 0.05 (tpurt here, the C++ via pbrt-patched's
    # RPF_SIGMA_SEED env override).
    rpf_sigma_seed: float = 0.002

    # Grid-media delta/ratio-tracking step budget per segment (the
    # reference loops unboundedly, media/grid.cpp).  Overflow lanes are
    # counted in "Media/Grid tracking budget exhausted"; raise for very
    # dense media.
    grid_track_steps: int = 256


_CONFIG = Config()


def get_config() -> Config:
    return _CONFIG


def set_config(**kw) -> Config:
    global _CONFIG
    _CONFIG = dataclasses.replace(_CONFIG, **kw)
    return _CONFIG


_CACHE_ENABLED = False


def enable_compile_cache(path: str = "") -> bool:
    """Turn on JAX's persistent compilation cache (idempotent).

    The C++ reference pays zero compile time; tpurt's cold-start XLA
    compiles (~5 min for the 6-bounce path step on the axon backend)
    were the one place it lost.  Measured on the axon TPU tunnel: a
    fresh process recompiling a cached executable drops 3.5 s -> 0.5 s
    on a toy jit, and the bench cold numbers shrink accordingly.  Opt
    out with TPURT_COMPILE_CACHE=0; override the directory with
    TPURT_COMPILE_CACHE_DIR (default $TPURT_CACHE/jaxcache)."""
    global _CACHE_ENABLED
    if _CACHE_ENABLED:
        return True
    if os.environ.get("TPURT_COMPILE_CACHE", "1") == "0":
        return False
    cache_dir = (path or os.environ.get("TPURT_COMPILE_CACHE_DIR")
                 or os.environ.get("TPURT_CACHE",
                                   os.path.expanduser("~/.cache/tpurt"))
                 + "/jaxcache")
    try:
        import jax

        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        _CACHE_ENABLED = True
        return True
    except Exception as e:  # old jax without the knobs, read-only fs, ...
        import logging

        logging.getLogger("tpurt").info("compile cache unavailable: %s", e)
        return False


def on_tpu() -> bool:
    try:
        import jax

        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover - no backend at all
        return False
