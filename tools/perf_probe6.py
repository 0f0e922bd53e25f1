"""Driver-loop replication: per-chunk step wall times (blocking) vs the
pipelined loop (production), to locate non-step render overhead.

Usage: python tools/perf_probe6.py [--chunk-log2 N]
"""

import argparse
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunk-log2", type=int, default=0,
                    help="override wavefront chunk size (0 = config)")
    args = ap.parse_args()
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.expanduser(os.environ.get("TPURT_CACHE", "~/.cache/tpurt"))
        + "/jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    import numpy as np

    from tpurt.scene import load_scene
    from tpurt.render.driver import build_job, _chunk_lanes
    from tpurt.render.integrator import RADIANCE_FNS
    from tpurt.config import get_config

    scene_path = "/root/reference/scenes/killeroo-simple.pbrt"
    sd = load_scene(scene_path)
    t0 = time.time()
    job = build_job(sd)
    t_build = time.time() - t0
    film = job.film
    spp = job.sampler.spp
    chunk = (1 << args.chunk_log2 if args.chunk_log2
             else min(1 << 20, get_config().wavefront_size))
    x0, _, y0, _ = film.crop
    radiance_fn = RADIANCE_FNS[job.cfg.name]

    @partial(jax.jit, static_argnums=(3,), donate_argnums=(7,))
    def step(scene, camera, smplr, cfg, px, py, sidx, state, mask):
        out = radiance_fn(scene, smplr, camera, px, py, sidx, cfg,
                          crop_xy=(x0, y0), texture_eval=job.texture_eval)
        return film.add_samples(state, out["p_film"], out["L"],
                                out["ray_weight"], mask=mask)

    chunks = list(_chunk_lanes(film, spp, chunk))
    print(f"build_job {t_build:.2f}s; {len(chunks)} chunks of 2^"
          f"{chunk.bit_length()-1}")

    # pass 1: pipelined (production) — warm compile with chunk 0 first
    state = film.initial_state()
    px, py, sidx, mask = chunks[0]
    state = step(job.scene, job.camera, job.sampler, job.cfg,
                 jnp.asarray(px), jnp.asarray(py), jnp.asarray(sidx),
                 state, jnp.asarray(mask))
    jax.block_until_ready(state.rgb)

    state = film.initial_state()
    t0 = time.time()
    for px, py, sidx, mask in chunks:
        state = step(job.scene, job.camera, job.sampler, job.cfg,
                     jnp.asarray(px), jnp.asarray(py), jnp.asarray(sidx),
                     state, jnp.asarray(mask))
    jax.block_until_ready(state.rgb)
    t_pipe = time.time() - t0
    print(f"pipelined loop: {t_pipe:.2f}s")

    # pass 2: per-chunk blocking
    state = film.initial_state()
    ts = []
    t0 = time.time()
    for px, py, sidx, mask in chunks:
        tc = time.time()
        state = step(job.scene, job.camera, job.sampler, job.cfg,
                     jnp.asarray(px), jnp.asarray(py), jnp.asarray(sidx),
                     state, jnp.asarray(mask))
        jax.block_until_ready(state.rgb)
        ts.append(time.time() - tc)
    t_block = time.time() - t0
    print(f"blocking loop:  {t_block:.2f}s  sum(chunks) {sum(ts):.2f}s")
    line = " ".join(f"{t*1e3:.0f}" for t in ts)
    print(f"per-chunk ms: {line}")


if __name__ == "__main__":
    main()
