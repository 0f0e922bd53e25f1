"""Fused [closest; shadow] traversal A/B on killeroo (in-jit iterated).

Separate: intersect_closest(n) + intersect_any(n).
Fused:    intersect_mixed(2n) with a per-lane any-hit mask.
The fused call doubles the gather batch (13 ns/row at 2^17 vs 28 at 8k)
and halves the schedule's fixed costs; this probe decides whether the
integrator bounce loop should be restructured around it.

Usage: python tools/perf_probe8.py [--lanes LOG2] [--chunk IDX]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, n=5):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(n):
        t0 = time.time()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.time() - t0)
    ts.sort()
    return ts[len(ts) // 2], out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene",
                    default="/root/reference/scenes/killeroo-simple.pbrt")
    ap.add_argument("--lanes", type=int, default=17)
    ap.add_argument("--chunk", type=int, default=15)
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
    from tpurt.render.integrator import _camera_setup
    from tpurt.render.intersect import (intersect_any, intersect_closest,
                                        intersect_mixed)

    n = 1 << args.lanes
    sd = load_scene(args.scene)
    job = build_job(sd)
    geo = job.scene.geo
    spp = job.sampler.spp
    chunks = list(_chunk_lanes(job.film, spp, n))
    px, py, sidx, _ = chunks[min(args.chunk, len(chunks) - 1)]

    @jax.jit
    def rays(px, py, sidx):
        x0, _, y0, _ = job.film.crop
        _, _, _, o, d, _, _, t = _camera_setup(
            job.sampler, job.camera, px, py, sidx, (x0, y0))
        return o, d

    o, d = rays(jnp.asarray(px), jnp.asarray(py), jnp.asarray(sidx))
    key = jax.random.PRNGKey(0)
    perm = jax.random.permutation(key, n)
    o, d = jnp.take(o, perm, axis=0), jnp.take(d, perm, axis=0)
    # shadow rays: from the closest hit points toward a fixed light
    hit = jax.jit(lambda: intersect_closest(geo, o, d, jnp.full(n, 3e38)))()
    p_hit = o + jnp.where(hit.valid, hit.t, 1.0)[:, None] * d
    lp = jnp.asarray([2.0, 8.0, -3.0])
    wi = lp[None, :] - p_hit
    dist = jnp.linalg.norm(wi, axis=-1)
    wi = wi / dist[:, None]
    t_sh = jnp.where(hit.valid, dist * 0.999, 0.0)
    INF = jnp.float32(3e38)

    K = 9

    def iterate(make_fn):
        def runner(ksteps):
            @jax.jit
            def run():
                def it(i, acc):
                    return acc + make_fn(i, acc * 1e-30)
                return jax.lax.fori_loop(0, ksteps, it, jnp.float32(0))
            return run
        t1, _ = timeit(runner(1))
        t9, _ = timeit(runner(K))
        return (t9 - t1) / (K - 1)

    def separate(i, salt):
        o_i = o + salt
        h = intersect_closest(geo, o_i, d, jnp.full(n, INF))
        occ = intersect_any(geo, p_hit + salt, wi, t_sh)
        return jnp.sum(jnp.minimum(h.t, 1.0)) + jnp.sum(occ)

    o2 = jnp.concatenate([o, p_hit], axis=0)
    d2 = jnp.concatenate([d, wi], axis=0)
    tm2 = jnp.concatenate([jnp.full(n, INF), t_sh], axis=0)
    am = jnp.concatenate([jnp.zeros(n, bool), jnp.ones(n, bool)])

    def fused(i, salt):
        h = intersect_mixed(geo, o2 + salt, d2, tm2, am)
        return jnp.sum(jnp.minimum(h.t, 1.0))

    t_sep = iterate(separate)
    t_fus = iterate(fused)
    print(f"lanes=2^{args.lanes} chunk={args.chunk} "
          f"backend={jax.default_backend()}")
    print(f"  separate closest+any:  {t_sep*1e3:8.2f} ms")
    print(f"  fused mixed (2n):      {t_fus*1e3:8.2f} ms "
          f"({t_sep/t_fus:.2f}x)")


if __name__ == "__main__":
    main()
