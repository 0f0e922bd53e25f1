"""On-chip perf probe: break a killeroo path-render chunk into its
component costs (closest/any-hit traversal, full integrator step) and
report per-bounce survivor counts, so traversal-schedule changes can be
tuned against measured occupancy instead of guesses.

Usage: python tools/perf_probe.py [--scene PATH] [--lanes LOG2]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, n=5):
    out = fn(*args)
    import jax

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
    from tpurt.render.integrator import RADIANCE_FNS, _camera_setup
    from tpurt.render.intersect import intersect_closest, intersect_any

    n = 1 << args.lanes
    sd = load_scene(args.scene)
    job = build_job(sd)
    spp = job.sampler.spp
    px, py, sidx, mask = next(_chunk_lanes(job.film, spp, n))
    px, py, sidx = (jnp.asarray(px), jnp.asarray(py), jnp.asarray(sidx))
    x0, _, y0, _ = job.film.crop

    @jax.jit
    def camera_rays(px, py, sidx):
        _, _, _, o, d, _, _, t = _camera_setup(
            job.sampler, job.camera, px, py, sidx, (x0, y0))
        return o, d, t

    (o, d, t_time) = camera_rays(px, py, sidx)
    key = jax.random.PRNGKey(0)
    perm = jax.random.permutation(key, n)
    o_s, d_s = jnp.take(o, perm, axis=0), jnp.take(d, perm, axis=0)

    INF = jnp.float32(3e38)

    closest = jax.jit(lambda o, d, t: intersect_closest(job.scene.geo, o, d, t))
    anyhit = jax.jit(lambda o, d, t: intersect_any(job.scene.geo, o, d, t))

    t_coh, _ = timeit(closest, o, d, jnp.full(n, INF))
    t_shuf, hit = timeit(closest, o_s, d_s, jnp.full(n, INF))
    t_any, _ = timeit(anyhit, o_s, d_s, jnp.full(n, INF))
    # mostly-dead wavefronts (late bounces): only `frac` lanes alive
    rows = [("closest coherent", t_coh, 1.0),
            ("closest shuffled", t_shuf, 1.0),
            ("any-hit shuffled", t_any, 1.0)]
    for frac in (0.5, 0.25, 0.1):
        live = jax.random.uniform(key, (n,)) < frac
        tm = jnp.where(live, INF, 0.0)
        t_d, _ = timeit(closest, o_s, d_s, tm)
        rows.append((f"closest {int(frac*100)}% alive", t_d, frac))
        t_da, _ = timeit(anyhit, o_s, d_s, tm)
        rows.append((f"any-hit {int(frac*100)}% alive", t_da, frac))

    radiance_fn = RADIANCE_FNS[job.cfg.name]

    from functools import partial

    @partial(jax.jit, static_argnums=(3,))
    def full_step(px, py, sidx, cfg):
        return radiance_fn(job.scene, job.sampler, job.camera, px, py, sidx,
                           cfg, crop_xy=(x0, y0),
                           texture_eval=job.texture_eval)

    t_step, out = timeit(full_step, px, py, sidx, job.cfg, n=3)
    rows.append(("full integrator step", t_step, 1.0))

    print(f"scene={args.scene} lanes=2^{args.lanes} "
          f"backend={jax.default_backend()}")
    for name, t, _ in rows:
        print(f"  {name:24s} {t*1e3:8.1f} ms  "
              f"({n / t / 1e6:6.2f} Mlanes/s)")
    if "alive_per_bounce" in out:
        hist = np.asarray(out["alive_per_bounce"])
        fr = ", ".join(f"b{i}:{c/n:.3f}" for i, c in enumerate(hist))
        print(f"  survivors entering bounce k+1: {fr}")
    d = job.cfg.max_depth + 1
    est = t_shuf * (d - 1) + t_coh + t_any * d
    print(f"  traversal estimate {est*1e3:.1f} ms of {t_step*1e3:.1f} ms "
          f"step ({est/t_step*100:.0f}%), depth={d}")


if __name__ == "__main__":
    main()
