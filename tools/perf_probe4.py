"""In-jit iterated anatomy on a HARD (center) chunk.

Dispatch over the axon tunnel costs ~27 ms per jit call, so component
costs are measured by iterating K times INSIDE one jit (with a data
dependency between iterations) and differencing against a 1-iteration
call.  Also times the full integrator step at max_depth 0/2/5 to get
the marginal per-bounce cost.

Usage: python tools/perf_probe4.py [--lanes LOG2] [--chunk IDX]
"""

import argparse
import os
import sys
import time
from functools import partial

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
    from tpurt.render.integrator import RADIANCE_FNS, _camera_setup
    from tpurt.render import intersect as ix

    n = 1 << args.lanes
    sd = load_scene(args.scene)
    job = build_job(sd)
    geo = job.scene.geo
    spp = job.sampler.spp
    chunks = list(_chunk_lanes(job.film, spp, n))
    px, py, sidx, mask = chunks[min(args.chunk, len(chunks) - 1)]
    pxj, pyj, sidxj = (jnp.asarray(px), jnp.asarray(py), jnp.asarray(sidx))
    x0, _, y0, _ = job.film.crop

    @jax.jit
    def camera_rays(px, py, sidx):
        _, _, _, o, d, _, _, t = _camera_setup(
            job.sampler, job.camera, px, py, sidx, (x0, y0))
        return o, d, t

    o, d, _ = camera_rays(pxj, pyj, sidxj)
    key = jax.random.PRNGKey(0)
    perm = jax.random.permutation(key, n)
    o_s, d_s = jnp.take(o, perm, axis=0), jnp.take(d, perm, axis=0)
    INF = jnp.float32(3e38)
    S = geo.wstack_depth

    # --- iterated traversal (amortize dispatch): K calls chained ---
    def iter_traverse(K, any_hit):
        @jax.jit
        def run(o, d):
            def it(i, carry):
                o_i, acc = carry
                t, prim, b0, b1 = ix._traverse_wide(geo, o_i, d,
                                                    jnp.full(n, INF),
                                                    any_hit)
                # data-dependency: nudge origins by the hit distance bits
                o_i = o_i + jnp.minimum(t, 1.0)[:, None] * 1e-12
                return o_i, acc + jnp.sum(jnp.minimum(t, 1.0))
            _, acc = jax.lax.fori_loop(0, K, it, (o, jnp.float32(0)))
            return acc
        return run

    print(f"lanes=2^{args.lanes} chunk={args.chunk} "
          f"backend={jax.default_backend()}")
    for any_hit, nm in ((False, "closest"), (True, "any-hit")):
        t1, _ = timeit(iter_traverse(1, any_hit), o_s, d_s)
        t9, _ = timeit(iter_traverse(9, any_hit), o_s, d_s)
        per = (t9 - t1) / 8
        print(f"  {nm} traversal (in-jit):     {per*1e3:8.2f} ms "
              f"({n/per/1e6:6.1f} Mrays/s)")

    # --- iterated single body step ---
    def iter_body(K):
        @jax.jit
        def run(o, d):
            inv_d = jnp.where(d != 0, 1.0 / d, INF)
            _, body = ix._wide_step_fns(geo, o, d, inv_d, False, None)
            cur0 = jnp.zeros(n, jnp.int32)
            state = (cur0, jnp.zeros(n, jnp.int32),
                     jnp.zeros((n, S), jnp.int32), jnp.full(n, INF),
                     jnp.full(n, -1, jnp.int32), jnp.zeros(n, jnp.float32),
                     jnp.zeros(n, jnp.float32))

            def it(i, st):
                st = body(st)
                # keep lanes live: reset cur to the root xor a bit of state
                return (jnp.where(st[0] < 0, 0, st[0]),) + st[1:]
            st = jax.lax.fori_loop(0, K, it, state)
            return st[3].sum() + st[1].sum()
        return run

    t1, _ = timeit(iter_body(2), o_s, d_s)
    t9, _ = timeit(iter_body(18), o_s, d_s)
    per = (t9 - t1) / 16
    print(f"  one full-width body step:  {per*1e3:8.2f} ms")

    # --- full integrator step at max_depth 0/2/5 ---
    radiance_fn = RADIANCE_FNS[job.cfg.name]

    for depth in (0, 2, 5):
        cfg = job.cfg._replace(max_depth=depth)

        @partial(jax.jit, static_argnums=(3,))
        def full_step(px, py, sidx, cfg):
            out = radiance_fn(job.scene, job.sampler, job.camera,
                              px, py, sidx, cfg, crop_xy=(x0, y0),
                              texture_eval=job.texture_eval)
            return out["L"].sum(), out["alive_per_bounce"]

        t, (_, hist) = timeit(full_step, pxj, pyj, sidxj, cfg, n=3)
        fr = ", ".join(f"{c/n:.2f}" for c in np.asarray(hist))
        print(f"  step max_depth={depth}: {t*1e3:8.1f} ms  alive: [{fr}]")


if __name__ == "__main__":
    main()
