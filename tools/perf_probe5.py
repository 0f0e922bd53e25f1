"""Traversal-schedule shootout on HARD rays (center chunk, shuffled),
measured in-jit (iterated with a data dependency) to exclude the ~27 ms
tunnel dispatch.  Also reports while-loop trip counts per variant.

Usage: python tools/perf_probe5.py [--lanes LOG2] [--chunk IDX]
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
    ap.add_argument("--anyhit", action="store_true")
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
    from tpurt.render import intersect as ix

    n = 1 << args.lanes
    sd = load_scene(args.scene)
    job = build_job(sd)
    geo = job.scene.geo
    spp = job.sampler.spp
    chunks = list(_chunk_lanes(job.film, spp, n))
    px, py, sidx, _ = chunks[min(args.chunk, len(chunks) - 1)]

    @jax.jit
    def camera_rays(px, py, sidx):
        x0, _, y0, _ = job.film.crop
        _, _, _, o, d, _, _, t = _camera_setup(
            job.sampler, job.camera, px, py, sidx, (x0, y0))
        return o, d

    o, d = camera_rays(jnp.asarray(px), jnp.asarray(py), jnp.asarray(sidx))
    key = jax.random.PRNGKey(0)
    perm = jax.random.permutation(key, n)
    o, d = jnp.take(o, perm, axis=0), jnp.take(d, perm, axis=0)
    INF = jnp.float32(3e38)
    S = geo.wstack_depth
    ANY = args.anyhit

    def make(schedule):
        """('full', k) fori k | ('fwhile', thresh_div) full-width while
        until alive < n/thresh_div (0 -> until none) | ('rung', div, k) |
        ('tail', div) outer-while of compact-to-completion |
        ('ctail', div) ONE compact run to completion (capacity-unsafe,
        finished by a final fwhile 0)."""

        def traverse(o, d, t_max):
            inv_d = jnp.where(d != 0, 1.0 / d,
                              jnp.where(d >= 0, INF, -INF))
            cur = jnp.where(t_max > 0, 0, -1).astype(jnp.int32)
            state = (cur, jnp.zeros(n, jnp.int32),
                     jnp.zeros((n, S), jnp.int32), t_max,
                     jnp.full(n, -1, jnp.int32), jnp.zeros(n, jnp.float32),
                     jnp.zeros(n, jnp.float32))
            cond, body = ix._wide_step_fns(geo, o, d, inv_d, ANY, None)
            trips = jnp.int32(0)

            def compact_run(state, c, max_steps):
                (idxc,) = jnp.nonzero(state[0] >= 0, size=c, fill_value=0)
                sub_rays = tuple(jnp.take(a, idxc, axis=0)
                                 for a in (o, d, inv_d))
                sub = tuple(jnp.take(a, idxc, axis=0) for a in state)
                sub_cond, sub_body = ix._wide_step_fns(
                    geo, *sub_rays, ANY, None)
                if max_steps:
                    sub, k = jax.lax.while_loop(
                        lambda st: sub_cond(st[0]) & (st[1] < max_steps),
                        lambda st: (sub_body(st[0]), st[1] + 1), (sub, 0))
                else:
                    sub, k = jax.lax.while_loop(
                        lambda st: sub_cond(st[0]),
                        lambda st: (sub_body(st[0]), st[1] + 1), (sub, 0))
                return tuple(a.at[idxc].set(s)
                             for a, s in zip(state, sub)), k

            for item in schedule:
                if item[0] == "full":
                    state = jax.lax.fori_loop(
                        0, item[1], lambda i, st: body(st), state, unroll=2)
                    trips = trips + item[1]
                elif item[0] == "fwhile":
                    lim = n // item[1] if item[1] else 0

                    def fw_cond(st):
                        return jnp.sum(st[0][0] >= 0) > lim

                    state, k = jax.lax.while_loop(
                        fw_cond, lambda st: (body(st[0]), st[1] + 1),
                        (state, 0))
                    trips = trips + k
                elif item[0] == "rung":
                    c = max(n // item[1], 1024)
                    state, k = compact_run(state, c, item[2])
                    trips = trips + k
                elif item[0] == "ctail":
                    c = max(n // item[1], 1024)
                    state, k = compact_run(state, c, 0)
                    trips = trips + k
                    state, k2 = jax.lax.while_loop(
                        lambda st: cond(st[0]),
                        lambda st: (body(st[0]), st[1] + 1), (state, 0))
                    trips = trips + k2
                elif item[0] == "tail":
                    c = max(n // item[1], 1024)

                    def tail_body(st):
                        s2, k = compact_run(st[0], c, 0)
                        return s2, st[1] + 1, st[2] + k

                    state, iters, k = jax.lax.while_loop(
                        lambda st: cond(st[0]), tail_body, (state, 0, 0))
                    trips = trips + k
            return state[3], state[4], trips

        @jax.jit
        def run_iter(o, d, K):
            def it(i, carry):
                o_i, acc, tr = carry
                t, prim, trips = traverse(o_i, d, jnp.full(n, INF))
                o_i = o_i + jnp.minimum(t, 1.0)[:, None] * 1e-12
                return o_i, acc + jnp.sum(jnp.minimum(t, 1.0)), trips
            _, acc, trips = jax.lax.fori_loop(
                0, K, it, (o, jnp.float32(0), jnp.int32(0)))
            return acc, trips

        return run_iter

    variants = [
        ("prod p1(4)+ladder+tail64", [("full", 4), ("rung", 4, 8),
                                      ("rung", 8, 16), ("tail", 64)]),
        ("full-while to none", [("fwhile", 0)]),
        ("fwhile>n/32 + ctail32", [("fwhile", 32), ("ctail", 32)]),
        ("fwhile>n/8 + ctail8", [("fwhile", 8), ("ctail", 8)]),
        ("p1(8) + ctail8", [("full", 8), ("ctail", 8)]),
        ("p1(12) + ctail16", [("full", 12), ("ctail", 16)]),
    ]

    mode = "any-hit" if ANY else "closest"
    print(f"lanes=2^{args.lanes} chunk={args.chunk} mode={mode} "
          f"backend={jax.default_backend()}")
    base = None
    for vname, sched in variants:
        run = make(sched)
        t1, (a1, _) = timeit(run, o, d, 1)
        t9, (a9, trips) = timeit(run, o, d, 9)
        per = (t9 - t1) / 8
        chk = float(a9)
        if base is None:
            base = chk
        ok = "OK" if abs(chk - base) < 1e-3 * max(abs(base), 1) else "DIFF!"
        print(f"  {vname:28s} {per*1e3:8.2f} ms  trips={int(trips):4d} "
              f"checksum {ok}")


if __name__ == "__main__":
    main()
