"""Traversal + driver-loop anatomy probe.

Decomposes the ~flat per-call traversal cost into phase-1 lockstep,
ladder rungs, and the run-to-completion tail (by composing custom
schedules from _wide_step_fns), counts while-loop trips, and times the
driver's step-with-film path including host->device transfers.

Usage: python tools/perf_probe2.py [--lanes LOG2]
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
    px, py, sidx, mask = next(_chunk_lanes(job.film, spp, n))
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

    def make_variant(schedule):
        """schedule: list of ('full', steps) | ('full_while',) |
        ('rung', div, max_steps) | ('tail', div) — composed the same way
        _traverse_wide does."""

        @jax.jit
        def run(o, d, t_max):
            t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
            inv_d = jnp.where(d != 0, 1.0 / d,
                              jnp.where(d >= 0, INF, -INF))
            cur = jnp.where(t_max > 0, 0, -1).astype(jnp.int32)
            state = (cur, jnp.zeros(n, jnp.int32),
                     jnp.zeros((n, S), jnp.int32), t_max,
                     jnp.full(n, -1, jnp.int32), jnp.zeros(n, jnp.float32),
                     jnp.zeros(n, jnp.float32))
            cond, body = ix._wide_step_fns(geo, o, d, inv_d, False, None)
            trips = jnp.int32(0)

            def compact_run(state, c, max_steps):
                (idxc,) = jnp.nonzero(state[0] >= 0, size=c, fill_value=0)
                sub_rays = tuple(jnp.take(a, idxc, axis=0)
                                 for a in (o, d, inv_d))
                sub = tuple(jnp.take(a, idxc, axis=0) for a in state)
                sub_cond, sub_body = ix._wide_step_fns(
                    geo, *sub_rays, False, None)
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
                elif item[0] == "full_while":
                    state, k = jax.lax.while_loop(
                        lambda st: cond(st[0]),
                        lambda st: (body(st[0]), st[1] + 1), (state, 0))
                    trips = trips + k
                elif item[0] == "rung":
                    c = max(n // item[1], 1024)
                    state, k = compact_run(state, c, item[2])
                    trips = trips + k
                elif item[0] == "tail":
                    c = max(n // item[1], 1024)

                    def tail_body(st):
                        s2, k = compact_run(st[0], c, 0)
                        return s2, st[1] + 1, st[2] + k

                    state, iters, k = jax.lax.while_loop(
                        lambda st: cond(st[0]), tail_body, (state, 0, 0))
                    trips = trips + k
            return state[3], state[4], trips

        return run

    variants = [
        ("phase1(4) only", [("full", 4)]),
        ("full-width to completion", [("full_while",)]),
        ("prod: p1+ladder+tail", [("full", 4), ("rung", 4, 8),
                                  ("rung", 8, 16), ("tail", 64)]),
        ("compact-only: ladder+tail", [("rung", 4, 8), ("rung", 8, 16),
                                       ("tail", 64)]),
        ("tail-only (n/16)", [("tail", 16)]),
    ]

    ray_sets = [("coherent", o, d, jnp.full(n, INF)),
                ("shuffled", o_s, d_s, jnp.full(n, INF))]
    live10 = jax.random.uniform(key, (n,)) < 0.1
    ray_sets.append(("10% alive", o_s, d_s, jnp.where(live10, INF, 0.0)))

    print(f"lanes=2^{args.lanes} backend={jax.default_backend()}")
    ref = {}
    for vname, sched in variants:
        run = make_variant(sched)
        for rname, ro, rd, rt in ray_sets:
            if vname == "phase1(4) only" and rname == "10% alive":
                continue
            t, (tb, pb, trips) = timeit(run, ro, rd, rt)
            done = ""
            if vname == "phase1(4) only":
                ref[rname] = np.asarray(pb)
            elif rname in ref or True:
                done = f" trips={int(trips)}"
            print(f"  {vname:28s} {rname:10s} {t*1e3:8.1f} ms{done}")

    # --- driver-loop anatomy: step with film + transfers ---
    radiance_fn = RADIANCE_FNS[job.cfg.name]
    film = job.film

    @partial(jax.jit, static_argnums=(3,), donate_argnums=(7,))
    def step(scene, camera, smplr, cfg, px, py, sidx, state, mask):
        out = radiance_fn(scene, smplr, camera, px, py, sidx, cfg,
                          crop_xy=(x0, y0), texture_eval=job.texture_eval)
        return film.add_samples(state, out["p_film"], out["L"],
                                out["ray_weight"], mask=mask)

    state = film.initial_state()
    maskj = jnp.asarray(mask)
    # warm
    state = step(job.scene, job.camera, job.sampler, job.cfg,
                 pxj, pyj, sidxj, state, maskj)
    jax.block_until_ready(state.rgb)
    # timed: device-resident lane data (no transfer)
    t0 = time.time()
    for _ in range(5):
        state = step(job.scene, job.camera, job.sampler, job.cfg,
                     pxj, pyj, sidxj, state, maskj)
    jax.block_until_ready(state.rgb)
    t_dev = (time.time() - t0) / 5
    # timed: numpy lane data (driver-realistic transfers)
    t0 = time.time()
    for _ in range(5):
        state = step(job.scene, job.camera, job.sampler, job.cfg,
                     jnp.asarray(px), jnp.asarray(py), jnp.asarray(sidx),
                     state, jnp.asarray(mask))
    jax.block_until_ready(state.rgb)
    t_np = (time.time() - t0) / 5
    print(f"  step+film, device-resident lanes: {t_dev*1e3:8.1f} ms")
    print(f"  step+film, numpy lanes (driver):  {t_np*1e3:8.1f} ms")


if __name__ == "__main__":
    main()
