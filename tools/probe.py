"""On-chip perf probe tool — every measurement harness in one place.

Subcommands (each was a standalone perf_probe*.py in round 2; the
measured findings live in docs/ROADMAP.md):

  components   closest/any-hit traversal on coherent/shuffled/partially-
               dead wavefronts + the full integrator step  (ex perf_probe)
  schedule     traversal-schedule shootout on hard rays, in-jit iterated
               with trip counts                            (ex perf_probe5,
               superseding perf_probe2's blocking variant)
  body         step-body anatomy: node gather / tri bundle / box8+sort /
               stack ops, plus render-wall anatomy         (ex perf_probe3)
  depth        in-jit per-traversal cost, one body step, and the full
               integrator step at max_depth 0/2/5          (ex perf_probe4)
  driver       pipelined vs blocking chunk loop, per-chunk wall times
                                                           (ex perf_probe6)
  shading      non-traversal bounce costs: interaction, lights, lobes,
               bsdf, sampler dims, camera, film            (ex perf_probe7)
  fused        fused [closest; shadow] 2n-lane mixed traversal vs separate
               calls                                       (ex perf_probe8)
  rpf-filter   apply_rpf_filter stage anatomy on a synthetic buffer:
               window gather / +clustering+norm / +MI / full (+ splat)

Shared methodology: the axon tunnel costs ~27 ms per jit dispatch, so
sub-call costs are measured by iterating K times INSIDE one jit with a
data dependency and differencing against a 1-iteration call.

Usage: python tools/probe.py <subcommand> [--lanes LOG2] [--chunk IDX] ...
"""

import argparse
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

KILLEROO = "/root/reference/scenes/killeroo-simple.pbrt"


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


def setup_jax():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.expanduser(os.environ.get("TPURT_CACHE", "~/.cache/tpurt"))
        + "/jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return jax


def load_chunk(args, chunk_idx=None):
    """Common scene setup: job + one lane chunk (+ shuffled camera rays)."""
    import jax
    import jax.numpy as jnp

    from tpurt.scene import load_scene
    from tpurt.render.driver import build_job, _chunk_lanes
    from tpurt.render.integrator import _camera_setup

    n = 1 << args.lanes
    sd = load_scene(args.scene)
    job = build_job(sd)
    spp = job.sampler.spp
    chunks = list(_chunk_lanes(job.film, spp, n))
    idx = 0 if chunk_idx is None else min(chunk_idx, len(chunks) - 1)
    px, py, sidx, mask = chunks[idx]
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
    return dict(n=n, sd=sd, job=job, spp=spp, x0=x0, y0=y0, key=key,
                px=px, py=py, sidx=sidx, mask=mask,
                pxj=pxj, pyj=pyj, sidxj=sidxj,
                o=o, d=d, o_s=o_s, d_s=d_s)


def make_iterate(K=9):
    """In-jit iteration harness (see module docstring)."""
    import jax
    import jax.numpy as jnp

    def iterate(fn):
        def runner(ksteps):
            @jax.jit
            def run():
                def it(i, acc):
                    return acc + fn(i, acc * 1e-30)
                return jax.lax.fori_loop(0, ksteps, it, jnp.float32(0))
            return run

        t1, _ = timeit(runner(1))
        t9, _ = timeit(runner(K))
        return (t9 - t1) / (K - 1)

    return iterate


def _compose_schedule(geo, o, d, n, any_hit, schedule):
    """Build a traversal from schedule items, as _traverse_wide composes
    them: ('full', k) fori k | ('fwhile', div) full-width while until
    alive < n/div (0 -> none) | ('rung', div, k) one bounded compaction |
    ('ctail', div) ONE compact-to-completion + finishing fwhile |
    ('tail', div) outer while of compactions."""
    import jax
    import jax.numpy as jnp

    from tpurt.render import intersect as ix

    INF = jnp.float32(3e38)
    S = geo.wstack_depth

    def traverse(o_i, d_i, t_max):
        inv_d = jnp.where(d_i != 0, 1.0 / d_i,
                          jnp.where(d_i >= 0, INF, -INF))
        cur = jnp.where(t_max > 0, 0, -1).astype(jnp.int32)
        state = (cur, jnp.zeros(n, jnp.int32),
                 jnp.zeros((n, S), jnp.int32), t_max,
                 jnp.full(n, -1, jnp.int32), jnp.zeros(n, jnp.float32),
                 jnp.zeros(n, jnp.float32))
        cond, body = ix._wide_step_fns(geo, o_i, d_i, inv_d, any_hit, None)
        trips = jnp.int32(0)

        def compact_run(state, c, max_steps):
            (idxc,) = jnp.nonzero(state[0] >= 0, size=c, fill_value=0)
            sub_rays = tuple(jnp.take(a, idxc, axis=0)
                             for a in (o_i, d_i, inv_d))
            sub = tuple(jnp.take(a, idxc, axis=0) for a in state)
            sub_cond, sub_body = ix._wide_step_fns(
                geo, *sub_rays, any_hit, None)
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
                state, k = jax.lax.while_loop(
                    lambda st: jnp.sum(st[0][0] >= 0) > lim,
                    lambda st: (body(st[0]), st[1] + 1), (state, 0))
                trips = trips + k
            elif item[0] == "rung":
                c = max(n // item[1], 1024)
                state, k = compact_run(state, c, item[2])
                trips = trips + k
            elif item[0] == "ctail":
                c = max(n // item[1], 1024)
                state, k = compact_run(state, c, 0)
                state, k2 = jax.lax.while_loop(
                    lambda st: cond(st[0]),
                    lambda st: (body(st[0]), st[1] + 1), (state, 0))
                trips = trips + k + k2
            elif item[0] == "tail":
                c = max(n // item[1], 1024)

                def tail_body(st):
                    s2, k = compact_run(st[0], c, 0)
                    return s2, st[1] + 1, st[2] + k

                state, _, k = jax.lax.while_loop(
                    lambda st: cond(st[0]), tail_body, (state, 0, 0))
                trips = trips + k
        return state[3], state[4], trips

    return traverse


# ---------------------------------------------------------------- components

def cmd_components(args):
    jax = setup_jax()
    import jax.numpy as jnp
    import numpy as np

    from tpurt.render.integrator import RADIANCE_FNS
    from tpurt.render.intersect import intersect_closest, intersect_any

    c = load_chunk(args)
    n, job = c["n"], c["job"]
    geo = job.scene.geo
    INF = jnp.float32(3e38)

    closest = jax.jit(lambda o, d, t: intersect_closest(geo, o, d, t))
    anyhit = jax.jit(lambda o, d, t: intersect_any(geo, o, d, t))

    t_coh, _ = timeit(closest, c["o"], c["d"], jnp.full(n, INF))
    t_shuf, _ = timeit(closest, c["o_s"], c["d_s"], jnp.full(n, INF))
    t_any, _ = timeit(anyhit, c["o_s"], c["d_s"], jnp.full(n, INF))
    rows = [("closest coherent", t_coh), ("closest shuffled", t_shuf),
            ("any-hit shuffled", t_any)]
    for frac in (0.5, 0.25, 0.1):
        live = jax.random.uniform(c["key"], (n,)) < frac
        tm = jnp.where(live, INF, 0.0)
        t_d, _ = timeit(closest, c["o_s"], c["d_s"], tm)
        rows.append((f"closest {int(frac*100)}% alive", t_d))
        t_da, _ = timeit(anyhit, c["o_s"], c["d_s"], tm)
        rows.append((f"any-hit {int(frac*100)}% alive", t_da))

    radiance_fn = RADIANCE_FNS[job.cfg.name]

    @partial(jax.jit, static_argnums=(3,))
    def full_step(px, py, sidx, cfg):
        return radiance_fn(job.scene, job.sampler, job.camera, px, py, sidx,
                           cfg, crop_xy=(c["x0"], c["y0"]),
                           texture_eval=job.texture_eval)

    t_step, out = timeit(full_step, c["pxj"], c["pyj"], c["sidxj"],
                         job.cfg, n=3)
    rows.append(("full integrator step", t_step))

    print(f"scene={args.scene} lanes=2^{args.lanes} "
          f"backend={jax.default_backend()}")
    for name, t in rows:
        print(f"  {name:24s} {t*1e3:8.1f} ms  ({n / t / 1e6:6.2f} Mlanes/s)")
    if "alive_per_bounce" in out:
        hist = np.asarray(out["alive_per_bounce"])
        fr = ", ".join(f"b{i}:{cnt/n:.3f}" for i, cnt in enumerate(hist))
        print(f"  survivors entering bounce k+1: {fr}")
    dpt = job.cfg.max_depth + 1
    est = t_shuf * (dpt - 1) + t_coh + t_any * dpt
    print(f"  traversal estimate {est*1e3:.1f} ms of {t_step*1e3:.1f} ms "
          f"step ({est/t_step*100:.0f}%), depth={dpt}")


# ------------------------------------------------------------------ schedule

def cmd_schedule(args):
    jax = setup_jax()
    import jax.numpy as jnp

    c = load_chunk(args, chunk_idx=args.chunk)
    n, geo = c["n"], c["job"].scene.geo
    o, d = c["o_s"], c["d_s"]
    INF = jnp.float32(3e38)

    def make(sched):
        traverse = _compose_schedule(geo, o, d, n, args.anyhit, sched)

        @jax.jit
        def run_iter(o_a, d_a, K):
            def it(i, carry):
                o_i, acc, tr = carry
                t, prim, trips = traverse(o_i, d_a, jnp.full(n, INF))
                o_i = o_i + jnp.minimum(t, 1.0)[:, None] * 1e-12
                return o_i, acc + jnp.sum(jnp.minimum(t, 1.0)), trips
            _, acc, trips = jax.lax.fori_loop(
                0, K, it, (o_a, jnp.float32(0), jnp.int32(0)))
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

    mode = "any-hit" if args.anyhit else "closest"
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


# ---------------------------------------------------------------------- body

def cmd_body(args):
    jax = setup_jax()
    import jax.numpy as jnp

    from tpurt.scene import load_scene
    from tpurt.render.driver import build_job, render
    from tpurt.render import intersect as ix

    t0 = time.time()
    sd = load_scene(args.scene)
    t_load = time.time() - t0
    t0 = time.time()
    job = build_job(sd)
    t_build1 = time.time() - t0
    t0 = time.time()
    job = build_job(sd)
    t_build2 = time.time() - t0
    print(f"load_scene {t_load:.2f}s  build_job first {t_build1:.2f}s  "
          f"second {t_build2:.2f}s")
    t0 = time.time()
    img, _ = render(sd, progress=False)
    t_render = time.time() - t0
    print(f"render() wall {t_render:.2f}s (incl build_job)")

    geo = job.scene.geo
    n = 1 << args.lanes
    nodes = geo.wnodes
    n_nodes = nodes.shape[0]
    key = jax.random.PRNGKey(0)
    cur = jax.random.randint(key, (n,), 0, n_nodes, dtype=jnp.int32)
    o = jax.random.normal(key, (n, 3), jnp.float32)
    d = o / jnp.linalg.norm(o, axis=-1, keepdims=True)
    INF = jnp.float32(3e38)
    inv_d = jnp.where(d != 0, 1.0 / d, INF)
    t_best = jnp.full(n, INF)
    S = geo.wstack_depth
    W = ix.WIDTH
    print(f"nodes {n_nodes} x {nodes.shape[1]} f32 "
          f"({nodes.nbytes/1e6:.1f} MB), stack depth {S}, "
          f"width {W}, leaf_k {ix.LEAF_K}")

    @jax.jit
    def g_gather(cur):
        rec = jnp.take(nodes, cur, axis=0)
        return jnp.sum(rec, axis=1)  # force materialization

    @jax.jit
    def g_tri(cur, t_best):
        rec = jnp.take(nodes, cur, axis=0)
        h, t, b0, b1 = ix._tri_bundle_test(o, d, t_best, rec)
        tk = jnp.where(h, t, INF)
        return jnp.min(tk, axis=1), jnp.argmin(tk, axis=1)

    @jax.jit
    def g_box(cur, t_best):
        rec = jnp.take(nodes, cur, axis=0)
        hit8, t_near = ix._box8_test(rec, o, inv_d, t_best)
        meta = jax.lax.bitcast_convert_type(rec[:, 6 * W:7 * W], jnp.int32)
        keys = [jnp.where(hit8[:, k], t_near[:, k], INF) for k in range(W)]
        vals = [meta[:, k] for k in range(W)]
        for i, j in ix._SORT8:
            swap = keys[i] > keys[j]
            keys[i], keys[j] = (jnp.where(swap, keys[j], keys[i]),
                                jnp.where(swap, keys[i], keys[j]))
            vals[i], vals[j] = (jnp.where(swap, vals[j], vals[i]),
                                jnp.where(swap, vals[i], vals[j]))
        return keys[0], vals[0]

    @jax.jit
    def g_stack(cur):
        sp = jnp.zeros(n, jnp.int32)
        stack = jnp.zeros((n, S), jnp.int32)
        iota_s = jnp.arange(S, dtype=jnp.int32)[None, :]
        n_hit = cur % W
        descend = n_hit > 0
        for k in range(1, W):
            wmask = descend & (k < n_hit)
            pos = sp + n_hit - 1 - k
            oh = (iota_s == pos[:, None]) & wmask[:, None]
            stack = jnp.where(oh, cur[:, None], stack)
        sp = jnp.where(descend, sp + jnp.maximum(n_hit - 1, 0), sp)
        sp_top = jnp.maximum(sp - 1, 0)
        top = jnp.sum(jnp.where(iota_s == sp_top[:, None], stack, 0), axis=1)
        return top, sp

    @jax.jit
    def g_body(cur, t_best):
        state = (cur, jnp.zeros(n, jnp.int32), jnp.zeros((n, S), jnp.int32),
                 t_best, jnp.full(n, -1, jnp.int32),
                 jnp.zeros(n, jnp.float32), jnp.zeros(n, jnp.float32))
        _, body = ix._wide_step_fns(geo, o, d, inv_d, False, None)
        st = body(state)
        return st[0], st[3]

    for name, fn, fargs in [
            ("node row gather (sum)", g_gather, (cur,)),
            ("gather + tri bundle", g_tri, (cur, t_best)),
            ("gather + box8 + sort", g_box, (cur, t_best)),
            ("stack push/pop only", g_stack, (cur,)),
            ("one full body step", g_body, (cur, t_best))]:
        t, _ = timeit(fn, *fargs)
        print(f"  {name:24s} {t*1e3:8.2f} ms")


# --------------------------------------------------------------------- depth

def cmd_depth(args):
    jax = setup_jax()
    import jax.numpy as jnp
    import numpy as np

    from tpurt.render.integrator import RADIANCE_FNS
    from tpurt.render import intersect as ix

    c = load_chunk(args, chunk_idx=args.chunk)
    n, job = c["n"], c["job"]
    geo = job.scene.geo
    o, d = c["o_s"], c["d_s"]
    INF = jnp.float32(3e38)
    S = geo.wstack_depth

    def iter_traverse(K, any_hit):
        @jax.jit
        def run(o_a, d_a):
            def it(i, carry):
                o_i, acc = carry
                t, prim, b0, b1 = ix._traverse_wide(geo, o_i, d_a,
                                                    jnp.full(n, INF),
                                                    any_hit)
                o_i = o_i + jnp.minimum(t, 1.0)[:, None] * 1e-12
                return o_i, acc + jnp.sum(jnp.minimum(t, 1.0))
            _, acc = jax.lax.fori_loop(0, K, it, (o_a, jnp.float32(0)))
            return acc
        return run

    print(f"lanes=2^{args.lanes} chunk={args.chunk} "
          f"backend={jax.default_backend()}")
    for any_hit, nm in ((False, "closest"), (True, "any-hit")):
        t1, _ = timeit(iter_traverse(1, any_hit), o, d)
        t9, _ = timeit(iter_traverse(9, any_hit), o, d)
        per = (t9 - t1) / 8
        print(f"  {nm} traversal (in-jit):     {per*1e3:8.2f} ms "
              f"({n/per/1e6:6.1f} Mrays/s)")

    def iter_body(K):
        @jax.jit
        def run(o_a, d_a):
            inv_d = jnp.where(d_a != 0, 1.0 / d_a, INF)
            _, body = ix._wide_step_fns(geo, o_a, d_a, inv_d, False, None)
            state = (jnp.zeros(n, jnp.int32), jnp.zeros(n, jnp.int32),
                     jnp.zeros((n, S), jnp.int32), jnp.full(n, INF),
                     jnp.full(n, -1, jnp.int32), jnp.zeros(n, jnp.float32),
                     jnp.zeros(n, jnp.float32))

            def it(i, st):
                st = body(st)
                return (jnp.where(st[0] < 0, 0, st[0]),) + st[1:]
            st = jax.lax.fori_loop(0, K, it, state)
            return st[3].sum() + st[1].sum()
        return run

    t1, _ = timeit(iter_body(2), o, d)
    t9, _ = timeit(iter_body(18), o, d)
    per = (t9 - t1) / 16
    print(f"  one full-width body step:  {per*1e3:8.2f} ms")

    radiance_fn = RADIANCE_FNS[job.cfg.name]
    for depth in (0, 2, 5):
        cfg = job.cfg._replace(max_depth=depth)

        @partial(jax.jit, static_argnums=(3,))
        def full_step(px, py, sidx, cfg):
            out = radiance_fn(job.scene, job.sampler, job.camera,
                              px, py, sidx, cfg, crop_xy=(c["x0"], c["y0"]),
                              texture_eval=job.texture_eval)
            return out["L"].sum(), out["alive_per_bounce"]

        t, (_, hist) = timeit(full_step, c["pxj"], c["pyj"], c["sidxj"],
                              cfg, n=3)
        fr = ", ".join(f"{cnt/n:.2f}" for cnt in np.asarray(hist))
        print(f"  step max_depth={depth}: {t*1e3:8.1f} ms  alive: [{fr}]")


# -------------------------------------------------------------------- driver

def cmd_driver(args):
    jax = setup_jax()
    import jax.numpy as jnp

    from tpurt.scene import load_scene
    from tpurt.render.driver import build_job, _chunk_lanes
    from tpurt.render.integrator import RADIANCE_FNS
    from tpurt.config import get_config

    sd = load_scene(args.scene)
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
    print(f"pipelined loop: {time.time() - t0:.2f}s")

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
    print(f"blocking loop:  {time.time() - t0:.2f}s  sum(chunks) "
          f"{sum(ts):.2f}s")
    print("per-chunk ms: " + " ".join(f"{t*1e3:.0f}" for t in ts))


# ------------------------------------------------------------------- shading

def cmd_shading(args):
    jax = setup_jax()
    import jax.numpy as jnp

    from tpurt.render.integrator import (_camera_setup, _emitted,
                                         _choice_pmf_at, make_shade_ctx,
                                         shade_sample)
    from tpurt.render.interaction import compute_interaction
    from tpurt.render.intersect import intersect_closest
    from tpurt.render.lights import choose_light, pdf_li_from_hit, sample_li

    c = load_chunk(args, chunk_idx=args.chunk)
    n, job = c["n"], c["job"]
    scene = job.scene
    spp = job.sampler.spp
    pxj, pyj, sidxj = c["pxj"], c["pyj"], c["sidxj"]

    @jax.jit
    def setup(px, py, sidx):
        pf, pfc, pl, o, d, rw, sctx, t = _camera_setup(
            job.sampler, job.camera, px, py, sidx, (c["x0"], c["y0"]))
        hit = intersect_closest(scene.geo, o, d, jnp.full(n, 3e38))
        return o, d, hit

    o, d, hit = setup(pxj, pyj, sidxj)
    o, d = jax.block_until_ready((o, d))
    iterate = make_iterate()
    results = []

    def comp_si(i, salt):
        h = hit._replace(b0=hit.b0 + salt, prim=jnp.roll(hit.prim, i))
        si = compute_interaction(scene.geo, h, o, d)
        return jnp.sum(si.p) + jnp.sum(si.ns)
    results.append(("compute_interaction", iterate(comp_si)))

    si = jax.jit(lambda: compute_interaction(scene.geo, hit, o, d))()
    si = jax.tree.map(jax.block_until_ready, si)

    def emit(i, salt):
        si2 = si._replace(p=jnp.roll(si.p, i, axis=0) + salt,
                          prim=jnp.roll(si.prim, i))
        Le, lrow = _emitted(scene, si2)
        lrow_c = jnp.maximum(lrow, 0)
        lpdf = pdf_li_from_hit(scene.lights, lrow_c, si2.p - 1.0, d,
                               si2.p, si2.ng)
        pmf = _choice_pmf_at(scene, lrow_c, "spatial", n, si2.p)
        return jnp.sum(Le) + jnp.sum(lpdf) + jnp.sum(pmf)
    results.append(("emitted + light pdf + pmf", iterate(emit)))

    def lobes(i, salt):
        si2 = si._replace(uv=si.uv + salt,
                          material_id=jnp.roll(si.material_id, i))
        shade = make_shade_ctx(scene, si2, job.texture_eval)
        return jnp.sum(shade.lobes.kd) + jnp.sum(shade.t)
    results.append(("make_shade_ctx (lobes)", iterate(lobes)))

    key = c["key"]
    u2 = jax.random.uniform(key, (n, 2))
    uc = jax.random.uniform(key, (n,))

    def light_sample(i, salt):
        p_i = jnp.roll(si.p, i, axis=0)
        lidx, pmf = choose_light(scene.lights, uc + salt, "spatial", p=p_i)
        ls = sample_li(scene.lights, lidx, p_i, u2)
        return jnp.sum(ls.li) + jnp.sum(ls.wi) + jnp.sum(pmf)
    results.append(("choose_light + sample_li", iterate(light_sample)))

    shade = jax.jit(lambda: make_shade_ctx(scene, si, job.texture_eval))()
    shade = jax.tree.map(jax.block_until_ready, shade)

    def bsdf_smp(i, salt):
        wi, f, pdf, is_spec, is_trans = shade_sample(
            scene, shade, si.ns, si.wo, uc + salt, u2[:, 0], u2[:, 1])
        return jnp.sum(wi) + jnp.sum(f) + jnp.sum(pdf)
    results.append(("bsdf (shade_sample)", iterate(bsdf_smp)))

    def dims(i, salt):
        s_i = (sidxj + i) % spp
        sctx = job.sampler.lane_ctx(pxj, pyj, s_i)
        acc = salt
        for dd in range(5, 11):
            acc = acc + jnp.sum(job.sampler.dim(pxj, pyj, s_i, dd, sctx))
        return acc
    results.append(("sampler dims x6", iterate(dims)))

    def cam(i, salt):
        pf, pfc, pl, o2, d2, rw, sctx, t = _camera_setup(
            job.sampler, job.camera, pxj, pyj, (sidxj + i) % spp,
            (c["x0"], c["y0"]))
        return jnp.sum(o2) + jnp.sum(d2) + jnp.sum(pf) + salt
    results.append(("camera setup (5 dims + gen)", iterate(cam)))

    film = job.film
    pf2 = jnp.stack([pxj.astype(jnp.float32), pyj.astype(jnp.float32)], -1)
    Lw = jnp.abs(jax.random.normal(key, (n, 3)))

    def filmadd(i, salt):
        st = film.initial_state()
        st = film.add_samples(st, pf2 + salt, Lw, jnp.ones(n, jnp.float32))
        return jnp.sum(st.rgb)
    results.append(("film add_samples", iterate(filmadd)))

    print(f"lanes=2^{args.lanes} chunk={args.chunk} "
          f"backend={jax.default_backend()}")
    for name, t in results:
        print(f"  {name:30s} {t*1e3:8.2f} ms")


# --------------------------------------------------------------------- fused

def cmd_fused(args):
    jax = setup_jax()
    import jax.numpy as jnp

    from tpurt.render.intersect import (intersect_any, intersect_closest,
                                        intersect_mixed)

    c = load_chunk(args, chunk_idx=args.chunk)
    n, geo = c["n"], c["job"].scene.geo
    o, d = c["o_s"], c["d_s"]
    hit = jax.jit(lambda: intersect_closest(geo, o, d, jnp.full(n, 3e38)))()
    p_hit = o + jnp.where(hit.valid, hit.t, 1.0)[:, None] * d
    lp = jnp.asarray([2.0, 8.0, -3.0])
    wi = lp[None, :] - p_hit
    dist = jnp.linalg.norm(wi, axis=-1)
    wi = wi / dist[:, None]
    t_sh = jnp.where(hit.valid, dist * 0.999, 0.0)
    INF = jnp.float32(3e38)
    iterate = make_iterate()

    def separate(i, salt):
        h = intersect_closest(geo, o + salt, d, jnp.full(n, INF))
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


# ---------------------------------------------------------------- rpf-filter

def cmd_rpf_filter(args):
    """apply_rpf_filter stage anatomy on a synthetic (H, W, S, 19) buffer
    shaped like the bench headline (700x700x8spp): window gather only,
    +clustering+normalize, +MI, full pixel filter, and the end-to-end
    apply (incl. chunking) + structured splat."""
    jax = setup_jax()
    import jax.numpy as jnp
    import numpy as np

    import tpurt.rpf.filter as F

    h = w = args.res
    s = args.spp
    box = args.box
    rng = np.random.default_rng(0)
    buf = rng.uniform(0, 1, (h, w, s, 19)).astype(np.float32)
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    buf[..., 0] = xx[..., None] + buf[..., 0]
    buf[..., 1] = yy[..., None] + buf[..., 1]
    bufj = jnp.asarray(buf)

    # end-to-end (includes chunk loop + python overhead)
    t0 = time.time()
    out = F.apply_rpf_filter(bufj, box)
    jax.block_until_ready(out)
    t_cold = time.time() - t0
    t0 = time.time()
    out = F.apply_rpf_filter(bufj, box)
    jax.block_until_ready(out)
    t_warm = time.time() - t0

    # stage variants at the production pixel_chunk
    bd = (box - 1) // 2
    k = box * box * s
    n_full = s + k
    n_mi = min(n_full, F.MI_MAX_SAMPLES)
    b_max = int(np.floor(np.sqrt(n_mi))) + 1
    padded = jnp.pad(bufj, ((bd, bd), (bd, bd), (0, 0), (0, 0)))
    valid = jnp.pad(jnp.ones((h, w), bool), ((bd, bd), (bd, bd)))
    pc = 512
    per_pixel = (n_mi * 19 * b_max * 6 + (19 * b_max) ** 2 * 4
                 + s * n_full * 17 * 4 * 3)
    while pc > max(8, int(1.5e9 // per_pixel)):
        pc //= 2
    ys = jnp.asarray(np.arange(pc, dtype=np.int32))
    xs = jnp.asarray(np.arange(pc, dtype=np.int32))
    n_calls = (h * w) // pc

    def stage_fn(stage):
        def one(py, px):
            win = jax.lax.dynamic_slice(
                padded, (py, px, 0, 0), (box, box, s, F.SD_LEN))
            val = jax.lax.dynamic_slice(valid, (py, px), (box, box))
            own = jax.lax.dynamic_slice(
                padded, (py + bd, px + bd, 0, 0),
                (1, 1, s, F.SD_LEN)).reshape(s, F.SD_LEN)
            window = win.reshape(k, F.SD_LEN)
            wv = jnp.repeat(val.reshape(-1), s)
            if stage == "gather":
                return jnp.sum(window) + jnp.sum(own)
            feats_own = own[:, F.FEAT]
            f_mean = jnp.mean(feats_own, axis=0)
            f_ex2 = jnp.mean(feats_own * feats_own, axis=0)
            f_std = jnp.sqrt(jnp.maximum(f_ex2 - f_mean * f_mean, 0.0))
            within = jnp.all(
                jnp.abs(window[:, F.FEAT] - f_mean) < 3.0 * f_std, axis=-1)
            center = jnp.zeros((box, box), bool).at[bd, bd].set(True)
            cand = wv & ~jnp.repeat(center.reshape(-1), s) & within
            nb = jnp.concatenate([own, window], axis=0)
            nb_mask = jnp.concatenate(
                [jnp.ones((s,), bool), cand]).astype(jnp.float32)[:, None]
            nn = jnp.sum(nb_mask)
            mu, sd_ = F._masked_mean_std(nb, nb_mask, axis=0)
            nb_norm = jnp.where(sd_ > 0, (nb - mu)
                                / jnp.where(sd_ == 0, 1.0, sd_), 0.0)
            if stage == "cluster+norm":
                return jnp.sum(nb_norm) + nn
            bins = jnp.maximum(jnp.int32(1), jnp.sqrt(nn).astype(jnp.int32))
            mi = F._mutual_information(nb_norm, nb_mask, nn, bins, b_max)
            return jnp.sum(mi)

        vone = jax.vmap(one)

        @jax.jit
        def run(ys, xs):
            return jnp.sum(vone(ys, xs))

        return run

    print(f"res={h}x{w} spp={s} box={box} pixel_chunk={pc} "
          f"n_calls={n_calls} b_max={b_max} "
          f"backend={jax.default_backend()}")
    print(f"  apply_rpf_filter cold:  {t_cold:8.2f} s")
    print(f"  apply_rpf_filter warm:  {t_warm:8.2f} s")
    for stage in ("gather", "cluster+norm", "mi"):
        run = stage_fn(stage)
        t, _ = timeit(run, ys, xs, n=3)
        print(f"  stage {stage:14s} {t*1e3:8.2f} ms/chunk "
              f"-> {t*n_calls:6.2f} s full frame")

    # structured splat on the filtered buffer
    from types import SimpleNamespace

    from tpurt.render.film import Film
    from tpurt.render.filters import Filter
    from tpurt.rpf.driver import splat_buffer

    film = Film(full_x=w, full_y=h, crop=(0, w, 0, h),
                filter=Filter("box", (0.5, 0.5), ()), filename="x.exr",
                scale=1.0, diagonal_m=0.035,
                max_sample_luminance=np.inf)
    t0 = time.time()
    img = splat_buffer(SimpleNamespace(film=film), out)
    t_splat_cold = time.time() - t0
    t0 = time.time()
    img = splat_buffer(SimpleNamespace(film=film), out)
    t_splat = time.time() - t0
    print(f"  structured splat: cold {t_splat_cold*1e3:.1f} ms, "
          f"warm {t_splat*1e3:.1f} ms (img mean {np.mean(img):.4f})")


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)

    def common(p, chunk=False):
        p.add_argument("--scene", default=KILLEROO)
        p.add_argument("--lanes", type=int, default=17)
        if chunk:
            p.add_argument("--chunk", type=int, default=15,
                           help="chunk index (15 = hard center chunk)")

    common(sub.add_parser("components"))
    p = sub.add_parser("schedule")
    common(p, chunk=True)
    p.add_argument("--anyhit", action="store_true")
    common(sub.add_parser("body"))
    common(sub.add_parser("depth"), chunk=True)
    p = sub.add_parser("driver")
    common(p)
    p.add_argument("--chunk-log2", type=int, default=0,
                   help="override wavefront chunk size (0 = config)")
    common(sub.add_parser("shading"), chunk=True)
    common(sub.add_parser("fused"), chunk=True)
    p = sub.add_parser("rpf-filter")
    p.add_argument("--res", type=int, default=700)
    p.add_argument("--spp", type=int, default=8)
    p.add_argument("--box", type=int, default=7)

    args = ap.parse_args()
    {"components": cmd_components, "schedule": cmd_schedule,
     "body": cmd_body, "depth": cmd_depth, "driver": cmd_driver,
     "shading": cmd_shading, "fused": cmd_fused,
     "rpf-filter": cmd_rpf_filter}[args.cmd](args)


if __name__ == "__main__":
    main()
