"""Step-body + driver-wall anatomy.

(a) times build_job (scene flatten + BVH build) vs the chunk loop to
    explain the render() wall-clock;
(b) decomposes one full-width traversal step into node gather, leaf
    triangle-bundle test, interior box8+sort, and stack push/pop costs.

Usage: python tools/perf_probe3.py [--lanes LOG2]
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
    from tpurt.render.driver import build_job, render
    from tpurt.render import intersect as ix

    # (a) wall anatomy
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

    # (b) step-body anatomy
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
    K = ix.LEAF_K
    print(f"nodes {n_nodes} x {nodes.shape[1]} f32 "
          f"({nodes.nbytes/1e6:.1f} MB), stack depth {S}, "
          f"width {W}, leaf_k {K}")

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
        meta = jax.lax.bitcast_convert_type(
            rec[:, 6 * W:7 * W], jnp.int32)
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


if __name__ == "__main__":
    main()
