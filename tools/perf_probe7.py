"""Shading-side anatomy on a hard chunk, in-jit iterated.

Times compute_interaction, emitted+light-pdf, lobe fetch, light choose+
sample, BSDF sample, sampler dims, camera setup, and film accumulate —
the non-traversal side of the bounce body — to rank the remaining
gather-bound costs.

Usage: python tools/perf_probe7.py [--lanes LOG2] [--chunk IDX]
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
    from tpurt.render import integrator as ig
    from tpurt.render.integrator import (_camera_setup, _emitted,
                                         _choice_pmf_at, make_shade_ctx,
                                         shade_sample)
    from tpurt.render.interaction import compute_interaction
    from tpurt.render.intersect import intersect_closest
    from tpurt.render.lights import choose_light, pdf_li_from_hit, sample_li

    n = 1 << args.lanes
    sd = load_scene(args.scene)
    job = build_job(sd)
    scene = job.scene
    spp = job.sampler.spp
    chunks = list(_chunk_lanes(job.film, spp, n))
    px, py, sidx, mask = chunks[min(args.chunk, len(chunks) - 1)]
    pxj, pyj, sidxj = (jnp.asarray(px), jnp.asarray(py), jnp.asarray(sidx))
    x0, _, y0, _ = job.film.crop

    @jax.jit
    def setup(px, py, sidx):
        pf, pfc, pl, o, d, rw, sctx, t = _camera_setup(
            job.sampler, job.camera, px, py, sidx, (x0, y0))
        hit = intersect_closest(scene.geo, o, d, jnp.full(n, 3e38))
        return o, d, hit

    o, d, hit = setup(pxj, pyj, sidxj)
    o, d = jax.block_until_ready((o, d))

    K = 9

    def iterate(fn):
        """Run fn(i, salt) K times inside one jit with a scalar data dep."""

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

    results = []

    def comp_si(i, salt):
        # roll indices by the loop counter so the gathers cannot be
        # hoisted out of the fori as loop-invariant
        h = hit._replace(b0=hit.b0 + salt,
                         prim=jnp.roll(hit.prim, i))
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

    key = jax.random.PRNGKey(0)
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
            scene, shade, si.ns, si.wo, uc + salt,
            u2[:, 0], u2[:, 1])
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
            job.sampler, job.camera, pxj, pyj,
            (sidxj + i) % spp, (x0, y0))
        return jnp.sum(o2) + jnp.sum(d2) + jnp.sum(pf) + salt
    results.append(("camera setup (5 dims + gen)", iterate(cam)))

    film = job.film
    pf2 = jnp.stack([pxj.astype(jnp.float32), pyj.astype(jnp.float32)], -1)
    Lw = jnp.abs(jax.random.normal(key, (n, 3)))

    def filmadd(i, salt):
        st = film.initial_state()
        st = film.add_samples(st, pf2 + salt, Lw,
                              jnp.ones(n, jnp.float32))
        return jnp.sum(st.rgb)
    results.append(("film add_samples", iterate(filmadd)))

    print(f"lanes=2^{args.lanes} chunk={args.chunk} "
          f"backend={jax.default_backend()}")
    for name, t in results:
        print(f"  {name:30s} {t*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
