"""Metropolis light transport: Kelemen-style primary-sample-space MLT over
the bidirectional path tracer.

Reference analog: integrators/mlt.{h,cpp} — MLTSampler (mlt.h:53-105,
per-dimension lazy small/large mutations), bootstrap phase + chain
normalization b (mlt.cpp:165-220), Metropolis chains splatting both the
current and proposed states with the Kelemen weights (:221-285), and the
single-(s,t)-strategy evaluation L() (:100-140) built on ConnectBDPT.

TPU design: chains ARE wavefront lanes.  A chain's state is one row of a
primary-sample-space matrix X (N, DIMS); bdpt_radiance's static dimension
schedule makes DIMS fixed, and a VectorSampler replays X rows through the
exact bdpt machinery (depth_select restricts to one path depth per chain
group; a per-lane s_select picks the connection strategy, mirroring the
reference's uniform strategy choice).  Each Metropolis step is one jitted
wavefront: mutate X, evaluate, accept/reject, splat both states.

Mutation schedule fidelity (mlt.h:53-105): the reference's per-dimension
LAZY small steps reduce exactly to a whole-vector form here because
bdpt's static dimension schedule consumes EVERY dimension every
iteration, so all dims share one lastModificationIteration per chain.
The one surviving behavior — Restore() reverting
lastModificationIteration on rejection so a k-long rejection streak
proposes from the original point with effSigma = sigma*sqrt(k) — is
carried as the per-chain `n_since` counter in chain_steps.
"""

from __future__ import annotations

import logging
import time
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from tpurt.render.bdpt import bdpt_radiance
from tpurt.render.driver import build_job
from tpurt.utils.stats import STATS

log = logging.getLogger("tpurt.mlt")


class VectorSampler(NamedTuple):
    """Sampler protocol over explicit primary-sample rows (N, DIMS)."""

    X: jnp.ndarray
    res_x: int
    res_y: int
    spp: int = 1
    name: str = "pss"

    def lane_ctx(self, px, py, sidx):
        return None

    def dim(self, px, py, sidx, d, ctx=None):
        return self.X[:, d]

    def dim_dyn(self, px, py, sidx, d, ctx=None):
        return jax.lax.dynamic_slice_in_dim(self.X, d, 1, axis=1)[:, 0]

    # dims 0/1 map to the FULL film plane (mlt.cpp: the camera stream's
    # first two samples choose the raster position)
    def film_offset(self, px, py, sidx, ctx=None):
        return self.X[:, 0] * self.res_x, self.X[:, 1] * self.res_y


from tpurt.pytrees import register_static_pytree  # noqa: E402

register_static_pytree(VectorSampler, ["X"])


def n_dims_for(max_depth: int, has_media: bool = False) -> int:
    """Length of bdpt's static dimension schedule + 1 strategy-select dim.
    Media scenes use 5 walk dims per bounce (+channel/+distance)."""
    dpb = 5 if has_media else 3
    t_max_v = max_depth + 2
    s_max_v = max_depth + 1
    bl = 5 + dpb * (t_max_v - 1)
    bc = bl + 5 + dpb * (s_max_v - 1)
    return bc + 3 * (t_max_v - 1) + 1


def _strategy_pairs(depth: int, max_depth: int):
    """(s, t) pairs bdpt evaluates for this depth, in its loop order."""
    t_max_v = max_depth + 2
    s_max_v = max_depth + 1
    pairs = []
    for t in range(1, t_max_v + 1):
        for s in range(0, s_max_v + 1):
            if (s == 1 and t == 1) or s + t - 2 != depth:
                continue
            pairs.append((s, t))
    return pairs


def make_mlt_eval(job, depth: int):
    """Build eval(X) -> (value (N,3), raster (N,2)) for one path depth."""
    cfg = job.cfg
    film = job.film
    max_depth = cfg.max_depth
    n_strat = depth + 2
    pairs = _strategy_pairs(depth, max_depth)
    t1_row = next((i for i, (s, t) in enumerate(pairs) if t == 1), -1)

    def eval_x(scene, camera, X):
        n = X.shape[0]
        sampler = VectorSampler(X=X, res_x=film.width, res_y=film.height)
        zeros = jnp.zeros(n, jnp.int32)
        s_select = jnp.minimum((X[:, -1] * n_strat).astype(jnp.int32),
                               n_strat - 1)
        out = bdpt_radiance(scene, sampler, camera, zeros, zeros, zeros,
                            cfg, crop_xy=(0, 0),
                            texture_eval=job.texture_eval,
                            depth_select=depth, s_select=s_select)
        k = len(pairs)
        sp = out["splat_p"].reshape(k, n, 2)
        sl = out["splat_L"].reshape(k, n, 3)
        value = jnp.sum(sl, axis=0)  # one strategy fires per lane
        raster = out["p_film"]
        if t1_row >= 0:
            sel_t1 = s_select == pairs[t1_row][0]
            raster = jnp.where(sel_t1[:, None], sp[t1_row], raster)
        return value, raster

    return eval_x


def _lum(c):
    return (0.212671 * c[:, 0] + 0.715160 * c[:, 1] + 0.072169 * c[:, 2])


def render_mlt(sd, quick: bool = False, crop_override=None,
               n_chains: int = 1 << 14, n_bootstrap: int = 1 << 17,
               return_state: bool = False):
    """The full MLT pipeline: bootstrap -> per-depth Metropolis chains.

    Defaults differ from the reference's (1000 chains / 100k bootstraps)
    in shape only: chains are wavefront lanes, so MANY short chains keep
    the TPU full; the estimator is the same.
    """
    job = build_job(sd, quick=quick, crop_override=crop_override)
    ps = sd.integrator_params
    max_depth = ps.find_one_int("maxdepth", 5)
    mpp = ps.find_one_int("mutationsperpixel", 100)
    sigma = ps.find_one_float("sigma", 0.01)
    p_large = ps.find_one_float("largestepprobability", 0.3)
    if quick:
        mpp = max(1, mpp // 16)
    film = job.film
    scene, camera = job.scene, job.camera
    dims = n_dims_for(max_depth, has_media=scene.has_media)
    depths = list(range(max_depth + 1))

    evals = {d: jax.jit(make_mlt_eval(job, d)) for d in depths}

    # ---- bootstrap: per-depth normalization + chain seeds (mlt.cpp:165).
    # The image scales LINEARLY with the b_d estimates (for concentrated
    # contributions the Kelemen weights reduce to f*b_est/b_true), so the
    # bootstrap must be large — the reference uses 100k samples for the
    # same reason (mlt.cpp "nBootstrap").  ----
    key = jax.random.key(ps.find_one_int("seed", 0))
    b_per_depth = {}
    boot_x = {}
    boot_y = {}
    for d in depths:
        key, k = jax.random.split(key)
        X = jax.random.uniform(k, (n_bootstrap, dims), jnp.float32)
        val, _ = evals[d](scene, camera, X)
        y = _lum(val)
        boot_x[d] = X
        boot_y[d] = y
        b_per_depth[d] = float(jnp.mean(y))
    b = float(np.sum(list(b_per_depth.values())))
    if b <= 0:
        log.warning("MLT bootstrap found no light-carrying paths")
        return film.to_image(film.initial_state()), job
    log.info("MLT bootstrap: b=%g per-depth=%s", b,
             {d: round(v, 6) for d, v in b_per_depth.items()})

    total_mutations = mpp * film.width * film.height
    state = film.initial_state()

    @partial(jax.jit, static_argnums=(0,), donate_argnums=(6,))
    def chain_steps(depth, n_steps, key, X, y, cur_raster, state, cur_L,
                    w_scale, b_d, n_since, n_accept):
        def body(i, carry):
            key, X, y, cur_raster, cur_L, st, n_since, n_acc = carry
            key, k1, k2, k3, k4 = jax.random.split(key, 5)
            n = X.shape[0]
            large = jax.random.uniform(k1, (n,)) < p_large
            Xl = jax.random.uniform(k2, X.shape)
            # MLTSampler small step (mlt.h:53-105 / mlt.cpp EnsureReady):
            # per-dimension LAZY mutation reduces, when every dimension is
            # consumed every iteration (bdpt's static schedule does), to a
            # whole-vector Gaussian with effSigma = sigma * sqrt(nSmall),
            # nSmall = iterations since this chain's last ACCEPTED
            # modification — PrimarySample::Restore reverts
            # lastModificationIteration on rejection, so rejection streaks
            # propose from the original point with a sqrt(k)-widened step.
            eff_sigma = sigma * jnp.sqrt(n_since.astype(jnp.float32))
            Xs = (X + eff_sigma[:, None]
                  * jax.random.normal(k3, X.shape)) % 1.0
            Xp = jnp.where(large[:, None], Xl, Xs)
            val, raster = evals[depth](scene, camera, Xp)
            yp = _lum(val)
            a = jnp.minimum(1.0, yp / jnp.maximum(y, 1e-20))
            a = jnp.where(y <= 0, 1.0, a)
            # the Kelemen weight denominators use the PER-DEPTH chain
            # normalization b_d = E_u[lum] of this depth group: the chain's
            # stationary density is y/b_d, and the algebra
            # (y/b_d + pL)/(y/b_d + pL) = 1 only cancels with its own b_d
            # (a global b left a 2.5x energy error, measured)
            w_new = (w_scale * (a + large) / (yp / b_d + p_large))[:, None]
            w_old = (w_scale * (1.0 - a) / (y / b_d + p_large))[:, None]
            st = film.add_splats(st, raster, val * w_new)
            st = film.add_splats(st, cur_raster, cur_L * w_old)
            accept = jax.random.uniform(k4, (n,)) < a
            X = jnp.where(accept[:, None], Xp, X)
            y = jnp.where(accept, yp, y)
            cur_raster = jnp.where(accept[:, None], raster, cur_raster)
            cur_L = jnp.where(accept[:, None], val, cur_L)
            n_since = jnp.where(accept, 1, n_since + 1)
            n_acc = n_acc + jnp.sum(accept.astype(jnp.int32))
            return key, X, y, cur_raster, cur_L, st, n_since, n_acc

        out = jax.lax.fori_loop(
            0, n_steps, body,
            (key, X, y, cur_raster, cur_L, state, n_since, n_accept))
        return out

    t0 = time.time()
    ran = 0
    for d in depths:
        share = b_per_depth[d] / b
        mutations_d = int(total_mutations * share)
        if mutations_d == 0:
            continue
        chains = min(n_chains, max(256, mutations_d))
        steps = max(1, mutations_d // chains)
        ran += chains * steps
        # per-depth normalization: each mutation of this group deposits
        # I_p^(depth)/n_pixels in expectation (the Kelemen weights carry
        # 1/b), so the group is scaled by n_pixels / its OWN mutation
        # count — a single global 1/mutationsPerPixel would skew depths
        # by their chain allocation
        w_scale = jnp.float32(film.width * film.height / (chains * steps))
        # chain seeds ~ bootstrap luminance (mlt.cpp:213)
        key, k = jax.random.split(key)
        probs = boot_y[d] / jnp.maximum(jnp.sum(boot_y[d]), 1e-20)
        idx = jax.random.choice(k, n_bootstrap, (chains,), p=probs)
        X = boot_x[d][idx]
        val, raster = evals[d](scene, camera, X)
        y = _lum(val)
        # chunk steps so each device call stays under the watchdog
        per_call = max(1, min(steps, 64))
        done = 0
        n_since = jnp.ones(chains, jnp.int32)
        n_accept = jnp.zeros((), jnp.int32)
        while done < steps:
            key, k = jax.random.split(key)
            n_now = min(per_call, steps - done)
            k, X, y, raster, val, state, n_since, n_accept = chain_steps(
                d, n_now, k, X, y, raster, state, val, w_scale,
                jnp.float32(b_per_depth[d]), n_since, n_accept)
            done += n_now
        acc_rate = float(n_accept) / max(chains * steps, 1)
        STATS.counter("MLT/Mutations proposed", chains * steps)
        STATS.counter("MLT/Mutations accepted", int(n_accept))
        log.info("MLT depth %d: %d chains x %d steps (acceptance %.1f%%)",
                 d, chains, steps, 100.0 * acc_rate)
    jax.block_until_ready(state.splat)
    log.info("MLT chains: %.1fs", time.time() - t0)

    # the per-depth w_scale above completes the normalization — unlike
    # the reference's plain-Metropolis splats (L*a/L.y()) which defer it
    # to WriteImage(b / mutationsPerPixel) (mlt.cpp:285)
    img = film.to_image(state, splat_scale=1.0)
    if return_state:
        return img, job, state
    return img, job
