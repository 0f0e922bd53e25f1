"""Multi-chip rendering: shard_map over a device mesh.

Reference analog: the reference's ONLY parallelism is a single-process
pthread pool chunking tile ranges (core/parallel.cpp:112-227, SURVEY.md
§2.2).  The TPU-native replacement: wavefront lanes are data-parallel over
the "rows" mesh axis; each device traces its lane shard against the
replicated scene and accumulates a local film; film merge is ONE psum over
ICI per chunk (the scatter-add + mutex MergeFilmTile of film.cpp:117
becomes a collective).  The RPF filter shards image rows with a halo
exchange (ppermute) of box//2 rows — the renderer's analog of context
parallelism (SURVEY.md §5 long-context row).
"""

from __future__ import annotations

import logging
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpurt.render.film import FilmState

log = logging.getLogger("tpurt.parallel")


def make_mesh(n_devices: Optional[int] = None, axis: str = "rows") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (axis,))


def sharded_render_step(mesh: Mesh, radiance_fn, film, cfg, crop_xy,
                        axis: str = "rows", scatter_film: bool = False):
    """Build the pjit-ed multi-chip render step.

    Lanes (px, py, sidx, mask) are sharded over ``axis``; scene tables,
    camera, sampler, and the film state are replicated.  Each device
    accumulates its shard into a local zero film.

    scatter_film=False: the deltas are psummed over ICI (film replicated
    on every device — fine at 700^2, wasteful at 4k).
    scatter_film=True: the film STATE stays row-sharded across chunks and
    the merge is a psum_scatter (reduce_scatter over ICI: ~half the
    traffic of the all-reduce and 1/n the film memory per device); the
    caller pads film rows to a multiple of the device count and
    all_gathers once at the end (gather_film_state)."""

    def _local_psum(scene, camera, smplr, px, py, sidx, mask):
        out = radiance_fn(scene, smplr, camera, px, py, sidx, cfg,
                          crop_xy=crop_xy)
        local = film.add_samples(film.initial_state(), out["p_film"],
                                 out["L"], out["ray_weight"], mask=mask)
        return FilmState(
            rgb=jax.lax.psum(local.rgb, axis),
            weight=jax.lax.psum(local.weight, axis),
            splat=jax.lax.psum(local.splat, axis),
        )

    n_dev = mesh.devices.size

    def _local_scatter(scene, camera, smplr, px, py, sidx, mask):
        out = radiance_fn(scene, smplr, camera, px, py, sidx, cfg,
                          crop_xy=crop_xy)
        local = film.add_samples(film.initial_state(), out["p_film"],
                                 out["L"], out["ray_weight"], mask=mask)

        def pad_rows(a):
            h = a.shape[0]
            pad = (-h) % n_dev
            if pad:
                a = jnp.pad(a, ((0, pad),) + ((0, 0),) * (a.ndim - 1))
            return a

        def scatter(a):
            return jax.lax.psum_scatter(pad_rows(a), axis,
                                        scatter_dimension=0, tiled=True)

        return FilmState(rgb=scatter(local.rgb),
                         weight=scatter(local.weight),
                         splat=scatter(local.splat))

    _local = _local_scatter if scatter_film else _local_psum
    out_spec = P(axis) if scatter_film else P()

    def step(scene, camera, smplr, px, py, sidx, state, mask):
        # check_vma=False: jax 0.9's varying-axes fixpoint mis-promotes the
        # BVH while_loop carries under vmap-in-shard_map (it pvary's
        # already-varying carries); the body is replication-correct by
        # construction (psum on every output), so skip the checker.
        delta = jax.shard_map(
            _local,
            mesh=mesh,
            in_specs=(P(), P(), P(), P(axis), P(axis), P(axis), P(axis)),
            out_specs=jax.tree_util.tree_map(lambda _: out_spec,
                                             FilmState(0, 0, 0)),
            check_vma=False,
        )(scene, camera, smplr, px, py, sidx, mask)
        return FilmState(rgb=state.rgb + delta.rgb,
                         weight=state.weight + delta.weight,
                         splat=(state.splat + delta.splat if scatter_film
                                else state.splat))

    return jax.jit(step, donate_argnums=(6,))


def render_sharded(sd, mesh: Optional[Mesh] = None, quick: bool = False,
                   crop_override=None, scatter_film: bool = True):
    """Data-parallel render over all local devices (or the given mesh).

    scatter_film=True keeps the film state ROW-SHARDED across chunks
    (reduce_scatter merge, 1/n film memory per device) and gathers once
    at the end; False replicates the film and psums every chunk."""
    from tpurt.render.driver import _chunk_lanes, build_job
    from tpurt.render.integrator import RADIANCE_FNS

    if mesh is None:
        mesh = make_mesh()
    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size

    job = build_job(sd, quick=quick, crop_override=crop_override)
    film = job.film
    spp = job.sampler.spp
    x0, _, y0, _ = film.crop

    total = film.width * film.height * spp
    # chunk divisible by the device count
    chunk = max(n_dev * 8, (min(1 << 20, total) // (n_dev * 8)) * (n_dev * 8))
    step = sharded_render_step(mesh, RADIANCE_FNS[job.cfg.name], film,
                               job.cfg, (x0, y0), axis,
                               scatter_film=scatter_film)

    lane_sh = NamedSharding(mesh, P(axis))
    state0 = film.initial_state()
    h = state0.rgb.shape[0]
    if scatter_film:
        pad = (-h) % n_dev
        row_sh = NamedSharding(mesh, P(axis))
        state = jax.tree_util.tree_map(
            lambda a: jax.device_put(
                jnp.pad(a, ((0, pad),) + ((0, 0),) * (a.ndim - 1)), row_sh),
            state0)
    else:
        state = state0
    for px, py, sidx, mask in _chunk_lanes(film, spp, chunk):
        args = [jax.device_put(jnp.asarray(a), lane_sh)
                for a in (px, py, sidx, mask)]
        state = step(job.scene, job.camera, job.sampler,
                     args[0], args[1], args[2], state, args[3])
    jax.block_until_ready(state.rgb)
    if scatter_film:
        # one gather at render end (device->host fetch assembles shards)
        state = jax.tree_util.tree_map(lambda a: jnp.asarray(a)[:h], state)
    return film.to_image(state), job


def rpf_filter_sharded(mesh: Mesh, buffer: jnp.ndarray, box_size: int,
                       axis: str = "rows") -> jnp.ndarray:
    """RPF filter with the image rows sharded over the mesh and a halo
    exchange of box//2 rows between ring neighbors (ppermute over ICI).

    Ragged row counts are supported: the buffer is padded to a multiple
    of the device count, pad rows are masked out of every neighborhood
    by GLOBAL row validity, and the pad is sliced off the result."""
    from tpurt.rpf.filter import COL, _filter_pixel, SD_LEN
    import math

    h_orig = buffer.shape[0]
    n_dev = mesh.devices.size
    row_pad = (-h_orig) % n_dev
    if row_pad:
        buffer = jnp.pad(
            buffer, ((0, row_pad), (0, 0), (0, 0), (0, 0)))
    h, w, s, _ = buffer.shape
    bd = (box_size - 1) // 2
    k = box_size * box_size * s
    b_max = int(math.floor(math.sqrt(s + k))) + 1
    hs_static = h // n_dev
    if bd > hs_static:
        # halo wider than a shard: fall back to the single-device filter
        # (tiny shards of a huge box — not a useful sharding anyway)
        from tpurt.rpf.filter import apply_rpf_filter

        log.warning("rpf_filter_sharded: halo %d > shard rows %d; "
                    "running unsharded", bd, hs_static)
        return apply_rpf_filter(buffer, box_size)[:h_orig]

    def local(buf_shard, shard_idx):
        # exchange halo rows with ring neighbors
        up = jax.lax.ppermute(buf_shard[:bd], axis,
                              [(i, (i - 1) % n_dev) for i in range(n_dev)])
        down = jax.lax.ppermute(buf_shard[-bd:], axis,
                                [(i, (i + 1) % n_dev) for i in range(n_dev)])
        idx = jax.lax.axis_index(axis)
        hs = buf_shard.shape[0]
        # zero halos at the image boundary (ring wrap is invalid there)
        down = jnp.where(idx == 0, 0.0, down)  # rows above shard 0
        up = jnp.where(idx == n_dev - 1, 0.0, up)  # rows below the last
        ext = jnp.concatenate([down, buf_shard, up], axis=0)
        # GLOBAL row index of every ext row -> validity (masks both the
        # image-boundary halos and the ragged pad rows at the bottom)
        g_rows = idx * hs + jnp.arange(-bd, hs + bd)
        valid_rows = (g_rows >= 0) & (g_rows < h_orig)

        padded = jnp.pad(ext, ((0, 0), (bd, bd), (0, 0), (0, 0)))
        valid = jnp.pad(
            jnp.broadcast_to(valid_rows[:, None], (hs + 2 * bd, w)),
            ((0, 0), (bd, bd)))

        def one(py, px):
            win = jax.lax.dynamic_slice(
                padded, (py, px, 0, 0), (box_size, box_size, s, SD_LEN))
            val = jax.lax.dynamic_slice(valid, (py, px), (box_size, box_size))
            center = jnp.zeros((box_size, box_size), bool).at[bd, bd].set(True)
            own = jax.lax.dynamic_slice(
                padded, (py + bd, px + bd, 0, 0), (1, 1, s, SD_LEN)
            ).reshape(s, SD_LEN)
            return _filter_pixel(own, win.reshape(k, SD_LEN),
                                 jnp.repeat(val.reshape(-1), s),
                                 jnp.repeat(center.reshape(-1), s),
                                 box_size, b_max)

        ys, xs = jnp.meshgrid(jnp.arange(hs), jnp.arange(w), indexing="ij")
        cols = jax.vmap(one)(ys.reshape(-1), xs.reshape(-1))
        return buf_shard.at[..., COL].set(cols.reshape(hs, w, s, 3))

    fn = jax.shard_map(
        lambda b: local(b, None), mesh=mesh,
        in_specs=P(axis), out_specs=P(axis),
        check_vma=False,
    )
    out = jax.jit(fn)(buffer)
    return out[:h_orig] if row_pad else out
