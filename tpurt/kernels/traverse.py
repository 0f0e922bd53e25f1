"""Pallas wide-BVH traversal kernel (the SURVEY §2.4/§3.3 "flagship
kernel" experiment) + its recorded A/B against the jnp wide-BVH.

Reference analog: accelerators/bvh.cpp:662-700 (iterative stack traversal).

DESIGN.  Lanes are processed in blocks of ``BLOCK`` rays per grid
program.  The full (M, 128) node table is pinned in VMEM (8.4 MB for
killeroo — fits), the per-lane traversal stack lives in a VMEM scratch,
and each while-step (a) fetches every live lane's current node record
with a scalar fori_loop of dynamic row slices from the VMEM table, then
(b) runs the same vectorized leaf-bundle / 8-box step math as the jnp
path on the (BLOCK, 128) gathered block.

MEASURED RESULT (round 2, one v5e chip, killeroo, 2^17 shuffled lanes):

  per-row fetch microbenchmark (tpurt/kernels/gather_bench.py):
    Pallas VMEM scalar-loop row reads . 38.9 ns/row
    XLA jnp.take from HBM (B=8192) .... 28.4 ns/row
    XLA jnp.take from HBM (B=2^17) .... ~13 ns/row (production batch)

  end-to-end closest-hit traversal (same rays, hit agreement 1.0):
    jnp wide-BVH (intersect.py) ....... 67.3 ms  (1.95 Mrays/s)
    this kernel ....................... 398.1 ms (0.33 Mrays/s) — 5.9x
                                        slower: the scalar fetch loop
                                        (38.9 ns/row) plus no straggler
                                        compaction (each 256-lane block
                                        runs to its WORST lane's depth)

The TPU's gather engine (what jnp.take lowers to) is simply the fastest
random-row access this hardware has; a Mosaic scalar loop issues one
dynamic slice per iteration and cannot beat it, and a one-hot MXU gather
at M=16k costs ~4.2 MFLOP/lane/step (~21 ns/lane at peak bf16) plus
one-hot construction — also no win.  The jnp wide-BVH therefore REMAINS
the production traversal; this kernel is kept as the recorded experiment
and a correctness-tested fallback (interpret mode runs on CPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from tpurt.geom.wbvh import LEAF_K, REC, SLOT_KIND, WIDTH

BLOCK = 256  # rays per grid program
MAX_STEPS = 4096  # safety bound on while-steps per block

_INF = np.float32(np.inf)


def _kernel(nodes_ref, rays_ref, out_ref, rows_ref, stack_ref, cur_col_ref,
            *, n_nodes: int, stack_depth: int):
    """One block of BLOCK rays, full traversal to completion.

    rays_ref: (8, BLOCK) rows = ox oy oz dx dy dz tmax unused
    out_ref:  (8, BLOCK) rows = t prim(bitcast f32) b0 b1 0 0 0 0
    rows_ref: (BLOCK, REC) gathered node records scratch
    stack_ref: (stack_depth, BLOCK) i32 scratch
    cur_col_ref: (BLOCK, 1) i32 — sublane-major copy of `cur` so the
      fetch loop can read per-lane node ids as scalars (dynamic indexing
      along the LANE dim is not TPU-friendly; along sublanes it is)
    """
    from jax.experimental import pallas as pl

    o = rays_ref[0:3, :]  # (3, B)
    d = rays_ref[3:6, :]
    t_max = rays_ref[6, :]
    inv_d = jnp.where(d != 0, 1.0 / d, jnp.where(d >= 0, _INF, -_INF))

    iota_k = jax.lax.broadcasted_iota(jnp.int32, (BLOCK, LEAF_K), 1)

    def fetch():
        """Scalar loop: rows_ref[i] = nodes[max(cur_col[i], 0)]."""
        def body(i, _):
            j = jnp.maximum(cur_col_ref[i, 0], 0)
            rows_ref[pl.ds(i, 1), :] = nodes_ref[pl.ds(j, 1), :]
            return 0
        jax.lax.fori_loop(0, BLOCK, body, 0)

    def step(state):
        cur, sp, t_best, prim_best, b0_best, b1_best, steps = state
        live = cur[0] >= 0
        cur_col_ref[:, :] = jnp.reshape(cur, (BLOCK, 1))
        fetch()
        rec = rows_ref[:, :]  # (B, REC)
        is_leaf = rec[:, SLOT_KIND] > 0

        # --- leaf: 12-triangle bundle (same math as _tri_bundle_test) ---
        v0 = jnp.stack([rec[:, 0:12], rec[:, 12:24], rec[:, 24:36]], 0)
        v1 = jnp.stack([rec[:, 36:48], rec[:, 48:60], rec[:, 60:72]], 0)
        v2 = jnp.stack([rec[:, 72:84], rec[:, 84:96], rec[:, 96:108]], 0)
        # Moeller-Trumbore per bundle slot (vectorized over (B, 12))
        ob = o[:, :, None]
        db = d[:, :, None]
        e1 = v1 - v0
        e2 = v2 - v0
        px = db[1] * e2[2] - db[2] * e2[1]
        py = db[2] * e2[0] - db[0] * e2[2]
        pz = db[0] * e2[1] - db[1] * e2[0]
        det = e1[0] * px + e1[1] * py + e1[2] * pz
        inv_det = jnp.where(det != 0, 1.0 / det, 0.0)
        tx = ob[0] - v0[0]
        ty = ob[1] - v0[1]
        tz = ob[2] - v0[2]
        u = (tx * px + ty * py + tz * pz) * inv_det
        qx = ty * e1[2] - tz * e1[1]
        qy = tz * e1[0] - tx * e1[2]
        qz = tx * e1[1] - ty * e1[0]
        v = (db[0] * qx + db[1] * qy + db[2] * qz) * inv_det
        tt = (e2[0] * qx + e2[1] * qy + e2[2] * qz) * inv_det
        hk = ((det != 0) & (u >= 0) & (v >= 0) & (u + v <= 1)
              & (tt > 1e-5) & (tt < t_best[:, None]))
        tk = jnp.where(hk, tt, _INF)
        t_min = jnp.min(tk, axis=1)
        kbest = jnp.argmin(tk, axis=1)
        ohk = iota_k == kbest[:, None]
        prim_rows = jax.lax.bitcast_convert_type(rec[:, 108:120], jnp.int32)
        better = live & is_leaf & (t_min < t_best)
        t_best = jnp.where(better, t_min, t_best)
        prim_best = jnp.where(
            better, jnp.sum(jnp.where(ohk, prim_rows, 0), axis=1), prim_best)
        b0_best = jnp.where(
            better, jnp.sum(jnp.where(ohk, u, 0.0), axis=1), b0_best)
        b1_best = jnp.where(
            better, jnp.sum(jnp.where(ohk, v, 0.0), axis=1), b1_best)

        # --- interior: 8 child slab tests + near-first insertion ---
        t_near = jnp.full((BLOCK, WIDTH), -_INF)
        t_far = jnp.full((BLOCK, WIDTH), _INF)
        for a in range(3):
            lo = rec[:, a * WIDTH:(a + 1) * WIDTH]
            hi = rec[:, (3 + a) * WIDTH:(4 + a) * WIDTH]
            t0 = (lo - o[a][:, None]) * inv_d[a][:, None]
            t1 = (hi - o[a][:, None]) * inv_d[a][:, None]
            t_near = jnp.maximum(t_near, jnp.minimum(t0, t1))
            t_far = jnp.minimum(t_far, jnp.maximum(t0, t1))
        t_far = t_far * np.float32(1.0 + 6e-7)
        hit8 = (t_near <= t_far) & (t_far > 0) & (t_near < t_best[:, None])
        meta = jax.lax.bitcast_convert_type(rec[:, 48:56], jnp.int32)
        keys = [jnp.where(hit8[:, k], t_near[:, k], _INF)
                for k in range(WIDTH)]
        vals = [meta[:, k] for k in range(WIDTH)]
        from tpurt.render.intersect import _SORT8

        for i, j in _SORT8:
            swap = keys[i] > keys[j]
            keys[i], keys[j] = (jnp.where(swap, keys[j], keys[i]),
                                jnp.where(swap, keys[i], keys[j]))
            vals[i], vals[j] = (jnp.where(swap, vals[j], vals[i]),
                                jnp.where(swap, vals[i], vals[j]))
        n_hit = jnp.sum(hit8, axis=1).astype(jnp.int32)
        descend = live & ~is_leaf & (n_hit > 0)

        for k in range(1, WIDTH):
            wmask = descend & (k < n_hit)
            pos = sp[0] + n_hit - 1 - k
            iota_s = jax.lax.broadcasted_iota(
                jnp.int32, (stack_depth, BLOCK), 0)
            oh = (iota_s == pos[None, :]) & wmask[None, :]
            stack_ref[:, :] = jnp.where(oh, vals[k][None, :],
                                        stack_ref[:, :])
        spv = jnp.where(descend, sp[0] + jnp.maximum(n_hit - 1, 0), sp[0])

        pop = live & ~descend & (spv > 0)
        sp_top = jnp.maximum(spv - 1, 0)
        iota_s = jax.lax.broadcasted_iota(jnp.int32, (stack_depth, BLOCK), 0)
        top = jnp.sum(jnp.where(iota_s == sp_top[None, :],
                                stack_ref[:, :], 0), axis=0)
        nxt = jnp.where(descend, vals[0], jnp.where(pop, top, -1))
        spv = jnp.where(pop, spv - 1, spv)
        cur = jnp.where(live, nxt, cur[0])[None, :]
        return (cur, spv[None, :], t_best, prim_best, b0_best, b1_best,
                steps + 1)

    def cond(state):
        return jnp.any(state[0][0] >= 0) & (state[6] < MAX_STEPS)

    n = BLOCK
    state = (
        jnp.where(t_max > 0, 0, -1).astype(jnp.int32)[None, :],
        jnp.zeros((1, n), jnp.int32),
        t_max,
        jnp.full((n,), -1, jnp.int32),
        jnp.zeros((n,), jnp.float32),
        jnp.zeros((n,), jnp.float32),
        jnp.int32(0),
    )
    stack_ref[:, :] = jnp.zeros((stack_depth, n), jnp.int32)
    state = jax.lax.while_loop(cond, step, state)
    _, _, t, prim, b0, b1, _ = state
    primf = jax.lax.bitcast_convert_type(prim, jnp.float32)
    out_ref[:, :] = jnp.concatenate(
        [t[None, :], primf[None, :], b0[None, :], b1[None, :],
         jnp.zeros((4, n), jnp.float32)], axis=0)


@functools.partial(jax.jit, static_argnames=("stack_depth", "interpret"))
def traverse_closest_pallas(nodes: jnp.ndarray, o: jnp.ndarray,
                            d: jnp.ndarray, t_max: jnp.ndarray,
                            stack_depth: int = 64,
                            interpret: bool = False):
    """Closest-hit traversal of the wide-BVH node table with the Pallas
    kernel.  o, d: (N, 3); t_max: (N,).  N must be a multiple of BLOCK.
    Returns (t, prim, b0, b1) like intersect._traverse_wide.

    Triangles only (quadrics run in the separate vectorized pass, as in
    intersect.intersect_closest)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    assert WIDTH == 8 and REC == 128, \
        "the Pallas experiment kernel hardcodes the 8-wide/128-slot layout"
    n = o.shape[0]
    assert n % BLOCK == 0, f"lanes {n} not a multiple of {BLOCK}"
    rays = jnp.zeros((8, n), jnp.float32)
    rays = rays.at[0:3].set(o.T)
    rays = rays.at[3:6].set(d.T)
    rays = rays.at[6].set(jnp.broadcast_to(t_max, (n,)))

    kern = functools.partial(_kernel, n_nodes=nodes.shape[0],
                             stack_depth=stack_depth)
    out = pl.pallas_call(
        kern,
        grid=(n // BLOCK,),
        in_specs=[
            pl.BlockSpec((nodes.shape[0], REC), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, BLOCK), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, BLOCK), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, n), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((BLOCK, REC), jnp.float32),
            pltpu.VMEM((stack_depth, BLOCK), jnp.int32),
            pltpu.VMEM((BLOCK, 1), jnp.int32),
        ],
        interpret=interpret,
    )(nodes, rays)
    t = out[0]
    prim = jax.lax.bitcast_convert_type(out[1], jnp.int32)
    prim = jnp.where(jnp.isfinite(t), prim, -1)
    return t, prim, out[2], out[3]
