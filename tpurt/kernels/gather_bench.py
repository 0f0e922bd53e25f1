"""Microbenchmark: per-lane dynamic row reads from a VMEM-resident table
inside a Pallas kernel vs XLA jnp.take from HBM.  Decides whether a
VMEM-resident Pallas traversal kernel can beat the jnp wide-BVH.

MEASURED (round 2, one v5e chip, M=16384 x 128 f32 table, B=8192 rows x
R=128 rounds, per-call blocking):
    pallas VMEM scalar-loop: 38.9 ns/row
    xla take HBM:            28.4 ns/row   (13 ns/row at 2^17-batch)
Conclusion: the XLA gather engine is the fastest random-row access this
hardware exposes; see tpurt/kernels/traverse.py for the full-kernel A/B
(jnp wide-BVH wins 5.9x).  Run: python -m tpurt.kernels.gather_bench
"""
import time, sys
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

M, REC = 16384, 128
B = 8192
R = 128
table = jnp.asarray(np.random.default_rng(0).normal(size=(M, REC)).astype(np.float32))
idx0 = jnp.asarray(np.random.default_rng(1).integers(0, M, B).astype(np.int32))

def kernel(idx_ref, table_ref, out_ref):
    def round_body(r, acc):
        def lane_body(i, acc):
            j = (idx_ref[i] + r * 40503) % M
            row = table_ref[pl.ds(j, 1), :]   # (1, REC) dynamic row
            return acc + row
        return jax.lax.fori_loop(0, B, lane_body, acc)
    acc = jnp.zeros((1, REC), jnp.float32)
    out_ref[:] = jax.lax.fori_loop(0, R, round_body, acc)

@jax.jit
def run(idx, table):
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, REC), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(idx, table)

@jax.jit
def run_xla(idx, table):
    def round_body(r, acc):
        j = (idx + r * 40503) % M
        return acc + jnp.sum(jnp.take(table, j, axis=0), axis=0, keepdims=True)
    return jax.lax.fori_loop(0, R, round_body, jnp.zeros((1, REC), jnp.float32))

for name, fn in [('pallas VMEM scalar-loop', run), ('xla take HBM', run_xla)]:
    try:
        r = fn(idx0, table); jax.block_until_ready(r)
        print('   checksum', float(r.sum()), flush=True)
        t0 = time.time()
        for _ in range(10):
            r = fn(idx0, table)
            jax.block_until_ready(r)
        dt = (time.time() - t0) / 10
        print(f'{name}: {dt*1e3:.2f} ms total, {dt/(B*R)*1e9:.2f} ns/row', flush=True)
    except Exception as e:
        print(f'{name}: FAILED: {type(e).__name__}: {str(e)[:300]}', flush=True)
