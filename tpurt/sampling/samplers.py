"""Device-side samplers: pure functions (pixel, sample index, dimension) ->
uniform [0,1) floats.

Reference analog: core/sampler.h (the Sampler protocol and GlobalSampler
index remapping :106-116) and src/samplers/*.  The wavefront integrator
consumes a FIXED dimension schedule per bounce (pFilm 0-1, time 2, pLens
3-4, then per-bounce light/BSDF/RR dims — matching GetCameraSample's
consumption order, sampler.h:58), so ``dimension`` is a static Python int
and every sampler evaluates as batched elementwise math with no state.

- halton: bit-exact sample values vs HaltonSampler (scrambled radical
  inverse with the reference's PCG32 permutations; 128x128 pixel tiling
  index algebra, halton.cpp:74-135) up to f32 accumulation (~1e-7).
- random: counter-based threefry keyed by (pixel, sample, dim) — the
  TPU-native replacement for the per-tile PCG32 stream (statistically
  equivalent, not bit-equal).
- stratified: jittered strata in every dimension, samples associated by
  index in dims 0-1 and decorrelated by a per-(pixel,dim) permutation
  elsewhere (statistical analog of stratified.cpp's Shuffle).
- 02sequence / maxmindist / sobol: scrambled (0,2)-sequence for the 2D
  dims + stratified/random tail (full 1000-dim Sobol matrices are a later
  round; these match the reference's *statistical* behavior for the 2D
  uses that dominate rendering).
"""

from __future__ import annotations

import logging
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from tpurt.sampling import lowdiscrepancy as ld

log = logging.getLogger("tpurt.sampling")

ONE_MINUS_EPS = np.float32(1.0) - np.float32(2 ** -24)


def _bit_reverse32(x: jnp.ndarray) -> jnp.ndarray:
    x = ((x & 0x55555555) << 1) | ((x >> 1) & 0x55555555)
    x = ((x & 0x33333333) << 2) | ((x >> 2) & 0x33333333)
    x = ((x & 0x0F0F0F0F) << 4) | ((x >> 4) & 0x0F0F0F0F)
    x = ((x & 0x00FF00FF) << 8) | ((x >> 8) & 0x00FF00FF)
    x = (x << 16) | (x >> 16)
    return x


def _radical_inverse_base2(a: jnp.ndarray) -> jnp.ndarray:
    """Exact base-2 radical inverse of a 32-bit index."""
    rev = _bit_reverse32(a.astype(jnp.uint32))
    return jnp.minimum(rev.astype(jnp.float32) * jnp.float32(2.0 ** -32),
                       ONE_MINUS_EPS)


def _digits_needed(base: int, max_index: int = 1 << 31) -> int:
    n = 0
    v = 1
    while v < max_index:
        v *= base
        n += 1
    return n


def _scrambled_radical_inverse(a: jnp.ndarray, base: int,
                               perm: jnp.ndarray) -> jnp.ndarray:
    """Scrambled radical inverse with static base; float32 accumulation of
    the digit series (the reference accumulates in uint64 doubles —
    lowdiscrepancy.cpp ScrambledRadicalInverseSpecialized; differences are
    below f32 resolution)."""
    inv_base = np.float32(1.0 / base)
    acc = jnp.zeros_like(a, dtype=jnp.float32)
    scale = jnp.full(a.shape, inv_base, dtype=jnp.float32)
    inv_base_n = jnp.ones_like(a, dtype=jnp.float32)
    for _ in range(_digits_needed(base)):
        digit = a % base
        active = a > 0
        acc = jnp.where(active, acc + perm[digit].astype(jnp.float32) * scale, acc)
        inv_base_n = jnp.where(active, inv_base_n * inv_base, inv_base_n)
        scale = scale * inv_base
        a = a // base
    tail = inv_base_n * perm[0].astype(jnp.float32) / np.float32(base - 1)
    return jnp.minimum(acc + tail, ONE_MINUS_EPS)


def _scrambled_radical_inverse_dyn(a: jnp.ndarray, base: jnp.ndarray,
                                   perms: jnp.ndarray,
                                   perm_off: jnp.ndarray,
                                   n_digits: int) -> jnp.ndarray:
    """Scrambled radical inverse with a TRACED base (one per call, scalar)
    and the flat permutation table.  Used inside lax.scan over bounces,
    where the dimension is a loop-carried value.  n_digits must bound
    ceil(log_base(max_index)) for the smallest base that can occur."""
    basef = base.astype(jnp.float32)
    inv_base = 1.0 / basef
    # derive carries from `a` so their varying-axes type matches the loop
    # body under shard_map (constants would be unvarying -> scan vma error)
    zero = a.astype(jnp.float32) * 0.0
    acc = zero
    scale = zero + inv_base
    inv_base_n = zero + 1.0

    def body(_, carry):
        a, acc, scale, inv_base_n = carry
        digit = a % base
        active = a > 0
        acc = jnp.where(active,
                        acc + perms[perm_off + digit].astype(jnp.float32) * scale,
                        acc)
        inv_base_n = jnp.where(active, inv_base_n * inv_base, inv_base_n)
        return a // base, acc, scale * inv_base, inv_base_n

    _, acc, _, inv_base_n = jax.lax.fori_loop(
        0, n_digits, body, (a, acc, scale, inv_base_n))
    tail = inv_base_n * perms[perm_off].astype(jnp.float32) / (basef - 1.0)
    return jnp.minimum(acc + tail, ONE_MINUS_EPS)


def _radical_inverse(a: jnp.ndarray, base: int) -> jnp.ndarray:
    inv_base = np.float32(1.0 / base)
    acc = jnp.zeros_like(a, dtype=jnp.float32)
    scale = jnp.full(a.shape, inv_base, dtype=jnp.float32)
    for _ in range(_digits_needed(base)):
        digit = a % base
        acc = acc + digit.astype(jnp.float32) * scale
        scale = scale * inv_base
        a = a // base
    return jnp.minimum(acc, ONE_MINUS_EPS)


# ---------------------------------------------------------------------------
# Halton
# ---------------------------------------------------------------------------

class HaltonSampler(NamedTuple):
    spp: int
    perms: jnp.ndarray  # flat permutation table (int32)
    offsets: jnp.ndarray  # (H, W) int32 first-sample index per pixel
    stride: int
    exp_x: int
    scale_y: int
    primes: jnp.ndarray = None  # (1000,) int32
    prime_sums: jnp.ndarray = None  # (1000,) int32
    sample_at_center: bool = False

    name: str = "halton"

    def index(self, px, py, sample_idx):
        return self.offsets[py, px] + sample_idx * self.stride

    def dim(self, px, py, sample_idx, d: int) -> jnp.ndarray:
        """Sample dimension d for the given pixels/sample numbers.
        Mirrors HaltonSampler::SampleDimension (halton.cpp:118-127)."""
        idx = self.index(px, py, sample_idx)
        if self.sample_at_center and d in (0, 1):
            return jnp.full(idx.shape, 0.5, jnp.float32)
        if d == 0:
            return _radical_inverse_base2(idx >> self.exp_x)
        if d == 1:
            return _radical_inverse(idx // self.scale_y, 3)
        base = int(ld.PRIMES[d])
        off = int(ld.PRIME_SUMS[d])
        return _scrambled_radical_inverse(idx, base, self.perms[off:off + base])

    def dim_dyn(self, px, py, sidx, d) -> jnp.ndarray:
        """Sample a TRACED dimension d (scalar int32, must be >= 2) — the
        in-scan variant used by the bounce loop.  14 digit iterations cover
        any base >= 5 up to 2^31 indices."""
        idx = self.index(px, py, sidx)
        return _scrambled_radical_inverse_dyn(
            idx, self.primes[d], self.perms, self.prime_sums[d], 14)

    # dims 0/1 ARE the in-pixel offsets: stripping the low exp_x base-2 /
    # base-3 digits (which encode the pixel) leaves the radical inverse of
    # the remaining digits = the fractional position within the pixel
    # (halton.cpp:118-124 + GlobalSampler pFilm = pixel + Get2D()).
    def film_offset(self, px, py, sample_idx):
        return (self.dim(px, py, sample_idx, 0),
                self.dim(px, py, sample_idx, 1))


def make_halton(spp: int, res_x: int, res_y: int,
                sample_at_center: bool = False) -> HaltonSampler:
    geom = ld.halton_geometry(res_x, res_y)
    perms = ld.compute_radical_inverse_permutations()
    py, px = np.meshgrid(np.arange(res_y), np.arange(res_x), indexing="ij")
    offsets = ld.halton_pixel_offsets(geom, px.ravel(), py.ravel())
    return HaltonSampler(
        spp=spp,
        perms=jnp.asarray(perms.astype(np.int32)),
        offsets=jnp.asarray(offsets.reshape(res_y, res_x).astype(np.int32)),
        stride=int(geom["sample_stride"]),
        exp_x=int(geom["base_exponents"][0]),
        scale_y=int(geom["base_scales"][1]),
        primes=jnp.asarray(ld.PRIMES.astype(np.int32)),
        prime_sums=jnp.asarray(ld.PRIME_SUMS.astype(np.int32)),
        sample_at_center=sample_at_center,
    )


# ---------------------------------------------------------------------------
# Random (threefry counter-based)
# ---------------------------------------------------------------------------

class RandomSampler(NamedTuple):
    spp: int
    seed: int
    res_x: int

    name: str = "random"

    def dim(self, px, py, sample_idx, d) -> jnp.ndarray:
        # d may be a static int or a traced scalar (fold_in accepts both)
        key = jax.random.fold_in(jax.random.key(self.seed), d)
        # fold pixel+sample into per-lane counters: one uniform per lane
        counter = ((py.astype(jnp.uint32) * np.uint32(self.res_x)
                    + px.astype(jnp.uint32)) * np.uint32(16384)
                   + sample_idx.astype(jnp.uint32))
        keys = jax.vmap(jax.random.fold_in, in_axes=(None, 0))(key, counter)
        bits = jax.vmap(lambda k: jax.random.bits(k, (), jnp.uint32))(keys)
        return jnp.minimum(bits.astype(jnp.float32) * jnp.float32(2 ** -32),
                           ONE_MINUS_EPS)

    dim_dyn = dim

    def film_offset(self, px, py, sample_idx):
        return (self.dim(px, py, sample_idx, 0),
                self.dim(px, py, sample_idx, 1))


# ---------------------------------------------------------------------------
# Stratified
# ---------------------------------------------------------------------------

class StratifiedSampler(NamedTuple):
    """Jittered stratification (samplers/stratified.cpp): dims 0-1 use an
    (nx, ny) grid indexed by the sample number; deeper dims use 1D strata
    with a per-(pixel, dim) permutation of sample-to-stratum assignment so
    strata are decorrelated between dimensions (the Shuffle analog)."""

    spp: int
    nx: int
    ny: int
    jitter: bool
    seed: int
    res_x: int

    name: str = "stratified"

    def _u(self, px, py, sample_idx, d, salt: int) -> jnp.ndarray:
        key = jax.random.fold_in(
            jax.random.fold_in(jax.random.key(self.seed), d), salt)
        counter = ((py.astype(jnp.uint32) * np.uint32(self.res_x)
                    + px.astype(jnp.uint32)) * np.uint32(16384)
                   + sample_idx.astype(jnp.uint32))
        keys = jax.vmap(jax.random.fold_in, in_axes=(None, 0))(key, counter)
        bits = jax.vmap(lambda k: jax.random.bits(k, (), jnp.uint32))(keys)
        return bits.astype(jnp.float32) * jnp.float32(2 ** -32)

    def _permuted_index(self, px, py, sample_idx, d) -> jnp.ndarray:
        """Per-(pixel, dim) pseudorandom bijection of sample_idx over
        [0, spp) — a stateless stand-in for Shuffle."""
        key = jax.random.fold_in(jax.random.key(self.seed ^ 0x9E3779B9), d)
        pix = (py.astype(jnp.uint32) * np.uint32(self.res_x)
               + px.astype(jnp.uint32))
        rk = jax.vmap(jax.random.fold_in, in_axes=(None, 0))(key, pix)
        r = jax.vmap(lambda k: jax.random.bits(k, (), jnp.uint32))(rk)
        if self.spp & (self.spp - 1) == 0 and self.spp > 0:
            # xor within power-of-two range is a bijection
            return (sample_idx.astype(jnp.uint32)
                    ^ (r % np.uint32(self.spp))).astype(jnp.int32)
        return ((sample_idx.astype(jnp.uint32) + r)
                % np.uint32(max(self.spp, 1))).astype(jnp.int32)

    def dim(self, px, py, sample_idx, d) -> jnp.ndarray:
        if isinstance(d, int) and d in (0, 1):
            fx, fy = self.film_offset(px, py, sample_idx)
            return fx if d == 0 else fy
        s = self._permuted_index(px, py, sample_idx, d).astype(jnp.float32)
        j = self._u(px, py, sample_idx, d, 1) if self.jitter else 0.5
        return jnp.minimum((s + j) / np.float32(max(self.spp, 1)),
                           ONE_MINUS_EPS)

    dim_dyn = dim

    def film_offset(self, px, py, sample_idx):
        sx = (sample_idx % self.nx).astype(jnp.float32)
        sy = (sample_idx // self.nx).astype(jnp.float32)
        jx = self._u(px, py, sample_idx, 0, 2) if self.jitter else 0.5
        jy = self._u(px, py, sample_idx, 1, 3) if self.jitter else 0.5
        fx = jnp.minimum((sx + jx) / np.float32(self.nx), ONE_MINUS_EPS)
        fy = jnp.minimum((sy + jy) / np.float32(self.ny), ONE_MINUS_EPS)
        return fx, fy


# ---------------------------------------------------------------------------
# (0,2)-sequence (also backs sobol/maxmindist for now)
# ---------------------------------------------------------------------------

# Generator matrix for the second dimension of the standard 2D Sobol
# (0,2)-sequence; the first dimension is bit reversal.  Column c of C is
# the value XORed in when index bit c is set (sobol.cc convention).
def _sobol2_matrix() -> np.ndarray:
    # C2[i][j] = binomial(j, i) mod 2 (Pascal's triangle mod 2), bit-reversed
    # into 32-bit output space.
    cols = np.zeros(32, dtype=np.uint32)
    v = np.uint32(1 << 31)
    cols[0] = v
    prev = np.zeros(32, dtype=np.uint32)
    prev[0] = v
    # standard construction: v_{k} = v_{k-1} ^ (v_{k-1} >> 1)
    for c in range(1, 32):
        cols[c] = cols[c - 1] ^ (cols[c - 1] >> np.uint32(1))
    return cols


_SOBOL2_COLS = _sobol2_matrix()


def _sobol_2d(index: jnp.ndarray, scramble_x: jnp.ndarray,
              scramble_y: jnp.ndarray):
    """2D Sobol' sample of ``index`` with xor scrambling (the reference's
    Sample02 / VanDerCorput+Sobol2, lowdiscrepancy.h)."""
    x = _bit_reverse32(index.astype(jnp.uint32)) ^ scramble_x
    y = jnp.zeros_like(index, dtype=jnp.uint32)
    for c in range(32):
        bit = (index >> c) & 1
        y = y ^ jnp.where(bit.astype(bool), np.uint32(_SOBOL2_COLS[c]),
                          np.uint32(0))
    y = y ^ scramble_y
    to_f = lambda u: jnp.minimum(u.astype(jnp.float32) * jnp.float32(2 ** -32),
                                 ONE_MINUS_EPS)
    return to_f(x), to_f(y)


class ZeroTwoSequenceSampler(NamedTuple):
    spp: int  # rounded up to a power of two like the reference
    seed: int
    res_x: int

    name: str = "02sequence"

    def _scrambles(self, px, py, d):
        key = jax.random.fold_in(jax.random.key(self.seed), d)
        pix = (py.astype(jnp.uint32) * np.uint32(self.res_x)
               + px.astype(jnp.uint32))
        ks = jax.vmap(jax.random.fold_in, in_axes=(None, 0))(key, pix)
        bits = jax.vmap(lambda k: jax.random.bits(k, (2,), jnp.uint32))(ks)
        return bits[:, 0], bits[:, 1]

    def dim2(self, px, py, sample_idx, d: int):
        sx, sy = self._scrambles(px, py, d)
        return _sobol_2d(sample_idx.astype(jnp.uint32), sx, sy)

    def dim(self, px, py, sample_idx, d) -> jnp.ndarray:
        # pair consecutive dims into one 2D (0,2) lookup
        ux, uy = self.dim2(px, py, sample_idx, d // 2)
        if isinstance(d, int):
            return ux if d % 2 == 0 else uy
        return jnp.where(d % 2 == 0, ux, uy)

    dim_dyn = dim

    def film_offset(self, px, py, sample_idx):
        return self.dim2(px, py, sample_idx, 0)


from tpurt.pytrees import register_static_pytree  # noqa: E402

register_static_pytree(HaltonSampler,
                       ["perms", "offsets", "primes", "prime_sums"])
register_static_pytree(RandomSampler, [])
register_static_pytree(StratifiedSampler, [])
register_static_pytree(ZeroTwoSequenceSampler, [])


def make_sampler(name: str, params, res_x: int, res_y: int, quick: bool = False):
    """CreateSampler dispatch (api.cpp MakeSampler :817-837) with reference
    defaults."""
    if name == "halton":
        spp = params.find_one_int("pixelsamples", 16)
        if quick:
            spp = 1
        return make_halton(spp, res_x, res_y,
                           params.find_one_bool("samplepixelcenter", False))
    if name == "random":
        spp = params.find_one_int("pixelsamples", 4)
        return RandomSampler(spp=1 if quick else spp, seed=0, res_x=res_x)
    if name == "stratified":
        jitter = params.find_one_bool("jitter", True)
        nx = params.find_one_int("xsamples", 4)
        ny = params.find_one_int("ysamples", 4)
        if quick:
            nx = ny = 1
        return StratifiedSampler(spp=nx * ny, nx=nx, ny=ny, jitter=jitter,
                                 seed=0, res_x=res_x)
    if name in ("lowdiscrepancy", "02sequence", "maxmindist", "sobol"):
        spp = params.find_one_int("pixelsamples", 16)
        if quick:
            spp = 1
        pow2 = 1 << max(0, int(np.ceil(np.log2(max(spp, 1)))))
        if pow2 != spp:
            log.warning("sampler %s: rounding %d samples to pow2 %d", name, spp, pow2)
        if name in ("maxmindist", "sobol"):
            log.warning("sampler %s currently backed by the (0,2)-sequence "
                        "construction (full generator matrices: later round)", name)
        return ZeroTwoSequenceSampler(spp=pow2, seed=0, res_x=res_x)
    log.warning('sampler "%s" unknown; using halton', name)
    return make_halton(16 if not quick else 1, res_x, res_y)
