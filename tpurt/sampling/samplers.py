"""Device-side samplers: pure functions (pixel, sample index, dimension) ->
uniform [0,1) floats.

Reference analog: core/sampler.h (the Sampler protocol and GlobalSampler
index remapping :106-116) and src/samplers/*.  The wavefront integrator
consumes a FIXED dimension schedule per bounce (pFilm 0-1, time 2, pLens
3-4, then per-bounce light/BSDF/RR dims — matching GetCameraSample's
consumption order, sampler.h:58), so ``dimension`` is a static Python int
and every sampler evaluates as batched elementwise math with no state.

- halton: scrambled radical inverse with the reference's 128x128 pixel
  tiling index algebra (halton.cpp:74-135).  Two scramble modes:
  "pbrt" reproduces HaltonSampler bit-exactly (the reference's PCG32
  digit-permutation tables) but costs one table gather per digit per
  dimension — the per-lane gather is the single most expensive TPU op
  (measured: 42 dims cost 739 ms/2^17 lanes with the table, 20 ms
  without).  The default "affine" mode uses the multiplicative digit
  permutation pi(d) = (m*d + s) mod b (m, s hashed per dimension, m
  coprime to the prime base) — a proper digit permutation of the same
  Halton points, statistically equivalent (pbrt's tables are themselves
  arbitrary random draws), and pure arithmetic on the VPU.
- random: counter-based threefry keyed by (pixel, sample, dim) — the
  TPU-native replacement for the per-tile PCG32 stream (statistically
  equivalent, not bit-equal).
- stratified: jittered strata in every dimension, samples associated by
  index in dims 0-1 and decorrelated by a per-(pixel,dim) permutation
  elsewhere (statistical analog of stratified.cpp's Shuffle).
- 02sequence / maxmindist: scrambled (0,2)-sequence for the 2D dims +
  stratified/random tail (statistical analog; maxmindist's pixel matrix
  comes from a deterministic GF(2) search, sobol.py:maxmin_dist_matrix).
- sobol: a REAL global Sobol' sampler (make_sobol below): the packaged
  Joe-Kuo direction numbers (sobol.py get_sobol_matrices, 256 dims x 32
  bits), the reference's pow2 pixel tiling, and a GF(2)-inverted
  SobolIntervalToIndex analog — the per-sample point set matches the
  reference's SobolSampler over the dims tpurt consumes.
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


def _fmix32(h):
    """murmur3 finalizer; works on jnp uint32 arrays/scalars AND python
    ints (wrapped to 32 bits) so static and traced call sites agree."""
    if isinstance(h, (int, np.integer)):
        h &= 0xFFFFFFFF
        h ^= h >> 16
        h = (h * 0x85EBCA6B) & 0xFFFFFFFF
        h ^= h >> 13
        h = (h * 0xC2B2AE35) & 0xFFFFFFFF
        h ^= h >> 16
        return h
    h = h.astype(jnp.uint32)
    h = h ^ (h >> 16)
    h = h * np.uint32(0x85EBCA6B)
    h = h ^ (h >> 13)
    h = h * np.uint32(0xC2B2AE35)
    return h ^ (h >> 16)


def _affine_perm_params(d, base):
    """Per-dimension multiplicative-scramble parameters: multiplier m in
    [1, base) (coprime to the prime base, hence a digit bijection) and
    shift s in [0, base).  Same arithmetic for python ints (static dims)
    and traced scalars (in-scan dims)."""
    if isinstance(d, (int, np.integer)):
        m = 1 + _fmix32(d * 0x9E3779B1) % (base - 1)
        s = _fmix32(d * 0x85EBCA77 + 0x6A09E667) % base
        return m, s
    du = d.astype(jnp.uint32)
    baseu = base.astype(jnp.uint32)
    m = 1 + _fmix32(du * np.uint32(0x9E3779B1)) % (baseu - 1)
    s = _fmix32(du * np.uint32(0x85EBCA77) + np.uint32(0x6A09E667)) % baseu
    return m.astype(jnp.int32), s.astype(jnp.int32)


def _digits_needed(base: int, max_index: int = 1 << 31) -> int:
    n = 0
    v = 1
    while v < max_index:
        v *= base
        n += 1
    return n


def _scrambled_radical_inverse(a: jnp.ndarray, base: int, perm: jnp.ndarray,
                               max_index: int = 1 << 31) -> jnp.ndarray:
    """Scrambled radical inverse with static base; float32 accumulation of
    the digit series (the reference accumulates in uint64 doubles —
    lowdiscrepancy.cpp ScrambledRadicalInverseSpecialized; differences are
    below f32 resolution)."""
    inv_base = np.float32(1.0 / base)
    acc = jnp.zeros_like(a, dtype=jnp.float32)
    scale = jnp.full(a.shape, inv_base, dtype=jnp.float32)
    inv_base_n = jnp.ones_like(a, dtype=jnp.float32)
    for _ in range(_digits_needed(base, max_index)):
        digit = a % base
        active = a > 0
        acc = jnp.where(active, acc + perm[digit].astype(jnp.float32) * scale, acc)
        inv_base_n = jnp.where(active, inv_base_n * inv_base, inv_base_n)
        scale = scale * inv_base
        a = a // base
    tail = inv_base_n * perm[0].astype(jnp.float32) / np.float32(base - 1)
    return jnp.minimum(acc + tail, ONE_MINUS_EPS)


def _affine_radical_inverse(a: jnp.ndarray, base, m, s,
                            n_digits: int) -> jnp.ndarray:
    """Radical inverse with the affine digit permutation
    pi(d) = (m*d + s) mod base applied at every digit position (the same
    one-perm-for-all-digits structure as pbrt's
    ScrambledRadicalInverseSpecialized, so the zero-digit tail has the
    identical closed form with perm[0] == s).  base/m/s may be python ints
    (static dim) or traced scalars (in-scan dim); no table gathers."""
    basef = (np.float32(base) if isinstance(base, (int, np.integer))
             else base.astype(jnp.float32))
    inv_base = 1.0 / basef
    zero = a.astype(jnp.float32) * 0.0
    acc = zero
    scale = zero + inv_base
    inv_base_n = zero + 1.0

    def body(_, carry):
        a, acc, scale, inv_base_n = carry
        digit = a % base
        pdigit = (m * digit + s) % base
        active = a > 0
        acc = jnp.where(active, acc + pdigit.astype(jnp.float32) * scale, acc)
        inv_base_n = jnp.where(active, inv_base_n * inv_base, inv_base_n)
        return a // base, acc, scale * inv_base, inv_base_n

    carry = (a, acc, scale, inv_base_n)
    for k in range(n_digits):
        carry = body(k, carry)
    _, acc, _, inv_base_n = carry
    sf = (np.float32(s) if isinstance(s, (int, np.integer))
          else s.astype(jnp.float32))
    tail = inv_base_n * sf / (basef - 1.0)
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


def _radical_inverse(a: jnp.ndarray, base: int,
                     max_index: int = 1 << 31) -> jnp.ndarray:
    inv_base = np.float32(1.0 / base)
    acc = jnp.zeros_like(a, dtype=jnp.float32)
    scale = jnp.full(a.shape, inv_base, dtype=jnp.float32)
    for _ in range(_digits_needed(base, max_index)):
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
    perms: jnp.ndarray  # flat permutation table (int32; "pbrt" mode)
    offsets: jnp.ndarray  # (H, W) int32 first-sample index per pixel
    stride: int
    exp_x: int
    scale_y: int
    primes: jnp.ndarray = None  # (1000,) int32
    prime_sums: jnp.ndarray = None  # (1000,) int32
    sample_at_center: bool = False
    # Largest sample index any lane can request (static): bounds the digit
    # loops — e.g. 700x700x8spp gives max_index ~2.8e5, 5 digits in base 13
    # instead of the 14 that cover 2^31.
    max_index: int = 1 << 31
    # "affine": arithmetic digit permutation, no gathers (default; fast).
    # "pbrt": the reference's PCG32 permutation tables, bit-exact vs
    # HaltonSampler::SampleDimension but gather-bound on TPU.
    scramble: str = "affine"

    name: str = "halton"

    def index(self, px, py, sample_idx):
        return self.offsets[py, px] + sample_idx * self.stride

    def lane_ctx(self, px, py, sample_idx):
        """Precompute the per-lane Halton index once per wavefront (the
        offsets[] gather) so per-dimension calls skip it."""
        return self.index(px, py, sample_idx)

    def _dim_from_idx(self, idx, d: int) -> jnp.ndarray:
        if self.sample_at_center and d in (0, 1):
            return jnp.full(idx.shape, 0.5, jnp.float32)
        if d == 0:
            return _radical_inverse_base2(idx >> self.exp_x)
        if d == 1:
            return _radical_inverse(idx // self.scale_y, 3,
                                    max(2, self.max_index // self.scale_y))
        base = int(ld.PRIMES[d])
        if self.scramble == "pbrt":
            off = int(ld.PRIME_SUMS[d])
            return _scrambled_radical_inverse(
                idx, base, self.perms[off:off + base], self.max_index)
        m, s = _affine_perm_params(d, base)
        return _affine_radical_inverse(idx, base, m, s,
                                       _digits_needed(base, self.max_index))

    def dim(self, px, py, sample_idx, d: int, ctx=None) -> jnp.ndarray:
        """Sample dimension d for the given pixels/sample numbers.
        Mirrors HaltonSampler::SampleDimension (halton.cpp:118-127)."""
        idx = ctx if ctx is not None else self.index(px, py, sample_idx)
        return self._dim_from_idx(idx, d)

    def dim_dyn(self, px, py, sidx, d, ctx=None) -> jnp.ndarray:
        """Sample a TRACED dimension d (scalar int32, must be >= 5: the
        bounce-loop dims) — the in-scan variant.  The digit count covers
        base PRIMES[5] = 13 (larger bases need fewer digits; their loop
        tail is masked by a > 0)."""
        idx = ctx if ctx is not None else self.index(px, py, sidx)
        n_digits = _digits_needed(13, self.max_index)
        base = self.primes[d]
        if self.scramble == "pbrt":
            return _scrambled_radical_inverse_dyn(
                idx, base, self.perms, self.prime_sums[d], n_digits)
        m, s = _affine_perm_params(d, base)
        return _affine_radical_inverse(idx, base, m, s, n_digits)

    # dims 0/1 ARE the in-pixel offsets: stripping the low exp_x base-2 /
    # base-3 digits (which encode the pixel) leaves the radical inverse of
    # the remaining digits = the fractional position within the pixel
    # (halton.cpp:118-124 + GlobalSampler pFilm = pixel + Get2D()).
    def film_offset(self, px, py, sample_idx, ctx=None):
        return (self.dim(px, py, sample_idx, 0, ctx),
                self.dim(px, py, sample_idx, 1, ctx))


def make_halton(spp: int, res_x: int, res_y: int,
                sample_at_center: bool = False,
                scramble: str = "affine",
                sample_bounds=None) -> HaltonSampler:
    # base scales/stride derive from the SAMPLE bounds extent
    # (halton.cpp:74: res = sampleBounds.pMax - pMin), which differs from
    # the full film under a crop window; pixel offsets stay keyed by the
    # absolute raster pixel (halton.cpp:97 Mod(currentPixel, 128)).
    if sample_bounds is None:
        sample_bounds = (0, res_x, 0, res_y)
    sx0, sx1, sy0, sy1 = sample_bounds
    geom = ld.halton_geometry(sx1 - sx0, sy1 - sy0)
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
        max_index=int(offsets.max()) + (spp + 1) * int(geom["sample_stride"]),
        scramble=scramble,
    )


# ---------------------------------------------------------------------------
# Random (threefry counter-based)
# ---------------------------------------------------------------------------

class RandomSampler(NamedTuple):
    spp: int
    seed: int
    res_x: int

    name: str = "random"

    def lane_ctx(self, px, py, sample_idx):
        # per-lane counter folding pixel + sample number
        return ((py.astype(jnp.uint32) * np.uint32(self.res_x)
                 + px.astype(jnp.uint32)) * np.uint32(16384)
                + sample_idx.astype(jnp.uint32))

    def dim(self, px, py, sample_idx, d, ctx=None) -> jnp.ndarray:
        # d may be a static int or a traced scalar (fold_in accepts both)
        key = jax.random.fold_in(jax.random.key(self.seed), d)
        counter = (ctx if ctx is not None
                   else self.lane_ctx(px, py, sample_idx))
        keys = jax.vmap(jax.random.fold_in, in_axes=(None, 0))(key, counter)
        bits = jax.vmap(lambda k: jax.random.bits(k, (), jnp.uint32))(keys)
        return jnp.minimum(bits.astype(jnp.float32) * jnp.float32(2 ** -32),
                           ONE_MINUS_EPS)

    dim_dyn = dim

    def film_offset(self, px, py, sample_idx, ctx=None):
        return (self.dim(px, py, sample_idx, 0, ctx),
                self.dim(px, py, sample_idx, 1, ctx))


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

    def lane_ctx(self, px, py, sample_idx):
        return None

    def dim(self, px, py, sample_idx, d, ctx=None) -> jnp.ndarray:
        if isinstance(d, int) and d in (0, 1):
            fx, fy = self.film_offset(px, py, sample_idx)
            return fx if d == 0 else fy
        s = self._permuted_index(px, py, sample_idx, d).astype(jnp.float32)
        j = self._u(px, py, sample_idx, d, 1) if self.jitter else 0.5
        return jnp.minimum((s + j) / np.float32(max(self.spp, 1)),
                           ONE_MINUS_EPS)

    dim_dyn = dim

    def film_offset(self, px, py, sample_idx, ctx=None):
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

    def lane_ctx(self, px, py, sample_idx):
        return None

    def dim(self, px, py, sample_idx, d, ctx=None) -> jnp.ndarray:
        # pair consecutive dims into one 2D (0,2) lookup
        ux, uy = self.dim2(px, py, sample_idx, d // 2)
        if isinstance(d, int):
            return ux if d % 2 == 0 else uy
        return jnp.where(d % 2 == 0, ux, uy)

    dim_dyn = dim

    def film_offset(self, px, py, sample_idx, ctx=None):
        return self.dim2(px, py, sample_idx, 0)


# ---------------------------------------------------------------------------
# Sobol' (global sampler) — samplers/sobol.cpp + lowdiscrepancy SobolSample /
# SobolIntervalToIndex, with matrices generated (not copied) by
# tpurt.sampling.sobol
# ---------------------------------------------------------------------------

class SobolSampler(NamedTuple):
    spp: int  # power of two (sobol.cpp rounds up)
    m: int  # log2 of the pow2 tiling of the sample-bounds extent
    mats: jnp.ndarray  # (D, 32) uint32 direction vectors
    inv_cols: jnp.ndarray  # (2m,) uint32 — interval-to-index solve
    fmap_cols: jnp.ndarray  # (F,) uint32
    smin_x: int = 0  # sample-bounds origin (sobol.cpp indexes pixels
    smin_y: int = 0  # relative to sampleBounds.pMin)

    name: str = "sobol"

    @property
    def _idx_bits(self) -> int:
        return 2 * self.m + max(self.spp - 1, 1).bit_length()

    def index(self, px, py, sidx):
        """SobolIntervalToIndex analog: global index of pixel (px,py)'s
        sidx-th sample (see sobol.build_interval_to_index)."""
        f = sidx.astype(jnp.uint32)
        if self.m == 0:
            return f
        m, lm = self.m, 2 * self.m
        pxu = (px - self.smin_x).astype(jnp.uint32)
        pyu = (py - self.smin_y).astype(jnp.uint32)
        y = jnp.zeros_like(pxu)
        for q in range(m):
            y = (y | (((pxu >> q) & 1) << q)
                 | (((pyu >> q) & 1) << (m + q)))
        t = y
        for b in range(min(max(self.spp - 1, 1).bit_length(),
                           int(self.fmap_cols.shape[0]))):
            t = t ^ jnp.where(((f >> b) & 1).astype(bool),
                              self.fmap_cols[b], jnp.uint32(0))
        ell = jnp.zeros_like(t)
        for b in range(lm):
            ell = ell ^ jnp.where(((t >> b) & 1).astype(bool),
                                  self.inv_cols[b], jnp.uint32(0))
        return (f << lm) | ell

    def lane_ctx(self, px, py, sample_idx):
        return self.index(px, py, sample_idx)

    def _eval(self, idx, row):
        v = jnp.zeros_like(idx)
        for k in range(self._idx_bits):
            v = v ^ jnp.where(((idx >> k) & 1).astype(bool), row[k],
                              jnp.uint32(0))
        return jnp.minimum(v.astype(jnp.float32) * jnp.float32(2 ** -32),
                           ONE_MINUS_EPS)

    def dim(self, px, py, sidx, d, ctx=None) -> jnp.ndarray:
        """SobolSampler::SampleDimension (sobol.cpp:46-58): dims 0/1 are
        remapped to in-pixel offsets via the pow2 tiling."""
        idx = ctx if ctx is not None else self.index(px, py, sidx)
        s = self._eval(idx, self.mats[d])
        if isinstance(d, int) and d in (0, 1):
            # s*resolution + sampleBounds.pMin - pixel (sobol.cpp:54-56)
            res = jnp.float32(1 << self.m)
            smin = jnp.float32(self.smin_x if d == 0 else self.smin_y)
            pix = (px if d == 0 else py).astype(jnp.float32)
            return jnp.clip(s * res + smin - pix, 0.0, ONE_MINUS_EPS)
        return s

    dim_dyn = dim

    def film_offset(self, px, py, sidx, ctx=None):
        return (self.dim(px, py, sidx, 0, ctx),
                self.dim(px, py, sidx, 1, ctx))


def make_sobol(spp: int, res_x: int, res_y: int,
               sample_bounds=None) -> SobolSampler:
    from tpurt.sampling import sobol as sb

    # pow2 tiling covers the SAMPLE bounds extent and pixels are indexed
    # relative to its origin (sobol.cpp GetIndexForSample/SampleDimension)
    if sample_bounds is None:
        sample_bounds = (0, res_x, 0, res_y)
    sx0, sx1, sy0, sy1 = sample_bounds
    m = max(int(np.ceil(np.log2(max(sx1 - sx0, sy1 - sy0, 1)))), 0)
    mats = sb.get_sobol_matrices()
    inv_cols, fmap_cols = sb.build_interval_to_index(m, mats)
    return SobolSampler(spp=spp, m=m, mats=jnp.asarray(mats),
                        inv_cols=jnp.asarray(inv_cols),
                        fmap_cols=jnp.asarray(fmap_cols),
                        smin_x=sx0, smin_y=sy0)


# ---------------------------------------------------------------------------
# MaxMinDist — samplers/maxmin.cpp: the FIRST 2D dimension uses a
# min-distance-optimized generator matrix (searched, not copied — see
# sobol.maxmin_dist_matrix); every other dimension is the (0,2)-sequence.
# ---------------------------------------------------------------------------

class MaxMinDistSampler(NamedTuple):
    spp: int  # power of two
    seed: int
    res_x: int
    cpixel: tuple  # k uint32 MSB-aligned generator columns

    name: str = "maxmindist"

    _zt = ZeroTwoSequenceSampler

    def _base(self):
        return ZeroTwoSequenceSampler(spp=self.spp, seed=self.seed,
                                      res_x=self.res_x)

    def lane_ctx(self, px, py, sample_idx):
        return None

    def _shuffled(self, px, py, sidx):
        """Per-pixel xor bijection of the sample order (the Shuffle at
        maxmin.cpp:45)."""
        key = jax.random.fold_in(jax.random.key(self.seed ^ 0x5157), 1)
        pix = (py.astype(jnp.uint32) * np.uint32(self.res_x)
               + px.astype(jnp.uint32))
        ks = jax.vmap(jax.random.fold_in, in_axes=(None, 0))(key, pix)
        r = jax.vmap(lambda k: jax.random.bits(k, (), jnp.uint32))(ks)
        return sidx.astype(jnp.uint32) ^ (r % np.uint32(max(self.spp, 1)))

    def film_offset(self, px, py, sidx, ctx=None):
        j = self._shuffled(px, py, sidx)
        fx = jnp.minimum(j.astype(jnp.float32) / np.float32(self.spp),
                         ONE_MINUS_EPS)
        v = jnp.zeros_like(j)
        for c, col in enumerate(self.cpixel):
            v = v ^ jnp.where(((j >> c) & 1).astype(bool),
                              np.uint32(col), np.uint32(0))
        fy = jnp.minimum(v.astype(jnp.float32) * jnp.float32(2 ** -32),
                         ONE_MINUS_EPS)
        return fx, fy

    def dim(self, px, py, sidx, d, ctx=None) -> jnp.ndarray:
        if isinstance(d, int) and d in (0, 1):
            fx, fy = self.film_offset(px, py, sidx)
            return fx if d == 0 else fy
        return self._base().dim(px, py, sidx, d, ctx)

    dim_dyn = dim


def make_maxmin(spp: int, res_x: int) -> MaxMinDistSampler:
    from tpurt.sampling import sobol as sb

    k = max(spp - 1, 1).bit_length()
    if (1 << k) != spp:
        k = int(np.ceil(np.log2(max(spp, 1))))
    if k <= 10:
        cols = tuple(int(c) for c in sb.maxmin_dist_matrix(max(k, 1)))
    else:
        log.warning("maxmindist: spp %d too large for the matrix search; "
                    "using the (0,2)-sequence pixel dimension", spp)
        cols = tuple(int(_SOBOL2_COLS[c]) for c in range(k))
    return MaxMinDistSampler(spp=spp, seed=0, res_x=res_x, cpixel=cols)


from tpurt.pytrees import register_static_pytree  # noqa: E402

register_static_pytree(HaltonSampler,
                       ["perms", "offsets", "primes", "prime_sums"])
register_static_pytree(RandomSampler, [])
register_static_pytree(StratifiedSampler, [])
register_static_pytree(ZeroTwoSequenceSampler, [])
register_static_pytree(SobolSampler, ["mats", "inv_cols", "fmap_cols"])
register_static_pytree(MaxMinDistSampler, [])


def make_sampler(name: str, params, res_x: int, res_y: int,
                 quick: bool = False, sample_bounds=None):
    """CreateSampler dispatch (api.cpp MakeSampler :817-837) with reference
    defaults.  sample_bounds = Film::GetSampleBounds as (x0, x1, y0, y1);
    halton/sobol geometry depends on it under crop windows."""
    if name == "halton":
        spp = params.find_one_int("pixelsamples", 16)
        if quick:
            spp = 1
        # TPURT_HALTON_SCRAMBLE=pbrt selects the bit-exact reference
        # digit-permutation tables (slower: one table gather per digit);
        # the default affine scramble is statistically equivalent.
        import os as _os

        scramble = _os.environ.get("TPURT_HALTON_SCRAMBLE", "affine")
        return make_halton(spp, res_x, res_y,
                           params.find_one_bool("samplepixelcenter", False),
                           scramble=scramble,
                           sample_bounds=sample_bounds)
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
        if name == "sobol":
            return make_sobol(pow2, res_x, res_y,
                              sample_bounds=sample_bounds)
        if name == "maxmindist":
            return make_maxmin(pow2, res_x)
        return ZeroTwoSequenceSampler(spp=pow2, seed=0, res_x=res_x)
    log.warning('sampler "%s" unknown; using halton', name)
    return make_halton(16 if not quick else 1, res_x, res_y)
