"""PCG32 bit-parity and low-discrepancy math tests.

Golden values computed from the PCG32 reference algorithm (the generator is
fully specified by its constants; core/rng.h:61-144)."""

import numpy as np

from tpurt.sampling.rng import PCG32, shuffle_inplace
from tpurt.sampling import lowdiscrepancy as ld


def _pcg32_scalar_golden(n, seq=None):
    """Independent plain-python PCG32 for cross-checking the numpy one."""
    M = 0x5851F42D4C957F2D
    mask = (1 << 64) - 1
    if seq is None:
        state, inc = 0x853C49E6748FEA9B, 0xDA3E39CB94B95BDB
    else:
        state, inc = 0, ((seq << 1) | 1) & mask

    def nxt():
        nonlocal state
        old = state
        state = (old * M + inc) & mask
        xorshifted = (((old >> 18) ^ old) >> 27) & 0xFFFFFFFF
        rot = old >> 59
        return ((xorshifted >> rot) | (xorshifted << ((-rot) & 31))) & 0xFFFFFFFF

    if seq is not None:
        nxt()
        state = (state + 0x853C49E6748FEA9B) & mask
        nxt()
    return [nxt() for _ in range(n)]


def test_pcg32_default_stream_matches_reference_algorithm():
    rng = PCG32()
    got = [int(rng.uniform_uint32()) for _ in range(8)]
    assert got == _pcg32_scalar_golden(8)


def test_pcg32_set_sequence():
    rng = PCG32(42)
    got = [int(rng.uniform_uint32()) for _ in range(8)]
    assert got == _pcg32_scalar_golden(8, seq=42)


def test_pcg32_vector_lanes_match_scalars():
    rng = PCG32(np.arange(4))
    v = rng.uniform_uint32()
    for lane in range(4):
        s = PCG32(lane)
        assert int(s.uniform_uint32()) == int(v[lane])


def test_shuffle_is_permutation_and_deterministic():
    rng = PCG32()
    a = np.arange(10, dtype=np.uint16)
    shuffle_inplace(a, rng)
    assert sorted(a.tolist()) == list(range(10))
    rng2 = PCG32()
    b = np.arange(10, dtype=np.uint16)
    shuffle_inplace(b, rng2)
    assert a.tolist() == b.tolist()


def test_primes_table():
    assert ld.PRIMES[0] == 2 and ld.PRIMES[1] == 3 and ld.PRIMES[2] == 5
    assert ld.PRIMES[999] == 7919  # 1000th prime
    assert ld.PRIME_SUMS[0] == 0 and ld.PRIME_SUMS[1] == 2 and ld.PRIME_SUMS[2] == 5


def test_radical_inverse_base2():
    # base 2: index 1 -> 0.5, 2 -> 0.25, 3 -> 0.75
    got = ld.radical_inverse_np(0, np.array([0, 1, 2, 3, 4]))
    np.testing.assert_allclose(got, [0.0, 0.5, 0.25, 0.75, 0.125])


def test_radical_inverse_base3():
    got = ld.radical_inverse_np(1, np.array([1, 2, 3, 4]))
    np.testing.assert_allclose(got, [1 / 3, 2 / 3, 1 / 9, 4 / 9])


def test_scrambled_radical_inverse_identity_perm():
    # With the identity permutation, scrambled == unscrambled + the perm[0]
    # tail; identity perm has perm[0]==0 so the tail vanishes.
    perm = np.arange(5, dtype=np.uint16)
    a = np.arange(1, 30)
    got = ld.scrambled_radical_inverse_np(2, a, perm)
    want = ld.radical_inverse_np(2, a)
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_permutations_cover_all_bases():
    perms = ld.compute_radical_inverse_permutations()
    assert len(perms) == int(ld.PRIMES.sum())
    for dim in (0, 1, 2, 50, 999):
        p = ld.permutation_for_dimension(perms, dim)
        assert sorted(p.tolist()) == list(range(int(ld.PRIMES[dim])))


def test_halton_geometry_700():
    g = ld.halton_geometry(700, 700)
    # 700 > 128 so scales cover kMaxResolution: 2^7=128, 3^5=243.
    assert g["base_scales"] == (128, 243)
    assert g["base_exponents"] == (7, 5)
    assert g["sample_stride"] == 128 * 243
    # multiplicative inverses
    assert (243 * g["mult_inverse"][0]) % 128 == 1
    assert (128 * g["mult_inverse"][1]) % 243 == 1


def test_halton_pixel_offsets_map_back_to_pixel():
    # The whole point of the offset: sample index `off` has its first two
    # radical-inverse dims land inside the pixel.
    g = ld.halton_geometry(64, 64)
    px = np.array([0, 5, 17, 63])
    py = np.array([0, 9, 33, 63])
    off = ld.halton_pixel_offsets(g, px, py)
    x = ld.radical_inverse_np(0, off) * g["base_scales"][0]
    y = ld.radical_inverse_np(1, off) * g["base_scales"][1]
    # pixel raster for 64x64: scale_x = 64, scale_y = 81 (3^4)
    np.testing.assert_array_equal(np.floor(x).astype(int), px)
    np.testing.assert_array_equal(np.floor(y).astype(int), py)
