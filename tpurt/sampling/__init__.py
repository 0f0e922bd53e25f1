from tpurt.sampling.rng import PCG32
from tpurt.sampling.lowdiscrepancy import (
    PRIMES,
    PRIME_SUMS,
    radical_inverse_np,
    compute_radical_inverse_permutations,
)
