// tpurt native runtime components.
//
// Reference analog: the reference's entire runtime is C++ (SURVEY.md §2);
// here the HOT HOST-SIDE pre-render work gets native implementations while
// the compute path stays JAX/XLA:
//   - SAH BVH build (accelerators/bvh.cpp:236-402 equivalent: 12-bucket
//     SAH over primitive bounds, 1-prim leaves, depth-first flattening
//     with right-child offsets) — the numpy builder takes ~5 s on the
//     66k-triangle killeroo mesh, this takes ~0.1 s.
//   - Halton scrambling-permutation generation (PCG32 + Fisher-Yates,
//     bit-exact with core/rng.h:61-144 + sampling.h:151) — ~3.7M
//     sequential draws that cost ~40 s in Python.
//
// Build: g++ -O3 -march=native -shared -fPIC -o libtpurt_native.so
//            tpurt_native.cpp
// Loaded via ctypes (tpurt/native.py) with a pure-Python fallback.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// PCG32 (bit-exact with the reference's core/rng.h)
// ---------------------------------------------------------------------------

struct Pcg32 {
    uint64_t state = 0x853c49e6748fea9bULL;
    uint64_t inc = 0xda3e39cb94b95bdbULL;

    uint32_t next() {
        uint64_t old = state;
        state = old * 0x5851f42d4c957f2dULL + inc;
        uint32_t xorshifted = (uint32_t)(((old >> 18u) ^ old) >> 27u);
        uint32_t rot = (uint32_t)(old >> 59u);
        return (xorshifted >> rot) | (xorshifted << ((~rot + 1u) & 31));
    }
    uint32_t bounded(uint32_t b) {
        uint32_t threshold = (~b + 1u) % b;
        for (;;) {
            uint32_t r = next();
            if (r >= threshold) return r % b;
        }
    }
};

// Fills perms with the concatenated digit permutations for the given prime
// bases (ComputeRadicalInversePermutations, lowdiscrepancy.cpp:2490).
void gen_halton_perms(uint16_t* perms, const int32_t* primes, int n_primes) {
    Pcg32 rng;  // default stream, like the reference's RNG()
    size_t off = 0;
    for (int i = 0; i < n_primes; ++i) {
        int p = primes[i];
        for (int j = 0; j < p; ++j) perms[off + j] = (uint16_t)j;
        // Shuffle (sampling.h:151): swap i with i + U(count - i)
        for (int j = 0; j < p; ++j) {
            int other = j + (int)rng.bounded((uint32_t)(p - j));
            std::swap(perms[off + j], perms[off + other]);
        }
        off += (size_t)p;
    }
}

// ---------------------------------------------------------------------------
// SAH BVH build (12 buckets, 1-prim leaves, DFS layout)
// ---------------------------------------------------------------------------

namespace {

constexpr int kBuckets = 12;
constexpr double kTraversalCost = 1.0 / 8.0;

struct BuildCtx {
    const float* lo;     // (n, 3)
    const float* hi;     // (n, 3)
    std::vector<double> cx, cy, cz;  // centroids
    // outputs
    float* nb_lo;        // (cap, 3)
    float* nb_hi;
    int32_t* right;
    int32_t* prim_off;
    int32_t* n_prims;
    int32_t* axis;
    int32_t* order;      // (n,)
    int next_node = 0;
    int order_len = 0;
    int max_leaf = 1;
};

double area3(const double b_lo[3], const double b_hi[3]) {
    double d0 = std::max(0.0, b_hi[0] - b_lo[0]);
    double d1 = std::max(0.0, b_hi[1] - b_lo[1]);
    double d2 = std::max(0.0, b_hi[2] - b_lo[2]);
    return 2.0 * (d0 * d1 + d0 * d2 + d1 * d2);
}

int build_range(BuildCtx& c, int32_t* prims, int count) {
    int node = c.next_node++;
    double b_lo[3] = {1e300, 1e300, 1e300};
    double b_hi[3] = {-1e300, -1e300, -1e300};
    for (int i = 0; i < count; ++i) {
        const float* plo = c.lo + 3 * prims[i];
        const float* phi = c.hi + 3 * prims[i];
        for (int k = 0; k < 3; ++k) {
            b_lo[k] = std::min(b_lo[k], (double)plo[k]);
            b_hi[k] = std::max(b_hi[k], (double)phi[k]);
        }
    }
    for (int k = 0; k < 3; ++k) {
        c.nb_lo[3 * node + k] = std::nextafterf((float)b_lo[k],
                                                -std::numeric_limits<float>::infinity());
        c.nb_hi[3 * node + k] = std::nextafterf((float)b_hi[k],
                                                std::numeric_limits<float>::infinity());
    }

    auto make_leaf = [&]() {
        c.prim_off[node] = c.order_len;
        c.n_prims[node] = count;
        for (int i = 0; i < count; ++i) c.order[c.order_len++] = prims[i];
        c.right[node] = 0;
        c.axis[node] = 0;
        return node;
    };

    if (count == 1) return make_leaf();

    const double* cent[3] = {c.cx.data(), c.cy.data(), c.cz.data()};
    double c_lo[3] = {1e300, 1e300, 1e300}, c_hi[3] = {-1e300, -1e300, -1e300};
    for (int i = 0; i < count; ++i)
        for (int k = 0; k < 3; ++k) {
            double v = cent[k][prims[i]];
            c_lo[k] = std::min(c_lo[k], v);
            c_hi[k] = std::max(c_hi[k], v);
        }
    int dim = 0;
    double ext = c_hi[0] - c_lo[0];
    for (int k = 1; k < 3; ++k)
        if (c_hi[k] - c_lo[k] > ext) { ext = c_hi[k] - c_lo[k]; dim = k; }

    int mid;
    if (c_hi[dim] == c_lo[dim]) {
        if (count <= c.max_leaf) return make_leaf();
        mid = count / 2;  // degenerate: arbitrary halving (numpy parity)
    } else if (count <= 2) {
        mid = count / 2;
        std::nth_element(prims, prims + mid, prims + count,
                         [&](int a, int b) { return cent[dim][a] < cent[dim][b]; });
    } else {
        // 12-bucket SAH sweep
        double inv_ext = 1.0 / (c_hi[dim] - c_lo[dim]);
        int counts[kBuckets] = {0};
        double blo[kBuckets][3], bhi[kBuckets][3];
        for (int b = 0; b < kBuckets; ++b)
            for (int k = 0; k < 3; ++k) { blo[b][k] = 1e300; bhi[b][k] = -1e300; }
        auto bucket_of = [&](int p) {
            int b = (int)(kBuckets * (cent[dim][p] - c_lo[dim]) * inv_ext);
            return std::min(b, kBuckets - 1);
        };
        for (int i = 0; i < count; ++i) {
            int p = prims[i];
            int b = bucket_of(p);
            counts[b]++;
            for (int k = 0; k < 3; ++k) {
                blo[b][k] = std::min(blo[b][k], (double)c.lo[3 * p + k]);
                bhi[b][k] = std::max(bhi[b][k], (double)c.hi[3 * p + k]);
            }
        }
        double best_cost = 1e300;
        int best = 0;
        double total_area = std::max(area3(b_lo, b_hi), 1e-30);
        for (int split = 0; split < kBuckets - 1; ++split) {
            double l_lo[3] = {1e300, 1e300, 1e300}, l_hi[3] = {-1e300, -1e300, -1e300};
            double r_lo[3] = {1e300, 1e300, 1e300}, r_hi[3] = {-1e300, -1e300, -1e300};
            int nl = 0, nr = 0;
            for (int b = 0; b <= split; ++b) {
                nl += counts[b];
                for (int k = 0; k < 3; ++k) {
                    l_lo[k] = std::min(l_lo[k], blo[b][k]);
                    l_hi[k] = std::max(l_hi[k], bhi[b][k]);
                }
            }
            for (int b = split + 1; b < kBuckets; ++b) {
                nr += counts[b];
                for (int k = 0; k < 3; ++k) {
                    r_lo[k] = std::min(r_lo[k], blo[b][k]);
                    r_hi[k] = std::max(r_hi[k], bhi[b][k]);
                }
            }
            double cost = kTraversalCost
                + (nl * (nl ? area3(l_lo, l_hi) : 0.0)
                   + nr * (nr ? area3(r_lo, r_hi) : 0.0)) / total_area;
            if (cost < best_cost) { best_cost = cost; best = split; }
        }
        if (count <= c.max_leaf && best_cost >= (double)count) return make_leaf();
        int32_t* m = std::partition(prims, prims + count, [&](int p) {
            return bucket_of(p) <= best;
        });
        mid = (int)(m - prims);
        if (mid == 0 || mid == count) {
            mid = count / 2;
            std::nth_element(prims, prims + mid, prims + count,
                             [&](int a, int b) { return cent[dim][a] < cent[dim][b]; });
        }
    }

    c.n_prims[node] = 0;
    c.axis[node] = dim;
    build_range(c, prims, mid);
    c.right[node] = build_range(c, prims + mid, count - mid);
    return node;
}

}  // namespace

// Returns the number of nodes written, or -1 on error.  Output buffers must
// have capacity for 2*n nodes; order for n entries.
int32_t build_bvh_sah(const float* lo, const float* hi, int32_t n,
                      int32_t max_leaf, float* nb_lo, float* nb_hi,
                      int32_t* right, int32_t* prim_off, int32_t* n_prims,
                      int32_t* axis, int32_t* order) {
    if (n <= 0) return -1;
    BuildCtx c;
    c.lo = lo;
    c.hi = hi;
    c.cx.resize(n);
    c.cy.resize(n);
    c.cz.resize(n);
    for (int i = 0; i < n; ++i) {
        c.cx[i] = 0.5 * ((double)lo[3 * i] + hi[3 * i]);
        c.cy[i] = 0.5 * ((double)lo[3 * i + 1] + hi[3 * i + 1]);
        c.cz[i] = 0.5 * ((double)lo[3 * i + 2] + hi[3 * i + 2]);
    }
    c.nb_lo = nb_lo;
    c.nb_hi = nb_hi;
    c.right = right;
    c.prim_off = prim_off;
    c.n_prims = n_prims;
    c.axis = axis;
    c.order = order;
    c.max_leaf = std::max(1, (int)max_leaf);

    std::vector<int32_t> prims(n);
    for (int i = 0; i < n; ++i) prims[i] = i;
    build_range(c, prims.data(), n);
    return c.next_node;
}

}  // extern "C"
