// Native domain-decomposition kernel for ngravs_tpu.
//
// The host-side analog of the reference's decomposition machinery
// (domain_determineTopTree/peano_hilbert_key, domain.c:933-1018 +
// peano.c:356): 60-bit Morton keys (20 levels x 3 bits) computed
// OpenMP-parallel, then a parallel index sort.  Used by
// `reshard_by_cost` so re-decomposition stays O(seconds) at 10^7-10^8
// particles instead of dominating the step budget.
//
// Exported C ABI (ctypes):
//   morton_argsort(pos[n*3] f32, n, corner[3] f64, inv_len f64,
//                  order[n] i64 out, keys[n] u64 out)
//   weighted_split(keys_sorted_weights[n] f64, n, n_parts, cap,
//                  bounds[n_parts+1] i64 out)
//     -> contiguous boundaries balancing prefix weights under a
//        per-part capacity (domain_findSplit, domain.c:347-460).

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstring>
#include <vector>

#if defined(_OPENMP)
#include <omp.h>
#include <parallel/algorithm>
#define PSORT __gnu_parallel::sort
#else
#define PSORT std::sort
#endif

namespace {

inline uint64_t spread3(uint64_t x) {
    // interleave 20 bits -> every 3rd bit of a 60-bit word
    x &= 0xfffffULL;
    x = (x | (x << 32)) & 0x1f00000000ffffULL;
    x = (x | (x << 16)) & 0x1f0000ff0000ffULL;
    x = (x | (x << 8))  & 0x100f00f00f00f00fULL;
    x = (x | (x << 4))  & 0x10c30c30c30c30c3ULL;
    x = (x | (x << 2))  & 0x1249249249249249ULL;
    return x;
}

}  // namespace

extern "C" {

void morton_argsort(const float* pos, int64_t n, const double* corner,
                    double inv_len, int64_t* order, uint64_t* keys) {
    const double scale = inv_len * (double)(1 << 20);
    std::vector<std::pair<uint64_t, int64_t>> kv((size_t)n);
#pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < n; ++i) {
        uint64_t k = 0;
        for (int d = 0; d < 3; ++d) {
            double f = ((double)pos[3 * i + d] - corner[d]) * scale;
            int64_t c = (int64_t)f;
            if (c < 0) c = 0;
            if (c > (1 << 20) - 1) c = (1 << 20) - 1;
            k |= spread3((uint64_t)c) << (2 - d);
        }
        kv[(size_t)i] = {k, i};
    }
    PSORT(kv.begin(), kv.end());
#pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < n; ++i) {
        keys[i] = kv[(size_t)i].first;
        order[i] = kv[(size_t)i].second;
    }
}

void weighted_split(const double* w_sorted, int64_t n, int64_t n_parts,
                    int64_t cap, int64_t* bounds) {
    // prefix sums (serial: n_parts boundaries need monotone state anyway,
    // and one O(n) pass is ~ms at 10^7)
    std::vector<double> cum((size_t)n + 1, 0.0);
    for (int64_t i = 0; i < n; ++i) cum[(size_t)i + 1] = cum[(size_t)i] + w_sorted[i];
    const double total = cum[(size_t)n];
    bounds[0] = 0;
    for (int64_t k = 1; k < n_parts; ++k) {
        double target = total * (double)k / (double)n_parts;
        int64_t b = (int64_t)(std::lower_bound(cum.begin(), cum.end(), target)
                              - cum.begin()) - 1;
        if (b < bounds[k - 1]) b = bounds[k - 1];
        if (b > bounds[k - 1] + cap) b = bounds[k - 1] + cap;   // maxload
        int64_t floor_b = n - (n_parts - k) * cap;  // room for the rest
        if (b < floor_b) b = floor_b;
        if (b > n) b = n;
        bounds[k] = b;
    }
    bounds[n_parts] = n;
}

}  // extern "C"
