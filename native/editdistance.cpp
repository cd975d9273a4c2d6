// Levenshtein distance over int64 token sequences (C ABI for ctypes).
//
// The reference depends on the `editdistance` pip package (a C++
// extension) for its segment-level Levenshtein metric
// (src/evaluation/accuracy.py:364-408); this is our native equivalent.
// Banded two-row DP, O(n*m) time, O(min(n,m)) space.

#include <cstdint>
#include <vector>
#include <algorithm>

extern "C" {

int64_t edit_distance(const int64_t* a, int64_t na, const int64_t* b, int64_t nb) {
    if (na == 0) return nb;
    if (nb == 0) return na;
    if (na < nb) {
        std::swap(a, b);
        std::swap(na, nb);
    }
    std::vector<int64_t> prev(nb + 1), cur(nb + 1);
    for (int64_t j = 0; j <= nb; ++j) prev[j] = j;
    for (int64_t i = 1; i <= na; ++i) {
        cur[0] = i;
        const int64_t ai = a[i - 1];
        for (int64_t j = 1; j <= nb; ++j) {
            int64_t sub = prev[j - 1] + (ai != b[j - 1]);
            cur[j] = std::min(sub, std::min(prev[j], cur[j - 1]) + 1);
        }
        std::swap(prev, cur);
    }
    return prev[nb];
}

// Batched variant: distances between consecutive pairs laid out in one
// flat buffer with offsets (reduces ctypes call overhead for eval sweeps).
void edit_distance_batch(const int64_t* data_a, const int64_t* offs_a,
                         const int64_t* data_b, const int64_t* offs_b,
                         int64_t n_pairs, int64_t* out) {
    for (int64_t i = 0; i < n_pairs; ++i) {
        out[i] = edit_distance(data_a + offs_a[i], offs_a[i + 1] - offs_a[i],
                               data_b + offs_b[i], offs_b[i + 1] - offs_b[i]);
    }
}

}  // extern "C"
