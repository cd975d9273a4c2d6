// Levenshtein distance over int64 token sequences (C ABI for ctypes).
//
// The reference depends on the `editdistance` pip package (a C++
// extension) for its segment-level Levenshtein metric
// (src/evaluation/accuracy.py:364-408); this is our native equivalent.
// Two-row DP (full table, no banding): O(n*m) time, O(min(n,m)) space.

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

}  // extern "C"
