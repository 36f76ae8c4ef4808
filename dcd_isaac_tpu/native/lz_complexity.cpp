// Lempel-Ziv 76 complexity of integer sequences.
//
// Native replacement for the `lempel_ziv_complexity` C extension the
// reference depends on (algos/storage.py:21,345) for action-trajectory
// complexity logging.  Operates on batches of int32 token sequences with
// per-sequence lengths; exposed to Python via ctypes (see lz.py).
//
// Algorithm: classic LZ76 phrase counting — scan left to right, counting
// the number of distinct phrases where each new phrase is the shortest
// substring not seen as a substring of the preceding prefix extension.

#include <cstdint>
#include <vector>

extern "C" {

// Straightforward reference implementation via substring hashing-free
// scan (O(n^2) worst case; trajectories are <= a few thousand tokens).
int32_t lz76_complexity_simple(const int32_t* s, int32_t n) {
    if (n <= 0) return 0;
    int32_t c = 0;
    int32_t i = 0;
    while (i < n) {
        // find the longest match of s[i..] inside s[0..i+l-1] extended
        int32_t l = 1;
        while (i + l <= n) {
            // is s[i .. i+l-1] a substring of s[0 .. i+l-2]?
            bool found = false;
            for (int32_t start = 0; start + l <= i + l - 1; ++start) {
                bool eq = true;
                for (int32_t k = 0; k < l; ++k) {
                    if (s[start + k] != s[i + k]) { eq = false; break; }
                }
                if (eq) { found = true; break; }
            }
            if (!found) break;
            l += 1;
        }
        c += 1;
        i += l;
    }
    return c;
}

// Batched: sequences flattened into `flat` with per-row length `lens`.
void lz76_batch(const int32_t* flat, const int32_t* lens, int32_t rows,
                int32_t row_stride, int32_t* out) {
    for (int32_t r = 0; r < rows; ++r) {
        out[r] = lz76_complexity_simple(flat + r * row_stride, lens[r]);
    }
}

}  // extern "C"
