// Native (w,k)-minimizer sketch: exact port of align/minimizer.py sketch()
// (itself mirroring distance/mash/minimizer.rs:49-130 and minimap2's
// sketch.c semantics with the Jenkins invertible hash, hash.rs:3-12).
//
// Rolling 2-bit codes, canonical strand (rev < fwd), palindrome k-mers
// skipped, invalid bases invalidate covering k-mers, windowed minimum via a
// monotonic deque with leftmost tie-breaking, adjacent-duplicate positions
// deduped. ~100x the numpy path on Mbp sequences; block consensuses change
// every merge round, so sketching is on the mapper's critical path.
#include <cstddef>
#include <cstdint>
#include <vector>

using std::size_t;

namespace {

constexpr uint64_t SENTINEL = ~0ULL;

inline uint64_t jenkins(uint64_t x, uint64_t m) {
    x = (~x + (x << 21)) & m;
    x = x ^ (x >> 24);
    x = (x + (x << 3) + (x << 8)) & m;
    x = x ^ (x >> 14);
    x = (x + (x << 2) + (x << 4)) & m;
    x = x ^ (x >> 28);
    x = (x + (x << 31)) & m;
    return x;
}

}  // namespace

extern "C" {

// Returns the number of emitted minimizers (<= L). Output arrays must have
// room for L-k+1 entries. twobit: 256-entry table, A/C/G/T -> 0..3, else >= 4.
int64_t sketch_native(
    const uint8_t* seq, int64_t L, int32_t k, int32_t w,
    const uint8_t* twobit,
    uint64_t* out_vals, int64_t* out_pos, uint8_t* out_strand)
{
    const int64_t n = L - k + 1;
    if (n <= 0 || n < w) return 0;
    const uint64_t mask = (k >= 32) ? ~0ULL : ((1ULL << (2 * k)) - 1);

    // monotonic deque over k-mer hash values (indices into the k-mer array)
    std::vector<int64_t> dq_pos((size_t)(w + 1));
    std::vector<uint64_t> dq_val((size_t)(w + 1));
    int64_t dq_b = 0, dq_e = 0;  // [b, e) ring-free (compact on demand)
    std::vector<uint8_t> rev_ring((size_t)w);

    uint64_t fwd = 0, rev = 0;
    int64_t run_valid = 0;
    int64_t n_out = 0;
    int64_t last_pos = -1;

    for (int64_t i = 0; i < L; i++) {
        const uint8_t c = twobit[seq[i]];
        const uint64_t b2 = c & 3;
        fwd = ((fwd << 2) | b2) & mask;
        rev = (rev >> 2) | ((3ULL ^ b2) << (2 * (k - 1)));
        run_valid = (c < 4) ? run_valid + 1 : 0;
        if (i < k - 1) continue;
        const int64_t kpos = i - k + 1;
        uint64_t h;
        uint8_t is_rev = 0;
        if (run_valid >= k && fwd != rev) {
            is_rev = rev < fwd;
            h = jenkins(is_rev ? rev : fwd, mask);
        } else {
            h = SENTINEL;
        }
        rev_ring[(size_t)(kpos % w)] = is_rev;
        // push (kpos, h): pop strictly-greater tails so equal values keep
        // the earlier index (leftmost tie-break)
        while (dq_e > dq_b && dq_val[(size_t)(dq_e - 1)] > h) dq_e--;
        if (dq_e == (int64_t)dq_pos.size()) {  // compact
            const int64_t len = dq_e - dq_b;
            for (int64_t t = 0; t < len; t++) {
                dq_pos[(size_t)t] = dq_pos[(size_t)(dq_b + t)];
                dq_val[(size_t)t] = dq_val[(size_t)(dq_b + t)];
            }
            dq_b = 0;
            dq_e = len;
        }
        dq_pos[(size_t)dq_e] = kpos;
        dq_val[(size_t)dq_e] = h;
        dq_e++;
        // window j = kpos - w + 1 covers k-mers [j, j+w)
        const int64_t j = kpos - w + 1;
        if (j < 0) continue;
        while (dq_pos[(size_t)dq_b] < j) dq_b++;
        const uint64_t mv = dq_val[(size_t)dq_b];
        const int64_t mp = dq_pos[(size_t)dq_b];
        if (mv != SENTINEL && mp != last_pos) {
            out_vals[n_out] = mv;
            out_pos[n_out] = mp;
            out_strand[n_out] = rev_ring[(size_t)(mp % w)];
            n_out++;
            last_pos = mp;
        }
    }
    return n_out;
}

}  // extern "C"
