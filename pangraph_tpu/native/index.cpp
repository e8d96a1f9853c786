// Native minimizer-index construction + all-vs-all anchor expansion.
//
// Replaces the numpy hot path of align/mapper.py build_index (concat ->
// argsort -> gathers -> run bookkeeping -> occurrence cutoff; the index is
// rebuilt every merge round, index.c:mm_idx_str-equivalent) and
// collect_anchors_all (equal-value run expansion with -X rid<qi semantics,
// map.c seed collection equivalent). Both run with the GIL released via
// ctypes, so concurrent merge threads overlap them with other host work.
//
// Sorting is an LSD radix sort over the 64-bit minimizer hashes (4 x 16-bit
// passes), stable, so the tie order is deterministic; the python quicksort
// path it replaces documents that within-run tie order is immaterial.
#include <cstdint>
#include <cstring>
#include <vector>
#include <algorithm>

extern "C" {

// Sorts the concatenated sketch entries by value and fills the per-entry
// run structure (run_start/run_size), the inverse permutation sid_order
// (concat position -> sorted slot), and returns max_occ computed exactly as
// minimap2's mm_idx_cal_max_occ (index.c:186-206): the (1-f) quantile of
// per-distinct-minimizer occurrence counts, plus one, clamped to the floor.
int64_t index_build_native(
    int64_t n,
    const uint64_t* values, const int32_t* seq_ids,
    const int64_t* positions, const uint8_t* strands,
    double mid_occ_frac, int64_t max_occ_floor,
    uint64_t* out_values, int32_t* out_seq_ids,
    int64_t* out_positions, uint8_t* out_strands,
    int64_t* out_run_start, int64_t* out_run_size,
    int64_t* out_sid_order)
{
    if (n <= 0) return max_occ_floor;
    // LSD radix sort of indices by 64-bit key, 4 passes x 16 bits
    std::vector<int64_t> idx(n), tmp(n);
    for (int64_t t = 0; t < n; t++) idx[t] = t;
    std::vector<int64_t> counts(1 << 16);
    for (int pass = 0; pass < 4; pass++) {
        const int shift = pass * 16;
        // skip a pass whose key bits are all identical (common for the
        // high halves of masked hashes)
        const uint64_t first = (values[idx[0]] >> shift) & 0xFFFF;
        bool uniform = true;
        for (int64_t t = 1; t < n; t++) {
            if (((values[idx[t]] >> shift) & 0xFFFF) != first) { uniform = false; break; }
        }
        if (uniform) continue;
        std::fill(counts.begin(), counts.end(), 0);
        for (int64_t t = 0; t < n; t++)
            counts[(values[idx[t]] >> shift) & 0xFFFF]++;
        int64_t acc = 0;
        for (int64_t b = 0; b < (1 << 16); b++) {
            const int64_t c = counts[b];
            counts[b] = acc;
            acc += c;
        }
        for (int64_t t = 0; t < n; t++)
            tmp[counts[(values[idx[t]] >> shift) & 0xFFFF]++] = idx[t];
        idx.swap(tmp);
    }
    // gather + inverse permutation
    for (int64_t t = 0; t < n; t++) {
        const int64_t s = idx[t];
        out_values[t] = values[s];
        out_seq_ids[t] = seq_ids[s];
        out_positions[t] = positions[s];
        out_strands[t] = strands[s];
        out_sid_order[s] = t;
    }
    // equal-value runs (per-entry start/size) + per-distinct run sizes
    std::vector<int64_t> run_sizes;
    run_sizes.reserve(1024);
    int64_t rs = 0;
    for (int64_t t = 1; t <= n; t++) {
        if (t == n || out_values[t] != out_values[rs]) {
            const int64_t sz = t - rs;
            run_sizes.push_back(sz);
            for (int64_t u = rs; u < t; u++) {
                out_run_start[u] = rs;
                out_run_size[u] = sz;
            }
            rs = t;
        }
    }
    // occurrence cutoff: (1-f) quantile of sorted distinct-run sizes + 1
    const int64_t m = (int64_t)run_sizes.size();
    int64_t q = (int64_t)((1.0 - mid_occ_frac) * (double)m);
    if (q > m - 1) q = m - 1;
    if (q < 0) q = 0;
    std::nth_element(run_sizes.begin(), run_sizes.begin() + q, run_sizes.end());
    int64_t max_occ = run_sizes[q] + 1;
    if (max_occ < max_occ_floor) max_occ = max_occ_floor;
    return max_occ;
}

// All-vs-all anchors for every query in one pass over the sorted index:
// for every equal-value run with 1 < size <= max_occ, emit every ordered
// pair (query entry a, reference entry b) with seq_ids[b] < seq_ids[a]
// (-X semantics: the higher id is the query, self/dual hits dropped).
// skip_unchanged (per-seq flags, may be NULL): pairs with BOTH sides
// marked are served from the round-over-round pair cache instead.
// Outputs must have room for sum(size*(size-1)) over kept runs (the caller
// computes this bound from run_size); returns the number kept.
int64_t anchors_all_native(
    int64_t n,
    const int32_t* seq_ids, const int64_t* positions, const uint8_t* strands,
    const int64_t* run_start, const int64_t* run_size,
    int64_t max_occ,
    const uint8_t* skip_unchanged,
    int32_t* out_qi, int32_t* out_rid,
    int64_t* out_rpos, int64_t* out_qpos, uint8_t* out_rel)
{
    int64_t out = 0;
    int64_t t = 0;
    while (t < n) {
        const int64_t sz = run_size[t];
        if (sz > 1 && sz <= max_occ) {
            const int64_t lo = run_start[t], hi = lo + sz;
            for (int64_t a = lo; a < hi; a++) {
                const int32_t qi = seq_ids[a];
                const int64_t qpos = positions[a];
                const uint8_t qstr = strands[a];
                const bool qskip = skip_unchanged && skip_unchanged[qi];
                for (int64_t b = lo; b < hi; b++) {
                    const int32_t rid = seq_ids[b];
                    if (rid >= qi) continue;
                    if (qskip && skip_unchanged[rid]) continue;
                    out_qi[out] = qi;
                    out_rid[out] = rid;
                    out_rpos[out] = positions[b];
                    out_qpos[out] = qpos;
                    out_rel[out] = (uint8_t)(strands[b] != qstr);
                    out++;
                }
            }
        }
        t += sz;
    }
    return out;
}

}  // extern "C"
