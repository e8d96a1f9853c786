// Native host kernels: anchor chaining DP and banded traceback.
//
// The chaining DP (minimap2 lchain.c equivalent; SURVEY.md §2.1) is an
// inherently sequential scan over sorted anchors with a bounded look-back
// window — light integer work that belongs on the host next to the anchor
// arrays, not on the TPU. Compiled at import time by pangraph_tpu.native
// (g++ -O3), called through ctypes; a numpy fallback exists in align/chain.py.
#include <cstdint>
#include <cstring>
#include <cmath>
#include <algorithm>
#include <vector>

extern "C" {

// Chaining DP over anchors sorted by (rpos, qpos).
//   f[i]     = best chain score ending at anchor i
//   parent[i]= predecessor anchor index or -1
// score(j->i) = min(dq, dr, k) - (|dr-dq| * 0.01 * k + log2(|dr-dq|)/2)
void chain_dp(
    int64_t n,
    const int64_t* rpos,
    const int64_t* qpos,
    int32_t k,
    int64_t max_gap,
    int64_t bw,
    int32_t window,
    int64_t* f,
    int64_t* parent)
{
    for (int64_t i = 0; i < n; i++) {
        int64_t best = k;
        int64_t best_j = -1;
        const int64_t ri = rpos[i], qi = qpos[i];
        const int64_t j0 = i - window < 0 ? 0 : i - window;
        for (int64_t j = i - 1; j >= j0; j--) {
            const int64_t dr = ri - rpos[j];
            const int64_t dq = qi - qpos[j];
            if (dr <= 0 || dq <= 0 || dr > max_gap || dq > max_gap) continue;
            const int64_t dd = dr > dq ? dr - dq : dq - dr;
            if (dd > bw) continue;
            int64_t alpha = dq < dr ? dq : dr;
            if (alpha > k) alpha = k;
            int64_t gap_cost = 0;
            if (dd > 0) {
                int log2dd = 63 - __builtin_clzll((uint64_t)dd);
                // integer formulation: identical across numpy / C++ / Pallas
                gap_cost = (dd * k) / 100 + (log2dd >> 1);
            }
            const int64_t cand = f[j] + alpha - gap_cost;
            if (cand > best) { best = cand; best_j = j; }
        }
        f[i] = best;
        parent[i] = best_j;
    }
}

// Chain extraction from the DP arrays: peaks by descending score (stable on
// index for ties, matching np.argsort(-f, kind="stable")), parent-walk with
// used-anchor masking. Chains shorter than min_anchors consume their anchors
// but emit nothing (same as align/chain.py:_extract_chains). out_idx receives
// the concatenated chains, each in ascending walk order; returns n_chains.
int64_t chain_extract(
    int64_t n,
    const int64_t* f,
    const int64_t* parent,
    int64_t min_score,
    int64_t min_anchors,
    int64_t max_chains,
    int64_t* out_idx,    // [n]
    int64_t* out_len,    // [max_chains]
    int64_t* out_score)  // [max_chains]
{
    std::vector<int64_t> peaks(n);
    for (int64_t i = 0; i < n; i++) peaks[i] = i;
    std::stable_sort(peaks.begin(), peaks.end(),
                     [&](int64_t a, int64_t b) { return f[a] > f[b]; });
    std::vector<uint8_t> used(n, 0);
    int64_t n_chains = 0, w = 0;
    for (int64_t pi = 0; pi < n && n_chains < max_chains; pi++) {
        const int64_t i = peaks[pi];
        if (used[i] || f[i] < min_score) continue;
        const int64_t start = w;
        int64_t j = i;
        while (j >= 0 && !used[j]) {
            out_idx[w++] = j;
            used[j] = 1;
            j = parent[j];
        }
        const int64_t len = w - start;
        if (len < min_anchors) {
            w = start;  // anchors stay used, chain not emitted
            continue;
        }
        std::reverse(out_idx + start, out_idx + w);
        out_len[n_chains] = len;
        out_score[n_chains] = f[i];
        n_chains++;
    }
    return n_chains;
}

// Banded traceback over int8 path bits (band-coordinate layout of
// ops/batch_align.backtrace_band). Emits RLE ops end-to-start:
//   op codes: 0=M, 1=I (ref gap), 2=D (qry gap)
// subs recorded as (ref_pos, qry_char). Returns 0 ok, 1 boundary-retry
// needed, 2 overflow.
int backtrace_band(
    const int8_t* paths,   // [n_rows, B]
    int64_t B,
    const uint8_t* ref, int64_t rlen,
    const uint8_t* qry, int64_t qlen,
    int64_t ms, int64_t W,
    int clamped,           // 1: lo = clip(i-ms-W, 0, max(qlen+1-B,0)); 0: diagonal
    int32_t* ops,          // [max_ops*2] out
    int64_t max_ops,
    int64_t* n_ops_out,
    int64_t* subs,         // [max_subs*2] out
    int64_t max_subs,
    int64_t* n_subs_out,
    int64_t* lead_ins_out,
    int* hit_boundary_out)
{
    const int MATCH = 1, REF_GAP = 2, QRY_GAP = 4, REF_EXT = 8, QRY_EXT = 16, BOUND = 32;
    int64_t i = rlen, q = qlen;
    int state = 0;
    int64_t n_ops = 0, n_subs = 0;
    int cur_op = -1;
    int64_t cur_len = 0;
    int hb = 0;
    const int64_t lo_hi = qlen + 1 - B > 0 ? qlen + 1 - B : 0;
    while (i > 0) {
        int64_t lo = i - ms - W;
        if (clamped) {
            if (lo < 0) lo = 0;
            else if (lo > lo_hi) lo = lo_hi;
        }
        const int64_t kk = q - lo;
        if (kk < 0 || kk >= B) return 1;
        const int bits = paths[(i - 1) * B + kk];
        if (bits == 0) return 1;
        if (bits & BOUND) hb = 1;
        int op;
        if ((bits & MATCH) && state == 0) {
            op = 0;
            i--; q--;
            if (ref[i] != qry[q]) {
                if (n_subs >= max_subs) return 2;
                subs[n_subs * 2] = i;
                subs[n_subs * 2 + 1] = qry[q];
                n_subs++;
            }
        } else if (((bits & REF_GAP) && state == 0) || state == REF_GAP) {
            op = 1;
            q--;
            state = (bits & REF_EXT) ? REF_GAP : 0;
        } else if (((bits & QRY_GAP) && state == 0) || state == QRY_GAP) {
            op = 2;
            i--;
            state = (bits & QRY_EXT) ? QRY_GAP : 0;
        } else {
            return 1;
        }
        if (op != cur_op) {
            if (cur_len > 0) {
                if (n_ops >= max_ops) return 2;
                ops[n_ops * 2] = cur_op;
                ops[n_ops * 2 + 1] = (int32_t)cur_len;
                n_ops++;
            }
            cur_op = op;
            cur_len = 0;
        }
        cur_len++;
    }
    if (cur_len > 0) {
        if (n_ops >= max_ops) return 2;
        ops[n_ops * 2] = cur_op;
        ops[n_ops * 2 + 1] = (int32_t)cur_len;
        n_ops++;
    }
    *lead_ins_out = q;
    *n_ops_out = n_ops;
    *n_subs_out = n_subs;
    *hit_boundary_out = hb;
    return 0;
}

}  // extern "C"
