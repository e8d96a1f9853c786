// Native host stripe aligner: banded affine-gap DP + traceback, batched
// over jobs with std::thread.
//
// Semantics are an exact scalar port of the vectorized host aligner in
// align/stripe.py (itself mirroring the reference re-aligner,
// align/nextclade/align/score_matrix.rs + backtrace.rs + band_2d.rs:36-54):
// same stripe geometry, tie order (match < ref-gap <= , qry-gap <=),
// left-aligned gap extension flags, free terminal gaps, IUPAC match masks,
// and per-cell BOUNDARY bits driving band-doubling retries.
//
// Why it exists: the TPU device link costs ~30-50 ms latency per round
// (measured through the axon tunnel), while a small merge round's whole DP
// is often < 10 Mcells (~10 ms on one host core). The batch aligner routes
// latency-dominated rounds here and keeps the Pallas kernel for big ones.
#include <cstdint>
#include <cstring>
#include <vector>
#include <thread>
#include <atomic>
#include <algorithm>

namespace {

constexpr int8_t MATCH = 1;
constexpr int8_t REF_GAP = 2;
constexpr int8_t QRY_GAP = 4;
constexpr int8_t REF_EXT = 8;
constexpr int8_t QRY_EXT = 16;
constexpr int8_t BOUND = 32;
constexpr int64_t NOAL = -1000000000LL;

struct Params {
    int64_t match, mismatch, open, ext, la;
    int left_free, right_free;
};

inline int64_t clampi(int64_t x, int64_t lo, int64_t hi) {
    return x < lo ? lo : (x > hi ? hi : x);
}

// Stripe bounds (band_2d.rs:36-54 / stripe.py simple_stripes)
inline int64_t stripe_b(int64_t i, int64_t ms, int64_t W, int64_t Q) {
    return i == 0 ? 0 : clampi(i - ms - W, 0, Q);
}
inline int64_t stripe_e(int64_t i, int64_t R, int64_t ms, int64_t W, int64_t Q) {
    return i == R ? Q + 1 : clampi(i - ms + W + 1, 1, Q + 1);
}

// One banded DP + traceback. Returns 0 ok, 1 boundary-retry (dead walk /
// out of band), 2 output overflow, 3 paths buffer too large.
int align_one(
    const uint8_t* ref, int64_t R,
    const uint8_t* qry, int64_t Q,
    int64_t ms, int64_t W,
    const Params& P, const uint8_t* mask,
    int64_t max_paths_bytes,
    std::vector<int8_t>& paths_buf,      // reused scratch
    std::vector<int64_t>& H_prev_buf,    // reused scratch
    std::vector<int64_t>& qry_gaps_buf,  // reused scratch
    int32_t* ops, int64_t ops_cap, int64_t* n_ops_out,
    int64_t* subs, int64_t subs_cap, int64_t* n_subs_out,
    int64_t* lead_ins_out, int* hit_boundary_out)
{
    // stride = widest stripe
    int64_t stride = 0;
    for (int64_t i = 0; i <= R; i++) {
        int64_t w = stripe_e(i, R, ms, W, Q) - stripe_b(i, ms, W, Q);
        if (w > stride) stride = w;
    }
    if ((R + 1) * stride > max_paths_bytes) return 3;
    paths_buf.resize((size_t)((R + 1) * stride));
    int8_t* paths = paths_buf.data();

    H_prev_buf.assign((size_t)(Q + 1), NOAL);
    qry_gaps_buf.assign((size_t)(Q + 1), NOAL);
    int64_t* H_prev = H_prev_buf.data();
    int64_t* qry_gaps = qry_gaps_buf.data();

    // row 0 (score_matrix.rs:61-80)
    const int64_t e0 = stripe_e(0, R, ms, W, Q);
    paths[0] = 0;
    for (int64_t k = 1; k < e0; k++) paths[k] = REF_GAP | REF_EXT;
    for (int64_t k = 0; k < e0; k++)
        H_prev[k] = (P.left_free || k == 0) ? 0 : -P.open - P.ext * (k - 1);

    int64_t prev_b = 0, prev_e = e0, pprev_e = 0;
    for (int64_t i = 1; i <= R; i++) {
        const int64_t b = stripe_b(i, ms, W, Q);
        const int64_t e = stripe_e(i, R, ms, W, Q);
        int8_t* prow = paths + i * stride;
        const uint8_t rc = ref[i - 1];
        const bool r_unknown = rc == 'N';
        const int mrc = mask[rc];
        const bool r_free_row = P.right_free && (i == R);
        const int64_t gap_cost = r_free_row ? 0 : P.open;

        int64_t carry_old = (b >= 1) ? H_prev[b - 1] : NOAL;  // old H_prev[j-1]
        int64_t G_run = NOAL, G_prev_cell = NOAL, Hm1_prev = NOAL, NQ_prev = NOAL;
        for (int64_t j = b; j < e; j++) {
            const int64_t k = j - b;
            int8_t path = 0;
            const int64_t old_Hj = H_prev[j];

            // diagonal / match
            const bool diag_ok = (j - 1 >= prev_b) && (j - 1 < prev_e) && (j >= 1);
            int64_t M;
            if (diag_ok) {
                const uint8_t qc = qry[j - 1];
                const bool unknown = r_unknown || qc == 'N';
                const bool compat = (mrc & mask[qc]) != 0;
                M = carry_old + (unknown ? P.match - 1 : (compat ? P.match : -P.mismatch));
            } else {
                M = NOAL;
                if (j >= 1 && i < R && j < Q) path |= BOUND;
            }

            // query gap (vertical)
            const bool up_ok = (j < prev_e) && (j >= 1);
            const bool q_free = P.right_free && (j == Q);
            const int64_t qg_old = qry_gaps[j];
            const int64_t q_ext_val = q_free ? qg_old : qg_old - P.ext;
            const int64_t q_open_val = q_free ? old_Hj : old_Hj - P.open;
            const bool q_ext_allowed = (q_ext_val >= q_open_val) && (j < pprev_e);
            int64_t QG;
            if (up_ok) {
                QG = q_ext_allowed ? q_ext_val : q_open_val;
                if (q_ext_allowed) path |= QRY_EXT;
            } else {
                QG = NOAL;
                if (j >= 1 && j < Q && i < R) path |= BOUND;
            }
            qry_gaps[j] = up_ok ? QG : NOAL;

            // first matrix column: leading query deletion chain
            int64_t h0 = 0;
            const bool first = (j == 0);  // only possible when b == 0
            if (first) {
                h0 = P.left_free ? 0 : (i == 1 ? -P.open : old_Hj - P.ext);
                M = h0;
                QG = NOAL;
            }
            const int64_t NQ = M > QG ? M : QG;

            // ref gap (horizontal) via running prefix max
            if (k == 0) {
                G_run = NOAL;
                if (j >= 1 && i < R && j < Q) path |= BOUND;
            } else {
                const int64_t cand = NQ_prev - gap_cost;
                if (cand > G_run) G_run = cand;
            }
            const int64_t G = G_run;
            if (G > NOAL && k > 1 && (G_prev_cell - P.ext >= Hm1_prev - gap_cost))
                path |= REF_EXT;

            // combine with reference tie order (score_matrix.rs:91-192)
            int64_t best_mr;
            int8_t origin;
            if (G > M - P.la) { best_mr = G; origin = REF_GAP; }
            else { best_mr = M; origin = MATCH; }
            int64_t H;
            if (QG > best_mr - P.la) { H = QG; origin = QRY_GAP; }
            else { H = best_mr; }
            if (first) { H = h0; origin = QRY_GAP; path = QRY_EXT; }
            prow[k] = path | origin;
            H_prev[j] = H;

            carry_old = old_Hj;
            G_prev_cell = G;
            Hm1_prev = NQ > G ? NQ : G;
            NQ_prev = NQ;
        }
        pprev_e = prev_e;
        prev_b = b;
        prev_e = e;
    }

    // traceback -> RLE ops (end-to-start) + subs (backtrace.rs:17-100)
    int64_t i = R, q = Q;
    int state = 0;
    int64_t n_ops = 0, n_subs = 0;
    int cur_op = -1;
    int64_t cur_len = 0;
    int hb = 0;
    while (i > 0) {
        const int64_t b = stripe_b(i, ms, W, Q);
        const int64_t e = stripe_e(i, R, ms, W, Q);
        const int64_t k = q - b;
        if (k < 0 || k >= e - b) return 1;
        const int bits = paths[i * stride + k];
        if (bits == 0) return 1;
        if (bits & BOUND) hb = 1;
        int op;
        if ((bits & MATCH) && state == 0) {
            op = 0;
            i--; q--;
            if (ref[i] != qry[q]) {
                if (n_subs >= subs_cap) return 2;
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
                if (n_ops >= ops_cap) return 2;
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
        if (n_ops >= ops_cap) return 2;
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

}  // namespace

extern "C" {

// Batched stripe alignment over n jobs, threaded. Sequences are passed as
// concatenated uint8 buffers with per-job offsets/lengths. Outputs use flat
// per-job slices of fixed caps. status[j]: 0 ok, 1 boundary-retry needed,
// 2 ops/subs overflow, 3 paths buffer over budget.
void stripe_align_batch(
    int64_t n_jobs,
    const uint8_t* refs, const int64_t* ref_off, const int64_t* ref_len,
    const uint8_t* qrys, const int64_t* qry_off, const int64_t* qry_len,
    const int64_t* ms, const int64_t* W,
    // params
    int64_t match, int64_t mismatch, int64_t open_, int64_t ext, int64_t la,
    int left_free, int right_free,
    const uint8_t* iupac_mask,       // [256]
    int64_t max_paths_bytes,         // per-job paths budget
    // outputs (flat, per-job slices)
    int32_t* ops, int64_t ops_cap, int64_t* n_ops,
    int64_t* subs, int64_t subs_cap, int64_t* n_subs,
    int64_t* lead_ins, int32_t* hit_boundary, int32_t* status,
    int32_t n_threads)
{
    const Params P{match, mismatch, open_, ext, la, left_free, right_free};
    std::atomic<int64_t> next(0);
    auto worker = [&]() {
        std::vector<int8_t> paths_buf;
        std::vector<int64_t> H_buf, QG_buf;
        for (;;) {
            const int64_t j = next.fetch_add(1);
            if (j >= n_jobs) break;
            int hb = 0;
            const int rc = align_one(
                refs + ref_off[j], ref_len[j],
                qrys + qry_off[j], qry_len[j],
                ms[j], W[j], P, iupac_mask, max_paths_bytes,
                paths_buf, H_buf, QG_buf,
                ops + j * ops_cap * 2, ops_cap, &n_ops[j],
                subs + j * subs_cap * 2, subs_cap, &n_subs[j],
                &lead_ins[j], &hb);
            hit_boundary[j] = hb;
            status[j] = rc;
        }
    };
    if (n_threads <= 1 || n_jobs <= 1) {
        worker();
    } else {
        std::vector<std::thread> ts;
        const int nt = (int)std::min<int64_t>(n_threads, n_jobs);
        ts.reserve(nt);
        for (int t = 0; t < nt; t++) ts.emplace_back(worker);
        for (auto& t : ts) t.join();
    }
}

}  // extern "C"
