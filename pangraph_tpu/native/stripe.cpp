// Native host stripe aligner: banded affine-gap DP + traceback, batched
// over jobs with std::thread.
//
// Semantics are an exact scalar port of the vectorized host aligner in
// align/stripe.py (itself mirroring the reference re-aligner,
// align/nextclade/align/score_matrix.rs + backtrace.rs + band_2d.rs:36-54):
// same stripe geometry, tie order (match < ref-gap <=, qry-gap <=),
// left-aligned gap extension flags, free terminal gaps, IUPAC match masks,
// and per-cell BOUNDARY bits driving band-doubling retries.
//
// Why it exists: the TPU device link costs ~30-50 ms latency per round
// (measured through the axon tunnel), while a small merge round's whole DP
// is often < 10 Mcells (~10 ms on one host core). The batch aligner routes
// latency-dominated rounds here and keeps the Pallas kernel for big ones.
//
// Row structure: each row is split into edge segments (generic per-cell code
// with all the stripe-boundary conditions) and an interior segment where
// diag/up moves are always in-band. The interior runs in two phases:
//   A) elementwise match/vertical-gap phase (auto-vectorizable),
//   B) sequential horizontal prefix-max chain + combine (scalar, cmov-heavy).
#include <cstdint>
#include <cstring>
#include <vector>
#include <thread>
#include <atomic>
#include <algorithm>
#if defined(__AVX512F__) && defined(__AVX512BW__)
#include <immintrin.h>
#define STRIPE_AVX512 1
#endif

namespace {

constexpr int8_t MATCH = 1;
constexpr int8_t REF_GAP = 2;
constexpr int8_t QRY_GAP = 4;
constexpr int8_t REF_EXT = 8;
constexpr int8_t QRY_EXT = 16;
constexpr int8_t BOUND = 32;
constexpr int32_t NOAL = -(1 << 29);

struct Params {
    int32_t match, mismatch, open, ext, la;
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

struct Scratch {
    std::vector<int8_t> paths;
    std::vector<int32_t> H_prev, qry_gaps, Mt, QGt, NQt, QEd, Gg;
    std::vector<uint8_t> qmask;
    std::vector<int32_t> msub4;   // [4][Q]: sub score vs ref base A/C/G/T
    std::vector<int32_t> msub_row;  // scratch for rare ambiguous ref rows
};

#ifdef STRIPE_AVX512
// inclusive prefix max over 16 int32 lanes (Hillis-Steele with NOAL fill)
static inline __m512i prefix_max_epi32(__m512i x, __m512i neutral) {
    x = _mm512_max_epi32(x, _mm512_alignr_epi32(x, neutral, 15));  // << 1 lane
    x = _mm512_max_epi32(x, _mm512_alignr_epi32(x, neutral, 14));  // << 2
    x = _mm512_max_epi32(x, _mm512_alignr_epi32(x, neutral, 12));  // << 4
    x = _mm512_max_epi32(x, _mm512_alignr_epi32(x, neutral, 8));   // << 8
    return x;
}
#endif

// One banded DP + traceback. Returns 0 ok, 1 boundary-retry (dead walk /
// out of band), 2 output overflow, 3 paths buffer too large.
int align_one(
    const uint8_t* ref, int64_t R,
    const uint8_t* qry, int64_t Q,
    int64_t ms, int64_t W,
    const Params& P, const uint8_t* mask,
    int64_t max_paths_bytes,
    Scratch& S,
    int32_t* ops, int64_t ops_cap, int64_t* n_ops_out,
    int64_t* subs, int64_t subs_cap, int64_t* n_subs_out,
    int64_t* lead_ins_out, int* hit_boundary_out)
{
    // stride = widest stripe. All interior rows have width 2W+2 clipped to
    // sequence edges; only rows 0 and R can be wider (forced begin/end).
    int64_t stride = std::min<int64_t>(2 * W + 2, Q + 1);
    stride = std::max(stride, stripe_e(0, R, ms, W, Q) - stripe_b(0, ms, W, Q));
    stride = std::max(stride, stripe_e(R, R, ms, W, Q) - stripe_b(R, ms, W, Q));
    if ((R + 1) * stride > max_paths_bytes) return 3;
    S.paths.resize((size_t)((R + 1) * stride));
    int8_t* paths = S.paths.data();

    S.H_prev.assign((size_t)(Q + 1), NOAL);
    S.qry_gaps.assign((size_t)(Q + 1), NOAL);
    int32_t* H_prev = S.H_prev.data();
    int32_t* qry_gaps = S.qry_gaps.data();
    if ((int64_t)S.Mt.size() < stride + 17) {
        S.Mt.resize(stride + 17);
        S.QGt.resize(stride + 17);
        S.NQt.resize(stride + 17);
        S.QEd.resize(stride + 17);
        S.Gg.resize(stride + 17);
    }
    int32_t* Mt = S.Mt.data();
    int32_t* QGt = S.QGt.data();

    // per-job query-side IUPAC masks ('N' and 'n' map to 0xF)
    S.qmask.resize((size_t)std::max<int64_t>(Q, 1));
    uint8_t* qmask = S.qmask.data();
    for (int64_t j = 0; j < Q; j++) qmask[j] = mask[qry[j]];

    // substitution-score rows per ref base class (A/C/G/T): contiguous loads
    // in the interior loop instead of a per-cell table gather. Ambiguous ref
    // bases (IUPAC codes, 'N') are rare and use per-row scratch / a constant.
    S.msub4.resize((size_t)(4 * std::max<int64_t>(Q, 1)));
    for (int c = 0; c < 4; c++) {
        int32_t* __restrict row = S.msub4.data() + (size_t)(c * std::max<int64_t>(Q, 1));
        const uint8_t bit = (uint8_t)(1 << c);
        for (int64_t j = 0; j < Q; j++) {
            const uint8_t m = qmask[j];
            row[j] = (m == 0xF) ? P.match - 1 : ((m & bit) ? P.match : -P.mismatch);
        }
    }
    S.msub_row.resize((size_t)stride);

    // row 0 (score_matrix.rs:61-80)
    const int64_t e0 = stripe_e(0, R, ms, W, Q);
    paths[0] = 0;
    for (int64_t k = 1; k < e0; k++) paths[k] = REF_GAP | REF_EXT;
    for (int64_t k = 0; k < e0; k++)
        H_prev[k] = (P.left_free || k == 0) ? 0 : -P.open - P.ext * (int32_t)(k - 1);

    const int32_t ext = P.ext, open_ = P.open, la = P.la;
    int64_t prev_b = 0, prev_e = e0, pprev_e = 0;
    for (int64_t i = 1; i <= R; i++) {
        const int64_t b = stripe_b(i, ms, W, Q);
        const int64_t e = stripe_e(i, R, ms, W, Q);
        int8_t* prow = paths + i * stride;
        const uint8_t rc = ref[i - 1];
        const bool r_unknown = rc == 'N';
        const int mrc = mask[rc];
        const bool r_free_row = P.right_free && (i == R);
        const int32_t gap_cost = r_free_row ? 0 : open_;

        // substitution score by query IUPAC mask (16 values; 0xF == 'N')
        int32_t msub_tab[16];
        for (int m = 0; m < 16; m++)
            msub_tab[m] = (r_unknown || m == 0xF) ? P.match - 1
                        : ((mrc & m) ? P.match : -P.mismatch);

        // interior: diag_ok, up_ok, positional gap-extension all hold, and
        // none of the specials (first column, j==Q free gaps, k==0) apply
        const int64_t ilo = std::max({b + 1, prev_b + 1, (int64_t)1});
        const int64_t ihi = std::min({e, pprev_e, Q});

        int64_t carry_old = (b >= 1) ? H_prev[b - 1] : NOAL;  // old H_prev[j-1]
        int32_t G_run = NOAL, G_prev_cell = NOAL, Hm1_prev = NOAL, NQ_prev = NOAL;

        // generic per-cell step (stripe edges, specials)
        auto generic_cell = [&](int64_t j) {
            const int64_t k = j - b;
            int8_t path = 0;
            const int32_t old_Hj = H_prev[j];
            const bool diag_ok = (j - 1 >= prev_b) && (j - 1 < prev_e) && (j >= 1);
            int32_t M;
            if (diag_ok) {
                M = (int32_t)carry_old + msub_tab[qmask[j - 1]];
            } else {
                M = NOAL;
                if (j >= 1 && i < R && j < Q) path |= BOUND;
            }
            const bool up_ok = (j < prev_e) && (j >= 1);
            const bool q_free = P.right_free && (j == Q);
            const int32_t qg_old = qry_gaps[j];
            const int32_t q_ext_val = q_free ? qg_old : qg_old - ext;
            const int32_t q_open_val = q_free ? old_Hj : old_Hj - open_;
            const bool q_ext_allowed = (q_ext_val >= q_open_val) && (j < pprev_e);
            int32_t QG;
            if (up_ok) {
                QG = q_ext_allowed ? q_ext_val : q_open_val;
                if (q_ext_allowed) path |= QRY_EXT;
            } else {
                QG = NOAL;
                if (j >= 1 && j < Q && i < R) path |= BOUND;
            }
            qry_gaps[j] = up_ok ? QG : NOAL;

            int32_t h0 = 0;
            const bool first = (j == 0);
            if (first) {
                h0 = P.left_free ? 0 : (i == 1 ? -open_ : old_Hj - ext);
                M = h0;
                QG = NOAL;
            }
            const int32_t NQ = M > QG ? M : QG;

            if (k == 0) {
                G_run = NOAL;
                if (j >= 1 && i < R && j < Q) path |= BOUND;
            } else {
                const int32_t cand = NQ_prev - gap_cost;
                if (cand > G_run) G_run = cand;
            }
            const int32_t G = G_run;
            if (G > NOAL && k > 1 && (G_prev_cell - ext >= Hm1_prev - gap_cost))
                path |= REF_EXT;

            int32_t best_mr;
            int8_t origin;
            if (G > M - la) { best_mr = G; origin = REF_GAP; }
            else { best_mr = M; origin = MATCH; }
            int32_t H;
            if (QG > best_mr - la) { H = QG; origin = QRY_GAP; }
            else { H = best_mr; }
            if (first) { H = h0; origin = QRY_GAP; path = QRY_EXT; }
            prow[k] = path | origin;
            H_prev[j] = H;

            carry_old = old_Hj;
            G_prev_cell = G;
            Hm1_prev = NQ > G ? NQ : G;
            NQ_prev = NQ;
        };

        int64_t j = b;
        for (; j < std::min(ilo, e); j++) generic_cell(j);
        if (j < ihi) {
            const int64_t seg_b = j, n_seg = ihi - seg_b;
            // select the substitution-score row for this ref base
            const int32_t* msubP;  // indexed by t, covers qry[seg_b-1 ...]
            const int64_t Qs = std::max<int64_t>(Q, 1);
            if (mrc == 1) msubP = S.msub4.data() + (seg_b - 1);
            else if (mrc == 2) msubP = S.msub4.data() + Qs + (seg_b - 1);
            else if (mrc == 4) msubP = S.msub4.data() + 2 * Qs + (seg_b - 1);
            else if (mrc == 8) msubP = S.msub4.data() + 3 * Qs + (seg_b - 1);
            else {  // ambiguous / 'N' ref base: per-row scratch
                int32_t* __restrict sr = S.msub_row.data();
                const uint8_t* __restrict qm = qmask + seg_b - 1;
                for (int64_t t = 0; t < n_seg; t++) sr[t] = msub_tab[qm[t]];
                msubP = sr;
            }
            // phase A: match + vertical gap, elementwise over the segment.
            // Reads OLD H_prev/qry_gaps values (phase A writes only qry_gaps,
            // H_prev is untouched until phase B) and fills temps for phase B.
            // QEd >= 0 marks a vertical-gap extension (QRY_EXT bit).
            const int32_t* __restrict Hp = H_prev + seg_b;
            int32_t* __restrict QGr = qry_gaps + seg_b;
            const int32_t* __restrict msubR = msubP;
            int32_t* __restrict MtP = Mt;
            int32_t* __restrict QGtP = QGt;
            int32_t* __restrict NQg = S.NQt.data();  // NQg[1+t] = NQ[t]; [0] = carry
            int32_t* __restrict QEdP = S.QEd.data();
            NQg[0] = NQ_prev;
            {   // t == 0: the left neighbour was already overwritten by the
                // generic cells this row; its OLD value lives in carry_old
                const int32_t m = (int32_t)carry_old + msubR[0];
                const int32_t qe_v = QGr[0] - ext;
                const int32_t qo_v = Hp[0] - open_;
                const int32_t qg = qe_v > qo_v ? qe_v : qo_v;
                QGr[0] = qg;
                MtP[0] = m;
                QGtP[0] = qg;
                NQg[1] = m > qg ? m : qg;
                QEdP[0] = qe_v - qo_v;
            }
            for (int64_t t = 1; t < n_seg; t++) {
                const int32_t m = Hp[t - 1] + msubR[t];
                const int32_t qe_v = QGr[t] - ext;
                const int32_t qo_v = Hp[t] - open_;
                const int32_t qg = qe_v > qo_v ? qe_v : qo_v;
                QGr[t] = qg;
                MtP[t] = m;
                QGtP[t] = qg;
                NQg[1 + t] = m > qg ? m : qg;
                QEdP[t] = qe_v - qo_v;
            }
            // old H_prev[ihi-1], needed as carry for the generic cell at ihi
            const int32_t old_last = Hp[n_seg - 1];
            // phase B: horizontal prefix-max chain + combine.
            // Gg[1+t] = G[t]; Gg[0] = carry (G at the previous cell).
            int8_t* __restrict pr = prow + (seg_b - b);
            int32_t* __restrict Hw = H_prev + seg_b;
            int32_t* __restrict Gg = S.Gg.data();
            Gg[0] = G_run;
            const int64_t k0 = seg_b - b;
            int64_t t = 0;
#ifdef STRIPE_AVX512
            {
                const __m512i NEUT = _mm512_set1_epi32(NOAL);
                const __m512i gcv = _mm512_set1_epi32(gap_cost);
                const __m512i extv = _mm512_set1_epi32(ext);
                const __m512i lav = _mm512_set1_epi32(la);
                const __m512i vMATCH = _mm512_set1_epi32(MATCH);
                const __m512i vREFG = _mm512_set1_epi32(REF_GAP);
                const __m512i vQRYG = _mm512_set1_epi32(QRY_GAP);
                const __m512i vREFX = _mm512_set1_epi32(REF_EXT);
                const __m512i vQRYX = _mm512_set1_epi32(QRY_EXT);
                const __m512i lane15 = _mm512_set1_epi32(15);
                __m512i carry = _mm512_set1_epi32(G_run);
                for (; t + 16 <= n_seg; t += 16) {
                    const __m512i nqm1 = _mm512_loadu_si512(NQg + t);  // NQ[t-1]
                    __m512i x = _mm512_sub_epi32(nqm1, gcv);
                    x = prefix_max_epi32(x, NEUT);
                    x = _mm512_max_epi32(x, carry);
                    _mm512_storeu_si512(Gg + 1 + t, x);
                    carry = _mm512_permutexvar_epi32(lane15, x);
                    const __m512i G = x;
                    const __m512i Gm1 = _mm512_loadu_si512(Gg + t);
                    const __m512i Hm1m1 = _mm512_max_epi32(nqm1, Gm1);
                    __mmask16 re = _mm512_cmp_epi32_mask(
                        _mm512_sub_epi32(Gm1, extv), _mm512_sub_epi32(Hm1m1, gcv), _MM_CMPINT_NLT);
                    re &= _mm512_cmpgt_epi32_mask(G, NEUT);
                    const int64_t kt = k0 + t;
                    if (kt < 2)  // k > 1 gate (first block only)
                        re &= (__mmask16)(0xFFFFu << (unsigned)(2 - kt));
                    const __m512i M = _mm512_loadu_si512(MtP + t);
                    const __m512i QG = _mm512_loadu_si512(QGtP + t);
                    const __m512i QEd = _mm512_loadu_si512(QEdP + t);
                    const __mmask16 rsel = _mm512_cmpgt_epi32_mask(G, _mm512_sub_epi32(M, lav));
                    const __m512i best = _mm512_mask_blend_epi32(rsel, M, G);
                    const __mmask16 qsel = _mm512_cmpgt_epi32_mask(QG, _mm512_sub_epi32(best, lav));
                    const __m512i H = _mm512_mask_blend_epi32(qsel, best, QG);
                    _mm512_storeu_si512(Hw + t, H);
                    __m512i bits = vMATCH;
                    bits = _mm512_mask_mov_epi32(bits, rsel, vREFG);
                    bits = _mm512_mask_mov_epi32(bits, qsel, vQRYG);
                    const __mmask16 qext = _mm512_cmp_epi32_mask(
                        QEd, _mm512_setzero_si512(), _MM_CMPINT_NLT);
                    bits = _mm512_or_si512(bits, _mm512_maskz_mov_epi32(qext, vQRYX));
                    bits = _mm512_or_si512(bits, _mm512_maskz_mov_epi32(re, vREFX));
                    _mm_storeu_si128((__m128i*)(pr + t), _mm512_cvtepi32_epi8(bits));
                }
                if (t > 0) {
                    G_run = G_prev_cell = Gg[t];
                    NQ_prev = NQg[t];
                    Hm1_prev = NQ_prev > G_prev_cell ? NQ_prev : G_prev_cell;
                }
            }
#endif
            for (int64_t k = k0 + t; t < n_seg; t++, k++) {
                const int32_t cand = NQ_prev - gap_cost;
                if (cand > G_run) G_run = cand;
                const int32_t G = G_run;
                Gg[1 + t] = G;
                const int32_t M = MtP[t], QG = QGtP[t], NQ = NQg[1 + t];
                int8_t path = QEdP[t] >= 0 ? QRY_EXT : 0;
                if (G > NOAL && k > 1 && (G_prev_cell - ext >= Hm1_prev - gap_cost))
                    path |= REF_EXT;
                int32_t best_mr;
                int8_t origin;
                if (G > M - la) { best_mr = G; origin = REF_GAP; }
                else { best_mr = M; origin = MATCH; }
                int32_t H;
                if (QG > best_mr - la) { H = QG; origin = QRY_GAP; }
                else { H = best_mr; }
                pr[t] = path | origin;
                Hw[t] = H;
                G_prev_cell = G;
                Hm1_prev = NQ > G ? NQ : G;
                NQ_prev = NQ;
            }
            carry_old = old_last;
            j = ihi;
        }
        for (; j < e; j++) generic_cell(j);

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
    const Params P{(int32_t)match, (int32_t)mismatch, (int32_t)open_,
                   (int32_t)ext, (int32_t)la, left_free, right_free};
    std::atomic<int64_t> next(0);
    auto worker = [&]() {
        Scratch S;
        for (;;) {
            const int64_t j = next.fetch_add(1);
            if (j >= n_jobs) break;
            int hb = 0;
            const int rc = align_one(
                refs + ref_off[j], ref_len[j],
                qrys + qry_off[j], qry_len[j],
                ms[j], W[j], P, iupac_mask, max_paths_bytes, S,
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
