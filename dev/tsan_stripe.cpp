// ThreadSanitizer harness for the threaded native aligner (dev/tsan.sh).
//
// The reference relies on Rust's compile-time guarantees for its rayon
// pools (SURVEY.md §5 race detection); our equivalent hot threading site is
// stripe_align_batch's worker pool (native/stripe.cpp) and the chain/sketch
// kernels it shares Scratch-free state with. This driver exercises the
// batch entry point from many threads under -fsanitize=thread, which
// instruments every load/store in the .o files it links.
//
// Build + run: dev/tsan.sh (exits non-zero on any reported race).
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

extern "C" void stripe_align_batch(
    int64_t n_jobs,
    const uint8_t* refs, const int64_t* ref_off, const int64_t* ref_len,
    const uint8_t* qrys, const int64_t* qry_off, const int64_t* qry_len,
    const int64_t* ms, const int64_t* W,
    int64_t match, int64_t mismatch, int64_t open_, int64_t ext, int64_t la,
    int left_free, int right_free,
    const uint8_t* iupac_mask,
    int64_t max_paths_bytes,
    int32_t* ops, int64_t ops_cap, int64_t* n_ops,
    int64_t* subs, int64_t subs_cap, int64_t* n_subs,
    int64_t* lead_ins, int32_t* hit_boundary, int32_t* status,
    int32_t n_threads);

extern "C" int64_t chain_extract(
    int64_t n, const int64_t* f, const int64_t* parent,
    int64_t min_score, int64_t min_anchors, int64_t max_chains,
    int64_t* out_idx, int64_t* out_len, int64_t* out_score);

static uint32_t rng_state = 12345;
static uint32_t xrand() {
    rng_state ^= rng_state << 13;
    rng_state ^= rng_state >> 17;
    rng_state ^= rng_state << 5;
    return rng_state;
}

int main() {
    const char ACGT[4] = {'A', 'C', 'G', 'T'};
    uint8_t iupac[256];
    memset(iupac, 0xF, sizeof(iupac));
    iupac['A'] = 1; iupac['C'] = 2; iupac['G'] = 4; iupac['T'] = 8;

    const int64_t n = 64, L = 4000;
    std::vector<uint8_t> refs(n * L), qrys;
    std::vector<int64_t> roff(n), rlen(n, L), qoff(n), qlen(n);
    for (int64_t j = 0; j < n * L; j++) refs[j] = (uint8_t)ACGT[xrand() & 3];
    for (int64_t j = 0; j < n; j++) {
        roff[j] = j * L;
        qoff[j] = (int64_t)qrys.size();
        for (int64_t p = 0; p < L; p++) {
            uint8_t c = refs[j * L + p];
            uint32_t r = xrand();
            if ((r & 127) == 0) c = (uint8_t)ACGT[r & 3];      // sub
            if ((r & 1023) == 1) continue;                      // del
            qrys.push_back(c);
            if ((r & 1023) == 2) qrys.push_back((uint8_t)ACGT[(r >> 4) & 3]);  // ins
        }
        qlen[j] = (int64_t)qrys.size() - qoff[j];
    }
    const int64_t ops_cap = 2048, subs_cap = 4096;
    std::vector<int32_t> ops(n * ops_cap * 2), boundary(n), status(n);
    std::vector<int64_t> subs(n * subs_cap * 2), n_ops(n), n_subs(n), lead(n);
    std::vector<int64_t> ms(n, 0), W(n, 48);

    // many more worker threads than cores: maximize interleavings
    stripe_align_batch(n, refs.data(), roff.data(), rlen.data(),
                       qrys.data(), qoff.data(), qlen.data(),
                       ms.data(), W.data(), 3, 1, 6, 0, 1, 1, 1, iupac,
                       1 << 30,
                       ops.data(), ops_cap, n_ops.data(),
                       subs.data(), subs_cap, n_subs.data(),
                       lead.data(), boundary.data(), status.data(), 16);
    int64_t bad = 0;
    for (int64_t j = 0; j < n; j++) bad += status[j] != 0;

    // chain extraction sanity under the same binary
    std::vector<int64_t> f(100), parent(100, -1), oi(100), ol(8), os(8);
    for (int i = 0; i < 100; i++) { f[i] = (int64_t)(xrand() % 60); if (i) parent[i] = (int64_t)(xrand() % i); }
    chain_extract(100, f.data(), parent.data(), 25, 3, 8, oi.data(), ol.data(), os.data());

    printf("tsan harness done: %lld jobs, %lld non-ok\n", (long long)n, (long long)bad);
    return bad ? 1 : 0;
}
