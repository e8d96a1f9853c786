"""Hit post-processing: primary/secondary resolution, mapq, DUST mask
(minimap2 hit.c / sdust.c semantics; see align/hits.py). The repeat fixture
demonstrates the failure VERDICT r1 #5 called out: without secondary
suppression a tandem-repeat genome floods the energy filter with
near-duplicate candidate hits."""
from __future__ import annotations

import numpy as np
import pytest

from pangraph_tpu.align.hits import dust_mask, filter_minimizers_by_mask, select_hits
from pangraph_tpu.align.mapper import MapperParams, map_all_vs_all

ACGT = np.frombuffer(b"ACGT", np.uint8)


def _tandem_pair(rng, unit_len=400, n_units=8, flank=2000):
    """Two genomes sharing a tandem array of near-identical units plus
    unique flanks: each unit of one genome hits every unit of the other,
    giving ~n_units^2 overlapping chain candidates before suppression."""
    unit = ACGT[rng.integers(0, 4, unit_len)]
    genomes = []
    for _ in range(2):
        parts = [ACGT[rng.integers(0, 4, flank)]]
        for _u in range(n_units):
            u = unit.copy()
            idx = rng.choice(unit_len, 4, replace=False)
            u[idx] = ACGT[rng.integers(0, 4, 4)]
            parts.append(u)
        parts.append(ACGT[rng.integers(0, 4, flank)])
        genomes.append(np.concatenate(parts))
    return genomes


def test_repeat_genome_secondary_suppression():
    rng = np.random.default_rng(11)
    g1, g2 = _tandem_pair(rng)
    seqs = {"a": g1, "b": g2}
    p_off = MapperParams.from_sensitivity(10, 100)
    p_off.best_n = 10_000  # round-1 behavior: keep everything
    p_off.pri_ratio = 0.0
    p_on = MapperParams.from_sensitivity(10, 100)
    alns_off = map_all_vs_all(dict(seqs), p_off)
    alns_on = map_all_vs_all(dict(seqs), p_on)
    # the tandem array floods the unsuppressed mapper with near-duplicate
    # candidates; suppression keeps at most 1 primary + best_n secondaries
    # per query interval group
    assert len(alns_off) > len(alns_on), (len(alns_off), len(alns_on))
    assert len(alns_on) <= len(alns_off) // 2
    # the flank-spanning (or at least one long, unique) hit must survive
    assert any(a.matches > 300 for a in alns_on)


def test_select_hits_primary_and_mapq():
    from pangraph_tpu.align.alignment import Alignment, Hit

    def aln(qs, qe, matches, rname):
        return Alignment(
            qry=Hit.new("q", 10_000, (qs, qe)),
            reff=Hit.new(rname, 10_000, (qs, qe)),
            matches=matches,
            length=qe - qs,
            quality=60,
            orientation="+",
            cigar=[(qe - qs, "M")],
            divergence=0.01,
            align_score=None,
        )

    # three hits on the same query interval: best is primary, the close one
    # survives as secondary (mapq 0), the weak one is dropped
    a = aln(0, 1000, 950, "r1")
    b = aln(10, 990, 900, "r2")
    c = aln(5, 995, 200, "r3")
    out = select_hits([a, b, c])
    assert a in out and b in out and c not in out
    assert b.quality == 0
    assert 0 < a.quality <= 60
    # a distant hit on a disjoint interval is its own primary with high mapq
    d = aln(5000, 6000, 950, "r4")
    out = select_hits([a, d])
    assert d in out and d.quality > 30


def test_select_hits_unique_hit_keeps_high_mapq():
    from pangraph_tpu.align.alignment import Alignment, Hit

    a = Alignment(
        qry=Hit.new("q", 5000, (0, 4000)),
        reff=Hit.new("r", 5000, (0, 4000)),
        matches=3950,
        length=4000,
        quality=60,
        orientation="+",
        cigar=[(4000, "M")],
        divergence=0.01,
        align_score=None,
    )
    out = select_hits([a])
    assert out == [a] and a.quality >= 55


def test_dust_mask_flags_low_complexity():
    rng = np.random.default_rng(3)
    random_part = ACGT[rng.integers(0, 4, 500)]
    poly_a = np.full(200, ord("A"), np.uint8)
    seq = np.concatenate([random_part, poly_a, random_part])
    mask = dust_mask(seq, thres=20)
    assert len(mask) >= 1
    # the poly-A run is covered by some masked interval
    covered = any(s <= 520 and e >= 680 for s, e in mask)
    assert covered, mask.tolist()
    # random sequence alone is not masked
    assert len(dust_mask(random_part, thres=20)) == 0


def test_filter_minimizers_by_mask():
    mask = np.array([[100, 200]], np.int64)
    pos = np.array([50, 110, 170, 185, 300], np.int64)
    keep = filter_minimizers_by_mask(pos, 15, mask)
    assert keep.tolist() == [True, False, False, False, True]


def test_sdust_enabled_mapper_still_correct():
    """With sdust on, a homologous pair still maps end to end."""
    rng = np.random.default_rng(9)
    base = ACGT[rng.integers(0, 4, 3000)]
    g2 = base.copy()
    idx = rng.choice(3000, 30, replace=False)
    g2[idx] = ACGT[rng.integers(0, 4, 30)]
    p = MapperParams.from_sensitivity(10, 100)
    p.sdust_thres = 20
    alns = map_all_vs_all({"a": base, "b": g2}, p)
    assert len(alns) >= 1
    assert max(a.matches for a in alns) > 2500


def test_mid_occ_cutoff_minimap2_semantics():
    """The occurrence cutoff must match mm_idx_cal_max_occ (index.c:186-206):
    (1-f) k-smallest of per-distinct-minimizer counts, + 1, clamped below by
    the floor — and repeat-flooded minimizers must be dropped from anchors."""
    import numpy as np

    from pangraph_tpu.align.mapper import MapperParams, build_index, collect_anchors
    from pangraph_tpu.align.minimizer import sketch

    rng = np.random.default_rng(21)
    ACGT = np.frombuffer(b"ACGT", np.uint8)
    repeat = ACGT[rng.integers(0, 4, 60)]
    # one sequence flooded with a 60 bp repeat, one unique sequence
    flooded = np.concatenate([np.tile(repeat, 400), ACGT[rng.integers(0, 4, 4000)]])
    unique = ACGT[rng.integers(0, 4, 20000)]
    # at this index size the default f=2e-4 tops out above the repeat's
    # ~60 distinct k-mers; use f=1% so the cutoff bites (same formula)
    p = MapperParams(mid_occ_frac=0.01)
    idx = build_index([flooded, unique], ["flooded", "unique"], p)
    # recompute the expected threshold from the sketch counts
    vals = np.concatenate(
        [sketch(flooded, p.k, p.w).values, sketch(unique, p.k, p.w).values]
    )
    _, counts = np.unique(vals, return_counts=True)
    a = np.sort(counts)
    want = max(int(a[min(int((1.0 - p.mid_occ_frac) * len(a)), len(a) - 1)]) + 1, p.max_occ_floor)
    assert idx.max_occ == want
    # the repeat k-mers occur ~400x: far above the cutoff, so anchors from a
    # repeat-only query must be dropped entirely
    qmm = sketch(np.tile(repeat, 50), p.k, p.w)
    rid, rpos, qpos, rel = collect_anchors(idx, qmm, qid=2)
    assert len(rid) == 0
    # a unique-sequence query still anchors normally
    qmm2 = sketch(unique[2000:12000], p.k, p.w)
    rid2, *_ = collect_anchors(idx, qmm2, qid=2)
    assert (rid2 == 1).sum() > 100


def test_self_join_anchor_equivalence():
    """collect_anchors_self must produce exactly the anchor set of the
    legacy per-query lookup (order-insensitive; chaining lexsorts)."""
    import numpy as np

    from pangraph_tpu.align.mapper import (
        MapperParams,
        build_index,
        collect_anchors,
        collect_anchors_self,
    )
    from pangraph_tpu.align.minimizer import sketch

    rng = np.random.default_rng(33)
    ACGT = np.frombuffer(b"ACGT", np.uint8)
    base = ACGT[rng.integers(0, 4, 30000)]
    seqs = []
    for i in range(4):
        g = base.copy()
        idx = rng.choice(len(g), 300, replace=False)
        g[idx] = ACGT[rng.integers(0, 4, 300)]
        if i == 2:
            g[5000:9000] = g[5000:9000][::-1]  # scramble one segment
        seqs.append(g)
    p = MapperParams()
    idx = build_index(seqs, [f"s{i}" for i in seqs and range(4)], p)
    for qi in range(4):
        qmm = sketch(seqs[qi], p.k, p.w)
        rid0, rpos0, qpos0, rel0 = collect_anchors(idx, qmm, qi)
        m = rid0 < qi
        legacy = set(zip(rid0[m], rpos0[m], qpos0[m], rel0[m]))
        rid1, rpos1, qpos1, rel1 = collect_anchors_self(idx, qi)
        assert set(zip(rid1, rpos1, qpos1, rel1)) == legacy, qi


def test_global_anchor_pass_equivalence():
    """collect_anchors_all (one vectorized pass for the whole round) must
    produce exactly the union of per-query collect_anchors_self sets."""
    import numpy as np

    from pangraph_tpu.align.mapper import (
        MapperParams,
        build_index,
        collect_anchors_all,
        collect_anchors_self,
    )

    rng = np.random.default_rng(44)
    ACGT = np.frombuffer(b"ACGT", np.uint8)
    base = ACGT[rng.integers(0, 4, 25000)]
    seqs = []
    for i in range(5):
        g = base.copy()
        sub = rng.choice(len(g), 250, replace=False)
        g[sub] = ACGT[rng.integers(0, 4, 250)]
        seqs.append(g)
    p = MapperParams()
    idx = build_index(seqs, [f"s{i}" for i in range(5)], p)
    for unchanged in (None, np.array([True, True, False, True, False])):
        per_query = set()
        for qi in range(5):
            rid, rpos, qpos, rel = collect_anchors_self(idx, qi, unchanged)
            per_query |= {(qi, *t) for t in zip(rid, rpos, qpos, rel)}
        a_qi, a_rid, a_rpos, a_qpos, a_rel = collect_anchors_all(idx, unchanged)
        global_set = set(zip(a_qi, a_rid, a_rpos, a_qpos, a_rel))
        assert global_set == per_query
