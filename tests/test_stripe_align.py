"""Banded stripe aligner tests, pinned against the reference aligner's own test
vectors (align/nextclade/align_with_nextclade.rs:90-141) plus the fundamental
apply-roundtrip invariant on random mutated sequences."""
import numpy as np
import pytest

from pangraph_tpu.align.map_variations import edits_from_aligned_pair, map_variations
from pangraph_tpu.align.params import BandedAlignParams, BandParameters
from pangraph_tpu.align.stripe import align_banded, align_with_retries, simple_stripes
from pangraph_tpu.graph.edits import Del, Edit, Ins, Sub
from pangraph_tpu.graph.seq import as_seq, to_str


def test_simple_stripes_shape():
    s = simple_stripes(mean_shift=0, band_width=2, ref_len=10, qry_len=10)
    assert s[0][0] == 0 and s[10][1] == 11
    assert all(b < e for b, e in s)


def test_identical_sequences():
    ref = "ACGTACGTAGGACTT"
    aln = align_banded(as_seq(ref), as_seq(ref), 0, 3, BandedAlignParams())
    assert to_str(aln.qry_aln) == ref
    assert to_str(aln.ref_aln) == ref
    assert aln.score == 3 * len(ref)
    assert not aln.hit_boundary


def test_single_substitution():
    ref = "ACGTACGTAGGACTT"
    qry = "ACGTACCTAGGACTT"
    e = map_variations(as_seq(ref), as_seq(qry), BandParameters(0, 2), BandedAlignParams(), extra_band_width=0)
    assert e == Edit(subs=[Sub(6, "C")])


def test_reference_pinned_vector():
    # align_with_nextclade.rs:99-141 (general case), band (0, 4+5), min_length 3
    ref = "CTTGGAGGTTCCGTGGCTAGATAACAGAACATTCTTGGAATGCTGATCTTTATAAGCTCATGCGACACTTCGCATGGTGAGCCTTTGT"
    qry = "CTTGGAGGTTCCGTGGCTATAAAGATAACAGAACATTCTTGGAATGCTGATCAAGCTCATGGGACANNTCGCATGGTGGACAGCCTTTGT"
    exp_ref_aln = "CTTGGAGGTTCCGTGGCTA----GATAACAGAACATTCTTGGAATGCTGATCTTTATAAGCTCATGCGACACTTCGCATGGTG---AGCCTTTGT"
    aln = align_banded(as_seq(ref), as_seq(qry), 0, 9, BandedAlignParams(min_length=3))
    assert to_str(aln.ref_aln) == exp_ref_aln
    e = edits_from_aligned_pair(aln.ref_aln, aln.qry_aln, len(ref))
    assert e.subs == [Sub(62, "G"), Sub(67, "N"), Sub(68, "N")]
    assert e.dels == [Del(48, 5)]
    # pangraph convention: nextclade ins pos 18/78 -> 19/79 (map_variations.rs:70)
    assert e.inss == [Ins(19, "TAAA"), Ins(79, "GAC")]
    assert not aln.hit_boundary


def test_apply_roundtrip_random():
    rng = np.random.default_rng(7)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    for trial in range(20):
        L = int(rng.integers(50, 400))
        ref = bases[rng.integers(0, 4, L)]
        qry = ref.copy()
        # random subs
        for _ in range(int(rng.integers(0, 8))):
            p = int(rng.integers(0, len(qry)))
            qry[p] = bases[rng.integers(0, 4)]
        qry = list(qry)
        # random short indels
        for _ in range(int(rng.integers(0, 4))):
            p = int(rng.integers(0, len(qry)))
            if rng.random() < 0.5:
                del qry[p : p + int(rng.integers(1, 6))]
            else:
                qry[p:p] = list(bases[rng.integers(0, 4, int(rng.integers(1, 6)))])
        qry = np.array(qry, dtype=np.uint8)
        e = map_variations(as_seq(ref), as_seq(qry), BandParameters(0, 30), BandedAlignParams())
        e.sanity_check(len(ref))
        assert to_str(e.apply(ref)) == to_str(qry), f"trial {trial} roundtrip failed"


def test_hit_boundary_retry():
    # large shift needs band doubling
    ref = "A" * 5 + "ACGTACGTACGTGGCATGCATCAGTCAGTAAACCCGGGTTT"
    qry = "ACGTACGTACGTGGCATGCATCAGTCAGTAAACCCGGGTTT" + "T" * 5
    a1 = align_banded(as_seq(ref), as_seq(qry), 0, 1, BandedAlignParams())
    assert a1.hit_boundary
    a2 = align_with_retries(as_seq(ref), as_seq(qry), 0, 1, BandedAlignParams())
    # after retries the band is wide enough for the optimal path
    e = edits_from_aligned_pair(a2.ref_aln, a2.qry_aln, len(ref))
    assert to_str(e.apply(as_seq(ref))) == qry


def test_free_terminal_gaps():
    # leading deletion + trailing insertion cost nothing
    ref = "GGGGG" + "ACGTACGTACGTACGAATTCCGA"
    qry = "ACGTACGTACGTACGAATTCCGA" + "TTTTT"
    e = map_variations(as_seq(ref), as_seq(qry), BandParameters(5, 6), BandedAlignParams())
    assert Del(0, 5) in e.dels
    assert any(i.pos == len(ref) and i.seq == "TTTTT" for i in e.inss)
    assert to_str(e.apply(as_seq(ref))) == qry


def test_full_deletion_of_unalignable():
    ref = "ACGTACGTGGCC"
    qry = "A"
    e = map_variations(as_seq(ref), as_seq(qry), BandParameters(0, 15), BandedAlignParams())
    assert to_str(e.apply(as_seq(ref))) == qry


def test_n_scores_as_near_match():
    ref = "ACGTACGTACGT"
    qry = "ACGTNNGTACGT"
    e = map_variations(as_seq(ref), as_seq(qry), BandParameters(0, 3), BandedAlignParams())
    assert e.subs == [Sub(4, "N"), Sub(5, "N")]
    assert not e.dels and not e.inss
