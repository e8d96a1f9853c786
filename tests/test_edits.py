"""Edit-model tests mirroring the reference's inline unit tests
(packages/pangraph/src/pangraph/edits.rs tests, edits.rs:660-1338)."""
import numpy as np
import pytest

from pangraph_tpu.graph.edits import Del, Edit, Ins, Sub, edit_from_cigar
from pangraph_tpu.graph.seq import as_seq, to_str


def S(x):
    return to_str(x)


def test_apply_sub():
    e = Edit(subs=[Sub(3, "A")])
    assert S(e.apply(as_seq("ACCTGGCTTT"))) == "ACCAGGCTTT"


def test_apply_del():
    e = Edit(dels=[Del(3, 2)])
    assert S(e.apply(as_seq("ACCTGGCTTT"))) == "ACCGCTTT"


def test_apply_ins():
    e = Edit(inss=[Ins(4, "AC")])
    assert S(e.apply(as_seq("ACCTGGCTTT"))) == "ACCTACGGCTTT"


def test_apply_combined():
    # deletion spanning an insertion point; insertion survives
    e = Edit(subs=[Sub(0, "G")], dels=[Del(2, 3)], inss=[Ins(2, "TT")])
    # ref GC|CTG|GCTTT -> sub at 0: G->G? use different ref
    ref = as_seq("ACCTGGCTTT")
    out = S(e.apply(ref))
    # manual: subs: pos0->G => GCCTGGCTTT; del [2,5) -> GC---GCTTT; ins at 2 "TT"
    assert out == "GCTTGCTTT"


def test_apply_aligned():
    e = Edit(subs=[Sub(1, "G")], dels=[Del(3, 2)], inss=[Ins(2, "TT")])
    assert S(e.apply_aligned(as_seq("ACCTGGCTTT"))) == "AGC--GCTTT"


def test_apply_ins_at_zero():
    e = Edit(inss=[Ins(0, "TT")])
    assert S(e.apply(as_seq("ACGT"))) == "TTACGT"


def test_apply_ins_at_end():
    e = Edit(inss=[Ins(4, "TT")])
    assert S(e.apply(as_seq("ACGT"))) == "ACGTTT"


def test_empty_alignment():
    cons = as_seq("ACGT")
    assert not Edit.empty().is_empty_alignment(cons)
    assert not Edit(dels=[Del(0, 4)], inss=[Ins(1, "A")]).is_empty_alignment(cons)
    assert Edit(dels=[Del(0, 4)]).is_empty_alignment(cons)


def test_edits_apply_simple_case():
    # edits.rs:665-678: one ins + one del + one sub on the same sequence
    e = Edit(subs=[Sub(8, "A")], dels=[Del(6, 1)], inss=[Ins(1, "G")])
    assert S(e.apply(as_seq("ACCTGGCTTT"))) == "AGCCTGGTAT"


def test_leading_deletions():
    # edits.rs:754-768
    assert Edit(dels=[Del(0, 3), Del(6, 2)]).leading_deletions() == 3
    assert Edit(dels=[Del(1, 3)]).leading_deletions() == 0


def test_trailing_deletions():
    # edits.rs:771-787
    assert Edit(dels=[Del(8, 2), Del(0, 3)]).trailing_deletions(10) == 2
    assert Edit(dels=[Del(4, 3)]).trailing_deletions(10) == 0


def test_internal_deletions():
    # edits.rs:789-805
    assert Edit(dels=[Del(0, 2), Del(4, 2), Del(8, 2)]).internal_deletions(10) == 2
    assert Edit(dels=[Del(1, 3), Del(5, 2)]).internal_deletions(10) == 5


def test_leading_insertions():
    # edits.rs:807-822
    assert Edit(inss=[Ins(0, "AAA"), Ins(5, "GGG")]).leading_insertions() == 3
    assert Edit(inss=[Ins(1, "AAA")]).leading_insertions() == 0


def test_trailing_insertions():
    # edits.rs:824-840
    assert Edit(inss=[Ins(10, "TTT"), Ins(0, "AAAA")]).trailing_insertions(10) == 3
    assert Edit(inss=[Ins(5, "TTT")]).trailing_insertions(10) == 0


def test_internal_insertions():
    # edits.rs:842-858
    assert Edit(inss=[Ins(0, "AAA"), Ins(5, "GGG"), Ins(10, "TTT")]).internal_insertions(10) == 3
    assert Edit(inss=[Ins(1, "AAA"), Ins(5, "GGG")]).internal_insertions(10) == 6


def test_aligned_count_after_multiple_deletions():
    # edits.rs:908-922: dels at 3..7 and 10..13, cons_len 20
    e = Edit(dels=[Del(3, 4), Del(10, 3)])
    assert e.aligned_count_after(0, 20) == 13
    assert e.aligned_count_after(5, 20) == 10
    assert e.aligned_count_after(12, 20) == 7
    assert e.aligned_count_after(13, 20) == 7
    assert e.aligned_count_after(17, 20) == 3


def test_has_indels():
    # edits.rs:1165-1186
    assert not Edit(subs=[Sub(1, "A")]).has_indels()
    assert Edit(dels=[Del(5, 2)]).has_indels()
    assert Edit(inss=[Ins(10, "ATG")]).has_indels()
    assert Edit(subs=[Sub(1, "A")], dels=[Del(5, 2)], inss=[Ins(10, "ATG")]).has_indels()
    assert not Edit.empty().has_indels()


def test_has_dels_inss_subs():
    # edits.rs:1188-1231
    assert not Edit(subs=[Sub(1, "A")], inss=[Ins(10, "ATG")]).has_dels()
    assert Edit(dels=[Del(5, 2)]).has_dels()
    assert not Edit.empty().has_dels()
    assert not Edit(subs=[Sub(1, "A")], dels=[Del(5, 2)]).has_inss()
    assert Edit(inss=[Ins(10, "ATG")]).has_inss()
    assert not Edit.empty().has_inss()
    assert not Edit(dels=[Del(5, 2)], inss=[Ins(10, "ATG")]).has_subs()
    assert Edit(subs=[Sub(1, "A")]).has_subs()
    assert not Edit.empty().has_subs()


def test_is_position_deleted():
    # edits.rs:1233-1274
    e = Edit(subs=[Sub(1, "A")], inss=[Ins(10, "ATG")])
    assert not any(e.is_position_deleted(p) for p in (0, 5, 10))
    e = Edit(dels=[Del(5, 3)])
    assert not e.is_position_deleted(4)
    assert e.is_position_deleted(5) and e.is_position_deleted(6) and e.is_position_deleted(7)
    assert not e.is_position_deleted(8)
    e = Edit(dels=[Del(2, 2), Del(8, 2)])
    assert [p for p in range(11) if e.is_position_deleted(p)] == [2, 3, 8, 9]
    e = Edit(dels=[Del(10, 1)])
    assert not e.is_position_deleted(9) and e.is_position_deleted(10) and not e.is_position_deleted(11)
    assert not Edit.empty().is_position_deleted(0)
    assert not Edit.empty().is_position_deleted(100)


def test_aligned_count():
    assert Edit.empty().aligned_count(10) == 10
    assert Edit(subs=[Sub(0, "A")], dels=[Del(3, 2), Del(6, 1)]).aligned_count(10) == 7
    assert Edit(subs=[Sub(0, "A")], dels=[Del(0, 10)]).aligned_count(10) == 0


def test_aligned_count_after():
    e = Edit.empty()
    assert e.aligned_count_after(0, 10) == 10
    assert e.aligned_count_after(5, 10) == 5
    assert e.aligned_count_after(10, 10) == 0
    e = Edit(dels=[Del(3, 2)])
    assert e.aligned_count_after(0, 10) == 8
    assert e.aligned_count_after(2, 10) == 6
    assert e.aligned_count_after(4, 10) == 5
    assert e.aligned_count_after(5, 10) == 5
    assert e.aligned_count_after(10, 10) == 0


@pytest.mark.parametrize(
    "edit,cons_len,expected",
    [
        (Edit(), 10, 0),
        (Edit(inss=[Ins(0, "AA")]), 10, -2),
        (Edit(inss=[Ins(10, "AA")]), 10, 0),
        (Edit(dels=[Del(2, 2)]), 10, 2),
        (Edit(dels=[Del(8, 2)]), 10, 0),
        (Edit(dels=[Del(0, 3)], inss=[Ins(3, "AA")]), 10, 1),
        (Edit(inss=[Ins(4, "AAAA")]), 10, -2),
        (Edit(dels=[Del(4, 3)]), 10, 1),
        (Edit(dels=[Del(2, 2), Del(6, 3)], inss=[Ins(0, "AAA"), Ins(4, "AA")]), 12, -2),
    ],
)
def test_mean_shift(edit, cons_len, expected):
    assert edit.aln_mean_shift(cons_len) == expected


def test_mean_shift_full_deletion():
    assert Edit(dels=[Del(0, 10)]).aln_mean_shift(10) is None


@pytest.mark.parametrize(
    "edit,cons_len,exp_shift,exp_bw",
    [
        (Edit(), 10, 0, 0),
        (Edit(dels=[Del(97, 3)], inss=[Ins(0, "AAA")]), 100, -3, 0),
        (
            Edit(dels=[Del(0, 4), Del(97, 3)], inss=[Ins(0, "AAA"), Ins(100, "AAAA")]),
            100,
            1,
            4,
        ),
        (
            Edit(
                dels=[Del(0, 2), Del(10, 5), Del(20, 3)],
                inss=[Ins(15, "AAAA"), Ins(25, "TTT"), Ins(50, "GGGGGGGGGGGG")],
            ),
            50,
            3,
            4,
        ),
    ],
)
def test_bandwidth(edit, cons_len, exp_shift, exp_bw):
    shift = edit.aln_mean_shift(cons_len)
    assert shift == exp_shift
    assert edit.aln_bandwidth(cons_len, shift) == exp_bw


def test_from_cigar():
    assert edit_from_cigar([(100, "M")]) == Edit()
    assert edit_from_cigar([(10, "M"), (1, "I"), (5, "M")]) == Edit(inss=[Ins(10, "N")])
    assert edit_from_cigar([(10, "M"), (2, "D"), (5, "M")]) == Edit(dels=[Del(10, 2)])
    assert edit_from_cigar([(5, "M"), (2, "I"), (3, "M"), (4, "D"), (6, "M"), (3, "I")]) == Edit(
        dels=[Del(8, 4)], inss=[Ins(5, "NN"), Ins(18, "NNN")]
    )


def test_concat_merges_same_pos_insertions():
    a = Edit(inss=[Ins(3, "AA")])
    b = Edit(inss=[Ins(3, "CC")], subs=[Sub(1, "T")])
    c = a.concat(b)
    assert c.inss == [Ins(3, "AACC")]
    assert c.subs == [Sub(1, "T")]


def test_reverse_complement_roundtrip():
    ref = as_seq("ACTGGATATCCGAT")
    e = Edit(subs=[Sub(2, "C")], dels=[Del(5, 2)], inss=[Ins(9, "TT")])
    rc = e.reverse_complement(len(ref))
    from pangraph_tpu.graph.seq import revcomp

    # applying rc edits to revcomp(ref) == revcomp(applying edits to ref)
    assert S(rc.apply(revcomp(ref))) == S(revcomp(e.apply(ref)))


def test_shift():
    e = Edit(subs=[Sub(2, "C")], dels=[Del(5, 2)], inss=[Ins(9, "TT")])
    s = e.shift(10)
    assert s.subs[0].pos == 12 and s.dels[0].pos == 15 and s.inss[0].pos == 19


def test_sanity_check():
    Edit(subs=[Sub(0, "A")], dels=[Del(1, 2)], inss=[Ins(4, "T")]).sanity_check(4)
    with pytest.raises(ValueError):
        Edit(subs=[Sub(4, "A")]).sanity_check(4)
    with pytest.raises(ValueError):
        Edit(dels=[Del(0, 0)]).sanity_check(4)
    with pytest.raises(ValueError):
        Edit(subs=[Sub(1, "A")], dels=[Del(0, 2)]).sanity_check(4)


def test_reconcile_substitution():
    # genome with no sub at pos gets reversion
    e = Edit()
    e.reconcile_substitution_with_consensus(Sub(3, "G"), "A")
    assert e.subs == [Sub(3, "A")]
    # genome with matching sub loses it
    e = Edit(subs=[Sub(3, "G")])
    e.reconcile_substitution_with_consensus(Sub(3, "G"), "A")
    assert e.subs == []
    # genome with different sub keeps it
    e = Edit(subs=[Sub(3, "T")])
    e.reconcile_substitution_with_consensus(Sub(3, "G"), "A")
    assert e.subs == [Sub(3, "T")]
    # deleted position: no reversion added
    e = Edit(dels=[Del(2, 3)])
    e.reconcile_substitution_with_consensus(Sub(3, "G"), "A")
    assert e.subs == []
