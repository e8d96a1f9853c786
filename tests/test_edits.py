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
