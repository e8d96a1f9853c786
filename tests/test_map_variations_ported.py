"""map_variations tests ported from the reference's inline suite
(packages/pangraph/src/align/map_variations.rs:86-370): BandParameters
arithmetic/derivation and the four exact-edit alignment fixtures (each
fixture self-validates: expected edits reproduce the query and their
derived band matches the one used)."""
from __future__ import annotations

import pytest

from pangraph_tpu.align.map_variations import map_variations
from pangraph_tpu.align.params import BandParameters, BandedAlignParams
from pangraph_tpu.graph.edits import Del, Edit, Ins, Sub
from pangraph_tpu.graph.seq import as_seq, to_str


# --------------------------------------------------------- BandParameters #
def test_band_parameters_add():
    # map_variations.rs:86-95
    b = BandParameters(3, 8).add(BandParameters(2, 4))
    assert (b.mean_shift, b.band_width) == (5, 12)


@pytest.mark.parametrize(
    "edit,ref_len,expected",
    [
        (Edit(), 10, (0, 0)),
        (Edit(inss=[Ins(0, "AAA")]), 10, (-3, 0)),
        (Edit(dels=[Del(0, 2)]), 10, (2, 0)),
        (Edit(inss=[Ins(9, "C")]), 10, (0, 1)),
        (Edit(dels=[Del(2, 3)], inss=[Ins(2, "CCC")]), 25, (0, 3)),
        (
            Edit(subs=[Sub(5, "A"), Sub(10, "T")], dels=[Del(2, 3), Del(15, 2)],
                 inss=[Ins(8, "CCC"), Ins(20, "GG")]),
            25,
            (1, 2),
        ),
    ],
    ids=["empty", "leading_insertion", "leading_deletion", "mid_insertion",
         "indel", "complex_edits"],
)
def test_band_parameters_from_edits(edit, ref_len, expected):
    # map_variations.rs:97-185
    b = BandParameters.from_edits(edit, ref_len)
    assert (b.mean_shift, b.band_width) == expected


# ---------------------------------------------------------- map_variations #
def _check(r, q, mean_shift, bandwidth, expected):
    r_seq, q_seq = as_seq(r), as_seq(q)
    # the fixture is self-consistent: the expected edits reproduce q and
    # derive exactly the band used (as the reference asserts)
    assert to_str(expected.apply(r_seq)) == q
    b = BandParameters.from_edits(expected, len(r))
    assert (b.mean_shift, b.band_width) == (mean_shift, bandwidth)
    actual = map_variations(
        r_seq, q_seq, BandParameters(mean_shift, bandwidth), BandedAlignParams(), extra_band_width=0
    )
    assert actual == expected
    assert to_str(actual.apply(r_seq)) == q


def test_map_variations_simple_case():
    # map_variations.rs:187-232
    _check(
        "ACTTTGCGTCTGATAGCTTAGCGGATATTTACTGTA",
        "ACTAGATTGAGTCTGATAGCTTAGCGGATATTGTA",
        -2, 3,
        Edit(subs=[Sub(6, "A")], dels=[Del(29, 4)], inss=[Ins(3, "AGA")]),
    )


def test_map_variations_initial_final_deletions():
    # map_variations.rs:234-277
    _check(
        "ACACTGATTTCGTCCCTTAGGTACTCTACACTGTAGCCTA",
        "CTGATTTAGTCCCTTAGGGGTTACTCTACACTGTAG",
        2, 2,
        Edit(subs=[Sub(10, "A")], dels=[Del(0, 3), Del(36, 4)], inss=[Ins(21, "GGT")]),
    )


def test_map_variations_initial_final_insertions():
    # map_variations.rs:279-322
    _check(
        "ACACTGATTTCGTCCCTTAGGTACTCTACACTGTAGCCTA",
        "CCTGACACTGATTTAGTCCTAGGGGTTACTCTACACCGTAGCCTAGCCGCCG",
        -4, 2,
        Edit(
            subs=[Sub(10, "A"), Sub(31, "C")],
            dels=[Del(15, 2)],
            inss=[Ins(0, "CCTG"), Ins(21, "GGT"), Ins(40, "GCCGCCG")],
        ),
    )


def test_map_variations_overlapping_indels():
    # map_variations.rs:324-368
    _check(
        "CGCCCTACTACAAGAGGGAACTTTTTTTTTAAGTATAGCCACAATAGCTGG",
        "CGCCCTACTACAAGAGGGAACGGGGGGGGGGGGGAAGTATAGCCACAATAGCTGG",
        -2, 11,
        Edit(dels=[Del(21, 9)], inss=[Ins(21, "GGGGGGGGGGGGG")]),
    )
