"""Interval + CIGAR utility tests ported from the reference's inline suites
(packages/pangraph/src/utils/interval.rs:93-260 and
packages/pangraph/src/align/bam/cigar.rs:109-340)."""
from __future__ import annotations

import pytest

from pangraph_tpu.align.cigar import (
    add_flanking_indel,
    cigar_no_indels,
    cigar_str,
    cigar_switch_ref_qry,
    invert_cigar,
    parse_cigar,
)
from pangraph_tpu.utils.intervals import Interval, have_no_overlap, positions_to_intervals


# ------------------------------------------------------------- intervals #
def test_overlap():
    # interval.rs:93-134 — half-open semantics, boundaries excluded
    assert not Interval(1, 5).has_overlap_with(Interval(5, 10))
    assert not Interval(5, 10).has_overlap_with(Interval(1, 5))
    assert not Interval(10, 15).has_overlap_with(Interval(5, 10))
    assert not Interval(5, 10).has_overlap_with(Interval(10, 15))
    assert Interval(1, 7).has_overlap_with(Interval(5, 10))
    assert Interval(5, 10).has_overlap_with(Interval(1, 7))
    assert Interval(5, 12).has_overlap_with(Interval(5, 10))
    assert Interval(5, 10).has_overlap_with(Interval(5, 12))
    assert Interval(1, 15).has_overlap_with(Interval(5, 10))
    assert Interval(5, 10).has_overlap_with(Interval(1, 15))


def test_no_overlap():
    # interval.rs:136-146
    assert have_no_overlap([Interval(100, 200), Interval(300, 400)], Interval(210, 290))
    assert not have_no_overlap([Interval(100, 200), Interval(300, 400)], Interval(210, 390))


@pytest.mark.parametrize(
    "positions,expected",
    [
        ([], []),
        ([5], [(5, 6)]),
        ([0], [(0, 1)]),
        ([7, 8], [(7, 9)]),
        ([5, 10], [(5, 6), (10, 11)]),
        ([1, 2, 3, 4, 5], [(1, 6)]),
        ([0, 1, 2, 3], [(0, 4)]),
        ([1, 100, 1000], [(1, 2), (100, 101), (1000, 1001)]),
        ([1, 3, 5, 7], [(1, 2), (3, 4), (5, 6), (7, 8)]),
        ([10, 21, 1, 2, 3, 20], [(1, 4), (10, 11), (20, 22)]),
        ([5, 5, 5, 6, 7, 7, 8], [(5, 9)]),
        ([1, 2, 3, 10, 11, 20], [(1, 4), (10, 12), (20, 21)]),
        ([42, 42, 42, 42], [(42, 43)]),
        ([1, 1, 3, 3, 3, 7, 8, 8, 9], [(1, 2), (3, 4), (7, 10)]),
    ],
    ids=[
        "empty", "single", "single_at_zero", "two_contiguous",
        "two_non_contiguous", "contiguous", "starting_from_zero",
        "large_gaps", "non_contiguous", "unsorted", "duplicates",
        "mixed_contiguous_and_gaps", "all_duplicates",
        "complex_duplicates_with_gaps",
    ],
)
def test_positions_to_intervals(positions, expected):
    # interval.rs:148-260 (all 14 cases)
    assert [i.to_tuple() for i in positions_to_intervals(positions)] == expected


# ----------------------------------------------------------------- cigar #
def test_parse_cigar_string():
    # cigar.rs:109-135 — every SAM op kind
    got = parse_cigar("3H2S10M1I5M1D20M2P10=5X3I4M")
    assert got == [
        (3, "H"), (2, "S"), (10, "M"), (1, "I"), (5, "M"), (1, "D"),
        (20, "M"), (2, "P"), (10, "="), (5, "X"), (3, "I"), (4, "M"),
    ]


def test_parse_cigar_string_with_tabs():
    # cigar.rs:137-163
    got = parse_cigar("3H\t2S\t10M\t1I\t5M\t1D\t20M\t2P\t10=\t5X\t3I\t4M")
    assert len(got) == 12
    assert got == parse_cigar("3H2S10M1I5M1D20M2P10=5X3I4M")


def test_invert_cigar():
    # cigar.rs:165-183
    assert cigar_str(invert_cigar(parse_cigar("10M1I5M1D20M"))) == "20M1D5M1I10M"


def test_switch_ref_qry():
    # cigar.rs:185-203
    assert cigar_str(cigar_switch_ref_qry(parse_cigar("10M7I5M1D20M"))) == "10M7D5M1I20M"


def test_switch_ref_qry_with_unsupported_op():
    # cigar.rs:205-216
    with pytest.raises(ValueError, match="Unsupported op"):
        cigar_switch_ref_qry(parse_cigar("10M2S"))


def test_is_cigar_all_matches():
    # cigar.rs:218-230
    assert cigar_no_indels(parse_cigar("10M20="))
    assert not cigar_no_indels(parse_cigar("10M1I20="))


def test_add_flanking_indel_leading():
    # cigar.rs:233-258
    assert cigar_str(add_flanking_indel(parse_cigar("10M5I20M"), "I", 3, leading=True)) == "3I10M5I20M"
    assert cigar_str(add_flanking_indel(parse_cigar("5I10M20M"), "I", 3, leading=True)) == "8I10M20M"


def test_add_flanking_indel_trailing():
    # cigar.rs:260-281
    assert cigar_str(add_flanking_indel(parse_cigar("10M5D20M"), "D", 4, leading=False)) == "10M5D20M4D"
    assert cigar_str(add_flanking_indel(parse_cigar("10M20I"), "I", 4, leading=False)) == "10M24I"


def test_add_flanking_indel_leading_extend_prefix():
    # cigar.rs:283-297: the prefix's existing insertion is extended in place
    assert cigar_str(add_flanking_indel(parse_cigar("5D3I10M"), "I", 2, leading=True)) == "5D5I10M"


def test_add_flanking_indel_trailing_extend_suffix():
    # cigar.rs:299-314
    assert cigar_str(add_flanking_indel(parse_cigar("10M3D2I"), "D", 4, leading=False)) == "10M7D2I"


def test_add_flanking_indel_leading_deletion_extend():
    # cigar.rs:316-325
    assert cigar_str(add_flanking_indel(parse_cigar("5D10M"), "D", 2, leading=True)) == "7D10M"


def test_add_flanking_indel_trailing_insertion_extend():
    # cigar.rs:327-334
    assert cigar_str(add_flanking_indel(parse_cigar("10M2I"), "I", 3, leading=False)) == "10M5I"
