"""Unit tests ported from the reference's inline test modules (SURVEY.md §4):
exact fixtures from pangraph_interval.rs, split_matches.rs, neighbor_joining.rs
and tree/newick.rs, asserted against our implementations."""
import numpy as np
import pytest

from pangraph_tpu.align.alignment import Alignment, ExtractedHit, Hit
from pangraph_tpu.align.cigar import cigar_str, parse_cigar
from pangraph_tpu.build.reweave import create_intervals, extract_intervals
from pangraph_tpu.build.split_matches import keep_groups, split_matches
from pangraph_tpu.build.tree import create_q_matrix, guide_tree_from_newick, parse_newick
from pangraph_tpu.utils.intervals import Interval


# ---------------------------------------------------------------- intervals #
def _hits():
    """pangraph_interval.rs:265-290 example: 4 hits on a 1000bp block."""
    bid = 0

    def h(new_bid, is_anchor, s, e):
        return ExtractedHit(
            hit=Hit(name=bid, length=0, interval=Interval(s, e)),
            new_block_id=new_bid,
            is_anchor=is_anchor,
            orientation="+",
            cigar=None,
        )

    return [h(1, True, 10, 100), h(2, False, 200, 300), h(3, True, 310, 500), h(4, False, 600, 900)]


def test_create_intervals_reference():
    # pangraph_interval.rs:311-365 test_create_intervals
    intervals = create_intervals(_hits(), 1000)
    got = [(iv.interval.to_tuple(), iv.aligned) for iv in intervals]
    assert got == [
        ((0, 10), False),
        ((10, 100), True),
        ((100, 200), False),
        ((200, 300), True),
        ((300, 310), False),
        ((310, 500), True),
        ((500, 600), False),
        ((600, 900), True),
        ((900, 1000), False),
    ]
    assert [iv.new_block_id for iv in intervals if iv.aligned] == [1, 2, 3, 4]
    assert [iv.is_anchor for iv in intervals if iv.aligned] == [True, False, True, False]


def test_extract_intervals_reference():
    # pangraph_interval.rs:367-443 test_refine_intervals: thr=50 merges the
    # 10bp flanks into their longest aligned neighbor, recording extensions
    intervals = extract_intervals(_hits(), 1000, thr_len=50)
    got = [
        (iv.interval.to_tuple(), iv.aligned, iv.extend_left, iv.extend_right)
        for iv in intervals
    ]
    assert got == [
        ((0, 100), True, 10, None),
        ((100, 200), False, None, None),
        ((200, 300), True, None, None),
        ((300, 500), True, 10, None),
        ((500, 600), False, None, None),
        ((600, 900), True, None, None),
        ((900, 1000), False, None, None),
    ]
    assert [iv.new_block_id for iv in intervals if iv.aligned] == [1, 2, 3, 4]


# ------------------------------------------------------------ split_matches #
def test_keep_groups_reference():
    # split_matches.rs test_keep_groups_simple_case (thr=100)
    cig = parse_cigar(
        "10I20D10M20I190D40M1D1I40M1I40M1D100I200M60I60D140M200D40M2I70M"
    )
    assert keep_groups(cig, 100) == [(5, 10), (13, 16), (18, 20)]


def _split_fixture(orientation):
    return Alignment(
        qry=Hit.new(0, 500, (200, 255 if orientation == "+" else 256)),
        reff=Hit.new(1, 500, (100, 140 if orientation == "+" else 141)),
        matches=0,
        length=0,
        quality=10,
        cigar=parse_cigar("3I6M3I3M4D5M14I7M3D4I5M5D3M3I"),
        orientation=orientation,
        divergence=0.1,
    )


def test_split_matches_forward_reference():
    # split_matches.rs test_split_matches_simple_case_forward
    out = split_matches(_split_fixture("+"), indel_len_threshold=10)
    assert len(out) == 2
    a, b = out
    assert (a.qry.interval.to_tuple(), a.reff.interval.to_tuple()) == ((203, 220), (100, 118))
    assert cigar_str(a.cigar) == "6M3I3M4D5M"
    assert (a.matches, a.length) == (14, 21)
    assert (b.qry.interval.to_tuple(), b.reff.interval.to_tuple()) == ((234, 253), (118, 141))
    assert cigar_str(b.cigar) == "7M3D4I5M5D3M"
    assert (b.matches, b.length) == (15, 27)
    assert a.orientation == b.orientation == "+"


def test_split_matches_reverse_reference():
    # split_matches.rs test_split_matches_simple_case_reverse
    out = split_matches(_split_fixture("-"), indel_len_threshold=10)
    assert len(out) == 2
    a, b = out
    assert (a.qry.interval.to_tuple(), a.reff.interval.to_tuple()) == ((236, 253), (100, 118))
    assert cigar_str(a.cigar) == "6M3I3M4D5M"
    assert (b.qry.interval.to_tuple(), b.reff.interval.to_tuple()) == ((203, 222), (118, 141))
    assert cigar_str(b.cigar) == "7M3D4I5M5D3M"
    assert a.orientation == b.orientation == "-"


# -------------------------------------------------------- neighbor joining #
def test_nj_q_matrix_wikipedia():
    # neighbor_joining.rs:111-135 — the Wikipedia NJ worked example
    d = np.array(
        [
            [0.0, 5.0, 9.0, 9.0, 8.0],
            [5.0, 0.0, 10.0, 10.0, 9.0],
            [9.0, 10.0, 0.0, 8.0, 7.0],
            [9.0, 10.0, 8.0, 0.0, 3.0],
            [8.0, 9.0, 7.0, 3.0, 0.0],
        ]
    )
    q = create_q_matrix(d)
    inf = np.inf
    expected = np.array(
        [
            [inf, -50.0, -38.0, -34.0, -34.0],
            [-50.0, inf, -38.0, -34.0, -34.0],
            [-38.0, -38.0, inf, -40.0, -40.0],
            [-34.0, -34.0, -40.0, inf, -48.0],
            [-34.0, -34.0, -40.0, -48.0, inf],
        ]
    )
    np.testing.assert_array_equal(q, expected)


# ------------------------------------------------------------------ newick #
def test_newick_roundtrip():
    # tree/newick.rs parse/serialize; strict bifurcation
    t = parse_newick("((A,B),(C,D));")
    names = [c.name for c in t.postorder() if c.is_leaf()]
    assert sorted(names) == ["A", "B", "C", "D"]
    assert t.to_newick() == "((A,B),(C,D));"


def test_guide_tree_from_newick_validates_names():
    # newick.rs:70-140: leaf set must biject with sequence names
    with pytest.raises(Exception):
        guide_tree_from_newick("((A,B),(C,D));", ["A", "B", "C"])
    with pytest.raises(Exception):
        guide_tree_from_newick("((A,B),(C,E));", ["A", "B", "C", "D"])
    t = guide_tree_from_newick("((A,B),(C,D));", ["A", "B", "C", "D"])
    assert sorted(c.name for c in t.postorder() if c.is_leaf()) == ["A", "B", "C", "D"]


def test_nj_tree_wikipedia_first_join():
    # the Wikipedia example's first join must pair taxa a and b (Q min −50)
    from pangraph_tpu.build.tree import Clade, neighbor_joining_tree_from_leaves

    d = np.array(
        [
            [0.0, 5.0, 9.0, 9.0, 8.0],
            [5.0, 0.0, 10.0, 10.0, 9.0],
            [9.0, 10.0, 0.0, 8.0, 7.0],
            [9.0, 10.0, 8.0, 0.0, 3.0],
            [8.0, 9.0, 7.0, 3.0, 0.0],
        ]
    )
    leaves = [Clade(data=i, name=n) for i, n in enumerate("abcde")]
    t = neighbor_joining_tree_from_leaves(leaves, d)
    nwk = t.to_newick()
    assert "(a:2,b:3)" in nwk or "(b:3,a:2)" in nwk


def test_nj_branch_lengths_wikipedia():
    # the Wikipedia worked example's first join gives limb lengths
    # delta(a,u) = 2 and delta(b,u) = 3 (standard Saitou-Nei formulas the
    # reference's NJ omits — neighbor_joining.rs:81-100 keeps topology only)
    from pangraph_tpu.build.tree import Clade, neighbor_joining_tree_from_leaves

    d = np.array(
        [
            [0.0, 5.0, 9.0, 9.0, 8.0],
            [5.0, 0.0, 10.0, 10.0, 9.0],
            [9.0, 10.0, 0.0, 8.0, 7.0],
            [9.0, 10.0, 8.0, 0.0, 3.0],
            [8.0, 9.0, 7.0, 3.0, 0.0],
        ]
    )
    leaves = [Clade(data=i, name=n) for i, n in enumerate("abcde")]
    t = neighbor_joining_tree_from_leaves(leaves, d)
    by_name = {c.name: c for c in t.postorder() if c.is_leaf()}
    assert by_name["a"].branch_length == 2.0
    assert by_name["b"].branch_length == 3.0
    # every non-root edge carries a length; additivity: the a..b path sums
    # to d(a,b) = 5
    assert all(
        c.branch_length is not None for c in t.postorder() if c is not t
    )
    assert by_name["a"].branch_length + by_name["b"].branch_length == 5.0


def test_newick_branch_length_roundtrip():
    # parse(serialize(tree)) reproduces names AND lengths; the reference
    # parses-and-drops lengths (newick.rs:41,285), we keep them end to end
    from pangraph_tpu.build.tree import parse_newick as pn

    src = "((A:0.1,B:0.2)x:0.3,(C:0.4,D:1.5e-3):0.6)root;"
    t = pn(src)
    t2 = pn(t.to_newick())

    def shape(c):
        if c.is_leaf():
            return (c.name, c.branch_length)
        return (c.name, c.branch_length, shape(c.left), shape(c.right))

    assert shape(t2) == shape(t)
    leaf = {c.name: c.branch_length for c in t.postorder() if c.is_leaf()}
    assert leaf == {"A": 0.1, "B": 0.2, "C": 0.4, "D": 0.0015}
    # malformed: ':' without a number is an error (newick.rs:253,307)
    with pytest.raises(ValueError, match="expected a number"):
        pn("(A:,B);")


def _side_patch_aln(qry_iv, reff_iv, reff_len, cigar, orientation):
    return Alignment(
        qry=Hit.new(0, 257, qry_iv),
        reff=Hit.new(1, reff_len, reff_iv),
        matches=29,
        length=84,
        quality=10,
        cigar=parse_cigar(cigar),
        orientation=orientation,
        divergence=0.1,
    )


def test_split_matches_with_side_patches_forward():
    # split_matches.rs:398-461 (thr=10): flanking small indels are patched
    # onto the nearest kept group
    aln = _side_patch_aln((200, 257), (0, 56), 56, "3I3D6M3I3M4D5M14I7M3D4I5M5D3M4I12D", "+")
    out = split_matches(aln, indel_len_threshold=10)
    assert len(out) == 2
    a, b = out
    assert (a.qry.interval.to_tuple(), a.reff.interval.to_tuple()) == ((203, 220), (0, 21))
    assert cigar_str(a.cigar) == "3D6M3I3M4D5M"
    assert (a.matches, a.length) == (14, 24)
    assert (b.qry.interval.to_tuple(), b.reff.interval.to_tuple()) == ((234, 257), (21, 44))
    assert cigar_str(b.cigar) == "7M3D4I5M5D3M4I"
    assert (b.matches, b.length) == (15, 31)
    assert a.orientation == b.orientation == "+"


def test_split_matches_with_side_patches_reverse_qry_leading():
    # split_matches.rs:464-527
    aln = _side_patch_aln((200, 257), (0, 49), 49, "3I3D6M3I3M4D5M14I7M3D4I5M5D3M4I5D", "-")
    out = split_matches(aln, indel_len_threshold=10)
    assert len(out) == 2
    a, b = out
    assert (a.qry.interval.to_tuple(), a.reff.interval.to_tuple()) == ((237, 257), (0, 21))
    assert cigar_str(a.cigar) == "3I3D6M3I3M4D5M"
    assert (a.matches, a.length) == (14, 27)
    assert (b.qry.interval.to_tuple(), b.reff.interval.to_tuple()) == ((204, 223), (21, 49))
    assert cigar_str(b.cigar) == "7M3D4I5M5D3M5D"
    assert (b.matches, b.length) == (15, 32)
    assert a.orientation == b.orientation == "-"


def test_split_matches_with_side_patches_reverse_qry_trailing():
    # split_matches.rs:530-594
    aln = _side_patch_aln((0, 57), (0, 49), 49, "3I3D6M3I3M4D5M14I7M3D4I5M5D3M4I5D", "-")
    out = split_matches(aln, indel_len_threshold=10)
    assert len(out) == 2
    a, b = out
    assert (a.qry.interval.to_tuple(), a.reff.interval.to_tuple()) == ((37, 54), (0, 21))
    assert cigar_str(a.cigar) == "3D6M3I3M4D5M"
    assert (a.matches, a.length) == (14, 24)
    assert (b.qry.interval.to_tuple(), b.reff.interval.to_tuple()) == ((0, 23), (21, 49))
    assert cigar_str(b.cigar) == "7M3D4I5M5D3M5D4I"
    assert (b.matches, b.length) == (15, 36)
    assert a.orientation == b.orientation == "-"
