"""Block-slicing tests ported from the reference's inline suite
(packages/pangraph/src/pangraph/slice.rs:252-700) — edit slicing, interval
node coordinates, circular/non-circular position remapping, and full
block_slice with forward-anchor and reverse-append intervals
(VERDICT r4 item 6)."""
from __future__ import annotations

import pytest

from pangraph_tpu.build.reweave import (
    PangraphInterval,
    block_slice,
    interval_node_coords,
    new_position_circular,
    new_position_non_circular,
    slice_edits,
)
from pangraph_tpu.graph.edits import Del, Edit, Ins, Sub
from pangraph_tpu.graph.graph import Block, Node, Pangraph, Path
from pangraph_tpu.graph.seq import to_str
from pangraph_tpu.utils.intervals import Interval


def make_interval(start, end, new_bid=0, aligned=True, is_anchor=None, orientation=None):
    return PangraphInterval(
        interval=Interval(start, end), aligned=aligned, new_block_id=new_bid,
        is_anchor=is_anchor, orientation=orientation,
    )


def generate_example():
    # slice.rs:219-249
    seq = "ACTGGATATCCGATATTCGAG"
    ed = Edit(
        subs=[Sub(2, "C"), Sub(5, "C"), Sub(6, "G"), Sub(7, "C"), Sub(13, "G"),
              Sub(14, "T"), Sub(18, "C"), Sub(20, "A")],
        dels=[Del(0, 2), Del(4, 3), Del(9, 2), Del(13, 4), Del(18, 3)],
        inss=[Ins(2, "CC"), Ins(5, "A"), Ins(6, "TTT"), Ins(10, "C"), Ins(13, "T"),
              Ins(14, "GG"), Ins(17, "A"), Ins(21, "A")],
    )
    return seq, ed


def test_slice_substitutions():
    # slice.rs:252-279
    _, ed = generate_example()
    out = slice_edits(make_interval(6, 14), ed, 21)
    assert out.subs == [Sub(0, "G"), Sub(1, "C"), Sub(7, "G")]
    out = slice_edits(make_interval(15, 21), ed, 21)
    assert out.subs == [Sub(3, "C"), Sub(5, "A")]


def test_slice_deletions():
    # slice.rs:281-311: deletions straddling the boundary are clipped
    _, ed = generate_example()
    out = slice_edits(make_interval(6, 14), ed, 21)
    assert out.dels == [Del(0, 1), Del(3, 2), Del(7, 1)]
    out = slice_edits(make_interval(15, 21), ed, 21)
    assert out.dels == [Del(0, 2), Del(3, 3)]


def test_slice_insertions():
    # slice.rs:313-340: right edge included only at block end
    seq, ed = generate_example()
    out = slice_edits(make_interval(6, 14), ed, len(seq))
    assert out.inss == [Ins(0, "TTT"), Ins(4, "C"), Ins(7, "T")]
    out = slice_edits(make_interval(15, 21), ed, len(seq))
    assert out.inss == [Ins(2, "A"), Ins(6, "A")]


def test_interval_node_coords():
    # slice.rs:342-371
    seq, ed = generate_example()
    assert interval_node_coords(make_interval(6, 14), ed, len(seq)) == (5, 14)
    assert interval_node_coords(make_interval(15, 21), ed, len(seq)) == (16, 19)


def test_new_position_circular():
    # slice.rs:373-401 (circular wrap at path_L = 100)
    assert new_position_circular((10, 40), (10, 20), 100, "+") == (20, 30)
    assert new_position_circular((95, 20), (10, 20), 100, "+") == (5, 15)
    assert new_position_circular((10, 50), (10, 20), 100, "-") == (30, 40)
    assert new_position_circular((40, 5), (10, 20), 100, "-") == (85, 95)
    assert new_position_circular((0, 100), (0, 100), 100, "+") == (0, 0)


def test_new_position_non_circular():
    # slice.rs:403-428
    assert new_position_non_circular((10, 40), (10, 20), "+") == (20, 30)
    assert new_position_non_circular((10, 50), (10, 20), "-") == (30, 40)
    assert new_position_non_circular((0, 20), (0, 10), "+") == (0, 10)
    assert new_position_non_circular((0, 100), (0, 100), "+") == (0, 100)


def test_node_coords():
    # slice.rs:430-450
    ed = Edit(
        subs=[Sub(2, "G"), Sub(13, "T"), Sub(24, "T")],
        dels=[Del(18, 3)],
        inss=[Ins(7, "A"), Ins(10, "AAAA"), Ins(20, "TTTTTTTT")],
    )
    assert interval_node_coords(make_interval(10, 20), ed, 100) == (11, 23)


def generate_block_example():
    # slice.rs:517-594
    seq = "ACTTGATCCTTATATTTATCCGATCAT"
    bid = 1
    ed1 = Edit(subs=[Sub(2, "G"), Sub(13, "T"), Sub(24, "T")], dels=[Del(18, 3)],
               inss=[Ins(7, "A"), Ins(10, "A")])
    ed2 = Edit(subs=[Sub(4, "T"), Sub(19, "G"), Sub(20, "G")],
               dels=[Del(6, 2), Del(13, 2)], inss=[Ins(17, "T"), Ins(25, "A")])
    ed3 = Edit(subs=[], dels=[Del(2, 4), Del(9, 3), Del(24, 2)], inss=[Ins(20, "T")])
    n1 = Node(1, bid, 1, "+", (100, 125))
    n2 = Node(2, bid, 2, "-", (1000, 1025))
    n3 = Node(3, bid, 3, "-", (90, 9))
    p1 = Path(1, [1, 4], 2000, True)
    p2 = Path(2, [2, 5], 2000, True)
    p3 = Path(3, [3, 6], 100, True)
    b1 = Block(bid, seq, {1: ed1, 2: ed2, 3: ed3})
    G = Pangraph(paths={1: p1, 2: p2, 3: p3}, blocks={bid: b1}, nodes={1: n1, 2: n2, 3: n3})
    return b1, G


def _check_block_slice(is_anchor, orientation, strands):
    b, G = generate_block_example()
    i = make_interval(10, 20, new_bid=42, is_anchor=is_anchor, orientation=orientation)
    new_b, new_nodes = block_slice(b, i, G)
    assert to_str(new_b.consensus) == "TATATTTATC"
    expected = {
        1: (strands[0], (111, 120), Edit(subs=[Sub(3, "T")], dels=[Del(8, 2)], inss=[Ins(0, "A")])),
        2: (strands[1], (1008, 1017), Edit(subs=[Sub(9, "G")], dels=[Del(3, 2)], inss=[Ins(7, "T")])),
        3: (strands[2], (96, 4), Edit(dels=[Del(0, 2)])),
    }
    assert set(new_nodes) == {1, 2, 3}
    for old_id, (strand, pos, ed) in expected.items():
        nn = new_nodes[old_id]
        assert nn is not None
        assert nn.block_id == 42
        assert nn.path_id == old_id
        assert nn.strand == strand
        assert nn.position == pos
        assert new_b.alignments[nn.id] == ed


def test_block_slice_fwd_anchor():
    # slice.rs:452-515: anchor keeps every node's strand
    _check_block_slice(is_anchor=True, orientation="+", strands=("+", "-", "-"))


def test_block_slice_rev_append():
    # slice.rs:594-700: reverse append flips every node's strand
    _check_block_slice(is_anchor=False, orientation="-", strands=("-", "+", "+"))
