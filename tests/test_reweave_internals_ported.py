"""Reweave-internal tests ported from the reference's inline suite
(packages/pangraph/src/pangraph/reweave.rs:484-1280, excluding the full
test_reweave e2e which landed in tests/test_reweave_e2e.py and
test_split_block, whose fixture depends on the reference's seeded ISAAC
RNG): extract_hits, group_promises, assign_anchor_block (+ the 11-case
selection matrix), target_blocks, and the three update_cigar cases."""
from __future__ import annotations

import pytest

from pangraph_tpu.align.alignment import ANCHOR_QRY, ANCHOR_REF, Alignment, ExtractedHit, Hit
from pangraph_tpu.align.cigar import parse_cigar
from pangraph_tpu.build.reweave import (
    MergePromise,
    ToMerge,
    assign_anchor_block,
    extract_hits,
    group_promises,
    target_blocks,
    update_cigar,
)
from pangraph_tpu.graph.edits import Edit
from pangraph_tpu.graph.graph import Block, Pangraph


def cigar_str(cigar) -> str:
    return "".join(f"{n}{op}" for n, op in cigar)


def new_aln(q_bid, r_bid, *, q_start=0, r_start=0, new_block_id=None, orientation="+",
            anchor_block=None, cigar="10M", q_iv=None, r_iv=None, length=0):
    return Alignment(
        qry=Hit.new(q_bid, length, q_iv or (q_start, q_start)),
        reff=Hit.new(r_bid, length, r_iv or (r_start, r_start)),
        matches=0, length=0, quality=0, orientation=orientation,
        cigar=parse_cigar(cigar), new_block_id=new_block_id, anchor_block=anchor_block,
    )


def test_extract_hits():
    # reweave.rs:484-546
    a1 = new_aln(1, 1, r_start=10, q_start=20, new_block_id=3, anchor_block=ANCHOR_REF)
    a2 = new_aln(2, 1, r_start=30, q_start=50, new_block_id=4, anchor_block=ANCHOR_QRY)
    a3 = new_aln(1, 2, r_start=60, q_start=40, new_block_id=5, orientation="-",
                 anchor_block=ANCHOR_REF)
    a4 = new_aln(2, 2, r_start=70, q_start=80, new_block_id=6, orientation="-",
                 anchor_block=ANCHOR_QRY)
    hits = extract_hits(1, [a1, a2, a3, a4])
    assert [
        (h.new_block_id, h.is_anchor, h.orientation, h.hit.interval.start) for h in hits
    ] == [
        (3, True, "+", 10),   # a1 ref side, anchor
        (3, False, "+", 20),  # a1 qry side
        (4, False, "+", 30),  # a2 ref side (anchor is qry=block2)
        (5, False, "-", 40),  # a3 qry side
    ]
    assert cigar_str(hits[0].cigar) == "10M"
    assert hits[1].cigar is None and hits[2].cigar is None and hits[3].cigar is None


def test_group_promises():
    # reweave.rs:551-584
    b1_anchor = Block(1, "A", {})
    b1_append = Block(1, "C", {})
    b2_anchor = Block(2, "C", {})
    b2_append = Block(2, "G", {})
    b3_anchor = Block(3, "T", {})
    b3_append = Block(3, "A", {})
    h = [
        ToMerge(b1_anchor, True, "+", parse_cigar("100M")),
        ToMerge(b1_append, False, "+", None),
        ToMerge(b3_anchor, True, "-", parse_cigar("200M")),
        ToMerge(b2_append, False, "+", None),
        ToMerge(b2_anchor, True, "+", parse_cigar("300M")),
        ToMerge(b3_append, False, "-", None),
    ]
    promises = group_promises(h)
    got = [
        (p.anchor_block is a, p.append_block is b, p.orientation, cigar_str(p.cigar))
        for p, a, b in zip(promises, (b1_anchor, b2_anchor, b3_anchor),
                           (b1_append, b2_append, b3_append))
    ]
    assert got == [
        (True, True, "+", "100M"),
        (True, True, "+", "300M"),
        (True, True, "-", "200M"),
    ]


def _edits(nids):
    return {n: Edit() for n in nids}


def test_assign_anchor_block():
    # reweave.rs:586-640: deeper block anchors
    g = Pangraph(
        blocks={
            1: Block(1, "A", _edits([1, 2, 3])),
            2: Block(2, "C", _edits([4, 5])),
            3: Block(3, "G", _edits([6])),
            4: Block(4, "T", _edits([7, 8, 9, 10])),
        },
        paths={}, nodes={},
    )
    mergers = [new_aln(1, 2), new_aln(3, 4), new_aln(4, 1)]
    assign_anchor_block(mergers, g)
    assert [m.anchor_block for m in mergers] == [ANCHOR_QRY, ANCHOR_REF, ANCHOR_QRY]


def test_target_blocks():
    # reweave.rs:642-695
    a1 = new_aln(1, 2)
    a2 = new_aln(3, 4)
    a3 = new_aln(1, 4)
    a4 = new_aln(2, 3)
    tb = target_blocks([a1, a2, a3, a4])
    assert {k: [id(x) for x in v] for k, v in tb.items()} == {
        1: [id(a1), id(a3)],
        2: [id(a1), id(a4)],
        3: [id(a2), id(a4)],
        4: [id(a2), id(a3)],
    }


def test_update_cigar_no_extensions():
    # reweave.rs:1140-1153
    base = parse_cigar("10M20D100M10I")
    assert update_cigar(base, (None, None), (None, None), "+") == base


def test_update_cigar_forward():
    # reweave.rs:1156-1179
    out = update_cigar(parse_cigar("10I100M10D10M10D"), (5, 10), (3, None), "+")
    assert cigar_str(out) == "5D13I100M10D10M20D"


def test_update_cigar_reverse():
    # reweave.rs:1181-1206
    out = update_cigar(parse_cigar("10I100M10D10M10D"), (5, 10), (3, None), "-")
    assert cigar_str(out) == "5D10I100M10D10M20D3I"


# reweave.rs:1208-1280 test_assign_anchor_block_selection — depth wins, then
# fewer Ns in the aligned interval, then ref wins ties
@pytest.mark.parametrize(
    "b1,b2,aln,expected",
    [
        (("ATCG", 2), ("NNCG", 2), (2, (0, 4), 1, (0, 4)), ANCHOR_REF),
        (("ATCG", 2), ("NNCG", 2), (1, (0, 4), 2, (0, 4)), ANCHOR_QRY),
        (("ANCG", 2), ("TNCG", 2), (2, (0, 4), 1, (0, 4)), ANCHOR_REF),
        (("ATCG", 2), ("GCTA", 2), (2, (0, 4), 1, (0, 4)), ANCHOR_REF),
        (("NNNG", 2), ("NNCG", 2), (2, (0, 4), 1, (0, 4)), ANCHOR_QRY),
        (("NNCG", 3), ("ATCG", 2), (1, (0, 4), 2, (0, 4)), ANCHOR_QRY),
        (("NNCG", 3), ("ATCG", 2), (2, (0, 4), 1, (0, 4)), ANCHOR_REF),
        (("ATCG", 10), ("ATCG", 2), (1, (0, 4), 2, (0, 4)), ANCHOR_QRY),
        (("NNNNNACGTNNNNN", 2), ("ACGTACNTACGT", 2), (2, (4, 8), 1, (5, 9)), ANCHOR_REF),
        (("ACGN", 2), ("ACGT", 2), (1, (3, 4), 2, (3, 4)), ANCHOR_REF),
        (("ACGT", 2), ("NCGT", 2), (2, (0, 1), 1, (0, 1)), ANCHOR_REF),
    ],
    ids=[
        "equal_depth_ref_fewer_ns", "equal_depth_qry_fewer_ns",
        "equal_depth_equal_ns_ref_wins", "equal_depth_zero_ns_ref_wins",
        "equal_depth_many_ns_qry_wins", "qry_deeper_wins", "ref_deeper_wins",
        "depth_large_difference", "interval_ns_not_whole_block",
        "interval_at_end", "single_base_interval",
    ],
)
def test_assign_anchor_block_selection(b1, b2, aln, expected):
    g = Pangraph(
        blocks={
            1: Block(1, b1[0], _edits(range(b1[1]))),
            2: Block(2, b2[0], _edits(range(100, 100 + b2[1]))),
        },
        paths={}, nodes={},
    )
    q_id, q_iv, r_id, r_iv = aln
    m = new_aln(q_id, r_id, q_iv=q_iv, r_iv=r_iv, length=max(len(b1[0]), len(b2[0])))
    assign_anchor_block([m], g)
    assert m.anchor_block == expected
