"""PangraphBlock tests ported from the reference's inline suite
(packages/pangraph/src/pangraph/pangraph_block.rs:376-830) — majority-edit
voting, consensus nucleotide flips, reverse complement, and the
edit_consensus_and_realign pipeline (VERDICT r4 item 6)."""
from __future__ import annotations

import numpy as np
import pytest

from pangraph_tpu.graph.edits import Del, Edit, Ins, Sub
from pangraph_tpu.graph.graph import Block
from pangraph_tpu.graph.seq import to_str


def blk(consensus: str, alignments: dict) -> Block:
    return Block(1, consensus, alignments)


def s(pos, alt):
    return Sub(pos, alt)


def d(pos, ln):
    return Del(pos, ln)


def i(pos, seq):
    return Ins(pos, seq)


# ------------------------------------------------- majority substitutions #
def test_find_majority_substitutions_single_node():
    # pangraph_block.rs:376: a single node is always majority (1 > 0)
    b = blk("ATCG", {1: Edit(subs=[s(0, "G"), s(2, "A")])})
    assert b.find_majority_substitutions() == [s(0, "G"), s(2, "A")]


def test_find_majority_substitutions_no_majority():
    # pangraph_block.rs:390: 1 is not > 3//2
    b = blk("ATCG", {1: Edit(subs=[s(0, "G")]), 2: Edit(subs=[s(0, "C")]), 3: Edit(subs=[s(0, "T")])})
    assert b.find_majority_substitutions() == []


def test_find_majority_substitutions_clear_majority():
    # pangraph_block.rs:406
    b = blk(
        "ATCG",
        {
            1: Edit(subs=[s(0, "G"), s(2, "A")]),
            2: Edit(subs=[s(0, "G"), s(3, "A")]),
            3: Edit(subs=[s(0, "C"), s(2, "A")]),
        },
    )
    assert b.find_majority_substitutions() == [s(0, "G"), s(2, "A")]


def test_find_majority_substitutions_tie_no_majority():
    # pangraph_block.rs:421: 2 of 4 is not > 4//2
    b = blk("ATCG", {1: Edit(), 2: Edit(), 3: Edit(subs=[s(0, "C")]), 4: Edit(subs=[s(0, "C")])})
    assert b.find_majority_substitutions() == []


# ----------------------------------------------------- majority deletions #
def test_find_majority_deletions_single_node():
    # pangraph_block.rs:437
    b = blk("ATCGAA", {1: Edit(dels=[d(1, 2), d(4, 1)])})
    assert b.find_majority_deletions() == [d(1, 2), d(4, 1)]


def test_find_majority_deletions_no_majority():
    # pangraph_block.rs:451
    b = blk("ATCGAA", {1: Edit(dels=[d(0, 1)]), 2: Edit(dels=[d(1, 1)]), 3: Edit(dels=[d(2, 1)])})
    assert b.find_majority_deletions() == []


def test_find_majority_deletions_clear_majority():
    # pangraph_block.rs:466
    b = blk(
        "ATCGAA",
        {
            1: Edit(dels=[d(1, 2), d(4, 1)]),
            2: Edit(dels=[d(1, 2), d(5, 1)]),
            3: Edit(dels=[d(0, 1), d(4, 1)]),
        },
    )
    assert b.find_majority_deletions() == [d(1, 2), d(4, 1)]


def test_find_majority_deletions_overlapping_intervals():
    # pangraph_block.rs:481: per-position coverage vote — only position 3 is
    # deleted by 3 of 5 nodes
    b = blk(
        "ATCGAATT",
        {
            1: Edit(dels=[d(1, 3)]),
            2: Edit(dels=[d(2, 3)]),
            3: Edit(dels=[d(3, 2)]),
            4: Edit(dels=[d(6, 1)]),
            5: Edit(dels=[d(6, 2)]),
        },
    )
    assert b.find_majority_deletions() == [d(3, 1)]


def test_find_majority_deletions_contiguous_intervals():
    # pangraph_block.rs:498: adjacent majority positions merge into one Del
    b = blk(
        "ATCGAATT",
        {
            1: Edit(dels=[d(1, 1), d(2, 1), d(3, 1)]),
            2: Edit(dels=[d(1, 3)]),
            3: Edit(dels=[d(1, 1), d(2, 2)]),
            4: Edit(dels=[d(5, 1)]),
            5: Edit(dels=[d(5, 1), d(6, 1)]),
        },
    )
    assert b.find_majority_deletions() == [d(1, 3)]


# ---------------------------------------------------- majority insertions #
def test_find_majority_insertions_empty_block():
    # pangraph_block.rs:515
    assert blk("ATCG", {}).find_majority_insertions() == []


def test_find_majority_insertions_single_node():
    # pangraph_block.rs:522
    b = blk("ATCG", {1: Edit(inss=[i(1, "GG"), i(3, "AA")])})
    assert b.find_majority_insertions() == [i(1, "GG"), i(3, "AA")]


def test_find_majority_insertions_no_majority():
    # pangraph_block.rs:536
    b = blk("ATCG", {1: Edit(inss=[i(1, "A")]), 2: Edit(inss=[i(1, "T")]), 3: Edit(inss=[i(1, "G")])})
    assert b.find_majority_insertions() == []


def test_find_majority_insertions_clear_majority():
    # pangraph_block.rs:552
    b = blk(
        "ATCG",
        {
            1: Edit(inss=[i(1, "GGG"), i(3, "A")]),
            2: Edit(inss=[i(1, "GGG"), i(2, "TT")]),
            3: Edit(inss=[i(1, "CC"), i(3, "A")]),
        },
    )
    assert b.find_majority_insertions() == [i(1, "GGG"), i(3, "A")]


def test_find_majority_insertions_exact_sequence_match():
    # pangraph_block.rs:567: votes are per (pos, sequence) pair
    b = blk(
        "ATCG",
        {
            1: Edit(inss=[i(1, "ATG")]),
            2: Edit(inss=[i(1, "ATG")]),
            3: Edit(inss=[i(1, "ATG")]),
            4: Edit(inss=[i(1, "GTA")]),
            5: Edit(inss=[i(1, "GTA")]),
        },
    )
    assert b.find_majority_insertions() == [i(1, "ATG")]


def test_find_majority_insertions_different_positions():
    # pangraph_block.rs:584
    b = blk(
        "ATCGAA",
        {
            1: Edit(inss=[i(0, "G"), i(2, "T"), i(4, "C")]),
            2: Edit(inss=[i(0, "G"), i(3, "A"), i(5, "T")]),
            3: Edit(inss=[i(1, "A"), i(2, "T"), i(4, "C")]),
            4: Edit(inss=[i(0, "C"), i(2, "T"), i(6, "G")]),
            5: Edit(inss=[i(0, "G"), i(3, "A"), i(4, "C")]),
        },
    )
    assert b.find_majority_insertions() == [i(0, "G"), i(2, "T"), i(4, "C")]


def test_find_majority_insertions_tie_no_majority():
    # pangraph_block.rs:601
    b = blk("ATCG", {1: Edit(), 2: Edit(), 3: Edit(inss=[i(1, "AA")]), 4: Edit(inss=[i(1, "AA")])})
    assert b.find_majority_insertions() == []


# --------------------------------------------------------- majority edits #
def test_find_majority_edits_empty():
    # pangraph_block.rs:617
    b = blk("ATCG", {1: Edit(), 2: Edit(), 3: Edit()})
    assert b.find_majority_edits().is_empty()


def test_find_majority_edits_comprehensive():
    # pangraph_block.rs:632: depth 5, threshold > 2
    b = blk(
        "ATCGAATT",
        {
            1: Edit(inss=[i(1, "GG"), i(4, "C")], dels=[d(2, 1), d(6, 1)], subs=[s(0, "G"), s(5, "C")]),
            2: Edit(inss=[i(1, "GG"), i(3, "A")], dels=[d(2, 1), d(7, 1)], subs=[s(0, "G"), s(5, "T")]),
            3: Edit(inss=[i(1, "AA"), i(4, "C")], dels=[d(2, 1), d(6, 1)], subs=[s(0, "C"), s(5, "C")]),
            4: Edit(inss=[i(1, "GG"), i(4, "C")], dels=[d(1, 1), d(6, 1)], subs=[s(0, "G"), s(4, "A")]),
            5: Edit(inss=[i(1, "GG"), i(4, "C")], dels=[d(2, 1), d(5, 1)], subs=[s(0, "G"), s(5, "C")]),
        },
    )
    maj = b.find_majority_edits()
    assert maj.inss == [i(1, "GG"), i(4, "C")]
    assert maj.dels == [d(2, 1), d(6, 1)]
    assert maj.subs == [s(0, "G"), s(5, "C")]


# --------------------------------------------- consensus nucleotide flips #
def test_change_consensus_nucleotide_at_pos_basic():
    # pangraph_block.rs:669
    b = blk("ATCG", {1: Edit(), 2: Edit(subs=[s(1, "G"), s(2, "C")]), 3: Edit(subs=[s(1, "A")])})
    b.change_consensus_nucleotide_at_pos(s(1, "G"))
    assert to_str(b.consensus) == "AGCG"
    assert b.alignments[1] == Edit(subs=[s(1, "T")])
    assert b.alignments[2] == Edit(subs=[s(2, "C")])
    assert b.alignments[3] == Edit(subs=[s(1, "A")])


def test_change_consensus_nucleotide_at_pos_with_deletion():
    # pangraph_block.rs:697: a node that deleted the position gets NO reversion
    b = blk(
        "ATCG",
        {1: Edit(dels=[d(1, 2)]), 2: Edit(), 3: Edit(subs=[s(1, "A")]), 4: Edit(subs=[s(1, "G")])},
    )
    b.change_consensus_nucleotide_at_pos(s(1, "G"))
    assert to_str(b.consensus) == "AGCG"
    assert b.alignments[1] == Edit(dels=[d(1, 2)])
    assert b.alignments[2] == Edit(subs=[s(1, "T")])
    assert b.alignments[3] == Edit(subs=[s(1, "A")])
    assert b.alignments[4] == Edit()


def test_change_consensus_nucleotide_at_pos_out_of_bounds():
    # pangraph_block.rs:727
    b = blk("ATCG", {1: Edit()})
    with pytest.raises(ValueError):
        b.change_consensus_nucleotide_at_pos(s(4, "A"))


def test_change_consensus_nucleotide_at_pos_same_character():
    # pangraph_block.rs:743
    b = blk("ATCG", {1: Edit()})
    with pytest.raises(ValueError, match="already"):
        b.change_consensus_nucleotide_at_pos(s(1, "T"))


# ------------------------------------------------------ reverse complement #
def test_reverse_complement_reference_fixture():
    # pangraph_block.rs:760
    b = blk(
        "ATCG",
        {
            1: Edit(inss=[i(1, "AA")], dels=[d(2, 1)], subs=[s(0, "G")]),
            2: Edit(subs=[s(1, "G"), s(3, "A")]),
            3: Edit(),
        },
    )
    rc = b.reverse_complement()
    assert to_str(rc.consensus) == "CGAT"
    assert rc.alignments[1] == Edit(inss=[i(3, "TT")], dels=[d(1, 1)], subs=[s(3, "C")])
    assert rc.alignments[2] == Edit(subs=[s(0, "T"), s(2, "C")])
    assert rc.alignments[3] == Edit()


# --------------------------------------------- edit consensus and realign #
def test_edit_consensus_and_realign():
    # pangraph_block.rs:786: apply {sub 0->G, del 6..8, ins "AAA"@10} to the
    # consensus and re-derive every node's edits against it. The reference
    # asserts exact edit lists; edit REPRESENTATION can legitimately differ
    # between aligners (e.g. ins position of an equivalent alignment), so the
    # exactness oracle here is sequence-level: every node's reconstructed
    # sequence must be unchanged by the consensus rewrite.
    from pangraph_tpu.align.params import BuildArgs
    from pangraph_tpu.build.reconsensus import edit_consensus_and_realign

    b = blk(
        "ATCGGCGATG",
        {
            1: Edit(),
            2: Edit(dels=[d(6, 2)], subs=[s(2, "G")]),
        },
    )
    before = {nid: to_str(e.apply(b.consensus)) for nid, e in b.alignments.items()}
    edits = Edit(inss=[i(10, "AAA")], dels=[d(6, 2)], subs=[s(0, "G")])
    out = edit_consensus_and_realign(b, edits, BuildArgs())
    assert to_str(out.consensus) == "GTCGGCTGAAA"
    after = {nid: to_str(e.apply(out.consensus)) for nid, e in out.alignments.items()}
    assert after == before
    for e in out.alignments.values():
        e.sanity_check(out.consensus_len())
