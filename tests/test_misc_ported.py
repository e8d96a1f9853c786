"""Final sweep of the reference's smaller inline suites (VERDICT r4 item 6
extension): remove_nodes.rs, detach_unaligned.rs, mash_distance.rs,
graph_merging.rs, and nuc_changes.rs (whose find_nuc_changes semantics we
combine with align_with_nextclade.rs:48-64's terminal-deletion padding in
edits_from_aligned_pair)."""
from __future__ import annotations

import numpy as np
import pytest

from pangraph_tpu.align.alignment import Alignment, Hit
from pangraph_tpu.align.cigar import parse_cigar
from pangraph_tpu.align.map_variations import edits_from_aligned_pair
from pangraph_tpu.align.minimizer import mash_distance
from pangraph_tpu.align.params import AlignmentArgs
from pangraph_tpu.build.merge import filter_matches
from pangraph_tpu.build.reconsensus import (
    detach_unaligned_nodes,
    find_empty_nodes,
    remove_nodes_from_graph,
)
from pangraph_tpu.graph.edits import Del, Edit, Ins, Sub
from pangraph_tpu.graph.graph import Block, Node, Pangraph, Path
from pangraph_tpu.graph.seq import as_seq, to_str


# ----------------------------------------------------------- remove_nodes #
def _remove_nodes_graph() -> Pangraph:
    # remove_nodes.rs:89-117: node 3 deletes block 1's whole consensus
    nodes = {
        1: Node(1, 1, 0, "+", (0, 10)),
        2: Node(2, 1, 1, "+", (0, 10)),
        3: Node(3, 1, 2, "-", (0, 0)),
        4: Node(4, 2, 0, "+", (10, 20)),
        5: Node(5, 2, 2, "+", (0, 10)),
    }
    paths = {
        0: Path(0, [1, 4], 20, False),
        1: Path(1, [2], 10, False),
        2: Path(2, [3, 5], 10, False),
    }
    blocks = {
        1: Block(1, "AAAAAAAAAA", {
            1: Edit(dels=[Del(1, 3)]),
            2: Edit(subs=[Sub(5, "G")]),
            3: Edit(dels=[Del(0, 10)]),
        }),
        2: Block(2, "CCCCCCCCCC", {4: Edit(), 5: Edit()}),
    }
    return Pangraph(paths=paths, blocks=blocks, nodes=nodes)


def test_find_empty_nodes():
    # remove_nodes.rs:119-124
    assert find_empty_nodes(_remove_nodes_graph(), [1, 2]) == [3]


def test_remove_empty_nodes():
    # remove_nodes.rs:126-133
    g = _remove_nodes_graph()
    remove_nodes_from_graph(g, find_empty_nodes(g, [1, 2]))
    assert sorted(g.nodes) == [1, 2, 4, 5]
    assert g.paths[2].nodes == [5]
    assert 3 not in g.blocks[1].alignments


# ------------------------------------------------------- detach_unaligned #
def test_detach_unaligned_nodes_reference():
    # detach_unaligned.rs:200-235: the indel-only node becomes a singleton
    # block; a '-' node's sequence is reverse-complemented and the node
    # flipped to '+'
    cons = "AAAAAAAAAAAAAAAA"
    block = Block(0, cons, {
        1: Edit(subs=[Sub(1, "C")]),
        2: Edit(inss=[Ins(0, "CCCCCCCC")], dels=[Del(0, 16)]),
    })
    blocks = [block]
    nodes = {
        1: Node(1, 0, 0, "+", (0, 16)),
        2: Node(2, 0, 1, "-", (0, 8)),
    }
    detach_unaligned_nodes(blocks, nodes)
    assert len(blocks) == 2
    assert to_str(blocks[0].consensus) == cons
    assert blocks[0].alignments == {1: Edit(subs=[Sub(1, "C")])}
    new_block = blocks[1]
    assert to_str(new_block.consensus) == "GGGGGGGG"  # revcomp of CCCCCCCC
    assert new_block.alignments == {2: Edit()}
    assert nodes[2].block_id == new_block.id
    assert nodes[2].strand == "+"
    assert nodes[2].position == (0, 8)
    assert nodes[1].block_id == 0


def test_detach_forward_node_keeps_sequence():
    # detach_unaligned.rs:130-147 create_new_node_and_block_forward semantics
    block = Block(0, "TTTT", {
        1: Edit(),
        2: Edit(inss=[Ins(4, "ATGTTGATAG")], dels=[Del(0, 4)]),
    })
    blocks = [block]
    nodes = {1: Node(1, 0, 0, "+", (0, 4)), 2: Node(2, 0, 1, "+", (10, 20))}
    detach_unaligned_nodes(blocks, nodes)
    assert to_str(blocks[1].consensus) == "ATGTTGATAG"
    assert nodes[2].strand == "+" and nodes[2].position == (10, 20)


# ---------------------------------------------------------- mash_distance #
SEQS_TREE = [
    "CATAGAAGCAGTCCCTGAGCACGACGCGTGTAACAATCGTTTTCAGACCTAGGACGTTAGAATATCGATCGCACGCTACGACCGACGATTAGCCGCACGAGCAAGTCGAAAACCCGAGTTAAGAGGCTGGACGTGATCCTAGACTTCGTC",
    "CATAGAAGCAGTCCCTGAGCACGAGGCGCGCAACAATCGTTTTCAGCCCTAGGACGTTAGAATATTGATCACAAGCTACGACCGACGATTAGCCGCACGAGCAAGTCGACAACCCGAGTTAAGAGGCTGGACGTGATGCTAGACTTCGTC",
    "CATAGAAGCAGTCCCTGAGCATGACGCGCGCAACGATCGTTTTCAGCCCTAGCACGTGAGAATATTGATCACAAGCTACGACCGACGATTAGCCGCACGAGCTAGTCGCCAACCCGAGTAAGGAGGCTGGACGTGATGCTAGACTACGTC",
    "ACATCAAAACTTAAAGTCGGTTACCATCTACAAATGTAGTAAGGGGGATTCTAATGAGAGAAGTGGACTGTGTAGATGGACCCGCTCACCTGCCCAGTATCTTAGTGGCGTATTCAGGATCTGGGAGGATTTGTTATTGCCTATTAGAGA",
    "ACATCAAAACTTAAAGTCGGTTCCCATCTACAAAAGTAGAAAGGGGGATTCTAATGAGAGATGTGGACTGTGTAGATGGACCCGCTAACCTGGCCAGTTTCTTAGTGGCTTAATCAGGATCTGGGAGGATTCGTTACTGCCTATTAGAGA",
    "ACATCAGAACTTAAAGTCGGTTCCTATCTCCAAAAGTATAAAGTGGGATTCTAATGAGAGATGTGGACTGTGTCGATAAACCCGCTAACCTGGCCTGTTTCTTGTTGGCTTAATCAGGATCTGAGAGGATTCGTTACTGCCTAGTAGTGA",
]


def test_mash_distance_general_case():
    # mash_distance.rs:92-126 — the 6-taxon two-clade example (w=16, k=8);
    # exact expected distances, including the two clean clades at distance 1
    d = mash_distance([as_seq(s) for s in SEQS_TREE], k=8, w=16)
    expected = np.array([
        [0.0, 1 - 6 / 9, 0.75, 1.0, 1.0, 1.0],
        [1 - 6 / 9, 0.0, 0.5, 1.0, 1.0, 1.0],
        [0.75, 0.5, 0.0, 1.0, 1.0, 1.0],
        [1.0, 1.0, 1.0, 0.0, 0.625, 0.875],
        [1.0, 1.0, 1.0, 0.625, 0.0, 5 / 7],
        [1.0, 1.0, 1.0, 0.875, 5 / 7, 0.0],
    ])
    np.testing.assert_allclose(d, expected, atol=1e-12)


def test_mash_distance_equal():
    # mash_distance.rs:136-145
    d = mash_distance([as_seq(SEQS_TREE[0]), as_seq(SEQS_TREE[0])])
    np.testing.assert_array_equal(d, np.zeros((2, 2)))


def test_mash_distance_one():
    # mash_distance.rs:147-152
    d = mash_distance([as_seq(SEQS_TREE[0][:51])])
    np.testing.assert_array_equal(d, np.zeros((1, 1)))


# ----------------------------------------------------------- graph_merging #
def _aln(q_bid, q_iv, r_bid, r_iv, divergence):
    return Alignment(
        qry=Hit.new(q_bid, 500, q_iv), reff=Hit.new(r_bid, 500, r_iv),
        matches=100, length=0, quality=0, orientation="+",
        cigar=parse_cigar("100M"), divergence=divergence,
    )


def test_filter_matches_reference():
    # graph_merging.rs:307-375 (alpha=beta=10): energies sort aln_1 (div
    # 0.02) before aln_0 (0.05); aln_2 overlaps aln_1's qry block interval
    # and is rejected; aln_3's energy is positive (div 0.1) and is dropped
    args = AlignmentArgs(alpha=10.0, beta=10.0)
    aln_0 = _aln(0, (100, 200), 1, (200, 300), 0.05)
    aln_1 = _aln(2, (100, 200), 3, (200, 300), 0.02)
    aln_2 = _aln(2, (150, 250), 4, (200, 300), 0.05)
    aln_3 = _aln(5, (100, 200), 6, (200, 300), 0.1)
    out = filter_matches([aln_0, aln_1, aln_2, aln_3], args)
    assert out == [aln_1, aln_0]


def test_is_match_compatible_semantics():
    # graph_merging.rs:255-305: an alignment is compatible iff BOTH sides
    # avoid every accepted interval of their blocks (the predicate
    # filter_matches applies via have_no_overlap)
    from pangraph_tpu.utils.intervals import Interval, have_no_overlap

    accepted = {
        0: [Interval(100, 200), Interval(300, 400)],
        1: [Interval(200, 300), Interval(400, 500)],
    }
    ok = _aln(0, (210, 290), 1, (310, 390), 0.05)
    bad = _aln(0, (310, 390), 1, (310, 390), 0.05)
    assert have_no_overlap(accepted[0], ok.qry.interval) and have_no_overlap(
        accepted[1], ok.reff.interval
    )
    assert not (
        have_no_overlap(accepted[0], bad.qry.interval)
        and have_no_overlap(accepted[1], bad.reff.interval)
    )


# -------------------------------------------------------------- nuc_changes #
def _pair(ref_s, qry_s):
    return edits_from_aligned_pair(as_seq(ref_s), as_seq(qry_s), len(ref_s.replace("-", "")))


def test_find_nuc_changes_no_differences():
    # nuc_changes.rs:83-99
    assert _pair("GGGGGGGGGGGGGGGGGG", "GGGGGGGGGGGGGGGGGG") == Edit()


def test_find_nuc_changes_single_substitution():
    # nuc_changes.rs:102-121
    assert _pair("GGGGGGGGGGGGGGGGGG", "GGGAGGGGGGGGGGGGGG") == Edit(subs=[Sub(3, "A")])


def test_find_nuc_changes_single_deletion():
    # nuc_changes.rs:123-138
    assert _pair("GGGGGGGGGGGGGGGGGG", "GGG--GGGGGGGGGGGGG") == Edit(dels=[Del(3, 2)])


def test_find_nuc_changes_deletion_at_edges():
    # nuc_changes.rs:140-155 reports alignment_range (2, 17); our
    # edits_from_aligned_pair folds the trimmed range into terminal
    # deletions per align_with_nextclade.rs:48-64
    assert _pair("GGGGGGGGGGGGGGGGGGG", "--GGGGGGGGGGGGGGG--") == Edit(
        dels=[Del(0, 2), Del(17, 2)]
    )


def test_find_nuc_changes_full_deletion():
    # nuc_changes.rs:157-172: no aligned positions; ours pads the whole
    # reference as deleted (align_with_nextclade.rs:60-63)
    assert _pair("GGGGGGGGGGGGGGGGGG", "------------------") == Edit(dels=[Del(0, 18)])
