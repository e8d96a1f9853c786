"""Circularize tests ported from circularize.rs (the 5-path mock graph with
mixed orientations) — edge counting and transitive-edge detection."""
import numpy as np

from pangraph_tpu.build.circularize import Edge, SimpleNode, count_edges, find_transitive_edges
from pangraph_tpu.graph.edits import Edit
from pangraph_tpu.graph.graph import Block, Node, Pangraph, Path

FWD, REV = "+", "-"


def _mock_graph():
    """circularize.rs:~420 input_graph():
    a) 1+ 2+ 3+ 4+     b) 1+ 2- 2+ 3+ 4+   c) 1+ 2+ 3- 4+
    d) 1+ 3- 2+ 3- 4+  f) 4- 3- 2- 1-      (all circular)"""
    paths = {
        0: Path(0, [10, 20, 30, 40], 0, True),
        1: Path(1, [11, 21, 22, 31, 41], 0, True),
        2: Path(2, [12, 23, 32, 42], 0, True),
        3: Path(3, [13, 33, 24, 34, 43], 0, True),
        4: Path(4, [44, 35, 25, 14], 0, True),
    }
    spec = {
        10: (1, 0, FWD), 20: (2, 0, FWD), 30: (3, 0, FWD), 40: (4, 0, FWD),
        11: (1, 1, FWD), 21: (2, 1, REV), 22: (2, 1, FWD), 31: (3, 1, FWD), 41: (4, 1, FWD),
        12: (1, 2, FWD), 23: (2, 2, FWD), 32: (3, 2, REV), 42: (4, 2, FWD),
        13: (1, 3, FWD), 33: (3, 3, REV), 24: (2, 3, FWD), 34: (3, 3, REV), 43: (4, 3, FWD),
        44: (4, 4, REV), 35: (3, 4, REV), 25: (2, 4, REV), 14: (1, 4, REV),
    }
    nodes = {nid: Node(nid, bid, pid, s, (0, 0)) for nid, (bid, pid, s) in spec.items()}
    empty = np.zeros(0, dtype=np.uint8)
    blocks = {}
    for bid in (1, 2, 3, 4):
        nids = [nid for nid, (b, _, _) in spec.items() if b == bid]
        blocks[bid] = Block(bid, empty, {nid: Edit() for nid in nids})
    return Pangraph(paths=paths, blocks=blocks, nodes=nodes)


def _count(ec, e):
    k = e.key()
    return ec[k][1] if k in ec else 0


def test_count_edges_reference():
    # circularize.rs test_count_edges
    ec = count_edges(_mock_graph())
    n1, n2 = SimpleNode(1, FWD), SimpleNode(2, FWD)
    n3, n4 = SimpleNode(3, FWD), SimpleNode(4, FWD)
    assert _count(ec, Edge(n1, n2)) == 3
    assert _count(ec, Edge(n1, n2.invert())) == 1
    assert _count(ec, Edge(n2, n3)) == 3
    assert _count(ec, Edge(n2, n3.invert())) == 2
    assert _count(ec, Edge(n2.invert(), n2)) == 1
    assert _count(ec, Edge(n2, n2.invert())) == 0
    assert _count(ec, Edge(n3, n4)) == 3
    assert _count(ec, Edge(n3.invert(), n4)) == 2
    assert _count(ec, Edge(n4, n1)) == 5


def test_block_depths_reference():
    g = _mock_graph()
    depths = {bid: b.depth() for bid, b in g.blocks.items()}
    assert depths == {1: 5, 2: 6, 3: 6, 4: 5}


def test_find_transitive_edges_reference():
    # circularize.rs test_transitive_edges_a: only 4+ -> 1+ qualifies
    edges = find_transitive_edges(_mock_graph())
    assert len(edges) == 1
    assert edges[0].same_as(Edge(SimpleNode(4, FWD), SimpleNode(1, FWD)))


# ---------------------------------------------------------- merge_blocks #
from pangraph_tpu.build.circularize import concatenate_alignments, find_node_pairings, merge_blocks, remove_transitive_edges
from pangraph_tpu.graph.edits import Del, Ins, Sub
from pangraph_tpu.graph.seq import as_seq, to_str


def _block_1():
    aln = {
        1: Edit([Sub(3, "G")], [], []),
        2: Edit([], [Del(13, 3)], [Ins(7, "AA")]),
        3: Edit([], [], [Ins(32, "CCC")]),
    }
    return Block(1, as_seq("ACTATATTACGGCGATCGATCGATTACTCGCT"), aln)


def _block_2():
    aln = {
        4: Edit([], [Del(25, 2)], []),
        5: Edit([Sub(3, "T")], [], []),
        6: Edit([], [Del(0, 2)], [Ins(0, "TTT")]),
    }
    return Block(2, as_seq("GATCTTAGGATCATCCCTATCATAGGAGTCG"), aln)


def _block_3():
    aln = {
        7: Edit([], [Del(15, 2)], []),
        8: Edit([Sub(3, "C")], [], []),
    }
    return Block(3, as_seq("CTATTACTAGGGGGACCACTA"), aln)


def _graph(strands):
    """merge_blocks.rs graph_a/b/c: 3 circular paths over blocks 1,2,3;
    strands maps node id -> strand."""
    paths = {
        1: Path(1, [1, 4, 7], 80, True),
        2: Path(2, [2, 5, 8], 83, True),
        3: Path(3, [6, 3], 67, True),
    }
    pos = {1: (0, 32), 2: (10, 41), 3: (40, 5), 4: (32, 61), 5: (41, 72), 6: (5, 40), 7: (61, 0), 8: (72, 10)}
    bid_of = {1: 1, 2: 1, 3: 1, 4: 2, 5: 2, 6: 2, 7: 3, 8: 3}
    pid_of = {1: 1, 2: 2, 3: 3, 4: 1, 5: 2, 6: 3, 7: 1, 8: 2}
    nodes = {n: Node(n, bid_of[n], pid_of[n], strands[n], pos[n]) for n in pos}
    blocks = {1: _block_1(), 2: _block_2(), 3: _block_3()}
    return Pangraph(paths=paths, blocks=blocks, nodes=nodes)


GRAPH_A_STRANDS = {1: FWD, 2: FWD, 3: REV, 4: REV, 5: REV, 6: FWD, 7: FWD, 8: FWD}
GRAPH_B_STRANDS = {1: REV, 2: REV, 3: FWD, 4: FWD, 5: FWD, 6: REV, 7: FWD, 8: FWD}
GRAPH_C_STRANDS = {1: FWD, 2: FWD, 3: REV, 4: FWD, 5: FWD, 6: REV, 7: FWD, 8: FWD}


def test_block_reverse_complement_reference():
    # merge_blocks.rs test_reverse_complement_1/2
    rc1 = _block_1().reverse_complement()
    assert to_str(rc1.consensus) == "AGCGAGTAATCGATCGATCGCCGTAATATAGT"
    assert rc1.alignments[1] == Edit([Sub(28, "C")], [], [])
    assert rc1.alignments[2] == Edit([], [Del(16, 3)], [Ins(25, "TT")])
    assert rc1.alignments[3] == Edit([], [], [Ins(0, "GGG")])
    rc2 = _block_2().reverse_complement()
    assert to_str(rc2.consensus) == "CGACTCCTATGATAGGGATGATCCTAAGATC"
    assert rc2.alignments[4] == Edit([], [Del(4, 2)], [])
    assert rc2.alignments[5] == Edit([Sub(27, "A")], [], [])
    assert rc2.alignments[6] == Edit([], [Del(29, 2)], [Ins(31, "AAA")])


def test_concatenate_blocks_a_reference():
    g = _graph(GRAPH_A_STRANDS)
    edge = Edge(SimpleNode(1, FWD), SimpleNode(2, REV))
    pairings, new_nodes = find_node_pairings(g, edge)
    assert pairings == {1: 4, 4: 1, 2: 5, 5: 2, 3: 6, 6: 3}
    ids = {nid: n.id for nid, n in new_nodes.items()}
    blk = concatenate_alignments(_block_1(), _block_2().reverse_complement(), pairings, ids, 1)
    assert to_str(blk.consensus) == "ACTATATTACGGCGATCGATCGATTACTCGCTCGACTCCTATGATAGGGATGATCCTAAGATC"
    assert blk.alignments[ids[1]] == Edit([Sub(3, "G")], [Del(36, 2)], [])
    assert blk.alignments[ids[2]] == Edit([Sub(59, "A")], [Del(13, 3)], [Ins(7, "AA")])
    assert blk.alignments[ids[3]] == Edit([], [Del(61, 2)], [Ins(32, "CCC"), Ins(63, "AAA")])


def test_concatenate_blocks_b_reference():
    g = _graph(GRAPH_B_STRANDS)
    edge = Edge(SimpleNode(1, REV), SimpleNode(2, FWD))
    pairings, new_nodes = find_node_pairings(g, edge)
    ids = {nid: n.id for nid, n in new_nodes.items()}
    blk = concatenate_alignments(_block_2().reverse_complement(), _block_1(), pairings, ids, 1)
    assert to_str(blk.consensus) == "CGACTCCTATGATAGGGATGATCCTAAGATCACTATATTACGGCGATCGATCGATTACTCGCT"
    assert blk.alignments[ids[1]] == Edit([Sub(34, "G")], [Del(4, 2)], [])
    assert blk.alignments[ids[2]] == Edit([Sub(27, "A")], [Del(44, 3)], [Ins(38, "AA")])
    assert blk.alignments[ids[3]] == Edit([], [Del(29, 2)], [Ins(31, "AAA"), Ins(63, "CCC")])


def test_concatenate_blocks_c_reference():
    g = _graph(GRAPH_C_STRANDS)
    edge = Edge(SimpleNode(1, FWD), SimpleNode(2, FWD))
    pairings, new_nodes = find_node_pairings(g, edge)
    ids = {nid: n.id for nid, n in new_nodes.items()}
    blk = concatenate_alignments(_block_1(), _block_2(), pairings, ids, 1)
    assert to_str(blk.consensus) == "ACTATATTACGGCGATCGATCGATTACTCGCTGATCTTAGGATCATCCCTATCATAGGAGTCG"
    assert blk.alignments[ids[1]] == Edit([Sub(3, "G")], [Del(57, 2)], [])
    assert blk.alignments[ids[2]] == Edit([Sub(35, "T")], [Del(13, 3)], [Ins(7, "AA")])
    assert blk.alignments[ids[3]] == Edit([], [Del(32, 2)], [Ins(32, "CCCTTT")])


def test_merge_blocks_end_to_end_a():
    # merge_blocks.rs expected_graph_a: after removing the b1+ -> b2- edge
    # paths become (b1'|n1') -> (b3|n7), (b1'|n2') -> (b3|n8), (b1'|n3')
    g = _graph(GRAPH_A_STRANDS)
    merge_blocks(g, Edge(SimpleNode(1, FWD), SimpleNode(2, REV)))
    assert set(g.blocks) == {1, 3} or len(g.blocks) == 2
    assert [len(p.nodes) for p in g.paths.values()] == [2, 2, 1]
    merged_bid = g.nodes[g.paths[1].nodes[0]].block_id
    blk = g.blocks[merged_bid]
    assert to_str(blk.consensus) == "ACTATATTACGGCGATCGATCGATTACTCGCTCGACTCCTATGATAGGGATGATCCTAAGATC"
    n1p = g.nodes[g.paths[1].nodes[0]]
    n2p = g.nodes[g.paths[2].nodes[0]]
    n3p = g.nodes[g.paths[3].nodes[0]]
    assert n1p.position == (0, 61) and n1p.strand == FWD
    assert n2p.position == (10, 72) and n2p.strand == FWD
    assert n3p.position == (5, 5) and n3p.strand == REV


def _assert_merged(g, exp_consensus, exp_aln_by_old, strands, positions):
    """Shared checks for merge_blocks/remove_transitive_edges e2e cases:
    blocks 1+2 merged (block 3 untouched), per-path node strand/position,
    and the merged block's alignments keyed back through each path's first
    node (new node ids are content hashes)."""
    assert len(g.blocks) == 2
    assert [len(p.nodes) for p in g.paths.values()] == [2, 2, 1]
    merged_bid = g.nodes[g.paths[1].nodes[0]].block_id
    blk = g.blocks[merged_bid]
    assert to_str(blk.consensus) == exp_consensus
    for old, pid in ((1, 1), (2, 2), (3, 3)):
        n = g.nodes[g.paths[pid].nodes[0]]
        assert n.strand == strands[old], (old, n)
        assert n.position == positions[old], (old, n)
        assert blk.alignments[n.id] == exp_aln_by_old[old], old
    g.sanity_check()


# expected merged alignments, keyed by the ORIGINAL block-1 node (1, 2, 3)
# (merge_blocks.rs expected_concat_a/b/c)
EXP_ALN_A = {
    1: Edit([Sub(3, "G")], [Del(36, 2)], []),
    2: Edit([Sub(59, "A")], [Del(13, 3)], [Ins(7, "AA")]),
    3: Edit([], [Del(61, 2)], [Ins(32, "CCC"), Ins(63, "AAA")]),
}
EXP_ALN_B = {
    1: Edit([Sub(34, "G")], [Del(4, 2)], []),
    2: Edit([Sub(27, "A")], [Del(44, 3)], [Ins(38, "AA")]),
    3: Edit([], [Del(29, 2)], [Ins(31, "AAA"), Ins(63, "CCC")]),
}
EXP_ALN_C = {
    1: Edit([Sub(3, "G")], [Del(57, 2)], []),
    2: Edit([Sub(35, "T")], [Del(13, 3)], [Ins(7, "AA")]),
    3: Edit([], [Del(32, 2)], [Ins(32, "CCCTTT")]),
}
CONS_AB_A = "ACTATATTACGGCGATCGATCGATTACTCGCTCGACTCCTATGATAGGGATGATCCTAAGATC"
CONS_AB_B = "CGACTCCTATGATAGGGATGATCCTAAGATCACTATATTACGGCGATCGATCGATTACTCGCT"
CONS_AB_C = "ACTATATTACGGCGATCGATCGATTACTCGCTGATCTTAGGATCATCCCTATCATAGGAGTCG"
POS_ABC = {1: (0, 61), 2: (10, 72), 3: (5, 5)}


def test_find_node_pairings_b_reference():
    # merge_blocks.rs test_find_node_pairings_b: graph_a with b1+ -> b2- edge
    pairings, _ = find_node_pairings(_graph(GRAPH_A_STRANDS), Edge(SimpleNode(1, FWD), SimpleNode(2, REV)))
    assert pairings == {1: 4, 2: 5, 3: 6, 4: 1, 5: 2, 6: 3}


def test_find_node_pairings_c_reference():
    # merge_blocks.rs test_find_node_pairings_c: graph_c with b1+ -> b2+ edge
    pairings, _ = find_node_pairings(_graph(GRAPH_C_STRANDS), Edge(SimpleNode(1, FWD), SimpleNode(2, FWD)))
    assert pairings == {1: 4, 2: 5, 3: 6, 4: 1, 5: 2, 6: 3}


def test_merge_blocks_end_to_end_b():
    # merge_blocks.rs test_merge_blocks_b (graph_b, b1- -> b2+ edge)
    g = _graph(GRAPH_B_STRANDS)
    merge_blocks(g, Edge(SimpleNode(1, REV), SimpleNode(2, FWD)))
    _assert_merged(g, CONS_AB_B, EXP_ALN_B, {1: REV, 2: REV, 3: FWD}, POS_ABC)


def test_merge_blocks_end_to_end_c():
    # merge_blocks.rs test_merge_blocks_c (graph_c, b1+ -> b2+ edge)
    g = _graph(GRAPH_C_STRANDS)
    merge_blocks(g, Edge(SimpleNode(1, FWD), SimpleNode(2, FWD)))
    _assert_merged(g, CONS_AB_C, EXP_ALN_C, {1: FWD, 2: FWD, 3: REV}, POS_ABC)


def test_remove_transitive_edges_a_reference():
    # merge_blocks.rs test_remove_transitive_edges_a: the b1+ -> b2- edge is
    # found and compacted without being named explicitly
    g = _graph(GRAPH_A_STRANDS)
    remove_transitive_edges(g)
    _assert_merged(g, CONS_AB_A, EXP_ALN_A, {1: FWD, 2: FWD, 3: REV}, POS_ABC)


def test_remove_transitive_edges_b_reference():
    g = _graph(GRAPH_B_STRANDS)
    remove_transitive_edges(g)
    _assert_merged(g, CONS_AB_B, EXP_ALN_B, {1: REV, 2: REV, 3: FWD}, POS_ABC)


def test_remove_transitive_edges_c_reference():
    g = _graph(GRAPH_C_STRANDS)
    remove_transitive_edges(g)
    _assert_merged(g, CONS_AB_C, EXP_ALN_C, {1: FWD, 2: FWD, 3: REV}, POS_ABC)
