"""Simplify tests ported from the reference's inline suite
(packages/pangraph/src/commands/simplify/simplify_run.rs:40-217):
remove_path with exact expected graph content, and simplify (path removal +
transitive re-compaction) merging blocks a+b into one while block c stays
separate because its two traversals disagree in orientation."""
from __future__ import annotations

import pytest

from pangraph_tpu.commands import simplify
from pangraph_tpu.graph.edits import Del, Edit, Ins, Sub
from pangraph_tpu.graph.graph import Block, Node, Pangraph, Path
from pangraph_tpu.graph.seq import to_str

CONS_A = "ACTATATTACGGCGATCGATCGATTACTCGCT"
CONS_B = "CATGCTACGCTACGCATTATCGATCGCATCGA"
CONS_C = "ACGTGTACTAGTACTGC"


def make_graph() -> Pangraph:
    blocks = {
        1: Block(1, CONS_A, {
            1: Edit(subs=[Sub(3, "G")]),
            2: Edit(inss=[Ins(7, "AA")], dels=[Del(13, 3)]),
            3: Edit(inss=[Ins(32, "CCC")]),
        }),
        2: Block(2, CONS_B, {
            4: Edit(subs=[Sub(10, "G")]),
            5: Edit(dels=[Del(13, 3)]),
            6: Edit(inss=[Ins(32, "AAA")]),
        }),
        3: Block(3, CONS_C, {
            7: Edit(),
            8: Edit(subs=[Sub(12, "C")]),
        }),
    }
    nodes = {
        1: Node(1, 1, 1, "+", (0, 32)),
        2: Node(2, 1, 2, "+", (0, 31)),
        3: Node(3, 1, 3, "+", (0, 35)),
        4: Node(4, 2, 1, "+", (32, 64)),
        5: Node(5, 2, 2, "+", (31, 60)),
        6: Node(6, 2, 3, "+", (35, 0)),
        7: Node(7, 3, 1, "+", (64, 0)),
        8: Node(8, 3, 2, "-", (60, 0)),
    }
    paths = {
        1: Path(1, [1, 4, 7], 81, True, name="pathA"),
        2: Path(2, [2, 5, 8], 77, True, name="pathB"),
        3: Path(3, [3, 6], 70, True, name="pathC"),
    }
    return Pangraph(paths=paths, blocks=blocks, nodes=nodes)


def test_remove_path_reference():
    # simplify_run.rs:170-206 test_remove_path: exact expected content
    g = make_graph()
    g.remove_path(1)
    assert set(g.paths) == {2, 3}
    assert g.paths[2].nodes == [2, 5, 8]
    assert g.paths[3].nodes == [3, 6]
    assert set(g.nodes) == {2, 3, 5, 6, 8}
    assert set(g.blocks) == {1, 2, 3}
    assert g.blocks[1].alignments == {
        2: Edit(inss=[Ins(7, "AA")], dels=[Del(13, 3)]),
        3: Edit(inss=[Ins(32, "CCC")]),
    }
    assert g.blocks[2].alignments == {
        5: Edit(dels=[Del(13, 3)]),
        6: Edit(inss=[Ins(32, "AAA")]),
    }
    assert g.blocks[3].alignments == {8: Edit(subs=[Sub(12, "C")])}


def test_simplify_reference():
    # simplify_run.rs:208-216 test_simplify: keep pathA+pathB, then the a->b
    # edge (present identically in both survivors) compacts into one block
    # ab; block c survives separately (its traversals disagree in
    # orientation: n7 forward, n8 reverse). Node ids here are content
    # hashes, so assertions are structural, mirroring the reference's exact
    # expected blocks/paths.
    g = make_graph()
    simplify(g, ["pathA", "pathB"])
    assert {p.name for p in g.paths.values()} == {"pathA", "pathB"}
    assert len(g.blocks) == 2
    by_len = sorted(g.blocks.values(), key=lambda b: b.consensus_len())
    blk_c, blk_ab = by_len
    assert to_str(blk_c.consensus) == CONS_C
    assert to_str(blk_ab.consensus) == CONS_A + CONS_B
    # pathA's merged node: subs at 3 and 32+10; node spans (0, 64)
    pa = g.paths[g.path_id_by_name("pathA")]
    pb = g.paths[g.path_id_by_name("pathB")]
    assert len(pa.nodes) == 2 and len(pb.nodes) == 2
    na = g.nodes[pa.nodes[0]]
    nb = g.nodes[pb.nodes[0]]
    assert na.block_id == blk_ab.id and nb.block_id == blk_ab.id
    assert na.strand == "+" and na.position == (0, 64)
    assert nb.strand == "+" and nb.position == (0, 60)
    assert blk_ab.alignments[na.id] == Edit(subs=[Sub(3, "G"), Sub(42, "G")])
    assert blk_ab.alignments[nb.id] == Edit(
        inss=[Ins(7, "AA")], dels=[Del(13, 3), Del(45, 3)]
    )
    # block c keeps its original nodes and orientations
    assert g.nodes[pa.nodes[1]].strand == "+"
    assert g.nodes[pb.nodes[1]].strand == "-"
    assert blk_c.alignments == {7: Edit(), 8: Edit(subs=[Sub(12, "C")])}
    g.sanity_check()
