"""Reconsensus tests ported from the reference's inline suite
(packages/pangraph/src/reconsensus/reconsensus.rs:147-560): the 4-block
fixture family, majority-edit extraction, mutations-only vs realignment
classification, consensus rewrite + realign, and the detach edge case
(a node left unaligned by the new consensus becomes a reverse-complemented
singleton block)."""
from __future__ import annotations

import numpy as np
import pytest

from pangraph_tpu.align.params import BuildArgs
from pangraph_tpu.build.reconsensus import edit_consensus_and_realign, reconsensus_graph
from pangraph_tpu.graph.edits import Del, Edit, Ins, Sub
from pangraph_tpu.graph.graph import Block, Node, Pangraph, Path
from pangraph_tpu.graph.seq import revcomp, to_str


def s(p, a):
    return Sub(p, a)


def d(p, n):
    return Del(p, n)


def i(p, q):
    return Ins(p, q)


# transcribe fixtures exactly (reconsensus.rs:147-305)
def make_block_0() -> Block:
    return Block(
        0,
        "ATGCGATCGATCGA",
        {
            1: Edit(subs=[s(1, "C")]),
            2: Edit(subs=[s(1, "C")]),
            3: Edit(subs=[s(1, "C")]),
            4: Edit(subs=[s(10, "G")]),
            5: Edit(subs=[s(10, "G")]),
        },
    )


def make_block_0_reconsensus() -> Block:
    return Block(
        0,
        "ACGCGATCGATCGA",
        {
            1: Edit(),
            2: Edit(),
            3: Edit(),
            4: Edit(subs=[s(1, "T"), s(10, "G")]),
            5: Edit(subs=[s(1, "T"), s(10, "G")]),
        },
    )


def make_block_1() -> Block:
    return Block(
        1,
        "AGGACTTCGATCTATTCGGAGAA",
        {
            1: Edit(inss=[i(17, "TTTT")], dels=[d(5, 2)], subs=[s(1, "T"), s(17, "A")]),
            2: Edit(dels=[d(5, 2)], subs=[s(1, "T"), s(10, "C")]),
            3: Edit(dels=[d(5, 2), d(16, 2)], subs=[s(1, "T"), s(10, "C")]),
            4: Edit(dels=[d(9, 3)], subs=[s(1, "C"), s(17, "A")]),
            5: Edit(inss=[i(5, "AA")], dels=[d(5, 2)], subs=[s(17, "A")]),
        },
    )


def make_block_1_mut_reconsensus() -> Block:
    return Block(
        1,
        "ATGACTTCGATCTATTCAGAGAA",
        {
            1: Edit(inss=[i(17, "TTTT")], dels=[d(5, 2)]),
            2: Edit(dels=[d(5, 2)], subs=[s(10, "C"), s(17, "G")]),
            3: Edit(dels=[d(5, 2), d(16, 2)], subs=[s(10, "C")]),
            4: Edit(dels=[d(9, 3)], subs=[s(1, "C")]),
            5: Edit(inss=[i(5, "AA")], dels=[d(5, 2)], subs=[s(1, "G")]),
        },
    )


def make_block_2() -> Block:
    return Block(
        2,
        "AGGACTTCGATCTATTCGGAGAA",
        {
            1: Edit(inss=[i(0, "G"), i(3, "AA"), i(13, "AA")], dels=[d(5, 2), d(20, 1)],
                    subs=[s(1, "T"), s(17, "A")]),
            2: Edit(inss=[i(0, "G"), i(13, "AA"), i(23, "TT")], dels=[d(5, 2), d(20, 2)],
                    subs=[s(1, "T"), s(10, "C")]),
            3: Edit(inss=[i(23, "TT")], dels=[d(4, 4)], subs=[s(1, "T"), s(10, "C")]),
            4: Edit(inss=[i(3, "C"), i(23, "TT")], dels=[d(9, 3)], subs=[s(1, "C"), s(17, "A")]),
            5: Edit(inss=[i(0, "G"), i(3, "C"), i(13, "AA")], dels=[d(19, 2)], subs=[s(17, "A")]),
        },
    )


def make_block_3() -> Block:
    return Block(
        3,
        "GCCTCTTCCCGACCACGCGTTACAACATGGGACAGGCCTGCGCTTGAGGC",
        {
            1: Edit(dels=[d(19, 4)], subs=[s(5, "A")]),
            2: Edit(inss=[i(35, "AA"), i(50, "TT")], dels=[d(20, 3)], subs=[s(5, "A")]),
            3: Edit(subs=[s(14, "G"), s(27, "G")]),
            4: Edit(inss=[i(50, "TT")], dels=[d(20, 3)], subs=[s(5, "A")]),
            5: Edit(inss=[i(50, "TT")]),
        },
    )


def test_analyze_block_reconsensus():
    # reconsensus.rs:309-329 — block 0 is mutations-only; 1-3 need realignment
    blocks = {0: make_block_0(), 1: make_block_1(), 2: make_block_2(), 3: make_block_3()}
    muts, realn = [], []
    for bid in (0, 1, 2, 3):
        maj = blocks[bid].find_majority_edits()
        if maj.has_indels():
            realn.append(bid)
        elif maj.has_subs():
            muts.append(bid)
    assert muts == [0]
    assert realn == [1, 2, 3]


def test_find_majority_edits_block0():
    # reconsensus.rs:332
    assert make_block_0().find_majority_edits() == Edit(subs=[s(1, "C")])


def test_find_majority_edits_block1():
    # reconsensus.rs:339
    assert make_block_1().find_majority_edits() == Edit(
        dels=[d(5, 2)], subs=[s(1, "T"), s(17, "A")]
    )


def test_find_majority_edits_block2():
    # reconsensus.rs:346
    assert make_block_2().find_majority_edits() == Edit(
        inss=[i(0, "G"), i(13, "AA"), i(23, "TT")],
        dels=[d(5, 2), d(20, 1)],
        subs=[s(1, "T"), s(17, "A")],
    )


def test_find_majority_edits_block3():
    # reconsensus.rs:357
    assert make_block_3().find_majority_edits() == Edit(
        inss=[i(50, "TT")], dels=[d(20, 3)], subs=[s(5, "A")]
    )


def test_apply_edits():
    # reconsensus.rs:364
    e = Edit(
        inss=[i(0, "G"), i(13, "AA"), i(23, "TT")], dels=[d(5, 2), d(20, 1)]
    )
    from pangraph_tpu.graph.seq import as_seq

    assert to_str(e.apply(as_seq("AGGACTTCGATCTATTCGGAGAA"))) == "GAGGACCGATCTAAATTCGGAAATT"


def test_mutations_only_reconsensus_block0():
    # reconsensus.rs:374
    b = make_block_0()
    maj = b.find_majority_edits()
    assert not maj.has_indels()
    b.apply_majority_substitutions(maj.subs)
    exp = make_block_0_reconsensus()
    assert to_str(b.consensus) == to_str(exp.consensus)
    assert b.alignments == exp.alignments


def test_mutations_only_reconsensus_block1():
    # reconsensus.rs:388
    b = make_block_1()
    maj = b.find_majority_edits()
    b.apply_majority_substitutions(maj.subs)
    exp = make_block_1_mut_reconsensus()
    assert to_str(b.consensus) == to_str(exp.consensus)
    assert b.alignments == exp.alignments


def _realign_and_check(block: Block, expected_consensus: str):
    """edit_consensus_and_realign preserves every node's reconstructed
    sequence (the exactness oracle — edit representation may legitimately
    differ between aligners; reconsensus.rs:401-431 asserts its own
    aligner's representation) and yields the expected NEW consensus."""
    before = {nid: to_str(e.apply(block.consensus)) for nid, e in block.alignments.items()}
    maj = block.find_majority_edits()
    assert maj.has_indels()
    out = edit_consensus_and_realign(block, maj, BuildArgs())
    assert to_str(out.consensus) == expected_consensus
    after = {nid: to_str(e.apply(out.consensus)) for nid, e in out.alignments.items()}
    assert after == before
    for e in out.alignments.values():
        e.sanity_check(out.consensus_len())
    return out


def test_realign_reconsensus_block1():
    # reconsensus.rs:401 — expected consensus from block_1_reconsensus()
    _realign_and_check(make_block_1(), "ATGACCGATCTATTCAGAGAA")


def test_realign_reconsensus_block3():
    # reconsensus.rs:417 — expected consensus from block_3_reconsensus()
    _realign_and_check(make_block_3(), "GCCTCATCCCGACCACGCGTAACATGGGACAGGCCTGCGCTTGAGGCTT")


def test_reconsensus_graph_full():
    # reconsensus.rs:434 reconsensus_test — the whole-graph driver on a
    # single-block graph must produce the realigned block in place
    block = make_block_1()
    before = {nid: to_str(e.apply(block.consensus)) for nid, e in block.alignments.items()}
    nodes = {n: Node(n, 1, n, "+", (0, 23)) for n in range(1, 6)}
    paths = {n: Path(n, [n], 23, False) for n in range(1, 6)}
    g = Pangraph(paths=paths, blocks={1: block}, nodes=nodes)
    reconsensus_graph(g, [1], BuildArgs())
    out = g.blocks[1]
    assert to_str(out.consensus) == "ATGACCGATCTATTCAGAGAA"
    after = {nid: to_str(e.apply(out.consensus)) for nid, e in out.alignments.items()}
    assert after == before


def test_edge_case_reconsensus_graph():
    # reconsensus.rs:503 — a node left unaligned by the majority deletion is
    # detached into a singleton block, reverse-complemented for a '-' node
    cons = "GCCTCTTCCCGACCACGCGTTACAACATGGGACAGGCCTGCGCTTGAGGC"
    block = Block(
        20,
        cons,
        {
            1: Edit(dels=[d(0, 40)]),
            2: Edit(dels=[d(35, 15)]),
            3: Edit(dels=[d(35, 15)]),
            4: Edit(dels=[d(35, 15)]),
            5: Edit(),
        },
    )
    nodes = {
        1: Node(1, 20, 1, "-", (0, 10)),
        2: Node(2, 20, 2, "+", (0, 35)),
        3: Node(3, 20, 3, "+", (0, 35)),
        4: Node(4, 20, 4, "+", (0, 35)),
        5: Node(5, 20, 5, "+", (0, 49)),
    }
    paths = {n: Path(n, [n], nodes[n].position[1], False) for n in range(1, 6)}
    g = Pangraph(paths=paths, blocks={20: block}, nodes=nodes)
    reconsensus_graph(g, [20], BuildArgs())
    # the majority deletion (35..50) is folded into the consensus
    main = g.blocks[20]
    assert to_str(main.consensus) == "GCCTCTTCCCGACCACGCGTTACAACATGGGACAG"
    # nodes 2-4: the deletion became consensus -> no edits left
    assert main.alignments[2] == Edit()
    assert main.alignments[3] == Edit()
    assert main.alignments[4] == Edit()
    # node 5 keeps the deleted chars as an insertion at the new end
    assert main.alignments[5] == Edit(inss=[i(35, "GCCTGCGCTTGAGGC")])
    # node 1 was detached into a reverse-complemented singleton block
    assert 1 not in main.alignments
    n1 = g.nodes[1]
    assert n1.block_id != 20
    singleton = g.blocks.get(n1.block_id)
    assert singleton is not None, "detached block must be re-attached to the graph"
    assert to_str(singleton.consensus) == "GCCTCAAGCG"  # revcomp of CGCTTGAGGC
    assert singleton.alignments == {1: Edit()}
