"""The reference's end-to-end reweave fixture (reweave.rs:873-1139): a
3-path / 5-block graph with 4 accepted alignments, thr_len=90. Checks new
node positions/strands, block routing, and all four merge promises including
the extension-updated CIGARs."""
import numpy as np
import pytest

from pangraph_tpu.align.alignment import Alignment, Hit
from pangraph_tpu.align.cigar import cigar_str, parse_cigar
from pangraph_tpu.build.reweave import reweave
from pangraph_tpu.graph.edits import Del, Edit, Ins, Sub
from pangraph_tpu.graph.graph import Block, Node, Pangraph, Path


def i(pos, length, ch):
    return Ins(pos, ch * length)


def d(pos, length):
    return Del(pos, length)


def s(pos, alt):
    return Sub(pos, alt)


def _rand_seq(n, rng):
    return np.frombuffer(b"ACGT", dtype=np.uint8)[rng.integers(0, 4, n)]


def generate_example():
    nodes = {
        1: Node(1, 10, 100, "+", (700, 885)),
        2: Node(2, 30, 100, "+", (885, 988)),
        3: Node(3, 30, 200, "-", (100, 180)),
        4: Node(4, 20, 200, "-", (180, 555)),
        5: Node(5, 10, 200, "-", (555, 735)),
        6: Node(6, 40, 300, "+", (600, 100)),
        7: Node(7, 50, 300, "+", (100, 325)),
        8: Node(8, 50, 300, "-", (325, 580)),
    }
    paths = {
        100: Path(100, [1, 2], 1000, True),
        200: Path(200, [3, 4, 5], 1000, True),
        300: Path(300, [6, 7, 8], 1000, True),
    }
    ed = {
        1: Edit([s(125, "G")], [d(50, 25)], [i(150, 10, "T")]),
        2: Edit([], [], [i(50, 3, "G")]),
        3: Edit([], [d(50, 25)], [i(25, 5, "G")]),
        4: Edit([s(50, "G"), s(225, "T")], [d(100, 25), d(350, 10)], [i(250, 5, "A"), i(300, 5, "A")]),
        5: Edit([s(25, "T")], [d(100, 25)], [i(200, 5, "A")]),
        6: Edit([s(100, "T")], [d(350, 10)], [i(200, 10, "T")]),
        7: Edit([s(50, "G")], [d(100, 25)], []),
        8: Edit([], [], [i(150, 5, "T")]),
    }
    rng = np.random.default_rng(0)
    bseq = {10: _rand_seq(200, rng), 20: _rand_seq(400, rng), 30: _rand_seq(100, rng),
            40: _rand_seq(500, rng), 50: _rand_seq(250, rng)}

    def b(bid, nids):
        return Block(bid, bseq[bid], {nid: ed[nid] for nid in nids})

    blocks = {10: b(10, [1, 5]), 20: b(20, [4]), 30: b(30, [2, 3]), 40: b(40, [6]), 50: b(50, [7, 8])}
    graph = Pangraph(paths=paths, blocks=blocks, nodes=nodes)

    def h(name, length, start, stop):
        return Hit.new(name, length, (start, stop))

    def a(qry, reff, strand, cigar):
        return Alignment(qry=qry, reff=reff, matches=0, length=0, quality=0,
                         orientation=strand, cigar=parse_cigar(cigar))

    M = [
        a(h(10, 200, 10, 200), h(40, 500, 10, 200), "+", "10I170M10D10M"),
        a(h(20, 400, 0, 200), h(40, 500, 300, 500), "-", "200M"),
        a(h(20, 400, 300, 400), h(50, 250, 0, 100), "+", "100M"),
        a(h(30, 100, 0, 100), h(50, 250, 150, 250), "+", "80M10I10M10D"),
    ]
    return graph, M


def test_reweave_reference_e2e():
    G, M = generate_example()
    O_blocks = {bid: b.consensus.copy() for bid, b in G.blocks.items()}
    O_positions = {nid: n.position for nid, n in G.nodes.items()}

    G, P = reweave(M, G, 90)

    p1, p2, p3 = G.paths[100], G.paths[200], G.paths[300]
    assert len(p1.nodes) == 2
    assert len(p2.nodes) == 5
    assert len(p3.nodes) == 7
    n100 = [G.nodes[n] for n in p1.nodes]
    n200 = [G.nodes[n] for n in p2.nodes]
    n300 = [G.nodes[n] for n in p3.nodes]

    # node positions (reweave.rs:1036-1053)
    assert n100[0].position == O_positions[1]
    assert n100[1].position == O_positions[2]
    assert n200[0].position == O_positions[3]
    assert n200[1].position == (180, 275)
    assert n200[2].position == (275, 380)
    assert n200[3].position == (380, 555)
    assert n200[4].position == O_positions[5]
    assert [n.position for n in n300] == [
        (600, 800), (800, 910), (910, 100), (100, 225), (225, 325), (325, 430), (430, 580),
    ]

    # node strands (reweave.rs:1055-1070)
    assert [n.strand for n in n100] == ["+", "+"]
    assert [n.strand for n in n200] == ["-", "-", "-", "+", "-"]
    assert [n.strand for n in n300] == ["+", "+", "+", "+", "+", "-", "-"]

    # block identity (reweave.rs:1072-1092)
    bid10_1 = n100[0].block_id
    assert n200[4].block_id == bid10_1
    assert bid10_1 not in G.blocks  # still pending in a merge promise
    assert any(p.anchor_block.id == bid10_1 for p in P)

    bid20_2 = n200[2].block_id
    assert bid20_2 in G.blocks
    assert not any(p.anchor_block.id == bid20_2 or p.append_block.id == bid20_2 for p in P)
    ed20_2 = G.blocks[bid20_2].alignments[n200[2].id]
    assert ed20_2 == Edit([s(25, "T")], [], [i(50, 5, "A")])

    bid20_1 = n200[0].block_id
    for n in (n100[1], n300[4], n300[5]):
        assert n.block_id == bid20_1

    # merge promises (reweave.rs:1094-1136)
    assert len(P) == 4
    p_dict = {p.anchor_block.id: p for p in P}

    pr1 = p_dict[bid10_1]
    assert pr1.orientation == "+"
    assert np.array_equal(pr1.anchor_block.consensus, O_blocks[10])
    assert np.array_equal(pr1.append_block.consensus, O_blocks[40][0:200])
    assert pr1.append_block.id == n300[0].block_id
    assert cigar_str(pr1.cigar) == "10I20D170M10I10M"

    bid40_3 = n300[2].block_id
    pr2 = p_dict[bid40_3]
    assert pr2.orientation == "-"
    assert np.array_equal(pr2.anchor_block.consensus, O_blocks[40][300:500])
    assert pr2.append_block.id == n200[3].block_id
    assert np.array_equal(pr2.append_block.consensus, O_blocks[20][0:200])
    assert cigar_str(pr2.cigar) == "200M"

    bid50_1 = n200[1].block_id
    pr3 = p_dict[bid50_1]
    assert pr3.orientation == "+"
    assert pr3.anchor_block.id == n300[3].block_id
    assert np.array_equal(pr3.anchor_block.consensus, O_blocks[50][0:150])
    assert pr3.append_block.id == n200[1].block_id
    assert np.array_equal(pr3.append_block.consensus, O_blocks[20][300:400])
    assert cigar_str(pr3.cigar) == "100M50D"

    bid50_2 = n100[1].block_id
    pr4 = p_dict[bid50_2]
    assert pr4.orientation == "+"
    assert pr4.anchor_block.id == bid50_2
    assert np.array_equal(pr4.anchor_block.consensus, O_blocks[50][150:250])
    assert pr4.append_block.id == n300[4].block_id
    assert np.array_equal(pr4.append_block.consensus, O_blocks[30][0:100])
    assert cigar_str(pr4.cigar) == "80M10I10M10D"
