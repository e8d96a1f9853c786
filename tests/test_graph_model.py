"""Graph container tests: JSON round-trip on the reference fixture
data/test_graph.json, sanity checks, reconstruct, core blocks."""
import json

import numpy as np

from pangraph_tpu.graph.edits import Del, Edit, Ins, Sub
from pangraph_tpu.graph.graph import Block, Node, Pangraph, Path, graph_join, reconstruct
from pangraph_tpu.graph.seq import as_seq, to_str


def test_load_reference_fixture(test_graph_path):
    g = Pangraph.from_file(test_graph_path)
    assert len(g.blocks) == 14
    assert len(g.nodes) == 37
    assert len(g.paths) == 4
    g.sanity_check()


def test_json_roundtrip(test_graph_path):
    g = Pangraph.from_file(test_graph_path)
    g2 = Pangraph.from_json(g.to_json())
    assert g.to_json_dict() == g2.to_json_dict()


def test_json_preserves_reference_content(test_graph_path):
    ours = Pangraph.from_file(test_graph_path).to_json_dict()
    theirs = json.load(open(test_graph_path))
    # identical path/block/node key sets and per-object content
    assert set(ours["paths"]) == set(theirs["paths"])
    assert set(ours["blocks"]) == set(theirs["blocks"])
    assert set(ours["nodes"]) == set(theirs["nodes"])
    for k, b in theirs["blocks"].items():
        assert ours["blocks"][k]["consensus"] == b["consensus"]
        assert set(ours["blocks"][k]["alignments"]) == set(b["alignments"])
    for k, n in theirs["nodes"].items():
        assert ours["nodes"][k]["position"] == list(n["position"])
        assert ours["nodes"][k]["strand"] == n["strand"]


def test_reconstruct_consistency(test_graph_path):
    g = Pangraph.from_file(test_graph_path)
    for name, desc, seq in reconstruct(g):
        pid = g.path_id_by_name(name)
        assert len(seq) == g.paths[pid].tot_len


def test_singleton_roundtrip():
    seq = "ACGTACGTTTGACGATCAGT"
    g = Pangraph.singleton("s1", seq, index=7, circular=False)
    g.sanity_check()
    recs = list(reconstruct(g))
    assert recs[0][0] == "s1"
    assert to_str(recs[0][2]) == seq


def test_singleton_circular():
    g = Pangraph.singleton("c1", "ACGTAC", index=0, circular=True)
    g.sanity_check()
    node = next(iter(g.nodes.values()))
    assert node.position == (0, 0)
    assert to_str(list(reconstruct(g))[0][2]) == "ACGTAC"


def test_graph_join_disjoint():
    a = Pangraph.singleton("a", "ACGT", index=0, circular=False)
    b = Pangraph.singleton("b", "TTTT", index=1, circular=False)
    g = graph_join(a, b)
    assert len(g.paths) == 2 and len(g.blocks) == 2


def test_core_block_ids():
    # 2 paths sharing block 1; block 2 only in path 0
    b1 = Block(1, as_seq("ACGT"), {10: Edit(), 11: Edit()})
    b2 = Block(2, as_seq("TTAA"), {12: Edit()})
    nodes = {
        10: Node(10, 1, 0, "+", (0, 4)),
        11: Node(11, 1, 1, "+", (0, 4)),
        12: Node(12, 2, 0, "+", (4, 8)),
    }
    paths = {0: Path(0, [10, 12], 8, False), 1: Path(1, [11], 4, False)}
    g = Pangraph(paths, {1: b1, 2: b2}, nodes)
    assert g.core_block_ids() == [1]


def test_majority_edits():
    # reconsensus.rs:147-160 test: 3/5 subs at pos 1 majority, 2/5 at pos 10 not
    aln = {
        1: Edit(subs=[Sub(1, "C")]),
        2: Edit(subs=[Sub(1, "C")]),
        3: Edit(subs=[Sub(1, "C")]),
        4: Edit(subs=[Sub(10, "G")]),
        5: Edit(subs=[Sub(10, "G")]),
    }
    b = Block(0, as_seq("ATGCGATCGATCGA"), aln)
    maj = b.find_majority_edits()
    assert maj.subs == [Sub(1, "C")]
    assert not maj.dels and not maj.inss


def test_change_consensus_nucleotide():
    aln = {
        1: Edit(subs=[Sub(1, "C")]),
        2: Edit(subs=[Sub(1, "C")]),
        3: Edit(subs=[Sub(1, "C")]),
        4: Edit(subs=[Sub(10, "G")]),
        5: Edit(subs=[Sub(10, "G")]),
    }
    b = Block(0, as_seq("ATGCGATCGATCGA"), aln)
    b.change_consensus_nucleotide_at_pos(Sub(1, "C"))
    assert to_str(b.consensus) == "ACGCGATCGATCGA"
    assert b.alignments[1].subs == []
    assert b.alignments[4].subs == [Sub(1, "T"), Sub(10, "G")]


def test_block_reverse_complement():
    b = Block(0, as_seq("ACGTACGT"), {1: Edit(subs=[Sub(1, "G")], dels=[Del(4, 2)], inss=[Ins(3, "TT")])})
    rc = b.reverse_complement()
    from pangraph_tpu.graph.seq import revcomp

    # sequence reconstruction must commute with reverse complement
    orig = b.alignments[1].apply(b.consensus)
    rec = rc.alignments[1].apply(rc.consensus)
    assert to_str(rec) == to_str(revcomp(orig))


def test_update_splice():
    g = Pangraph.singleton("s", "AAAACCCCGGGG", index=0, circular=False)
    from pangraph_tpu.graph.graph import GraphUpdate

    old_nid = next(iter(g.nodes))
    b1 = Block(100, as_seq("AAAACCCC"), {})
    b2 = Block(101, as_seq("GGGG"), {})
    n1 = Node.create(100, 0, "+", (0, 8))
    n2 = Node.create(101, 0, "+", (8, 12))
    b1.alignments[n1.id] = Edit()
    b2.alignments[n2.id] = Edit()
    u = GraphUpdate(b_old_id=0, b_new=[b1, b2], n_new={old_nid: [n1, n2]})
    g.update(u)
    g.sanity_check()
    assert to_str(list(reconstruct(g))[0][2]) == "AAAACCCCGGGG"


def test_remove_path():
    a = Pangraph.singleton("a", "ACGT", index=0, circular=False)
    b = Pangraph.singleton("b", "TTTT", index=1, circular=False)
    g = graph_join(a, b)
    g.remove_path(0)
    g.sanity_check()
    assert list(g.paths) == [1]
    assert len(g.blocks) == 1


def test_find_majority_deletions_event_sweep_matches_dense():
    """The O(K log K) endpoint sweep == the dense per-position coverage scan
    on randomized deletion sets (incl. overlapping and block-end runs)."""
    import numpy as np

    from pangraph_tpu.graph.edits import Del, Edit

    rng = np.random.default_rng(5)
    for trial in range(60):
        L = int(rng.integers(10, 300))
        depth = int(rng.integers(1, 9))
        aln = {}
        for nid in range(depth):
            dels, at = [], 0
            while at < L and rng.random() < 0.7:
                p = at + int(rng.integers(0, max(1, L // 3)))
                ln = int(rng.integers(1, 12))
                if p >= L:
                    break
                dels.append(Del(p, min(ln, L - p) if rng.random() < 0.8 else ln))
                at = p + dels[-1].len + 1
            aln[nid] = Edit(dels=dels)
        block = Block(0, np.full(L, ord("A"), np.uint8), aln)
        got = block.find_majority_deletions()

        cov = np.zeros(L, np.int64)
        for e in aln.values():
            for d in e.dels:
                cov[d.pos : min(d.end, L)] += 1
        maj = cov > depth // 2
        want = []
        i = 0
        while i < L:
            if maj[i]:
                j = i
                while j < L and maj[j]:
                    j += 1
                want.append(Del(i, j - i))
                i = j
            else:
                i += 1
        assert got == want, (trial, got, want)


def test_graph_update_reference():
    # pangraph.rs:314-411 test_graph_update: splice block 2's nodes out of
    # every path, replacing each with its two new nodes in path order
    from pangraph_tpu.graph.graph import GraphUpdate

    def nd(nid, bid, pid, strand="+"):
        return Node(nid, bid, pid, strand, (0, 0))

    nodes = {
        1: nd(1, 1, 1), 2: nd(2, 1, 3), 3: nd(3, 2, 1), 4: nd(4, 2, 2),
        5: nd(5, 2, 3, "-"), 6: nd(6, 3, 1), 7: nd(7, 3, 2), 8: nd(8, 3, 3),
    }
    blocks = {
        1: Block(1, "A", {1: Edit(), 2: Edit()}),
        2: Block(2, "C", {3: Edit(), 4: Edit(), 5: Edit()}),
        3: Block(3, "G", {6: Edit(), 7: Edit(), 8: Edit()}),
    }
    paths = {
        1: Path(1, [1, 3, 6], 0, False),
        2: Path(2, [4, 7], 0, False),
        3: Path(3, [2, 5, 8], 0, False),
    }
    g = Pangraph(paths=paths, blocks=blocks, nodes=nodes)
    new_nodes = {
        9: nd(9, 4, 1), 10: nd(10, 5, 1, "-"), 11: nd(11, 4, 2),
        12: nd(12, 5, 2, "-"), 13: nd(13, 4, 3, "-"), 14: nd(14, 5, 3),
    }
    new_blocks = [Block(4, "T", {}), Block(5, "AA", {})]
    u = GraphUpdate(
        b_old_id=2,
        b_new=new_blocks,
        n_new={
            3: [new_nodes[9], new_nodes[10]],
            4: [new_nodes[11], new_nodes[12]],
            5: [new_nodes[14], new_nodes[13]],
        },
    )
    g.update(u)
    assert set(g.blocks) == {1, 3, 4, 5}
    assert g.paths[1].nodes == [1, 9, 10, 6]
    assert g.paths[2].nodes == [11, 12, 7]
    assert g.paths[3].nodes == [2, 14, 13, 8]
    assert set(g.nodes) == {1, 2, 6, 7, 8, 9, 10, 11, 12, 13, 14}


def test_newick_name_reference():
    # pangraph.rs:437-455 test_newick_no_graph / test_newick_name cases
    def with_names(names):
        paths = {
            i: Path(i, [], 0, False, name=n) for i, n in enumerate(names)
        }
        return Pangraph(paths=paths, blocks={}, nodes={})

    assert with_names(["isolate_A"]).newick_name() == "isolate_A"
    assert with_names([None]).newick_name() is None
    assert with_names(["a", "b", "c"]).newick_name() == "a|b|c"
    assert with_names(["a", None, "c"]).newick_name() == "a|c"
