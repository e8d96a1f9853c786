"""pypangraph tests ported against the reference's REAL plasmids fixture
(packages/pypangraph/tests/test_graph.py, test_block.py, test_alignments.py
over tests/data/plasmids.json — a graph produced by the reference binary on
15 real plasmids). Exact pinned values: block/core/duplication counts,
block-count totals, core-alignment length, pairwise accessory comparisons.
Block ids here are Python ints (arbitrary precision — the reference stores
them as strings to avoid pandas float64 coercion of u64 hashes, which
Python ints don't suffer from)."""
from __future__ import annotations

import os

import numpy as np
import pytest

from pangraph_tpu.graph.edits import Del, Edit, Ins, Sub
from pangraph_tpu.graph.graph import Block
from pangraph_tpu.graph.seq import to_str
from pangraph_tpu.pypangraph import Pangraph, PangraphLoadError

DATA = "/root/reference/packages/pypangraph/tests/data"

pytestmark = pytest.mark.skipif(not os.path.isdir(DATA), reason="reference checkout unavailable")


@pytest.fixture(scope="module")
def graph():
    return Pangraph.from_json(os.path.join(DATA, "plasmids.json"))


def test_load_graph(graph):
    # test_graph.py:5-8
    assert graph is not None


def test_load_graph_gz():
    # test_graph.py:17-20
    pan = Pangraph.from_json(os.path.join(DATA, "plasmids.json.gz"))
    assert len(pan.strains()) == 15


def test_load_graph_invalid_extension(tmp_path):
    # test_graph.py:23-28
    fname = tmp_path / "plasmids.txt"
    fname.write_text("{}")
    with pytest.raises(PangraphLoadError, match=r"\.json or \.json\.gz"):
        Pangraph.from_json(str(fname))


def test_load_graph_invalid_json(tmp_path):
    # test_graph.py:31-36
    fname = tmp_path / "broken.json"
    fname.write_text("{this is not valid json}")
    with pytest.raises(PangraphLoadError):
        Pangraph.from_json(str(fname))


def test_load_graph_invalid_schema(tmp_path):
    # test_graph.py:39-44
    fname = tmp_path / "invalid.json"
    fname.write_text("{}")
    with pytest.raises(PangraphLoadError):
        Pangraph.from_json(str(fname))


def test_paths(graph):
    # test_graph.py:47-51
    path = graph.path_by_name("RCS48_p1")
    assert len(path.nodes) == 60
    assert path.tot_len == 80596


def test_get_strains(graph):
    # test_graph.py:54-56
    assert len(graph.strains()) == 15


def test_blockstats_df(graph):
    # test_graph.py:59-63
    df = graph.to_blockstats_df()
    assert df.shape[0] == 137
    assert df["core"].sum() == 27
    assert df["duplicated"].sum() == 10


def test_blockcount_df(graph):
    # test_graph.py:86-90
    df = graph.to_blockcount_df()
    assert df.shape == (137, 15)
    assert df.sum().sum() == 1042


def test_node_to_block(graph):
    # test_graph.py:93-104 (nodes_to_blocks): node -> owning block lookup
    node = graph.graph.nodes[8533989107945450583]
    assert node.block_id == 14710008249239879492
    assert node.strand == "+"
    path = graph.path_by_name("RCS49_p1")
    blocks = [graph.graph.nodes[nid].block_id for nid in path.nodes]
    assert len(blocks) == len(path.nodes)
    assert all(b in graph.graph.blocks for b in blocks)


def test_core_genome_alignment(graph):
    # test_graph.py:107-110 (+ test_block.py:66-70): 15 rows x 64989 columns
    aln = graph.core_genome_alignment()
    assert len(aln) == 15
    assert {len(s) for s in aln.values()} == {64989}


def test_core_genome_alignment_invalid_guide_strain(graph):
    # test_graph.py:113-116
    with pytest.raises(ValueError, match="not found"):
        graph.core_genome_alignment(guide_strain="does_not_exist")


def test_pairwise_accessory_genome_comparisons(graph):
    # test_graph.py:119-126
    ddf = graph.pairwise_accessory_genome_comparison()
    assert ddf.shape == (225, 2)
    assert ddf.loc[("RCS48_p1", "RCS48_p1"), "diff"] == 0
    assert ddf.loc[("RCS48_p1", "RCS48_p1"), "shared"] == 79580
    assert ddf.loc[("RCS48_p1", "RCS49_p1"), "diff"] == 689
    assert ddf.loc[("RCS48_p1", "RCS49_p1"), "shared"] == 79249


# ---------------------------------------------------- block/alignment suite #
def make_alignment_block() -> Block:
    # test_alignments.py:12-26 fixture: consensus + three edited nodes
    return Block(
        42,
        "ACTCTACCCGCTACTGGCAC",
        {
            1: Edit(subs=[Sub(1, "G")], dels=[Del(8, 3)]),
            2: Edit(subs=[Sub(15, "A")], inss=[Ins(20, "AAA")]),
            3: Edit(inss=[Ins(3, "GG")], dels=[Del(10, 2)]),
        },
    )


def test_reconstruct_sequences():
    # test_alignments.py:28-33 / test_block.py:40-45
    b = make_alignment_block()
    seqs = {nid: to_str(e.apply(b.consensus)) for nid, e in b.alignments.items()}
    assert seqs[1] == "AGTCTACCTACTGGCAC"
    assert seqs[2] == "ACTCTACCCGCTACTAGCACAAA"
    assert seqs[3] == "ACTGGCTACCCGACTGGCAC"


def test_reconstruct_alignment():
    # test_alignments.py:35-40 / test_block.py:47-52: gapped rows (insertions
    # stripped, deletions as '-') all at consensus length
    b = make_alignment_block()
    aln = {nid: to_str(e.apply_aligned(b.consensus)) for nid, e in b.alignments.items()}
    assert aln[1] == "AGTCTACC---TACTGGCAC"
    assert aln[2] == "ACTCTACCCGCTACTAGCAC"
    assert aln[3] == "ACTCTACCCG--ACTGGCAC"


def test_block_stats():
    # test_block.py:34-38
    b = make_alignment_block()
    assert b.consensus_len() == 20
    assert b.depth() == 3
    assert to_str(b.consensus) == "ACTCTACCCGCTACTGGCAC"


def test_get_alignment_real_graph(graph):
    # test_block.py:54-64 adapted: every block's gapped alignment rows equal
    # the consensus length
    checked = 0
    for bid, block in list(graph.graph.blocks.items())[:10]:
        L = block.consensus_len()
        for e in block.alignments.values():
            assert len(e.apply_aligned(block.consensus)) == L
            checked += 1
    assert checked > 0


def test_get_sequences_real_graph(graph):
    # test_alignments.py:49-53 adapted: a core block reconstructs one
    # sequence per strain
    bdf = graph.to_blockstats_df()
    core_bid = bdf[(bdf["core"])].index[0]
    seqs = graph.block_sequences(int(core_bid))
    assert len(seqs) == 15
