"""Junction-analysis tests ported from the reference pypangraph's own pytest
suite (packages/pypangraph/tests/test_junctions_analyses.py and
test_junctions_inversion.py, with fixtures from tests/conftest.py):
positions(), sequences(), stats() on synthetic junction / linear / sequence /
inversion graphs. Our sequences() returns {isolate: str} instead of
SeqRecords; assertions are adapted to that (ids/descriptions are the dict
keys / the queried edge)."""
from __future__ import annotations

import json

import pytest

from pangraph_tpu.analysis.junctions import BackboneJunctions
from pangraph_tpu.analysis.topology import Edge, OrientedBlock
from pangraph_tpu.pypangraph import Pangraph


def _node(node_id, block_id, path_id, strand, start, end):
    return {"id": node_id, "block_id": block_id, "path_id": path_id,
            "strand": "+" if strand else "-", "position": [start, end]}


def _block(block_id, length, node_ids, consensus=None, edits=None):
    aln = {}
    for nid in node_ids:
        e = (edits or {}).get(nid) or {"subs": [], "dels": [], "inss": []}
        aln[str(nid)] = e
    return {"id": block_id, "consensus": consensus or "A" * length, "alignments": aln}


def _path(path_id, name, node_ids, tot_len, circular=True):
    return {"id": path_id, "nodes": node_ids, "tot_len": tot_len,
            "circular": circular, "name": name, "desc": None}


def _load(tmp_path, data):
    p = tmp_path / "g.json"
    p.write_text(json.dumps(data))
    return Pangraph.from_json(str(p), validate=False)


@pytest.fixture
def junction_pangraph(tmp_path):
    # conftest.py build_junction_pangraph_json: 3 circular strains, 4 core +
    # 3 accessory blocks; s3 swaps C2/C3 (rearrangement) and inverts A2
    nodes = {
        "1": _node(1, 100, 0, True, 0, 1000), "2": _node(2, 500, 0, True, 1000, 1200),
        "3": _node(3, 600, 0, True, 1200, 1350), "4": _node(4, 200, 0, True, 1350, 2150),
        "5": _node(5, 300, 0, True, 2150, 2750), "6": _node(6, 400, 0, True, 2750, 3450),
        "7": _node(7, 100, 1, True, 0, 1000), "8": _node(8, 500, 1, True, 1000, 1200),
        "9": _node(9, 200, 1, True, 1200, 2000), "10": _node(10, 700, 1, True, 2000, 2300),
        "11": _node(11, 300, 1, True, 2300, 2900), "12": _node(12, 400, 1, True, 2900, 3600),
        "13": _node(13, 100, 2, True, 0, 1000), "14": _node(14, 600, 2, False, 1000, 1150),
        "15": _node(15, 300, 2, True, 1150, 1750), "16": _node(16, 200, 2, True, 1750, 2550),
        "17": _node(17, 700, 2, True, 2550, 2850), "18": _node(18, 400, 2, True, 2850, 3550),
    }
    blocks = {
        "100": _block(100, 1000, [1, 7, 13]), "200": _block(200, 800, [4, 9, 16]),
        "300": _block(300, 600, [5, 11, 15]), "400": _block(400, 700, [6, 12, 18]),
        "500": _block(500, 200, [2, 8]), "600": _block(600, 150, [3, 14]),
        "700": _block(700, 300, [10, 17]),
    }
    paths = {
        "0": _path(0, "s1", [1, 2, 3, 4, 5, 6], 3450),
        "1": _path(1, "s2", [7, 8, 9, 10, 11, 12], 3600),
        "2": _path(2, "s3", [13, 14, 15, 16, 17, 18], 3550),
    }
    return _load(tmp_path, {"paths": paths, "blocks": blocks, "nodes": nodes})


@pytest.fixture
def linear_pangraph(tmp_path):
    # conftest.py build_linear_pangraph_json: 2 linear strains; c5 is core
    # but below the backbone threshold, at opposite terminal positions
    nodes = {
        "1": _node(1, 500, 0, True, 0, 200), "2": _node(2, 100, 0, True, 200, 1200),
        "3": _node(3, 600, 0, True, 1200, 1350), "4": _node(4, 200, 0, True, 1350, 2150),
        "5": _node(5, 300, 0, True, 2150, 2750),
        "6": _node(6, 100, 1, True, 0, 1000), "7": _node(7, 700, 1, True, 1000, 1300),
        "8": _node(8, 200, 1, True, 1300, 2100), "9": _node(9, 300, 1, True, 2100, 2700),
        "10": _node(10, 500, 1, True, 2700, 2900),
    }
    blocks = {
        "100": _block(100, 1000, [2, 6]), "200": _block(200, 800, [4, 8]),
        "300": _block(300, 600, [5, 9]), "500": _block(500, 200, [1, 10]),
        "600": _block(600, 150, [3]), "700": _block(700, 300, [7]),
    }
    paths = {
        "0": _path(0, "s1", [1, 2, 3, 4, 5], 2750, circular=False),
        "1": _path(1, "s2", [6, 7, 8, 9, 10], 2900, circular=False),
    }
    return _load(tmp_path, {"paths": paths, "blocks": blocks, "nodes": nodes})


@pytest.fixture
def sequence_pangraph(tmp_path):
    # conftest.py build_sequence_pangraph_json: the same junction traversed
    # forward in s1 and inverted in s2 (with one substitution on C1)
    nodes = {
        "1": _node(1, 10, 0, True, 0, 6), "2": _node(2, 30, 0, True, 6, 9),
        "3": _node(3, 20, 0, True, 9, 15),
        "4": _node(4, 20, 1, False, 0, 6), "5": _node(5, 40, 1, False, 6, 9),
        "6": _node(6, 10, 1, False, 9, 15),
    }
    blocks = {
        "10": _block(10, 6, [1, 6], consensus="AAACCC",
                     edits={6: {"subs": [{"pos": 0, "alt": "T"}], "dels": [], "inss": []}}),
        "20": _block(20, 6, [3, 4], consensus="GGGAAA"),
        "30": _block(30, 3, [2], consensus="TTC"),
        "40": _block(40, 3, [5], consensus="ACG"),
    }
    paths = {
        "0": _path(0, "s1", [1, 2, 3], 15),
        "1": _path(1, "s2", [4, 5, 6], 15),
    }
    return _load(tmp_path, {"paths": paths, "blocks": blocks, "nodes": nodes})


INVERSION_CONS = {
    10: "ACGTTGCAACCA", 20: "TTGGAACCGGTTAC", 30: "GATTACAGGCT",
    40: "CCAGTACGTGACATCA", 50: "ACACGTGTACGTA", 60: "TGTCATGCAATGCAT",
    70: "GGATCCGAATTCAGTCA", 80: "ACGTGA", 90: "TTCAGGCA",
}


@pytest.fixture
def inversion_pangraph(tmp_path):
    # conftest.py build_inversion_pangraph_json: s2 = whole-genome RC of s1,
    # s3 inverts the contiguous C3-C7 segment
    nodes = {
        "1": _node(1, 10, 0, True, 0, 12), "2": _node(2, 50, 0, True, 12, 25),
        "3": _node(3, 80, 0, True, 25, 31), "4": _node(4, 20, 0, True, 31, 45),
        "5": _node(5, 60, 0, True, 45, 60), "6": _node(6, 30, 0, True, 60, 71),
        "7": _node(7, 70, 0, True, 71, 88), "8": _node(8, 90, 0, False, 88, 96),
        "9": _node(9, 40, 0, True, 96, 112),
        "10": _node(10, 40, 1, False, 0, 16), "11": _node(11, 90, 1, True, 16, 24),
        "12": _node(12, 70, 1, False, 24, 41), "13": _node(13, 30, 1, False, 41, 52),
        "14": _node(14, 60, 1, False, 52, 67), "15": _node(15, 20, 1, False, 67, 81),
        "16": _node(16, 80, 1, False, 81, 87), "17": _node(17, 50, 1, False, 87, 100),
        "18": _node(18, 10, 1, False, 100, 112),
        "19": _node(19, 10, 2, True, 0, 12), "20": _node(20, 50, 2, True, 12, 25),
        "21": _node(21, 20, 2, True, 25, 39), "22": _node(22, 60, 2, True, 39, 54),
        "23": _node(23, 70, 2, False, 54, 71), "24": _node(24, 30, 2, False, 71, 82),
        "25": _node(25, 40, 2, True, 82, 98),
    }
    block_nodes = {
        10: [1, 18, 19], 20: [4, 15, 21], 30: [6, 13, 24], 40: [9, 10, 25],
        50: [2, 17, 20], 60: [5, 14, 22], 70: [7, 12, 23], 80: [3, 16], 90: [8, 11],
    }
    blocks = {
        str(bid): _block(bid, len(INVERSION_CONS[bid]), nids, consensus=INVERSION_CONS[bid])
        for bid, nids in block_nodes.items()
    }
    paths = {
        "0": _path(0, "s1", [1, 2, 3, 4, 5, 6, 7, 8, 9], 112),
        "1": _path(1, "s2", [10, 11, 12, 13, 14, 15, 16, 17, 18], 112),
        "2": _path(2, "s3", [19, 20, 21, 22, 23, 24, 25], 98),
    }
    return _load(tmp_path, {"paths": paths, "blocks": blocks, "nodes": nodes})


def _edge(a, sa, b, sb):
    return Edge(OrientedBlock(a, sa), OrientedBlock(b, sb)).to_str_id()


# --------------------------------------------------------------- positions #
def test_junction_positions_forward_strand(junction_pangraph):
    # test_junctions_analyses.py:11-33
    pos = BackboneJunctions(junction_pangraph, L_thr=500).positions()
    row = pos.loc[("100_f__200_f", "s1")]
    assert row["strand"]
    assert (row["left_start"], row["left_end"]) == (0, 1000)
    assert (row["right_start"], row["right_end"]) == (1350, 2150)
    row = pos.loc[("200_f__300_f", "s1")]
    assert row["strand"]
    assert (row["left_start"], row["left_end"]) == (1350, 2150)
    assert (row["right_start"], row["right_end"]) == (2150, 2750)


def test_junction_positions_inverted_edge(junction_pangraph):
    # test_junctions_analyses.py:36-53: left/right follow the genome's own
    # path order; strand records non-canonical traversal
    pos = BackboneJunctions(junction_pangraph, L_thr=500).positions()
    row = pos.loc[("100_r__400_r", "s1")]
    assert not row["strand"]
    assert (row["left_start"], row["left_end"]) == (2750, 3450)  # C4
    assert (row["right_start"], row["right_end"]) == (0, 1000)  # C1


def test_junction_positions_rearranged_strain(junction_pangraph):
    # test_junctions_analyses.py:56-88
    pos = BackboneJunctions(junction_pangraph, L_thr=500).positions()
    row = pos.loc[("100_f__300_f", "s3")]
    assert row["strand"]
    assert (row["left_start"], row["right_start"]) == (0, 1150)
    row = pos.loc[("200_r__300_r", "s3")]
    assert not row["strand"]
    assert (row["left_start"], row["left_end"]) == (1150, 1750)  # C3
    assert (row["right_start"], row["right_end"]) == (1750, 2550)  # C2
    row = pos.loc[("200_f__400_f", "s3")]
    assert row["strand"]
    assert (row["left_start"], row["right_start"]) == (1750, 2850)


def test_junction_positions_shape(junction_pangraph):
    # test_junctions_analyses.py:90-104
    bj = BackboneJunctions(junction_pangraph, L_thr=500)
    pos = bj.positions()
    assert len(pos) == bj.stats()["n_isolates"].sum()
    assert list(pos.columns) == ["left_start", "left_end", "right_start", "right_end", "strand"]


def test_junction_positions_linear(linear_pangraph):
    # test_junctions_analyses.py:107-133: terminal junctions have no edge
    pos = BackboneJunctions(linear_pangraph, L_thr=500).positions()
    assert set(pos.index.get_level_values("edge")) == {"100_f__200_f", "200_f__300_f"}
    row = pos.loc[("100_f__200_f", "s1")]
    assert (row["left_start"], row["left_end"]) == (200, 1200)
    assert (row["right_start"], row["right_end"]) == (1350, 2150)
    row = pos.loc[("100_f__200_f", "s2")]
    assert (row["left_start"], row["left_end"]) == (0, 1000)
    assert (row["right_start"], row["right_end"]) == (1300, 2100)


# --------------------------------------------------------------- sequences #
def test_sequences_forward_junction(sequence_pangraph):
    # test_junctions_analyses.py:155-167
    seqs = BackboneJunctions(sequence_pangraph, L_thr=4).sequences("10_f__20_f")
    assert seqs["s1"] == "AAACCCTTCGGGAAA"


def test_sequences_inverted_junction(sequence_pangraph):
    # test_junctions_analyses.py:170-183: s2's inverted junction co-orients,
    # the C1 substitution (A->T at 0) shows up
    seqs = BackboneJunctions(sequence_pangraph, L_thr=4).sequences("10_f__20_f")
    assert seqs["s2"] == "TAACCCACGGGGAAA"


def test_sequences_co_orientation(sequence_pangraph):
    # test_junctions_analyses.py:186-194
    seqs = BackboneJunctions(sequence_pangraph, L_thr=4).sequences("10_f__20_f")
    assert set(seqs) == {"s1", "s2"}
    for s in seqs.values():
        assert len(s) == 15  # 6 + 3 + 6


def test_sequences_reverse_complement_in_center(junction_pangraph):
    # test_junctions_analyses.py:207-223
    seqs = BackboneJunctions(junction_pangraph, L_thr=500).sequences("100_f__300_f")
    assert set(seqs) == {"s3"}
    s = seqs["s3"]
    assert len(s) == 1000 + 150 + 600
    assert s[:1000] == "A" * 1000
    assert s[1000:1150] == "T" * 150  # A2 reverse-complemented
    assert s[1150:] == "A" * 600


def test_sequences_empty_junction(junction_pangraph):
    # test_junctions_analyses.py:226-236
    seqs = BackboneJunctions(junction_pangraph, L_thr=500).sequences("200_f__300_f")
    assert seqs["s1"] == "A" * 1400


def test_sequences_nonexistent_edge(junction_pangraph):
    # test_junctions_analyses.py:239-242
    assert BackboneJunctions(junction_pangraph, L_thr=500).sequences("999_f__888_f") == {}


# ------------------------------------------------------------------- stats #
def test_junction_stats_values(junction_pangraph):
    # test_junctions_analyses.py:263-342
    sdf = BackboneJunctions(junction_pangraph, L_thr=500).stats()
    expected = {
        "100_r__400_r": dict(n_isolates=3, n_non_empty=0, n_categories=1,
                             n_majority_category=3, left_core_length=1000,
                             right_core_length=700, accessory_length=0),
        "100_f__200_f": dict(n_isolates=2, n_non_empty=2, n_categories=2,
                             n_majority_category=1, left_core_length=1000,
                             right_core_length=800, accessory_length=350),
        "200_f__300_f": dict(n_isolates=2, n_non_empty=1, n_categories=2,
                             n_majority_category=1, left_core_length=800,
                             right_core_length=600, accessory_length=300),
        "300_f__400_f": dict(n_isolates=2, n_non_empty=0, n_categories=1,
                             n_majority_category=2, left_core_length=600,
                             right_core_length=700, accessory_length=0),
        "100_f__300_f": dict(n_isolates=1, n_non_empty=1, n_categories=1,
                             n_majority_category=1, left_core_length=1000,
                             right_core_length=600, accessory_length=150),
        "200_f__400_f": dict(n_isolates=1, n_non_empty=1, n_categories=1,
                             n_majority_category=1, left_core_length=800,
                             right_core_length=700, accessory_length=300),
        "200_r__300_r": dict(n_isolates=1, n_non_empty=0, n_categories=1,
                             n_majority_category=1, left_core_length=800,
                             right_core_length=600, accessory_length=0),
    }
    assert set(sdf.index) == set(expected)
    for edge, vals in expected.items():
        for col, val in vals.items():
            assert sdf.loc[edge, col] == val, f"{edge}.{col}"


def test_junction_stats_transitive_and_singleton(junction_pangraph):
    # test_junctions_analyses.py:345-370
    sdf = BackboneJunctions(junction_pangraph, L_thr=500).stats()
    transitive = {"100_r__400_r", "300_f__400_f", "100_f__300_f", "200_f__400_f", "200_r__300_r"}
    for e in transitive:
        assert sdf.loc[e, "is_transitive"], e
    for e in {"100_f__200_f", "200_f__300_f"}:
        assert not sdf.loc[e, "is_transitive"], e
    singleton = {"100_f__200_f", "200_f__300_f"}
    for e in singleton:
        assert sdf.loc[e, "is_singleton"], e
    for e in set(sdf.index) - singleton:
        assert not sdf.loc[e, "is_singleton"], e


def test_junction_stats_sorted_by_n_isolates(junction_pangraph):
    # test_junctions_analyses.py:373-378
    freqs = BackboneJunctions(junction_pangraph, L_thr=500).stats()["n_isolates"].values
    assert all(freqs[i] >= freqs[i + 1] for i in range(len(freqs) - 1))


def test_junction_stats_linear(linear_pangraph):
    # test_junctions_analyses.py:381-414
    sdf = BackboneJunctions(linear_pangraph, L_thr=500).stats()
    assert set(sdf.index) == {"100_f__200_f", "200_f__300_f"}
    row = sdf.loc["100_f__200_f"]
    assert (row["n_isolates"], row["n_non_empty"], row["n_categories"]) == (2, 2, 2)
    assert row["n_majority_category"] == 1
    assert not row["is_transitive"] and row["is_singleton"]
    assert row["accessory_length"] == 150 + 300
    row = sdf.loc["200_f__300_f"]
    assert (row["n_isolates"], row["n_non_empty"], row["n_categories"]) == (2, 0, 1)
    assert row["is_transitive"] and not row["is_singleton"]
    assert row["accessory_length"] == 0


def test_backbone_stats_columns(junction_pangraph):
    # test_junctions_analyses.py:417-434
    sdf = BackboneJunctions(junction_pangraph, L_thr=500).stats()
    assert list(sdf.columns) == [
        "n_isolates", "n_non_empty", "n_categories", "n_majority_category",
        "is_transitive", "is_singleton", "left_core_length",
        "right_core_length", "accessory_length",
    ]
    assert len(sdf) == 7


# --------------------------------------------------------------- inversion #
def test_inversion_edges_rc_and_private(inversion_pangraph):
    # test_junctions_inversion.py:16-40
    bj = BackboneJunctions(inversion_pangraph, L_thr=10)
    freq = bj.stats()["n_isolates"].to_dict()
    shared = {
        _edge(10, True, 50, True), _edge(50, True, 20, True),
        _edge(20, True, 60, True), _edge(60, True, 30, True),
        _edge(30, True, 70, True), _edge(70, True, 40, True),
        _edge(40, True, 10, True),
    }
    private = {_edge(60, True, 70, False), _edge(30, False, 40, True)}
    assert set(bj.edges()) == shared | private
    assert sorted(freq.values(), reverse=True) == [3, 3, 3, 3, 3, 2, 2, 1, 1]
    assert all(freq[e] == 1 for e in private)
    assert freq[_edge(60, True, 30, True)] == 2
    assert freq[_edge(70, True, 40, True)] == 2


def test_inversion_positions_strand_mix(inversion_pangraph):
    # test_junctions_inversion.py:43-62
    pos = BackboneJunctions(inversion_pangraph, L_thr=10).positions()
    shared = set(pos.xs("s1", level="iso").index) & set(pos.xs("s2", level="iso").index)
    assert len(shared) == 7
    for edge in shared:
        assert pos.loc[(edge, "s1"), "strand"] != pos.loc[(edge, "s2"), "strand"]
    assert set(pos["strand"]) == {True, False}
    c3c7 = _edge(30, True, 70, True)
    assert pos.loc[(c3c7, "s1"), "strand"] != pos.loc[(c3c7, "s3"), "strand"]


def test_inversion_stats(inversion_pangraph):
    # test_junctions_inversion.py:65-84
    sdf = BackboneJunctions(inversion_pangraph, L_thr=10).stats()
    row = sdf.loc[_edge(50, True, 20, True)]
    assert (row["n_isolates"], row["n_categories"], row["n_majority_category"]) == (3, 2, 2)
    assert not row["is_transitive"] and row["is_singleton"]
    assert row["accessory_length"] == 6
    row = sdf.loc[_edge(70, True, 40, True)]
    assert (row["n_isolates"], row["n_categories"]) == (2, 1)
    assert row["is_transitive"]
    assert row["accessory_length"] == 8


def test_inversion_sequences_rc_equivalence(inversion_pangraph):
    # test_junctions_inversion.py:87-109
    from pangraph_tpu.graph.seq import as_seq, revcomp, to_str

    bj = BackboneJunctions(inversion_pangraph, L_thr=10)
    a1 = INVERSION_CONS[80]
    seqs = bj.sequences(_edge(50, True, 20, True))
    assert set(seqs) == {"s1", "s2", "s3"}
    assert seqs["s1"] == seqs["s2"]  # a genome equals its RC once co-oriented
    assert len(seqs["s1"]) == 13 + 6 + 14
    assert len(seqs["s3"]) == 13 + 14
    assert to_str(revcomp(as_seq(a1))) in seqs["s1"]
    assert a1 not in seqs["s1"]
    seqs2 = bj.sequences(_edge(70, True, 40, True))
    assert set(seqs2) == {"s1", "s2"}
    assert seqs2["s1"] == seqs2["s2"]


# ---------------------------------------------------------------- MSU suite #
# ported from packages/pypangraph/tests/test_msu.py (fixtures above)
from pangraph_tpu.analysis.msu import flip_msu_to_most_common_orientation, minimal_synteny_units
from pangraph_tpu.analysis.topology import Walk


def test_find_mergers_reference_groups():
    # test_msu.py:107-141: the 9-block 4-walk example collapses into exactly
    # {A,B,J}, {C,D}, {E,F,G}, {H}
    from collections import defaultdict

    from pangraph_tpu.analysis.topology import find_mergers

    def W(*names, inv=()):
        return Walk([OrientedBlock(n, n not in inv) for n in names], circular=True)

    paths = {
        1: W("A", "B", "C", "D", "E", "F", "G", "H", "J"),
        2: W("A", "B", "C", "D", "E", "F", "G", "H", "J"),
        3: W("A", "B", "D", "C", "E", "F", "G", "H", "J", inv=("D", "C")),
        4: W("A", "B", "D", "C", "E", "F", "G", "H", "J", inv=("D", "C", "H")),
    }
    mg = find_mergers(paths)
    groups = defaultdict(set)
    for src, sink in mg.items():
        groups[sink].add(src)
    sources = list(groups.values())
    assert len(sources) == 4
    assert {"A", "B", "J"} in sources
    assert {"C", "D"} in sources
    assert {"E", "F", "G"} in sources
    assert {"H"} in sources


def test_minimal_synteny_units_circular(junction_pangraph):
    # test_msu.py:164-208: only the wrap C4->C1 is universal, so C1+C4 merge
    mergers, msu_paths, msu_len = minimal_synteny_units(junction_pangraph, L_thr=500, rotate=True)
    assert msu_len == {"MSU_0": 1700, "MSU_1": 800, "MSU_2": 600}
    assert mergers == {100: "MSU_0", 400: "MSU_0", 200: "MSU_1", 300: "MSU_2"}
    exp_s1 = Walk([OrientedBlock("MSU_0", True), OrientedBlock("MSU_1", True),
                   OrientedBlock("MSU_2", True)], circular=True)
    exp_s3 = Walk([OrientedBlock("MSU_0", True), OrientedBlock("MSU_2", True),
                   OrientedBlock("MSU_1", True)], circular=True)
    assert msu_paths["s1"] == exp_s1
    assert msu_paths["s2"] == exp_s1
    assert msu_paths["s3"] == exp_s3
    assert all(p.circular for p in msu_paths.values())


def test_minimal_synteny_units_no_rotate(linear_pangraph):
    # test_msu.py:210-228: one transitive chain -> a single MSU, unrotated
    mergers, msu_paths, msu_len = minimal_synteny_units(linear_pangraph, L_thr=500, rotate=False)
    assert msu_len == {"MSU_0": 2400}
    assert mergers == {100: "MSU_0", 200: "MSU_0", 300: "MSU_0"}
    expected = Walk([OrientedBlock("MSU_0", True)], circular=False)
    assert msu_paths["s1"] == expected and msu_paths["s2"] == expected
    assert all(p.circular is False for p in msu_paths.values())


def test_minimal_synteny_units_rotate_requires_circular(linear_pangraph):
    # test_msu.py:230-233
    with pytest.raises(ValueError, match="[Oo]nly circular"):
        minimal_synteny_units(linear_pangraph, L_thr=500)


def test_minimal_synteny_units_rc_collapse(inversion_pangraph):
    # test_msu.py:236-274: a genome and its whole-RC collapse onto the same
    # canonical walk; s3's inversion survives as a flipped MSU node
    mergers, msu_paths, msu_len = minimal_synteny_units(inversion_pangraph, L_thr=10, rotate=True)
    assert msu_len == {"MSU_0": 70, "MSU_1": 28}
    assert mergers == {10: "MSU_0", 50: "MSU_0", 20: "MSU_0", 60: "MSU_0",
                       40: "MSU_0", 70: "MSU_1", 30: "MSU_1"}
    exp_ref = Walk([OrientedBlock("MSU_0", True), OrientedBlock("MSU_1", True)], circular=True)
    exp_s3 = Walk([OrientedBlock("MSU_0", True), OrientedBlock("MSU_1", False)], circular=True)
    assert msu_paths["s1"] == exp_ref
    assert msu_paths["s2"] == exp_ref
    assert msu_paths["s3"] == exp_s3
    assert all(p.circular for p in msu_paths.values())


def test_flip_msu_to_most_common_orientation():
    # test_msu.py:277-296: net-reverse blocks flip in place
    paths = {
        "a": Walk([OrientedBlock("X", False), OrientedBlock("Y", True)], circular=True),
        "b": Walk([OrientedBlock("X", False), OrientedBlock("Y", True)], circular=True),
        "c": Walk([OrientedBlock("X", True), OrientedBlock("Y", True)], circular=True),
    }
    result = flip_msu_to_most_common_orientation(paths)
    assert result is paths
    assert paths["a"].oriented_blocks[0] == OrientedBlock("X", True)
    assert paths["a"].oriented_blocks[1] == OrientedBlock("Y", True)


# ------------------------------------------------------- junctions core #
# ported from packages/pypangraph/tests/test_junctions_core.py
from pangraph_tpu.analysis.junctions import Junction, JunctionNode, path_junction_split
from pangraph_tpu.analysis.topology import pangraph_to_walks


def _is_core_fn(pan, thr=500):
    bdf = pan.to_blockstats_df()

    def is_core(bid):
        return (bdf.loc[bid, "len"] >= thr) and bdf.loc[bid, "core"]

    return is_core


def test_path_junction_split(junction_pangraph):
    # test_junctions_core.py:14-39
    walks = pangraph_to_walks(junction_pangraph)
    junctions = path_junction_split(walks["s1"], _is_core_fn(junction_pangraph))
    assert len(junctions) == 4
    edges = {j.flanking_edge().to_str_id() for j in junctions}
    assert edges == {"100_r__400_r", "100_f__200_f", "200_f__300_f", "300_f__400_f"}
    j = [x for x in junctions if x.flanking_edge().to_str_id() == "100_f__200_f"][0]
    assert len(j.center) == 2  # A1 + A2


def test_path_junction_split_rearranged(junction_pangraph):
    # test_junctions_core.py:41-54
    walks = pangraph_to_walks(junction_pangraph)
    junctions = path_junction_split(walks["s3"], _is_core_fn(junction_pangraph))
    assert len(junctions) == 4
    edges = {j.flanking_edge().to_str_id() for j in junctions}
    assert edges == {"100_r__400_r", "100_f__300_f", "200_r__300_r", "200_f__400_f"}


def test_path_junction_split_requires_two_core_blocks():
    # test_junctions_core.py:57-72
    p0 = Walk([OrientedBlock(1, True), OrientedBlock(2, True)], circular=True)
    with pytest.raises(ValueError, match="at least 2"):
        path_junction_split(p0, lambda bid: False)
    with pytest.raises(ValueError, match="at least 2"):
        path_junction_split(p0, lambda bid: bid == 1)


def test_path_junction_split_linear(linear_pangraph):
    # test_junctions_core.py:74-124: terminal junctions carry None flanks
    walks = pangraph_to_walks(linear_pangraph)
    is_core = _is_core_fn(linear_pangraph)
    j1 = path_junction_split(walks["s1"], is_core)
    assert j1[0].left is None and len(j1[0].center) == 1 and j1[0].right is not None
    assert j1[1].left is not None and j1[1].right is not None
    assert j1[-1].left is not None and j1[-1].right is None
    assert j1[0].flanking_edge() is None
    assert j1[-1].flanking_edge() is None
    assert j1[1].flanking_edge() is not None
    j2 = path_junction_split(walks["s2"], is_core)
    assert j2[0].left is None and len(j2[0].center) == 0 and j2[0].right is not None
    assert j2[-1].left is not None and len(j2[-1].center) == 1 and j2[-1].right is None


def test_junction_node_inherits_equality():
    # test_junctions_core.py:127-134
    a, b, c = JunctionNode(100, True, 1), JunctionNode(100, True, 2), JunctionNode(100, False, 1)
    assert a == b and a != c and hash(a) == hash(b)


def test_junction_node_invert():
    # test_junctions_core.py:137-144
    inv = JunctionNode(100, True, 42).invert()
    assert (inv.id, inv.strand, inv.node_id) == (100, False, 42)
    assert isinstance(inv, JunctionNode)


def test_junction_oriented_blocks():
    # test_junctions_core.py:147-168
    left, a1 = OrientedBlock(100, True), OrientedBlock(200, True)
    a2, right = OrientedBlock(300, False), OrientedBlock(400, True)
    assert Junction(left, Walk([a1, a2]), right).oriented_blocks() == [left, a1, a2, right]
    assert Junction(left, Walk([]), right).oriented_blocks() == [left, right]
    assert Junction(None, Walk([a1, a2]), right).oriented_blocks() == [a1, a2, right]
    assert Junction(left, Walk([a1, a2]), None).oriented_blocks() == [left, a1, a2]


def test_junction_invert_terminal():
    # test_junctions_core.py:171-197
    a1, a2 = OrientedBlock(200, True), OrientedBlock(300, False)
    right = JunctionNode(400, True, 42)
    no_left = Junction(None, Walk([a1, a2]), right)
    inv = no_left.invert()
    assert inv.right is None
    assert inv.left == right.invert() and inv.left.node_id == 42
    assert inv.center == Walk([a2.invert(), a1.invert()])
    assert no_left.invert().invert() == no_left
    left = JunctionNode(100, True, 7)
    rinv = Junction(left, Walk([a1, a2]), None).invert()
    assert rinv.left is None
    assert rinv.right == left.invert() and rinv.right.node_id == 7


def test_edge_is_canonical():
    # test_junctions_core.py:200-215
    e = Edge.from_str_id("100_f__200_f")
    assert e.is_canonical() and e.to_str_id() == "100_f__200_f"
    inv = e.invert()
    assert not inv.is_canonical()
    assert inv.to_str_id() == "100_f__200_f"
    palindrome = Edge(OrientedBlock(100, True), OrientedBlock(100, False))
    assert palindrome.is_canonical()


def test_str_id_roundtrip_underscore_ids():
    # test_junctions_core.py:218-225: strand suffix peels from the right
    ob = OrientedBlock("MSU_0", True)
    assert OrientedBlock.from_str_id(ob.to_str_id()) == ob
    e = Edge(OrientedBlock("MSU_0", True), OrientedBlock("MSU_12", False))
    assert Edge.from_str_id(e.to_str_id()) == e


def test_junction_is_canonical(junction_pangraph):
    # test_junctions_core.py:228-238
    bj = BackboneJunctions(junction_pangraph, L_thr=500)
    assert bj["100_f__200_f"]["s1"].is_canonical()
    assert not bj["200_r__300_r"]["s3"].is_canonical()


def test_junction_to_canonical(junction_pangraph):
    # test_junctions_core.py:241-255
    bj = BackboneJunctions(junction_pangraph, L_thr=500)
    j_canon = bj["100_f__200_f"]["s1"]
    assert j_canon.to_canonical() is j_canon
    j_inv = bj["200_r__300_r"]["s3"]
    j_out = j_inv.to_canonical()
    assert j_out is not j_inv
    assert j_out.is_canonical()
    assert j_out == j_inv.invert()


def test_junction_canonical_terminal_raises():
    # test_junctions_core.py:258-276
    center = Walk([OrientedBlock(200, True)])
    no_left = Junction(None, center, OrientedBlock(400, True))
    with pytest.raises(ValueError, match="[Tt]erminal"):
        no_left.is_canonical()
    with pytest.raises(ValueError, match="[Tt]erminal"):
        no_left.to_canonical()
    no_right = Junction(OrientedBlock(100, True), center, None)
    with pytest.raises(ValueError, match="[Tt]erminal"):
        no_right.is_canonical()
    with pytest.raises(ValueError, match="[Tt]erminal"):
        no_right.to_canonical()


def test_junctions_edge_freq(junction_pangraph):
    # test_junctions_core.py:279-297
    edge_freq = BackboneJunctions(junction_pangraph, L_thr=500).stats()["n_isolates"]
    assert edge_freq["100_r__400_r"] == 3
    for e in ("100_f__200_f", "200_f__300_f", "300_f__400_f"):
        assert edge_freq[e] == 2
    for e in ("100_f__300_f", "200_f__400_f", "200_r__300_r"):
        assert edge_freq[e] == 1
    counts = edge_freq.values
    assert all(counts[i] >= counts[i + 1] for i in range(len(counts) - 1))


def test_backbone_getitem(junction_pangraph):
    # test_junctions_core.py:300-314
    bj = BackboneJunctions(junction_pangraph, L_thr=500)
    per_iso = bj["100_f__200_f"]
    assert set(per_iso) == {"s1", "s2"}
    j = per_iso["s1"]
    assert j.flanking_edge().to_str_id() == "100_f__200_f"
    assert len(j.center) == 2
    assert "100_f__200_f" in bj
    assert "nonexistent_edge" not in bj
    with pytest.raises(KeyError):
        _ = bj["nonexistent_edge"]


def test_backbone_edges(junction_pangraph):
    # test_junctions_core.py:317-330
    bj = BackboneJunctions(junction_pangraph, L_thr=500)
    assert set(bj.edges()) == {
        "100_r__400_r", "100_f__200_f", "200_f__300_f", "300_f__400_f",
        "100_f__300_f", "200_f__400_f", "200_r__300_r",
    }


# ----------------------------------------------------------- export suite #
# ported from packages/pypangraph/tests/test_export.py (the plasmid smoke
# test is covered by test_analysis.py's junction_context_gfa on built graphs)
import math
import re

from pangraph_tpu.analysis.export import GFA
from pangraph_tpu.analysis.junctions_gfa import junction_context_gfa

ACCESSORY_RE = re.compile(r"^J\d+__\d+$")
DOMINANT_EDGES = {"100_f__200_f", "200_f__300_f", "300_f__400_f", "100_r__400_r"}


def test_gfa_write_minimal(tmp_path):
    # test_export.py:23-38
    out = tmp_path / "tiny.gfa"
    GFA({"a": 100, "b": 50}, {("a", True, "b", False)}, {"a": 3}).write(str(out))
    lines = out.read_text().splitlines()
    assert lines[0] == "H\tVN:Z:1.0"
    s_lines = {ln.split("\t")[1]: ln for ln in lines if ln.startswith("S")}
    assert "LN:i:100" in s_lines["a"] and "DP:f:3" in s_lines["a"]
    assert "LN:i:50" in s_lines["b"] and "DP:f:" not in s_lines["b"]
    (link,) = [ln for ln in lines if ln.startswith("L")]
    assert link == "L\ta\t+\tb\t-\t0M"


def _segment_lengths(gfa_path):
    lengths = {}
    for ln in gfa_path.read_text().splitlines():
        if ln.startswith("S"):
            fields = ln.split("\t")
            (tag,) = [f for f in fields if f.startswith("LN:i:")]
            lengths[fields[1]] = int(tag[5:])
    return lengths


def test_gfa_write_length_transform(tmp_path):
    # test_export.py:52-73
    gfa = GFA({"a": 100, "b": 1000, "c": 5}, set(), {})
    out = tmp_path / "scaled.gfa"
    gfa.write(str(out), length_transform=lambda length: length / 10)
    assert _segment_lengths(out) == {"a": 10, "b": 100, "c": 1}
    out_log = tmp_path / "log.gfa"
    gfa.write(str(out_log), length_transform=lambda length: 100 * math.log(length))
    assert _segment_lengths(out_log) == {
        name: max(1, round(100 * math.log(length))) for name, length in gfa.segments.items()
    }
    out_real = tmp_path / "real.gfa"
    gfa.write(str(out_real))
    assert _segment_lengths(out_real) == {"a": 100, "b": 1000, "c": 5}


def test_consensus_gfa_structure(junction_pangraph):
    # test_export.py:76-105
    bj = BackboneJunctions(junction_pangraph, L_thr=500)
    segments, links, depths, prefix_map = junction_context_gfa(bj, scaffold="consensus")
    core_ids = {"100", "200", "300", "400"}
    assert core_ids <= set(segments)
    for name in segments:
        if name not in core_ids:
            assert ACCESSORY_RE.match(name), name
    for a, _, b, _ in links:
        assert a in segments and b in segments
    for cid in core_ids:
        assert depths[cid] == 3
    a1 = next(n for n in segments if n.endswith("__500"))
    assert depths[a1] == 2
    for edge_str in prefix_map.values():
        assert edge_str in bj


def test_all_scaffold_is_superset_of_consensus(junction_pangraph):
    # test_export.py:108-118
    bj = BackboneJunctions(junction_pangraph, L_thr=500)
    _, links_c, _, pmap_c = junction_context_gfa(bj, scaffold="consensus")
    _, links_a, _, pmap_a = junction_context_gfa(bj, scaffold="all")
    assert set(pmap_c.values()) < set(pmap_a.values())
    assert len(links_a) >= len(links_c)


def test_consensus_scaffold_follows_dominant_synteny(junction_pangraph):
    # test_export.py:120-125
    bj = BackboneJunctions(junction_pangraph, L_thr=500)
    _, _, _, prefix_map = junction_context_gfa(bj, scaffold="consensus")
    assert set(prefix_map.values()) == DOMINANT_EDGES


def test_reference_scaffold_uses_that_genomes_edges(junction_pangraph):
    # test_export.py:127-134
    bj = BackboneJunctions(junction_pangraph, L_thr=500)
    _, _, _, prefix_map = junction_context_gfa(bj, scaffold="s3")
    edges = set(prefix_map.values())
    assert edges != DOMINANT_EDGES
    assert "100_f__300_f" in edges


def test_unknown_scaffold_raises(junction_pangraph):
    # test_export.py:137-141
    bj = BackboneJunctions(junction_pangraph, L_thr=500)
    with pytest.raises(ValueError, match="unknown scaffold"):
        junction_context_gfa(bj, scaffold="not_a_genome")


@pytest.fixture
def tandem_accessory_pangraph(tmp_path):
    # conftest.py build_tandem_accessory_pangraph_json
    nodes = {
        "1": _node(1, 100, 0, True, 0, 1000), "2": _node(2, 500, 0, True, 1000, 1200),
        "3": _node(3, 500, 0, True, 1200, 1400), "4": _node(4, 200, 0, True, 1400, 2200),
        "5": _node(5, 100, 1, True, 0, 1000), "6": _node(6, 500, 1, True, 1000, 1200),
        "7": _node(7, 200, 1, True, 1200, 2000),
    }
    blocks = {
        "100": _block(100, 1000, [1, 5]), "200": _block(200, 800, [4, 7]),
        "500": _block(500, 200, [2, 3, 6]),
    }
    paths = {
        "0": _path(0, "s1", [1, 2, 3, 4], 2200),
        "1": _path(1, "s2", [5, 6, 7], 2000),
    }
    return _load(tmp_path, {"paths": paths, "blocks": blocks, "nodes": nodes})


def test_accessory_depth_counts_repeats_on_same_path(tandem_accessory_pangraph):
    # test_export.py:144-152: the tandem duplicate counts each traversal
    bj = BackboneJunctions(tandem_accessory_pangraph, L_thr=500)
    segments, _, depths, _ = junction_context_gfa(bj, scaffold="all")
    a = next(n for n in segments if n.endswith("__500"))
    assert depths[a] == 3


# -------------------------------------------------------------- plots suite #
def test_linear_junction_plot_smoke(junction_pangraph):
    # test_plots.py:11-17: the plot renders end-to-end on the fixture
    matplotlib = pytest.importorskip("matplotlib")
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from pangraph_tpu.analysis.plots import linear_junction_plot

    bj = BackboneJunctions(junction_pangraph, L_thr=500)
    edge = next(iter(bj.edges()))
    fig, ax = plt.subplots()
    linear_junction_plot(bj, edge, ax=ax)
    plt.close(fig)


def test_block_dotplot_smoke(junction_pangraph):
    # plots/dotplot.py smoke on the fixture's two forward strains
    matplotlib = pytest.importorskip("matplotlib")
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from pangraph_tpu.analysis.plots import block_dotplot

    fig, ax = plt.subplots()
    block_dotplot(junction_pangraph, "s1", "s2", ax=ax)
    plt.close(fig)
