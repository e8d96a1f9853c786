"""Ported reference GFA writer tests with EXACT expected text
(io/gfa.rs:288-295 test_gfa_empty, :297-467 test_gfa_general_case):
header, S-lines with sequences + RC/LN tags, canonically oriented sorted
L-lines with RC edge counts, P-lines with TP:Z:circular."""
from __future__ import annotations

import io
import json
import textwrap

from pangraph_tpu.graph.graph import Pangraph
from pangraph_tpu.io.gfa import GfaParams, gfa_lines


def _gfa_text(graph, params=None):
    return "".join(line + "\n" for line in gfa_lines(graph, params))


def test_gfa_empty():
    # io/gfa.rs:288-295
    g = Pangraph(paths={}, blocks={}, nodes={})
    assert _gfa_text(g) == "H\tVN:Z:1.0\n"


GENERAL_GRAPH = {
    "paths": {
        "0": {"id": 0, "nodes": [1, 2, 3], "tot_len": 50, "circular": True, "name": "Path A"},
        "1": {"id": 1, "nodes": [4, 5, 6, 7], "tot_len": 60, "circular": True, "name": "Path B"},
    },
    "blocks": {
        "1": {"id": 1, "consensus": "ACCTATCGTGATCGTTCGAT",
              "alignments": {"1": {"subs": [], "dels": [], "inss": []},
                             "4": {"subs": [], "dels": [], "inss": []}}},
        "2": {"id": 2, "consensus": "CTGCAAGTCTGATCTAGTTA",
              "alignments": {"2": {"subs": [], "dels": [], "inss": []},
                             "6": {"subs": [], "dels": [], "inss": []}}},
        "3": {"id": 3, "consensus": "AGGCTACGAT",
              "alignments": {"3": {"subs": [], "dels": [], "inss": []},
                             "5": {"subs": [], "dels": [], "inss": []}}},
        "4": {"id": 4, "consensus": "CTTCAGCAAG",
              "alignments": {"7": {"subs": [], "dels": [], "inss": []}}},
    },
    "nodes": {
        "1": {"id": 1, "block_id": 1, "path_id": 0, "strand": "+", "position": [0, 0]},
        "2": {"id": 2, "block_id": 2, "path_id": 0, "strand": "-", "position": [0, 0]},
        "3": {"id": 3, "block_id": 3, "path_id": 0, "strand": "+", "position": [0, 0]},
        "4": {"id": 4, "block_id": 2, "path_id": 1, "strand": "+", "position": [0, 0]},
        "5": {"id": 5, "block_id": 1, "path_id": 1, "strand": "-", "position": [0, 0]},
        "6": {"id": 6, "block_id": 3, "path_id": 1, "strand": "+", "position": [0, 0]},
        "7": {"id": 7, "block_id": 4, "path_id": 1, "strand": "+", "position": [0, 0]},
    },
}


def test_gfa_general_case():
    # io/gfa.rs:297-467 — exact expected text, byte for byte
    g = Pangraph.from_json_dict(GENERAL_GRAPH)
    actual = _gfa_text(g, GfaParams(include_sequences=True))
    expected = textwrap.dedent("""\
        H\tVN:Z:1.0
        # blocks
        S\t1\tACCTATCGTGATCGTTCGAT\tRC:i:40\tLN:i:20
        S\t2\tCTGCAAGTCTGATCTAGTTA\tRC:i:40\tLN:i:20
        S\t3\tAGGCTACGAT\tRC:i:20\tLN:i:10
        S\t4\tCTTCAGCAAG\tRC:i:10\tLN:i:10
        # edges
        L\t1\t+\t2\t-\t*\tRC:i:2
        L\t1\t-\t3\t+\t*\tRC:i:1
        L\t1\t-\t3\t-\t*\tRC:i:1
        L\t2\t-\t3\t+\t*\tRC:i:1
        L\t2\t-\t4\t-\t*\tRC:i:1
        L\t3\t+\t4\t+\t*\tRC:i:1
        # paths
        P\tPath A\t1+,2-,3+\t*\tTP:Z:circular
        P\tPath B\t2+,1-,3+,4+\t*\tTP:Z:circular
        """)
    assert actual == expected
