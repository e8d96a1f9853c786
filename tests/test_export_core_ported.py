"""Core-genome export tests ported from the reference's inline suite
(packages/pangraph/src/commands/export/export_core_genome.rs:162-353): the
two-path/three-block fixture with both guide strains, aligned and
unaligned, pinned to the reference's exact expected FASTA sequences
(reverse-complemented gapped alignment columns included)."""
from __future__ import annotations

import io

import pytest

from pangraph_tpu.commands import export_core_genome
from pangraph_tpu.graph.edits import Del, Edit, Ins, Sub
from pangraph_tpu.graph.graph import Block, Node, Pangraph, Path


def make_graph() -> Pangraph:
    blocks = {
        1: Block(1, "ACCTATCGTGATCGTTCGAT", {
            1: Edit(dels=[Del(9, 3)]),
            3: Edit(subs=[Sub(2, "T")]),
        }),
        2: Block(2, "CTGCAAGTCTGATCTAGTTA", {
            2: Edit(subs=[Sub(13, "G")], inss=[Ins(6, "TTT")]),
            4: Edit(dels=[Del(2, 2)]),
        }),
        3: Block(3, "AGGCTACGAT", {5: Edit()}),
    }
    nodes = {
        1: Node(1, 1, 0, "+", (0, 17)),
        2: Node(2, 2, 0, "-", (17, 40)),
        3: Node(3, 1, 1, "-", (28, 48)),
        4: Node(4, 2, 1, "+", (0, 18)),
        5: Node(5, 3, 1, "+", (18, 28)),
    }
    paths = {
        0: Path(0, [1, 2], 40, False, name="Path A"),
        1: Path(1, [4, 5, 3], 48, False, name="Path B"),
    }
    return Pangraph(paths=paths, blocks=blocks, nodes=nodes)


def run_export(guide: str, unaligned: bool) -> dict:
    buf = io.StringIO()
    export_core_genome(make_graph(), guide, buf, unaligned=unaligned)
    out = {}
    name = None
    for line in buf.getvalue().splitlines():
        if line.startswith(">"):
            name = line[1:]
            out[name] = ""
        elif name is not None:
            out[name] += line
    return out


@pytest.mark.parametrize(
    "guide,unaligned,expected",
    [
        ("Path A", False, {
            "Path A": "ACCTATCGT---CGTTCGATTAACTACATCAGACTTGCAG",
            "Path B": "ACTTATCGTGATCGTTCGATTAACTAGATCAGACTT--AG",
        }),
        ("Path A", True, {
            "Path A": "ACCTATCGTCGTTCGATTAACTACATCAGACAAATTGCAG",
            "Path B": "ACTTATCGTGATCGTTCGATTAACTAGATCAGACTTAG",
        }),
        ("Path B", False, {
            "Path A": "CTGCAAGTCTGATGTAGTTAATCGAACG---ACGATAGGT",
            "Path B": "CT--AAGTCTGATCTAGTTAATCGAACGATCACGATAAGT",
        }),
        ("Path B", True, {
            "Path A": "CTGCAATTTGTCTGATGTAGTTAATCGAACGACGATAGGT",
            "Path B": "CTAAGTCTGATCTAGTTAATCGAACGATCACGATAAGT",
        }),
    ],
    ids=["guideA_aligned", "guideA_unaligned", "guideB_aligned", "guideB_unaligned"],
)
def test_core_block_aln_general_case(guide, unaligned, expected):
    assert run_export(guide, unaligned) == expected
