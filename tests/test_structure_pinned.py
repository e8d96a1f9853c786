"""Pinned graph structure on russian_doll_plasmids (VERDICT r3 item 8).

The reference binary is not runnable in this environment, so direct
build-vs-build graph comparison is impossible here. This fixture pins OUR
block-boundary/length/depth statistics on the one real bundled dataset as a
checked-in artifact (tests/fixtures/russian_doll_structure.json), so that

1. any future environment with a runnable reference binary can diff our
   structure against a reference build of the same input directly, and
2. any change to the merge trajectory on real data fails loudly here
   (the reference pins exact expected structures the same way,
   packages/pangraph/tests/itest_export_gfa.rs:17-24).

Regenerate the fixture (after an INTENTIONAL trajectory change) by deleting
it and re-running this test with PANGRAPH_TPU_REGEN_FIXTURES=1.
"""
from __future__ import annotations

import json
import os
import pathlib

from pangraph_tpu.align.params import BuildArgs
from pangraph_tpu.build.build import build, verify_roundtrip
from pangraph_tpu.io.fasta import read_fasta

FIXTURE = pathlib.Path(__file__).parent / "fixtures" / "russian_doll_structure.json"
RUSSIAN_DOLL = "/root/reference/data/russian_doll_plasmids.fa.gz"


def _structure(graph) -> dict:
    blocks = sorted((b.consensus_len(), len(b.alignments)) for b in graph.blocks.values())
    paths = {}
    for p in graph.paths.values():
        nodes = [graph.nodes[n] for n in p.nodes]
        paths[p.name] = {
            "n_nodes": len(nodes),
            "tot_len": p.tot_len,
            "boundaries": sorted(int(n.position[0]) for n in nodes),
        }
    return {
        "n_blocks": len(blocks),
        "blocks_len_depth": [[int(a), int(b)] for a, b in blocks],
        "paths": dict(sorted(paths.items())),
    }


def test_russian_doll_structure_pinned():
    records = read_fasta(RUSSIAN_DOLL)
    graph = build(records, BuildArgs(circular=True, jobs=2))
    verify_roundtrip(graph, records)
    got = _structure(graph)
    if os.environ.get("PANGRAPH_TPU_REGEN_FIXTURES") and not FIXTURE.exists():
        FIXTURE.write_text(json.dumps(got, indent=1, sort_keys=True))
    want = json.loads(FIXTURE.read_text())
    assert got == want, "russian_doll graph structure drifted from the pinned fixture"
