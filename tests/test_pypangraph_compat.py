"""Drop-in compatibility: the REFERENCE pypangraph library must load and
analyze a graph produced by this framework unmodified (SURVEY.md §2.3 — the
cheap win: if the JSON schema matches, pypangraph runs as-is).

Gated on the reference checkout; Bio(python) is stubbed because only the
to_biopython_* conversion paths touch it."""
from __future__ import annotations

import sys
import types

import numpy as np
import pytest

REF_PYPANGRAPH = "/root/reference/packages/pypangraph"

pytestmark = pytest.mark.skipif(
    not __import__("os").path.isdir(REF_PYPANGRAPH), reason="reference checkout unavailable"
)


def _install_bio_stub():
    if "Bio" in sys.modules:
        return
    bio = types.ModuleType("Bio")
    seq_mod = types.ModuleType("Bio.Seq")
    seqrec_mod = types.ModuleType("Bio.SeqRecord")
    align_mod = types.ModuleType("Bio.Align")
    alignio_mod = types.ModuleType("Bio.AlignIO")

    class Seq(str):
        pass

    class SeqRecord:
        def __init__(self, seq, id="", description=""):
            self.seq, self.id, self.description = seq, id, description

    class MultipleSeqAlignment(list):
        def __init__(self, records):
            super().__init__(records)

    seq_mod.Seq = Seq
    seqrec_mod.SeqRecord = SeqRecord
    align_mod.MultipleSeqAlignment = MultipleSeqAlignment
    alignio_mod.MultipleSeqAlignment = MultipleSeqAlignment
    bio.Seq, bio.SeqRecord, bio.Align, bio.AlignIO = seq_mod, seqrec_mod, align_mod, alignio_mod
    sys.modules["Bio"] = bio
    sys.modules["Bio.Seq"] = seq_mod
    sys.modules["Bio.SeqRecord"] = seqrec_mod
    sys.modules["Bio.Align"] = align_mod
    sys.modules["Bio.AlignIO"] = alignio_mod


@pytest.fixture(scope="module")
def built_graph(tmp_path_factory):
    from pangraph_tpu.align.params import BuildArgs
    from pangraph_tpu.build.build import build
    from pangraph_tpu.io.fasta import read_fasta

    records = read_fasta("/root/reference/data/russian_doll_plasmids.fa.gz")
    graph = build(records, BuildArgs(circular=True, jobs=1))
    path = tmp_path_factory.mktemp("compat") / "graph.json"
    graph.to_file(str(path))
    return str(path), records, graph


def _load_reference_pypangraph(path):
    _install_bio_stub()
    if REF_PYPANGRAPH not in sys.path:
        sys.path.insert(0, REF_PYPANGRAPH)
    import pypangraph as ref_ppg

    return ref_ppg.Pangraph.from_json(path)


def test_reference_pypangraph_loads_and_analyzes(built_graph):
    path, records, ours = built_graph
    g = _load_reference_pypangraph(path)
    assert sorted(g.strains()) == sorted(r.seq_name for r in records)
    df = g.to_blockstats_df()
    assert len(df) == len(ours.blocks)
    assert set(df.columns) == {"count", "n_strains", "duplicated", "core", "len"}
    pd = g.to_path_dictionary()
    assert {k: len(v) for k, v in pd.items()} == {
        p.name: len(p.nodes) for p in ours.paths.values()
    }


def test_facade_every_symbol(built_graph, tmp_path):
    """Our pypangraph facade: import and CALL every symbol the reference's
    pypangraph/__init__.py exports (VERDICT r4 item 8) — Pangraph (+ its
    analysis methods), PangraphLoadError, minimal_synteny_units, dotplot,
    junctions, export.GFA, export.junction_context_gfa."""
    path, records, ours = built_graph
    from pangraph_tpu import pypangraph as ppg

    assert set(ppg.__all__) == {
        "Pangraph", "PangraphLoadError", "minimal_synteny_units",
        "dotplot", "junctions", "export",
    }
    # Pangraph.from_json + load error
    g = ppg.Pangraph.from_json(path)
    with pytest.raises(ppg.PangraphLoadError):
        ppg.Pangraph.from_json("not-a-json.txt")
    assert sorted(g.strains()) == sorted(r.seq_name for r in records)
    assert len(g.to_blockstats_df()) == len(ours.blocks)
    assert len(g.to_blockcount_df()) == len(ours.blocks)
    assert set(g.to_path_dictionary()) == {p.name for p in ours.paths.values()}
    acc = g.pairwise_accessory_genome_comparison()
    assert len(acc) >= 1
    aln = g.core_genome_alignment()
    assert set(aln) == set(g.strains())
    # minimal_synteny_units
    _mergers, msu_paths, _msu_len = ppg.minimal_synteny_units(g, 100)
    assert len(msu_paths) == len(records)
    # dotplot (matplotlib optional)
    try:
        import matplotlib  # noqa: F401

        s0, s1 = sorted(g.strains())[:2]
        ppg.dotplot(g, s0, s1)
    except ImportError:
        pass
    # junctions module
    bj = ppg.junctions.BackboneJunctions(g, L_thr=100)
    assert bj.stats() is not None
    # export: junction-context GFA + the plain GFA container
    segments, links, depths, _prefixes = ppg.export.junction_context_gfa(bj)
    gfa = ppg.export.GFA(segments, links, depths=depths)
    out = tmp_path / "export.gfa"
    gfa.write(str(out))
    text = out.read_text()
    assert text.startswith("H\tVN:Z:1.0")
    assert sum(1 for l in text.splitlines() if l.startswith("S\t")) == len(segments)
    # write-time length transform clamps to >= 1
    out2 = tmp_path / "export_log.gfa"
    gfa.write(str(out2), length_transform=lambda l: 0.001 * l)
    for line in out2.read_text().splitlines():
        if line.startswith("S\t"):
            ln = int([t for t in line.split("\t") if t.startswith("LN:i:")][0][5:])
            assert ln >= 1


def test_reference_edit_application_reconstructs_blocks(built_graph):
    """The reference's own Sub/Ins/Del apply code must regenerate the exact
    node sequences from our consensus + edits (edit semantics parity)."""
    path, records, ours = built_graph
    g = _load_reference_pypangraph(path)
    by_name = {r.seq_name: r.seq for r in records}
    checked = 0
    for bid in list(g.blocks.keys()):
        blk = g.blocks[bid]
        seqs = blk.to_sequences()
        for node_id, seq in seqs.items():
            node = ours.nodes[int(node_id)]
            our_path = ours.paths[node.path_id]
            full = by_name[our_path.name]
            s, e = node.position
            L = len(full)
            want = full[s:e] if s <= e else np.concatenate([full[s:], full[:e]])
            want = bytes(want).decode()
            if node.strand == "-":
                comp = str.maketrans("ACGTRYSWKMBDHVN", "TGCAYRSWMKVHDBN")
                want = want.translate(comp)[::-1]
            assert seq == want, f"block {bid} node {node_id}"
            checked += 1
    assert checked >= len(ours.nodes)