"""CLI + export integration tests against the reference fixture
data/test_graph.json (mirrors packages/pangraph/tests/itest_export_*.rs)."""
import json
import os

import pytest

from pangraph_tpu.cli import main as cli_main
from pangraph_tpu.commands import export_schema
from pangraph_tpu.graph.graph import Pangraph
from pangraph_tpu.io.fasta import read_fasta


def run_cli(args):
    return cli_main([str(a) for a in args])


def test_export_gfa(test_graph_path, tmp_path):
    out = tmp_path / "g.gfa"
    assert run_cli(["export", "gfa", test_graph_path, "-o", out]) == 0
    lines = out.read_text().splitlines()
    assert lines[0] == "H\tVN:Z:1.0"
    g = Pangraph.from_file(test_graph_path)
    s_lines = [l for l in lines if l.startswith("S\t")]
    p_lines = [l for l in lines if l.startswith("P\t")]
    assert len(s_lines) == len(g.blocks)
    assert len(p_lines) == len(g.paths)
    # path names present
    names = {l.split("\t")[1] for l in p_lines}
    assert names == {p.name for p in g.paths.values()}


def test_export_gfa_filters(test_graph_path, tmp_path):
    out = tmp_path / "g.gfa"
    assert run_cli(["export", "gfa", test_graph_path, "-o", out, "--minimum-length", "2000"]) == 0
    g = Pangraph.from_file(test_graph_path)
    expected = sum(1 for b in g.blocks.values() if b.consensus_len() >= 2000)
    s_lines = [l for l in out.read_text().splitlines() if l.startswith("S\t")]
    assert len(s_lines) == expected


@pytest.mark.parametrize(
    "min_length,min_depth,duplicated,n_expected",
    [(1000, 2, True, 8), (1000, 2, False, 7), (None, None, True, 14), (None, None, False, 13)],
)
def test_export_gfa_segment_counts_exact(test_graph_path, tmp_path, min_length, min_depth, duplicated, n_expected):
    """The reference's exact expected segment counts on test_graph.json
    (itest_export_gfa.rs:17-24)."""
    out = tmp_path / "g.gfa"
    cmd = ["export", "gfa", test_graph_path, "-o", out]
    if min_length is not None:
        cmd += ["--minimum-length", min_length]
    if min_depth is not None:
        cmd += ["--minimum-depth", min_depth]
    if not duplicated:
        cmd += ["--no-duplicated"]
    assert run_cli(cmd) == 0
    s_lines = [l for l in out.read_text().splitlines() if l.startswith("S\t")]
    assert len(s_lines) == n_expected


def test_export_block_consensus(test_graph_path, tmp_path):
    out = tmp_path / "cons.fa"
    assert run_cli(["export", "block-consensus", test_graph_path, "-o", out]) == 0
    recs = read_fasta(out)
    g = Pangraph.from_file(test_graph_path)
    assert {r.seq_name for r in recs} == {str(b) for b in g.blocks}
    # exact sequence equality with the block consensus
    # (itest_export_block_consensus.rs:39-43)
    for r in recs:
        assert bytes(r.seq) == bytes(g.blocks[int(r.seq_name)].consensus)


def test_export_block_sequences(test_graph_path, tmp_path):
    outdir = tmp_path / "blocks"
    assert run_cli(["export", "block-sequences", test_graph_path, "-o", outdir]) == 0
    g = Pangraph.from_file(test_graph_path)
    files = sorted(os.listdir(outdir))
    assert len(files) == len(g.blocks)
    # aligned sequences all equal consensus length
    bid = sorted(g.blocks)[0]
    recs = read_fasta(outdir / f"block_{bid}.fa", validate=False)
    assert len(recs) == g.blocks[bid].depth()
    assert {len(r.seq) for r in recs} == {g.blocks[bid].consensus_len()}
    meta = json.loads(recs[0].desc)
    assert set(meta) == {"path_name", "block_id", "start", "end", "strand"}


@pytest.mark.parametrize("aligned", [True, False])
def test_export_core_genome(test_graph_path, tmp_path, aligned):
    """itest_export_core_genome.rs:23-63: guide strain pCAV1344-40, fasta
    names == sorted path names; aligned variant has uniform lengths."""
    g = Pangraph.from_file(test_graph_path)
    guide = "pCAV1344-40"
    assert guide in {p.name for p in g.paths.values()}
    out = tmp_path / "core.fa"
    cmd = ["export", "core-genome", test_graph_path, "-o", out, "--guide-strain", guide]
    if not aligned:
        cmd.append("--unaligned")
    assert run_cli(cmd) == 0
    recs = read_fasta(out, validate=False)
    assert sorted(r.seq_name for r in recs) == sorted(p.name for p in g.paths.values())
    if aligned:
        assert len({len(r.seq) for r in recs}) == 1
        # aligned alphabet: DNA with gap only
        assert all(set(bytes(r.seq)) <= set(b"ACGTNRYSWKMBDHV-") for r in recs)
    else:
        assert all(b"-" not in bytes(r.seq) for r in recs)


@pytest.mark.parametrize("aligned", [True, False])
def test_export_block_sequences_per_node(test_graph_path, tmp_path, aligned):
    """itest_export_block_sequences.rs:20-57: per-block record count equals
    the block's alignment count; aligned lengths == consensus length,
    unaligned lengths == each node's reconstructed length."""
    outdir = tmp_path / "blocks"
    cmd = ["export", "block-sequences", test_graph_path, "-o", outdir]
    if not aligned:
        cmd.append("--unaligned")
    assert run_cli(cmd) == 0
    g = Pangraph.from_file(test_graph_path)
    for bid, block in g.blocks.items():
        recs = read_fasta(outdir / f"block_{bid}.fa", validate=False)
        assert len(recs) == block.depth()
        for r in recs:
            nid = int(r.seq_name.split()[0])
            assert nid in block.alignments
            if aligned:
                assert len(r.seq) == block.consensus_len()
            else:
                assert len(r.seq) == len(block.alignments[nid].apply(block.consensus))


def test_simplify(test_graph_path, tmp_path):
    g = Pangraph.from_file(test_graph_path)
    names = sorted(p.name for p in g.paths.values())[:2]
    out = tmp_path / "simple.json"
    assert run_cli(["simplify", test_graph_path, "-o", out, "-s", ",".join(names)]) == 0
    g2 = Pangraph.from_file(out)
    g2.sanity_check()
    assert {p.name for p in g2.paths.values()} == set(names)


def test_reconstruct_cli(test_graph_path, tmp_path):
    out = tmp_path / "seqs.fa"
    assert run_cli(["reconstruct", test_graph_path, "-o", out]) == 0
    g = Pangraph.from_file(test_graph_path)
    recs = read_fasta(out, validate=False)
    assert {r.seq_name for r in recs} == {p.name for p in g.paths.values()}
    for r in recs:
        assert len(r.seq) == g.paths[g.path_id_by_name(r.seq_name)].tot_len


def test_schema_validates_graph(test_graph_path):
    jsonschema = pytest.importorskip("jsonschema")
    schema = json.loads(export_schema())
    doc = json.load(open(test_graph_path))
    jsonschema.validate(doc, schema)
    own = Pangraph.from_file(test_graph_path).to_json_dict()
    jsonschema.validate(own, schema)


def test_completions():
    assert run_cli(["completions", "bash"]) == 0


def test_completions_cover_real_flags():
    """Completions are generated from the live parser (clap-style): every
    subcommand and its actual flags must appear; bash output must parse."""
    import subprocess

    from pangraph_tpu.cli import _completions

    b = _completions("bash")
    for word in ("build", "export", "simplify", "reconstruct", "schema",
                 "--circular", "--guide-tree", "--minimum-depth", "--no-duplicated"):
        assert word in b, word
    r = subprocess.run(["bash", "-n", "/dev/stdin"], input=b, capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    z = _completions("zsh")
    assert "#compdef pangraph-tpu" in z and "--circular" in z
    f = _completions("fish")
    assert "__fish_seen_subcommand_from build" in f and "-l circular" in f
