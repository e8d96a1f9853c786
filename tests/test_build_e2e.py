"""End-to-end build pipeline tests: the lossless-roundtrip oracle
(build_run.rs:37-64) over synthetic genomes exercising homology detection,
reverse complements, circular rotation, duplications and deeper guide trees —
plus the real bundled plasmid dataset."""
import numpy as np
import pytest

from pangraph_tpu.align.params import BuildArgs
from pangraph_tpu.build.build import build, verify_roundtrip
from pangraph_tpu.graph.seq import revcomp
from pangraph_tpu.io.fasta import FastaRecord, read_fasta

BASES = np.frombuffer(b"ACGT", dtype=np.uint8)


def _rng():
    return np.random.default_rng(1234)


def rand(rng, n):
    return BASES[rng.integers(0, 4, n)]


def mutate(rng, seq, rate=0.01):
    s = seq.copy()
    n = int(len(s) * rate)
    if n:
        pos = rng.choice(len(s), n, replace=False)
        s[pos] = BASES[rng.integers(0, 4, n)]
    return s


def run_build(recs, **kwargs):
    g = build(recs, BuildArgs(**kwargs))
    g.sanity_check()
    verify_roundtrip(g, recs)
    return g


def test_shared_core_two_genomes():
    rng = _rng()
    core = rand(rng, 4000)
    recs = [
        FastaRecord("g1", None, np.concatenate([mutate(rng, core), rand(rng, 700)]), 0),
        FastaRecord("g2", None, np.concatenate([rand(rng, 500), mutate(rng, core)]), 1),
    ]
    g = run_build(recs)
    assert max(b.depth() for b in g.blocks.values()) == 2
    core_len = sum(g.blocks[b].consensus_len() for b in g.core_block_ids())
    assert abs(core_len - 4000) < 300


def test_reverse_complement_homology():
    rng = _rng()
    core = rand(rng, 4000)
    recs = [
        FastaRecord("a", None, np.concatenate([rand(rng, 600), mutate(rng, core), rand(rng, 400)]), 0),
        FastaRecord("b", None, np.concatenate([rand(rng, 300), revcomp(mutate(rng, core)), rand(rng, 500)]), 1),
    ]
    g = run_build(recs)
    assert {n.strand for n in g.nodes.values()} == {"+", "-"}
    assert max(b.depth() for b in g.blocks.values()) == 2


def test_circular_rotation():
    rng = _rng()
    core = rand(rng, 6000)
    recs = [
        FastaRecord("c1", None, mutate(rng, core), 0),
        FastaRecord("c2", None, np.roll(mutate(rng, core), 2500), 1),
    ]
    g = run_build(recs, circular=True)
    # one shared block after transitive-edge compaction
    assert len(g.blocks) == 1
    assert next(iter(g.blocks.values())).depth() == 2


def test_duplication():
    rng = _rng()
    seg = rand(rng, 2000)
    recs = [
        FastaRecord(
            "d1",
            None,
            np.concatenate([rand(rng, 500), mutate(rng, seg), rand(rng, 800), mutate(rng, seg), rand(rng, 400)]),
            0,
        ),
        FastaRecord("d2", None, np.concatenate([rand(rng, 300), mutate(rng, seg), rand(rng, 600)]), 1),
    ]
    g = run_build(recs)
    assert max(b.depth() for b in g.blocks.values()) == 3  # duplicated block


def test_four_genomes():
    rng = _rng()
    anc = rand(rng, 6000)
    recs = [
        FastaRecord(
            f"g{i}",
            None,
            np.concatenate([rand(rng, 200 + 100 * i), mutate(rng, anc, 0.005 + 0.002 * i), rand(rng, 150)]),
            i,
        )
        for i in range(4)
    ]
    g = run_build(recs)
    assert max(b.depth() for b in g.blocks.values()) == 4
    assert len(g.core_block_ids()) >= 1


def test_indels_between_genomes():
    rng = _rng()
    anc = rand(rng, 5000)
    s1 = mutate(rng, anc)
    # genome 2: 300bp deletion + 250bp insertion relative to ancestor
    s2 = np.concatenate([anc[:1500], anc[1800:3000], rand(rng, 250), anc[3000:]])
    s2 = mutate(rng, s2)
    recs = [FastaRecord("i1", None, s1, 0), FastaRecord("i2", None, s2, 1)]
    g = run_build(recs)
    assert max(b.depth() for b in g.blocks.values()) == 2


@pytest.mark.slow
def test_russian_doll_plasmids(plasmids_fasta_path):
    recs = read_fasta(plasmids_fasta_path)
    g = run_build(recs, circular=True)
    total = sum(b.consensus_len() for b in g.blocks.values())
    core = sum(g.blocks[b].consensus_len() for b in g.core_block_ids())
    input_total = sum(len(r.seq) for r in recs)
    # pangenome must compress the input substantially; core must be large
    assert total < 0.45 * input_total
    assert core > 25_000
    assert max(b.depth() for b in g.blocks.values()) == 4


@pytest.mark.slow
def test_real_plasmids_15x(tmp_path):
    """Second real dataset: the pypangraph package's 15-plasmid set
    (~1.46 Mbp; the reference ships its own binary's graph of the same data
    as tests/data/plasmids.json). Build must round-trip exactly and land in
    the same structural regime as the reference's graph (137 blocks, 27
    core, heavy accessory content) — block boundaries legitimately differ
    across mappers (BASELINE.json stance)."""
    import os

    path = "/root/reference/packages/pypangraph/tests/data/plasmids.fa.gz"
    if not os.path.exists(path):
        pytest.skip("reference checkout unavailable")
    recs = read_fasta(path)
    assert len(recs) == 15
    g = run_build(recs, circular=True)
    total = sum(b.consensus_len() for b in g.blocks.values())
    input_total = sum(len(r.seq) for r in recs)
    # heavy-accessory plasmid set: strong compression, moderate core
    assert total < 0.25 * input_total
    assert 50 <= len(g.blocks) <= 400  # reference's own graph: 137
    core = sum(g.blocks[b].consensus_len() for b in g.core_block_ids())
    assert core > 20_000
