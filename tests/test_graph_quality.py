"""Graph-quality regression tests (VERDICT r2 missing #2).

The lossless-roundtrip oracle alone cannot catch a degenerate merge
trajectory — a build that stops merging early still reconstructs exactly but
produces a bloated pangenome. These tests pin compression, core-genome
fraction, and block counts with tolerances, on the real bundled dataset and
on a seeded synthetic, so a routing/band/trajectory change that silently
degrades merge quality fails loudly.

Reference anchors: the ecoli tutorial run publishes 7.8 Mbp pangenome /
3.78 Mbp core on ~46 Mbp input (t02-pangraph-output-file.md:220-225) —
compression ~5.9 at 10 genomes, core fraction ~0.48. Measured r3 values on
the suites below are recorded next to each tolerance.
"""
from __future__ import annotations

import pytest

from pangraph_tpu.align.params import BuildArgs
from pangraph_tpu.build.build import build, verify_roundtrip
from pangraph_tpu.commands import graph_quality
from pangraph_tpu.io.fasta import read_fasta

RUSSIAN_DOLL = "/root/reference/data/russian_doll_plasmids.fa.gz"


def _build_quality(records, jobs=2):
    graph = build(records, BuildArgs(circular=True, jobs=jobs))
    verify_roundtrip(graph, records)
    return graph_quality(graph)


def test_quality_russian_doll():
    """4 nested plasmids, 161 kb input. Measured r3: compression 3.18,
    core_fraction 0.661, 10 blocks, 4 core blocks at depth 4."""
    records = read_fasta(RUSSIAN_DOLL)
    q = _build_quality(records)
    assert q["input_bp"] == 161443
    assert q["compression"] >= 2.8, q
    assert q["core_fraction"] >= 0.55, q
    assert q["n_blocks"] <= 14, q
    # every core block must span all 4 plasmids exactly once
    assert q["n_core_blocks"] >= 3, q
    assert q["block_depth_hist"].get(4, 0) >= q["n_core_blocks"]


def test_quality_synthetic_divergent():
    """6 x 100 kb descendants of one ancestor (~1% subs each, indels,
    inversions, rotations — every pair ~2% divergent). Ideal compression is
    ~6 minus inversion/split overhead. Measured r3: compression 5.18,
    core_fraction 0.625, 36 blocks."""
    import sys

    sys.path.insert(0, "/root/repo")
    from bench import make_synthetic

    records = make_synthetic(n_genomes=6, length=100_000, seed=3, sub_rate=0.01)
    q = _build_quality(records)
    assert q["compression"] >= 4.5, q
    assert q["core_fraction"] >= 0.5, q
    assert q["n_blocks"] <= 60, q
    # most of the pangenome should sit in blocks covering all 6 genomes
    full_depth_blocks = q["block_depth_hist"].get(6, 0) + q["block_depth_hist"].get(7, 0)
    assert full_depth_blocks >= q["n_blocks"] // 3, q


@pytest.mark.slow
def test_quality_chromosome_scale():
    """1 Mbp-class marker (subset of the bench's chromosome workload):
    compression must stay near genome count. Guards the Mbp routing paths
    (ckpt kernel / wide-band / host widen gates) against trajectory
    degradation."""
    import sys

    sys.path.insert(0, "/root/repo")
    from bench import make_synthetic

    records = make_synthetic(n_genomes=3, length=500_000, seed=11, sub_rate=0.005)
    q = _build_quality(records)
    assert q["compression"] >= 2.4, q
    assert q["core_fraction"] >= 0.6, q


def test_quality_accessory_thousand_blocks():
    """Accessory-genome synthetic at >=10^3 blocks (VERDICT r3 item 3): the
    graph-bookkeeping layer (reweave interval assembly, reconsensus loops,
    transitive-edge scan) must hold quality at realistic block counts, not
    just the tens-of-blocks mutation-only sets. Measured r4 (seed 21,
    n_seg=560): ~1050 blocks, core_fraction ~0.30, compression ~4.9."""
    from pangraph_tpu.utils.synth import make_accessory_pangenome

    records = make_accessory_pangenome(8, 1_000_000, seed=21, n_seg=560, core_frac_of_genome=0.45)
    q = _build_quality(records)
    assert q["n_blocks"] >= 1000, q
    assert q["compression"] >= 4.0, q
    assert 0.15 <= q["core_fraction"] <= 0.55, q
    # core blocks exist and sit at full depth
    assert q["n_core_blocks"] >= 300, q
    assert q["block_depth_hist"].get(8, 0) >= q["n_core_blocks"]
