"""Determinism: the graph must be byte-identical regardless of host thread
count (the reference gets this from its sequential merge schedule; our
parallel scheduler must not change results — SURVEY.md §2.4)."""
import pytest

from pangraph_tpu.align.params import BuildArgs
from pangraph_tpu.build.build import build
from pangraph_tpu.io.fasta import read_fasta


@pytest.fixture(scope="module")
def plasmids():
    return read_fasta("/root/reference/data/russian_doll_plasmids.fa.gz")


def test_build_deterministic_across_thread_counts(plasmids):
    g1 = build(plasmids, BuildArgs(circular=True, jobs=1))
    g2 = build(plasmids, BuildArgs(circular=True, jobs=4))
    assert g1.to_json() == g2.to_json()


def test_build_deterministic_across_runs(plasmids):
    g1 = build(plasmids, BuildArgs(circular=True))
    g2 = build(plasmids, BuildArgs(circular=True))
    assert g1.to_json() == g2.to_json()
