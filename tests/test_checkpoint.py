"""Checkpoint/resume at merge-tree granularity (build/build.py
MergeCheckpointer). The reference has no mid-build checkpointing
(SURVEY.md §5); the graph JSON per completed clade is our checkpoint unit."""
import os

import pytest

from pangraph_tpu.align.params import BuildArgs
from pangraph_tpu.build.build import MergeCheckpointer, build, make_find_matches, verify_roundtrip
from pangraph_tpu.io.fasta import read_fasta


@pytest.fixture(scope="module")
def plasmids():
    return read_fasta("/root/reference/data/russian_doll_plasmids.fa.gz")


def test_checkpoint_full_and_partial_resume(plasmids, tmp_path):
    d = str(tmp_path / "ckpt")
    args = BuildArgs(circular=True, checkpoint_dir=d)
    g1 = build(plasmids, args)
    verify_roundtrip(g1, plasmids)
    files = sorted(os.listdir(d))
    assert len(files) == 3  # one per internal clade of a 4-leaf tree

    # full resume: find_matches must never run
    def boom(blocks, aln_args):
        raise RuntimeError("find_matches must not be called on full resume")

    g2 = build(plasmids, args, find_matches_override=boom)
    assert g1.to_json() == g2.to_json()

    # partial resume: drop the root checkpoint; only the root merge reruns
    root_fp = MergeCheckpointer.fingerprint([r.seq_name for r in plasmids])
    os.remove(os.path.join(d, f"merge-{root_fp}.json.gz"))
    calls = [0]
    inner = make_find_matches(args, None)

    def counting(blocks, aln_args):
        calls[0] += 1
        return inner(blocks, aln_args)

    g3 = build(plasmids, args, find_matches_override=counting)
    verify_roundtrip(g3, plasmids)
    assert calls[0] > 0


def test_checkpoint_parallel_schedule(plasmids, tmp_path):
    d = str(tmp_path / "ckpt_par")
    args = BuildArgs(circular=True, checkpoint_dir=d, jobs=2)
    g1 = build(plasmids, args)
    verify_roundtrip(g1, plasmids)

    def boom(blocks, aln_args):
        raise RuntimeError("must resume from checkpoints")

    g2 = build(plasmids, args, find_matches_override=boom)
    assert g1.to_json() == g2.to_json()


def _coord_worker(d, q):
    import os

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")
    from pangraph_tpu.align.params import BuildArgs
    from pangraph_tpu.build.build import build
    from pangraph_tpu.io.fasta import read_fasta

    recs = read_fasta("/root/reference/data/russian_doll_plasmids.fa.gz")
    g = build(recs, BuildArgs(circular=True, checkpoint_dir=d, coordinate=True, jobs=2))
    q.put(g.to_json())


def test_coordinated_multiworker_build(plasmids, tmp_path):
    """Two processes sharing a checkpoint dir claim disjoint merges and
    produce identical graphs (the multi-host merge-tree distribution)."""
    import multiprocessing as mp

    d = str(tmp_path / "coord")
    ctx = mp.get_context("spawn")
    q = ctx.Queue()
    ps = [ctx.Process(target=_coord_worker, args=(d, q)) for _ in range(2)]
    for p in ps:
        p.start()
    outs = [q.get(timeout=600) for _ in ps]
    for p in ps:
        p.join()
    assert outs[0] == outs[1]
