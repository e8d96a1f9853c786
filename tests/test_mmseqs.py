"""mmseqs backend exercise (VERDICT r4 item 5).

The backend shells out to the external `mmseqs` binary, absent in this
environment — so coverage comes in three layers: (1) canned easy-search
output rows through the PAF parser (align/mmseqs/paf.rs:14-86 semantics,
including the reverse-hit convention: the QUERY range is reported swapped),
(2) the full align_with_mmseqs subprocess path against a stub `mmseqs`
executable that emits a canned result file, and (3) a skipif-gated
end-to-end run for environments that do have the real binary.
"""
from __future__ import annotations

import os
import shutil
import stat

import numpy as np
import pytest

from pangraph_tpu.align.mmseqs import (
    PAF_FIELDS,
    _parse_row,
    align_with_mmseqs,
    check_mmseqs,
    make_mmseqs_find_matches,
)
from pangraph_tpu.graph.graph import Block

# one forward hit and one reverse-complemented hit, in the exact
# --format-output column order the backend requests (PAF_FIELDS)
FWD_ROW = "1\t100\t1\t100\t\t2\t100\t1\t100\t98\t100\t180\t100M\t0.98\t450\n"
# reverse match: mmseqs swaps the QUERY coordinates (paf.rs:74-86 example:
# an exact reverse match of two length-10 sequences reports query=(10,1),
# target=(1,10))
REV_ROW = "3\t50\t50\t1\t\t4\t60\t5\t54\t48\t50\t90\t50M\t0.96\t210\n"


def test_parse_forward_row():
    a = _parse_row(FWD_ROW)
    assert a is not None
    assert (a.qry.name, a.reff.name) == (1, 2)
    assert a.qry.interval.to_tuple() == (0, 100)
    assert a.reff.interval.to_tuple() == (0, 100)
    assert a.orientation == "+"
    assert a.matches == 98 and a.length == 100 and a.quality == 180
    assert abs(a.divergence - 0.02) < 1e-12
    assert a.align_score == 450.0
    assert [(n, op) for n, op in a.cigar] == [(100, "M")]


def test_parse_reverse_row():
    a = _parse_row(REV_ROW)
    assert a is not None
    assert a.orientation == "-"
    # order_range(50, 1) -> (0, 50); order_range(5, 54) -> (4, 54)
    assert a.qry.interval.to_tuple() == (0, 50)
    assert a.reff.interval.to_tuple() == (4, 54)


def test_parse_malformed_rows():
    assert _parse_row("\n") is None
    assert _parse_row("1\t2\t3\n") is None  # too few columns
    # a trailing extra column is tolerated (zip stops at PAF_FIELDS)
    assert _parse_row(FWD_ROW.rstrip("\n") + "\textra\n") is not None


def _blocks():
    rng = np.random.default_rng(5)
    ACGT = np.frombuffer(b"ACGT", np.uint8)
    out = {}
    for bid in (1, 2, 3, 4):
        out[bid] = Block(bid, ACGT[rng.integers(0, 4, 100)], {bid * 10: None})
    return out


@pytest.fixture
def stub_mmseqs(tmp_path, monkeypatch):
    """A fake `mmseqs` on PATH: validates the subcommand and writes the
    canned rows to the result path (argv[4])."""
    exe = tmp_path / "mmseqs"
    canned = tmp_path / "canned.paf"
    canned.write_text(FWD_ROW + REV_ROW + "bad\trow\n")
    exe.write_text(
        "#!/bin/sh\n"
        '[ "$1" = easy-search ] || { echo "unexpected subcommand $1" >&2; exit 2; }\n'
        f'cp "{canned}" "$4"\n'
    )
    exe.chmod(exe.stat().st_mode | stat.S_IEXEC)
    monkeypatch.setenv("PATH", f"{tmp_path}{os.pathsep}{os.environ['PATH']}")
    return exe


def test_align_with_mmseqs_stub_binary(stub_mmseqs):
    """Full subprocess path: temp FASTA written, command built, result rows
    parsed; the malformed row is dropped."""
    check_mmseqs()  # PATH check passes with the stub installed
    alns = align_with_mmseqs(_blocks(), kmer_length=13)
    assert len(alns) == 2
    assert {a.orientation for a in alns} == {"+", "-"}
    fm = make_mmseqs_find_matches(None)

    class _A:
        kmer_length = None

    assert len(fm(_blocks(), _A())) == 2


def test_check_mmseqs_raises_without_binary(monkeypatch):
    monkeypatch.setenv("PATH", "/nonexistent")
    with pytest.raises(RuntimeError, match="mmseqs"):
        check_mmseqs()


@pytest.mark.skipif(shutil.which("mmseqs") is None, reason="real mmseqs binary unavailable")
def test_align_with_mmseqs_real_binary():
    """End-to-end with the real binary: two near-identical blocks must
    produce at least one forward self-ish hit."""
    rng = np.random.default_rng(11)
    ACGT = np.frombuffer(b"ACGT", np.uint8)
    base = ACGT[rng.integers(0, 4, 2000)]
    var = base.copy()
    idx = rng.choice(2000, 20, replace=False)
    var[idx] = ACGT[rng.integers(0, 4, 20)]
    blocks = {1: Block(1, base, {10: None}), 2: Block(2, var, {20: None})}
    alns = align_with_mmseqs(blocks)
    assert any({a.qry.name, a.reff.name} == {1, 2} for a in alns)
