#!/usr/bin/env python
"""Smoke tests: run the CLI end-to-end over every bundled dataset
(reference: dev/run-smoke-tests). Pass criterion = exit code 0 for every
command, plus the lossless roundtrip for each build.

Usage: python dev/smoke.py [--data DIR] [--full]
LFS pointer stubs in the data directory are skipped automatically.
"""
from __future__ import annotations

import argparse
import pathlib
import subprocess
import sys
import tempfile

REPO = pathlib.Path(__file__).resolve().parent.parent


def is_real_fasta(p: pathlib.Path) -> bool:
    try:
        head = p.open("rb").read(64)
    except OSError:
        return False
    if head.startswith(b"version https://git-lfs"):
        return False
    return p.stat().st_size > 300


def run(cmd: list, **kw) -> None:
    print("+", " ".join(str(c) for c in cmd), flush=True)
    subprocess.run([sys.executable, "-m", "pangraph_tpu.cli", *cmd], check=True, cwd=REPO, **kw)


def smoke_dataset(fasta: pathlib.Path, params: list, tag: str) -> None:
    with tempfile.TemporaryDirectory() as d:
        graph = pathlib.Path(d) / "graph.json"
        run(["build", str(fasta), *params, "-o", str(graph), "--no-progress-bar"])
        run(["reconstruct", str(graph), "--verify", str(fasta)])
        run(["export", "gfa", str(graph), "-o", str(pathlib.Path(d) / "g.gfa")])
        run(["export", "block-consensus", str(graph), "-o", str(pathlib.Path(d) / "c.fa")])
        run(["export", "block-sequences", str(graph), "-o", str(pathlib.Path(d) / "blocks")])
        # core-genome needs a strain name: take the first record header
        import gzip

        op = gzip.open if fasta.suffix == ".gz" else open
        with op(fasta, "rt") as f:
            strain = next(line for line in f if line.startswith(">")).split()[0][1:]
        run(["export", "core-genome", str(graph), "--guide-strain", strain,
             "-o", str(pathlib.Path(d) / "core.fa")])
        run(["simplify", str(graph), "-s", strain, "-o", str(pathlib.Path(d) / "sub.json")])
    print(f"PASS {tag}: {fasta.name}", flush=True)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default="/root/reference/data")
    ap.add_argument("--full", action="store_true", help="also run the alternate parameter set")
    args = ap.parse_args()

    data = pathlib.Path(args.data)
    fastas = sorted(
        p for p in list(data.glob("*.fa")) + list(data.glob("*.fa.gz")) if is_real_fasta(p)
    )
    # the pypangraph package ships a second real dataset (15 plasmids,
    # ~1.46 Mbp) alongside the reference's own graph of it
    pp_plasmids = data.parent / "packages" / "pypangraph" / "tests" / "data" / "plasmids.fa.gz"
    if pp_plasmids.exists() and is_real_fasta(pp_plasmids):
        fastas.append(pp_plasmids)
    if not fastas:
        print("no real FASTA datasets found", file=sys.stderr)
        return 1
    for fasta in fastas:
        smoke_dataset(fasta, ["-c"], "default")
        if args.full:
            smoke_dataset(fasta, ["-c", "-b", "5", "-s", "20", "-l", "100"], "alt-params")
    print(f"ALL SMOKE TESTS PASSED ({len(fastas)} datasets)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
