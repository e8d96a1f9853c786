#!/usr/bin/env python
"""Mbp-scale robustness check: build a synthetic pangenome of chromosome-size
genomes (the ecoli.fa.gz-class workload; the bundled file is an LFS stub in
this environment) and verify the lossless roundtrip oracle.

Exercises the paths small datasets cannot: blocks beyond the largest device
tier (native/numpy fallbacks), Mbp-long consensus slicing, and the band-stat
bookkeeping on long edits.

Usage: python dev/scale_check.py [n_genomes] [length] [divergence]
"""
from __future__ import annotations

import sys
import time

import numpy as np

ACGT = np.frombuffer(b"ACGT", np.uint8)


def make_genomes(n: int, length: int, div: float, seed: int = 1):
    from pangraph_tpu.io.fasta import FastaRecord

    rng = np.random.default_rng(seed)
    ancestor = ACGT[rng.integers(0, 4, length)]
    comp = np.zeros(256, np.uint8)
    comp[ord("A")], comp[ord("C")], comp[ord("G")], comp[ord("T")] = (
        ord("T"), ord("G"), ord("C"), ord("A"),
    )
    out = []
    for gi in range(n):
        g = ancestor.copy()
        n_sub = int(length * div)
        idx = rng.choice(length, n_sub, replace=False)
        g[idx] = ACGT[(np.searchsorted(ACGT, g[idx]) + rng.integers(1, 4, n_sub)) % 4]
        gl = list(g)
        for _ in range(max(1, length // 50_000)):
            p = int(rng.integers(100, len(gl) - 100))
            L = int(rng.integers(1, 30))
            if rng.random() < 0.5:
                del gl[p : p + L]
            else:
                gl[p:p] = list(ACGT[rng.integers(0, 4, L)])
        g = np.array(gl, np.uint8)
        # one large segmental inversion per genome
        L = int(rng.integers(20_000, 60_000))
        p = int(rng.integers(0, len(g) - L))
        g[p : p + L] = comp[g[p : p + L]][::-1]
        g = np.roll(g, int(rng.integers(0, len(g))))
        out.append(FastaRecord(seq_name=f"chr_{gi}", desc="", seq=g, index=gi))
    return out


def main():
    from pangraph_tpu.align.params import BuildArgs
    from pangraph_tpu.build.build import build, verify_roundtrip

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    length = int(sys.argv[2]) if len(sys.argv) > 2 else 2_500_000
    div = float(sys.argv[3]) if len(sys.argv) > 3 else 0.005
    recs = make_genomes(n, length, div)
    bp = sum(len(r.seq) for r in recs)
    print(f"building {n} genomes x {length/1e6:.1f} Mbp ({bp/1e6:.1f} Mbp total, {div:.1%} divergence)", flush=True)
    args = BuildArgs(circular=True, jobs=2)
    t0 = time.time()
    graph = build(recs, args)
    dt = time.time() - t0
    verify_roundtrip(graph, recs)
    core = len(graph.core_block_ids())
    print(
        f"OK: wall={dt:.1f}s ({bp/dt/1e3:.0f} kbp/s), blocks={len(graph.blocks)}, "
        f"core_blocks={core}, roundtrip exact"
    )


if __name__ == "__main__":
    sys.exit(main())
