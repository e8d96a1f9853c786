#!/usr/bin/env python
"""Randomized soak: build synthetic pangenomes across seeds/configs, verify
the roundtrip oracle + sanity_check + exports + analysis loading on every
one. Usage: python dev/soak.py [n_cases]."""
from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(n_cases=20):
    from pangraph_tpu.align.params import BuildArgs
    from pangraph_tpu.build.build import build, verify_roundtrip
    from pangraph_tpu.commands import graph_quality
    from pangraph_tpu.io.gfa import gfa_write
    from pangraph_tpu.utils.synth import make_accessory_pangenome, make_synthetic

    rng = np.random.default_rng(2024)
    t00 = time.time()
    for case in range(n_cases):
        seed = int(rng.integers(0, 1 << 31))
        n = int(rng.integers(2, 9))
        L = int(rng.integers(30_000, 300_000))
        accessory = bool(rng.random() < 0.5)
        circular = bool(rng.random() < 0.7)
        jobs = int(rng.integers(1, 3))
        if accessory:
            recs = make_accessory_pangenome(n, L, seed=seed, sub_rate=0.01)
        else:
            recs = make_synthetic(n, L, seed=seed, sub_rate=0.02)
        t = time.time()
        g = build(recs, BuildArgs(circular=circular, jobs=jobs))
        verify_roundtrip(g, recs)
        g.sanity_check()
        q = graph_quality(g)
        assert q["n_blocks"] >= 1 and q["pangenome_bp"] > 0
        # exports + analysis must not crash on any built graph
        with tempfile.TemporaryDirectory() as d:
            g.to_file(f"{d}/g.json")
            from pangraph_tpu.analysis import AnalysisGraph

            ag = AnalysisGraph.load_json(f"{d}/g.json")
            ag.to_blockstats_df()
            gfa_write(g, f"{d}/g.gfa")
        print(
            f"case {case:2d}: seed={seed} n={n} L={L} acc={int(accessory)} "
            f"circ={int(circular)} j={jobs} -> {q['n_blocks']} blocks, "
            f"compression {q['compression']}, {time.time()-t:.1f}s  OK"
        )
    print(f"ALL {n_cases} SOAK CASES PASSED in {time.time()-t00:.0f}s")


if __name__ == "__main__":
    sys.exit(main(int(sys.argv[1]) if len(sys.argv) > 1 else 20))
