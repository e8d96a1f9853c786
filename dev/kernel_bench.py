#!/usr/bin/env python
"""Per-engine microbenchmarks for the alignment compute path.

Measures warm throughput of each engine on synthetic ~2%-divergent pairs:

- native AVX-512 stripe aligner (DP + traceback, threaded across jobs)
- native rolling minimizer sketch
- Pallas v2 stripe kernel (DP + run-jump walk, one batch)
- checkpointed kernel pair (carry checkpoints + window re-derive walk)

Run on the TPU host: `python dev/kernel_bench.py`. On CPU-only hosts the
device kernels run in Pallas interpret mode (slow; informational only).
"""
from __future__ import annotations

import sys
import time

import numpy as np

ACGT = np.frombuffer(b"ACGT", np.uint8)


def _pairs(rng, n, L, div=0.02):
    refs, qrys = [], []
    for _ in range(n):
        ref = ACGT[rng.integers(0, 4, L)]
        q = ref.copy()
        idx = rng.choice(L, int(L * div), replace=False)
        q[idx] = ACGT[rng.integers(0, 4, len(idx))]
        refs.append(ref)
        qrys.append(q)
    return refs, qrys


def bench_native_stripe(rng):
    from pangraph_tpu.align.params import BandedAlignParams
    from pangraph_tpu.graph.seq import IUPAC_MASK
    from pangraph_tpu.native import get_lib, stripe_align_batch_native

    if get_lib() is None:
        print("native stripe: unavailable")
        return
    p = BandedAlignParams()
    for n, L, W in [(64, 2000, 16), (16, 20000, 32), (4, 120000, 64), (2, 120000, 512)]:
        refs, qrys = _pairs(rng, n, L)
        ms = np.zeros(n, np.int64)
        Wv = np.full(n, W, np.int64)
        stripe_align_batch_native(refs[:1], qrys[:1], ms[:1], Wv[:1], p, IUPAC_MASK)
        t = time.time()
        out = stripe_align_batch_native(refs, qrys, ms, Wv, p, IUPAC_MASK)
        dt = time.time() - t
        cells = n * (L + 1) * (2 * W + 2)
        assert set(out["status"].tolist()) == {0}
        print(f"native stripe  n={n:3d} L={L:6d} W={W:3d}: {dt*1e3:7.1f} ms  {cells/dt/1e9:5.2f} Gcells/s")


def bench_native_sketch(rng):
    from pangraph_tpu.graph.seq import TWOBIT
    from pangraph_tpu.native import get_lib, sketch_native

    if get_lib() is None:
        print("native sketch: unavailable")
        return
    for L, k, w in [(2_500_000, 19, 19), (2_500_000, 15, 100)]:
        seq = ACGT[rng.integers(0, 4, L)]
        sketch_native(seq[:1000], k, w, TWOBIT)
        t = time.time()
        vals, pos, strands = sketch_native(seq, k, w, TWOBIT)
        dt = time.time() - t
        print(f"native sketch  L={L} (k={k},w={w}): {dt*1e3:6.1f} ms  {L/dt/1e6:6.0f} Mbp/s  ({len(vals)} minimizers)")


def _kernel_batch(rng, m, R_cap, B, L, div=0.02, g=8):
    ref_seq = np.zeros((m, R_cap), np.uint8)
    qry_seq = np.zeros((m, R_cap + B), np.uint8)
    rlen = np.full(m, L, np.int32)
    qlen = np.full(m, L, np.int32)
    ms = np.zeros(m, np.int32)
    W = np.full(m, (B - 2) // 2, np.int32)
    refs, qrys = _pairs(rng, m, L, div)
    for s in range(m):
        ref_seq[s, :L] = refs[s]
        qry_seq[s, :L] = qrys[s]
    gmax = rlen.reshape(-1, g).max(axis=1).astype(np.int32)
    return ref_seq, qry_seq, rlen, qlen, ms, W, gmax


def bench_v2(rng):
    import jax

    from pangraph_tpu.ops.stripe_v2 import stripe_align_v2

    # timing: block_until_ready through the device tunnel does not actually
    # block (results are futures served ~one call behind), so every sample
    # must force a host materialization and rates are total/N over N calls
    N = 4
    for m, g, R_cap, B, L in [(16, 16, 16384, 128, 15000), (64, 64, 131072, 128, 120000), (8, 8, 131072, 2048, 120000)]:
        args = _kernel_batch(rng, m, R_cap, B, L, g=g)
        np.asarray(stripe_align_v2(*args, R_cap, B, 1024, g)["n_events"])
        t = time.time()
        for _ in range(N):
            np.asarray(stripe_align_v2(*args, R_cap, B, 1024, g)["n_events"])
        dt = (time.time() - t) / N
        cells = m * L * B
        print(f"v2 kernel      m={m:3d} g={g} L={L:6d} B={B}: {dt*1e3:7.1f} ms  {cells/dt/1e9:5.2f} Gcells/s")


def bench_ckpt(rng):
    import jax

    from pangraph_tpu.ops.stripe_v2 import DP_C, ckpt_layout, stripe_align_v2_ckpt

    N = 2
    for m, g, R_cap, B, L in [(32, 32, 2097152, 128, 2_000_000), (32, 32, 2097152, 512, 2_000_000), (8, 8, 2097152, 2048, 2_000_000)]:
        WV, n_qb = ckpt_layout(B)
        S = WV // DP_C
        args = _kernel_batch(rng, m, R_cap, B, L, div=0.005, g=g)
        np.asarray(stripe_align_v2_ckpt(*args, R_cap, B, 2048, S, n_qb, g)["n_events"])
        t = time.time()
        for _ in range(N):
            np.asarray(stripe_align_v2_ckpt(*args, R_cap, B, 2048, S, n_qb, g)["n_events"])
        dt = (time.time() - t) / N
        cells = m * L * B
        print(f"ckpt kernel    m={m:3d} g={g} L={L:7d} B={B}: {dt*1e3:7.1f} ms  {cells/dt/1e9:5.2f} Gcells/s")


def main():
    rng = np.random.default_rng(0)
    bench_native_sketch(rng)
    bench_native_stripe(rng)
    import jax

    print(f"device: {jax.devices()[0].platform}")
    bench_v2(rng)
    bench_ckpt(rng)


if __name__ == "__main__":
    sys.exit(main())
