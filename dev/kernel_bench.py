#!/usr/bin/env python
"""Per-engine microbenchmarks for the alignment compute path.

Measures warm throughput of each engine on synthetic low-divergence pairs:

- native AVX-512 stripe aligner (DP + traceback, threaded across jobs)
- native rolling minimizer sketch
- Pallas v2 stripe kernel (DP + run-jump walk)
- checkpointed kernel pair (carry checkpoints + window re-derive walk)

Device kernels are timed with the SLOPE method: N back-to-back async
dispatches with one final host materialization, for two values of N — the
slope (t(N2)-t(N1))/(N2-N1) isolates ON-DEVICE time from the tunnel's
dispatch/transfer latency (dispatches pipeline on the device queue), and
the intercept is the per-round link overhead. `block_until_ready` through
the axon tunnel does not actually block (results are futures served ~one
call behind), so every sample forces a host materialization.

Run on the TPU host: `python dev/kernel_bench.py [--json OUT.json]`.
On CPU-only hosts the device kernels would run in Pallas interpret mode
(never informative) — they are skipped unless the backend is a TPU.
"""
from __future__ import annotations

import json
import os
import sys
import time

# `python dev/kernel_bench.py` puts dev/ (not the repo root) on sys.path
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

ACGT = np.frombuffer(b"ACGT", np.uint8)

RESULTS: dict = {"host": [], "device": []}


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
    for n, L, W in [(64, 2000, 16), (64, 8000, 16), (16, 20000, 32), (4, 120000, 64), (2, 120000, 512)]:
        refs, qrys = _pairs(rng, n, L)
        ms = np.zeros(n, np.int64)
        Wv = np.full(n, W, np.int64)
        # production-sized result caps (as ops/batch_align computes them):
        # the wrapper's 65k/262k defaults allocate ~300 MB of result buffers
        # for a 64-job batch and the memset dominates small-L timings
        caps = {"ops_cap": min(65536, 256 + L // 8), "subs_cap": min(262144, 256 + L // 4)}
        stripe_align_batch_native(refs[:1], qrys[:1], ms[:1], Wv[:1], p, IUPAC_MASK, **caps)
        t = time.time()
        out = stripe_align_batch_native(refs, qrys, ms, Wv, p, IUPAC_MASK, **caps)
        dt = time.time() - t
        cells = n * (L + 1) * (2 * W + 2)
        assert set(out["status"].tolist()) == {0}
        rate = cells / dt / 1e9
        RESULTS["host"].append({"kind": "stripe", "n": n, "L": L, "W": W, "gcells_per_s": round(rate, 3)})
        print(f"native stripe  n={n:3d} L={L:6d} W={W:3d}: {dt*1e3:7.1f} ms  {rate:5.2f} Gcells/s")


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
    import jax

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
    return tuple(jax.device_put(a) for a in (ref_seq, qry_seq, rlen, qlen, ms, W, gmax))


def _slope(call, n_lo: int, n_hi: int):
    """(on-device seconds per call, one-call wall) via the slope method."""
    times = {}
    for N in (n_lo, n_hi):
        t = time.time()
        outs = [call() for _ in range(N)]
        for o in outs:
            np.asarray(o["n_events"])
        times[N] = time.time() - t
    return (times[n_hi] - times[n_lo]) / (n_hi - n_lo), times[n_lo] / n_lo


def bench_v2(rng):
    from pangraph_tpu.ops.stripe_v2 import stripe_align_v2

    for m, g, R_cap, B, L in [
        (64, 64, 8192, 128, 8000),  # pin-split piece regime (production shape)
        (64, 64, 16384, 128, 15000),
        (32, 32, 16384, 256, 15000),
        (16, 16, 16384, 512, 15000),
        (8, 8, 131072, 2048, 120000),
    ]:
        args = _kernel_batch(rng, m, R_cap, B, L, g=g)
        call = lambda: stripe_align_v2(*args, R_cap, B, 1024, g)
        np.asarray(call()["n_events"])  # compile
        dev_s, one_s = _slope(call, 1, 5)
        cells = m * L * B
        row = {
            "kind": "v2", "m": m, "g": g, "B": B, "L": L,
            "device_gcells_per_s": round(cells / dev_s / 1e9, 2),
            "effective_1call_gcells_per_s": round(cells / one_s / 1e9, 2),
            "link_overhead_ms": round((one_s - dev_s) * 1e3, 1),
        }
        RESULTS["device"].append(row)
        print(f"v2 kernel      m={m:3d} g={g} L={L:6d} B={B:4d}: device {dev_s*1e3:7.1f} ms/call  "
              f"{row['device_gcells_per_s']:6.2f} Gcells/s on-device  ({row['effective_1call_gcells_per_s']:5.2f} eff 1-call)")


def bench_ckpt(rng):
    from pangraph_tpu.ops.stripe_v2 import DP_C, ckpt_layout, stripe_align_v2_ckpt

    for m, g, B, L in [(32, 32, 128, 2_000_000), (8, 8, 512, 2_000_000)]:
        R_cap = 2097152
        WV, n_qb = ckpt_layout(B)
        S = WV // DP_C
        args = _kernel_batch(rng, m, R_cap, B, L, div=0.005, g=g)
        call = lambda: stripe_align_v2_ckpt(*args, R_cap, B, 2048, S, n_qb, g)
        np.asarray(call()["n_events"])
        dev_s, one_s = _slope(call, 1, 3)
        cells = m * L * B
        row = {
            "kind": "ckpt", "m": m, "g": g, "B": B, "L": L,
            "device_gcells_per_s": round(cells / dev_s / 1e9, 2),
            "effective_1call_gcells_per_s": round(cells / one_s / 1e9, 2),
        }
        RESULTS["device"].append(row)
        print(f"ckpt kernel    m={m:3d} g={g} L={L:7d} B={B:4d}: device {dev_s*1e3:7.1f} ms/call  "
              f"{row['device_gcells_per_s']:6.2f} Gcells/s on-device  ({row['effective_1call_gcells_per_s']:5.2f} eff 1-call)")


def main():
    out_json = None
    if "--json" in sys.argv:
        out_json = sys.argv[sys.argv.index("--json") + 1]
    rng = np.random.default_rng(0)
    bench_native_sketch(rng)
    bench_native_stripe(rng)
    import jax

    platform = jax.devices()[0].platform
    print(f"device: {platform}")
    if platform == "tpu":
        bench_v2(rng)
        bench_ckpt(rng)
    else:
        print("no TPU backend: skipping device kernels (interpret mode is not informative)")
    if out_json:
        with open(out_json, "w") as f:
            json.dump({"platform": platform, "method": "slope (see module docstring)", **RESULTS}, f, indent=1)
        print(f"wrote {out_json}")


if __name__ == "__main__":
    sys.exit(main())
