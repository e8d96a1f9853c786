"""Chaos test for the adaptive routing + quarantine + probe machinery: a
device that randomly serves, stalls, errors, lags, or returns unusable
results must NEVER change alignment results — every batch's edits must equal
the host reference aligner's, and the quarantine must recover between
rounds (half-open re-probe)."""
from __future__ import annotations

import time

import numpy as np
import pytest

from pangraph_tpu.align.map_variations import map_variations
from pangraph_tpu.align.params import BandedAlignParams, BandParameters
from pangraph_tpu.ops.batch_align import AlignJob, TpuBatchAligner

ACGT = np.frombuffer(b"ACGT", np.uint8)


def _jobs(rng, n, L):
    jobs = []
    for _ in range(n):
        ref = ACGT[rng.integers(0, 4, L)]
        qry = ref.copy()
        idx = rng.choice(L, max(2, L // 50), replace=False)
        qry[idx] = ACGT[rng.integers(0, 4, len(idx))]
        if rng.random() < 0.5:  # an indel so bands/retries matter
            p = int(rng.integers(10, L - 10))
            qry = np.concatenate([qry[:p], qry[p + int(rng.integers(1, 4)) :]])
        jobs.append(AlignJob(ref, qry, BandParameters(0, 8)))
    return jobs


def test_chaos_device_never_changes_results(monkeypatch):
    from pangraph_tpu import native

    if native.get_lib() is None:
        pytest.skip("native toolchain unavailable")
    params = BandedAlignParams()
    al = TpuBatchAligner(params)
    monkeypatch.setattr(TpuBatchAligner, "DEVICE_UNHEALTHY", False)
    monkeypatch.setattr(TpuBatchAligner, "_device_kind_cache", "tpu")
    # budget sized so the host leg gets one-or-two jobs and the device the
    # rest (a job at L=200..900, W=13 is ~5.6-25 kcells): with _dev_rate
    # never observed (all rounds are below RATE_MIN_CELLS) every mixed round
    # goes through the PROBE-LEG branch — single-flight spawn, PROBE_WAIT_S
    # reassignment, _probe_counts accounting
    monkeypatch.setattr(TpuBatchAligner, "NATIVE_CELL_BUDGET", 30_000)
    monkeypatch.setattr(TpuBatchAligner, "DEV_PROBE_CELLS", 1 << 40)
    monkeypatch.setattr(TpuBatchAligner, "REPROBE_S", 0.02)
    monkeypatch.setattr(TpuBatchAligner, "PROBE_WAIT_S", 0.3)
    monkeypatch.setattr(TpuBatchAligner, "_probe_link", classmethod(lambda cls, timeout: "tpu"))

    chaos = np.random.default_rng(1234)
    real_native = TpuBatchAligner._run_round_native
    seen = {"probe_legs": 0}

    def chaotic_device(self, jobs, widths, kbumps=None, count=True):
        if not count:
            seen["probe_legs"] += 1  # dispatched from a probe leg
        roll = chaos.random()
        if roll < 0.2:
            # internal stall handling: quarantine + host rerun (what the
            # real _run_round_v2 does on a watchdog timeout)
            self._quarantine("chaos stall")
            e, b, o = real_native(self, jobs, widths)
            return e, b, o
        if roll < 0.35:
            time.sleep(0.6)  # lagging leg: beyond PROBE_WAIT_S
            e, b, o = real_native(self, jobs, widths)
            return e, b, o
        if roll < 0.5:
            # unusable round: caller retries then falls back to host
            n = len(jobs)
            return [None] * n, [False] * n, [False] * n
        e, b, o = real_native(self, jobs, widths)
        return e, b, o

    monkeypatch.setattr(TpuBatchAligner, "_dispatch_device", chaotic_device)

    data_rng = np.random.default_rng(7)
    for round_i in range(25):
        jobs = _jobs(data_rng, int(data_rng.integers(2, 9)), int(data_rng.integers(200, 900)))
        edits = al.align_many(jobs)
        for j, e in zip(jobs, edits):
            want = map_variations(j.ref, j.qry, j.band, params, al.extra)
            assert e == want, f"chaos round {round_i}: result diverged from host reference"
        # allow the half-open re-probe to recover a chaos quarantine
        deadline = time.time() + 3.0
        while TpuBatchAligner.DEVICE_UNHEALTHY and time.time() < deadline:
            time.sleep(0.01)
        assert not TpuBatchAligner.DEVICE_UNHEALTHY
    # the probe-leg machinery (the code under test) must actually have run
    assert seen["probe_legs"] > 0, "chaos rounds never exercised the probe-leg branch"
