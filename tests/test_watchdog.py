"""Device-stall watchdog tests (ops/batch_align.py).

A tunneled device has been observed to stall indefinitely mid-round; the
watchdog must (a) time the fetch out, (b) quarantine the device for the rest
of the process, and (c) rerun the round's jobs on the host aligner so the
build completes with correct results instead of hanging."""
from __future__ import annotations

import time

import numpy as np
import pytest

from pangraph_tpu.align.map_variations import map_variations
from pangraph_tpu.align.params import BandedAlignParams, BandParameters
from pangraph_tpu.ops.batch_align import AlignJob, TpuBatchAligner, _DeviceStall

ACGT = np.frombuffer(b"ACGT", np.uint8)


@pytest.fixture(autouse=True)
def _reset_flag():
    TpuBatchAligner.DEVICE_UNHEALTHY = False
    yield
    TpuBatchAligner.DEVICE_UNHEALTHY = False


def test_fetch_watchdog_times_out(monkeypatch):
    import jax

    monkeypatch.setattr(jax, "device_get", lambda x: time.sleep(10.0))
    al = TpuBatchAligner(BandedAlignParams())
    with pytest.raises(_DeviceStall):
        al._fetch_with_watchdog(object(), timeout=0.2)
    assert TpuBatchAligner.DEVICE_UNHEALTHY


def test_fetch_watchdog_passes_through(monkeypatch):
    import jax

    monkeypatch.setattr(jax, "device_get", lambda x: ("ok", x))
    al = TpuBatchAligner(BandedAlignParams())
    assert al._fetch_with_watchdog(7, timeout=5.0) == ("ok", 7)
    assert not TpuBatchAligner.DEVICE_UNHEALTHY


def test_fetch_watchdog_propagates_errors(monkeypatch):
    import jax

    def boom(x):
        raise ValueError("device error")

    monkeypatch.setattr(jax, "device_get", boom)
    al = TpuBatchAligner(BandedAlignParams())
    with pytest.raises(ValueError, match="device error"):
        al._fetch_with_watchdog(3, timeout=5.0)
    assert not TpuBatchAligner.DEVICE_UNHEALTHY


def _jobs(n=6, L=400, seed=0):
    rng = np.random.default_rng(seed)
    jobs = []
    for _ in range(n):
        ref = ACGT[rng.integers(0, 4, L)]
        qry = ref.copy()
        idx = rng.choice(L, 6, replace=False)
        qry[idx] = ACGT[rng.integers(0, 4, 6)]
        jobs.append(AlignJob(ref, qry, BandParameters(0, 8)))
    return jobs


def test_stalled_round_reruns_on_host(monkeypatch):
    """A stalling fetch must not lose the round: align_many returns edits
    identical to the host aligner, and later rounds skip the device."""
    params = BandedAlignParams()
    al = TpuBatchAligner(params)
    # the whole planned round (dispatch + fetch) stalls
    monkeypatch.setattr(
        TpuBatchAligner,
        "_run_planned",
        lambda self, *a, **k: (_ for _ in ()).throw(_DeviceStall()),
    )
    # force jobs onto the device leg regardless of the latency budget, so the
    # round goes plan -> (stalled) device round -> host rerun
    monkeypatch.setattr(TpuBatchAligner, "NATIVE_CELL_BUDGET", 0)
    jobs = _jobs()
    edits = al.align_many(jobs)
    for j, e in zip(jobs, edits):
        want = map_variations(j.ref, j.qry, j.band, params, al.extra)
        assert e == want


def test_unhealthy_device_routes_all_to_host(monkeypatch):
    """Once quarantined, _run_round must not touch the device at all."""
    params = BandedAlignParams()
    al = TpuBatchAligner(params)
    TpuBatchAligner.DEVICE_UNHEALTHY = True

    def no_device(*a, **k):
        raise AssertionError("device dispatched while quarantined")

    monkeypatch.setattr(TpuBatchAligner, "_dispatch_device", no_device)
    from pangraph_tpu import native

    if native.get_lib() is None:
        pytest.skip("native toolchain unavailable")
    jobs = _jobs(n=4, seed=1)
    edits = al.align_many(jobs)
    for j, e in zip(jobs, edits):
        want = map_variations(j.ref, j.qry, j.band, params, al.extra)
        assert e == want
