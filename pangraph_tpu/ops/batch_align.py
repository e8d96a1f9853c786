"""Batched banded alignment driver: buckets jobs, runs the TPU stripe kernel,
backtraces on host, retries boundary hits with doubled bands.

This is the production replacement for per-sequence `map_variations`: all
re-alignment jobs of a merge round (across every merge promise and
reconsensus realignment — reweave.rs:52 par_iter and pangraph_block.rs:295)
become one batch here.
"""
from __future__ import annotations

import logging
import os
import threading as _threading
from dataclasses import dataclass

import numpy as np

from pangraph_tpu.align.params import BandedAlignParams, BandParameters
from pangraph_tpu.graph.edits import Del, Edit, Ins, Sub
from pangraph_tpu.graph.seq import IUPAC_MASK, as_seq
from pangraph_tpu.utils import trace

log = logging.getLogger(__name__)

@dataclass
class AlignJob:
    ref: np.ndarray  # uint8 sequence
    qry: np.ndarray
    band: BandParameters
    hint_events: int = 0  # expected indel event rows (sizes the event buffer)
    # pin-split plan [(r0, r1, q0, q1, ms, bw)] from align/jobsplit.py: the
    # job is aligned as independent pieces with local bands and the piece
    # edits stitched back (shift + concat). None = align whole.
    segments: list = None


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _bucket_rpad(rlen: int) -> int:
    """Length ladder: x1.5 steps to bound padding waste and compilations."""
    size = 256
    while size < rlen + 1:
        size = _round_up(int(size * 1.5), 256)
    return size


def _bucket_b(W: int) -> int:
    return max(_round_up(2 * W + 2, 128), 128)


_PACK_V2 = None


def _pack_v2_jit():
    import jax
    import jax.numpy as jnp

    @jax.jit
    def pack(meta, n_events, rows, words):
        return jnp.concatenate([meta, n_events[:, None], rows, words], axis=1)

    return pack


def _pack_v2(out: dict):
    """One int32 buffer [m, 4 + 1 + 2K] per batch: meta | n_events | rows |
    words — so a whole round's v2 results cross D2H in one device_get."""
    global _PACK_V2
    if _PACK_V2 is None:
        _PACK_V2 = _pack_v2_jit()
    return _PACK_V2(out["meta"], out["n_events"], out["rows"], out["words"])


def _edit_from_rle_hostmatch(ops, n_ops, subs, n_subs, lead_ins, qry) -> Edit:
    """Build an Edit from RLE ops with the host aligner's insertion-strip
    semantics (align/map_variations.edits_from_aligned_pair): deletion runs
    separated only by insertions merge into one Del, because stripping the
    ref-gap (insertion) columns makes them one contiguous query-gap run
    (insertions_strip.rs:47 + nuc_changes.rs:18)."""
    # bulk-convert via tolist(): per-element numpy scalar indexing is ~3x
    # slower and this runs for every job of every round (~1M subs / build)
    sp = subs[:n_subs, 0][::-1].tolist()
    sa = subs[:n_subs, 1][::-1].tolist()
    out_subs = [Sub(p, chr(a)) for p, a in zip(sp, sa)]
    dels, inss = [], []
    rpos = 0
    qpos = lead_ins
    if lead_ins:
        inss.append(Ins(0, bytes(qry[:lead_ins]).decode()))
    op_list = ops[:n_ops, :][::-1].tolist()
    for op, length in op_list:
        if op == 0:  # match
            rpos += length
            qpos += length
        elif op == 2:  # deletion in query
            if dels and dels[-1].end == rpos:
                dels[-1] = Del(dels[-1].pos, dels[-1].len + length)
            else:
                dels.append(Del(rpos, length))
            rpos += length
        else:  # insertion
            inss.append(Ins(rpos, bytes(qry[qpos : qpos + length]).decode()))
            qpos += length
    return Edit(subs=out_subs, dels=dels, inss=inss)


class _DeviceStall(RuntimeError):
    """A device round produced nothing within the watchdog timeout."""


class _BrokerTicket:
    """One submission's slot in a coalesced device round."""

    __slots__ = ("ev", "out", "exc")

    def __init__(self):
        self.ev = _threading.Event()
        self.out = None
        self.exc = None

    def result(self):
        self.ev.wait()
        if self.exc is not None:
            raise self.exc
        return self.out


class TpuBatchAligner:
    """Batched aligner backed by the JAX stripe kernel.

    With `mesh` set (jax.sharding.Mesh over a 'jobs' axis), every bucket
    batch is sharded data-parallel across the mesh via shard_map — each chip
    runs the Pallas stripe kernel on its job shard with no collectives in the
    hot loop (the TPU mapping of the reference's rayon pools, SURVEY.md §2.4)."""

    def __init__(
        self, params: BandedAlignParams = None, extra_band_width: int = 5, max_attempts: int = 4, mesh=None
    ):
        self.params = params or BandedAlignParams()
        self.extra = extra_band_width
        self.max_attempts = max_attempts
        self.mesh = mesh
        self._sharded_cache = {}
        # warm-round throughput estimates (cells/s EMA) for adaptive routing
        self._host_rate = None
        self._dev_rate = None
        self._ckpt_rate = None  # ckpt-kernel cells/s EMA (Mbp-tier dispatch)
        self._dev_lat = self.DEV_LATENCY_S  # per-round device overhead (s)
        # adaptive rounds since the device rate was last observable (ADVICE
        # r3: a starved device share can pin routing host-side forever)
        self._dev_starved = 0
        # gated-round probe period: starts at 8, doubles (to 64) each time a
        # probe slice confirms the device is still below the advantage bar —
        # a persistently awful link costs ever fewer probe slices, while a
        # recovery (gate opens) resets the cadence
        self._probe_period = 8
        import threading

        self._mem_lock = threading.Condition()
        self._mem_outstanding = 0
        # at most one unproven-device probe leg in flight (test-and-set)
        self._probe_lock = threading.Lock()
        self._probe_inflight = False
        # cross-thread device round broker (proven-device path only):
        # concurrent merge threads' device legs coalesce into ONE kernel
        # round — bigger groups amortize the DP's per-row latency (g=64 is
        # ~3x the row rate of g=8 on v5e) and the ~30 ms tunnel latency is
        # paid once per combined round instead of once per thread. While a
        # combined round is in flight, later submissions queue for the next
        # one (natural pipelining). VERDICT r4 item 2.
        self._broker_lock = threading.Lock()
        self._broker_queue = []  # (jobs, widths, kbumps, ticket)
        self._broker_wake = threading.Event()
        self._broker_running = False
        # consecutive cold-round (non-quarantining) watchdog timeouts:
        # escalates to a real quarantine at 3 (a stalled link, not compiles)
        self._cold_timeouts = 0
        self._probe_counts = (0, 0)  # (device, host) cells served by the last probe leg

    def align_many(self, jobs: list) -> list:
        """jobs: list of AlignJob (or (ref, qry, band) tuples). Returns Edits
        in job order. Jobs carrying a pin-split plan (AlignJob.segments) are
        expanded into per-piece jobs and their piece edits stitched back."""
        jobs = [j if isinstance(j, AlignJob) else AlignJob(*j) for j in jobs]
        if any(j.segments for j in jobs):
            flat = []
            plan = []
            for j in jobs:
                if j.segments:
                    entries = []
                    for r0, r1, q0, q1, ms, bw in j.segments:
                        entries.append((len(flat), r0))
                        flat.append(
                            AlignJob(
                                j.ref[r0:r1], j.qry[q0:q1], BandParameters(ms, bw),
                                max(4, j.hint_events // len(j.segments)),
                            )
                        )
                    plan.append(entries)
                else:
                    plan.append([(len(flat), 0)])
                    flat.append(j)
            flat_edits = self.align_many(flat)
            out = []
            for entries in plan:
                if len(entries) == 1 and entries[0][1] == 0:
                    out.append(flat_edits[entries[0][0]])
                    continue
                # single-pass stitch == repeated shift+concat (Edit.concat
                # semantics: insertions at one position merge left-first),
                # without the per-piece intermediate Edits and list copies
                subs, dels, inss = [], [], []
                ins_at = {}
                for slot, r0 in entries:
                    e = flat_edits[slot]
                    if r0:
                        subs.extend(Sub(s.pos + r0, s.alt) for s in e.subs)
                        dels.extend(Del(d.pos + r0, d.len) for d in e.dels)
                    else:
                        subs.extend(e.subs)
                        dels.extend(e.dels)
                    for i in e.inss:
                        p = max(i.pos + r0, 0)
                        k = ins_at.get(p)
                        if k is None:
                            ins_at[p] = len(inss)
                            inss.append(Ins(p, i.seq) if r0 else i)
                        else:
                            inss[k] = Ins(p, inss[k].seq + i.seq)
                out.append(Edit(subs=subs, dels=dels, inss=inss))
            return out
        n = len(jobs)
        results = [None] * n
        # working band width / event-capacity multiplier per job
        widths = [j.band.band_width + self.extra for j in jobs]
        kbumps = [1] * n
        pending = list(range(n))
        attempt = 1
        while pending:
            edits, boundary, overflow = self._run_round(
                [jobs[i] for i in pending], [widths[i] for i in pending], [kbumps[i] for i in pending]
            )
            next_pending = []
            max_w_kernel = (self.MAX_B - 2) // 2
            native_ready = self.NATIVE_CELL_BUDGET > 0 and self._native_lib() is not None
            for slot, idx in enumerate(pending):
                # the kernel clamps bands at max_w_kernel; the native host path
                # has no such cap, so widening past it is useful while the job
                # (at the doubled width) stays under the widen-area guard —
                # the analog of the reference's max_band_area (params.rs:152),
                # except we accept the band-capped alignment instead of
                # erroring out
                widen_cap = max_w_kernel
                if native_ready and self._job_cells(jobs[idx], 2 * widths[idx]) <= self.NATIVE_WIDEN_AREA:
                    widen_cap = self.NATIVE_MAX_W
                can_widen = boundary[slot] and widths[idx] < widen_cap
                retry = (can_widen or overflow[slot]) and attempt < self.max_attempts
                if retry:
                    if can_widen:
                        widths[idx] = max(2 * widths[idx], max(1, abs(jobs[idx].band.mean_shift)))
                    if overflow[slot]:
                        kbumps[idx] *= 4  # divergent pair: raise event capacity
                    next_pending.append(idx)
                elif edits[slot] is None:
                    # retries exhausted with an unusable device result
                    results[idx] = self._host_fallback(jobs[idx])
                else:
                    results[idx] = edits[slot]
            pending = next_pending
            attempt += 1
        return results

    # ------------------------------------------------------------------ impl
    # v2-kernel tiers: R_cap ladder; batch size derived from a paths-buffer
    # budget so each (R_cap, B) tier compiles exactly once
    # 10240 sits between the small tier and 16384 for the dominant pin-split
    # piece regime (~8.2-8.7 kb incl. indel slack): on bandwidth-degraded
    # links the H2D input transfer scales with R_cap, and 10240 lifts that
    # tier's occupancy from ~55% to ~85%
    R_TIERS = (4096, 10240, 16384, 65536, 131072, 262144, 524288, 1048576, 2097152, 4194304)
    V2_BYTES = 2 * 1024 * 1024 * 1024  # per-batch paths-buffer budget (v2 kernel)
    # paths bytes/problem beyond which the checkpointed DP + window re-derive
    # walk is FORCED (HBM holds carries, ~20-100x smaller; kernel-parity
    # tested, tests/test_stripe_ckpt.py). This env threshold is an explicit
    # override only: since r4, tiers too big for the v2 kernel's HBM budget
    # are routed to the ckpt kernel ADAPTIVELY (_ckpt_competitive — measured
    # ckpt rate vs host EMA, first round is the probe), so healthy chips run
    # Mbp jobs on device with no env var, while a stalled/slow tunnel fails
    # over to host via the watchdog + rates (r2/r3 history: a constant here
    # calibrated to one broken link once pinned all Mbp work host-side).
    CKPT_PATHS_BYTES = int(float(os.environ.get("PANGRAPH_TPU_CKPT_BYTES", 1e18)))
    HBM_BUDGET = 10 * 1024 * 1024 * 1024  # total outstanding paths bytes across threads
    # widest kernel band bucket (bands beyond this are clamped to the bucket
    # and routed host-ward when the widen gate allows): B=2048 = W<=1023,
    # validated on v5e (DP VMEM out block 8x128x2176 int16 double-buffered
    # = 8.9 MB; ckpt walk window 8x128x2176 int16 = 4.5 MB)
    MAX_B = 2048

    # adaptive host/device dispatch: the device link costs ~30-50 ms latency
    # per round (axon tunnel), while the native C++ aligner does ~0.5 Gcells/s
    # per host core — rounds whose total DP area is below this budget finish
    # faster on host than the device round-trip latency alone.
    NATIVE_CELL_BUDGET = int(float(os.environ.get("PANGRAPH_TPU_NATIVE_BUDGET", 100e6)))
    NATIVE_MAX_W = 1 << 20
    # band-doubling stops once a retry would exceed this DP area (~10 s of
    # host compute); the band-capped alignment is accepted instead
    NATIVE_WIDEN_AREA = int(float(os.environ.get("PANGRAPH_TPU_NATIVE_WIDEN_AREA", 5e9)))
    # per-job traceback-paths budget for the native aligner (host RAM)
    NATIVE_PATHS_BYTES = 8 << 30
    # device-fetch watchdog: a device round that produces nothing for this
    # long (plus a rate-scaled term) is declared stalled — the round reruns
    # on host and every later round routes host-ward. Tunneled chips have
    # been observed to stall indefinitely mid-build (r3: >25 min with ~0
    # host CPU); without the watchdog that hangs the whole build. The first
    # fetch of a new kernel shape may be serving a remote compile (~2 min on
    # the tunnel, and dispatch does not block), so it gets the long budget;
    # warm shapes get the short one.
    FETCH_TIMEOUT_S = float(os.environ.get("PANGRAPH_TPU_FETCH_TIMEOUT", 45.0))
    FETCH_TIMEOUT_COLD_S = float(os.environ.get("PANGRAPH_TPU_FETCH_TIMEOUT_COLD", 300.0))
    # half-open quarantine: a stall flips DEVICE_UNHEALTHY and starts a
    # backoff re-probe daemon; a successful tiny H2D+D2H round trip restores
    # device routing (r3's policy latched permanently — one slow init probe
    # at t=0 removed the TPU for an entire multi-hour build on this
    # environment's known-flaky tunnel)
    DEVICE_UNHEALTHY = False  # class-level: flipped by the watchdog
    DEVICE_EVER_STALLED = False  # sticky: exit-teardown guard (bench/CLI)
    QUARANTINE_LOG: list = []  # (unix_t, event, detail) — persisted by bench
    REPROBE_S = float(os.environ.get("PANGRAPH_TPU_REPROBE", 30.0))
    _REPROBE_LOCK = _threading.Lock()
    _REPROBE_WAKE = _threading.Event()
    _reprobe_running = False
    _ENGINE_LOCK = _threading.Lock()
    _SHAPES_WARM: set = set()  # kernel shapes fetched successfully before
    # per-engine DP-cell accounting (always on; integers are cheap):
    # engine -> [cells_total, warm_cells, warm_secs]. "warm" excludes rounds
    # that compiled a new kernel shape, so warm_gcells_per_s is a real
    # throughput, while cells_total answers "what fraction of DP ran where".
    ENGINE = {"host": [0, 0, 0.0], "device": [0, 0, 0.0]}

    @classmethod
    def _engine_count(cls, engine: str, cells: int, warm_cells: int, warm_secs: float) -> None:
        with cls._ENGINE_LOCK:
            e = cls.ENGINE[engine]
            e[0] += cells
            e[1] += warm_cells
            e[2] += warm_secs

    @classmethod
    def engine_report(cls) -> dict:
        """Per-engine DP-cell fractions and warm throughput (bench receipts)."""
        out = {}
        for k, (c, wc, ws) in cls.ENGINE.items():
            out[k] = {
                "cells": int(c),
                "warm_cells": int(wc),
                "warm_secs": round(ws, 3),
                "warm_gcells_per_s": round(wc / ws / 1e9, 3) if ws > 0 else None,
            }
        tot = sum(v[0] for v in cls.ENGINE.values())
        out["device_cells_frac"] = round(cls.ENGINE["device"][0] / tot, 4) if tot else None
        out["quarantine_log"] = list(cls.QUARANTINE_LOG)
        return out

    @classmethod
    def reset_engine_stats(cls) -> None:
        # cell counters reset per measured run; the quarantine log is
        # process-level history and is deliberately kept (a bench whose
        # device stalled at init must say so in its receipts)
        with cls._ENGINE_LOCK:
            for e in cls.ENGINE.values():
                e[0] = e[1] = 0
                e[2] = 0.0

    @classmethod
    def _quarantine(cls, reason: str) -> None:
        import time as _t

        cls.DEVICE_UNHEALTHY = True
        cls.DEVICE_EVER_STALLED = True
        cls.QUARANTINE_LOG.append((round(_t.time(), 1), "quarantine", reason))
        with cls._REPROBE_LOCK:
            if cls._reprobe_running:
                # a loop thread exists (possibly mid-backoff-sleep from an
                # earlier quarantine): wake it so the backoff restarts
                cls._REPROBE_WAKE.set()
                return
            cls._reprobe_running = True
        import threading

        threading.Thread(target=cls._reprobe_loop, daemon=True, name="device-reprobe").start()

    @classmethod
    def _probe_link(cls, timeout: float):
        """Tiny H2D+D2H round trip on a daemon thread. Returns the backend
        kind, or None if the link stalled or errored within `timeout`."""
        import threading

        box = {}
        done = threading.Event()

        def probe():
            try:
                import jax
            except Exception:
                # no jax at all: classify "cpu" (host routing) instead of
                # quarantining and re-probing a jax-less box forever
                box["v"] = "cpu"
                done.set()
                return
            try:
                kind = jax.default_backend()
            except Exception:
                # backend init RAISED (a tunnel restart raises instead of
                # hanging): transient link trouble — report a stall so the
                # backoff re-probe keeps trying; classifying it "cpu" would
                # latch host routing for the whole build
                done.set()
                return
            try:
                import time as _t

                t0 = _t.time()
                np.asarray(jax.device_put(np.arange(16, dtype=np.int32)))
                elapsed = _t.time() - t0
                if kind == "tpu" and elapsed <= timeout:
                    # measured data-path round trip: feeds the routing
                    # gate's per-round overhead model (a 16-40 ms healthy
                    # link and a ~200 ms degraded one need very different
                    # mixed/host-only decisions). ABANDONED probes (elapsed
                    # beyond their own timeout — e.g. chip-reclaim zombies
                    # completing minutes later) must not write: a stale
                    # 60-120 s value would pin the model at the cap for the
                    # whole build. Fast device rounds decay a too-high
                    # estimate back down (_observe_rate).
                    cls.MEASURED_RTT = elapsed
                box["v"] = kind
            except Exception:
                # a TRANSFER error on a tpu backend is transient link
                # trouble (tunnel restart raises instead of hanging):
                # report a stall so the backoff re-probe keeps trying —
                # classifying it "cpu" would latch host routing for the
                # whole build (the r3 regression)
                box["v"] = None if kind == "tpu" else "cpu"
            done.set()

        threading.Thread(target=probe, daemon=True, name="device-probe").start()
        if not done.wait(timeout):
            return None
        return box.get("v")

    @classmethod
    def _reprobe_loop(cls) -> None:
        import time as _t

        # outer loop guards against a lost wakeup: a _quarantine() racing our
        # exit (it saw _reprobe_running still True and only set the wake
        # event) must find the daemon still on duty, or the device would be
        # latched permanently with no re-prober — the exact regression the
        # half-open design exists to fix
        try:
            while True:
                delay = cls.REPROBE_S
                while cls.DEVICE_UNHEALTHY:
                    cls._REPROBE_WAKE.clear()
                    if cls._REPROBE_WAKE.wait(delay):
                        # re-quarantined while sleeping: restart the backoff
                        delay = cls.REPROBE_S
                        continue
                    if not cls.DEVICE_UNHEALTHY:
                        break
                    kind = cls._probe_link(timeout=15.0)
                    if kind is not None:
                        cls._device_kind_cache = kind
                        cls.DEVICE_UNHEALTHY = False
                        cls.QUARANTINE_LOG.append((round(_t.time(), 1), "recovered", kind))
                        log.warning("device link recovered: restoring device routing")
                        break
                    delay = min(delay * 2, 300.0)
                with cls._REPROBE_LOCK:
                    # linearized with _quarantine's check: only stand down
                    # while provably healthy
                    if not cls.DEVICE_UNHEALTHY:
                        cls._reprobe_running = False
                        return
        except BaseException:
            # never die with _reprobe_running latched True (a future
            # _quarantine could then never respawn a re-prober)
            with cls._REPROBE_LOCK:
                cls._reprobe_running = False
            log.warning("device re-probe daemon crashed; a later stall will restart it", exc_info=True)
            raise

    @staticmethod
    def _job_cells(job: AlignJob, W: int) -> int:
        rlen, qlen = len(job.ref), len(job.qry)
        return (rlen + 1) * min(2 * W + 2, qlen + 1)

    def _native_lib(self):
        from pangraph_tpu import native

        return native.get_lib()

    _device_kind_cache = None

    @classmethod
    def _device_kind(cls) -> str:
        """Backend kind, resolved on a daemon thread with a timeout: backend
        INITIALIZATION itself can hang on a stalled tunnel (observed r3:
        a bench blocked inside the first jax.default_backend() with ~0 CPU).
        On timeout the device is quarantined and the host path serves."""
        if cls._device_kind_cache is None:
            # the probe exercises the DATA PATH too: init can succeed while
            # transfers hang (observed r3) — a tiny H2D+D2H round trip
            # catches that here, for the cost of ~1 ms on healthy hardware,
            # instead of a cold-round timeout. Default 20 s, not r3's 120:
            # a healthy idle tunnel inits in <1 s, while a chip still held
            # by a dead predecessor process takes 60-120 s to be reclaimed
            # (measured r4) — with the half-open re-probe it is strictly
            # better to start on host immediately and let the daemon
            # restore device routing when the chip frees, than to block the
            # whole build's start behind the reclaim.
            kind = cls._probe_link(float(os.environ.get("PANGRAPH_TPU_INIT_TIMEOUT", 20.0)))
            if kind is None:
                log.warning("device backend initialization stalled: using the host aligner")
                cls._quarantine("backend initialization stalled")
                cls._device_kind_cache = "cpu"
            else:
                cls._device_kind_cache = kind
        return cls._device_kind_cache

    STATS = []  # (kind, n_jobs, cells, seconds, ref_bp) when PANGRAPH_TPU_ALIGN_STATS=1

    # rounds below this DP area are latency-dominated: not usable as
    # throughput observations for the adaptive host/device split
    RATE_MIN_CELLS = 50_000_000
    # per-round device overhead (tunnel dispatch+fetch latency + host-side
    # pack/decode floor), seconds. Measured 16-40 ms on the axon tunnel;
    # ~1 ms on local silicon. Subtracted from warm-round walls when
    # observing the device rate (so _dev_rate is a SLOPE, cells/s beyond
    # the per-round cost) and charged back when predicting a round's wall.
    DEV_LATENCY_S = float(os.environ.get("PANGRAPH_TPU_DEV_LATENCY", 0.03))
    # tiny H2D+D2H round trip measured by the link probe (None until one
    # succeeds); the gate uses max(DEV_LATENCY_S, MEASURED_RTT), capped at
    # 1 s so a slow one-time init can't model the link as unusable forever
    MEASURED_RTT = None
    # mixed host+device routing must be PREDICTED to beat host-only by this
    # factor before the device gets a share (VERDICT r4: break-even device
    # participation made the 46 Mbp build slower than host-only — retries
    # and round barriers eat any split whose predicted win is marginal)
    MIXED_GUARANTEE = float(os.environ.get("PANGRAPH_TPU_MIXED_GUARANTEE", 0.85))
    # ...and the device slope must beat the host rate outright by this
    # factor. The overlap model alone predicts a ~2x win even at EQUAL
    # rates, but measured break-even runs (r4: 75 s, and a same-regime 63 s
    # run in r5) show the overlap benefit does not materialize — round
    # barriers, decode, and band-cap retries eat it. Healthy windows
    # measure d/h = 1.8-2.8x and pass easily.
    DEVICE_MIN_ADVANTAGE = float(os.environ.get("PANGRAPH_TPU_DEVICE_MIN_ADVANTAGE", 1.3))
    # unproven-device probe: until a warm device rate is observed, each
    # round's device share is capped at this many cells, and the device leg
    # is detachable — if it lags PROBE_WAIT_S (a remote compile on a
    # cold/just-recovered link), its jobs are reassigned to host and the
    # leg left running as pure warm-up. Measured r4: a tunnel that
    # recovered mid-build took 4.3 Gcells cold and tripled the wall
    # without this guard.
    DEV_PROBE_CELLS = int(float(os.environ.get("PANGRAPH_TPU_DEV_PROBE_CELLS", 400e6)))
    PROBE_WAIT_S = float(os.environ.get("PANGRAPH_TPU_PROBE_WAIT", 20.0))

    def _observe_rate(self, which: str, cells: int, secs: float) -> None:
        if cells < self.RATE_MIN_CELLS or secs <= 0:
            return
        if which == "dev":
            # the device rate EMA is a SLOPE: per-round overhead (latency +
            # pack/decode floor) is modeled separately, so a round's wall is
            # predicted as overhead + cells/_dev_rate
            L = self._effective_dev_lat()
            if secs < L:
                # the round beat the modeled overhead outright: the RTT
                # estimate is stale (e.g. a slow init probe on a link that
                # later recovered) — decay it toward the observed wall.
                # Review finding: without this, nothing ever re-lowers
                # MEASURED_RTT and the gate stays pinned pessimistic.
                type(self).MEASURED_RTT = max(secs * 0.5, 1e-3)
                return
            if secs <= 1.5 * L:
                # overhead-dominated observation: subtracting L would leave
                # a tiny residual and record an absurd slope, which would
                # then DEFEAT the never-lose gate (review finding: inflated
                # d makes mixed_wall ~= L and hands the device everything)
                return
            secs -= L
        obs = cells / secs
        attr = "_host_rate" if which == "host" else "_dev_rate"
        prev = getattr(self, attr)
        setattr(self, attr, obs if prev is None else 0.5 * prev + 0.5 * obs)
        if which == "dev":
            self._dev_starved = 0

    def _effective_dev_lat(self) -> float:
        """Modeled per-round device overhead: the env/default floor, raised
        to the probe-measured tiny round trip (capped at 1 s)."""
        L = self._dev_lat
        if self.MEASURED_RTT is not None:
            L = max(L, min(self.MEASURED_RTT, 1.0))
        return L

    def _ckpt_competitive(self) -> bool:
        """Should an oversized (Mbp) tier ride the checkpointed kernel?
        Yes when the device is believed healthy and the measured ckpt rate
        beats the measured host rate; the first such round (no ckpt
        observation yet) is the probe. Measured on v5e: ckpt 2.9-4.5
        Gcells/s on-device vs 0.5-0.9 Gcells/s for 2 host cores."""
        if self.DEVICE_UNHEALTHY or self._device_kind() != "tpu":
            return False
        if self._ckpt_rate is None:
            return True
        return self._ckpt_rate > (self._host_rate or 0.0)

    def _run_round(self, jobs: list, widths: list, kbumps: list = None):
        """Route each job of the round to host C++ or the device kernel.

        The device link costs ~30-50 ms latency per round and the device
        clamps bands at max_w_kernel; the host aligner is latency-free but
        ~0.5 Gcells/s. Smallest jobs fill a host budget (they ride along for
        free while the device round is in flight); jobs whose band exceeds
        the kernel clamp but fit the budget are forced to host so retries
        make progress instead of re-running clamped."""
        n = len(jobs)
        kbumps = kbumps or [1] * n
        use_native = self.NATIVE_CELL_BUDGET > 0 and self._native_lib() is not None
        budget = self.NATIVE_CELL_BUDGET
        if use_native and self.DEVICE_UNHEALTHY:
            budget = 1 << 62  # watchdog fired earlier: keep everything on host
        if use_native and self._device_kind() != "tpu":
            # no accelerator: the kernel would run in Pallas interpret mode,
            # which is never competitive with the native host aligner
            budget = 1 << 62
        t0 = 0.0
        stats = bool(os.environ.get("PANGRAPH_TPU_ALIGN_STATS"))
        if stats:
            import time as _time

            t0 = _time.time()
        if not use_native:
            out = self._dispatch_device(jobs, widths, kbumps)
            if stats:
                cells = sum(self._job_cells(j, w) for j, w in zip(jobs, widths))
                self.STATS.append(("v2", n, cells, _time.time() - t0, sum(len(j.ref) for j in jobs)))
            return out

        max_w_kernel = (self.MAX_B - 2) // 2
        cells = [self._job_cells(j, w) for j, w in zip(jobs, widths)]
        # adaptive split: once both engines have measured warm rates, the
        # device participates ONLY when its slope beats the host rate by
        # DEVICE_MIN_ADVANTAGE and the modeled mixed wall beats host-only
        # by MIXED_GUARANTEE (measured twice: the overlap win never
        # materializes at break-even). Otherwise rounds run host-only,
        # with an exponentially backed-off probe slice so a recovered
        # link can re-earn its share; a fully stalled link is quarantined
        # by the watchdog.
        if budget < (1 << 62) and self._dev_rate is None:
            if self._probe_inflight:
                # a probe leg is still compiling/running: everything host
                budget = 1 << 62
            else:
                # unproven device (cold start or just recovered): the host
                # takes the bulk, the device a bounded probe share
                budget = max(budget, sum(cells) - self.DEV_PROBE_CELLS)
        if budget < (1 << 62) and self._host_rate and self._dev_rate:
            # latency-aware split (VERDICT r4): the device leg's wall is
            # _dev_lat + dev_cells/_dev_rate. The split that equalizes both
            # legs gives the host Ch = h*(L*d + C)/(d + h); the predicted
            # mixed wall is Ch/h. The device participates ONLY when that
            # beats the host-only wall by MIXED_GUARANTEE — mixed mode must
            # never lose to host-only (r4's 75 s vs 38 s regression).
            C = sum(cells)
            h, d = self._host_rate, self._dev_rate
            L = self._effective_dev_lat()
            host_only_wall = C / h
            mixed_wall = (L * d + C) / (d + h)
            if d >= self.DEVICE_MIN_ADVANTAGE * h and mixed_wall < host_only_wall * self.MIXED_GUARANTEE:
                self._probe_period = 8
                budget = max(budget, int(h * (L * d + C) / (d + h)))
                # anti-stickiness (ADVICE r3): a transient device slowdown
                # can shrink the device share below RATE_MIN_CELLS, after
                # which _dev_rate is never re-observed and routing cannot
                # recover. After 8 such rounds, shrink the host share once
                # so the device gets a rate-measurable probe round.
                if C >= 2 * self.RATE_MIN_CELLS:
                    if C - budget < self.RATE_MIN_CELLS:
                        self._dev_starved += 1
                        if self._dev_starved >= 8:
                            budget = min(budget, C - self.RATE_MIN_CELLS)
                            self._dev_starved = 0
            else:
                # device predicted not to help this round: host-only. Every
                # _probe_period-th such round of measurable size gives the
                # device a rate-observation slice anyway, so a recovered/
                # faster link can re-earn its share instead of staying gated
                # forever; the period doubles (to 64) while the link keeps
                # failing the bar, so an awful day costs ever fewer slices.
                self._dev_starved += 1
                if self._dev_starved >= self._probe_period and C >= 2 * self.RATE_MIN_CELLS:
                    # CAP the host budget so the device slice is at least
                    # RATE_MIN_CELLS — max() here would let a small round's
                    # host budget squeeze the slice below the observable
                    # threshold, resetting the counter without ever
                    # measuring a rate (review finding)
                    budget = C - self.RATE_MIN_CELLS
                    self._dev_starved = 0
                    self._probe_period = min(self._probe_period * 2, 64)
                else:
                    budget = 1 << 62
        native_set = set()
        acc = 0
        for i in sorted(range(n), key=lambda i: cells[i]):
            if acc + cells[i] > budget:
                break
            native_set.add(i)
            acc += cells[i]
        for i in range(n):
            # device would clamp this band; host is the only path that widens.
            # The gate must match align_many's widen predicate (NATIVE_WIDEN_AREA,
            # not the small latency budget), or jobs between the two thresholds
            # get widened, re-clamped on device, and burn max_attempts retrying
            # identical rounds.
            if widths[i] > max_w_kernel and cells[i] <= self.NATIVE_WIDEN_AREA:
                native_set.add(i)
        dev_idx = [i for i in range(n) if i not in native_set]
        nat_idx = [i for i in range(n) if i in native_set]

        edits = [None] * n
        boundary = [False] * n
        overflow = [False] * n
        import time as _t

        nat_cells = sum(cells[i] for i in nat_idx)
        dev_cells = sum(cells[i] for i in dev_idx)

        def run_native():
            tn = _t.time()
            e, b, _ = self._run_round_native([jobs[i] for i in nat_idx], [widths[i] for i in nat_idx])
            self._observe_rate("host", nat_cells, _t.time() - tn)
            for s, i in enumerate(nat_idx):
                edits[i], boundary[i] = e[s], b[s]

        def run_device(d_jobs, d_widths, d_kbumps, count=True):
            warm_before = len(self._SHAPES_WARM)
            td = _t.time()
            out = self._dispatch_device(d_jobs, d_widths, d_kbumps, count=count)
            # rate observations only from warm rounds (no compile in the wall)
            if len(self._SHAPES_WARM) == warm_before and not self.DEVICE_UNHEALTHY:
                self._observe_rate("dev", dev_cells, _t.time() - td)
            return out

        if dev_idx and self._dev_rate is None:
            # PROBE MODE (with or without a host leg — a round none of whose
            # jobs fit the host budget must not bypass the cap/detach either):
            # the device is unproven — run its (bounded) leg on
            # a detachable daemon thread. If it lags PROBE_WAIT_S past the
            # host leg (remote compile on a cold link), reassign its jobs to
            # host and leave the leg running as pure warm-up: it still
            # records _SHAPES_WARM and the device-rate EMA on completion,
            # so a later round can route proportionally. At most ONE probe
            # leg is in flight per aligner (a cold link would otherwise
            # stack a new compiling leg + a PROBE_WAIT_S stall per round).
            import threading as _th

            with self._probe_lock:
                spawn = not self._probe_inflight
                if spawn:
                    self._probe_inflight = True
            if not spawn:
                # lost the race to another merge thread's leg: everything is
                # host-bound and known so up front — serve the WHOLE round
                # as one threaded native batch instead of per-job fallbacks
                tn = _t.time()
                e, b, _ = self._run_round_native(jobs, widths)
                self._observe_rate("host", sum(cells), _t.time() - tn)
                if stats:
                    self.STATS.append(
                        (
                            f"host[probe-wait,n={n}]", n, sum(cells),
                            _time.time() - t0, sum(len(j.ref) for j in jobs),
                        )
                    )
                return e, b, [False] * n

            box = {}
            done_ev = _th.Event()
            d_args = (
                [jobs[i] for i in dev_idx], [widths[i] for i in dev_idx], [kbumps[i] for i in dev_idx]
            )

            def probe_leg():
                try:
                    box["v"] = run_device(*d_args, count=False)
                except BaseException as ex:
                    box["e"] = ex
                finally:
                    done_ev.set()
                    with self._probe_lock:
                        self._probe_inflight = False

            t_leg = _t.time()
            _th.Thread(target=probe_leg, daemon=True, name="device-probe-leg").start()
            if nat_idx:
                run_native()
            if done_ev.wait(self.PROBE_WAIT_S) and "v" in box:
                leg_wall = _t.time() - t_leg
                e, b, o = box["v"]
                for s, i in enumerate(dev_idx):
                    edits[i], boundary[i], overflow[i] = e[s], b[s], o[s]
                # count only what the leg actually SERVED (its internal host
                # fallbacks count as host), and never as warm throughput —
                # probe rounds may include compile time
                dev_served, host_served = getattr(self, "_probe_counts", (0, 0))
                self._engine_count("device", dev_served, 0, 0.0)
                if host_served:
                    self._engine_count("host", host_served, 0, 0.0)
                # SEED the device-rate EMA from the leg's wall (pessimistic:
                # may include a compile). Without this, a large build whose
                # every round touches >=1 cold shape never observes a warm
                # rate, stays in probe mode for its whole duration, and pays
                # a PROBE_WAIT_S stall per lagging round (measured r4: 90 s
                # vs 54 s on the 46 Mbp mixed build). Warm-round
                # observations then correct the EMA upward.
                self._observe_rate("dev", dev_served, leg_wall)
            else:
                if "e" in box:
                    log.warning(
                        "device probe leg failed (%r): serving %d jobs from host",
                        box.get("e"), len(dev_idx),
                    )
                else:
                    log.info(
                        "device probe leg lagging (> %.0f s): reassigning %d jobs to host; "
                        "the leg continues as warm-up", self.PROBE_WAIT_S, len(dev_idx),
                    )
                for i in dev_idx:
                    edits[i] = self._host_fallback(jobs[i])
        elif dev_idx and nat_idx:
            # overlap: submit the device leg to the broker (it may coalesce
            # with sibling threads' legs into one kernel round), run the
            # host leg meanwhile, then collect
            tk = self._broker_submit(
                [jobs[i] for i in dev_idx], [widths[i] for i in dev_idx], [kbumps[i] for i in dev_idx]
            )
            run_native()
            e, b, o = tk.result()
            for s, i in enumerate(dev_idx):
                edits[i], boundary[i], overflow[i] = e[s], b[s], o[s]
        elif nat_idx:
            run_native()
        else:
            tk = self._broker_submit(list(jobs), list(widths), list(kbumps))
            e, b, o = tk.result()
            edits, boundary, overflow = list(e), list(b), list(o)
        if stats:
            self.STATS.append(
                (
                    f"mixed[n={len(nat_idx)},d={len(dev_idx)}]", n, sum(cells),
                    _time.time() - t0, sum(len(j.ref) for j in jobs),
                )
            )
        return edits, boundary, overflow

    def _dispatch_device(self, jobs: list, widths: list, kbumps: list = None, count: bool = True):
        # count=False: a probe leg whose results may be discarded — the
        # caller records the engine receipt only if it uses the results
        return self._run_round_v2(jobs, widths, kbumps or [1] * len(jobs), count=count)

    # ------------------------------------------------- device round broker
    # Coalesces concurrent merge threads' device legs into one kernel round
    # (proven-device path only; probe/cold machinery is untouched). Gains:
    # bigger groups amortize the stripe DP's per-row latency (g=64 ~3x the
    # row rate of g=8 on v5e), the ~16-40 ms tunnel latency is paid once
    # per combined round, and rate observations clear RATE_MIN_CELLS more
    # often. While one combined round is in flight, later submissions queue
    # for the next (pipelining). VERDICT r4 item 2.
    BROKER_GATHER_S = float(os.environ.get("PANGRAPH_TPU_BROKER_GATHER", 0.008))

    def _broker_submit(self, d_jobs: list, d_widths: list, d_kbumps: list) -> _BrokerTicket:
        tk = _BrokerTicket()
        with self._broker_lock:
            self._broker_queue.append((d_jobs, d_widths, d_kbumps, tk))
            spawn = not self._broker_running
            if spawn:
                self._broker_running = True
            self._broker_wake.set()
        if spawn:
            _threading.Thread(target=self._broker_loop, daemon=True, name="device-broker").start()
        return tk

    def _broker_loop(self) -> None:
        import time as _t

        try:
            while True:
                with self._broker_lock:
                    batch = self._broker_queue
                    self._broker_queue = []
                    if not batch:
                        self._broker_wake.clear()
                if not batch:
                    # idle: linger briefly for the next round, then stand
                    # down (a later submit respawns the thread)
                    if not self._broker_wake.wait(2.0):
                        with self._broker_lock:
                            if not self._broker_queue:
                                self._broker_running = False
                                return
                    continue
                if len(batch) == 1:
                    # brief gather window: a sibling merge thread's round
                    # usually arrives within a few ms of the first
                    _t.sleep(self.BROKER_GATHER_S)
                    with self._broker_lock:
                        batch += self._broker_queue
                        self._broker_queue = []
                jobs, widths, kbumps, slices = [], [], [], []
                for jj, ww, kk, tk in batch:
                    slices.append((len(jobs), len(jj), tk))
                    jobs += jj
                    widths += ww
                    kbumps += kk
                warm_before = len(self._SHAPES_WARM)
                t0 = _t.time()
                # the WHOLE per-batch path (dispatch, rate observation, and
                # result slicing) completes every ticket on any exception —
                # a ticket left unset would hang its merge thread forever
                # (tk.result() waits without a timeout)
                try:
                    e, b, o = self._dispatch_device(jobs, widths, kbumps)
                    dt = _t.time() - t0
                    if len(self._SHAPES_WARM) == warm_before and not self.DEVICE_UNHEALTHY:
                        cells = sum(self._job_cells(j, w) for j, w in zip(jobs, widths))
                        self._observe_rate("dev", cells, dt)
                    for s0, n, tk in slices:
                        tk.out = (e[s0 : s0 + n], b[s0 : s0 + n], o[s0 : s0 + n])
                except BaseException as ex:
                    for _s0, _n, tk in slices:
                        if tk.out is None:
                            tk.exc = ex
                finally:
                    for _s0, _n, tk in slices:
                        tk.ev.set()
        except BaseException:
            # never die with tickets (or the running flag) latched
            with self._broker_lock:
                self._broker_running = False
                queued = self._broker_queue
                self._broker_queue = []
            for *_, tk in queued:
                tk.exc = RuntimeError("device broker crashed")
                tk.ev.set()
            log.warning("device broker crashed; later rounds respawn it", exc_info=True)
            raise

    def _run_round_native(self, jobs: list, widths: list):
        """Host C++ round: banded stripe DP + traceback per job, threaded
        across host cores (native/stripe.cpp). Same stripe geometry and tie
        rules as the host aligner; edits match map_variations exactly."""
        from pangraph_tpu.native import stripe_align_batch_native

        import time as _t

        t_eng = _t.time()
        eng_cells = sum(self._job_cells(j, int(w)) for j, w in zip(jobs, widths))
        n = len(jobs)
        refs = [j.ref for j in jobs]
        qrys = [j.qry for j in jobs]
        ms = np.array([j.band.mean_shift for j in jobs], dtype=np.int64)
        W = np.array(widths, dtype=np.int64)
        max_len = max(max(len(j.ref), len(j.qry)) for j in jobs)
        ops_cap = min(65536, 256 + max_len // 8)
        subs_cap = min(262144, 256 + max_len // 4)
        # keep the flat output buffers bounded (~256 MB)
        while n * (ops_cap * 8 + subs_cap * 16) > 256 * 1024 * 1024 and ops_cap > 256:
            ops_cap //= 2
            subs_cap //= 2
        with trace.span("align.native"):
            out = stripe_align_batch_native(
                refs, qrys, ms, W, self.params, IUPAC_MASK,
                max_paths_bytes=self.NATIVE_PATHS_BYTES, ops_cap=ops_cap, subs_cap=subs_cap,
            )
        edits = [None] * n
        boundary = [False] * n
        for s in range(n):
            st = int(out["status"][s])
            if st == 0:
                boundary[s] = bool(out["boundary"][s])
                edits[s] = _edit_from_rle_hostmatch(
                    out["ops"][s], int(out["n_ops"][s]), out["subs"][s], int(out["n_subs"][s]),
                    int(out["lead_ins"][s]), jobs[s].qry,
                )
            elif st == 1:  # dead walk / out of band: widen and retry
                boundary[s] = True
            elif st == 2:  # output overflow: single-job retry with big caps
                single = stripe_align_batch_native(
                    [jobs[s].ref], [jobs[s].qry], ms[s : s + 1], W[s : s + 1],
                    self.params, IUPAC_MASK,
                    max_paths_bytes=self.NATIVE_PATHS_BYTES, ops_cap=1 << 20, subs_cap=1 << 21,
                )
                if single is not None and int(single["status"][0]) == 0:
                    boundary[s] = bool(single["boundary"][0])
                    edits[s] = _edit_from_rle_hostmatch(
                        single["ops"][0], int(single["n_ops"][0]), single["subs"][0],
                        int(single["n_subs"][0]), int(single["lead_ins"][0]), jobs[s].qry,
                    )
                elif single is not None and int(single["status"][0]) == 1:
                    boundary[s] = True
                else:
                    edits[s] = self._host_fallback(jobs[s], count=False)
            else:  # paths over budget: numpy fallback
                edits[s] = self._host_fallback(jobs[s], count=False)
        self._engine_count("host", eng_cells, eng_cells, _t.time() - t_eng)
        return edits, boundary, [False] * n

    def _run_round_v2(self, jobs: list, widths: list, kbumps: list, count: bool = True):
        """v2 kernel round: static-op DP + run-jump walk + event compaction.
        One device_get moves every batch's packed results (meta + event
        rows/words) across the D2H link; decode is host-side RLE + vectorized
        sub extraction (ops/stripe_v2.py)."""
        from pangraph_tpu.ops.stripe_v2 import ckpt_layout

        n = len(jobs)
        edits = [None] * n
        boundary = [False] * n
        overflow = [False] * n
        groups = {}
        fallback_idx = []  # jobs beyond device capacity: host, overlapped
        max_w = (self.MAX_B - 2) // 2
        for i, W in enumerate(widths):
            j = jobs[i]
            corner = abs(len(j.qry) - len(j.ref) + j.band.mean_shift) + 1
            W_eff = max(W, corner)
            # clamp to the kernel's widest band and accept the boundary-capped
            # alignment: still a valid edit path (the roundtrip oracle holds),
            # just band-limited. The reference errors out here instead once
            # band area exceeds max_band_area (params.rs:152) — clamping is
            # strictly more robust, and wide-band jobs stay off the slow host.
            W_eff = min(W_eff, max_w)
            B = _bucket_b(W_eff)  # multiple of DP_C=128, as the DP requires
            L = max(len(j.ref), len(j.qry))
            tier = next((t for t in self.R_TIERS if t >= L + 2), None)
            if tier is None or corner > max_w:
                # beyond the largest tier, or length mismatch so large the end
                # corner can't sit inside the widest band
                fallback_idx.append(i)
                continue
            groups.setdefault((tier, B), []).append(i)

        # plan every sub-batch first, then take ONE memory grant for the whole
        # round: per-batch grants can deadlock two concurrent rounds that each
        # wait while holding earlier batches' bytes
        planned = []  # (sub, g_sz, m_pad, R_cap, B, K, bytes, ckpt)
        for (R_cap, B), idxs in groups.items():
            per_problem = R_cap * (B + 128) * 2  # int16 paths bytes
            use_ckpt = per_problem > self.CKPT_PATHS_BYTES  # explicit opt-in
            if not use_ckpt and 8 * per_problem > self.HBM_BUDGET // 2:
                # the v2 kernel cannot hold even a minimum-size group of this
                # tier in HBM. r3 sent these jobs to host unconditionally
                # (a constant calibrated to one broken tunnel); decide
                # adaptively instead: route through the checkpointed kernel
                # when the measured ckpt rate beats the measured host rate
                # (or no ckpt observation exists yet — the first round is the
                # probe; the watchdog + half-open quarantine bound the cost
                # of a stalled link).
                use_ckpt = self._ckpt_competitive()
            ck = None
            if use_ckpt:
                # Mbp-scale tier: checkpointed DP + window re-derive walk —
                # HBM holds window-start carries instead of full path records
                try:
                    WV, n_qb = ckpt_layout(B)
                except ValueError:
                    # band too wide for the walk's VMEM window: host path
                    fallback_idx.extend(idxs)
                    continue
                ck = (WV // 128, n_qb)
                per_problem = (R_cap // WV) * 3 * (B + 128) * 4
            # the DP is LATENCY-bound per row (a serial ~30-op dependency
            # chain costs ~1 us regardless of band width), so larger groups
            # amortize it across more VREG rows: g=64 is ~3x the row rate of
            # g=8 at B=128 (measured on v5e). Start wide but never beyond the
            # actual batch (padding problems share the group's row count, so
            # a 6-job round in a g=64 group would compute 10x waste rows);
            # the HBM and VMEM guards trim further.
            g_sz = 8
            while g_sz < 64 and g_sz * 2 <= len(idxs):
                g_sz *= 2
            while g_sz > 8 and g_sz * per_problem > self.V2_BYTES:
                g_sz //= 2  # floor at one sublane tile: sub-tile kernels hang Mosaic
            # VMEM: the DP out block is (g, 128, B+128) int16, double-buffered;
            # keep g*(B+128) at or under 20480 lanes or wide bands blow the
            # 16 MB scoped-VMEM limit (measured on v5e: 20480 lanes compiles,
            # 24576 lanes OOMs at 16.55M scoped — g=64 x B=256 was a latent
            # compile-time OOM under the old 24576 guard)
            while g_sz > 8 and g_sz * (B + 128) > 20480:
                g_sz //= 2
            # a single round may hold the whole budget alone (_mem_acquire
            # serializes larger-than-half grants); only reject groups that
            # cannot fit even then
            hbm_cap = self.HBM_BUDGET if ck is not None else self.HBM_BUDGET // 2
            if g_sz * per_problem > hbm_cap:
                # Mbp-scale tier with a very wide band: even a minimum-size
                # group would dominate HBM — keep these off the device
                fallback_idx.extend(idxs)
                continue
            M = max((self.V2_BYTES // per_problem // g_sz) * g_sz, g_sz)
            M = min(M, 128)
            idxs = sorted(idxs, key=lambda i: -len(jobs[i].ref))
            gran = g_sz * self.mesh.devices.size if self.mesh is not None else g_sz
            for c0 in range(0, len(idxs), M):
                sub = idxs[c0 : c0 + M]
                # quantize the batch dim to power-of-two multiples of the
                # granule: every distinct (m_pad, R_cap, B, K) shape costs a
                # fresh XLA compile (~2 min through the device tunnel), so
                # shape variety is worth more than padding waste
                g_count = 1
                while g_count * gran < len(sub):
                    g_count *= 2
                m_pad = min(g_count * gran, ((M + gran - 1) // gran) * gran)
                m_pad = max(m_pad, ((len(sub) + gran - 1) // gran) * gran)
                max_len = max(max(len(jobs[i].ref), len(jobs[i].qry)) for i in sub)
                max_hint = max(jobs[i].hint_events for i in sub)
                bump = max(kbumps[i] for i in sub)
                # events are indel RUNS (walk v3 compresses deletion runs), so
                # the buffer scales with divergence, not length; overflow
                # triggers a retry with 4x capacity. Power-of-four ladder to
                # bound shape variety.
                if ck is None:
                    K_need = max(64, 64 + max_len // 256, 2 * max_hint) * bump
                    K_cap = 16384
                else:
                    # events are indel runs: they scale with divergence (the
                    # hint), not length; the ckpt walk's event buffer lives in
                    # per-group SMEM, so event-dense jobs (bump>1 or big
                    # hints) go to host instead of burning device retries
                    K_need = max(64, 64 + max_len // 4096, 2 * max_hint) * bump
                    K_cap = 2048
                K = 64
                while K < K_need and K < K_cap:
                    K *= 4
                if ck is not None and K_need > K_cap:
                    fallback_idx.extend(sub)
                    continue
                planned.append((sub, g_sz, m_pad, R_cap, B, K, m_pad * per_problem, ck))

        # oversized jobs run on host threads overlapped with the device round
        fb_pool = fb_futs = None
        if fallback_idx:
            import concurrent.futures as _cf

            fb_pool = _cf.ThreadPoolExecutor(max_workers=2)
            # count=count: in a probe leg (count=False) the round's caller
            # accounts served cells itself, via _probe_counts below
            fb_futs = {i: fb_pool.submit(self._host_fallback, jobs[i], count) for i in fallback_idx}

        fb_cells = sum(
            self._job_cells(jobs[i], jobs[i].band.band_width + self.extra) for i in fallback_idx
        )
        try:
            if not planned:
                if not count:
                    self._probe_counts = (0, fb_cells)
                out = self._run_planned(jobs, planned, edits, boundary, overflow, fb_futs, count)
                if fb_futs:
                    for i, f in fb_futs.items():
                        out[0][i] = f.result()
                return out
            # the WHOLE device round (dispatch-time compiles included) runs
            # under the watchdog: dispatch can block inside a jit compile on
            # a stalled tunnel where the fetch-level watchdog never starts.
            # The threaded round gets COPIES of the result lists so a zombie
            # round can never scribble over the host-rerun results.
            cells = sum(m_pad * R_cap * B for _, _, m_pad, R_cap, B, _, _, _ in planned)
            shapes = {(m_pad, R_cap, B, K, ck) for _, _, m_pad, R_cap, B, K, _, ck in planned}
            cold = not shapes <= self._SHAPES_WARM
            # COLD rounds never block the build on a (remote) compile: they
            # get a short, NON-quarantining watchdog — on timeout the round
            # reruns on host while the detached leg finishes compiling and
            # marks its shapes warm (in _run_planned), so the shape serves
            # the next round. Measured r4: cold rounds blocking on tunnel
            # compiles cost a 46 Mbp mixed build ~5x the align wall of a
            # host-only run. Repeated cold timeouts (a genuinely stalled
            # link) escalate to a real quarantine.
            if cold and self._cold_timeouts < 3:
                base, quarantine = self.PROBE_WAIT_S, False
            else:
                base, quarantine = (self.FETCH_TIMEOUT_COLD_S if cold else self.FETCH_TIMEOUT_S), True
            # per-job (unpadded) device cells, for the engine receipts
            dev_cells = sum(
                self._job_cells(jobs[i], (B - 2) // 2)
                for sub, _, _, _, B, _, _, _ in planned
                for i in sub
            )
            all_ckpt = all(ck is not None for *_, ck in planned)
            try:
                import time as _t

                t_dev = _t.time()
                out = self._watchdog_call(
                    lambda: self._run_planned(
                        jobs, planned, list(edits), list(boundary), list(overflow), fb_futs, count
                    ),
                    base + (60.0 + cells / 1e8 if quarantine else cells / 5e8),
                    quarantine=quarantine,
                )
                dt_dev = _t.time() - t_dev
                self._cold_timeouts = 0
                if count:
                    self._engine_count(
                        "device", dev_cells, 0 if cold else dev_cells, 0.0 if cold else dt_dev
                    )
                else:
                    self._probe_counts = (dev_cells, fb_cells)
                if all_ckpt and not cold and dt_dev > 0 and dev_cells >= self.RATE_MIN_CELLS:
                    obs = dev_cells / dt_dev
                    self._ckpt_rate = obs if self._ckpt_rate is None else 0.5 * self._ckpt_rate + 0.5 * obs
                # resolve host-fallback futures OUTSIDE the timed device leg:
                # their wall must not pollute dt_dev or the ckpt-rate EMA
                if fb_futs:
                    for i, f in fb_futs.items():
                        out[0][i] = f.result()
                return out
            except _DeviceStall:
                import concurrent.futures as _cf

                if not count:
                    self._probe_counts = (0, dev_cells + fb_cells)
                with _cf.ThreadPoolExecutor(max_workers=2) as pool:
                    futs = {
                        i: pool.submit(self._host_fallback, jobs[i], count)
                        for sub, *_ in planned
                        for i in sub
                    }
                    for i, f in futs.items():
                        edits[i] = f.result()
                if fb_futs:
                    for i, f in fb_futs.items():
                        edits[i] = f.result()
                return edits, boundary, overflow
        finally:
            # shut the fallback pool down on ALL paths (a raising device
            # dispatch must not leak the pool or its in-flight futures)
            if fb_pool is not None:
                fb_pool.shutdown(wait=True)

    def _run_planned(self, jobs, planned, edits, boundary, overflow, fb_futs, count: bool = True):
        import jax

        from pangraph_tpu.graph.seq import IUPAC_MASK
        from pangraph_tpu.ops.stripe_v2 import (
            edit_from_events,
            pack_nibbles_host,
            stripe_align_v2_ckpt_packed,
            stripe_align_v2_packed,
        )

        round_bytes = sum(p[-2] for p in planned)
        if round_bytes:
            self._mem_acquire(round_bytes)
        launched = []
        try:
            for sub, g_sz, m_pad, R_cap, B, K, _bb, ck in planned:
                with trace.span("align.pack"):
                    Wq = R_cap + B
                    # nibble-pack on host for the single-device path: two
                    # 4-bit IUPAC masks per byte HALVE the H2D transfer
                    # (input bandwidth is the dominant per-round device
                    # cost on degraded links; all tiers and B are even).
                    # The mesh path keeps raw bytes.
                    use_packed = self.mesh is None
                    ref_in = np.zeros((m_pad, R_cap), dtype=np.uint8)
                    qry_in = np.zeros((m_pad, Wq), dtype=np.uint8)
                    rlen = np.zeros(m_pad, dtype=np.int32)
                    qlen = np.zeros(m_pad, dtype=np.int32)
                    msv = np.zeros(m_pad, dtype=np.int32)
                    Wv = np.full(m_pad, (B - 2) // 2, dtype=np.int32)
                    for s, i in enumerate(sub):
                        j = jobs[i]
                        if use_packed:
                            ref_in[s, : len(j.ref)] = IUPAC_MASK[j.ref]
                            qry_in[s, : len(j.qry)] = IUPAC_MASK[j.qry]
                        else:
                            ref_in[s, : len(j.ref)] = j.ref
                            qry_in[s, : len(j.qry)] = j.qry
                        rlen[s] = len(j.ref)
                        qlen[s] = len(j.qry)
                        msv[s] = j.band.mean_shift
                    if use_packed:
                        ref_in = pack_nibbles_host(ref_in)
                        qry_in = pack_nibbles_host(qry_in)
                    gmax = rlen.reshape(-1, g_sz).max(axis=1).astype(np.int32)
                with trace.span("align.dispatch"):
                    if self.mesh is not None:
                        out = self._sharded_align(
                            ref_in, qry_in, rlen, qlen, msv, Wv, gmax, R_cap, B, K, g_sz, ck
                        )
                    elif ck is not None:
                        S_w, n_qb = ck
                        out = stripe_align_v2_ckpt_packed(
                            ref_in, qry_in, rlen, qlen, msv, Wv, gmax, R_cap, B, K, S_w, n_qb, g_sz
                        )
                    else:
                        out = stripe_align_v2_packed(
                            ref_in, qry_in, rlen, qlen, msv, Wv, gmax, R_cap, B, K, g_sz
                        )
                    packed = _pack_v2(out)
                launched.append((sub, K, packed))

            with trace.span("align.fetch"):
                bufs = jax.device_get([p for _, _, p in launched])
        finally:
            if round_bytes:
                self._mem_release(round_bytes)
        # shapes are warm once their batches have been fetched — recorded
        # HERE (inside the leg) so a detached cold leg that outlives its
        # round's watchdog still warms its shapes for the next round
        self._SHAPES_WARM.update(
            (m_pad, R_cap, B, K, ck) for _, _, m_pad, R_cap, B, K, _, ck in planned
        )
        with trace.span("align.decode"):
            for (sub, K, _), buf in zip(launched, bufs):
                meta = buf[:, :4]
                n_events = buf[:, 4]
                rows = buf[:, 5 : 5 + K]
                words = buf[:, 5 + K :]
                for s, i in enumerate(sub):
                    j = jobs[i]
                    boundary[i] = bool(meta[s, 2])
                    overflow[i] = int(n_events[s]) > K
                    if overflow[i]:
                        continue  # retried with a bigger event capacity
                    edit, ok = edit_from_events(rows[s], words[s], n_events[s], meta[s], j.ref, j.qry)
                    if ok:
                        edits[i] = edit
                    elif boundary[i]:
                        # band hit produced a degenerate edge-riding path:
                        # leave edits[i]=None so align_many retries with a
                        # doubled band (align/align.rs:55-63)
                        pass
                    else:  # dead walk without boundary: rare; host fallback
                        # count=False always: this job's cells are already
                        # attributed to the device plan (dev_cells /
                        # _probe_counts); counting host too would inflate
                        # the engine totals
                        edits[i] = self._host_fallback(j, False)
        return edits, boundary, overflow

    def _watchdog_call(self, fn, timeout: float, quarantine: bool = True):
        """Run fn() on a daemon thread with a stall watchdog. On timeout the
        device is quarantined (DEVICE_UNHEALTHY, half-open: a backoff
        re-probe daemon restores routing if the link recovers) and
        _DeviceStall is raised so the caller reruns the round on host.
        With quarantine=False (a COLD round, likely compiling) the timeout
        reruns on host without quarantining; the leg continues detached and
        warms its shapes. The blocked thread is daemonic: it cannot hang
        process exit."""
        import threading

        box = {}
        done = threading.Event()

        def run():
            try:
                box["v"] = fn()
            except BaseException as e:  # surfaced to the caller below
                box["e"] = e
            done.set()

        threading.Thread(target=run, daemon=True, name="align-round").start()
        if not done.wait(timeout):
            if not quarantine:
                self._cold_timeouts += 1
                if self._cold_timeouts >= 3:
                    # three consecutive cold rounds that never returned:
                    # that is a stalled link, not a compile queue
                    self._quarantine("repeated cold-round timeouts")
                log.info(
                    "cold device round still compiling (> %.0f s): rerunning on host; "
                    "the leg continues and warms its shapes", timeout,
                )
                raise _DeviceStall()
            self._quarantine(f"device round stalled (> {timeout:.0f} s)")
            log.warning(
                "device round stalled (> %.0f s): rerunning it on the host "
                "aligner and routing all later rounds host-ward", timeout,
            )
            raise _DeviceStall()
        if "e" in box:
            raise box["e"]
        return box["v"]

    # kept for compatibility with older call sites/tests
    def _fetch_with_watchdog(self, packed, timeout: float):
        import jax

        return self._watchdog_call(lambda: jax.device_get(packed), timeout)

    def _mem_acquire(self, nbytes: int) -> None:
        """Bound total outstanding paths bytes across threads (the parallel
        merge scheduler dispatches concurrently; HBM is ~16 GB). One grant
        per round; a round larger than the budget proceeds alone."""
        with self._mem_lock:
            while self._mem_outstanding > 0 and self._mem_outstanding + nbytes > self.HBM_BUDGET:
                self._mem_lock.wait(timeout=60.0)
            self._mem_outstanding += nbytes

    def _mem_release(self, nbytes: int) -> None:
        with self._mem_lock:
            self._mem_outstanding -= nbytes
            self._mem_lock.notify_all()

    def _sharded_align(
        self, ref_seq, qry_seq, rlen, qlen, msv, Wv, gmax, R_cap: int, B: int, K: int,
        g_sz: int = None, ck=None,
    ):
        """Run one bucket batch sharded over the mesh's 'jobs' axis: each
        device executes the Pallas stripe kernel on its shard (m_pad is
        padded to a multiple of g_sz * n_devices). With ck=(S_w, n_qb) the
        per-shard kernel is the checkpointed DP + window re-derive walk."""
        import functools

        import jax
        try:
            import inspect

            from jax import shard_map as _sm  # jax >= 0.8

            # 0.8 renamed check_rep -> check_vma; inspect the signature so
            # versions where jax.shard_map still takes check_rep keep working
            _rep_kw = "check_rep" if "check_rep" in inspect.signature(_sm).parameters else "check_vma"

            def shard_map(f, **kw):
                rep = kw.pop("check_rep", None)
                if rep is not None:
                    kw[_rep_kw] = rep
                return _sm(f, **kw)
        except ImportError:  # pragma: no cover - older jax
            from jax.experimental.shard_map import shard_map
        from jax.sharding import PartitionSpec as P

        from pangraph_tpu.ops.stripe_v2 import G, stripe_align_v2, stripe_align_v2_ckpt

        g_sz = g_sz or G
        key = (R_cap, B, K, ref_seq.shape[0], g_sz, ck)
        fn = self._sharded_cache.get(key)
        if fn is None:
            if ck is not None:
                S_w, n_qb = ck
                kernel = functools.partial(
                    stripe_align_v2_ckpt, R_cap=R_cap, B=B, K=K, S=S_w, n_qb=n_qb, g_size=g_sz
                )
            else:
                kernel = functools.partial(stripe_align_v2, R_cap=R_cap, B=B, K=K, g_size=g_sz)
            jobs_p = P("jobs")
            fn = jax.jit(
                shard_map(
                    kernel,
                    mesh=self.mesh,
                    in_specs=(jobs_p,) * 7,
                    out_specs={"rows": jobs_p, "words": jobs_p, "n_events": jobs_p, "meta": jobs_p},
                    check_rep=False,
                )
            )
            self._sharded_cache[key] = fn
        return fn(ref_seq, qry_seq, rlen, qlen, msv, Wv, gmax)

    def _host_fallback(self, job: AlignJob, count: bool = True) -> Edit:
        import time as _t

        t_eng = _t.time()
        try:
            with trace.span("align.host_fallback"):
                edit = self._native_single(job)
                if edit is not None:
                    return edit
                from pangraph_tpu.align.map_variations import map_variations

                return map_variations(job.ref, job.qry, job.band, self.params, self.extra)
        finally:
            # count=False when the caller already accounted these cells
            # (_run_round_native's internal overflow/budget fallbacks)
            if count:
                cells = self._job_cells(job, job.band.band_width + self.extra)
                self._engine_count("host", cells, cells, _t.time() - t_eng)

    def _native_single(self, job: AlignJob) -> Edit:
        """Single-job native alignment with the host aligner's own retry loop
        (align/align.rs:55-63 semantics, as map_variations). Returns None if
        the native library is unavailable or the job exceeds its budgets —
        the numpy aligner is the last resort then."""
        if self._native_lib() is None:
            return None
        from pangraph_tpu.native import stripe_align_batch_native

        w = job.band.band_width + self.extra
        attempt = 1
        edit = None
        while True:
            out = stripe_align_batch_native(
                [job.ref], [job.qry],
                np.array([job.band.mean_shift]), np.array([w]),
                self.params, IUPAC_MASK,
                max_paths_bytes=self.NATIVE_PATHS_BYTES, ops_cap=1 << 20, subs_cap=1 << 21,
                n_threads=1,
            )
            if out is None:
                return None
            st = int(out["status"][0])
            hb = bool(out["boundary"][0])
            if st == 0:
                edit = _edit_from_rle_hostmatch(
                    out["ops"][0], int(out["n_ops"][0]), out["subs"][0], int(out["n_subs"][0]),
                    int(out["lead_ins"][0]), job.qry,
                )
            elif st != 1:
                return None  # overflow / paths over budget
            retry = st == 1 or (st == 0 and hb)
            if (
                retry
                and attempt < self.params.max_alignment_attempts
                and self._job_cells(job, 2 * w) <= self.NATIVE_WIDEN_AREA
            ):
                w = max(2 * w, max(1, abs(job.band.mean_shift)))
                attempt += 1
                continue
            return edit

    # callable interface used by MergePromise.solve / reconsensus
    def __call__(self, ref, seqs, bands) -> list:
        ref = as_seq(ref)
        return self.align_many([AlignJob(ref, as_seq(s), b) for s, b in zip(seqs, bands)])
