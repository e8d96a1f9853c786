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
from dataclasses import dataclass

import numpy as np

from pangraph_tpu.align.params import BandedAlignParams, BandParameters
from pangraph_tpu.graph.edits import Del, Edit, Ins, Sub
from pangraph_tpu.graph.seq import IUPAC_MASK, as_seq
from pangraph_tpu.utils import trace

log = logging.getLogger(__name__)

MATCH = 1
REF_GAP_MATRIX = 2
QRY_GAP_MATRIX = 4
REF_GAP_EXTEND = 8
QRY_GAP_EXTEND = 16
BOUNDARY = 32

# memory budget for one kernel call's traceback buffer (bytes)
PATHS_BYTES_BUDGET = 256 * 1024 * 1024


@dataclass
class AlignJob:
    ref: np.ndarray  # uint8 sequence
    qry: np.ndarray
    band: BandParameters
    hint_events: int = 0  # expected indel event rows (sizes the event buffer)


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


def band_lo_host(i, ms, W, qlen, B):
    lo = i - ms - W
    hi = qlen + 1 - B
    if hi < 0:
        hi = 0
    if lo < 0:
        return 0
    return lo if lo < hi else hi


def backtrace_band(paths: np.ndarray, ref: np.ndarray, qry: np.ndarray, ms: int, W: int, B: int):
    """Walk traceback bits in band coordinates, emitting an Edit directly.

    Returns (edit, hit_boundary). paths rows are DP rows 1..R (row 0 implicit).
    """
    rlen, qlen = len(ref), len(qry)
    i, q = rlen, qlen
    subs, dels, inss = [], [], []
    del_run = 0  # current deletion run length (ends at ref pos i + del_run)
    ins_run = []  # current insertion chars (reversed)
    hit_boundary = False
    state = 0
    flat = paths.tobytes()  # fast scalar indexing
    ref = ref.tobytes() if hasattr(ref, "tobytes") else ref
    qry_b = qry.tobytes() if hasattr(qry, "tobytes") else qry
    qry = qry_b
    lo_hi = qlen + 1 - B
    if lo_hi < 0:
        lo_hi = 0
    lo_base = -ms - W  # lo(i) = clamp(i + lo_base, 0, lo_hi)
    while i > 0:
        lo = i + lo_base
        if lo < 0:
            lo = 0
        elif lo > lo_hi:
            lo = lo_hi
        k = q - lo
        if k < 0 or k >= B:
            return None, True  # fell out of band: force retry
        bits = flat[(i - 1) * B + k]
        if bits == 0:
            return None, True
        if bits & BOUNDARY:
            hit_boundary = True
        if (bits & MATCH) and state == 0:
            if ins_run:
                inss.append(Ins(i, bytes(ins_run[::-1]).decode()))
                ins_run = []
            if del_run:
                dels.append(Del(i, del_run))
                del_run = 0
            i -= 1
            q -= 1
            if ref[i] != qry[q]:
                subs.append(Sub(i, chr(int(qry[q]))))
        elif ((bits & REF_GAP_MATRIX) and state == 0) or state == REF_GAP_MATRIX:
            # insertion in query (ref gap)
            if del_run:
                dels.append(Del(i, del_run))
                del_run = 0
            q -= 1
            ins_run.append(int(qry[q]))
            state = REF_GAP_MATRIX if bits & REF_GAP_EXTEND else 0
        elif ((bits & QRY_GAP_MATRIX) and state == 0) or state == QRY_GAP_MATRIX:
            # deletion in query (qry gap)
            if ins_run:
                inss.append(Ins(i, bytes(ins_run[::-1]).decode()))
                ins_run = []
            i -= 1
            del_run += 1
            state = QRY_GAP_MATRIX if bits & QRY_GAP_EXTEND else 0
        else:
            return None, True
    if q > 0:
        # row 0 reached with query remaining: leading insertion
        lead = bytes(qry[:q]).decode()
        if ins_run:
            lead = lead + bytes(ins_run[::-1]).decode()
        inss.append(Ins(0, lead))
    elif ins_run:
        inss.append(Ins(0, bytes(ins_run[::-1]).decode()))
    if del_run:
        dels.append(Del(0, del_run))
    subs.reverse()
    dels.reverse()
    inss.reverse()
    return Edit(subs=subs, dels=dels, inss=inss), hit_boundary


def _cover_pow2(n: int, cap: int) -> int:
    k = 16
    while k < n:
        k *= 2
    return min(k, cap)


def _pack_payload(ops, subs, ops_k: int, subs_k: int):
    import functools

    import jax
    import jax.numpy as jnp

    @functools.partial(jax.jit, static_argnames=("ok", "sk"))
    def pack(ops, subs, ok, sk):
        m = ops.shape[0]
        a = jax.lax.slice_in_dim(ops, 0, ok, axis=1).reshape(m, -1)
        b = jax.lax.slice_in_dim(subs, 0, sk, axis=1).reshape(m, -1)
        return jnp.concatenate([a, b], axis=1)

    return pack(ops, subs, ops_k, subs_k)


def _pack3_jit():
    import functools

    import jax
    import jax.numpy as jnp

    @functools.partial(jax.jit, static_argnames=("sk", "dk", "ik"))
    def pack(subs, dels, inss, sk, dk, ik):
        m = subs.shape[0]
        a = jax.lax.slice_in_dim(subs, 0, sk, axis=1).reshape(m, -1)
        b = jax.lax.slice_in_dim(dels, 0, dk, axis=1).reshape(m, -1)
        c = jax.lax.slice_in_dim(inss, 0, ik, axis=1).reshape(m, -1)
        return jnp.concatenate([a, b, c], axis=1)

    return pack


def _pack_mp_jit():
    import functools

    import jax
    import jax.numpy as jnp

    @functools.partial(jax.jit, static_argnames=("sk", "dk", "ik"))
    def pack(meta, subs, dels, inss, sk, dk, ik):
        m = meta.shape[0]
        a = jax.lax.slice_in_dim(subs, 0, sk, axis=1).reshape(m, -1)
        b = jax.lax.slice_in_dim(dels, 0, dk, axis=1).reshape(m, -1)
        c = jax.lax.slice_in_dim(inss, 0, ik, axis=1).reshape(m, -1)
        return jnp.concatenate([meta, a, b, c], axis=1)

    return pack


_PACK3 = None
_PACK_MP = None
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


def _pack_payload3(subs, dels, inss, sk: int, dk: int, ik: int):
    global _PACK3
    if _PACK3 is None:
        _PACK3 = _pack3_jit()
    return _PACK3(subs, dels, inss, sk=sk, dk=dk, ik=ik)


def _pack_meta_payload(out: dict, sk: int, dk: int, ik: int):
    """Device-side pack of meta + trimmed edit lists into ONE buffer
    [m, 6 + sk*2 + dk*2 + ik*3] so a whole round's results cross the
    D2H link in a single jax.device_get (the tunnel costs ~36 ms latency
    per transfer round-trip, so transfer count dominates for small results)."""
    global _PACK_MP
    if _PACK_MP is None:
        _PACK_MP = _pack_mp_jit()
    return _PACK_MP(out["meta"], out["subs"], out["dels"], out["inss"], sk=sk, dk=dk, ik=ik)


def _unpack_meta_payload(buf: np.ndarray, sk: int, dk: int, ik: int) -> dict:
    m = buf.shape[0]
    o = 6
    return {
        "meta": buf[:, :o],
        "subs": buf[:, o : o + sk * 2].reshape(m, sk, 2),
        "dels": buf[:, o + sk * 2 : o + sk * 2 + dk * 2].reshape(m, dk, 2),
        "inss": buf[:, o + sk * 2 + dk * 2 :].reshape(m, ik, 3),
    }


def _predict_caps(jobs: list, sub_cap: int, del_cap: int, ins_cap: int):
    """Heuristic per-batch trim caps: edits scale with length x divergence
    (closely related genomes, ~1-2%; budget ~12%). Overflows trigger an
    exact re-fetch, so this only trades bytes vs. a rare second transfer."""
    max_len = max((max(len(j.ref), len(j.qry)) for j in jobs), default=1)
    sk = _cover_pow2(64 + max_len // 8, sub_cap)
    dk = _cover_pow2(16 + max_len // 64, del_cap)
    ik = _cover_pow2(16 + max_len // 64, ins_cap)
    return sk, dk, ik


def _fetch_lists(out: dict) -> dict:
    """Two-transfer fetch of the edit-list outputs (subs/dels/inss + meta)."""
    meta = np.asarray(out["meta"])  # [m, 6]: n_subs, n_dels, n_inss, lead, boundary, overflow
    sk = _cover_pow2(int(meta[:, 0].max(initial=0)), out["subs"].shape[1])
    dk = _cover_pow2(int(meta[:, 1].max(initial=0)), out["dels"].shape[1])
    ik = _cover_pow2(int(meta[:, 2].max(initial=0)), out["inss"].shape[1])
    payload = np.asarray(_pack_payload3(out["subs"], out["dels"], out["inss"], sk, dk, ik))
    m = payload.shape[0]
    return {
        "meta": meta,
        "subs": payload[:, : sk * 2].reshape(m, sk, 2),
        "dels": payload[:, sk * 2 : sk * 2 + dk * 2].reshape(m, dk, 2),
        "inss": payload[:, sk * 2 + dk * 2 :].reshape(m, ik, 3),
    }


def _edit_from_lists(out: dict, s: int, qry: np.ndarray) -> Edit:
    """Assemble an Edit from the decoded per-problem edit lists."""
    meta = out["meta"][s]
    n_subs, n_dels, n_inss, lead = int(meta[0]), int(meta[1]), int(meta[2]), int(meta[3])
    subs = [Sub(int(p), chr(int(c))) for p, c in out["subs"][s, :n_subs]]
    dels = [Del(int(p), int(ln)) for p, ln in out["dels"][s, :n_dels]]
    inss = []
    if lead:
        inss.append(Ins(0, bytes(qry[:lead]).decode()))
    for p, qs, ln in out["inss"][s, :n_inss]:
        inss.append(Ins(int(p), bytes(qry[int(qs) : int(qs) + int(ln)]).decode()))
    return Edit(subs=subs, dels=dels, inss=inss)


def _fetch_trimmed(out: dict) -> dict:
    """Device->host fetch of the aligner's compact outputs in exactly two
    transfers: the packed per-problem meta row, then one buffer holding the
    ops/subs payloads trimmed on device to a power-of-two cover of the actual
    counts. The tunnel's D2H cost is ~50 ms latency per transfer, so transfer
    count — not bytes — is what matters for these small results."""
    meta = np.asarray(out["meta"])  # [m, 5]: n_ops, n_subs, lead_ins, boundary, overflow
    n_ops, n_subs = meta[:, 0], meta[:, 1]
    ops_k = _cover_pow2(int(n_ops.max(initial=0)), out["ops"].shape[1])
    subs_k = _cover_pow2(int(n_subs.max(initial=0)), out["subs"].shape[1])
    payload = np.asarray(_pack_payload(out["ops"], out["subs"], ops_k, subs_k))
    m = payload.shape[0]
    return {
        "n_ops": n_ops,
        "n_subs": n_subs,
        "lead_ins": meta[:, 2],
        "boundary": meta[:, 3].astype(bool),
        "overflow": meta[:, 4].astype(bool),
        "ops": payload[:, : ops_k * 2].reshape(m, ops_k, 2),
        "subs": payload[:, ops_k * 2 :].reshape(m, subs_k, 2),
    }


def _edit_from_rle_hostmatch(ops, n_ops, subs, n_subs, lead_ins, qry) -> Edit:
    """Build an Edit from RLE ops with the host aligner's insertion-strip
    semantics (align/map_variations.edits_from_aligned_pair): deletion runs
    separated only by insertions merge into one Del, because stripping the
    ref-gap (insertion) columns makes them one contiguous query-gap run
    (insertions_strip.rs:47 + nuc_changes.rs:18)."""
    out_subs = [Sub(int(subs[s, 0]), chr(int(subs[s, 1]))) for s in range(n_subs - 1, -1, -1)]
    dels, inss = [], []
    rpos = 0
    qpos = lead_ins
    if lead_ins:
        inss.append(Ins(0, bytes(qry[:lead_ins]).decode()))
    for t in range(n_ops - 1, -1, -1):
        op, length = int(ops[t, 0]), int(ops[t, 1])
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


def _edit_from_rle(ops, n_ops, subs, n_subs, lead_ins, qry) -> Edit:
    """Build an Edit from the fused kernel's compact outputs. ops are emitted
    end-to-start; subs carry absolute ref positions + query chars."""
    OP_M, OP_I, OP_D = 0, 1, 2
    out_subs = [Sub(int(subs[s, 0]), chr(int(subs[s, 1]))) for s in range(n_subs - 1, -1, -1)]
    dels, inss = [], []
    rpos = 0
    qpos = lead_ins
    if lead_ins:
        inss.append(Ins(0, bytes(qry[:lead_ins]).decode()))
    for t in range(n_ops - 1, -1, -1):
        op, length = int(ops[t, 0]), int(ops[t, 1])
        if op == OP_M:
            rpos += length
            qpos += length
        elif op == OP_D:
            dels.append(Del(rpos, length))
            rpos += length
        else:
            inss.append(Ins(rpos, bytes(qry[qpos : qpos + length]).decode()))
            qpos += length
    return Edit(subs=out_subs, dels=dels, inss=inss)


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
        import threading

        self._mem_lock = threading.Condition()
        self._mem_outstanding = 0

    def align_many(self, jobs: list) -> list:
        """jobs: list of AlignJob (or (ref, qry, band) tuples). Returns Edits
        in job order."""
        jobs = [j if isinstance(j, AlignJob) else AlignJob(*j) for j in jobs]
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
    CHUNK_ROWS = 512  # C: rows per kernel dispatch (one compile per (C, B))
    MAX_SUB_BATCH = 128
    # fused-kernel tiers: R_cap ladder; batch size derived from a paths-buffer
    # budget so each (R_cap, B) tier compiles exactly once
    R_TIERS = (4096, 16384, 65536, 131072, 262144, 524288, 1048576, 2097152, 4194304)
    TIER_BYTES = 256 * 1024 * 1024
    V2_BYTES = 2 * 1024 * 1024 * 1024  # per-batch paths-buffer budget (v2 kernel)
    # paths bytes/problem beyond which the checkpointed DP + window re-derive
    # walk is used (HBM holds carries, ~100x smaller; kernel-parity tested,
    # tests/test_stripe_ckpt.py). Disabled by default on this hardware: the
    # regime it serves (paths > HBM/2 per minimum group) is exactly where
    # band-doubling retries matter, and the kernel clamp at MAX_B produces
    # boundary-capped edits where the host fallback widens further — the
    # poorer edits measurably degrade the downstream merge trajectory
    # (chromosome-scale build 50 s -> 197 s). Enable on hardware where
    # device time is cheap relative to host: PANGRAPH_TPU_CKPT_BYTES=7e8.
    CKPT_PATHS_BYTES = int(float(os.environ.get("PANGRAPH_TPU_CKPT_BYTES", 1 << 62)))
    HBM_BUDGET = 10 * 1024 * 1024 * 1024  # total outstanding paths bytes across threads
    MAX_B = 1024  # widest kernel band bucket (bands beyond this are clamped)
    backend = "v2"  # "v2" | "pallas" | "fused" | "chunked"

    def _tier_batch(self, R_cap: int, B: int) -> int:
        m = max(self.TIER_BYTES // (R_cap * B), 1)
        # round down to a power of two, cap at 128
        p = 1
        while p * 2 <= min(m, 128):
            p *= 2
        return p

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
        if cls._device_kind_cache is None:
            try:
                import jax

                cls._device_kind_cache = jax.default_backend()
            except Exception:  # no usable backend: the native path needs none
                cls._device_kind_cache = "cpu"
        return cls._device_kind_cache

    STATS = []  # (kind, n_jobs, cells, seconds) when PANGRAPH_TPU_ALIGN_STATS=1

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
        use_native = (
            self.backend == "v2" and self.NATIVE_CELL_BUDGET > 0 and self._native_lib() is not None
        )
        budget = self.NATIVE_CELL_BUDGET
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
                self.STATS.append((self.backend, n, cells, _time.time() - t0))
            return out

        max_w_kernel = (self.MAX_B - 2) // 2
        cells = [self._job_cells(j, w) for j, w in zip(jobs, widths)]
        native_set = set()
        acc = 0
        for i in sorted(range(n), key=lambda i: cells[i]):
            if acc + cells[i] > budget:
                break
            native_set.add(i)
            acc += cells[i]
        for i in range(n):
            # device would clamp this band; host is the only path that widens
            if widths[i] > max_w_kernel and cells[i] <= budget:
                native_set.add(i)
        dev_idx = [i for i in range(n) if i not in native_set]
        nat_idx = [i for i in range(n) if i in native_set]

        edits = [None] * n
        boundary = [False] * n
        overflow = [False] * n

        def run_native():
            e, b, _ = self._run_round_native([jobs[i] for i in nat_idx], [widths[i] for i in nat_idx])
            for s, i in enumerate(nat_idx):
                edits[i], boundary[i] = e[s], b[s]

        if dev_idx and nat_idx:
            # overlap: host C++ releases the GIL; device round mostly waits
            import concurrent.futures as _cf

            with _cf.ThreadPoolExecutor(max_workers=1) as pool:
                fut = pool.submit(run_native)
                e, b, o = self._dispatch_device(
                    [jobs[i] for i in dev_idx], [widths[i] for i in dev_idx], [kbumps[i] for i in dev_idx]
                )
                fut.result()
            for s, i in enumerate(dev_idx):
                edits[i], boundary[i], overflow[i] = e[s], b[s], o[s]
        elif nat_idx:
            run_native()
        else:
            e, b, o = self._dispatch_device(jobs, widths, kbumps)
            edits, boundary, overflow = e, b, o
        if stats:
            self.STATS.append(
                (f"mixed[n={len(nat_idx)},d={len(dev_idx)}]", n, sum(cells), _time.time() - t0)
            )
        return edits, boundary, overflow

    def _dispatch_device(self, jobs: list, widths: list, kbumps: list = None):
        if self.backend == "v2":
            return self._run_round_v2(jobs, widths, kbumps or [1] * len(jobs))
        if self.backend == "pallas":
            e, b = self._run_round_pallas(jobs, widths)
        elif self.backend == "fused":
            e, b = self._run_round_fused(jobs, widths)
        else:
            e, b = self._run_round_chunked(jobs, widths)
        return e, b, [False] * len(jobs)

    def _run_round_native(self, jobs: list, widths: list):
        """Host C++ round: banded stripe DP + traceback per job, threaded
        across host cores (native/stripe.cpp). Same stripe geometry and tie
        rules as the host aligner; edits match map_variations exactly."""
        from pangraph_tpu.native import stripe_align_batch_native

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
                    edits[s] = self._host_fallback(jobs[s])
            else:  # paths over budget: numpy fallback
                edits[s] = self._host_fallback(jobs[s])
        return edits, boundary, [False] * n

    def _run_round_v2(self, jobs: list, widths: list, kbumps: list):
        """v2 kernel round: static-op DP + run-jump walk + event compaction.
        One device_get moves every batch's packed results (meta + event
        rows/words) across the D2H link; decode is host-side RLE + vectorized
        sub extraction (ops/stripe_v2.py)."""
        import jax

        from pangraph_tpu.ops.stripe_v2 import (
            G,
            ckpt_layout,
            edit_from_events,
            stripe_align_v2,
            stripe_align_v2_ckpt,
        )

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
            ck = None
            if per_problem > self.CKPT_PATHS_BYTES and self.mesh is None:
                # Mbp-scale tier: checkpointed DP + window re-derive walk —
                # HBM holds window-start carries instead of full path records
                WV, n_qb = ckpt_layout(B)
                ck = (WV // 128, n_qb)
                per_problem = (R_cap // WV) * 3 * (B + 128) * 4
            g_sz = G
            while g_sz > 8 and g_sz * per_problem > self.V2_BYTES:
                g_sz //= 2  # floor at one sublane tile: sub-tile kernels hang Mosaic
            # VMEM: the DP out block is (g, 128, B+128) int16, double-buffered;
            # keep g*(B+128) under ~24k lanes or wide bands blow the 16 MB limit
            while g_sz > 8 and g_sz * (B + 128) > 24576:
                g_sz //= 2
            if g_sz * per_problem > self.HBM_BUDGET // 2:
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
            fb_futs = {i: fb_pool.submit(self._host_fallback, jobs[i]) for i in fallback_idx}

        round_bytes = sum(p[-2] for p in planned)
        if round_bytes:
            self._mem_acquire(round_bytes)
        launched = []
        try:
            for sub, g_sz, m_pad, R_cap, B, K, _bb, ck in planned:
                with trace.span("align.pack"):
                    Wq = R_cap + B
                    ref_seq = np.zeros((m_pad, R_cap), dtype=np.uint8)
                    qry_seq = np.zeros((m_pad, Wq), dtype=np.uint8)
                    rlen = np.zeros(m_pad, dtype=np.int32)
                    qlen = np.zeros(m_pad, dtype=np.int32)
                    msv = np.zeros(m_pad, dtype=np.int32)
                    Wv = np.full(m_pad, (B - 2) // 2, dtype=np.int32)
                    for s, i in enumerate(sub):
                        j = jobs[i]
                        ref_seq[s, : len(j.ref)] = j.ref
                        qry_seq[s, : len(j.qry)] = j.qry
                        rlen[s] = len(j.ref)
                        qlen[s] = len(j.qry)
                        msv[s] = j.band.mean_shift
                    gmax = rlen.reshape(-1, g_sz).max(axis=1).astype(np.int32)
                with trace.span("align.dispatch"):
                    if self.mesh is not None:
                        out = self._sharded_align(ref_seq, qry_seq, rlen, qlen, msv, Wv, gmax, R_cap, B, K)
                    elif ck is not None:
                        S_w, n_qb = ck
                        out = stripe_align_v2_ckpt(
                            ref_seq, qry_seq, rlen, qlen, msv, Wv, gmax, R_cap, B, K, S_w, n_qb, g_sz
                        )
                    else:
                        out = stripe_align_v2(ref_seq, qry_seq, rlen, qlen, msv, Wv, gmax, R_cap, B, K, g_sz)
                    packed = _pack_v2(out)
                launched.append((sub, K, packed))

            with trace.span("align.fetch"):
                bufs = jax.device_get([p for _, _, p in launched])
        finally:
            if round_bytes:
                self._mem_release(round_bytes)
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
                        edits[i] = self._host_fallback(j)
        if fb_futs:
            for i, f in fb_futs.items():
                edits[i] = f.result()
            fb_pool.shutdown()
        return edits, boundary, overflow

    def _run_round_pallas(self, jobs: list, widths: list):
        from pangraph_tpu.ops.stripe_pallas import G, stripe_align_pallas

        n = len(jobs)
        edits = [None] * n
        boundary = [False] * n
        groups = {}
        for i, W in enumerate(widths):
            j = jobs[i]
            # pure diagonal band: corner must be inside the band
            W_eff = max(W, abs(len(j.qry) - len(j.ref) + j.band.mean_shift) + 1)
            B = _bucket_b(W_eff)
            C = max(256, B)
            L = max(len(j.ref), len(j.qry))
            tier = next((t for t in self.R_TIERS if t >= L + 2), None)
            if tier is None or B > 1024:
                edits[i] = self._host_fallback(j)
                continue
            groups.setdefault((tier, B, C), []).append(i)

        # phase 1: dispatch every tier batch (async); phase 2: fetch + decode.
        # Dispatches queue on device, so later batches compute while earlier
        # results cross the slow D2H link.
        launched = []
        for (R_cap, B, C), idxs in groups.items():
            M = max((self._tier_batch(R_cap, B) // G) * G, G)
            idxs = sorted(idxs, key=lambda i: -len(jobs[i].ref))
            for c0 in range(0, len(idxs), M):
                sub = idxs[c0 : c0 + M]
                m_pad = ((len(sub) + g_sz - 1) // g_sz) * g_sz
                Wq = R_cap + C
                ref_seq = np.zeros((m_pad, R_cap), dtype=np.uint8)
                qry_seq = np.zeros((m_pad, Wq), dtype=np.uint8)
                rlen = np.zeros(m_pad, dtype=np.int32)
                qlen = np.zeros(m_pad, dtype=np.int32)
                msv = np.zeros(m_pad, dtype=np.int32)
                Wv = np.full(m_pad, (B - 2) // 2, dtype=np.int32)
                for s, i in enumerate(sub):
                    j = jobs[i]
                    ref_seq[s, : len(j.ref)] = j.ref
                    qry_seq[s, : len(j.qry)] = j.qry
                    rlen[s] = len(j.ref)
                    qlen[s] = len(j.qry)
                    msv[s] = j.band.mean_shift
                gmax = rlen.reshape(-1, G).max(axis=1).astype(np.int32)
                out = stripe_align_pallas(ref_seq, qry_seq, rlen, qlen, msv, Wv, gmax, R_cap, B, C)
                caps = _predict_caps(
                    [jobs[i] for i in sub], out["subs"].shape[1], out["dels"].shape[1], out["inss"].shape[1]
                )
                packed = _pack_meta_payload(out, *caps)
                launched.append((sub, out, caps, packed))

        # ONE device_get for the whole round: every batch's meta + payload,
        # optimistically trimmed. Rows whose true counts exceed the predicted
        # caps are re-fetched exactly (rare; costs one extra transfer).
        import jax

        bufs = jax.device_get([p for _, _, _, p in launched])
        refetch = []  # (list_pos, full-out) needing exact trims
        decoded = []
        for (sub, out, caps, _), buf in zip(launched, bufs):
            d = _unpack_meta_payload(buf, *caps)
            meta = d["meta"]
            sk, dk, ik = caps
            if (
                meta[:, 0].max(initial=0) > sk
                or meta[:, 1].max(initial=0) > dk
                or meta[:, 2].max(initial=0) > ik
            ):
                refetch.append((len(decoded), out))
                decoded.append((sub, None))
            else:
                decoded.append((sub, d))
        if refetch:
            full_caps = [
                (out["subs"].shape[1], out["dels"].shape[1], out["inss"].shape[1]) for _, out in refetch
            ]
            exact = jax.device_get(
                [_pack_meta_payload(out, *c) for (_, out), c in zip(refetch, full_caps)]
            )
            for (pos, _), buf, c in zip(refetch, exact, full_caps):
                decoded[pos] = (decoded[pos][0], _unpack_meta_payload(buf, *c))
        for sub, d in decoded:
            for s, i in enumerate(sub):
                j = jobs[i]
                boundary[i] = bool(d["meta"][s, 4])
                if d["meta"][s, 5]:  # overflow / dead walk
                    edits[i] = self._host_fallback(j)
                    continue
                edits[i] = _edit_from_lists(d, s, j.qry)
        return edits, boundary

    def _run_round_fused(self, jobs: list, widths: list):
        from pangraph_tpu.ops.stripe_fused import stripe_align_fused

        n = len(jobs)
        edits = [None] * n
        boundary = [False] * n
        groups = {}
        for i, W in enumerate(widths):
            L = max(len(jobs[i].ref), len(jobs[i].qry))
            B = _bucket_b(W)
            tier = next((t for t in self.R_TIERS if t >= L + 1), None)
            if tier is None:
                # beyond the largest tier: host fallback
                edits[i] = self._host_fallback(jobs[i])
                continue
            groups.setdefault((tier, B), []).append(i)

        for (R_cap, B), idxs in groups.items():
            M = self._tier_batch(R_cap, B)
            idxs = sorted(idxs, key=lambda i: -len(jobs[i].ref))
            for c0 in range(0, len(idxs), M):
                sub = idxs[c0 : c0 + M]
                m = len(sub)
                ref_seq = np.zeros((M, R_cap), dtype=np.uint8)
                qry_seq = np.zeros((M, R_cap + B), dtype=np.uint8)
                ref_mask = np.zeros((M, R_cap), dtype=np.uint8)
                qry_mask = np.zeros((M, R_cap + B), dtype=np.uint8)
                rlen = np.zeros(M, dtype=np.int32)
                qlen = np.zeros(M, dtype=np.int32)
                msv = np.zeros(M, dtype=np.int32)
                Wv = np.full(M, (B - 2) // 2, dtype=np.int32)
                for s, i in enumerate(sub):
                    j = jobs[i]
                    ref_seq[s, : len(j.ref)] = j.ref
                    qry_seq[s, : len(j.qry)] = j.qry
                    ref_mask[s, : len(j.ref)] = IUPAC_MASK[j.ref]
                    qry_mask[s, : len(j.qry)] = IUPAC_MASK[j.qry]
                    rlen[s] = len(j.ref)
                    qlen[s] = len(j.qry)
                    msv[s] = j.band.mean_shift
                out = stripe_align_fused(ref_seq, qry_seq, ref_mask, qry_mask, rlen, qlen, msv, Wv, R_cap, B)
                out = _fetch_trimmed(out)
                for s, i in enumerate(sub):
                    j = jobs[i]
                    if out["overflow"][s]:
                        boundary[i] = bool(out["boundary"][s])
                        edits[i] = self._host_fallback(j)
                        continue
                    boundary[i] = bool(out["boundary"][s])
                    edits[i] = _edit_from_rle(
                        out["ops"][s], int(out["n_ops"][s]), out["subs"][s], int(out["n_subs"][s]),
                        int(out["lead_ins"][s]), j.qry,
                    )
        return edits, boundary

    def _run_round_chunked(self, jobs: list, widths: list):
        n = len(jobs)
        edits = [None] * n
        boundary = [False] * n
        # group only by band width: the chunked kernel handles any length
        groups = {}
        for i, W in enumerate(widths):
            groups.setdefault(_bucket_b(W), []).append(i)
        for B, idxs in groups.items():
            # sub-batch jobs of similar length to limit frozen-row waste
            idxs = sorted(idxs, key=lambda i: -len(jobs[i].ref))
            c0 = 0
            while c0 < len(idxs):
                sub = [idxs[c0]]
                top = len(jobs[idxs[c0]].ref)
                c0 += 1
                while (
                    c0 < len(idxs)
                    and len(sub) < self.MAX_SUB_BATCH
                    and len(jobs[idxs[c0]].ref) * 2 >= top
                ):
                    sub.append(idxs[c0])
                    c0 += 1
                self._run_sub_batch(jobs, sub, B, edits, boundary)
        return edits, boundary

    def _run_sub_batch(self, jobs, sub, B, edits, boundary):
        from pangraph_tpu.ops.stripe_tpu import init_carry, stripe_chunk_batch

        C = self.CHUNK_ROWS
        m = len(sub)
        rlen = np.array([len(jobs[i].ref) for i in sub], dtype=np.int32)
        qlen = np.array([len(jobs[i].qry) for i in sub], dtype=np.int32)
        msv = np.array([jobs[i].band.mean_shift for i in sub], dtype=np.int32)
        Wv = np.full(m, (B - 2) // 2, dtype=np.int32)
        ref_masks = [IUPAC_MASK[jobs[i].ref] for i in sub]
        qry_masks = [IUPAC_MASK[jobs[i].qry] for i in sub]
        R_max = int(rlen.max())
        n_chunks = (R_max + C - 1) // C

        carry = init_carry(m, qlen, msv, Wv, B)
        pending_dev = None  # (device paths, host list slot)
        paths_chunks = []
        for c in range(n_chunks):
            rows_start = 1 + c * C
            ref_chunk = np.zeros((m, C), dtype=np.uint8)
            qry_window = np.zeros((m, C + B), dtype=np.uint8)
            win_off = np.zeros(m, dtype=np.int32)
            for s in range(m):
                rm = ref_masks[s]
                a = rows_start - 1
                seg = rm[a : a + C]
                ref_chunk[s, : len(seg)] = seg
                lo_c0 = band_lo_host(rows_start, int(msv[s]), int(Wv[s]), int(qlen[s]), B)
                wo = max(lo_c0 - 1, 0)
                win_off[s] = wo
                qm = qry_masks[s]
                wseg = qm[wo : wo + C + B]
                qry_window[s, : len(wseg)] = wseg
            carry_and_paths = stripe_chunk_batch(
                *carry, ref_chunk, qry_window, win_off, rows_start, rlen, qlen, msv, Wv, C, B
            )
            carry, paths_c = carry_and_paths
            if pending_dev is not None:
                paths_chunks.append(np.asarray(pending_dev))
            pending_dev = paths_c
        if pending_dev is not None:
            paths_chunks.append(np.asarray(pending_dev))
        paths = np.concatenate(paths_chunks, axis=1) if paths_chunks else np.zeros((m, 0, B), dtype=np.int8)

        for s, i in enumerate(sub):
            j = jobs[i]
            e, hb = backtrace_band(paths[s], j.ref, j.qry, int(msv[s]), int(Wv[s]), B)
            if e is None:
                boundary[i] = True
                edits[i] = self._host_fallback(j)
            else:
                boundary[i] = hb
                edits[i] = e

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

    def _sharded_align(self, ref_seq, qry_seq, rlen, qlen, msv, Wv, gmax, R_cap: int, B: int, K: int):
        """Run one bucket batch sharded over the mesh's 'jobs' axis: each
        device executes the Pallas stripe kernel on its shard (m_pad is
        padded to a multiple of G * n_devices)."""
        import functools

        import jax
        from jax.experimental.shard_map import shard_map
        from jax.sharding import PartitionSpec as P

        from pangraph_tpu.ops.stripe_v2 import stripe_align_v2

        key = (R_cap, B, K, ref_seq.shape[0])
        fn = self._sharded_cache.get(key)
        if fn is None:
            jobs_p = P("jobs")
            fn = jax.jit(
                shard_map(
                    functools.partial(stripe_align_v2, R_cap=R_cap, B=B, K=K),
                    mesh=self.mesh,
                    in_specs=(jobs_p,) * 7,
                    out_specs={"rows": jobs_p, "words": jobs_p, "n_events": jobs_p, "meta": jobs_p},
                    check_rep=False,
                )
            )
            self._sharded_cache[key] = fn
        return fn(ref_seq, qry_seq, rlen, qlen, msv, Wv, gmax)

    def _host_fallback(self, job: AlignJob) -> Edit:
        with trace.span("align.host_fallback"):
            edit = self._native_single(job)
            if edit is not None:
                return edit
            from pangraph_tpu.align.map_variations import map_variations

            return map_variations(job.ref, job.qry, job.band, self.params, self.extra)

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
