"""Minimizer sketching, vectorized.

One kernel, two parameterizations (SURVEY.md §7 K1):
- mash distance for the guide tree: (w=100, k=15), reference
  distance/mash/minimizer.rs:49-130 with Jenkins invertible hash (hash.rs:3)
- mapping sketch for the all-vs-all consensus mapper: (w=19, k=19), the
  reference vendors minimap2's sketch (minimap2-sys/minimap2/sketch.c)

Design: k-mer codes are built by k strided shift-ors (O(kL) vector work, no
scalar loop), canonical strand selection compares forward/reverse codes, and
the windowed minimum is an offset-doubling (log w) min-with-argmin reduction —
the same data-parallel shape used by the Pallas version.
"""
from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np

from pangraph_tpu.graph.seq import TWOBIT, as_seq

U64 = np.uint64


def jenkins_hash(x: np.ndarray, mask: int) -> np.ndarray:
    """Invertible 64-bit mix under a 2k-bit mask (distance/mash/hash.rs:3-12)."""
    m = U64(mask)
    x = x.astype(U64)
    x = (~x + (x << U64(21))) & m
    x = x ^ (x >> U64(24))
    x = (x + (x << U64(3)) + (x << U64(8))) & m
    x = x ^ (x >> U64(14))
    x = (x + (x << U64(2)) + (x << U64(4))) & m
    x = x ^ (x >> U64(28))
    x = (x + (x << U64(31))) & m
    return x


def kmer_codes(seq: np.ndarray, k: int):
    """(fwd_codes, rev_codes, valid) for every k-mer start position."""
    b = TWOBIT[as_seq(seq)]
    L = len(b)
    n = L - k + 1
    if n <= 0:
        return (np.zeros(0, dtype=U64),) * 2 + (np.zeros(0, dtype=bool),)
    valid = b < 4
    cs = np.concatenate(([0], np.cumsum(valid)))
    win_valid = (cs[k:] - cs[:-k]) == k
    bb = np.where(valid, b, 0).astype(U64)
    fwd = np.zeros(n, dtype=U64)
    rev = np.zeros(n, dtype=U64)
    for j in range(k):
        fwd |= bb[j : n + j] << U64(2 * (k - 1 - j))
        rev |= (U64(3) ^ bb[j : n + j]) << U64(2 * j)
    return fwd, rev, win_valid


def sliding_argmin(values: np.ndarray, w: int):
    """Windowed (min, argmin) via offset doubling: O(n log w) vector ops.
    Ties resolve to the leftmost position. Returns arrays of length n-w+1."""
    n = len(values)
    if n < w:
        return np.zeros(0, dtype=values.dtype), np.zeros(0, dtype=np.int64)
    val = values.copy()
    pos = np.arange(n, dtype=np.int64)
    span = 1
    while span < w:
        step = min(span, w - span)
        nv = val[step:]
        take = nv < val[: n - step]
        val[: n - step] = np.where(take, nv, val[: n - step])
        pos[: n - step] = np.where(take, pos[step:], pos[: n - step])
        span += step
    return val[: n - w + 1], pos[: n - w + 1]


@dataclass
class Minimizers:
    """Sketch of one sequence: hash values, positions, strands."""

    values: np.ndarray  # uint64 hash values
    positions: np.ndarray  # int64 k-mer start positions
    strands: np.ndarray  # uint8: 0 fwd, 1 rev


_SKETCH_CACHE: "OrderedDict" = None
# must exceed the block count of the largest graph being self-mapped, or the
# LRU thrashes (every round re-sketches everything): 10^4-block pangenomes
# at ~1 kb/block cost ~1.7 kB/entry -> ~32 MB at this cap
_SKETCH_CACHE_MAX = int(os.environ.get("PANGRAPH_TPU_SKETCH_CACHE", 20_000))
# entries scale with SEQUENCE LENGTH, not count: chromosome-scale consensuses
# are MBs each, so the entry cap alone could grow the cache to multi-GB RSS
# on Mbp-block graphs (ADVICE r4). Evict by bytes too (sum of array nbytes).
_SKETCH_CACHE_BYTES = int(float(os.environ.get("PANGRAPH_TPU_SKETCH_CACHE_BYTES", 512 << 20)))
_sketch_cache_bytes = 0
_SKETCH_CACHE_LOCK = __import__("threading").Lock()


def _mm_nbytes(mm: "Minimizers") -> int:
    return mm.values.nbytes + mm.positions.nbytes + mm.strands.nbytes


def sketch_cached(seq: np.ndarray, k: int, w: int) -> Minimizers:
    """Content-keyed sketch cache. Block consensuses recur across self-merge
    rounds and across guide-tree merges, so re-sketching dominates host time
    without this (the reference re-indexes every round too, but its C sketch
    is ~10x faster than the numpy one).

    Keyed by a blake2b digest of the bytes (collision-free in practice, unlike
    Python's 64-bit `hash`, where a collision would silently return the wrong
    sketch and degrade merge quality); LRU eviction instead of clear-all."""
    global _SKETCH_CACHE
    if _SKETCH_CACHE is None:
        from collections import OrderedDict

        _SKETCH_CACHE = OrderedDict()
    import hashlib

    key = (hashlib.blake2b(seq.tobytes(), digest_size=16).digest(), k, w)
    with _SKETCH_CACHE_LOCK:
        hit = _SKETCH_CACHE.get(key)
        if hit is not None:
            _SKETCH_CACHE.move_to_end(key)
            return hit
    mm = sketch(seq, k, w)
    global _sketch_cache_bytes
    nb = _mm_nbytes(mm)
    with _SKETCH_CACHE_LOCK:
        while _SKETCH_CACHE and (
            len(_SKETCH_CACHE) >= _SKETCH_CACHE_MAX
            or _sketch_cache_bytes + nb > _SKETCH_CACHE_BYTES
        ):
            _, old = _SKETCH_CACHE.popitem(last=False)
            _sketch_cache_bytes -= _mm_nbytes(old)
        if key not in _SKETCH_CACHE:
            _SKETCH_CACHE[key] = mm
            _sketch_cache_bytes += nb
    return mm


def sketch(seq: np.ndarray, k: int, w: int) -> Minimizers:
    """(w,k)-minimizer sketch with canonical strand and invalid-base masking.

    Uses the native C++ rolling sketch when available (exact parity; block
    consensuses change every merge round, so sketching is on the mapper's
    critical path at Mbp scale); the vectorized numpy path is the fallback
    and the reference for parity tests."""
    if k < 32:
        from pangraph_tpu import native

        out = native.sketch_native(as_seq(seq), k, w, TWOBIT)
        if out is not None:
            vals, pos, strands = out
            return Minimizers(values=vals, positions=pos, strands=strands)
    return sketch_numpy(seq, k, w)


def sketch_numpy(seq: np.ndarray, k: int, w: int) -> Minimizers:
    """Vectorized numpy sketch (the native path's parity reference)."""
    fwd, rev, valid = kmer_codes(seq, k)
    n = len(fwd)
    if n == 0 or n < w:
        return Minimizers(np.zeros(0, dtype=U64), np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.uint8))
    mask = (1 << (2 * k)) - 1
    is_rev = rev < fwd
    ambiguous = fwd == rev  # palindromic k-mer: strand undefined, skip
    canon = np.where(is_rev, rev, fwd)
    hashes = jenkins_hash(canon, mask)
    sentinel = np.iinfo(np.uint64).max
    hashes = np.where(valid & ~ambiguous, hashes, U64(sentinel))
    vals, pos = sliding_argmin(hashes, w)
    keep = vals != U64(sentinel)
    # dedupe: identical minimizer chosen by adjacent windows
    first = np.concatenate(([True], np.diff(pos) != 0))
    keep &= first
    pos = pos[keep]
    return Minimizers(values=vals[keep], positions=pos, strands=is_rev[pos].astype(np.uint8))


def mash_distance(seqs: list, k: int = 15, w: int = 100) -> np.ndarray:
    """Pairwise minimizer set distance, normalized by self-hits
    (distance/mash/mash_distance.rs:9-64)."""
    n = len(seqs)
    if n == 0:
        return np.zeros((0, 0))
    # sketch in parallel: the native rolling sketch releases the GIL, and at
    # chromosome scale this pass (~w=100 sketch of every input genome) is the
    # whole cost of the guide tree
    import os
    from concurrent.futures import ThreadPoolExecutor

    # honor the same thread pin as the DP pool so a "fully serial" baseline
    # (PANGRAPH_TPU_NATIVE_THREADS=1) really is serial end to end
    n_workers = int(os.environ.get("PANGRAPH_TPU_NATIVE_THREADS", 0)) or (os.cpu_count() or 1)

    def sketch_one(s):
        s = as_seq(s)
        # sub-window sequence: clamp the window to its k-mer count so it
        # still contributes its minimum k-mers (the reference's streaming
        # sketch flushes partial end windows, minimizer.rs:148 — a plasmid
        # shorter than w must not be unsketchable)
        w_eff = max(min(w, len(s) - k + 1), 1)
        return sketch(s, k, w_eff)

    with ThreadPoolExecutor(max_workers=min(n, n_workers)) as pool:
        mms = list(pool.map(sketch_one, seqs))
    all_vals = []
    all_ids = []
    for i, mm in enumerate(mms):
        if len(mm.values) == 0:
            raise ValueError(f"no minimizers found for sequence {i} during mash distance")
        all_vals.append(mm.values)
        all_ids.append(np.full(len(mm.values), i, dtype=np.int64))
    vals = np.concatenate(all_vals)
    ids = np.concatenate(all_ids)
    # distinct (value, id) pairs, grouped by value. Entries are concatenated
    # in ascending id order, so a STABLE single-key sort by value yields
    # exactly lexsort((ids, vals)) at half the cost (46M entries at the
    # 46 Mbp scale).
    order = np.argsort(vals, kind="stable")
    vals, ids = vals[order], ids[order]
    keep = np.concatenate(([True], (np.diff(vals) != 0) | (np.diff(ids) != 0)))
    vals, ids = vals[keep], ids[keep]

    dist = np.zeros((n, n))
    # self-hits: number of distinct values per sequence
    np.add.at(dist, (np.arange(n), np.arange(n)), np.bincount(ids, minlength=n).astype(float))
    # cross-hits per equal-value group: count id co-occurrence
    starts = np.concatenate(([0], np.flatnonzero(np.diff(vals) != 0) + 1))
    sizes = np.diff(np.concatenate((starts, [len(vals)])))
    # size-2 groups vectorized (the dominant multi-sequence case)
    s2 = starts[sizes == 2]
    if len(s2):
        a, b = ids[s2], ids[s2 + 1]
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        np.add.at(dist, (lo, hi), 1.0)
    # larger groups, vectorized per group size: for closely related genome
    # sets most core minimizers are shared by ALL inputs, so size-n groups
    # dominate (a per-group python loop here was ~1.5 s of the headline
    # build's guide tree). Group sizes are <= n_seqs, so per distinct size
    # we gather the ids into an (n_groups, size) matrix and do one
    # np.add.at per (x, y) column pair.
    big = sizes > 2
    for size in np.unique(sizes[big]):
        sg = starts[sizes == size]
        M = np.sort(ids[sg[:, None] + np.arange(size)], axis=1)
        for x in range(int(size)):
            for y in range(x + 1, int(size)):
                np.add.at(dist, (M[:, x], M[:, y]), 1.0)
    dist = np.triu(dist) + np.triu(dist, 1).T
    for i in range(n):
        assert dist[i, i] > 0, f"no self-hit for sequence {i}"
    out = np.zeros((n, n))
    for i in range(n):
        for j in range(i + 1, n):
            out[i, j] = out[j, i] = 1.0 - dist[i, j] / dist[i, i]
    return out
