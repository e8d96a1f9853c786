"""Hit post-processing: primary/secondary chain resolution, mapq, and a
DUST-style low-complexity mask.

Mirrors the semantics of minimap2's hit pipeline, which the reference gets
for free by calling the library with default mapping options
(align/minimap2_lib/align_with_minimap2_lib.rs:49-57; the asm presets in
minimap2-sys/minimap2/options.c:116-130 leave these at their defaults):

- `mm_set_parent` (minimap2-sys/minimap2/hit.c): hits on one query are
  grouped by query-interval overlap; within a group the best-scoring hit is
  PRIMARY, the rest are secondaries of that parent.
- `mm_select_sub` (hit.c): secondaries scoring below pri_ratio (0.8) of
  their primary are dropped; at most best_n (5) secondaries survive per
  primary. Without this, repetitive genomes flood the downstream energy
  filter with near-duplicate candidate merges.
- `mm_set_mapq` (hit.c): mapq in [0, 60] for primaries — high when the best
  same-interval competitor is far below the primary, low when they are
  close; 0 for secondaries. (The reference's PAF rows carry this into
  `Alignment.quality`, alignment.rs:40-57.)
- `sdust` (minimap2-sys/minimap2/sdust.c): low-complexity masking of the
  minimizer stream. minimap2 leaves it OFF by default (sdust_thres = 0) and
  the asm presets do not enable it; we match that default and implement a
  windowed DUST score (triplet-count statistic of Morgulis et al. 2006)
  rather than the exact perfect-interval algorithm.
"""
from __future__ import annotations

import math

import numpy as np


def select_hits(alns: list, mask_level: float = 0.5, pri_ratio: float = 0.8, best_n: int = 5) -> list:
    """Primary/secondary resolution over one round's Alignment records.

    Processes each query independently (hits are grouped by query name; the
    all-vs-all mapper reports each unordered pair once under the -X
    convention, so the 'query' is whichever side the mapper put there).
    Returns the surviving alignments (primaries + kept secondaries) with
    `quality` set to the mapq model; input order is preserved among
    survivors of each query."""
    by_q = {}
    for a in alns:
        by_q.setdefault(a.qry.name, []).append(a)
    keep = set()
    secondary = set()  # tracked explicitly: records may carry stale quality
    # values from a previous round's selection (the mapper's pair cache
    # replays pre-selection records), so selection must not read a.quality
    for group in by_q.values():
        order = sorted(range(len(group)), key=lambda i: -group[i].matches)
        # primaries: [q_start, q_end, score, n_secondaries, best_sub_score]
        primaries = []
        for i in order:
            a = group[i]
            qs, qe = a.qry.interval.start, a.qry.interval.end
            score = a.matches
            parent = None
            for p in primaries:
                ov = min(qe, p[1]) - max(qs, p[0])
                if ov > 0 and ov >= mask_level * min(qe - qs, p[1] - p[0]):
                    parent = p
                    break
            if parent is None:
                primaries.append([qs, qe, score, 0, 0])
                keep.add(id(a))
            else:
                if parent[4] == 0:
                    parent[4] = score  # best secondary: drives the primary's mapq
                if score >= pri_ratio * parent[2] and parent[3] < best_n:
                    parent[3] += 1
                    a.quality = 0
                    secondary.add(id(a))
                    keep.add(id(a))
        # mapq for primaries (needs the final best_sub of each group)
        for i in order:
            a = group[i]
            if id(a) not in keep or id(a) in secondary:
                continue
            for p in primaries:
                if (p[0], p[1]) == (a.qry.interval.start, a.qry.interval.end) and p[2] == a.matches:
                    a.quality = _mapq(p[2], p[4])
                    break
    return [a for a in alns if id(a) in keep]


def _mapq(score: int, sub_score: int) -> int:
    """mapq in [0, 60] with mm_set_mapq-like semantics: scales with how far
    the best overlapping competitor falls below the primary and saturates
    for long unique hits."""
    if score <= 0:
        return 0
    ratio = 1.0 - sub_score / score
    q = 40.0 * ratio * min(1.0, score / 200.0) + 20.0 * math.log2(max(score / 50.0, 1.0)) * ratio
    return max(0, min(60, int(q)))


# ---------------------------------------------------------------- DUST mask

DUST_WINDOW = 64


def dust_mask(seq: np.ndarray, thres: int = 20) -> np.ndarray:
    """Low-complexity intervals of `seq` (uint8 ASCII) as an [n, 2] int64
    array, DUST triplet statistic over sliding 64-bp windows: a window's
    score is sum_t c_t(c_t-1)/2 over triplet counts c_t, scaled by
    10/(l-2); windows scoring > thres are masked (sdust.c's threshold
    convention). Non-ACGT positions break windows."""
    L = len(seq)
    if L < 3:
        return np.zeros((0, 2), np.int64)
    code = np.full(256, -1, np.int8)
    for i, b in enumerate(b"ACGT"):
        code[b] = i
        code[b + 32] = i
    c = code[seq]
    valid = c >= 0
    trip = np.full(L - 2, -1, np.int64)
    ok = valid[:-2] & valid[1:-1] & valid[2:]
    t = (c[:-2].astype(np.int64) << 4) | (c[1:-1].astype(np.int64) << 2) | c[2:]
    trip[ok] = t[ok]
    n_t = len(trip)
    w = min(DUST_WINDOW - 2, n_t)  # triplets per window
    if w < 1:
        return np.zeros((0, 2), np.int64)
    # sliding triplet-count score via incremental counts
    counts = np.zeros(64, np.int64)
    score = 0
    bad = np.zeros(L, bool)
    for i in range(n_t):
        ti = trip[i]
        if ti >= 0:
            score += counts[ti]
            counts[ti] += 1
        j = i - w
        if j >= 0:
            tj = trip[j]
            if tj >= 0:
                counts[tj] -= 1
                score -= counts[tj]
        # score is sum c(c-1)/2 over the current window [max(0,i-w+1), i]
        lw = min(i + 1, w)
        if lw > 1 and score * 10 > thres * (lw - 1):
            a = max(0, i - w + 1)
            bad[a : i + 3] = True
    if not bad.any():
        return np.zeros((0, 2), np.int64)
    d = np.diff(bad.astype(np.int8))
    starts = np.flatnonzero(d == 1) + 1
    ends = np.flatnonzero(d == -1) + 1
    if bad[0]:
        starts = np.concatenate(([0], starts))
    if bad[-1]:
        ends = np.concatenate((ends, [L]))
    return np.stack([starts, ends], axis=1).astype(np.int64)


def filter_minimizers_by_mask(positions: np.ndarray, k: int, mask: np.ndarray) -> np.ndarray:
    """Boolean keep-array: minimizer k-mers fully inside a masked interval
    are dropped (sdust semantics: a seed survives if any base escapes the
    mask)."""
    if len(mask) == 0 or len(positions) == 0:
        return np.ones(len(positions), bool)
    starts, ends = mask[:, 0], mask[:, 1]
    idx = np.searchsorted(ends, positions, side="right")
    idx = np.minimum(idx, len(starts) - 1)
    covered = (positions >= starts[idx]) & (positions + k <= ends[idx])
    return ~covered
