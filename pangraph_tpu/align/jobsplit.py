"""Pin-based splitting of long re-alignment jobs.

Promise resolution and reconsensus re-align Mbp-scale consensus pairs whose
approximate alignment is ALREADY KNOWN (the merge CIGAR and the per-node
edits that produced the query — reweave.rs:40-96, pangraph_block.rs:295).
A whole-sequence banded DP must budget its band for the total indel drift;
cutting the job at indel-free positions of the prior alignment pins exact
(ref, qry) correspondence points, so each piece only needs a band covering
its LOCAL indels — the same trick as the mapper's anchor-split (chain
anchors), with prior-edit match runs as the anchors.

A pin is a source-coordinate position c whose neighbourhood (±margin) is
free of indels in every map; substitutions do not shift coordinates and are
allowed. Pieces are [(r0, r1, q0, q1, mean_shift, band_width)] in the job's
ref/qry coordinates, stitched back by the batch aligner via
Edit.shift/concat.
"""
from __future__ import annotations

import numpy as np

SEG = 8192  # target piece length; measured sweep (r3): 8 kb pieces cut DP
#            cells ~30% vs 16 kb (local indel drift stays local) at identical
#            graph quality — 46 Mbp build 30.6 -> 25.8 s
MARGIN = 64  # indel-free neighbourhood required around a pin
SNAP = SEG // 4  # how far a pin may move to find a clean spot


class _EditMap:
    """Sorted-array view of an Edit as a source->target coordinate map.

    target_before(c) = number of output chars before source column c
    (deletions remove source columns; Ins at pos p inserts before column p,
    the codebase-wide convention — map_variations.rs:70-73).
    """

    def __init__(self, edit):
        self.dp = np.fromiter((d.pos for d in edit.dels), np.int64, len(edit.dels))
        dl = np.fromiter((d.len for d in edit.dels), np.int64, len(edit.dels))
        self.ip = np.fromiter((i.pos for i in edit.inss), np.int64, len(edit.inss))
        il = np.fromiter((len(i.seq) for i in edit.inss), np.int64, len(edit.inss))
        if len(self.dp) and np.any(np.diff(self.dp) < 0):
            o = np.argsort(self.dp, kind="stable")
            self.dp, dl = self.dp[o], dl[o]
        if len(self.ip) and np.any(np.diff(self.ip) < 0):
            o = np.argsort(self.ip, kind="stable")
            self.ip, il = self.ip[o], il[o]
        self.dl = dl
        self.dcum = np.concatenate(([0], np.cumsum(dl)))
        self.icum = np.concatenate(([0], np.cumsum(il)))

    def target_pos(self, c: np.ndarray) -> np.ndarray:
        di = np.searchsorted(self.dp, c)
        ii = np.searchsorted(self.ip, c, side="right")
        return c - self.dcum[di] + self.icum[ii]

    def dirty(self, c: np.ndarray, margin: int) -> np.ndarray:
        """True where [c-margin, c+margin) touches an indel. Deletions are
        non-overlapping and sorted, so starts AND ends are sorted: the last
        deletion starting before the window end has the maximal end among
        candidates — checking it suffices."""
        out = np.zeros(len(c), bool)
        if len(self.dp):
            j = np.searchsorted(self.dp, c + margin) - 1
            has = j >= 0
            jj = np.maximum(j, 0)
            out |= has & (self.dp[jj] + self.dl[jj] > c - margin)
        if len(self.ip):
            k0 = np.searchsorted(self.ip, c - margin)
            k1 = np.searchsorted(self.ip, c + margin, side="right")
            out |= k1 > k0
        return out

    def drift_between(self, a: np.ndarray, b: np.ndarray) -> np.ndarray:
        """Total |indel| length strictly within clean source cols [a, b)."""
        da = np.searchsorted(self.dp, a)
        db = np.searchsorted(self.dp, b)
        ia = np.searchsorted(self.ip, a, side="right")
        ib = np.searchsorted(self.ip, b, side="right")
        return (self.dcum[db] - self.dcum[da]) + (self.icum[ib] - self.icum[ia])


def split_by_prior(
    ref_map, qry_maps, L_src: int, ref_len: int, qry_len: int,
    seg: int = SEG, margin: int = MARGIN, extra: int = 12,
):
    """Piece plan for a re-alignment job with known prior structure.

    ref_map: Edit source->ref, or None when the source IS the job's ref.
    qry_maps: list of Edits composing source->...->qry (applied left to
    right). Returns [(r0, r1, q0, q1, mean_shift, band_width)] or None when
    no useful split exists (few clean pins / short job).
    """
    if L_src < 2 * seg:
        return None
    rmap = _EditMap(ref_map) if ref_map is not None else None
    qmaps = [_EditMap(m) for m in qry_maps]

    # candidate pins near multiples of seg, snapped outward to a clean spot.
    # One vectorized scan over the whole (target x offset) grid: the
    # per-target loop cost ~10 numpy dispatches per candidate row and
    # dominated promise planning at Mbp scale.
    targets = np.arange(seg, L_src - seg // 2, seg, dtype=np.int64)
    if len(targets) == 0:
        return None
    offsets = np.concatenate([[0], np.repeat(np.arange(margin, SNAP, margin), 2) * np.tile([1, -1], (SNAP - margin) // margin)])
    cand = targets[:, None] + offsets[None, :]  # (T, O), offset preference order
    flat = cand.ravel()
    ok = ((flat > 0) & (flat < L_src))
    if rmap is not None:
        ok &= ~rmap.dirty(flat, margin)
    # each qry map's cleanliness is checked at its own source coords
    pos = flat
    for m in qmaps:
        ok &= ~m.dirty(pos, margin)
        pos = m.target_pos(pos)
    okm = ok.reshape(cand.shape)
    has = okm.any(axis=1)
    first = np.argmax(okm, axis=1)  # first clean offset per target
    pins = cand[np.arange(len(targets)), first][has]
    if len(pins) < 1:
        return None
    pins_src = np.unique(pins)

    r = rmap.target_pos(pins_src) if rmap is not None else pins_src.copy()
    q = pins_src.copy()
    drift = np.zeros(len(pins_src) + 1, dtype=np.int64)  # per-piece interior drift
    bounds_src = np.concatenate(([0], pins_src, [L_src]))
    if rmap is not None:
        drift += rmap.drift_between(bounds_src[:-1], bounds_src[1:])
    pos_a, pos_b = bounds_src[:-1].copy(), bounds_src[1:].copy()
    for m in qmaps:
        drift += m.drift_between(pos_a, pos_b)
        pos_a = m.target_pos(pos_a)
        pos_b = m.target_pos(pos_b)
        q = m.target_pos(q) if len(q) else q
    # piece boundaries in job coordinates
    rb = np.concatenate(([0], r, [ref_len]))
    qb = np.concatenate(([0], q, [qry_len]))
    if np.any(np.diff(rb) <= 0) or np.any(np.diff(qb) <= 0):
        return None
    out = []
    for i in range(len(rb) - 1):
        r0, r1 = int(rb[i]), int(rb[i + 1])
        q0, q1 = int(qb[i]), int(qb[i + 1])
        corner = (r1 - r0) - (q1 - q0)
        ms = corner // 2
        bw = int(abs(corner - ms) + drift[i] + extra)
        out.append((r0, r1, q0, q1, ms, bw))
    return out
