"""Reweave: split blocks along accepted alignments and emit merge promises.

Reference: pangraph/reweave.rs, pangraph_interval.rs, slice.rs. This is the
core graph-restructuring step of self_merge: each block targeted by alignments
is partitioned into aligned/unaligned intervals (short intervals merged into
flanks with CIGAR-extension bookkeeping), sliced into new blocks with projected
node coordinates (circular-aware), and aligned interval pairs become
MergePromises whose resolution (banded re-alignment of every append-block
sequence against the anchor consensus) is the batched device workload.
"""
from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from pangraph_tpu.align.alignment import ANCHOR_QRY, ANCHOR_REF, Alignment, ExtractedHit
from pangraph_tpu.align.cigar import add_flanking_indel, cigar_switch_ref_qry, invert_cigar
from pangraph_tpu.align.params import BandParameters
from pangraph_tpu.graph.edits import Del, Edit, Ins, Sub, edit_from_cigar
from pangraph_tpu.graph.graph import Block, GraphUpdate, Node, Pangraph
from pangraph_tpu.graph.seq import revcomp
from pangraph_tpu.utils.ids import content_id
from pangraph_tpu.utils.intervals import Interval

FWD = "+"
REV = "-"


# --------------------------------------------------------------------------- #
#  Intervals                                                                  #
# --------------------------------------------------------------------------- #
@dataclass
class PangraphInterval:
    interval: Interval
    aligned: bool
    new_block_id: int
    is_anchor: bool = None
    orientation: str = None
    cigar: list = None
    extend_left: int = None
    extend_right: int = None

    def __len__(self):
        return len(self.interval)

    def contains(self, pos):
        return self.interval.contains(pos)

    def has_overlap_with(self, other: Interval):
        return self.interval.has_overlap_with(other)

    def insertion_overlap(self, ins_pos: int, block_len: int) -> bool:
        # pangraph_interval.rs:44-47: left-inclusive; right edge included at block end
        return self.interval.contains(ins_pos) or (ins_pos == block_len and self.interval.end == block_len)


def _unaligned_interval(interval: Interval, block_id: int) -> PangraphInterval:
    return PangraphInterval(
        interval=interval,
        aligned=False,
        new_block_id=content_id("interval", block_id, interval.start, interval.end),
    )


def create_intervals(hits: list, block_length: int) -> list:
    """Alternate aligned/unaligned intervals from sorted hits
    (pangraph_interval.rs:135-160)."""
    intervals = []
    cursor = 0
    for h in sorted(hits, key=lambda x: x.hit.interval.start):
        if h.hit.interval.start > cursor:
            intervals.append(_unaligned_interval(Interval(cursor, h.hit.interval.start), h.hit.name))
        intervals.append(
            PangraphInterval(
                interval=Interval(h.hit.interval.start, h.hit.interval.end),
                aligned=True,
                new_block_id=h.new_block_id,
                is_anchor=h.is_anchor,
                orientation=h.orientation,
                cigar=h.cigar,
            )
        )
        cursor = h.hit.interval.end
    if cursor < block_length:
        intervals.append(_unaligned_interval(Interval(cursor, block_length), hits[-1].hit.name))
    return intervals


def refine_intervals(intervals: list, thr_len: int) -> None:
    """Merge sub-threshold unaligned intervals into the longest aligned flank,
    recording extension lengths for the later CIGAR update
    (pangraph_interval.rs:203-238). In place."""
    mergers = []
    for n, itv in enumerate(intervals):
        if len(itv) < thr_len:
            left_len = len(intervals[n - 1]) if n > 0 else 0
            right_len = len(intervals[n + 1]) if n + 1 < len(intervals) else 0
            if itv.aligned:
                raise AssertionError(f"Aligned interval at {n} shorter than threshold {thr_len}")
            if n > 0 and (not intervals[n - 1].aligned or left_len < thr_len):
                raise AssertionError(f"Bad left flank at {n}")
            if n + 1 < len(intervals) and (not intervals[n + 1].aligned or right_len < thr_len):
                raise AssertionError(f"Bad right flank at {n}")
            mergers.append((n, n - 1) if left_len >= right_len else (n, n + 1))
    for n_from, n_to in reversed(mergers):
        tgt = intervals[n_to]
        src = intervals[n_from]
        if n_from < n_to:
            tgt.interval = Interval(src.interval.start, tgt.interval.end)
            tgt.extend_left = (tgt.extend_left or 0) + len(src)
        else:
            tgt.interval = Interval(tgt.interval.start, src.interval.end)
            tgt.extend_right = (tgt.extend_right or 0) + len(src)
        del intervals[n_from]


def _intervals_sanity_checks(intervals: list, block_length: int) -> None:
    assert intervals, "empty interval list"
    assert intervals[0].interval.start == 0, "first interval must start at 0"
    assert intervals[-1].interval.end == block_length, "last interval must end at block length"
    for n in range(1, len(intervals)):
        assert intervals[n - 1].interval.end == intervals[n].interval.start, "intervals not contiguous"
        assert intervals[n - 1].aligned or intervals[n].aligned, "two consecutive unaligned intervals"


def extract_intervals(hits: list, block_length: int, thr_len: int) -> list:
    intervals = create_intervals(hits, block_length)
    refine_intervals(intervals, thr_len)
    _intervals_sanity_checks(intervals, block_length)
    return intervals


# --------------------------------------------------------------------------- #
#  Block slicing                                                              #
# --------------------------------------------------------------------------- #
class _EditArrays:
    """Per-edit coordinate arrays (sub pos, del pos/end, ins pos/len) —
    built once per node and reused across every interval of a partition.

    When the edit's components are position-sorted (the Edit invariant; dels
    additionally non-overlapping, edits.rs:569+), interval queries use
    O(log n) searchsorted slices plus length prefix-sums instead of O(n)
    boolean scans — the scans dominated reweave at Mbp block scale (every
    interval of a partition re-scanned every node's full edit arrays).
    Unsorted inputs (never produced by the pipeline, but not asserted) fall
    back to the exact boolean-scan path.
    """

    __slots__ = ("sp", "dp", "de", "ip", "il", "sorted", "dlen_cum", "il_cum")

    def __init__(self, ed: Edit):
        self.sp = np.fromiter((s.pos for s in ed.subs), np.int64, len(ed.subs))
        self.dp = np.fromiter((d.pos for d in ed.dels), np.int64, len(ed.dels))
        self.de = np.fromiter((d.end for d in ed.dels), np.int64, len(ed.dels))
        self.ip = np.fromiter((x.pos for x in ed.inss), np.int64, len(ed.inss))
        self.il = np.fromiter((len(x.seq) for x in ed.inss), np.int64, len(ed.inss))
        self.sorted = bool(
            np.all(self.sp[1:] >= self.sp[:-1])
            and np.all(self.dp[1:] >= self.de[:-1])  # sorted AND non-overlapping
            and np.all(self.ip[1:] >= self.ip[:-1])
        )
        if self.sorted:
            self.dlen_cum = np.concatenate(([0], np.cumsum(self.de - self.dp)))
            self.il_cum = np.concatenate(([0], np.cumsum(self.il)))
        else:
            self.dlen_cum = self.il_cum = None


def _edit_arrays(ed: Edit) -> _EditArrays:
    return _EditArrays(ed)


def slice_edits(i: PangraphInterval, ed: Edit, block_len: int, arrs=None) -> Edit:
    # slice.rs:12-53
    s0, e0 = i.interval.start, i.interval.end
    A = arrs if arrs is not None else _edit_arrays(ed)
    sp, dp, de, ip = A.sp, A.dp, A.de, A.ip
    subs = []
    if ed.subs:
        if A.sorted:
            lo = int(np.searchsorted(sp, s0, side="left"))
            hi = int(np.searchsorted(sp, e0, side="left"))
            for k in range(lo, hi):
                s = ed.subs[k]
                subs.append(Sub(s.pos - s0, s.alt))
        else:
            for k in np.flatnonzero((sp >= s0) & (sp < e0)):
                s = ed.subs[k]
                subs.append(Sub(s.pos - s0, s.alt))
    dels = []
    if ed.dels:
        # half-open overlap with [s0, e0)
        if A.sorted:
            # non-overlapping sorted dels: ends are sorted too, so the
            # overlap set {dp < e0 and de > s0} is the contiguous slice
            lo = int(np.searchsorted(de, s0, side="right"))
            hi = int(np.searchsorted(dp, e0, side="left"))
            kk = range(lo, hi)
        else:
            kk = np.flatnonzero((dp < e0) & (de > s0))
        for k in kk:
            d = ed.dels[k]
            ns = max(d.pos, s0) - s0
            ne = min(d.end, e0) - s0
            dels.append(Del(ns, ne - ns))
    inss = []
    if ed.inss:
        if A.sorted:
            lo = int(np.searchsorted(ip, s0, side="left"))
            if e0 == block_len:
                # right edge included at block end (pangraph_interval.rs:44-47)
                hi = int(np.searchsorted(ip, block_len, side="right"))
            else:
                hi = int(np.searchsorted(ip, e0, side="left"))
            kk = range(lo, hi)
        else:
            sel = (ip >= s0) & (ip < e0)
            if e0 == block_len:
                sel |= ip == block_len
            kk = np.flatnonzero(sel)
        for k in kk:
            x = ed.inss[k]
            inss.append(Ins(x.pos - s0, x.seq))
    return Edit(subs=subs, dels=dels, inss=inss)


def new_strandedness(old: str, orientation: str, is_anchor: bool) -> str:
    # slice.rs:55-61
    if is_anchor or orientation == FWD:
        return old
    return REV if old == FWD else FWD


def new_position_circular(old_position, node_coords, path_len, old_strand):
    # slice.rs:67-83
    old_s, old_e = old_position
    ns, ne = node_coords
    if old_strand == FWD:
        return ((old_s + ns) % path_len, (old_s + ne) % path_len)
    return ((old_e + path_len - ne) % path_len, (old_e + path_len - ns) % path_len)


def new_position_non_circular(old_position, node_coords, old_strand):
    # slice.rs:89-101
    old_s, old_e = old_position
    ns, ne = node_coords
    if old_strand == FWD:
        return (old_s + ns, old_s + ne)
    return (old_e - ne, old_e - ns)


def interval_node_coords(i: PangraphInterval, edits: Edit, block_len: int, arrs=None):
    # slice.rs:103-126: interval start/end projected into node coordinates
    st, en = i.interval.start, i.interval.end
    s, e = st, en
    A = arrs if arrs is not None else _edit_arrays(edits)
    dp, de, ip, il = A.dp, A.de, A.ip, A.il
    if edits.dels:
        if A.sorted:
            # sum(min(de, t) - dp) over {dp cmp t}: full lengths via the
            # prefix sum; only the LAST candidate can straddle t (sorted,
            # non-overlapping), so clip its overshoot in O(1)
            def del_reduction(t, side):
                idx = int(np.searchsorted(dp, t, side=side))
                red = int(A.dlen_cum[idx])
                if idx and int(de[idx - 1]) > t:
                    red -= int(de[idx - 1]) - t
                return red

            s -= del_reduction(st, "right")  # dp <= st
            e -= del_reduction(en, "left")   # dp <  en
        else:
            sel = dp <= st
            s -= int(np.sum(np.minimum(de[sel], st) - dp[sel]))
            sel = dp < en
            e -= int(np.sum(np.minimum(de[sel], en) - dp[sel]))
    if edits.inss:
        if A.sorted:
            s += int(A.il_cum[np.searchsorted(ip, st, side="left")])
            e += int(A.il_cum[np.searchsorted(ip, en, side="left")])
            if en == block_len:
                lo = int(np.searchsorted(ip, block_len, side="left"))
                hi = int(np.searchsorted(ip, block_len, side="right"))
                e += int(A.il_cum[hi]) - int(A.il_cum[lo])
        else:
            s += int(il[ip < st].sum())
            e += int(il[ip < en].sum())
            if en == block_len:
                e += int(il[ip == block_len].sum())
    return s, e


def block_slice(b: Block, i: PangraphInterval, graph: Pangraph, arr_cache=None):
    """Slice one block to one interval. Returns (new_block,
    {old_node_id: new Node or None-if-empty}) (slice.rs:136-200). arr_cache
    maps node id -> _edit_arrays(edit), shared across the intervals of one
    partition so the coordinate arrays are built once per node."""
    new_consensus = b.consensus[i.interval.start : i.interval.end]
    block_len = b.consensus_len()
    node_updates = {}
    new_alignment = {}
    for old_nid, edits in b.alignments.items():
        arrs = arr_cache.get(old_nid) if arr_cache is not None else None
        old_node = graph.nodes[old_nid]
        old_strand = old_node.strand
        if i.aligned:
            strand = new_strandedness(old_strand, i.orientation, i.is_anchor)
        else:
            strand = old_strand
        path = graph.paths[old_node.path_id]
        coords = interval_node_coords(i, edits, block_len, arrs=arrs)
        if path.circular:
            pos = new_position_circular(old_node.position, coords, path.tot_len, old_strand)
        else:
            pos = new_position_non_circular(old_node.position, coords, old_strand)
        new_node = Node.create(i.new_block_id, old_node.path_id, strand, pos)
        new_edits = slice_edits(i, edits, block_len, arrs=arrs)
        if new_edits.is_empty_alignment(new_consensus):
            node_updates[old_nid] = None
        else:
            assert new_node.id not in new_alignment, "duplicate node id in slice"
            new_alignment[new_node.id] = new_edits
            node_updates[old_nid] = new_node
    return Block(i.new_block_id, new_consensus, new_alignment), node_updates


# --------------------------------------------------------------------------- #
#  Reweave driver                                                             #
# --------------------------------------------------------------------------- #
@dataclass
class ToMerge:
    block: Block
    is_anchor: bool
    orientation: str
    cigar: list = None
    extend_left: int = None
    extend_right: int = None

    def block_id(self):
        return self.block.id


@dataclass
class MergePromise:
    """Deferred merge of append_block into anchor_block (reweave.rs:22-38).
    Resolution re-aligns every append sequence to the anchor consensus."""

    anchor_block: Block
    append_block: Block
    orientation: str
    cigar: list

    def collect_jobs(self):
        """(jobs, presolved): jobs = [(node_id, seq, band)] needing alignment
        against the anchor consensus; presolved = {node_id: Edit} for empty
        sequences (reweave.rs:41-74)."""
        anchor_len = self.anchor_block.consensus_len()
        append_len = self.append_block.consensus_len()
        cigar_edits = edit_from_cigar(self.cigar)
        cigar_band = BandParameters.from_edits(cigar_edits, anchor_len)

        jobs = []
        presolved = {}
        for node_id, edits in self.append_block.alignments.items():
            seq = edits.apply(self.append_block.consensus)
            if len(seq) == 0:
                presolved[node_id] = Edit.deleted(anchor_len)
                continue
            if self.orientation != FWD:
                seq = revcomp(seq)
                edits = edits.reverse_complement(append_len)
            band = BandParameters.from_edits(edits, append_len).add(cigar_band)
            # event-capacity hint for the aligner: expected indel RUNS (the
            # walk emits one event per deletion run / insertion run) from the
            # prior edits and the anchor<->append cigar — avoids an overflow
            # retry round on divergent pairs
            hint = (
                len(edits.dels) + len(edits.inss) + len(cigar_edits.dels) + len(cigar_edits.inss)
            )
            # pin-split long jobs at indel-free spots of the prior alignment
            # (cigar: anchor->append; edits: append->seq) so each piece only
            # bands for its local indels (align/jobsplit.py)
            from pangraph_tpu.align.jobsplit import SEG, split_by_prior

            segments = None
            if anchor_len > 2 * SEG:
                segments = split_by_prior(
                    None, [cigar_edits, edits], anchor_len, anchor_len, len(seq)
                )
            jobs.append((node_id, seq, band, hint, segments))
        return jobs, presolved

    def finish(self, results: dict) -> Block:
        """Install resolved edits into the anchor block (reweave.rs:88-94)."""
        anchor_len = self.anchor_block.consensus_len()
        for node_id, e in results.items():
            e.sanity_check(anchor_len)
            self.anchor_block.alignments[node_id] = e
        return self.anchor_block

    def solve(self, args, aligner=None) -> Block:
        """Single-promise resolution (reweave.rs:41-96); production batches
        across promises via build.merge.solve_promises."""
        from pangraph_tpu.align.map_variations import map_variations

        jobs, results = self.collect_jobs()
        if jobs:
            if aligner is not None:
                edits_list = aligner(
                    self.anchor_block.consensus, [s for _, s, _, _, _ in jobs], [b for _, _, b, _, _ in jobs]
                )
            else:
                edits_list = [
                    map_variations(
                        self.anchor_block.consensus, seq, band, args.banded_params, args.extra_band_width
                    )
                    for _, seq, band, _, _ in jobs
                ]
            for (node_id, *_), e in zip(jobs, edits_list):
                results[node_id] = e
        return self.finish(results)


def assign_new_block_ids(mergers: list) -> None:
    # reweave.rs:132-140
    for a in mergers:
        assert a.new_block_id is None
        a.new_block_id = content_id(
            "merger",
            a.qry.name,
            a.qry.interval.start,
            a.qry.interval.end,
            a.reff.name,
            a.reff.interval.start,
            a.reff.interval.end,
        )


def assign_anchor_block(mergers: list, graph: Pangraph) -> None:
    """Anchor = deeper block; tie -> fewer Ns in the aligned interval; ref wins
    remaining ties (reweave.rs:144-171)."""
    for m in mergers:
        rb = graph.blocks[m.reff.name]
        qb = graph.blocks[m.qry.name]
        if rb.depth() != qb.depth():
            m.anchor_block = ANCHOR_REF if rb.depth() > qb.depth() else ANCHOR_QRY
        else:
            rn = int(np.count_nonzero(rb.consensus[m.reff.interval.start : m.reff.interval.end] == ord("N")))
            qn = int(np.count_nonzero(qb.consensus[m.qry.interval.start : m.qry.interval.end] == ord("N")))
            m.anchor_block = ANCHOR_REF if rn <= qn else ANCHOR_QRY


def target_blocks(mergers: list) -> dict:
    # reweave.rs:176-192
    out = {}
    for m in mergers:
        out.setdefault(m.qry.name, []).append(m)
        out.setdefault(m.reff.name, []).append(m)
    return out


def extract_hits(bid: int, mergers: list) -> list:
    # reweave.rs:196-246; query-side anchors get the ref/qry-switched (and
    # strand-adjusted) CIGAR
    hits = []
    for m in mergers:
        if m.reff.name == bid:
            is_anchor = m.anchor_block == ANCHOR_REF
            hits.append(
                ExtractedHit(
                    hit=m.reff,
                    new_block_id=m.new_block_id,
                    is_anchor=is_anchor,
                    orientation=m.orientation,
                    cigar=list(m.cigar) if is_anchor else None,
                )
            )
        if m.qry.name == bid:
            is_anchor = m.anchor_block == ANCHOR_QRY
            cigar = None
            if is_anchor:
                cg = m.cigar if m.orientation == FWD else invert_cigar(m.cigar)
                cigar = cigar_switch_ref_qry(cg)
            hits.append(
                ExtractedHit(
                    hit=m.qry,
                    new_block_id=m.new_block_id,
                    is_anchor=is_anchor,
                    orientation=m.orientation,
                    cigar=cigar,
                )
            )
    return hits


def update_cigar(cigar, anchor_ext, append_ext, orientation) -> list:
    """Pad the merge CIGAR with flanking indels for interval extensions
    (reweave.rs:268-305)."""
    out = list(cigar)
    a_left, a_right = anchor_ext
    p_left, p_right = append_ext
    if a_left:
        out = add_flanking_indel(out, "D", a_left, leading=True)
    if a_right:
        out = add_flanking_indel(out, "D", a_right, leading=False)
    if p_left:
        out = add_flanking_indel(out, "I", p_left, leading=(orientation == FWD))
    if p_right:
        out = add_flanking_indel(out, "I", p_right, leading=(orientation != FWD))
    return out


def group_promises(h: list) -> list:
    # reweave.rs:307-341
    groups = {}
    for t in h:
        groups.setdefault(t.block_id(), []).append(t)
    promises = []
    for bid in sorted(groups):
        bs = groups[bid]
        assert len(bs) == 2, f"Merge group for {bid} has {len(bs)} blocks"
        b1, b2 = bs
        assert b1.is_anchor != b2.is_anchor, "exactly one anchor required"
        assert b1.orientation == b2.orientation, "orientation mismatch"
        b_anch, b_app = (b1, b2) if b1.is_anchor else (b2, b1)
        cigar = update_cigar(
            b_anch.cigar,
            (b_anch.extend_left, b_anch.extend_right),
            (b_app.extend_left, b_app.extend_right),
            b_anch.orientation,
        )
        promises.append(
            MergePromise(
                anchor_block=b_anch.block,
                append_block=b_app.block,
                orientation=b_anch.orientation,
                cigar=cigar,
            )
        )
    return promises


def split_block(bid: int, mergers: list, graph: Pangraph, thr_len: int):
    # reweave.rs:344-404
    hits = extract_hits(bid, mergers)
    consensus_len = graph.blocks[bid].consensus_len()
    intervals = extract_intervals(hits, consensus_len, thr_len)

    u = GraphUpdate(b_old_id=bid, b_new=[], n_new={nid: [] for nid in graph.blocks[bid].alignments})
    to_merge = []
    b = graph.blocks[bid]
    arr_cache = {nid: _edit_arrays(e) for nid, e in b.alignments.items()}
    for itv in intervals:
        b_slice, n_dict = block_slice(b, itv, graph, arr_cache=arr_cache)
        for old_nid, new_node in n_dict.items():
            if new_node is not None:
                u.n_new[old_nid].append(new_node)
        if itv.aligned:
            to_merge.append(
                ToMerge(
                    block=b_slice,
                    is_anchor=itv.is_anchor,
                    orientation=itv.orientation,
                    cigar=itv.cigar,
                    extend_left=itv.extend_left,
                    extend_right=itv.extend_right,
                )
            )
        else:
            u.b_new.append(b_slice)
    for old_nid, nodes in u.n_new.items():
        if graph.nodes[old_nid].strand == REV:
            nodes.reverse()
    return u, to_merge


def reweave(mergers: list, graph: Pangraph, thr_len: int):
    """Split all targeted blocks, update the graph, return merge promises
    (reweave.rs:408-452)."""
    assign_new_block_ids(mergers)
    assign_anchor_block(mergers, graph)
    tb = target_blocks(mergers)
    updates, to_merge = [], []
    for bid in sorted(tb):
        u, h = split_block(bid, tb[bid], graph, thr_len)
        updates.append(u)
        to_merge.extend(h)
    promises = group_promises(to_merge)
    for u in updates:
        graph.update(u)
    return graph, promises
