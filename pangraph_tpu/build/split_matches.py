"""Split alignments at indels longer than the threshold.

Reference: pangraph/split_matches.rs. A kept CIGAR group must start/end with a
match, contain >= threshold match bases, and contain no indel run (cumulative
between matches) >= threshold. Short flanking overhangs are re-attached as
indels (side_patches)."""
from __future__ import annotations

from pangraph_tpu.align.alignment import Alignment, Hit
from pangraph_tpu.align.cigar import _MATCH_OPS, add_flanking_indel, cigar_matches_len, cigar_total_len

FWD = "+"
REV = "-"


def keep_groups(cigar, indel_len_threshold: int) -> list:
    """Index ranges (inclusive) of CIGAR ops to keep (split_matches.rs:32-93)."""
    groups = []
    g_start = None
    last_match = None
    m_sum = i_sum = d_sum = 0
    for i, (n, op) in enumerate(cigar):
        if g_start is None:
            if op not in _MATCH_OPS:
                continue
            g_start = i
        if op in _MATCH_OPS:
            m_sum += n
            i_sum = d_sum = 0
            last_match = i
        elif op == "I":
            i_sum += n
        elif op == "D":
            d_sum += n
        else:
            raise ValueError(f"Unexpected CIGAR op {op!r}")
        if max(i_sum, d_sum) >= indel_len_threshold:
            if g_start is not None and last_match is not None and m_sum >= indel_len_threshold:
                groups.append((g_start, last_match))
            g_start = last_match = None
            m_sum = i_sum = d_sum = 0
    if g_start is not None and last_match is not None and m_sum >= indel_len_threshold:
        groups.append((g_start, last_match))
    return groups


def _positions(cigar, start_idx, end_idx, ops):
    """(start, end) consumed length in `ops` coordinates over the group
    (split_matches.rs:96-147)."""
    pos = 0
    beg = end = None
    for i, (n, op) in enumerate(cigar):
        if i == start_idx:
            beg = pos
        if op in ops:
            pos += n
        if i == end_idx:
            end = pos
            break
    return beg, end


def generate_subalignment(aln: Alignment, group) -> Alignment:
    # split_matches.rs:150-186
    qs, qe = _positions(aln.cigar, group[0], group[1], _MATCH_OPS + ("I",))
    rs, re_ = _positions(aln.cigar, group[0], group[1], _MATCH_OPS + ("D",))
    rs += aln.reff.interval.start
    re_ += aln.reff.interval.start
    if aln.orientation == FWD:
        qs, qe = aln.qry.interval.start + qs, aln.qry.interval.start + qe
    else:
        qs, qe = aln.qry.interval.end - qe, aln.qry.interval.end - qs
    cigar = list(aln.cigar[group[0] : group[1] + 1])
    return Alignment(
        qry=Hit.new(aln.qry.name, aln.qry.length, (qs, qe)),
        reff=Hit.new(aln.reff.name, aln.reff.length, (rs, re_)),
        matches=cigar_matches_len(cigar),
        length=cigar_total_len(cigar),
        quality=aln.quality,
        orientation=aln.orientation,
        cigar=cigar,
        divergence=aln.divergence,
        align_score=aln.align_score,
    )


def side_patches(aln: Alignment, indel_len_threshold: int) -> None:
    """Absorb short lateral overhangs into the alignment as flanking indels
    (split_matches.rs:189-237). Mutates in place."""
    ops = aln.cigar
    rs, re_, rl = aln.reff.interval.start, aln.reff.interval.end, aln.reff.length
    if 0 < rs < indel_len_threshold:
        aln.reff.interval = type(aln.reff.interval)(0, aln.reff.interval.end)
        aln.length += rs
        ops = add_flanking_indel(ops, "D", rs, leading=True)
    if re_ < rl and rl - re_ < indel_len_threshold:
        aln.reff.interval = type(aln.reff.interval)(aln.reff.interval.start, rl)
        aln.length += rl - re_
        ops = add_flanking_indel(ops, "D", rl - re_, leading=False)
    qs, qe, ql = aln.qry.interval.start, aln.qry.interval.end, aln.qry.length
    if 0 < qs < indel_len_threshold:
        aln.qry.interval = type(aln.qry.interval)(0, aln.qry.interval.end)
        aln.length += qs
        ops = add_flanking_indel(ops, "I", qs, leading=(aln.orientation == FWD))
    if qe < ql and ql - qe < indel_len_threshold:
        aln.qry.interval = type(aln.qry.interval)(aln.qry.interval.start, ql)
        aln.length += ql - qe
        ops = add_flanking_indel(ops, "I", ql - qe, leading=(aln.orientation != FWD))
    aln.cigar = ops


def split_matches(aln: Alignment, indel_len_threshold: int) -> list:
    """split_matches.rs:13-24."""
    groups = keep_groups(aln.cigar, indel_len_threshold)
    out = [generate_subalignment(aln, g) for g in groups]
    for a in out:
        side_patches(a, indel_len_threshold)
    return out
