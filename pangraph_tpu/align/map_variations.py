"""Map a query sequence onto a reference, returning an Edit set.

Pipeline mirrors `align/map_variations.rs:39-77` + `align_with_nextclade.rs:24-77`:
banded stripe alignment -> strip insertions (ref-gap columns) -> substitutions +
internal deletions + terminal deletions from the alignment range -> Edit with the
pangraph insertion convention (pos = ref index *after* the insertion, i.e. +1 vs
the nextclade convention).
"""
from __future__ import annotations

import numpy as np

from pangraph_tpu.align.params import BandedAlignParams, BandParameters
from pangraph_tpu.align.stripe import StripeAlignment, align_with_retries
from pangraph_tpu.graph.edits import Del, Edit, Ins, Sub
from pangraph_tpu.graph.seq import GAP, as_seq


def edits_from_aligned_pair(ref_aln: np.ndarray, qry_aln: np.ndarray, ref_len: int) -> Edit:
    """Convert an aligned (gapped) pair into an Edit against the ungapped ref.

    Combines insertions_strip (insertions_strip.rs:47+), find_nuc_changes
    (nuc_changes.rs:18-69) and the terminal-deletion padding
    (align_with_nextclade.rs:48-64)."""
    ref_gap = ref_aln == GAP
    qry_gap = qry_aln == GAP

    # --- insertions: runs of ref-gap columns; pos = #ref chars consumed before
    inss = []
    if ref_gap.any():
        idx = np.flatnonzero(ref_gap)
        # ref position before each gap column = cumsum of non-gap ref chars
        ref_pos = np.cumsum(~ref_gap)  # after column i, ref chars consumed
        run_starts = idx[np.concatenate(([True], np.diff(idx) > 1))]
        run_ends = idx[np.concatenate((np.diff(idx) > 1, [True]))]
        for s, e in zip(run_starts, run_ends):
            seq = qry_aln[s : e + 1].tobytes().decode()
            pos = int(ref_pos[s])  # pangraph convention: index after the insertion
            inss.append(Ins(pos, seq))

    # --- stripped query: qry chars at ref non-gap columns (length == ref_len)
    qry_stripped = qry_aln[~ref_gap]
    ref_stripped = ref_aln[~ref_gap]
    assert len(qry_stripped) == ref_len

    sgap = qry_stripped == GAP
    non_gap = np.flatnonzero(~sgap)
    subs: list = []
    dels: list = []
    if len(non_gap) == 0:
        # nothing alignable: whole reference deleted (align_with_nextclade.rs:60-63)
        return Edit(dels=[Del(0, ref_len)], inss=inss)
    start, end = int(non_gap[0]), int(non_gap[-1]) + 1

    # substitutions: literal differences at non-gap positions inside the range
    mism = np.flatnonzero((qry_stripped != ref_stripped) & ~sgap)
    subs = [Sub(int(p), chr(int(qry_stripped[p]))) for p in mism]

    # internal deletions: gap runs strictly inside [start, end)
    internal = sgap.copy()
    internal[:start] = False
    internal[end:] = False
    if internal.any():
        idx = np.flatnonzero(internal)
        run_starts = idx[np.concatenate(([True], np.diff(idx) > 1))]
        run_ends = idx[np.concatenate((np.diff(idx) > 1, [True]))]
        dels = [Del(int(s), int(e - s + 1)) for s, e in zip(run_starts, run_ends)]

    # terminal deletions from the alignment range
    if start > 0:
        dels.append(Del(0, start))
    if end < ref_len:
        dels.append(Del(end, ref_len - end))
    dels.sort(key=lambda d: d.pos)
    return Edit(subs=subs, dels=dels, inss=inss)


def map_variations(
    ref: np.ndarray,
    qry: np.ndarray,
    band_params: BandParameters,
    params: BandedAlignParams,
    extra_band_width: int = 5,
) -> Edit:
    """Banded re-alignment of qry to ref -> Edit (map_variations.rs:39-77)."""
    ref = as_seq(ref)
    qry = as_seq(qry)
    aln: StripeAlignment = align_with_retries(
        ref, qry, band_params.mean_shift, band_params.band_width + extra_band_width, params
    )
    edit = edits_from_aligned_pair(aln.ref_aln, aln.qry_aln, len(ref))
    return edit
