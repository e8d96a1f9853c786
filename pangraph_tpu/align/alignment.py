"""Pairwise block-to-block alignment records (reference: align/alignment.rs)."""
from __future__ import annotations

from dataclasses import dataclass, field

from pangraph_tpu.utils.intervals import Interval


@dataclass
class Hit:
    """One side of a pairwise alignment (alignment.rs:13-27)."""

    name: int  # block id
    length: int  # full length of that block's consensus
    interval: Interval

    @staticmethod
    def new(name, length, start_end) -> "Hit":
        return Hit(name, length, Interval(start_end[0], start_end[1]))


ANCHOR_REF = "ref"
ANCHOR_QRY = "qry"


@dataclass
class Alignment:
    """Pairwise homologous alignment between two block consensuses
    (alignment.rs:40-57). cigar is ref-major: D consumes ref, I consumes qry."""

    qry: Hit
    reff: Hit
    matches: int
    length: int
    quality: int
    orientation: str  # '+' or '-'
    cigar: list  # [(len, op)]
    divergence: float = None
    align_score: float = None
    new_block_id: int = None
    anchor_block: str = None  # ANCHOR_REF / ANCHOR_QRY


@dataclass
class ExtractedHit:
    """Alignment projected onto one of its two blocks (alignment.rs:29-36)."""

    hit: Hit
    new_block_id: int
    is_anchor: bool
    orientation: str
    cigar: list = None  # only for the anchor block


def alignment_energy(aln: Alignment, args) -> float:
    """E = -matches + alpha*cuts + beta*divergence*matches
    (align/energy.rs:37-55, alignment_energy2)."""
    L = aln.matches
    M = (aln.divergence or 0.0) * L
    C = 4
    if aln.qry.interval.start == 0:
        C -= 1
    if aln.qry.interval.end == aln.qry.length:
        C -= 1
    if aln.reff.interval.start == 0:
        C -= 1
    if aln.reff.interval.end == aln.reff.length:
        C -= 1
    return -float(L) + C * args.alpha + M * args.beta
